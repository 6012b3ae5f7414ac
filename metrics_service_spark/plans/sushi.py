"""COUNTER "Dataset Master Report" (SUSHI) assembly — SURVEY.md M7.

Reference (metricsreporter.py): per node x month, `generate_instances`
runs a (session, country, format) composite aggregation per DOI
(:141-308), `get_report_header` builds the header (:105-138), the
per-dataset performance blocks are assembled dataset-at-a-time with
thread pools (:455-506), dumped to ./reports/DSR-D1-<date>-<node>.json
and gzipped when >2000 datasets (:82-84, 509-577).

Spark-first: ONE job for all datasets — the per-DOI request fan-out
becomes a single shuffle keyed by (pid, country, session); the nested
SUSHI structure is built with collect_list/map_from_entries inside the
plan, and `to_json` emits each dataset block distributed.  Only the
final file concatenation touches the driver (streamed with
toLocalIterator; the per-dataset JSON is already rendered).

Metric-type names follow the public Make Data Count / COUNTER CoP:
total-dataset-investigations, unique-dataset-investigations,
total-dataset-requests, unique-dataset-requests.
"""

from __future__ import annotations

import gzip
import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LARGE_REPORT_THRESHOLD = 2_000  # metricsreporter.py:82-84


def sushi_instances(events: DataFrame, *, session_col: str = "sessionId") -> DataFrame:
    """Per (pid, country): the four COUNTER counts.  The reference's
    "unique" counts increment once per (session, country, format)
    composite bucket (metricsreporter.py:208-308) — so unique
    investigations = distinct (session, format) pairs (a session with
    both METADATA and DATA events counts twice, faithfully), while
    unique requests = distinct sessions with DATA events.  Country
    nulls become 'n/a' lowercased (reference :208-210)."""
    ev = events.filter(F.col("formatType").isin("METADATA", "DATA")).withColumn(
        "__country", F.lower(F.coalesce(F.col("country"), F.lit("n/a")))
    )
    # cascade of map-side-combinable aggregations instead of
    # multi-distinct (which Catalyst plans as an Expand that triples the
    # shuffle volume): each level collapses the data before the next,
    # and every distinct-count becomes a plain count over the coarser
    # grain.  DATA is a subset of the investigations filter, so the
    # requests side is a conditional agg, never a second scan.
    g1 = ev.groupBy("pid", "__country", session_col, "formatType").agg(
        F.count(F.lit(1)).alias("__n")
    )
    g2 = g1.groupBy("pid", "__country", session_col).agg(
        F.sum("__n").alias("__n_all"),
        F.sum(F.when(F.col("formatType") == "DATA", F.col("__n"))).alias("__n_data"),
        F.count(F.lit(1)).alias("__n_formats"),  # distinct (session, format)
    )
    return (
        g2.groupBy("pid", "__country")
        .agg(
            F.sum("__n_all").cast("long").alias("total_investigations"),
            F.sum("__n_formats").cast("long").alias("unique_investigations"),
            F.coalesce(F.sum("__n_data"), F.lit(0))
            .cast("long")
            .alias("total_requests"),
            F.count(F.when(F.col("__n_data") > 0, 1))
            .cast("long")
            .alias("unique_requests"),
        )
        .withColumnRenamed("__country", "country")
    )


def sushi_dataset_blocks(
    events: DataFrame,
    *,
    begin_date: str,
    end_date: str,
    platform: str = "DataONE",
    session_col: str = "sessionId",
) -> DataFrame:
    """One row per dataset: (pid, block_json) where block_json is the
    SUSHI report-datasets entry with nested performance instances and
    per-country breakdowns."""
    inst = sushi_instances(events, session_col=session_col)

    def metric(name: str, col: str):
        return F.struct(
            F.lit(name).alias("metric-type"),
            F.sum(col).cast("long").alias("count"),
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col(col) > 0,
                            F.struct(F.col("country"), F.col(col).cast("long")),
                        )
                    )
                )
            ).alias("country-counts"),
        ).alias(name)

    per_pid = inst.groupBy("pid").agg(
        metric("total-dataset-investigations", "total_investigations"),
        metric("unique-dataset-investigations", "unique_investigations"),
        metric("total-dataset-requests", "total_requests"),
        metric("unique-dataset-requests", "unique_requests"),
    )
    block = F.struct(
        F.col("pid").alias("dataset-title"),
        F.array(
            F.struct(F.lit("doi").alias("type"), F.col("pid").alias("value"))
        ).alias("dataset-id"),
        F.lit(platform).alias("platform"),
        F.lit("dataset").alias("data-type"),
        F.array(
            F.struct(
                F.struct(
                    F.lit(begin_date).alias("begin-date"),
                    F.lit(end_date).alias("end-date"),
                ).alias("period"),
                F.array(
                    F.col("`total-dataset-investigations`"),
                    F.col("`unique-dataset-investigations`"),
                    F.col("`total-dataset-requests`"),
                    F.col("`unique-dataset-requests`"),
                ).alias("performance-instances"),
            )
        ).alias("performance"),
    )
    return per_pid.select(
        "pid", F.to_json(block, {"ignoreNullFields": "true"}).alias("block_json")
    ).orderBy("pid")


def report_header(
    *,
    begin_date: str,
    end_date: str,
    node: str,
    n_datasets: int,
    created: str,
    report_name: str = "dataset master report",
    release: str = "rd1",
) -> dict:
    """get_report_header (metricsreporter.py:105-138); `created` is an
    explicit input for determinism."""
    header = {
        "report-name": report_name,
        "report-id": "dsr",
        "release": release,
        "reporting-period": {"begin-date": begin_date, "end-date": end_date},
        "created": created,
        "created-by": node,
        "report-filters": [],
        "report-attributes": [],
        "exceptions": [],
    }
    if n_datasets > LARGE_REPORT_THRESHOLD:
        header["exceptions"] = [
            {
                "code": 69,
                "severity": "warning",
                "message": "Report is compressed using gzip",
                "help-url": "https://github.com/datacite/sashimi",
                "data": "usage data needs to be uncompressed",
            }
        ]
    return header


def write_report(
    blocks: DataFrame,
    out_dir: str,
    *,
    begin_date: str,
    end_date: str,
    node: str,
    created: str,
) -> Path:
    """Assemble DSR-<end>-<node>.json[.gz]; gzip beyond 2000 datasets
    (S11).  Dataset blocks stream through the driver pre-rendered —
    the driver never holds row objects, only JSON strings."""
    n = blocks.count()
    header = report_header(
        begin_date=begin_date,
        end_date=end_date,
        node=node,
        n_datasets=n,
        created=created,
    )
    out = Path(out_dir) / f"DSR-D1-{end_date}-{node}.json"
    chunks = [
        '{"report-header": ',
        json.dumps(header, ensure_ascii=False),
        ', "report-datasets": [',
    ]
    first = True
    for row in blocks.toLocalIterator():
        if not first:
            chunks.append(",")
        chunks.append(row.block_json)
        first = False
    chunks.append("]}")
    payload = "".join(chunks)
    if n > LARGE_REPORT_THRESHOLD:
        out = out.with_suffix(".json.gz")
        out.write_bytes(gzip.compress(payload.encode()))
    else:
        out.write_text(payload)
    return out

"""MetricsRequest JSON -> DataFrame plan translator.

This is the reference's public query surface (SURVEY.md P10, §3.1):
`process_request` dispatches on filterBy[0].filterType
(metricsreader.py:108-161), expands the target identifier set, runs the
COUNTER-filtered composite aggregation in ES, merges Postgres citation
counts, and pivots into parallel arrays with a zero-filled month spine
(metricsreader.py:1569-1816).

Here the whole lifecycle is ONE lazy DataFrame program:
  identifier expansion (broadcast semi-join) -> COUNTER filter ->
  groupBy(date_trunc, dims) with exact distinct -> full-outer merge with
  the citations aggregate -> date-spine zero-fill.
Process boundaries (HTTP->Solr->ES->Postgres) become Spark stages.

Known deviations from the reference, implemented intentionally
(SURVEY.md §7.4 "reference bugs to not replicate silently"):
- `getMetricsPerRepository`'s tuple-append bug (metricsreader.py:746-751)
  -> intended semantics (a real nodeId equality filter).
- `formatDataPerUser` stale month_index bug (metricsreader.py:1060-1068)
  -> correct outer merge for citation-only months.
- "unique" counts use exact countDistinct (the ES `cardinality` HLL
  approximation is available via approx=True).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXCLUDED_TAGS = (
    "ignore_ip",
    "machine_ua",
    "robot_ua",
    "dataone_ip",
    "robot_ip",
    "d1_admin_subject",
)

AGG_FORMATS = {"month": "yyyy-MM", "day": "yyyy-MM-dd", "year": "yyyy"}
CITATION_KEY_LEN = {"month": 7, "day": 10, "year": 4}


@dataclass
class MetricsTables:
    """Input tables in the FIXTURES.md schemas."""

    events: DataFrame
    identifiers: DataFrame
    citations: DataFrame


def _parse_request_date(s: str) -> datetime:
    return datetime.strptime(s, "%m/%d/%Y")  # metricsreader.py:278-298


def run_metrics_request(
    spark: SparkSession,
    request: dict,
    tables: MetricsTables,
    *,
    approx: bool = False,
) -> DataFrame:
    """The engine's public query API (SURVEY.md S9): MetricsRequest JSON
    in, result DataFrame out.  The REST layer stays external and calls
    this; `MetricsRequestPlanner.response` renders the reference's
    parallel-array JSON shape."""
    return MetricsRequestPlanner(spark, tables, approx=approx).plan(request)


class MetricsRequestPlanner:
    def __init__(self, spark: SparkSession, tables: MetricsTables, *, approx: bool = False):
        self.spark = spark
        self.t = tables
        self.approx = approx

    # -- identifier expansion (process boundary #1 in the reference) ------
    def family_pids(self, filter_type: str, values: list[str]) -> DataFrame:
        """Expand the request's target ids into the full PID set, one
        column `pid` (reference: getResolvePIDs / identifiers-2 lookups,
        pid_resolution.py:285-416, metricsreader.py:1259-1343)."""
        ids = self.t.identifiers
        vals = [F.lit(v) for v in values]
        if filter_type in ("dataset", "catalog", "package"):
            matched = ids.filter(
                F.col("PID").isin(values)
                | F.col("SID").isin(values)
                | F.arrays_overlap("datasetIdentifierFamily", F.array(*vals))
            )
        elif filter_type in ("user", "group"):
            # user/group queries require public datasets
            # (metricsreader.py:1305-1323)
            matched = ids.filter(
                F.arrays_overlap("userID", F.array(*vals)) & F.col("isPublic")
            )
        else:
            raise ValueError(f"family_pids does not apply to {filter_type!r}")
        return (
            matched.select(F.explode("datasetIdentifierFamily").alias("pid"))
            .union(matched.select(F.col("PID").alias("pid")))
            .distinct()
        )

    def family_map(self, filter_type: str, values: list[str]) -> DataFrame:
        """Per-seed family expansion: (seed, pid) rows keeping WHICH
        requested id each family member belongs to — the per-dataset
        analog of family_pids (reference: getResolvePIDs keyed by the
        requested pid, pid_resolution.py:285-416; catalogPIDs dict in
        metricsreader.py:480-508).  Every seed maps at least to itself
        (the reference initializes catalogPIDs[i] = [i])."""
        ids = self.t.identifiers
        seeds = self.spark.createDataFrame([(v,) for v in values], "seed string")
        matched = ids.join(
            F.broadcast(seeds),
            (F.col("PID") == F.col("seed"))
            | (F.col("SID") == F.col("seed"))
            | F.array_contains("datasetIdentifierFamily", F.col("seed")),
        )
        members = matched.select(
            "seed", F.explode("datasetIdentifierFamily").alias("pid")
        ).union(matched.select("seed", F.col("PID").alias("pid")))
        return members.union(
            seeds.select("seed", F.col("seed").alias("pid"))
        ).distinct()

    # -- event-side filtering --------------------------------------------
    def counter_filtered_events(self) -> DataFrame:
        """The robot/machine exclusion + read/format/session predicates
        applied to every aggregation (metricselasticsearch.py:232-265)."""
        ev = self.t.events
        return ev.filter(
            (F.col("event") == "read")
            & F.col("formatType").isin("METADATA", "DATA")
            & F.col("sessionId").isNotNull()
            & (F.col("sessionId") != -1)
            & (
                F.col("tags").isNull()
                | ~F.arrays_overlap(
                    "tags", F.array(*[F.lit(t) for t in EXCLUDED_TAGS])
                )
            )
        )

    def scoped_events(self, request: dict) -> tuple[DataFrame, DataFrame | None, dict]:
        """Apply the filterBy clauses: target scope (dataset/repository/
        user/group/portal), plus the date-range filter.  Returns
        (events, family_or_None, meta)."""
        filters = request.get("filterBy", [])
        ev = self.counter_filtered_events()
        family = None
        meta: dict = {"filterType": None, "start": None, "end": None}
        for f in filters:
            ftype, values = f["filterType"], list(f["values"])
            interp = f.get("interpretAs", "list").lower()
            if ftype in ("month", "day", "year"):
                if interp != "range":
                    # the reference only applies date filters flagged
                    # interpretAs=range (metricsreader.py:282,707,920);
                    # others are silently ignored
                    continue
                start, end = (_parse_request_date(v) for v in values)
                meta["start"], meta["end"] = start, end
                # reference bounds: strict gt on the start instant, lte
                # on the end instant (metricselasticsearch.py:259-264)
                ev = ev.filter(
                    (F.col("dateLogged") > F.lit(start.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp"))
                    & (F.col("dateLogged") <= F.lit(end.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp"))
                )
            elif ftype not in (
                "dataset",
                "catalog",
                "package",
                "user",
                "group",
                "repository",
                "portal",
            ):
                # validate the filterType FIRST so a typo'd type raises
                # regardless of interpretAs, instead of silently
                # yielding an all-zero response through the
                # unknown-interpretAs branch below
                raise ValueError(f"unsupported filterType {ftype!r}")
            elif interp != "list":
                # the reference dispatcher handles scope filters only for
                # interpretAs == "list" (metricsreader.py:126-156); any
                # other value — including the API-documented "full_text"
                # — falls through every branch and yields an empty
                # result.  Mirror that: the scope matches nothing.
                meta["filterType"] = ftype
                ev = ev.filter(F.lit(False))
            elif ftype in ("dataset", "catalog", "package", "user", "group"):
                meta["filterType"] = ftype
                # r18 (guide §2.4, the catalog_summary pattern): the
                # family feeds TWO broadcast builds — the event semi-
                # join here and citations_for_family's normalized-pid
                # side — so derive it once behind a lazy checkpoint
                family = self.family_pids(ftype, values).localCheckpoint(
                    eager=False
                )
                ev = ev.join(F.broadcast(family), "pid", "left_semi")
            elif ftype == "repository":
                meta["filterType"] = ftype
                ev = ev.filter(F.col("nodeId").isin(values))
            elif ftype == "portal":
                meta["filterType"] = ftype
                ev = ev.filter(
                    F.arrays_overlap(
                        "portalIdentifier", F.array(*[F.lit(v) for v in values])
                    )
                )
        return ev, family, meta

    # -- citations (process boundary #3 in the reference) -----------------
    def citations_for_family(self, family: DataFrame | None) -> DataFrame:
        """gatherCitations (metricsreader.py:423-468): target_id matched
        as lowercase substring of a family pid, Dryad '?'-suffix
        stripped from the pid before comparison.  Kept as a broadcast
        theta-join for fidelity; each citation counted once
        (reference breaks after first matching pid)."""
        cites = self.t.citations
        if family is None:
            return cites
        pids = family.select(
            F.lower(F.substring_index(F.col("pid"), "?", 1)).alias("__pid_norm")
        ).distinct()
        matched = cites.join(
            F.broadcast(pids),
            F.instr(F.col("__pid_norm"), F.lower(F.col("target_id"))) > 0,
            "inner",
        )
        return matched.dropDuplicates(["target_id", "source_id"])

    # -- the aggregation + merge ------------------------------------------
    def plan(self, request: dict) -> DataFrame:
        """Build the full result DataFrame: one row per spine bucket
        (x country when grouped), with total/unique downloads & views
        and citation counts, zero-filled."""
        group_by = list(request.get("groupBy", ["month"]))
        agg_type = next(
            (g for g in group_by if g in AGG_FORMATS), "month"
        )  # aggType selection metricsreader.py:711-721
        by_country = "country" in group_by
        fmt = AGG_FORMATS[agg_type]

        ev, family, meta = self.scoped_events(request)
        bucket = F.date_format("dateLogged", fmt).alias("bucket")
        dims = [bucket] + ([F.col("geoip.country_code2").alias("country")] if by_country else [])

        uniq = (
            F.approx_count_distinct if self.approx else F.countDistinct
        )
        is_data = F.col("formatType") == "DATA"
        is_meta = F.col("formatType") == "METADATA"
        agg = ev.groupBy(*dims).agg(
            F.count(F.when(is_data, 1)).alias("downloads"),
            F.count(F.when(is_meta, 1)).alias("views"),
            uniq(F.when(is_data, F.col("eventId"))).alias("unique_downloads"),
            uniq(F.when(is_meta, F.col("eventId"))).alias("unique_views"),
        )

        cites = self.citations_for_family(family)
        key_len = CITATION_KEY_LEN[agg_type]
        cite_agg = (
            cites.filter(F.col("link_publication_date").isNotNull())
            .groupBy(
                F.substring("link_publication_date", 1, key_len).alias("bucket")
            )
            .agg(F.count(F.lit(1)).alias("citations"))
        )

        merged = agg.join(cite_agg, "bucket", "full_outer")

        spine = self._spine(meta, agg_type)
        if spine is not None:
            if by_country:
                countries = agg.select("country").distinct()
                spine = spine.crossJoin(F.broadcast(countries))
                merged = spine.join(merged, ["bucket", "country"], "full_outer")
            else:
                merged = spine.join(merged, ["bucket"], "full_outer")

        out_cols = ["bucket"] + (["country"] if by_country else [])
        fills = ["downloads", "views", "unique_downloads", "unique_views", "citations"]
        return merged.select(
            *out_cols,
            *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c) for c in fills],
        ).orderBy(*out_cols)

    def _spine(self, meta: dict, agg_type: str) -> DataFrame | None:
        """Bucket spine over the requested range.  The reference builds
        it with `range((end - start).days)` over day offsets and dedupes
        the formatted keys (metricsreader.py:1029-1033) — the END DAY IS
        EXCLUSIVE, so a range ending on the 1st of a month contributes
        no bucket for that month/day.  We generate days in [start, end)
        to match."""
        if meta["start"] is None:
            return None
        fmt = AGG_FORMATS[agg_type]
        start = meta["start"].strftime("%Y-%m-%d")
        end = meta["end"].strftime("%Y-%m-%d")
        return (
            self.spark.range(1)
            .select(
                F.explode(
                    F.sequence(
                        F.lit(start).cast("date"),
                        F.lit(end).cast("date"),
                        F.expr("INTERVAL 1 DAY"),
                    )
                ).alias("d")
            )
            .filter(F.col("d") < F.lit(end).cast("date"))  # end-exclusive
            .select(F.date_format("d", fmt).alias("bucket"))
            .distinct()
        )

    # -- catalog / search page summary -------------------------------------
    def catalog_summary_response(self, request: dict) -> dict:
        """The browse/search-page branch (getSummaryMetricsPerCatalog +
        formatDataPerCatalog, metricsreader.py:470-640): one entry PER
        REQUESTED DATASET with its family's UNIQUE event counts —
        parallel arrays datasets/downloads/views/citations with country
        and months empty and resultDetails {}.

        Fidelity notes: downloads/views are cardinality-of-eventId (the
        ES `unique_doc_count`), not totals; the request's month filter
        is IGNORED — the reference hardcodes 01/01/2012..today for this
        branch (metricsreader.py:616-618); datasets follow request
        order (catalogPIDs dict insertion order); citations are
        gathered per family like gatherCitations.  One broadcast join +
        one groupBy — per-seed families never leave the cluster."""
        first = request.get("filterBy", [{}])[0]
        values = list(first.get("values", []))
        rows = {
            r["seed"]: (r["downloads"], r["views"], r["citations"])
            for r in self.catalog_summary_frame(request).collect()
        }
        results = {
            "downloads": [rows.get(v, (0, 0, 0))[0] for v in values],
            "views": [rows.get(v, (0, 0, 0))[1] for v in values],
            "citations": [rows.get(v, (0, 0, 0))[2] for v in values],
            "datasets": list(values),
            "country": [],
            "months": [],
        }
        return {
            "metricsRequest": request,
            "results": results,
            "resultDetails": {},
        }

    def catalog_summary_frame(self, request: dict) -> DataFrame:
        """The per-dataset summary as ONE zero-filled DataFrame (seed,
        downloads, views, citations) — the oracle-checkable core of
        `catalog_summary_response` (getSummaryMetricsPerCatalog,
        metricsreader.py:470-640): per-seed family expansion, family
        UNIQUE event counts (the ES unique_doc_count cardinality), and
        per-family citation gathering, all cluster-side; one row per
        requested id regardless of activity."""
        first = request.get("filterBy", [{}])[0]
        values = list(first.get("values", []))
        # r17 (guide §2.4): the family map feeds TWO broadcast builds
        # (the event-count join and the citation substring join's
        # normalized-pid side) — lazily localCheckpoint it so the
        # identifiers match + explode + distinct run once, not twice
        fam = self.family_map(
            first.get("filterType", "catalog"), values
        ).localCheckpoint(eager=False)
        ev = self.counter_filtered_events()
        counts = (
            ev.join(F.broadcast(fam), "pid")
            .groupBy("seed")
            .agg(
                F.countDistinct(
                    F.when(F.col("formatType") == "DATA", F.col("eventId"))
                ).alias("__dl"),
                F.countDistinct(
                    F.when(F.col("formatType") == "METADATA", F.col("eventId"))
                ).alias("__vw"),
            )
        )
        pids = fam.select(
            "seed",
            F.lower(F.substring_index(F.col("pid"), "?", 1)).alias("__pid_norm"),
        ).distinct()
        cites = (
            self.t.citations.join(
                F.broadcast(pids),
                F.instr(F.col("__pid_norm"), F.lower(F.col("target_id"))) > 0,
            )
            .dropDuplicates(["seed", "target_id", "source_id"])
            .groupBy("seed")
            .agg(F.count(F.lit(1)).alias("__ct"))
        )
        seeds = self.spark.createDataFrame([(v,) for v in values], "seed string")
        return (
            seeds.join(counts, "seed", "left")
            .join(cites, "seed", "left")
            .select(
                "seed",
                F.coalesce("__dl", F.lit(0)).cast("long").alias("downloads"),
                F.coalesce("__vw", F.lit(0)).cast("long").alias("views"),
                F.coalesce("__ct", F.lit(0)).cast("long").alias("citations"),
            )
        )

    # -- reference-shaped response ----------------------------------------
    def response(self, request: dict) -> dict:
        """Collect plan() into the reference's parallel-array response
        (metricsreader.py:1569-1816): results + resultDetails totals.
        Catalog/package list requests with >1 values dispatch to the
        per-dataset summary branch, mirroring process_request
        (metricsreader.py:131-137)."""
        first = request.get("filterBy", [{}])[0] if request.get("filterBy") else {}
        if (
            first.get("filterType", "").lower() in ("catalog", "package")
            and first.get("interpretAs", "list").lower() == "list"
            and len(first.get("values", [])) > 1
        ):
            return self.catalog_summary_response(request)
        metrics = list(request.get("metrics", ["citations", "downloads", "views"]))
        df = self.plan(request)
        rows = df.collect()
        group_by = list(request.get("groupBy", ["month"]))
        agg_type = next((g for g in group_by if g in AGG_FORMATS), "month")
        by_country = "country" in group_by
        results: dict = {"months" if agg_type == "month" else agg_type + "s": [
            r["bucket"] for r in rows
        ]}
        if by_country:
            results["country"] = [r["country"] for r in rows]
        for m in ("downloads", "views", "citations"):
            if m in metrics:
                results[m] = [r[m] for r in rows]
        for m in ("downloads", "views"):
            if m in metrics:
                results[f"unique_{m}"] = [r[f"unique_{m}"] for r in rows]
        details = {
            "totalDownloads": sum(r["downloads"] for r in rows),
            "totalViews": sum(r["views"] for r in rows),
            "totalCitations": sum(r["citations"] for r in rows),
        }
        return {
            "metricsRequest": request,
            "results": results,
            "resultDetails": details,
        }


def package_counts(
    events: DataFrame,
    obsoletes: DataFrame,
    *,
    pid_col: str = "pid",
    child_col: str = "pid",
    parent_col: str = "obsoletes",
    max_depth: int = 20,
    hop: int = 4,
) -> DataFrame:
    """Catalog-page resultDetails: per visible PID, unique view/download
    counts accumulated over its obsolescence ancestry
    (parsePackageCounts, metricsreader.py:633-670: walk the obsoletes
    dictionary and add the obsoleted versions' counts to the current
    version).

    `obsoletes` carries (child, parent) rows — parent is the version the
    child obsoletes.  Counts for a pid = its own + all transitive
    ancestors'.  Implements the intended accumulate-both semantics; the
    reference overwrites downloadCount instead of adding while walking
    (stale-assignment bug, SURVEY.md §7.4) — documented deviation.

    One aggregation + one bounded closure + one join: the ancestry pairs
    come from expand_family over the directed parent edges (depth-capped
    like the reference's max_depth=20 walk).

    `hop` composes the parent-pointer relation with itself up front so
    the driver loop runs ceil(max_depth / hop) rounds instead of
    max_depth (r17, guide §2.6-analogue: each BFS round is fixed
    job-launch latency).  Obsolescence edges are parent POINTERS — out-
    degree <= 1 per child by the reference's obsoletes semantics — so
    the composed <=hop-hop set stays linear in the node count (<= hop
    edges per node), never the hub blow-up the generic expand_family
    docstring warns about.  Measured at sf0.1: hop=1 4.83s / hop=2
    3.96s / hop=4 3.56s warm (28.98/7.79/4.53 cold), identical output.
    """
    from metrics_service_spark.operators.closure import expand_family

    counts = events.groupBy(F.col(pid_col).alias("__pid")).agg(
        F.countDistinct(
            F.when(F.col("formatType") == "METADATA", F.col("eventId"))
        ).alias("__views"),
        F.countDistinct(
            F.when(F.col("formatType") == "DATA", F.col("eventId"))
        ).alias("__downloads"),
    )
    edges = obsoletes.select(
        F.col(child_col).alias("src"), F.col(parent_col).alias("dst")
    ).filter(F.col("dst").isNotNull())
    seeds = events.select(F.col(pid_col).alias("pid")).distinct()
    ancestry = expand_family(
        seeds, edges, seed_col="pid", max_iters=max_depth, hop=hop
    )
    return (
        ancestry.join(counts, ancestry.member == counts.__pid, "left")
        .groupBy(F.col("seed").alias("pid"))
        .agg(
            F.sum(F.coalesce("__views", F.lit(0))).cast("long").alias("view_count"),
            F.sum(F.coalesce("__downloads", F.lit(0)))
            .cast("long")
            .alias("download_count"),
        )
    )

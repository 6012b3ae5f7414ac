"""Scalar-function suite query: exercises the functions/ library
(DOI extraction, version strip, date keys, family hash, geohash prefix,
null-country patch) in one oracle-checked projection over events.
JWT decode and URL parsing are round-trip unit-tested instead
(tests/test_functions.py) — DuckDB lacks a parse_url equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metrics_service_spark.catalog import QuerySpec
from metrics_service_spark.functions import (
    doi_prefix,
    extract_doi,
    family_hash,
    geohash_prefix,
    month_key,
    null_country_patch,
    strip_version_suffix,
)
from metrics_service_spark.sources.eventlog import EVENTLOG_SQL, eventlog_view
from metrics_service_spark.sources.tables import load_table


def q_func_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metrics_service_spark.operators.similarity import _spread

    # r17 (guide §2.3 raw-rows-first): the whole suite is a per-row
    # expression chain (JSON extract, regex, md5 x2) over a
    # one-row-group fixture scan — spread the RAW events so it runs on
    # all cores; the exchange moves the narrow raw rows once
    ev = eventlog_view(_spread(load_table(spark, sf_dir, "events")))
    # synthesize reference-shaped inputs from adapter columns so each
    # scalar has something real to chew on
    doi_text = F.concat(F.lit("citation of doi:10.5063/"), F.col("pid"), F.lit(" end"))
    versioned = F.concat(F.col("pid"), F.lit("?ver=2018-01-01"))
    geohash9 = F.substring(F.md5(F.col("pid")), 1, 9)
    return ev.select(
        F.col("eventId"),
        extract_doi(doi_text).alias("doi"),
        doi_prefix(doi_text).alias("doi_pfx"),
        strip_version_suffix(versioned).alias("pid_clean"),
        month_key(F.col("dateLogged")).alias("month_key"),
        family_hash(F.array(F.col("pid"), F.col("eventId"), F.lit("sid0"))).alias(
            "fam_hash"
        ),
        geohash_prefix(geohash9, 4).alias("geohash4"),
        null_country_patch(F.nullif(F.col("country"), F.lit("CN"))).alias(
            "country_patched"
        ),
    )


ORACLE_FUNC_SUITE = f"""
WITH eventlog AS ({EVENTLOG_SQL})
SELECT
  eventId,
  regexp_extract('citation of doi:10.5063/' || pid || ' end',
                 '(10\\.\\d{{4,9}}/[^\\s"<>]+)', 1) AS doi,
  CASE WHEN instr('citation of doi:10.5063/' || pid || ' end', '10.') > 0
       THEN substring('citation of doi:10.5063/' || pid || ' end',
                      instr('citation of doi:10.5063/' || pid || ' end', '10.'), 7)
       ELSE '' END AS doi_pfx,
  split_part(pid || '?ver=2018-01-01', '?', 1) AS pid_clean,
  strftime(dateLogged, '%Y-%m') AS month_key,
  md5(list_aggregate(list_sort([pid, eventId, 'sid0']), 'string_agg', ',')) AS fam_hash,
  substring(md5(pid), 1, 4) AS geohash4,
  CASE WHEN nullif(country, 'CN') IS NULL THEN 'US'
       ELSE nullif(country, 'CN') END AS country_patched
FROM eventlog
"""


QUERIES = {
    "func_scalar_suite": QuerySpec(
        q_func_scalar_suite,
        ORACLE_FUNC_SUITE,
        "scalar function library over events",
        ("functions",),
    ),
}

"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship landing-page query on sf0.001
queries()      -> every implemented query from the catalog
oracle_sql()   -> DuckDB-equivalent SQL per query (where expressible)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from metrics_service_spark.catalog import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from metrics_service_spark.catalog.landing import q_landing_page_daily

    return q_landing_page_daily(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }

"""Query catalog: every implemented operator exposed as a named query.

Each entry pairs a Spark implementation (spark, sf_dir) -> DataFrame
with an equivalent DuckDB oracle SQL (None for genuinely
non-SQL-expressible ops, which get a weaker rows-only check by the
driver).  Column names/aliases are kept identical on both sides — the
driver's comparator sorts columns by name before hashing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def all_queries() -> dict[str, QuerySpec]:
    from metrics_service_spark.catalog import (
        core,
        functions_suite,
        gold,
        joins,
        landing,
        llm,
        multimodal,
        search,
        tpch,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (
        core,
        joins,
        tpch,
        llm,
        landing,
        multimodal,
        gold,
        functions_suite,
        search,
    ):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged

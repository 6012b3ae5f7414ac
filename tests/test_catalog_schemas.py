"""Every catalog query must emit only SCALAR columns: the driver's
pandas canonicalizer cannot sort/hash list or struct cells (the round-1
user_event_family failure class).  Serialize arrays before returning
(array_join / explode / md5) — keep rich types in operator APIs, not
catalog outputs."""

from __future__ import annotations

from pyspark.sql import types as T

from metrics_service_spark.catalog import all_queries


def test_all_outputs_scalar(spark, sf_dir):
    offenders = []
    for name, spec in all_queries().items():
        df = spec.fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert offenders == []

"""Scale probe: replicate the sf0.1 events table K times (offset keys,
shifted users) into a scratch dir and measure how the event-side
headline queries scale.  Evidence for SCALE.md's linearity claims —
the plan shapes are partition-parallel, so wall-clock should grow
sub-linearly on 32 cores until the table outgrows memory bandwidth.

    python tools/scale_probe.py [K] [scratch_dir]

Writes nothing outside scratch_dir (default /tmp/msspark_scale).
The replicated data is derived from the driver tables for MEASUREMENT
only — correctness stays pinned to the unmodified driver data.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "ev_monthly_stats",
    "ev_sessionize",
    "counter_report",
    "ev_value_median",
    "doc_exact_dedup",
    "doc_minhash_dedup",
    "doc_split",
    # r6 additions: the paragraph hash-join pipeline and the two pure
    # scan projections (expected ~1x — regression canaries)
    "doc_paragraph_dedup",
    "doc_repetition",
    "doc_pii_scrub",
]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/msspark_scale"
    base = "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from metrics_service_spark.catalog import all_queries
    from metrics_service_spark.session import get_spark
    from metrics_service_spark.sources.tables import load_table

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(scratch, ignore_errors=True)
    ev = load_table(spark, base, "events")
    n0 = ev.count()
    copies = ev.crossJoin(
        F.broadcast(spark.range(k).withColumnRenamed("id", "__copy"))
    ).select(
        (F.col("event_id") + F.col("__copy") * 10_000_000).alias("event_id"),
        F.col("ts"),
        (F.col("user_id") + F.col("__copy") * 1_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    copies.write.mode("overwrite").parquet(f"{scratch}/events.parquet")
    print(f"replicated events: {n0} x {k} -> {n0 * k} rows", file=sys.stderr)

    docs = load_table(spark, base, "documents")
    nd = docs.count()
    doc_copies = docs.crossJoin(
        F.broadcast(spark.range(k).withColumnRenamed("id", "__copy"))
    ).select(
        (F.col("doc_id") + F.col("__copy") * 10_000_000).alias("doc_id"),
        # make copies token-wise DISJOINT (suffix every token with the
        # copy id): replication must not fabricate cross-copy near-dup
        # clusters, which would quadratically inflate the candidate set
        # and measure the replication scheme, not the operator
        F.when(F.col("__copy") == 0, F.col("text"))
        .otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit("_"), F.col("__copy").cast("string")),
                ),
                " ",
            )
        )
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    doc_copies.write.mode("overwrite").parquet(f"{scratch}/documents.parquet")
    print(f"replicated documents: {nd} x {k} -> {nd * k} rows", file=sys.stderr)

    cat = all_queries()
    out = {"k": k, "rows_base": n0, "queries": {}}
    for name in QUERIES:
        fn = cat[name].fn
        times = {}
        for label, sf_dir in (("base", base), (f"x{k}", scratch)):
            fn(spark, sf_dir).count()  # warm-up: codegen + broadcasts
            t0 = time.time()
            fn(spark, sf_dir).count()  # steady-state, the reported time
            times[label] = round(time.time() - t0, 2)
        times["ratio"] = round(times[f"x{k}"] / max(times["base"], 1e-9), 1)
        out["queries"][name] = times
        print(f"{name}: {times}", file=sys.stderr)
    print(json.dumps(out))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()

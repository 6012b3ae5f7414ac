"""One-rep timing sweep over the ENTIRE catalog (VERDICT r16 #6).

The close sweep (bench.py) times the ~113-entry headline set at 3
reps; this tool answers the complementary question — "is any
un-benched entry secretly expensive?" — by executing EVERY catalog
entry once at the bench scale and recording its wall.  One rep only:
the artifact is a coverage scan, not an adjudication series (the
bench-of-record remains bench.py's min/median detail).

    python tools/bench_full.py [sf_dir] [--json OUT.json]

Each entry is collect()ed to completion on a fresh DataFrame (the
bench.py rule: Spark skips stages whose shuffle output exists, so only
a fresh fn(spark, sf) per timing measures what the driver pays).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metrics_service_spark.catalog import all_queries  # noqa: E402
from metrics_service_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        json_out = args[args.index("--json") + 1]
        del args[args.index("--json") : args.index("--json") + 2]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("msspark-bench-full")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up

    from metrics_service_spark.sources.bucketed import prune_stale_bucketed

    prune_stale_bucketed(
        spark,
        [sf_dir] + [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")],
    )

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, spec in all_queries().items():
        t0 = time.perf_counter()
        out = spec.fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        rows[name] = len(out)
        print(f"{name}: {timings[name]}s ({rows[name]} rows)", flush=True)

    total = round(sum(timings.values()), 3)
    record = {
        "metric": "full_catalog_sweep",
        "value": total,
        "unit": "sec",
        "reps": 1,
        "n_queries": len(timings),
        "queries": timings,
        "rows": rows,
        "sf": sf_dir,
        "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f)
    print(json.dumps({k: record[k] for k in ("metric", "value", "unit", "reps", "n_queries", "sf")}))


if __name__ == "__main__":
    main()

"""Ad-hoc differential check for selected catalog entries.

Usage:
  python tools/check_entries.py [sf_dir] name1 name2 ...
  python tools/check_entries.py [sf_dir] --all [--json OUT.json]

Runs each entry's Spark query and DuckDB oracle at sf_dir (default
/root/testdata/sf0.01) through the same bitwise comparator the test
suite uses, printing per-entry PASS/FAIL.  ``--all`` sweeps the whole
catalog; ``--json`` additionally writes a machine-readable artifact
(name -> {status, rows, seconds}) — the per-round FULLCHECK_r{N}.json
that makes "stale entries are locally bitwise-green" auditable without
re-running the 10-minute sweep (VERDICT r9 #3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metrics_service_spark.catalog import all_queries  # noqa: E402
from metrics_service_spark.session import get_spark  # noqa: E402
from metrics_service_spark.testing.oracle import OracleMismatch, compare_query  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    json_out = None
    if "--json" in args:
        json_out = args[args.index("--json") + 1]
        del args[args.index("--json") : args.index("--json") + 2]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    if vanilla:
        # driver-parity mode: the round driver builds its own PLAIN
        # session (no engine-tuned confs) — sweeping under the same
        # conditions catches any accidental conf-dependence
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-entries-vanilla")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("check-entries")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = all_queries()
    if args == ["--all"]:
        args = list(catalog)
    failed = []
    results: dict[str, dict] = {}
    for name in args:
        spec = catalog[name]
        t0 = time.perf_counter()
        try:
            if spec.oracle is None:
                n = spec.fn(spark, sf_dir).count()
                status = "rows-only"
                print(f"{name}: rows-only ({n} rows) {time.perf_counter()-t0:.1f}s")
            else:
                n = compare_query(spec.fn(spark, sf_dir), spec.oracle, sf_dir, name)
                status = "pass"
                print(f"{name}: PASS ({n} rows) {time.perf_counter()-t0:.1f}s")
        except OracleMismatch as e:
            failed.append(name)
            status, n = "fail", None
            print(f"{name}: FAIL {e}")
        except Exception as e:  # driver-sim realism: record, keep sweeping
            failed.append(name)
            status, n = "error", None
            print(f"{name}: ERROR {type(e).__name__}: {e}")
        results[name] = {
            "status": status,
            "rows": n,
            "seconds": round(time.perf_counter() - t0, 2),
        }
    if json_out:
        summary = {
            "sf_dir": sf_dir,
            "entries": len(results),
            "pass": sum(1 for r in results.values() if r["status"] == "pass"),
            "rows_only": sum(
                1 for r in results.values() if r["status"] == "rows-only"
            ),
            "fail": sorted(failed),
            "results": results,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

"""Ad-hoc differential check for selected catalog entries.

Usage: python tools/check_entries.py [sf_dir] name1 name2 ...
Runs each entry's Spark query and DuckDB oracle at sf_dir (default
/root/testdata/sf0.01) through the same bitwise comparator the test
suite uses, printing per-entry PASS/FAIL.
"""

from __future__ import annotations

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
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    spark = get_spark("check-entries")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = all_queries()
    failed = []
    for name in args:
        spec = catalog[name]
        t0 = time.perf_counter()
        if spec.oracle is None:
            n = spec.fn(spark, sf_dir).count()
            print(f"{name}: rows-only ({n} rows) {time.perf_counter()-t0:.1f}s")
            continue
        try:
            n = compare_query(spec.fn(spark, sf_dir), spec.oracle, sf_dir, name)
            print(f"{name}: PASS ({n} rows) {time.perf_counter()-t0:.1f}s")
        except OracleMismatch as e:
            failed.append(name)
            print(f"{name}: FAIL {e}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

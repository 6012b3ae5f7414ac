"""Dump `explain("formatted")` for selected catalog entries to
plans/r{N}/<name>_<suffix>.txt — the per-round plan evidence the
optimization rounds commit (VERDICT r17 #9).

Usage:
  python tools/dump_entry_plans.py <round> <suffix> name1 name2 ...
  e.g. python tools/dump_entry_plans.py r18 before emb_knn_pagerank
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metrics_service_spark.catalog import all_queries  # noqa: E402
from metrics_service_spark.session import get_spark  # noqa: E402


def main() -> None:
    rnd, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-entry-plans")
    cat = all_queries()
    for name in names:
        df = cat[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{path}: {plan.count('Exchange')} Exchange mentions, "
              f"{plan.count('Scan parquet')} parquet scans")


if __name__ == "__main__":
    main()

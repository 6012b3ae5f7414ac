"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": "..."}

Each query is executed to completion (collect) so the number is true
end-to-end wall clock including the scan; the session is warmed with a
trivial job first so JVM startup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from metrics_service_spark.catalog import all_queries  # noqa: E402
from metrics_service_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "landing_page_daily",
    "ev_sessionize",
    "counter_report",
    "sushi_instances",
    "ev_monthly_stats",
    "matview_landingpage",
    "order_chains",
    "pid_family_closure",
    "doc_exact_dedup",
    "doc_minhash_dedup",
    "doc_bpe_tokens",
    "emb_topk_bruteforce",
    "emb_cosine_neardup",
    "mm_image_meta",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("msspark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    catalog = all_queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = catalog[name].fn(spark, sf_dir)
        df.collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()

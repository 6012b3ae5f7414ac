"""Cross-day settlement for doc_dsir_vote (VERDICT r14 #5).

r14 left ONE env-of-day watch item: doc_dsir_vote read 1.34x (driver
session min-of-reps) and 2.0x (builder preview) with bit-identical
plans, zero code on its path, and a split sibling signal.  The r14
protocol says a second elevated day demands an attribution, not a
watch extension; a reverted day closes it like doc_tfidf_topk closed
in r14.

Method (the standing two-harness rule, SCALE.md):
- interleaved reps, FRESH DataFrame per rep, at $SPARK_GRAFT_SF_DIR
  (default sf0.1): the mover, its md5/Arrow CPU cohort siblings that
  stayed in-band in r14 (doc_shuffle_shard, doc_winnow_pairs,
  doc_canonical_dedup), the two r14 co-movers that reverted at the
  driver session (mm_phash_neardup, doc_hash_classifier), and flat
  scan controls (tpch_q1, doc_exact_dedup);
- expression-id-normalized md5 of the formatted plan vs the committed
  PLANS.md section (zero-code-change proof);
- verdicts against the committed min-of-reps series (BENCH_DETAIL =
  the r14 driver session, the adjudication standard SCALE.md adopted
  in r14) and the BENCH_r13/r14 medians.

Usage: python tools/ab_r15_dsir.py [reps]
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_io import load_bench_queries  # noqa: E402

MOVER = "doc_dsir_vote"
ENTRIES = [
    MOVER,
    # in-band md5/Arrow CPU cohort siblings (r14)
    "doc_shuffle_shard",
    "doc_winnow_pairs",
    "doc_canonical_dedup",
    # the r14 co-movers that reverted at the driver session
    "mm_phash_neardup",
    "doc_hash_classifier",
    # flat scan controls
    "tpch_q1",
    "doc_exact_dedup",
]


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _normalize_plan(plan: str) -> str:
    plan = re.sub(r"#\d+", "#x", plan)
    plan = re.sub(r"\[plan_id=\d+\]", "[plan_id=x]", plan)
    plan = re.sub(r"Subquery:.*", "Subquery: x", plan)
    plan = re.sub(r"cached\w*rdd\w*", "cachedrdd", plan, flags=re.I)
    # PLANS.md is generated at sf0.01; the probe runs sf0.1 — scan
    # paths and size stats are sf-dependent, the plan shape is not
    plan = re.sub(r"file:[^\s,\]\)]+", "file:x", plan)
    plan = re.sub(r"/root/testdata/sf[0-9.]+", "sfx", plan)
    plan = re.sub(r"Statistics\([^)]*\)", "Statistics(x)", plan)
    plan = re.sub(r"size=[0-9.]+\s*\w*", "size=x", plan)
    # checkpoint RDD ids and py4j call sites are session cosmetics
    plan = re.sub(r"MapPartitionsRDD\[\d+\] at \w+ at [^,]+", "MPRDD[x]", plan)
    return plan.strip()


def _committed_plan_md5(repo: str, name: str) -> str | None:
    try:
        text = open(os.path.join(repo, "PLANS.md")).read()
    except OSError:
        return None
    m = re.search(
        rf"^## {re.escape(name)}\n.*?```\n(.*?)\n```", text, re.S | re.M
    )
    if not m:
        return None
    return hashlib.md5(_normalize_plan(m.group(1)).encode()).hexdigest()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from metrics_service_spark.catalog import all_queries
    from metrics_service_spark.session import get_spark

    spark = get_spark("ab-r15-dsir")
    spark.sparkContext.setLogLevel("ERROR")
    cat = all_queries()

    # plan identity first (bit-identical-plan proof for the verdict)
    df = cat[MOVER].fn(spark, sf)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    live_md5 = hashlib.md5(_normalize_plan(plan).encode()).hexdigest()
    committed_md5 = _committed_plan_md5(repo, MOVER)

    # warm the JVM off-measurement
    cat["tpch_q1"].fn(spark, sf).collect()

    times: dict[str, list[float]] = {n: [] for n in ENTRIES}
    for rep in range(reps):
        for name in ENTRIES:
            spark.catalog.clearCache()
            t0 = time.monotonic()
            cat[name].fn(spark, sf).collect()
            times[name].append(time.monotonic() - t0)
        print(f"rep {rep + 1}/{reps} done", file=sys.stderr)

    prior_min = load_bench_queries(os.path.join(repo, "BENCH_DETAIL.json"))
    prior_med: dict[str, dict[str, float]] = {}
    for art in ("BENCH_r13.json", "BENCH_r14.json"):
        try:
            prior_med[art] = load_bench_queries(os.path.join(repo, art))
        except (OSError, ValueError):
            pass

    out = {
        "sf": sf,
        "reps": reps,
        "plan_md5_matches_committed": (
            committed_md5 is not None and live_md5 == committed_md5
        ),
        "entries": {},
    }
    for name in ENTRIES:
        rec = {
            "min": round(min(times[name]), 3),
            "median": round(_median(times[name]), 3),
            "prior_driver_min": prior_min.get(name),
        }
        for art, q in prior_med.items():
            if name in q:
                rec[f"median_{art.split('.')[0]}"] = q[name]
        out["entries"][name] = rec
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

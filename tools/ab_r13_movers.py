"""Interleaved re-measurement of the five >1.2x BENCH_r12 movers
(VERDICT r12 "What's wrong" #1): doc_span_scrub 1.17->1.52 s (1.30x,
and its file — operators/dedup.py — WAS touched by r12, so this one
especially owes a number), emb_knn_hubness 1.25x, mm_phash_neardup
1.24x, doc_curation_pipeline 1.23x, doc_temperature_mix 1.20x.  All
are <= 0.35 s absolute and inside the documented box band; the r12
mover A/B showed this cohort pattern is usually box variance — this
run gives each its committed number per the repo's canonical-number
rule (SCALE.md:542-560 precedent).

Method: all five movers plus two controls (tpch_q1, doc_exact_dedup —
untouched AND inside the band in r12) timed interleaved within each
rep round so box drift hits every entry equally; a FRESH DataFrame per
rep (Spark reuses materialized shuffle output across actions, so
re-running a warm frame skips the stages being timed).  Median of N,
compared against the committed BENCH_r11/BENCH_r12 medians.

Usage: python tools/ab_r13_movers.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_io import load_bench_queries  # noqa: E402

from metrics_service_spark.catalog import all_queries  # noqa: E402
from metrics_service_spark.session import get_spark  # noqa: E402

MOVERS = [
    "doc_span_scrub",
    "emb_knn_hubness",
    "mm_phash_neardup",
    "doc_curation_pipeline",
    "doc_temperature_mix",
]
CONTROLS = [
    "tpch_q1",
    "doc_exact_dedup",
    # file-sibling controls: share the movers' modules (dedup.py span
    # family, the knn-graph seam) but were in-band in r12 — if they
    # move with the movers the cause is module/infra-level, if they
    # stay flat it's entry-specific
    "doc_dup_spans",
    "emb_knn_graph",
]


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prior = {}
    for r in ("BENCH_r11.json", "BENCH_r12.json"):
        # shared robust reader (tools/bench_io.py): handles all three
        # artifact shapes incl. tails truncated at either end, raises
        # a named error instead of a bare rindex ValueError
        try:
            prior[r] = load_bench_queries(os.path.join(repo, r))
        except (OSError, ValueError) as exc:
            print(f"skipping {r}: {exc}", file=sys.stderr)
            prior[r] = {}

    spark = get_spark("ab-r13-movers")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    catalog = all_queries()
    names = MOVERS + CONTROLS
    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for n in names:
            t0 = time.perf_counter()
            catalog[n].fn(spark, sf).collect()
            samples[n].append(time.perf_counter() - t0)
        print(f"rep {rep + 1}/{reps} done", file=sys.stderr)

    print(f"{'entry':24s} {'r11':>7s} {'r12':>7s} {'now':>7s}  verdict")
    for n in names:
        r11 = prior["BENCH_r11.json"].get(n)
        r12 = prior["BENCH_r12.json"].get(n)
        med = _median(samples[n])
        priors = [x for x in (r11, r12) if x is not None]
        base = min(priors) if priors else med
        tag = "control" if n in CONTROLS else (
            "reverted/box" if med <= 1.15 * base else "REAL +%d%%" % round(100 * (med / base - 1))
        )
        print(
            f"{n:24s} {r11 if r11 is not None else float('nan'):7.3f} "
            f"{r12 if r12 is not None else float('nan'):7.3f} {med:7.3f}  {tag}"
        )
        print(f"  samples: {[round(x, 3) for x in samples[n]]}")


if __name__ == "__main__":
    main()

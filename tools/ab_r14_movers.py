"""Interleaved re-measurement of the BENCH_r13 >1.2x movers (VERDICT
r13 "What's wrong" #2): the committed r13 artifact is the slow
close-sweep session and carries a 12-entry mover list (doc_ccnet_bucket
1.44x, doc_cms_ngram_error 1.41x, doc_winnow_pairs 1.40x, ...), while
BENCH_DETAIL's min-of-reps from the same round sits at 0.563x baseline.
SCALE.md's r13 two-harness analysis says cohort/session context; the
repo's canonical-number rule says the committed artifact still owes a
per-entry number — especially doc_cms_ngram_error, whose file
(operators/sketch.py) r13 touched.

Method (the r13 rule): movers + scan controls + FILE-SIBLING controls
(same modules, in-band last round) timed interleaved per rep with a
FRESH DataFrame each time; the mover list is recomputed from the
committed artifacts rather than hardcoded.  Verdict per entry compares
BOTH median and min-of-reps against the best committed prior —
min-of-reps is the session-noise-robust series (VERDICT r13 suggests
it as canonical).

Usage: python tools/ab_r14_movers.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_io import load_bench_queries  # noqa: E402

from metrics_service_spark.catalog import all_queries  # noqa: E402
from metrics_service_spark.session import get_spark  # noqa: E402

CONTROLS = [
    # scan controls: untouched files, in-band all round
    "tpch_q1",
    "doc_exact_dedup",
    # file-sibling controls: share the mover modules (dedup.py,
    # similarity.py, llm.py mixture family) but were IN-band in r13 —
    # movers+siblings rising together = session/cohort, movers alone =
    # entry-specific regression
    "doc_dup_spans",
    "emb_knn_graph",
    "doc_mixture",
]


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prior: dict[str, dict[str, float]] = {}
    for r in ("BENCH_r12.json", "BENCH_r13.json", "BENCH_DETAIL.json"):
        try:
            prior[r] = load_bench_queries(os.path.join(repo, r))
        except (OSError, ValueError) as exc:
            print(f"skipping {r}: {exc}", file=sys.stderr)
            prior[r] = {}

    q12, q13 = prior["BENCH_r12.json"], prior["BENCH_r13.json"]
    movers = sorted(
        (
            k
            for k in q13
            if k in q12 and q12[k] > 0 and q13[k] / q12[k] > 1.2
        ),
        key=lambda k: q13[k] / q12[k],
        reverse=True,
    )
    print(f"recomputed mover list ({len(movers)}): {movers}", file=sys.stderr)

    spark = get_spark("ab-r14-movers")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    catalog = all_queries()
    names = movers + [c for c in CONTROLS if c not in movers]
    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for n in names:
            t0 = time.perf_counter()
            catalog[n].fn(spark, sf).collect()
            samples[n].append(time.perf_counter() - t0)
        print(f"rep {rep + 1}/{reps} done", file=sys.stderr)

    print(
        f"{'entry':26s} {'r12':>7s} {'r13':>7s} {'det':>7s} "
        f"{'med':>7s} {'min':>7s}  verdict"
    )
    for n in names:
        r12 = q12.get(n)
        r13 = q13.get(n)
        det = prior["BENCH_DETAIL.json"].get(n)
        med = _median(samples[n])
        lo = min(samples[n])
        priors = [x for x in (r12, r13, det) if x is not None]
        base = min(priors) if priors else med

        def f(x: float | None) -> str:
            return f"{x:7.3f}" if x is not None else "      -"

        if n in CONTROLS:
            tag = "control"
        elif lo <= 1.15 * base:
            tag = "reverted/box"
        else:
            tag = f"REAL +{round(100 * (lo / base - 1))}% (min vs best prior)"
        print(f"{n:26s} {f(r12)} {f(r13)} {f(det)} {med:7.3f} {lo:7.3f}  {tag}")
        print(f"  samples: {[round(x, 3) for x in samples[n]]}")


if __name__ == "__main__":
    main()

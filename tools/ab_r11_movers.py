"""Interleaved A/B attribution of the two >1.2x BENCH_r10 movers
(VERDICT r10 #4): emb_curation_pipeline 1.098 -> 1.487 s (+35%) and
emb_knn_graph 0.878 -> 1.06 s (+21%), with emb_contamination (code
untouched in r10; itself moved -29% in the same artifact) as the
box-noise control.

Two parts:

1. STRUCTURAL no-op check for the r10 suspect changes at sf0.1
   geometry: the ADVICE-r9 hier `g` derivation (requested-cells
   formula vs collected-seed count) selects the identical coarse
   split at 2000 rows / 16 cells, and the knn hier front's per-row
   dot count (g + avg cells/group) vs the old flat front's (n_cells)
   is computed, not assumed.

2. MEASURED interleaved medians: fresh DataFrame per rep (Spark
   reuses materialized shuffle output across actions, so re-running
   the same DataFrame skips the stages being timed — each rep
   rebuilds the lineage from scratch), A/B/control alternating within
   each rep round so box drift hits all arms equally.  Same session,
   local[32], sf0.1, median of N.

Usage: python tools/ab_r11_movers.py [reps]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metrics_service_spark.catalog import all_queries  # noqa: E402
from metrics_service_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def structural_check(spark) -> None:
    from metrics_service_spark.catalog.llm import _derived_cells
    from metrics_service_spark.operators.similarity import _md5_seed_centroids
    from metrics_service_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.count()
    cells = _derived_cells(SF_DIR)
    seeds = _md5_seed_centroids(emb, "vec_id", "embedding", cells)
    g_new = math.ceil(math.sqrt(cells))  # r10 ADVICE formula (requested)
    g_old = math.ceil(math.sqrt(len(seeds)))  # pre-r10 (collected count)
    print(
        f"[structural] rows={rows} derived_cells={cells} seeds={len(seeds)} "
        f"g(requested)={g_new} g(collected)={g_old} "
        f"-> curation suspect change is a {'NO-OP' if g_new == g_old else 'REAL SWITCH'}"
    )
    # per-row assignment dot counts, hier vs flat, at this geometry
    per_row_hier = g_new + cells / g_new
    print(
        f"[structural] knn assignment dots/row: flat={cells} "
        f"hier~{per_row_hier:.1f} -> hier is "
        f"{'cheaper/equal' if per_row_hier <= cells else 'costlier'} at sf0.1"
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark("ab-r11-movers")
    spark.sparkContext.setLogLevel("ERROR")
    structural_check(spark)

    catalog = all_queries()
    arms = ["emb_curation_pipeline", "emb_knn_graph", "emb_contamination"]
    # warm the JVM/codegen the same way bench.py does
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in arms:
        catalog[name].fn(spark, SF_DIR).collect()

    samples: dict[str, list[float]] = {a: [] for a in arms}
    for r in range(reps):
        for name in arms:  # interleaved: every round touches all arms
            t0 = time.perf_counter()
            catalog[name].fn(spark, SF_DIR).collect()
            samples[name].append(time.perf_counter() - t0)
    committed = {  # (r9, r10) driver medians
        "emb_curation_pipeline": (1.098, 1.487),
        "emb_knn_graph": (0.878, 1.06),
        "emb_contamination": (1.276, 0.911),
    }
    print(f"\nmedians of {reps} interleaved reps at {SF_DIR}:")
    ctrl = _median(samples["emb_contamination"])
    for name in arms:
        med = _median(samples[name])
        r9, r10 = committed[name]
        print(
            f"  {name}: {med:.3f}s  (committed r9={r9} r10={r10})  "
            f"ratio-to-control now={med / ctrl:.2f} r9={r9 / 1.276:.2f} "
            f"r10={r10 / 0.911:.2f}  all={['%.3f' % x for x in samples[name]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

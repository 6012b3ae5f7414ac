"""A/B probe for VERDICT r10 #6: hop-composed doubling on the
near-dup keep-list CC paths (doc_dedup_clusters, mm_dedup_clusters —
currently connected_components(max_iters=12, hop=1, early_stop=True);
their walls are ~60% sequential-barrier job-launch floor).

`hop=h` squares/cubes the symmetrized edge relation once up front so
labels travel h steps per round: rounds drop from ~diameter to
~diameter/h, each round being a barrier (join + agg + checkpoint +
emptiness probe). The trade is the composition's own shuffles and the
O(sum deg^h) composed-edge mass — near-dup graphs can be hub-heavy
(boilerplate cliques), which is exactly what the 50x leg tests: the
scale_probe replication is token-disjoint per copy, so cluster/degree
structure per copy matches the base and a hop blowup would surface as
super-linear composed-edge growth.

Method: the pair frame is built ONCE per graph and eagerly
materialized (count) so the A/B times ONLY the CC stage; hop arms are
interleaved per rep round (box drift hits all arms equally), fresh
CC DataFrames per rep (Spark reuses materialized shuffle output
across actions, so a re-run on the same DataFrame skips the very
stages being timed — each rep must rebuild the lineage from scratch).

Usage:
  python tools/ab_hop_cc.py            # sf0.1 A/B, both graphs
  python tools/ab_hop_cc.py --k50 DIR  # 50x leg: phash pair-graph CC
                                       # on DIR (a scale_probe
                                       # scratch dir)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from metrics_service_spark.session import get_spark  # noqa: E402
from metrics_service_spark.sources.tables import load_table  # noqa: E402

HOPS = (1, 2, 3)
REPS = 5


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def _jaccard_pairs(spark, sf_dir):
    from metrics_service_spark.catalog.llm import (
        CLUSTERS_MAX_CELL,
        JACCARD_THRESHOLD,
    )
    from metrics_service_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs,
        "doc_id",
        "text",
        n=3,
        block_cols=["lang"],
        threshold=JACCARD_THRESHOLD,
        max_cell=CLUSTERS_MAX_CELL,
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))


def _phash_pairs(spark, sf_dir):
    from metrics_service_spark.catalog.multimodal import _media
    from metrics_service_spark.operators.multimodal import (
        phash_near_duplicates,
    )

    return phash_near_duplicates(_media(spark, sf_dir), max_hamming=7).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )


def ab_cc(spark, label, pairs_df):
    from metrics_service_spark.operators.closure import connected_components

    pairs = pairs_df.localCheckpoint(eager=True)
    n_edges = pairs.count()
    # composed-edge mass per hop — the blowup signal, measured not assumed
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    masses = {1: n_edges}
    comp = sym
    for h in (2, 3):
        comp = (
            comp.alias("a")
            .join(sym.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .unionByName(comp)
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        masses[h] = comp.count()
    print(
        f"[{label}] edges={n_edges} composed<=2hop={masses[2]} "
        f"<=3hop={masses[3]} (x{masses[2]/max(n_edges,1):.1f} / "
        f"x{masses[3]/max(n_edges,1):.1f})"
    )
    samples = {h: [] for h in HOPS}
    for _ in range(REPS):
        for h in HOPS:
            t0 = time.perf_counter()
            connected_components(pairs, max_iters=12, hop=h).count()
            samples[h].append(time.perf_counter() - t0)
    for h in HOPS:
        print(
            f"[{label}] hop={h}: median {_median(samples[h]):.3f}s  "
            f"all={['%.2f' % x for x in samples[h]]}"
        )


def main() -> None:
    spark = get_spark("ab-hop-cc")
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 1 and sys.argv[1] == "--synth50":
        # Faithful 50x pair graph BY CONSTRUCTION: replicate the 1x
        # phash pair graph with node-id-offset-disjoint copies — the
        # graph a token-disjoint 50x corpus produces (per-copy
        # structure identical, zero cross-copy edges).  Corpus-level
        # replicas can't produce this for phash: 64-bit phash at
        # hamming<=7 is birthday-dense, so 50x the docs fabricates
        # 282-720x the edges (measured; both replica variants OOM'd
        # the label prop) — that measures the replica, not the
        # operator.
        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        k = 50
        base = _phash_pairs(spark, sf).localCheckpoint(eager=True)
        copies = F.broadcast(spark.range(k).withColumnRenamed("id", "__c"))
        synth = base.crossJoin(copies).select(
            (F.col("src") + F.col("__c") * 10_000_000).alias("src"),
            (F.col("dst") + F.col("__c") * 10_000_000).alias("dst"),
        )
        ab_cc(spark, "phash-synth50", synth)
    elif len(sys.argv) > 2 and sys.argv[1] == "--k50":
        # corpus-level replica leg (kept for the record; see --synth50)
        ab_cc(spark, "phash-50x", _phash_pairs(spark, sys.argv[2]))
    else:
        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        ab_cc(spark, "jaccard-sf0.1", _jaccard_pairs(spark, sf))
        ab_cc(spark, "phash-sf0.1", _phash_pairs(spark, sf))
    spark.stop()


if __name__ == "__main__":
    main()

"""Iterative graph operators: transitive closure / chain resolution.

Reference semantics (SURVEY.md J1/J2): `getResolvePIDs`
(pid_resolution.py:285-416) and `getObsolescenceChain`
(pid_resolution.py:207-282, max_depth=20) walk a PID graph one Solr
round-trip at a time.  Spark has no recursive CTE, so the idiomatic
replacement is a driver-side loop of distributed joins to fixpoint —
each iteration is ONE shuffle join over the whole frontier instead of
N client round-trips.

Scale notes:
- Frontier joins shrink each round; `localCheckpoint` every few rounds
  truncates the lineage so plan size stays O(1) instead of O(depth).
- Iterations are capped (the reference caps chain depth at 20); beyond
  that, GraphFrames connectedComponents (large-star/small-star, ~log n
  rounds) is the right tool for full family resolution of 10^8 edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECKPOINT_EVERY = 5


def resolve_chains(
    edges: DataFrame,
    *,
    child: str = "child",
    parent: str = "parent",
    max_depth: int = 20,
) -> DataFrame:
    """Resolve parent-pointer chains (obsoletes graph, J2) to their roots.

    `edges` has one row per node: (child, parent) with parent NULL for
    roots.  Returns (node, root, depth): depth 0 for roots, k for a node
    k hops below its root.  Mirrors getObsolescenceChain semantics with
    the reference's depth cap, but resolves ALL chains in O(depth)
    distributed joins instead of one walk per queried id.
    """
    nodes = edges.select(F.col(child).alias("node"), F.col(parent).alias("__parent"))
    frontier = (
        nodes.filter(F.col("__parent").isNull())
        .select(
            F.col("node"),
            F.col("node").alias("root"),
            F.lit(0).alias("depth"),
        )
    )
    resolved = frontier
    for depth in range(1, max_depth + 1):
        frontier = (
            nodes.alias("e")
            .join(frontier.alias("f"), F.col("e.__parent") == F.col("f.node"), "inner")
            .select(
                F.col("e.node").alias("node"),
                F.col("f.root").alias("root"),
                F.lit(depth).alias("depth"),
            )
        )
        # materialize each round: truncates lineage AND lets us stop at
        # fixpoint instead of always paying max_depth joins
        frontier = frontier.localCheckpoint(eager=True)
        if frontier.rdd.isEmpty():
            break
        resolved = resolved.unionByName(frontier)
    return resolved


def expand_family(
    seeds: DataFrame,
    edges: DataFrame,
    *,
    seed_col: str = "pid",
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """Transitive closure from seed ids over an undirected-ish edge set
    (J1 `getResolvePIDs` fixpoint: resourceMap/documents/seriesId
    expansion).  Returns (seed, member) pairs including (seed, seed).

    Each round joins the new frontier to the edge list and unions in
    unseen members; terminates at fixpoint or after max_iters (the
    reference's two nested expansion loops are the same computation done
    one id at a time).
    """
    family = seeds.select(
        F.col(seed_col).alias("seed"), F.col(seed_col).alias("member")
    ).distinct()
    frontier = family
    for it in range(max_iters):
        grown = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.member") == F.col(f"e.{src}"), "inner")
            .select(F.col("f.seed").alias("seed"), F.col(f"e.{dst}").alias("member"))
            .distinct()
        )
        frontier = grown.join(family, ["seed", "member"], "left_anti")
        frontier = frontier.localCheckpoint(eager=True)
        if frontier.rdd.isEmpty():
            break
        family = family.unionByName(frontier).localCheckpoint(eager=True)
    return family

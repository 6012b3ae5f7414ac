"""Connected-components algorithm tests: large-star/small-star equals
min-label propagation on random graphs, converges in few rounds on long
chains, and matches hand-computed components."""

from __future__ import annotations

import random

import pytest

from metrics_service_spark.operators.closure import (
    connected_components,
    connected_components_star,
)


def _cc_py(edges):
    """Reference union-find."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", [0, 5])
def test_star_matches_unionfind_random(spark, seed):
    rng = random.Random(seed)
    edges = [
        (rng.randint(0, 80), rng.randint(0, 80)) for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    want = _cc_py(edges)
    got = {
        r.node: r.component for r in connected_components_star(df).collect()
    }
    assert got == want
    got_prop = {
        r.node: r.component for r in connected_components(df, max_iters=90).collect()
    }
    assert got_prop == want


def test_star_long_chain_few_rounds(spark):
    # a 200-node path: min-propagation needs ~200 rounds; the star
    # algorithm must finish within its default max_iters (log-round)
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.component
        for r in connected_components_star(df, max_iters=12).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 201

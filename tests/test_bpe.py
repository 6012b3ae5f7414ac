"""BPE training operator guards: greedy-scan semantics, tie-breaks,
the loud pair-exhaustion raise, and apply fallbacks — the invariants
the relational oracle depends on (operators/bpe.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.operators.bpe import (
    bpe_apply_counts,
    bpe_train,
    merge_pair_scan,
    word_frequencies,
)


def _scan(spark, syms, left, right):
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    return df.select(merge_pair_scan(F.col("syms"), left, right).alias("m")).first()["m"]


def test_greedy_non_overlapping_runs(spark):
    # left-to-right non-overlap in same-symbol runs: aaaa -> (aa)(aa),
    # aaa -> (aa)a; the freshly-merged token never chains in-round
    assert _scan(spark, list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _scan(spark, list("aaa"), "a", "a") == ["aa", "a"]
    assert _scan(spark, ["aa", "a", "a"], "a", "a") == ["aa", "aa"]


def test_scan_distinct_pair_and_misses(spark):
    assert _scan(spark, list("banana"), "a", "n") == ["b", "an", "an", "a"]
    assert _scan(spark, list("banana"), "x", "y") == list("banana")
    assert _scan(spark, ["a"], "a", "a") == ["a"]
    assert _scan(spark, [], "a", "a") == []


def test_argmax_tiebreak_lexicographic(spark):
    # 'ba' and 'ab' tie at count 2; (count DESC, l, r) must pick (a, b)
    docs = spark.createDataFrame([("abab",), ("ba",)], "text string")
    table = bpe_train(docs, "text", n_merges=1).collect()
    assert (table[0]["left_sym"], table[0]["right_sym"]) == ("a", "b")
    assert table[0]["pair_count"] == 2


def test_train_raises_on_pair_exhaustion(spark):
    # single-character vocabulary: no pairs at all -> loud failure,
    # never a short merge table that disagrees with the fixed-round
    # oracle (the codebase's iterative-operator standard)
    docs = spark.createDataFrame([("a b c",)], "text string")
    with pytest.raises(ValueError, match="no mergeable pairs"):
        bpe_train(docs, "text", n_merges=1)


def test_word_filter_and_apply_fallback(spark):
    # '1234' and over-long words are excluded from training and count
    # as ONE unit on apply; vocabulary words count as len(final syms)
    docs = spark.createDataFrame(
        [(1, "abab abab 1234 " + "z" * 25)], "doc_id int, text string"
    )
    vocab = {r["w"] for r in word_frequencies(docs, "text").collect()}
    assert vocab == {"abab"}
    out = bpe_apply_counts(docs, "doc_id", "text", n_merges=1).first()
    # merge (a,b) -> abab segments to [ab, ab] = 2 units; 1234 and the
    # long word fall back to 1 unit each
    assert out["n_ws_tokens"] == 4
    assert out["n_bpe_units"] == 2 + 2 + 1 + 1


def test_train_matches_handrolled_reference(spark):
    # classic two-round check on a corpus small enough to verify by
    # hand: freqs ab:3 abc:1 -> round0 merges (a,b) count 4; round1
    # pairs: (ab,c):1 -> merges (ab, c)
    docs = spark.createDataFrame([("ab ab ab abc",)], "text string")
    rows = bpe_train(docs, "text", n_merges=2).collect()
    assert [(r["left_sym"], r["right_sym"], r["pair_count"]) for r in rows] == [
        ("a", "b", 4),
        ("ab", "c", 1),
    ]

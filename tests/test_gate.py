"""top_fraction: exact distributed percentile gate vs the percent_rank
definition, including tie boundaries and degenerate fractions."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from metrics_service_spark.operators.gate import top_fraction, top_fraction_approx


def _exact(df, frac):
    w = Window.orderBy(F.col("q").desc(), F.col("doc_id").asc())
    return sorted(
        r.doc_id
        for r in df.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= frac)
        .select("doc_id")
        .collect()
    )


@pytest.fixture(scope="module")
def tied_scores(spark):
    # heavy ties: only 3 distinct scores over 97 rows, so every frac
    # lands inside a tie group and exercises the boundary resolution
    rows = [
        (i, float(s)) for i, s in zip(range(97), itertools.cycle([1.0, 2.0, 2.0, 3.0]))
    ]
    return spark.createDataFrame(rows, "doc_id long, q double").repartition(8)


@pytest.mark.parametrize("frac", [0.0, 0.1, 0.5, 0.77, 1.0])
def test_top_fraction_matches_percent_rank(tied_scores, frac):
    got = sorted(
        r.doc_id
        for r in top_fraction(
            tied_scores, score_col="q", id_col="doc_id", frac=frac
        ).collect()
    )
    assert got == _exact(tied_scores, frac)


def test_top_fraction_single_row(spark):
    df = spark.createDataFrame([(7, 1.5)], "doc_id long, q double")
    got = [
        r.doc_id
        for r in top_fraction(df, score_col="q", id_col="doc_id", frac=0.5).collect()
    ]
    assert got == [7]


def test_top_fraction_approx_brackets_exact(tied_scores):
    # the approx gate keeps at least the exact top set's score range
    # (ties at the cutoff are all kept), never fewer distinct scores
    got = set(
        r.doc_id
        for r in top_fraction_approx(
            tied_scores, score_col="q", id_col="doc_id", frac=0.5, relative_error=0.01
        ).collect()
    )
    exact = set(_exact(tied_scores, 0.5))
    assert exact - got == set() or got - exact == set()  # one contains the other


# --- hypothesis: top_fraction == percent_rank on arbitrary multisets ------
try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @given(
        scores=st.lists(
            st.integers(min_value=0, max_value=5), min_size=1, max_size=40
        ),
        frac=st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]),
    )
    @settings(max_examples=12, deadline=None)
    @pytest.mark.slow
    def test_top_fraction_hypothesis(spark, scores, frac):
        """Arbitrary small-integer score multisets (maximal ties) at
        several fracs: the histogram gate must equal percent_rank."""
        df = spark.createDataFrame(
            [(i, float(s)) for i, s in enumerate(scores)], "doc_id long, q double"
        )
        got = sorted(
            r.doc_id
            for r in top_fraction(
                df, score_col="q", id_col="doc_id", frac=frac
            ).collect()
        )
        assert got == _exact(df, frac)


def test_top_fraction_with_null_scores(spark):
    """NULL scores sort last (like percent_rank's desc window); a
    cutoff landing inside the NULL group must not empty the result."""
    df = spark.createDataFrame(
        [(1, 3.0), (2, 1.0), (3, None)], "doc_id long, q double"
    )
    for frac in [0.0, 0.5, 1.0]:
        got = sorted(
            r.doc_id
            for r in top_fraction(
                df, score_col="q", id_col="doc_id", frac=frac
            ).collect()
        )
        assert got == _exact(df, frac), frac


def test_group_quantile_disc_nulls_last(spark):
    """NULL values rank after every real value (SQL-standard ORDER BY,
    matching the DuckDB oracle): the median of [1, 2, NULL] is 2, and
    a group of only NULLs yields a NULL quantile."""
    from metrics_service_spark.operators.gate import group_quantile_disc

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", None), ("h", None)],
        "grp string, q double",
    )
    got = {
        r.grp: r.q_value
        for r in group_quantile_disc(df, ["grp"], "q", 0.5).collect()
    }
    assert got["g"] == 2.0  # k = floor(2*0.5)+1 = 2 -> second value
    assert got["h"] is None


def test_percentile_buckets_matches_window_twin(spark):
    """percentile_buckets must be bit-identical to the global-sort
    window CASE over (score DESC, id ASC) — including boundary groups
    whose score value is tied across the cutoff."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from metrics_service_spark.operators.gate import percentile_buckets

    # heavy ties on purpose: score = id // 3 gives 3-row tie groups
    df = spark.createDataFrame(
        [(i, float(i // 3)) for i in range(40)], "doc_id long, score double"
    )
    got = {
        (r.doc_id, r.score): r.bucket
        for r in percentile_buckets(
            df, score_col="score", id_col="doc_id", fracs=(1 / 3, 2 / 3)
        ).collect()
    }
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    n = df.count()
    twin = {
        (r.doc_id, r.score): r.bucket
        for r in df.withColumn("r", F.row_number().over(w))
        .select(
            "doc_id",
            "score",
            F.when(
                F.col("r") <= F.floor(F.lit((n - 1) * (1 / 3))) + 1, "head"
            )
            .when(
                F.col("r") <= F.floor(F.lit((n - 1) * (2 / 3))) + 1, "middle"
            )
            .otherwise("tail")
            .alias("bucket"),
        )
        .collect()
    }
    assert got == twin


def test_percentile_buckets_label_arity(spark):
    import pytest as _pytest

    from metrics_service_spark.operators.gate import percentile_buckets

    df = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    with _pytest.raises(ValueError, match="one more label"):
        percentile_buckets(
            df, score_col="score", id_col="doc_id",
            fracs=(0.5,), labels=("a", "b", "c"),
        )


def test_percentile_buckets_cardinality_guard(spark):
    """Raw continuous scores must ERROR (fail-fast inline assert), not
    silently build a corpus-sized single-task histogram window; under
    the cap the same frame bucketizes fine (VERDICT r8 #7)."""
    import pytest as _pytest

    from metrics_service_spark.operators.gate import percentile_buckets

    df = spark.createDataFrame(
        [(i, float(i) + 0.123) for i in range(50)], "doc_id long, score double"
    )
    with _pytest.raises(Exception, match="max_distinct_scores"):
        percentile_buckets(
            df, score_col="score", id_col="doc_id", max_distinct_scores=10
        ).collect()
    out = percentile_buckets(
        df, score_col="score", id_col="doc_id", max_distinct_scores=50
    ).collect()
    assert len(out) == 50

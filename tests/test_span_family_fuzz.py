"""Differential fuzz for the duplicate-span family.

The fixed driver corpus exercises one boilerplate distribution; these
generate adversarial tiny corpora — empty docs, single tokens, docs
shorter than the window, fully-duplicated docs, near-boundary overlaps
— and require the Spark pipelines and their DuckDB oracles to agree
bitwise on every draw.  A tiny alphabet forces window collisions so
the duplicate machinery actually fires.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from metrics_service_spark.catalog.llm import (
    ORACLE_DUP_SPAN_RUNS,
    ORACLE_DUP_SPANS,
    ORACLE_DUP_SPANS_COUNTS,
    ORACLE_DUP_SPANS_FRAC,
    ORACLE_SPAN_SCRUB,
    SPAN_WINDOW,
)
from metrics_service_spark.operators.dedup import (
    duplicate_span_runs,
    duplicate_span_scrub,
    duplicate_span_stats,
)
from metrics_service_spark.testing.oracle import compare_query
import pytest

# multi-minute suite: excluded from the fast default run (pytest.ini)
pytestmark = pytest.mark.slow

# 3-token alphabet, docs up to 2.5x the window: collisions are the
# norm, and lengths straddle the shorter-than-window convention
_doc = st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=0, max_size=SPAN_WINDOW * 2 + 4
).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=12)


def _write(spark, tmp_path, texts):
    # ONE parquet file (pyarrow), matching the driver fixture layout —
    # a Spark directory-write would break the oracle's read_parquet
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["src"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int32()),
            }
        ),
        os.path.join(sf_dir, "documents.parquet"),
    )
    return sf_dir


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_span_family_matches_oracle_on_adversarial_corpora(
    spark, tmp_path, texts
):
    sf_dir = _write(spark, tmp_path, texts)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    compare_query(
        duplicate_span_stats(docs, "doc_id", "text", window_tokens=SPAN_WINDOW),
        ORACLE_DUP_SPANS,
        sf_dir,
        "fuzz:dup_spans",
    )
    compare_query(
        duplicate_span_stats(
            docs, "doc_id", "text", window_tokens=SPAN_WINDOW
        ).select("doc_id", "n_windows", "dup_windows"),
        ORACLE_DUP_SPANS_COUNTS,
        sf_dir,
        "fuzz:dup_spans_counts",
    )
    compare_query(
        duplicate_span_stats(
            docs,
            "doc_id",
            "text",
            window_tokens=SPAN_WINDOW,
            frac_rounding="bigint",
        ).select("doc_id", "dup_frac_scaled"),
        ORACLE_DUP_SPANS_FRAC,
        sf_dir,
        "fuzz:dup_spans_frac",
    )
    compare_query(
        duplicate_span_scrub(docs, "doc_id", "text", window_tokens=SPAN_WINDOW),
        ORACLE_SPAN_SCRUB,
        sf_dir,
        "fuzz:span_scrub",
    )
    compare_query(
        duplicate_span_runs(docs, "doc_id", "text", window_tokens=SPAN_WINDOW),
        ORACLE_DUP_SPAN_RUNS,
        sf_dir,
        "fuzz:span_runs",
    )

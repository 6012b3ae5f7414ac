"""Streaming content-hash dedup gate via applyInPandasWithState.

The admission control a continuously-ingested training corpus needs:
only the FIRST document with a given content hash passes; repeats
within the TTL horizon are counted and dropped.  Complements the batch
dedup family (operators/dedup.py) with the streaming shape, and the
checkpoint/idempotency story of streaming/ingest.py (which guards
against re-processed FILES — this guards against re-submitted
CONTENT).

State per content hash: (first-seen epoch us, duplicates dropped) —
16 B; event-time timeout one TTL past the watermark bounds the hash
set to content seen within the horizon, so state never grows with
corpus history.  At 100 TB scale the gate holds only the active
window's hashes, and the pass-through stream feeds the batch MinHash
pipeline for near-dup (exact-dup is the cheap first stage of the
funnel).

Beyond the reference surface (training-pipeline operator); the state
machine mirrors streaming/stateful.py's session assigner discipline:
concatenate all Arrow chunks, sort by event time, reset the index.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("is_first", T.BooleanType()),
        T.StructField("n_dropped_so_far", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_ts_us", T.LongType()),
        T.StructField("n_dropped", T.LongType()),
    ]
)


def _make_gate(ttl_minutes: int):
    ttl_ms = ttl_minutes * 60_000

    def gate(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values("event_ts", kind="stable").reset_index(drop=True)
        if state.exists:
            first_us, n_dropped = state.get
        else:
            first_us, n_dropped = None, 0
        out_first, out_dropped = [], []
        max_ts_ms = 0
        for ts in pdf["event_ts"]:
            ts_us = int(ts.value // 1_000)
            max_ts_ms = max(max_ts_ms, ts_us // 1_000)
            if first_us is None:
                first_us = ts_us
                out_first.append(True)
            else:
                n_dropped += 1
                out_first.append(False)
            out_dropped.append(n_dropped)
        state.update((first_us, n_dropped))
        # timeout anchored on EVENT time, never the watermark alone: the
        # first micro-batch runs with watermark 0, and an epoch-based
        # timeout would evict all state on the next batch (re-admitting
        # later duplicates as first).  max(event, watermark) keeps the
        # required timeout > watermark invariant for late batches.
        state.setTimeoutTimestamp(
            max(max_ts_ms, state.getCurrentWatermarkMs()) + ttl_ms
        )
        yield pd.DataFrame(
            {
                "content_hash": pdf["content_hash"],
                "doc_id": pdf["doc_id"],
                "event_ts": pdf["event_ts"],
                "is_first": pd.Series(out_first, dtype="bool"),
                "n_dropped_so_far": pd.Series(out_dropped, dtype="int64"),
            }
        )

    return gate


def dedup_gate_stream(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "event_ts",
    ttl_minutes: int = 120,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact-dedup admission: input is a stream of documents
    with an event-time column; output carries every document tagged
    `is_first` (admit) or not (drop) plus the running duplicate count
    for its content hash.  Filter `is_first` for the admitted stream;
    aggregate the rest for dedup telemetry."""
    hashed = docs.select(
        F.md5(F.col(text_col)).alias("content_hash"),
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(ts_col).alias("event_ts"),
    ).withWatermark("event_ts", watermark)
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _make_gate(ttl_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

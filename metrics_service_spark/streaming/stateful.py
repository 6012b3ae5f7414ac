"""Exact-fidelity streaming sessionization via applyInPandasWithState.

`session_window` (streaming/sessions.py) emits one row per CLOSED
session — the idiomatic shape.  The reference, however, assigns a
session id to EVERY EVENT as it arrives and keeps a per-IP live-session
dict with a 60-minute TTL (metricselasticsearch.py:31-32, 942-1011,
1015-1072).  This operator reproduces that per-event assignment shape
with bounded distributed state:

- state per key: (last event epoch, session sequence) — exactly the
  reference's live-session entry (getLiveSessionsBeforeMark:754-787).
- new session when gap > TTL (strict >, SESSION_TTL_MINUTES:32).
- events with NULL timestamps get session -1, the reference's
  quarantine convention for parse/geoip failures
  (metricselasticsearch.py:964-978, ST8).
- state expires via event-time timeout one gap past the watermark —
  the declarative replacement for the reference's repair loop
  (removeStaleSessionIds, :887-931): late events inside the watermark
  are handled by state, later ones are dropped upstream.

Session identity is the composite (key, session_seq) as in the batch
operator (operators/sessionize.py) — order-independent and
parallelizable, unlike the reference's global monotone counter which
serializes all ingest through one id generator (getNextSessionId,
:598-627).

Scale: state is (8B + 8B) per live key, partitioned across executors;
watermark + timeout bound the live-key set to keys active in the last
watermark+gap window.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("dateLogged", T.TimestampType()),
        T.StructField("session_seq", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("session_seq", T.LongType()),
    ]
)


def _make_assigner(gap_minutes: int, timeout_extra_ms: int):
    gap_us = gap_minutes * 60_000_000

    def assign(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_ts, seq = state.get if state.exists else (None, 0)
        # Concatenate every chunk of the micro-batch before sorting:
        # event-time order must hold across Arrow-batch boundaries, and
        # the reset_index keeps the sorted timestamps positionally
        # aligned with the session numbers computed below (a dict-of-
        # Series construction would realign on the permuted index).
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values("dateLogged", kind="stable").reset_index(drop=True)
            out_seq = []
            for ts in pdf["dateLogged"]:
                if pd.isna(ts):
                    out_seq.append(-1)  # quarantine (ST8)
                    continue
                ts_us = int(ts.value // 1_000)  # ns -> us
                if last_ts is None or ts_us - last_ts > gap_us:
                    seq += 1
                last_ts = ts_us
                out_seq.append(seq)
            yield pd.DataFrame(
                {
                    "key": key[0],
                    "dateLogged": pdf["dateLogged"],
                    "session_seq": pd.Series(out_seq, dtype="int64"),
                }
            )
        if last_ts is not None:
            state.update((last_ts, seq))
            # expire one gap past the newest event; combined with the
            # watermark this bounds state exactly like the reference TTL
            state.setTimeoutTimestamp(last_ts // 1_000 + gap_minutes * 60_000 + timeout_extra_ms)

    return assign


def stateful_sessionize(
    events: DataFrame,
    *,
    key: str = "ipAddress",
    ts: str = "dateLogged",
    gap_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-EVENT session assignment over a stream (reference ST2 shape):
    emits (key, dateLogged, session_seq) for every input event, -1 for
    NULL timestamps.  Events are processed in event-time order within
    each micro-batch; cross-batch order is governed by the watermark."""
    return (
        events.select(F.col(key).alias("key"), F.col(ts).alias("dateLogged"))
        .withWatermark("dateLogged", watermark)
        .groupBy("key")
        .applyInPandasWithState(
            _make_assigner(gap_minutes, timeout_extra_ms=1),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

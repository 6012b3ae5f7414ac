"""Shared bench-artifact readers for the A/B tools.

The committed BENCH_r{N}.json artifacts come in three shapes: the raw
bench headline (a `"queries"` dict), the BENCH_DETAIL form
(`"queries_min"`/`"queries_max"` over reps), and the driver wrapper
whose `"tail"` string is captured bench stdout — possibly TRUNCATED at
either end (r12 lost the tail of the record, r13 lost the HEAD
including the `"queries": {` marker itself).  The r13 A/B's brace
matcher assumed the marker exists and raised ValueError on r13-shaped
tails (ADVICE r13); this loader tries the marker first and falls back
to scraping the `"name": seconds` pairs, which is robust to truncation
on both ends because every per-query key is a bare identifier and
every value a plain number (the headline's own scalar keys are
skipped by name).
"""

from __future__ import annotations

import json
import re

_NON_QUERY_KEYS = {"metric", "value", "unit", "sf", "n", "rc", "cpus", "reps"}


def load_bench_queries(path: str) -> dict[str, float]:
    """Per-query seconds from any committed bench artifact shape.

    Raises ValueError with the artifact path when nothing per-query
    can be recovered — never an unexplained rindex/json error."""
    with open(path) as f:
        rec = json.load(f)
    for key in ("queries", "queries_min"):
        if isinstance(rec.get(key), dict):
            return {k: float(v) for k, v in rec[key].items()}
    tail = rec.get("tail")
    if not isinstance(tail, str):
        raise ValueError(f"{path}: no queries/queries_min/tail field")
    try:
        start = tail.rindex('"queries": {') + len('"queries": ')
        depth = 0
        for i in range(start, len(tail)):
            depth += {"{": 1, "}": -1}.get(tail[i], 0)
            if depth == 0:
                return {
                    k: float(v)
                    for k, v in json.loads(tail[start : i + 1]).items()
                }
    except ValueError:
        pass  # marker truncated away (r13 shape) -> scrape
    pairs = re.findall(
        r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)(?=\s*[,}])', tail
    )
    out = {k: float(v) for k, v in pairs if k not in _NON_QUERY_KEYS}
    if not out:
        raise ValueError(
            f"{path}: could not recover per-query timings from tail "
            f"(len={len(tail)}); artifact too truncated"
        )
    return out

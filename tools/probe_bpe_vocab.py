"""Price bpe_train_local_finish's driver heap loop at its guard
boundary (VERDICT r15 #7): the committed probes run at the fixtures'
base vocab size (~10^4 unique words); this one synthesizes a vocab of
~10^6 unique words — the natural-language ceiling the MAX_VOCAB_ROWS
guard (2M) encodes — and splits the wall into

  (a) the ONE Spark stage: word-frequency shuffle + bounded collect
  (b) the driver-local heap trainer at several merge counts

so the O(1)-Spark-jobs claim carries a measured driver-side cost at
the geometry where it matters.  Words are md5-derived lowercase
strings (deterministic, uniform pair structure — a WORST case for the
heap's lazy invalidation: natural language has far fewer distinct
pairs per merge).

    python tools/probe_bpe_vocab.py [n_words] [merges_csv]

Appends one JSON line per run to stdout; run it isolated (not next to
a bench) per SCALE.md's measurement protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    merge_counts = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [48, 256, 1024]
    )
    from metrics_service_spark.operators.bpe import (
        _heap_train_from_freqs,
        word_frequencies,
    )
    from metrics_service_spark.session import get_spark

    spark = get_spark("bpe-vocab-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # ~n_words unique all-alphabetic words: md5 hex -> a..p letters,
    # length 8-16 (md5 collisions at 10^6 are negligible; duplicates
    # just become freq=2 rows, which the trainer handles anyway)
    docs = (
        spark.range(n_words)
        .select(
            F.translate(
                F.substring(F.md5(F.col("id").cast("string")), 1, 8 + (F.col("id") % 9).cast("int")),
                "0123456789abcdef",
                "abcdefghijklmnop",
            ).alias("text")
        )
        .repartition(32)
    )

    t0 = time.perf_counter()
    rows = word_frequencies(docs, "text").limit(2_000_001).collect()
    t_spark = time.perf_counter() - t0
    freqs = {r["w"]: r["freq"] for r in rows}
    out = {
        "probe": "bpe_local_finish_vocab_boundary",
        "n_words_requested": n_words,
        "vocab_rows": len(rows),
        "spark_shuffle_collect_sec": round(t_spark, 2),
        "heap_train_sec": {},
    }
    for m in merge_counts:
        t0 = time.perf_counter()
        merges = _heap_train_from_freqs(dict(freqs), n_merges=m)
        out["heap_train_sec"][str(m)] = round(time.perf_counter() - t0, 2)
        assert len(merges) == m
    print(json.dumps(out))


if __name__ == "__main__":
    main()

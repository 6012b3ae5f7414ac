"""repetition_stats + pii_scrub unit tests with crafted content (the
catalog oracle exercises them on corpus data; these pin the semantics
on hand-built edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metrics_service_spark.operators.text import (
    pii_scrub,
    repetition_stats,
)


def test_repetition_stats_counts_and_fractions(spark):
    df = spark.createDataFrame(
        [
            # 'a b' x3 + 'b a' x2: grams = [a b, b a, a b, b a, a b] ->
            # 5 total, 2 distinct, 3 dup, top 'a b' = 3
            (1, "a b a b a b"),
            (2, "x y z w"),  # all distinct 2-grams
            (3, "solo"),     # shorter than n: one degenerate gram
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_grams"], r["n_dup_grams"],
            r["dup_gram_fraction"], r["top_gram_fraction"],
        )
        for r in repetition_stats(df, "doc_id", "text", n=2).collect()
    }
    assert got[1] == (5, 3, 0.6, 0.6)
    assert got[2] == (3, 0, 0.0, round(1 / 3, 4))
    assert got[3] == (1, 0, 0.0, 1.0)


def test_pii_scrub_detects_and_redacts(spark):
    import hashlib

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@test.org and x@y.io ip 192.168.0.1 ok"),
            (2, "no pii here 1234.5 word"),
            (3, "999.999.999.999 still matches the ipv4 shape"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_emails"], r["n_ips"], r["redacted_hash"])
        for r in pii_scrub(df, "doc_id", "text").collect()
    }
    assert got[1][:2] == (2, 1)
    assert got[2][:2] == (0, 0)
    # the pattern is a shape detector, not a validator (by design —
    # over-redaction is the safe side)
    assert got[3][:2] == (0, 1)
    want = hashlib.md5(
        b"mail <EMAIL> and <EMAIL> ip <IP> ok"
    ).hexdigest()
    assert got[1][2] == want
    assert got[2][2] == hashlib.md5(b"no pii here 1234.5 word").hexdigest()


def test_paragraph_dedup_stats_cross_doc_counts(spark):
    from metrics_service_spark.operators.dedup import paragraph_dedup_stats

    # chunk_tokens=2: doc1 = [a b][c d], doc2 = [a b][x y], doc3 = [q]
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "q")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_paragraphs"], r["n_dup_paragraphs"],
            r["dup_paragraph_fraction"],
        )
        for r in paragraph_dedup_stats(
            df, "doc_id", "text", chunk_tokens=2
        ).collect()
    }
    assert got[1] == (2, 1, 0.5)   # 'a b' shared with doc2
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (1, 0, 0.0)   # short doc: one degenerate chunk


def test_url_host_and_registered_domain(spark):
    from pyspark.sql import functions as F

    from metrics_service_spark.operators.text import (
        registered_domain,
        url_host,
    )

    df = spark.createDataFrame(
        [
            (1, "https://sub.deep.example.co/path?q=1"),
            (2, "http://example.org:8080/x"),
            (3, "ftp://HOST.NET/file"),
            (4, "not a url"),
            (5, "https://localhost/admin"),
        ],
        "id long, url string",
    )
    got = {
        r["id"]: (r["h"], r["d"])
        for r in df.select(
            "id",
            url_host(F.col("url")).alias("h"),
            registered_domain(F.col("url")).alias("d"),
        ).collect()
    }
    assert got[1] == ("sub.deep.example.co", "example.co")
    assert got[2] == ("example.org", "example.org")  # port stripped
    assert got[3] == ("HOST.NET", "HOST.NET")
    assert got[4] == ("", "")          # no match -> empty, never null
    assert got[5] == ("localhost", "localhost")  # single label kept


def test_domain_filter_blocklist_anti_join(spark):
    from metrics_service_spark.operators.text import domain_filter

    docs = spark.createDataFrame(
        [
            (1, "https://a.spam.site/x"),
            (2, "https://b.good.org/y"),
            (3, "https://spam.site:443/z"),
        ],
        "id long, url string",
    )
    block = spark.createDataFrame([("spam.site",)], "domain string")
    kept = sorted(r["id"] for r in domain_filter(docs, "url", block).collect())
    assert kept == [2]


def test_duplicate_span_stats_flags_copied_span(spark):
    """A doc that copies an 8-token span from another doc gets exactly
    its overlapping windows inside the copied region flagged; a doc
    with unique text has dup_frac 0."""
    from metrics_service_spark.operators.dedup import duplicate_span_stats

    tok = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))
    shared = " ".join(f"s{i}" for i in range(8))
    rows = [
        (1, tok(8, "a") + " " + shared + " " + tok(8, "b")),  # 24 tokens
        (2, tok(8, "c") + " " + shared),                      # 16 tokens
        (3, tok(20, "u")),                                    # unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in duplicate_span_stats(
        df, "doc_id", "text", window_tokens=8).collect()}
    # doc 1: 17 windows, exactly ONE (the aligned copy of `shared`,
    # positions 9..16) also occurs in doc 2's windows
    assert got[1].n_windows == 17 and got[1].dup_windows == 1
    # doc 2: 9 windows, its window at position 9 is the shared span
    assert got[2].n_windows == 9 and got[2].dup_windows == 1
    assert got[3].dup_windows == 0 and got[3].dup_frac_scaled == 0
    # exact scaled integer: round_half_up(1e4 * 1/17) = 588
    assert got[1].dup_frac_scaled == 588


def test_duplicate_span_scrub_keeps_first_occurrence(spark):
    """The globally-first copy (min (doc_id, pos)) of a duplicated
    window survives; every other occurrence loses exactly its covered
    tokens; unique docs come back verbatim; a doc that IS a duplicated
    window scrubs to empty."""
    from metrics_service_spark.operators.dedup import duplicate_span_scrub

    tok = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))
    shared = " ".join(f"s{i}" for i in range(8))
    rows = [
        (1, tok(8, "a") + " " + shared),  # first occurrence (doc 1, pos 9)
        (2, tok(8, "c") + " " + shared + " " + tok(4, "d")),  # loses s0..s7
        (3, tok(20, "u")),                # unique, untouched
        (4, shared),                      # the whole doc IS the dup window
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in duplicate_span_scrub(
            df, "doc_id", "text", window_tokens=8
        ).collect()
    }
    # doc 1 is the keeper: fully intact
    assert got[1].n_removed == 0 and got[1].clean_text == rows[0][1]
    # doc 2: exactly the 8 shared tokens cut, prefix+suffix survive
    assert got[2].n_removed == 8
    assert got[2].clean_text == tok(8, "c") + " " + tok(4, "d")
    # doc 3 untouched
    assert got[3].n_removed == 0 and got[3].clean_text == rows[2][1]
    # doc 4: its single whole-doc window duplicates doc 1's span at a
    # later (doc, pos) key -> scrubbed to empty
    assert got[4].n_removed == 8 and got[4].clean_text == ""
    assert got[4].n_tokens == 8


def test_duplicate_span_scrub_consistent_with_stats(spark, sf_dir):
    """Cross-operator invariant on the real fixture: a doc is scrubbed
    iff dup_spans flags it as a NON-KEEPER occurrence — so
    dup_windows == 0 implies n_removed == 0 (the converse can't hold:
    the keeper's own windows count as duplicated but aren't cut), and
    n_removed > 0 implies dup_windows > 0.  Output is also invariant
    to input row order (the keeper rule keys on values, not order)."""
    from metrics_service_spark.operators.dedup import (
        duplicate_span_scrub,
        duplicate_span_stats,
    )
    from metrics_service_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    stats = duplicate_span_stats(docs, "doc_id", "text", window_tokens=8)
    scrub = duplicate_span_scrub(docs, "doc_id", "text", window_tokens=8)
    joined = stats.join(scrub, "doc_id")
    assert (
        joined.filter(
            (F.col("dup_windows") == 0) & (F.col("n_removed") > 0)
        ).count()
        == 0
    )
    assert (
        joined.filter(
            (F.col("n_removed") > 0) & (F.col("dup_windows") == 0)
        ).count()
        == 0
    )
    # permutation invariance: a reshuffled input yields byte-identical
    # output rows
    again = duplicate_span_scrub(
        docs.orderBy(F.md5(F.col("text"))), "doc_id", "text", window_tokens=8
    )
    assert scrub.exceptAll(again).count() == 0
    assert again.exceptAll(scrub).count() == 0


def test_chunk_overlap_tiles_and_covers(spark):
    from metrics_service_spark.operators.text import chunk_overlap

    rows = []
    for n in (1, 5, 24, 31, 32, 33, 56, 57, 100):
        rows.append((n, " ".join(f"t{i}" for i in range(1, n + 1))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_overlap(df, "doc_id", "text", chunk_tokens=32, overlap=8)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for n, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert chunks[0].start_tok == 1
        assert chunks[-1].end_tok == n
        covered = set()
        for i, c in enumerate(chunks):
            assert c.chunk_idx == i
            assert c.start_tok == 1 + i * 24
            assert c.end_tok == min(c.start_tok + 31, n)
            assert c.n_tok == c.end_tok - c.start_tok + 1
            covered.update(range(c.start_tok, c.end_tok + 1))
            if i > 0:
                # consecutive chunks share exactly the overlap region
                assert chunks[i - 1].end_tok - c.start_tok + 1 == min(
                    8, chunks[i - 1].n_tok
                )
        assert covered == set(range(1, n + 1))
    # chunk hash matches a direct md5 of the sliced tokens
    import hashlib

    r33 = sorted(by_doc[33], key=lambda r: r.chunk_idx)[1]
    text = " ".join(f"t{i}" for i in range(r33.start_tok, r33.end_tok + 1))
    assert r33.chunk_md5 == hashlib.md5(text.encode()).hexdigest()


def test_chunk_overlap_param_validation(spark):
    import pytest as _pytest

    from metrics_service_spark.operators.text import chunk_overlap

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_overlap(df, "doc_id", "text", chunk_tokens=8, overlap=8)


def test_classifier_auc_matches_bruteforce(spark, sf_dir):
    """The histogram/prefix-sum AUC equals the O(n_pos*n_neg)
    pair-counting definition (ties half-credit), and the scaled value
    is the stable-rounded basis-point form."""
    from metrics_service_spark.catalog.llm import q_doc_classifier_auc
    from metrics_service_spark.operators.text import (
        gopher_rules,
        hash_classifier,
    )
    from metrics_service_spark.sources.tables import load_table

    row = q_doc_classifier_auc(spark, sf_dir).first()
    docs = load_table(spark, sf_dir, "documents")
    labels = {
        r["doc_id"]: r["keep"]
        for r in gopher_rules(docs, "doc_id", "text").collect()
    }
    scores = {
        r["doc_id"]: r["score"]
        for r in hash_classifier(docs, "doc_id", "text").collect()
    }
    pos = [scores[d] for d, k in labels.items() if k]
    neg = [scores[d] for d, k in labels.items() if not k]
    u2 = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert row["u_x2"] == u2
    num, den = u2 * 10**4, 2 * len(pos) * len(neg)
    assert row["auc_scaled"] == (2 * num + den) // (2 * den)  # round-half-up


def test_repetition_multi_matches_single_order(spark):
    # the multi-n battery's per-order columns must equal the single-n
    # operator run at each n
    from metrics_service_spark.operators.text import (
        repetition_stats,
        repetition_stats_multi,
    )

    df = spark.createDataFrame(
        [
            (1, "a b a b a b c"),
            (2, "x y z x y z x y z x"),
            (3, "unique words only here"),
        ],
        "doc_id int, text string",
    )
    multi = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats_multi(df, "doc_id", "text").collect()
    }
    for n in (2, 3, 4):
        single = {
            r["doc_id"]: r
            for r in repetition_stats(df, "doc_id", "text", n=n).collect()
        }
        for d, row in single.items():
            assert multi[d][f"n_grams_{n}"] == row["n_grams"]
            assert (
                multi[d][f"dup_gram_fraction_{n}"] == row["dup_gram_fraction"]
            )
            assert (
                multi[d][f"top_gram_fraction_{n}"] == row["top_gram_fraction"]
            )

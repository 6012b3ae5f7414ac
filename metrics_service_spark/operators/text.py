"""Text-analysis operators for training-data pipelines.

Beyond the reference surface (BASELINE.json north star): token
counting, quality scoring, n-gram-heuristic language ID, and document
fingerprinting — all pure column expressions (JVM-side, whole-stage
codegen; zero Python UDFs in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metrics_service_spark.functions.stable import round_frac

# marker words per language for the stopword-hit language heuristic;
# fixed priority order breaks ties deterministically
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "und", "das"],
    "es": ["el", "los", "que", "y"],
    "zh": ["de", "shi", "he", "zai"],
}


def occurrences(text: Column, word: str) -> Column:
    """Count whole-word occurrences by filtering the whitespace token
    array (no regex, semantics identical across engines — the oracle
    mirrors it with list_filter).  The earlier pad-and-replace variant
    undercounted ADJACENT repeats ('the the the' -> 2) because each
    replace consumed the shared separator space; the token-array count
    has no such overlap."""
    return F.size(
        F.filter(F.split(text, " "), lambda t: t == F.lit(word))
    ).cast("long")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + distinct token count per document."""
    toks = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


#: BPE-ish pre-tokenization classes (letter runs / single digits /
#: non-alnum symbols), the GPT-2 pre-tokenizer's shape reduced to
#: constructs whose semantics are identical in Java regex and RE2/PCRE —
#: so the same pattern runs in Spark and the DuckDB oracle.
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Approximate BPE token count: number of pre-token pieces (letter
    runs count 1 each, digits 1 per char, punctuation 1 per symbol) —
    the standard cheap estimator for LLM-corpus budgeting when the real
    tokenizer isn't on the executors."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0))).cast(
        "long"
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: token count, mean token length,
    stopword ratio, type-token ratio.  Single-division doubles only
    (deterministic across engines)."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    stop_hits = sum(
        (occurrences(F.col(text_col), w) for w in ("the", "a", "of")),
        F.lit(0).cast("long"),
    )
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        # exact-integer rounding (functions/stable.py): these ratios of
        # small counts land on dyadic 4-dp half-boundaries (31/32 ...)
        # where round() on a double is engine-build dependent
        round_frac(n_chars - (n_tokens - 1), n_tokens, 4).alias(
            "mean_token_len"
        ),
        round_frac(stop_hits, n_tokens, 4).alias("stopword_ratio"),
        round_frac(n_distinct, n_tokens, 4).alias("type_token_ratio"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language heuristic: argmax of per-language marker
    hits, ties broken by LANG_MARKERS declaration order."""
    text = F.col(text_col)
    scores = {
        lang: sum(
            (occurrences(text, w) for w in words), F.lit(0).cast("long")
        )
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        is_better = scores[lang] > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    cols = [F.col(id_col), best.alias("pred_lang")]
    cols += [scores[lang].alias(f"score_{lang}") for lang in langs]
    return df.select(*cols)


def fingerprint(
    df: DataFrame, id_col: str, text_col: str, *, window: int = 16, head: int = 200
) -> DataFrame:
    """Document fingerprints: full-content hash, head hash, and a
    winnowing-style min-hash over sliding character windows of the head
    (lexicographic min of md5 hex — engine-portable, no platform hash).
    """
    text = F.col(text_col)
    headc = F.substring(text, 1, head)
    n = F.greatest(F.length(headc) - (window - 1), F.lit(1))
    mins = F.array_min(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.md5(headc.substr(i, F.lit(window))),
        )
    )
    return df.select(
        F.col(id_col),
        F.md5(text).alias("content_hash"),
        F.md5(headc).alias("head_hash"),
        mins.alias("min_window_hash"),
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 2
) -> DataFrame:
    """Within-document repetition metrics (the Gopher/MassiveText
    repetition filters): fraction of n-gram occurrences that are
    duplicates of an earlier one, and the share of the single most
    frequent n-gram.  High values flag boilerplate/spam for removal
    before training.  Pure column expressions over the token n-gram
    array — exact integer counts, one rounded division each, so a SQL
    oracle replays bit-for-bit."""
    toks = F.split(F.col(text_col), " ")
    total, distinct, top = _gram_run_stats(toks, n)
    return df.select(
        F.col(id_col),
        total.alias("n_grams"),
        (total - distinct).alias("n_dup_grams"),
        round_frac(total - distinct, total, 4).alias("dup_gram_fraction"),
        round_frac(top, total, 4).alias("top_gram_fraction"),
    )


def _gram_run_stats(toks, n: int):
    """(total, distinct, modal-count) of a token array's n-grams as
    pure column expressions.  Distinct count AND modal count come from
    ONE sorted pass: sort the gram array, then a linear F.aggregate
    counts runs (= distincts) and the longest run (= the modal gram's
    occurrences).  The original per-distinct F.filter scan was
    O(grams x distincts) per document — quadratic in document length,
    caught at 99.6 s for the whole sf0.1 corpus by the r17
    full-catalog sweep; this form is O(G log G) per row and stays a
    pure zero-exchange projection (99.6 -> 1.1 s at sf0.1 together
    with _spread at the entry seam)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    total = F.size(grams).cast("long")
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("runs"),
    )

    def _step(acc, s):
        same = acc.prev.isNotNull() & (s == acc.prev)
        run = F.when(same, acc.run + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            s.alias("prev"),
            run.alias("run"),
            F.greatest(acc.best, run).alias("best"),
            F.when(same, acc.runs)
            .otherwise(acc.runs + 1)
            .alias("runs"),
        )

    scan = F.aggregate(F.array_sort(grams), zero, _step)
    return total, scan.runs.cast("long"), scan.best.cast("long")


def repetition_stats_multi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    ns: tuple[int, ...] = (2, 3, 4),
) -> DataFrame:
    """Gopher's full repetition battery (Rae et al. 2021 table A1 uses
    duplicate/top fractions at SEVERAL n-gram orders, not one): per
    document, the duplicate-gram fraction and modal-gram share for
    every n in ``ns``, computed in ONE zero-exchange projection — the
    token array splits once and each order reuses it, so the corpus
    is scanned exactly once for the whole battery."""
    toks = F.split(F.col(text_col), " ")
    cols = [F.col(id_col)]
    for n in ns:
        total, distinct, top = _gram_run_stats(toks, n)
        cols.extend(
            [
                total.alias(f"n_grams_{n}"),
                round_frac(total - distinct, total, 4).alias(
                    f"dup_gram_fraction_{n}"
                ),
                round_frac(top, total, 4).alias(f"top_gram_fraction_{n}"),
            ]
        )
    return df.select(*cols)


#: PII patterns restricted to constructs with identical semantics in
#: Java regex (Spark) and RE2 (DuckDB): character classes, bounded
#: repetition, \b word boundaries — no lookaround, no backrefs.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII detection + redaction (the standard pre-training scrub
    pass): count email / IPv4 matches and emit the redacted text's
    hash (emails -> <EMAIL>, IPs -> <IP>; emails first so an address's
    host part is never half-eaten by the IP pass).  regexp_replace and
    regexp_extract_all are per-row codegen — zero shuffles, scales as
    a pure scan projection."""
    text = F.col(text_col)
    n_emails = F.size(
        F.regexp_extract_all(text, F.lit(PII_EMAIL), F.lit(0))
    ).cast("long")
    redacted = F.regexp_replace(
        F.regexp_replace(text, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
    )
    n_ips = F.size(
        F.regexp_extract_all(
            F.regexp_replace(text, PII_EMAIL, "<EMAIL>"),
            F.lit(PII_IPV4),
            F.lit(0),
        )
    ).cast("long")
    return df.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        F.md5(redacted).alias("redacted_hash"),
    )


#: URL structure: scheme://host[:port]/path — host captured with the
#: same character-class-only regex in Java regex and RE2.
URL_HOST_PATTERN = r"^[a-z][a-z0-9+.-]*://([A-Za-z0-9.-]+)"


def url_host(url: Column) -> Column:
    """Extract the host from a URL column (empty string on no match,
    Spark regexp_extract semantics)."""
    return F.regexp_extract(url, URL_HOST_PATTERN, 1)


def registered_domain(url: Column) -> Column:
    """Last two labels of the URL host — the registered-domain
    heuristic every web-corpus blocklist keys on (a full public-suffix
    list is a data file, not logic; swap it in as a second broadcast
    join at deploy time)."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(host)


def domain_filter(
    df: DataFrame,
    url_col: str,
    blocklist: DataFrame,
    *,
    domain_col: str = "domain",
) -> DataFrame:
    """C4/RefinedWeb-style domain blocklist filter: drop rows whose
    URL's registered domain appears in `blocklist` (a small table —
    broadcast anti-join, zero shuffles of the corpus side)."""
    keyed = df.withColumn("__dom", registered_domain(F.col(url_col)))
    block = blocklist.select(F.col(domain_col).alias("__dom")).distinct()
    return keyed.join(F.broadcast(block), "__dom", "left_anti").drop("__dom")


#: Gopher/MassiveText stopword rule (Rae et al. 2021 §A1.1): a
#: document must contain at least two DISTINCT members of the stop
#: set.  The published set is ("the","be","to","of","and","that",
#: "have","with"); here "that" is swapped for "a" so the rule
#: discriminates on the synthetic fixture vocabulary (which contains
#: only "the" and "a" from the stopword families) — the rule SHAPE,
#: thresholds and conjunction are Gopher's.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "a", "be", "to", "of", "and", "have", "with",
)


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021, MassiveText
    §A1.1) as one per-document projection: word-count bounds, mean
    word length in [3,10], symbol-to-word ratio (# and ... marks)
    <= 0.1, >= 80% of words containing an alphabetic character, and
    the >= 2-distinct-stopwords rule; `keep` is their conjunction.
    The corpus fixtures are single-line space-joined tokens, so the
    original line-shape rules (bullet/ellipsis LINE ratios) fold into
    the symbol rule.

    Every ratio threshold is CROSS-MULTIPLIED into integer compares
    (mean len in [3,10] <=> 3n <= chars <= 10n) — no division, no
    rounded double anywhere in the comparison surface, which is the
    stable-rounding discipline (functions/stable.py) taken to its
    endpoint.  Pure whole-stage-codegen column arithmetic: a 100 TB
    corpus streams through map-side with zero shuffles."""
    text = F.col(text_col)
    toks = F.split(text, " ")
    n_words = F.size(toks).cast("long")
    sum_chars = (F.length(text) - (n_words - 1)).cast("long")
    n_hash = (
        F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ).cast("long")
    n_ellipsis = F.floor(
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit(""))))
        / 3
    ).cast("long")
    n_symbols = (n_hash + n_ellipsis).cast("long")
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))
    ).cast("long")
    distinct_stops = sum(
        (
            F.array_contains(toks, w).cast("long")
            for w in GOPHER_STOPWORDS
        ),
        F.lit(0).cast("long"),
    )
    flag_words = (n_words >= min_words) & (n_words <= max_words)
    flag_word_len = (sum_chars >= 3 * n_words) & (sum_chars <= 10 * n_words)
    flag_symbol = 10 * n_symbols <= n_words
    flag_alpha = 5 * n_alpha >= 4 * n_words
    flag_stop = distinct_stops >= 2
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_alpha.alias("n_alpha_words"),
        n_symbols.alias("n_symbols"),
        distinct_stops.alias("distinct_stopwords"),
        flag_words.alias("flag_words"),
        flag_word_len.alias("flag_word_len"),
        flag_symbol.alias("flag_symbol"),
        flag_alpha.alias("flag_alpha"),
        flag_stop.alias("flag_stop"),
        (flag_words & flag_word_len & flag_symbol & flag_alpha & flag_stop)
        .alias("keep"),
    )


def hash_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    salt: str = "hw",
    w_mod: int = 17,
    w_bias: int = 8,
) -> DataFrame:
    """fastText-style hashing-trick linear classifier — the quality-
    classifier step of CCNet/RedPajama-class pipelines (a linear model
    over hashed bag-of-words features; reference pipelines train the
    weights offline and apply them corpus-wide).  Each token hashes to
    a 16-bit bucket (md5 prefix) whose weight here is the
    DETERMINISTIC placeholder ``hex4(md5(salt:token)) % w_mod -
    w_bias`` in [-w_bias, w_mod-1-w_bias] — standing in for trained
    weights so both engines replay the exact integer score; a real
    deployment swaps the weight expression for a broadcast
    bucket->weight lookup without touching the plan shape.

    Scale: split -> explode -> hash-aggregate on the id.  Everything
    is whole-stage codegen (no interpreted lambda per token); the one
    exchange moves ONE combined row per document (map-side partial
    agg collapses the token mass before the shuffle, and a document's
    tokens are colocated by construction).  Output: (id, n_tokens,
    score, kept = score > 0)."""
    from metrics_service_spark.operators.sampling import _hex4_int

    wgt = (
        _hex4_int(F.md5(F.concat(F.lit(f"{salt}:"), F.col("__tok"))))
        % w_mod
        - w_bias
    ).cast("long")
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(wgt).alias("score"),
        )
        .select(
            id_col,
            "n_tokens",
            "score",
            (F.col("score") > 0).alias("kept"),
        )
    )


def dsir_vote(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_filter: Column,
    *,
    salt: str = "hw",
    n_buckets: int = 65536,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023) with EXACT integer
    arithmetic: score each document by its affinity to a TARGET slice
    of the corpus, measured over hashed unigram features.  DSIR's
    log-likelihood-ratio weights are replaced by their sign — token
    bucket b votes +1 when it is relatively more frequent in the
    target than in the corpus (c_T(b)·N_R > c_R(b)·N_C, an exact
    cross-multiplication — no division, no log, so DuckDB replays
    every vote bit-for-bit), -1 when less, 0 on ties/unseen — and a
    document's score is the sum of its tokens' votes, the same
    monotone more-target-like-than-not statistic without the float
    surface.  This is also `hash_classifier` with its placeholder
    weights swapped for CORPUS-DERIVED ones — the deployment shape
    that entry documents.

    Scale: the corpus is tokenized and hashed exactly ONCE, into a
    checkpointed per-(doc, bucket) count frame (the doc-term matrix —
    map-side combine collapses repeated tokens before its shuffle);
    the global bucket table, the totals, and the scoring join all
    read that frame, so no md5 re-evaluation anywhere (an earlier
    shape that recomputed the hash as the JOIN KEY paid it ~3x per
    probe row — the join expression sits outside aggregate-style
    subexpression elimination — and measured 12.6 s where this one
    measures ~2 s at the 10x probe).  The vote table is ≤ n_buckets
    rows BY CONSTRUCTION, broadcastable at ANY corpus size; the
    scoring join probes a plain int key.  Output: (id, n_tokens,
    score, selected)."""
    from metrics_service_spark.operators.sampling import _hex4_int

    dtoks = (
        df.select(
            F.col(id_col),
            target_filter.alias("__is_t"),
            F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
        )
        .withColumn(
            "__b",
            _hex4_int(F.md5(F.concat(F.lit(f"{salt}:"), F.col("__tok"))))
            % n_buckets,
        )
        .groupBy(id_col, "__is_t", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)
    )
    counts = dtoks.groupBy("__b").agg(
        F.sum("__c").alias("c_all"),
        F.sum(F.when(F.col("__is_t"), F.col("__c")).otherwise(0)).alias(
            "c_t"
        ),
    )
    totals = counts.agg(
        F.sum("c_all").alias("n_all"),
        F.sum("c_t").alias("n_t"),
    )
    # the cross-multiplication runs in DECIMAL(38,0): token-count
    # products overflow int64 around 10^10 corpus tokens, and a double
    # cast would mis-sign near-ties — both engines compare the exact
    # 128-bit-wide products (DuckDB mirrors with HUGEINT)
    lhs = F.col("c_t").cast("decimal(38,0)") * F.col("n_all").cast(
        "decimal(38,0)"
    )
    rhs = F.col("c_all").cast("decimal(38,0)") * F.col("n_t").cast(
        "decimal(38,0)"
    )
    votes = counts.crossJoin(F.broadcast(totals)).select(
        "__b",
        F.when(lhs > rhs, F.lit(1))
        .when(lhs < rhs, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__w"),
    )
    return (
        dtoks.join(F.broadcast(votes), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_tokens"),
            F.sum(F.col("__c") * F.col("__w")).alias("score"),
        )
        .select(
            id_col,
            "n_tokens",
            "score",
            (F.col("score") > 0).alias("selected"),
        )
    )


def chunk_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into fixed-size OVERLAPPING token chunks — the
    standard context-window/RAG chunker: chunk i covers tokens
    ``[1 + i*stride, 1 + i*stride + chunk_tokens)`` (1-based, stride =
    chunk_tokens - overlap), the final chunk clipped to the document
    end, every token covered, consecutive chunks sharing ``overlap``
    tokens.  Deterministic closed form — ``n_chunks = 1 +
    ceil(max(n - chunk_tokens, 0) / stride)`` — so a SQL oracle
    replays the chunking exactly; the md5 content hash makes chunks
    joinable to dedup/embedding stages without re-carrying text.

    Scale: pure per-row codegen (split + one sequence explode + slice
    hashing) — zero shuffles; output rows ~ corpus_tokens / stride.
    Output: (id, chunk_idx, start_tok, end_tok, n_tok, chunk_md5).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    nc = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1)
        + F.floor(
            (n - F.lit(chunk_tokens) + F.lit(stride - 1)) / F.lit(stride)
        ).cast("int")
    )
    start = F.lit(1) + F.col("chunk_idx") * F.lit(stride)
    end = F.least(start + F.lit(chunk_tokens - 1), F.col("__n"))
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            n.alias("__n"),
            F.explode(F.sequence(F.lit(0), nc - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            start.cast("int").alias("start_tok"),
            end.cast("int").alias("end_tok"),
            (end - start + 1).cast("int").alias("n_tok"),
            F.md5(
                F.concat_ws(" ", F.slice(F.col("__toks"), start, end - start + 1))
            ).alias("chunk_md5"),
        )
    )

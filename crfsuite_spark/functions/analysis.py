"""Text-analysis functions for training-data pipelines — all JVM-side
Column expressions (whole-stage codegen, no Python UDFs).

- language ID: stopword-hit heuristic over a per-language lexicon
  (n-gram-free variant fit for closed-set routing; real pipelines swap
  in fastText behind the same column contract);
- quality scoring: length / punctuation / stopword / digit ratios with
  a composite score;
- token counting: whitespace tokens + a BPE-ish subword estimate
  (chars/4 heuristic blended with word count — the common proxy);
- document fingerprinting: normalized-text digest (exact) — the
  rolling/shingle variants live in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "por", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "dans", "que", "pour"],
}


def _tokens(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count(col) -> Column:
    """Whitespace token count (0 for empty/NULL-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.coalesce(F.trim(c), F.lit("")) == "", F.lit(0)
    ).otherwise(F.size(_tokens(col))).alias("token_count")


def subword_estimate(col) -> Column:
    """BPE-ish token estimate: max(words, ceil(chars/4)) — the standard
    chars/4 proxy floored by the word count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.greatest(
        token_count(col), F.ceil(F.length(F.coalesce(c, F.lit(""))) / 4).cast("int")
    )


def lang_scores(col, langs: dict[str, list[str]] | None = None) -> Column:
    """Map<lang, hits>: stopword hits per language."""
    langs = langs or STOPWORDS
    toks = _tokens(col)
    entries = []
    for lang, words in langs.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.array_intersect(F.array_distinct(toks), arr))
        entries += [F.lit(lang), hits]
    return F.create_map(*entries)


def lang_id(col, langs: dict[str, list[str]] | None = None, default: str = "und") -> Column:
    """Best-scoring language, 'und' when nothing matches. Deterministic
    tie-break: language key order."""
    langs = langs or STOPWORDS
    toks = F.array_distinct(_tokens(col))
    best_lang, best_hits = F.lit(default), F.lit(0)
    for lang in sorted(langs):
        arr = F.array(*[F.lit(w) for w in langs[lang]])
        hits = F.size(F.array_intersect(toks, arr))
        better = hits > best_hits
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, hits).otherwise(best_hits)
    return best_lang


def punct_ratio(col) -> Column:
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) == 0, 0.0).otherwise(n_punct / F.length(c))


def digit_ratio(col) -> Column:
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    n_dig = F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(F.length(c) == 0, 0.0).otherwise(n_dig / F.length(c))


def stopword_ratio(col, lang: str = "en") -> Column:
    toks = _tokens(col)
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return F.when(F.size(toks) == 0, 0.0).otherwise(hits / F.size(toks))


def quality_score(col) -> Column:
    """Composite [0,1] quality: rewards mid-length docs with low
    punctuation/digit noise and some stopword mass (prose-likeness)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    n = F.length(c)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    noise = punct_ratio(col) + digit_ratio(col)
    noise_score = F.greatest(F.lit(0.0), F.lit(1.0) - noise * 2)
    stop_score = F.least(stopword_ratio(col) * 5, F.lit(1.0))
    return (len_score * 0.3 + noise_score * 0.4 + stop_score * 0.3)


# every ASCII char the fingerprint normalization deletes (all of
# 0x01-0x7F except [a-z0-9 ]); the regex pass only mops up non-ASCII
_FP_ASCII_BAD = "".join(
    chr(c) for c in range(1, 128)
    if not (48 <= c <= 57 or 97 <= c <= 122 or c == 32)
)


def _fp_normalized(col) -> Column:
    """lower → drop every non-[a-z0-9 ] char → collapse space runs —
    the fingerprint normalization, shaped for throughput at corpus
    scale. Java's regexp_replace costs ~1 µs PER MATCH (measured: a
    ~300-char doc with ~30 punctuation chars pays ~27 µs — 15 s for
    500k docs at sf10, 75% of the whole text-stats query), so the hot
    deletions go through ``translate`` (per-char map lookup, no
    matcher): the regex that guarantees the full Unicode semantics
    then finds ZERO matches on ASCII text and runs at its cheap
    no-match rate. The space collapse matches only runs of ≥2 (single
    spaces — the common case — don't fire the matcher). Byte-identical
    output to the naive two-regex form (the DuckDB oracle keeps that
    form and stays green); measured 15 s → ~1.5 s at sf10."""
    c = F.col(col) if isinstance(col, str) else col
    ascii_clean = F.translate(F.lower(c), _FP_ASCII_BAD, "")
    # ASCII-pure after the translate (octet_length == char_length — no
    # regex needed to test it) means the translate already deleted
    # everything the class would; the negated-class regex only ever
    # runs on strings that actually contain non-ASCII. This matters
    # beyond match counts: on this engine a NEGATED class scan is
    # ~50-100× slower than a positive-class scan even with zero
    # matches (measured 15 s vs 0.3 s over 500k×300 chars — consistent
    # with a quadratic charAt path under the matcher), so it must stay
    # off the common-case row entirely.
    norm = F.when(
        F.octet_length(ascii_clean) == F.length(ascii_clean), ascii_clean
    ).otherwise(F.regexp_replace(ascii_clean, r"[^a-z0-9 ]+", ""))
    return F.trim(F.regexp_replace(norm, r"  +", " "))


def fingerprint(col) -> Column:
    """Deterministic 64-bit content fingerprint over normalized text
    (case/whitespace/punct-insensitive)."""
    return F.xxhash64(_fp_normalized(col))


def md5_fingerprint(col) -> Column:
    """md5 hex of normalized text — portable across engines (used by the
    DuckDB oracle checks, which lack xxhash64)."""
    return F.md5(_fp_normalized(col))


def winnow_fingerprints(col: str, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every char k-gram, slide a window of w
    hashes, keep each window's minimum — guarantees any shared substring
    of length ≥ k + w - 1 yields a shared fingerprint, with ~2/(w+1)
    selection density. All JVM higher-order functions on one row: no
    explode, no shuffle — at 100 TB this is pure map-side scan work.

    Hash = md5-derived 32-bit int (portable: DuckDB reproduces it), so
    fingerprints are comparable across engines and runs. Returns a
    sorted distinct array<bigint>.
    """
    if not isinstance(col, str):
        raise ValueError("winnow_fingerprints requires a column NAME (string)")
    s = col
    grams = (
        f"CASE WHEN length({s}) < {k} THEN array({s}) "
        f"ELSE transform(sequence(0, length({s}) - {k}), i -> substr({s}, i + 1, {k})) END"
    )
    hashes = (
        f"transform({grams}, g -> CAST(conv(substr(md5(g), 1, 8), 16, 10) AS BIGINT))"
    )
    mins = (
        f"CASE WHEN size({hashes}) <= {w} THEN array(array_min({hashes})) "
        f"ELSE transform(sequence(0, size({hashes}) - {w}), "
        f"i -> array_min(slice({hashes}, i + 1, {w}))) END"
    )
    return F.expr(f"array_sort(array_distinct({mins}))")


def word_count(col) -> Column:
    """Alias of :func:`token_count` under the C4 papers' terminology."""
    return token_count(col)


def mean_word_length(col) -> Column:
    """Mean word length = non-whitespace chars / whitespace tokens
    (0 for empty; one of the C4 corpus heuristics — Raffel et al. 2020
    filter docs outside roughly [3, 10])."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    n_chars = F.length(F.regexp_replace(F.trim(c), r"\s+", ""))
    wc = token_count(col)
    return F.when(wc == 0, 0.0).otherwise(n_chars / wc)


def sentence_count(col) -> Column:
    """Terminal-punctuation count (. ! ?) as the sentence proxy the C4
    'at least 3 sentences' rule uses. Counted as a length delta over
    ``translate`` (delete .!? and diff) — exactly the negated-class
    regex count, without the negated-class scan (see _fp_normalized's
    note; the DuckDB oracle keeps the regex form and matches)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    return (F.length(c) - F.length(F.translate(c, ".!?", ""))).cast("int")


def c4_keep(
    col,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_sentences: int = 3,
) -> Column:
    """Composite C4-style document keep flag (Raffel et al. 2020 §2.2
    heuristics, doc-level subset): word-count band, mean-word-length
    band, ≥ min_sentences terminal punctuation marks, no curly brace
    (code tell), no 'lorem ipsum'. All JVM Column exprs — the filter
    pushes into the scan."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    wc = token_count(col)
    mwl = mean_word_length(col)
    return (
        (wc >= min_words)
        & (wc <= max_words)
        & (mwl >= min_mean_word_len)
        & (mwl <= max_mean_word_len)
        & (sentence_count(col) >= min_sentences)
        & (~c.contains("{"))
        & (~F.lower(c).contains("lorem ipsum"))
    )


def dup_sentence_fraction(col) -> Column:
    """Fraction of duplicated sentences (Gopher repetition signal,
    Rae et al. 2021 Table A1): 1 − distinct/total over '. '-split
    segments. 0 for empty text."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    sents = F.split(c, r"\. ")
    return F.when(F.size(sents) <= 0, 0.0).otherwise(
        1.0 - F.size(F.array_distinct(sents)) / F.size(sents)
    )


def top_bigram_fraction(col) -> Column:
    """Fraction of word 2-grams taken by the MOST FREQUENT 2-gram
    (Gopher repetition signal). Computed with zero shuffle: sort the
    2-gram array and take the longest equal-run via a single
    ``aggregate`` HOF — no explode, no groupBy, stays inside
    whole-stage codegen. 0 for NULL/empty texts or < 2 words."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    w = _tokens(c)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 2),
        lambda i: F.concat_ws(" ", F.element_at(w, i + 1), F.element_at(w, i + 2)),
    )
    sorted_g = F.array_sort(grams)
    best = F.aggregate(
        sorted_g,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a.prev, a.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a.best, F.when(x == a.prev, a.run + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda a: a.best,
    )
    return F.when(F.size(w) < 2, 0.0).otherwise(best / F.size(grams))


def unigram_nll(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
):
    """Per-document unigram negative log-likelihood under the corpus's
    OWN unigram LM — the cheap perplexity proxy CCNet-style pipelines
    use for quality bucketing (high NLL = unusual token distribution:
    boilerplate, gibberish, wrong-language).

    Returns (id, nll, n_tokens); token-less documents are absent (a
    document with no tokens has no likelihood). Two partial-aggregated
    groupBys (vocab counts, per-doc mean); the vocabulary joins back
    BROADCAST by default, which also sidesteps the classic stopword
    hot-key skew a shuffle join on the token would hit — set
    ``broadcast_vocab=False`` for open-vocabulary corpora where the
    type table outgrows the driver (uniform-ish key + AQE skew-join
    handles the rest). No smoothing: scoring corpus == training
    corpus, so every token has count ≥ 1."""
    spark_df = df
    toks = spark_df.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("tok")
    ).where(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").alias("n"))
    b = F.broadcast if broadcast_vocab else (lambda x: x)
    return (
        toks.join(b(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.avg(-F.log(F.col("c") / F.col("n"))).alias("nll"),
            F.count("*").alias("n_tokens"),
        )
    )


def bigram_nll(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.8,
    broadcast_vocab: bool = True,
):
    """Per-document CONDITIONAL bigram negative log-likelihood under
    the corpus's own interpolated bigram LM — the next step up from
    :func:`unigram_nll` for quality bucketing (low NLL = locally
    predictable text: boilerplate, templated spam; high = gibberish):

        P(w_i | w_{i-1}) = λ·c(w_{i-1} w_i)/ctx(w_{i-1})
                           + (1−λ)·c(w_i)/N

    where ctx counts TRANSITIONS out of the context (so the bigram
    MLE rows sum to 1 per context) and the unigram term uses all-token
    counts — Jelinek-Mercer interpolation, which also means no
    zero-probability transitions (scoring corpus == training corpus,
    every unigram has count ≥ 1). Scores average over transition
    positions i ≥ 2 only; documents with < 2 tokens are absent.

    Returns (id, nll, n_transitions). Shape: pairing is a scan-local
    array ``transform`` (no posexplode self-join — the token stream
    never carries positions through a shuffle); three partial-
    aggregated count tables join back broadcast by default (same
    stopword-skew rationale as :func:`unigram_nll`; set
    ``broadcast_vocab=False`` when the bigram type table outgrows the
    driver — uniform-ish keys + AQE handle it)."""
    if not 0.0 < lam < 1.0:
        raise ValueError("lam must be in (0, 1) for interpolation")
    toks_arr = F.filter(_tokens(text_col), lambda t: t != "")
    staged = df.select(F.col(id_col), toks_arr.alias("__toks"))
    # (prev, cur) per transition, scan-local: pair element i of the
    # n-1 prefix with element i+2 (1-based element_at) of the array
    pairs = (
        staged.where(F.size("__toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.expr("slice(__toks, 1, size(__toks) - 1)"),
                    lambda x, i: F.struct(
                        x.alias("prev"),
                        F.element_at(F.col("__toks"), i + 2).alias(
                            "cur"
                        ),
                    ),
                )
            ).alias("__p"),
        )
        .select(id_col, F.col("__p.prev").alias("prev"),
                F.col("__p.cur").alias("cur"))
    )
    pair_cnt = pairs.groupBy("prev", "cur").agg(
        F.count("*").alias("c_pair")
    )
    ctx_cnt = pair_cnt.groupBy("prev").agg(
        F.sum("c_pair").alias("c_ctx")
    )
    uni = (
        staged.select(F.explode("__toks").alias("cur"))
        .groupBy("cur")
        .agg(F.count("*").alias("c_uni"))
    )
    tot = uni.agg(F.sum("c_uni").alias("n_tok"))
    b = F.broadcast if broadcast_vocab else (lambda x: x)
    p = (
        F.lit(lam) * F.col("c_pair") / F.col("c_ctx")
        + F.lit(1.0 - lam) * F.col("c_uni") / F.col("n_tok")
    )
    return (
        pairs.join(b(pair_cnt), ["prev", "cur"])
        .join(b(ctx_cnt), "prev")
        .join(b(uni), "cur")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.avg(-F.log(p)).alias("nll"),
            F.count("*").alias("n_transitions"),
        )
    )


# RE2-safe patterns (no lookaround/backrefs) so the same regex runs in
# Spark (Java) and DuckDB (RE2) byte-for-byte
_PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d{1,3}[ -]?\(?\d{2,4}\)?[ -]?\d{3,4}([ -]?\d{3,4})?", "<PHONE>"),
]


def redact_pii(col) -> Column:
    """Redact emails / IPv4s / phone-shaped numbers with typed
    placeholders — the standard pre-training scrub pass. Pure
    ``regexp_replace`` chain (JVM, pushed into the projection);
    patterns are RE2-safe so any engine reproduces them. Order
    matters: emails first (their local part can look phone-like),
    then IPs (dotted quads would half-match the phone pattern)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    for pat, repl in _PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def domain_divergence(
    df,
    key_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 256,
    alpha: float = 1.0,
):
    """Per-domain distribution shift vs the whole corpus: KL(P_key ‖
    P_corpus) and Jensen-Shannon divergence over Laplace-smoothed
    hashed-token distributions — the mixture-construction diagnostic
    (which domains are outliers; how far a new crawl drifts from the
    training mix).

    Scale shape: ONE corpus pass — explode tokens → partial-aggregated
    ``groupBy(key, md5-bucket)`` (≤ keys × n_buckets rows cross the
    wire); everything after runs on that tiny count frame (the corpus
    marginal is its bucket-sum, not a second scan).  Smoothing over the
    fixed bucket domain keeps every log finite; the full key × bucket
    grid (zero counts included) enters both sums, as the math requires.

    Returns (key, n_tokens, kl, js) rounded to 6 — fully replayed in
    the DuckDB driver oracle (``ta_domain_divergence``)."""
    a = float(alpha)
    toks = df.select(
        F.col(key_col).alias("__k"), F.explode(_tokens(text_col)).alias("__w")
    ).where(F.col("__w") != "")
    bucket = F.pmod(
        F.conv(F.substring(F.md5("__w"), 1, 8), 16, 10).cast("bigint"),
        F.lit(int(n_buckets)),
    )
    cnt = toks.groupBy("__k", bucket.alias("__b")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    spark = df.sparkSession
    grid = cnt.select("__k").distinct().crossJoin(
        spark.range(n_buckets).select(F.col("id").alias("__b"))
    )
    full = grid.join(cnt, ["__k", "__b"], "left").select(
        "__k", "__b", F.coalesce(F.col("__c"), F.lit(0)).alias("__c")
    )
    nk = full.groupBy("__k").agg(F.sum("__c").alias("__nk"))
    cb = full.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    ntot = full.agg(F.sum("__c").alias("__N"))
    j = (
        full.join(F.broadcast(nk), "__k")
        .join(F.broadcast(cb), "__b")
        .crossJoin(F.broadcast(ntot))
    )
    p = (F.col("__c") + a) / (F.col("__nk") + a * n_buckets)
    q = (F.col("__cb") + a) / (F.col("__N") + a * n_buckets)
    m = (p + q) / 2.0
    terms = j.select(
        "__k",
        "__nk",
        (p * F.log(p / q)).alias("__kl"),
        (0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)).alias("__js"),
    )
    return terms.groupBy(F.col("__k").alias(key_col)).agg(
        F.min("__nk").alias("n_tokens"),
        F.round(F.sum("__kl"), 6).alias("kl"),
        F.round(F.sum("__js"), 6).alias("js"),
    )

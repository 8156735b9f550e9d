"""Deterministic sampling + sequence packing for training-data
pipelines.

Both operators use a PORTABLE content hash (first 8 hex chars of md5 →
int, the same trick operators/minhash.py uses) so results are
reproducible across engines and across runs — reproducible subsampling
is what makes a 100 TB data ablation re-runnable. Everything is JVM
Column exprs + windows; no Python in the hot path.

- **hash_sample / stratified_hash_sample**: keep a row iff
  ``md5(id ∥ seed) mod 10^6 < fraction·10^6``. Unlike ``df.sample()``
  this is stable under retries, partition changes, AQE re-plans and
  engine swaps, and it composes: nested fractions give nested samples
  (a 1% sample is a subset of the 10% sample for thresholded hashes).
- **pack_documents**: concat-then-chunk sequence packing (the standard
  LLM pre-training layout): shard documents by hash, order
  deterministically within each shard, lay them head-to-tail and cut
  fixed token-budget chunks; documents SPLIT across chunk boundaries,
  one output row per (document × chunk spanned). One window per shard —
  hash-partitioned, no global sort, so parallelism scales with
  ``n_shards`` regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crfsuite_spark.functions.analysis import token_count

_SCALE = 1_000_000


def _portable_hash_expr(col_sql: str, mod: int, seed: int = 42) -> Column:
    """First-8-hex-of-md5 → bigint, mod ``mod`` — reproducible in any
    engine with md5() (DuckDB: ('0x' || substr(md5(x),1,8))::BIGINT).
    ``col_sql`` is a COLUMN NAME; it is backtick-quoted so names that
    need quoting (dots, spaces, hyphens) parse as one identifier."""
    ident = "`" + col_sql.replace("`", "``") + "`"
    return F.expr(
        f"pmod(CAST(conv(substr(md5(concat(CAST({ident} AS STRING), ':{seed}')), 1, 8), 16, 10) AS BIGINT), {mod})"
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Deterministic ``fraction`` sample keyed on ``id_col`` (see module
    docstring for why this beats ``df.sample`` at scale)."""
    return df.where(
        _portable_hash_expr(id_col, _SCALE, seed) < int(fraction * _SCALE)
    )


def exact_k_sample(
    df: DataFrame,
    id_col: str,
    key_col: str,
    k: int,
    seed: int = 42,
    oversample: float = 2.0,
) -> DataFrame:
    """Exactly ``min(k, n_key)`` rows per key, deterministically: the
    rows whose ``md5(id ∥ seed)`` hash ranks lowest within the key
    (ties broken by id) — the fixed-size-per-domain sampler balanced
    eval sets and per-domain ablations need, where ``hash_sample``'s
    fixed FRACTION gives the wrong size on skewed domains.

    Semantics are exactly "per-key top-k by (hash, id)" — but computed
    WITHOUT a per-key sort of the corpus.  A window row_number alone
    would shuffle and sort every row of a 10^12-row table by domain
    (few keys = giant skewed sort partitions).  Instead:

    1. per-key counts (tiny partial-aggregated groupBy);
    2. map-side SCREEN: keep rows with ``hash < oversample·k/n·SCALE``
       — expected ``oversample·k`` survivors per key, so the only
       sorted data is ~2k rows per key regardless of corpus size;
    3. exact top-k window over the bounded survivor set;
    4. rescue guard: a key whose screen under-drew (possible at small
       k: the threshold is a binomial draw) is re-ranked from the full
       table — detected per-key by count, usually empty at
       ``oversample ≥ 2`` and ``k ≥ 30``, and the rescue join touches
       only that key's rows.

    The screen never changes the RESULT (the true top-k all hash below
    the kth survivor or the key is rescued), so the DuckDB oracle is
    the plain window form over the full table (``ds_exact_k_sample``).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    h = _portable_hash_expr(id_col, _SCALE, seed)
    n_per_key = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    thr = F.least(
        F.lit(_SCALE),
        F.ceil(F.lit(float(oversample) * k * _SCALE) / F.col("__n")),
    ).cast("long")
    screened = df.withColumn("__h", h).join(
        F.broadcast(n_per_key.select(key_col, thr.alias("__thr"))), key_col
    ).where(F.col("__h") < F.col("__thr")).drop("__thr")
    w = Window.partitionBy(key_col).orderBy("__h", id_col)
    ranked = screened.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= k
    )
    # rescue: keys where the screen drew fewer than min(k, n) rows
    have = ranked.groupBy(key_col).agg(F.count(F.lit(1)).alias("__have"))
    deficient = (
        n_per_key.join(have, key_col, "left")
        .where(
            F.coalesce(F.col("__have"), F.lit(0))
            < F.least(F.lit(k), F.col("__n"))
        )
        .select(key_col)
    )
    deficient_keys = [r[0] for r in deficient.collect()]  # bounded: #keys
    if deficient_keys:
        full = df.withColumn("__h", h).where(
            F.col(key_col).isin(deficient_keys)
        )
        rescued = full.withColumn("__rn", F.row_number().over(w)).where(
            F.col("__rn") <= k
        )
        ranked = ranked.where(
            ~F.col(key_col).isin(deficient_keys)
        ).unionByName(rescued)
    return ranked.drop("__h", "__rn")


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixing primitive
    (e.g. keep 100% of books, 10% of web, 1% of logs). ``fractions``
    maps stratum value → keep fraction; unlisted strata get
    ``default_fraction``."""
    thresh = F.lit(int(default_fraction * _SCALE))
    for k, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == k, F.lit(int(frac * _SCALE))
        ).otherwise(thresh)
    return df.where(_portable_hash_expr(id_col, _SCALE, seed) < thresh)


def temperature_mix(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    alpha: float = 0.5,
    scale: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Temperature-based domain rebalancing (the multilingual-LLM
    sampling rule, XLM-R / mT5: resampled share q_d ∝ p_d^alpha):
    downsample each domain with keep-rate
    ``r_d = scale · (n_min / n_d)^(1 - alpha)`` so kept domain sizes
    are proportional to ``n_d^alpha``. alpha = 1 keeps everything,
    alpha = 0 levels every domain down to the smallest, alpha ∈ (0, 1)
    flattens the head while keeping it largest. Pure subsampling — the
    smallest domain is kept whole (times ``scale``), never upsampled,
    so the output is a deterministic subset (rerun-, retry- and
    AQE-stable via the portable hash threshold).

    Shape: ONE partial-aggregated ``groupBy(domain).count()`` (domain
    vocabulary is tiny), a 1-row global min joined back by cross-join
    (both frames are domain-sized — the planner broadcasts), then a
    map-side hash filter over the corpus: the corpus itself never
    shuffles.

    Determinism across engines: rates use ``sqrt`` chains, not
    ``pow`` — for the default alpha = 0.5 the rate is
    ``sqrt(n_min / n_d)``, and IEEE-754 requires division and sqrt to
    be correctly rounded, so the integer threshold
    ``floor(r_d · 10^6)`` is bit-identical in Spark and DuckDB (the
    driver oracle replays it). ``pow`` carries no such guarantee, so
    non-(0.5/1) alphas compute the exponent driver-side on the SAME
    collected counts (domain-sized; exact reproducibility then holds
    per-platform rather than per-IEEE)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(F.col(domain_col).alias("__dom")).agg(
        F.count("*").alias("__n")
    )
    if alpha in (0.5, 1.0):
        mn = counts.agg(F.min("__n").alias("__nmin"))
        ratio = F.col("__nmin").cast("double") / F.col("__n").cast("double")
        r = F.sqrt(ratio) if alpha == 0.5 else F.lit(1.0)
        rates = counts.crossJoin(mn).select(
            "__dom",
            F.floor(
                F.least(F.lit(1.0), r * F.lit(float(scale))) * F.lit(_SCALE)
            ).alias("__thresh"),
        )
    else:
        rows = counts.collect()
        nmin = min(r2["__n"] for r2 in rows)
        spark = df.sparkSession
        rates = spark.createDataFrame(
            [
                (
                    r2["__dom"],
                    int(
                        min(1.0, scale * (nmin / r2["__n"]) ** (1.0 - alpha))
                        * _SCALE
                    ),
                )
                for r2 in rows
            ],
            ["__dom", "__thresh"],
        )
    out = df.join(
        F.broadcast(rates),
        # eqNullSafe: keep NULL-domain rows (they form their own domain
        # in the counts frame; == would silently drop them)
        df[domain_col].eqNullSafe(rates["__dom"]),
    ).where(_portable_hash_expr(id_col, _SCALE, seed) < F.col("__thresh"))
    return out.drop("__dom", "__thresh")


def token_budget_mix(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    text_col: str,
    budgets: dict[str, int],
    default_budget: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Token-weighted domain mixing: downsample each domain so its
    EXPECTED kept token mass hits a per-domain TOKEN budget — mixture
    specs for LLM corpora (Pile/Dolma-style) are token-weighted, not
    document-weighted, and long-document domains would blow a
    doc-count rule like :func:`temperature_mix`.

    Keep-rate ``r_d = min(1, budget_d / tokens_d)`` where ``tokens_d``
    is the domain's whitespace-token total; a document is kept iff
    ``md5(id ∥ seed) mod 10^6 < floor(r_d · 10^6)``. Domains absent
    from ``budgets`` get ``default_budget`` (0 = dropped). Never
    upsamples: a domain under budget is kept whole. Budgets are hit in
    expectation (documents are atomic — exact-cut packing is
    :func:`pack_documents`' job downstream).

    Shape: ONE map-side-combined ``groupBy(domain).sum(token_count)``
    (domain vocabulary is tiny), broadcast rate join, map-side hash
    filter — the corpus never shuffles, same contract as
    :func:`temperature_mix`.

    Cross-engine determinism: ``budget_d / tokens_d`` is one IEEE
    correctly-rounded double division and the threshold is
    ``floor(r · 10^6)``, so the kept set is bit-identical in Spark and
    DuckDB (the driver oracle replays it)."""
    budgets = {k: int(v) for k, v in budgets.items()}
    counts = df.groupBy(F.col(domain_col).alias("__dom")).agg(
        F.sum(token_count(text_col)).alias("__toks")
    )
    budget = F.lit(int(default_budget))
    for k, v in budgets.items():
        budget = F.when(F.col("__dom") == k, F.lit(v)).otherwise(budget)
    rates = counts.select(
        "__dom",
        F.floor(
            F.least(
                F.lit(1.0),
                # greatest(1): an all-empty domain has 0 tokens — any
                # positive budget keeps it whole, and 0/0 NaN semantics
                # differ across engines
                budget.cast("double")
                / F.greatest(F.col("__toks"), F.lit(1)).cast("double"),
            )
            * F.lit(_SCALE)
        ).alias("__thresh"),
    )
    # eqNullSafe: a NULL domain is a domain like any other — it grouped
    # into its own rate row above, and a plain == join would silently
    # drop every NULL-domain document regardless of default_budget
    out = df.join(
        F.broadcast(rates),
        df[domain_col].eqNullSafe(rates["__dom"]),
    ).where(_portable_hash_expr(id_col, _SCALE, seed) < F.col("__thresh"))
    return out.drop("__dom", "__thresh")


def assign_splits(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Deterministic train/val/test (or arbitrary) split assignment:
    ``split`` = the first bucket whose cumulative threshold exceeds the
    row's portable hash — scan-local (zero Exchange), retry/AQE-stable,
    engine-replayable, and CONSISTENT with :func:`hash_sample` (a 10%
    hash sample of the corpus intersects each split at the split's own
    rate, because both key on the same hash idiom but different seeds
    keep them independent). Doc-level sibling of the triple-level
    FB15k-protocol `kg/splits.py:split_triples`. ``fractions`` must sum
    to 1 (±1e-9); insertion order defines bucket boundaries."""
    tot = sum(fractions.values())
    if abs(tot - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {tot}")
    bad = {k: v for k, v in fractions.items() if not 0.0 < v <= 1.0}
    if bad:
        # negative fractions can still sum to 1 and would silently
        # corrupt the cumulative bucket boundaries
        raise ValueError(f"every fraction must be in (0, 1], got {bad}")
    h = _portable_hash_expr(id_col, _SCALE, seed)
    cum = 0.0
    expr = None
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = h < int(round(cum * _SCALE))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def mixture_order(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic proportional interleaving of domains — the
    "read the mixed corpus in THIS order" key a training loader needs
    so every prefix of the stream carries the target domain mixture
    (reading domain-by-domain would train on one domain for hours).

    Weighted-fair-queuing virtual finish times: within each domain,
    rows get rank 0,1,2,… in portable-hash order (a deterministic
    per-domain shuffle), and row i of domain d gets
    ``mix_key = (i + 1) / w_d`` — sorting by ``mix_key`` emits domains
    at rates ∝ w_d from the very first rows (the classic WFQ
    interleave). Domains absent from ``weights`` get
    ``default_weight``; non-positive weight drops the domain.

    Shape: ONE hash Exchange (the per-domain row_number window — same
    key the downstream consumer would partition on); the key itself is
    one IEEE division, so the order replays bit-identically in the
    DuckDB oracle. Emits ``mix_rank`` and ``mix_key`` — the caller
    sorts or range-partitions by ``mix_key`` (a global sort is the
    consumer's choice, not imposed here).

    Skew note: the window sorts WITHIN each domain partition; at 100 TB
    a single giant domain makes that one partition's sort big but
    spillable (ORDER BY inside a window spills to disk); if the rank
    only needs to be approximate, shard the domain by hash prefix and
    rescale ranks — not done here because exact replay is the
    contract."""
    w_expr = F.lit(float(default_weight))
    for k, v in weights.items():
        w_expr = F.when(F.col(domain_col) == k, F.lit(float(v))).otherwise(w_expr)
    win = Window.partitionBy(domain_col).orderBy(
        _portable_hash_expr(id_col, _SCALE, seed).asc(), F.col(id_col).asc()
    )
    out = (
        df.withColumn("__w", w_expr)
        .where(F.col("__w") > 0)
        .withColumn("mix_rank", F.row_number().over(win).cast("bigint") - 1)
        .withColumn(
            "mix_key",
            (F.col("mix_rank") + F.lit(1)).cast("double") / F.col("__w"),
        )
    )
    return out.drop("__w")


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_budget: int = 2048,
    n_shards: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Concat-then-chunk packing (the standard LLM pre-training layout):
    returns the ACTUAL packed layout — one row per (document × chunk it
    spans), with documents SPLIT across chunk boundaries.

    Columns: (``*id``, n_tokens, shard, chunk, pack_id, slot,
    pack_offset, token_start, token_end). Document tokens
    [token_start, token_end) fill pack ``pack_id`` starting at position
    ``pack_offset``; ``slot`` is the piece's 0-based ordinal within its
    pack. Within every pack the pieces tile [0, token_budget) exactly —
    Σ(token_end − token_start) == token_budget — except the final pack
    of each shard, which may be short. A document longer than the
    budget spans several consecutive packs. Zero-token documents emit
    one empty piece (token_start == token_end) for auditability.

    ``shard`` = portable hash of the id (uniform, deterministic);
    within a shard documents are ordered by id, laid head-to-tail at
    running offset ``off``, and chunk boundaries fall every
    ``token_budget`` tokens. ``pack_id`` = shard · 2^32 + chunk is
    globally unique. Shuffle shape: ONE hash exchange total — the
    running-offset window partitions by ``shard`` (independent per
    shard; parallelism scales with ``n_shards`` regardless of corpus
    size, size n_shards ≳ cluster cores), and the ``slot`` window's
    (shard, chunk) clustered distribution is already satisfied by that
    shard partitioning (all chunks of a shard are co-located), so
    Catalyst inserts only a per-partition sort, no second exchange
    (plan-audited)."""
    base = df.select(
        id_col,
        token_count(text_col).cast("bigint").alias("n_tokens"),
        _portable_hash_expr(id_col, n_shards, seed).cast("int").alias("shard"),
    )
    out = _pack_layout(base, id_col, int(token_budget), "n_tokens",
                       "token_start", "token_end")
    return out.select(
        id_col, "n_tokens", "shard", "chunk", "pack_id", "slot",
        "pack_offset", "token_start", "token_end",
    )


def _pack_layout(
    base: DataFrame,
    id_col: str,
    budget: int,
    n_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Shared concat-then-chunk layout math (the pack_documents
    docstring's contract, unit-agnostic): ``base`` must carry
    (``id_col``, ``n_col`` = per-document unit count, ``shard``) plus
    any passenger columns, which ride through untouched. Adds
    (chunk, pack_id, slot, pack_offset, ``start_col``, ``end_col``)
    with document units [start, end) filling pack ``pack_id`` at
    ``pack_offset``. ONE hash exchange total (see pack_documents)."""
    B = int(budget)
    w = Window.partitionBy("shard").orderBy(id_col)
    base = base.withColumn(
        "__off",
        F.coalesce(
            F.sum(n_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("bigint"),
    )
    off = F.col("__off")
    n = F.col(n_col)
    c0 = F.floor(off / B)
    c_last = F.when(n > 0, F.floor((off + n - 1) / B)).otherwise(c0)
    pieces = (
        base.withColumn("chunk", F.explode(F.sequence(c0, c_last)))
        .withColumn(
            "pack_id",
            (F.col("shard").cast("bigint") * F.lit(4294967296) + F.col("chunk")).cast("bigint"),
        )
        .withColumn(
            "pack_offset",
            F.greatest(off - F.col("chunk") * B, F.lit(0)).cast("bigint"),
        )
        .withColumn(
            start_col,
            F.greatest(F.col("chunk") * B - off, F.lit(0)).cast("bigint"),
        )
        .withColumn(
            end_col,
            F.least(n, (F.col("chunk") + 1) * B - off).cast("bigint"),
        )
    )
    slot_w = Window.partitionBy("shard", "chunk").orderBy(id_col)
    return pieces.withColumn(
        "slot", (F.row_number().over(slot_w) - 1).cast("bigint")
    )


def pack_with_spans(
    df: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "example_text",
    spans_col: str = "mask_spans",
    char_budget: int = 2048,
    n_shards: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Mask-preserving sequence packing: the :func:`pack_documents`
    concat-then-chunk layout in CHARACTER units, carrying per-document
    annotation spans (``spans_col``, the ``"start:end,start:end"``
    char-offset format :func:`~crfsuite_spark.operators.transcripts.
    chat_examples` emits as ``mask_spans``) through the chunk slicing —
    the composition an SFT data pipeline actually needs: after packing,
    every training row must still know WHICH of its characters are
    loss-masked, and a document split across a pack boundary must split
    its mask spans with it.

    One output row per (document × pack it spans):
    (``*id``, n_chars, shard, chunk, pack_id, slot, pack_offset,
    char_start, char_end, piece_text, piece_mask_spans) where
    ``piece_text = text[char_start:char_end]`` and
    ``piece_mask_spans`` re-bases each input span clipped to
    [char_start, char_end) into PACK-local coordinates:
    ``pack_offset + (clip_start − char_start) : pack_offset +
    (clip_end − char_start)`` — so ``pack_text[a:b]`` is masked text
    for every ``a:b`` in any piece of that pack (the invariant
    tests/test_invariants.py slices back out). Spans that miss the
    piece vanish; spans straddling a boundary are split — mask
    coverage in characters is exactly conserved (tested).

    Shape: identical ONE hash exchange as :func:`pack_documents` (the
    shard window; the slot window reuses its partitioning) — but here
    the text rides the shuffle ONCE, unavoidably: a materialized packed
    corpus must move each byte once. Span parsing, clipping and
    re-basing are scan-local array HOFs after the window (staged as
    named columns — duplicating nested-lambda trees inside one
    projection mis-binds lambda variables under Spark 4.1's resolver,
    see operators/dedup.py).
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        id_col,
        txt.alias("__txt"),
        F.coalesce(F.col(spans_col), F.lit("")).alias("__sp"),
        F.length(txt).cast("bigint").alias("n_chars"),
        _portable_hash_expr(id_col, n_shards, seed).cast("int").alias("shard"),
    )
    out = _pack_layout(base, id_col, int(char_budget), "n_chars",
                       "char_start", "char_end")
    s, e, po = F.col("char_start"), F.col("char_end"), F.col("pack_offset")
    parsed = F.transform(
        F.filter(F.split(F.col("__sp"), ","), lambda x: x != F.lit("")),
        lambda x: F.struct(
            F.split(x, ":")[0].cast("bigint").alias("a"),
            F.split(x, ":")[1].cast("bigint").alias("b"),
        ),
    )
    staged = out.withColumn("__parsed", parsed).withColumn(
        "__clipped",
        F.filter(
            F.transform(
                F.col("__parsed"),
                lambda x: F.struct(
                    F.greatest(x["a"], s).alias("lo"),
                    F.least(x["b"], e).alias("hi"),
                ),
            ),
            lambda x: x["hi"] > x["lo"],
        ),
    )
    rebased = F.transform(
        F.col("__clipped"),
        lambda x: F.concat(
            (po + x["lo"] - s).cast("string"), F.lit(":"),
            (po + x["hi"] - s).cast("string"),
        ),
    )
    return staged.select(
        id_col, "n_chars", "shard", "chunk", "pack_id", "slot",
        "pack_offset", "char_start", "char_end",
        F.col("__txt").substr(
            (s + 1).cast("int"), (e - s).cast("int")
        ).alias("piece_text"),
        F.array_join(rebased, ",").alias("piece_mask_spans"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    context-window chunking for pre-training / RAG indexing. Returns
    one row per chunk: (*id, chunk_idx, n_tokens, chunk_text).

    Chunk i covers tokens [i·step, i·step + window) with
    step = window − overlap; the last chunk may be shorter; a document
    of ≤ window tokens yields exactly one chunk; empty/NULL text yields
    none. Pure JVM: split → sequence/transform/slice → posexplode — a
    map-side explode with no shuffle, so it scales as a plain
    projection at any corpus size."""
    if window <= 0 or overlap < 0 or overlap >= window:
        raise ValueError(
            "need window > 0 and 0 <= overlap < window "
            f"(got window={window}, overlap={overlap})"
        )
    step = window - overlap
    c = F.coalesce(F.col(text_col), F.lit(""))
    w = F.split(F.trim(c), r"\s+")
    n = F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(w))
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.when(n <= window, F.lit(1)).otherwise(
            F.ceil((n - F.lit(overlap)) / F.lit(step)).cast("int")
        )
    )
    chunks = F.when(n_chunks <= 0, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.size(F.slice(w, i * step + 1, window)).cast("bigint").alias("n_tokens"),
                F.array_join(F.slice(w, i * step + 1, window), " ").alias("chunk_text"),
            ),
        )
    )
    return (
        df.select(id_col, F.explode(chunks).alias("__c"))
        .select(id_col, "__c.chunk_idx", "__c.n_tokens", "__c.chunk_text")
    )

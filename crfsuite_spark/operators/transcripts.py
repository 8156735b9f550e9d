"""Conversation-level analytics and training-example rendering over the
Iceberg-shaped transcript table ``(conv_id, turn_idx, role, text, tool, ts)``.

The reference operates on one annotated document set at a time
(`R/crfsuite.R` takes a flat token frame); at 10^12-turn transcript scale
the per-conversation rollup is the unit a curation pipeline reasons
about — which conversations are tool-heavy, degenerate (no role
alternation), or stale. Both operators here are one-Exchange shapes:
a window over ``conv_id`` followed by a ``groupBy(conv_id)`` reuses the
window's hash partitioning, so the transcript text crosses the wire at
most once regardless of corpus size.

``chat_examples`` renders each conversation into a single training
string with character-offset loss-mask spans over the assistant turns —
the standard SFT layout (mask user/tool context, train on assistant
tokens), produced entirely with JVM Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def conv_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Per-conversation rollup: turn/role/tool counts, token volume,
    time span, largest inter-turn gap, and role-alternation rate.

    One window + one groupBy, both keyed on ``conv_col`` → a single
    Exchange; every aggregate has a map-side partial. Doubles are
    rounded to 6 places so cross-engine value hashes are stable.
    """
    from crfsuite_spark.functions.analysis import token_count

    w = Window.partitionBy(conv_col).orderBy(order_col)
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    gap_ms = ms - F.unix_millis(F.lag("ts", 1).over(w).cast("timestamp"))
    role_switch = F.when(
        F.lag("role", 1).over(w).isNotNull()
        & (F.lag("role", 1).over(w) != F.col("role")),
        1,
    ).otherwise(0)
    # the repo-wide whitespace token count (NULL/empty -> 0), so these
    # stats reconcile with pack_documents budgets on the same corpus
    n_tokens = token_count("text")

    turns = df.select(
        conv_col,
        F.col("role"),
        F.col("tool"),
        ms.alias("__ms"),
        gap_ms.alias("__gap_ms"),
        role_switch.alias("__switch"),
        n_tokens.alias("__n_tok"),
    )
    n = F.count(F.lit(1)).cast("bigint")
    return turns.groupBy(conv_col).agg(
        n.alias("n_turns"),
        F.countDistinct("role").cast("bigint").alias("n_roles"),
        F.count("tool").cast("bigint").alias("n_tool_calls"),
        F.round(F.count("tool") / n, 6).alias("tool_frac"),
        F.sum((F.col("role") == F.lit("assistant")).cast("int")).cast("bigint")
        .alias("n_assistant"),
        F.sum("__n_tok").cast("bigint").alias("n_tokens"),
        F.round(F.avg("__n_tok"), 6).alias("avg_turn_tokens"),
        (F.max("__ms") - F.min("__ms")).cast("bigint").alias("span_ms"),
        F.max("__gap_ms").cast("bigint").alias("max_gap_ms"),
        F.sum("__switch").cast("bigint").alias("n_role_switches"),
        F.when(n > 1, F.round(F.sum("__switch") / (n - 1), 6))
        .alias("alternation_rate"),
    )


def sft_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    target_role: str = "assistant",
    max_context_turns: int = 8,
) -> DataFrame:
    """One training pair per ``target_role`` turn: the newline-joined
    render of the previous ≤ ``max_context_turns`` turns as context,
    the turn's own text as target — the per-turn SFT layout (one
    example per assistant reply) complementing ``chat_examples``'s
    whole-conversation layout.

    A single bounded window (ROWS k PRECEDING .. 1 PRECEDING) over
    ``conv_col`` — one Exchange, state bounded by k turns regardless
    of conversation length, so a 10^5-turn agent log costs the same
    per row as a 3-turn chat.
    """
    rendered = _rendered(F.col("role"), F.col("text"))
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(-max_context_turns, -1)
    )
    ctx = F.array_join(F.collect_list(rendered).over(w), "\n")
    return (
        df.select(
            conv_col,
            F.col(order_col),
            F.col("role"),
            F.coalesce(F.col("text"), F.lit("")).alias("__target"),
            ctx.alias("context"),
        )
        .where(F.col("role") == target_role)
        .select(
            conv_col, order_col, "context",
            F.col("__target").alias("target"),
            F.length("context").cast("bigint").alias("n_context_chars"),
        )
    )


def turn_transitions(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Corpus-wide (prev_state -> state) transition counts, where a
    turn's state is its role, refined to ``tool:<name>`` for tool
    turns — the Markov skeleton of agentic flows (user -> assistant ->
    tool:search -> assistant ...). ``prev_state`` is NULL for
    conversation-opening turns, so openers are counted too.

    One window (lag over conv) + one global groupBy on a tiny key
    domain (|roles ∪ tools|^2) — the second Exchange moves only
    counted pairs, never text.
    """
    state = F.when(
        F.col("tool").isNotNull(), F.concat(F.lit("tool:"), F.col("tool"))
    ).otherwise(F.col("role"))
    w = Window.partitionBy(conv_col).orderBy(order_col)
    return (
        df.select(F.col(conv_col), F.col(order_col), state.alias("state"))
        .withColumn("prev_state", F.lag("state", 1).over(w))
        .groupBy("prev_state", "state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def conv_stats_deltas(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Mergeable per-conversation partial state for :func:`conv_stats`.

    The incremental-maintenance form (same contract as
    kg/lifecycle.py's edge deltas): aggregate each arriving batch to
    deltas, fold batches with :func:`merge_conv_deltas`, finalize with
    :func:`finalize_conv_deltas` — and the result equals conv_stats
    over the union, so a 10^12-turn log absorbs daily batches without
    recomputation. Window-dependent stats (max gap, role switches)
    merge exactly because each delta carries its boundary turns: the
    only cross-batch pair is (A.last, B.first). CONTRACT: batches
    split conversations contiguously in ``order_col`` (batch A's turns
    all precede batch B's), the natural shape of time-partitioned logs.
    """
    from crfsuite_spark.functions.analysis import token_count

    w = Window.partitionBy(conv_col).orderBy(order_col)
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    gap_ms = ms - F.unix_millis(F.lag("ts", 1).over(w).cast("timestamp"))
    role_switch = F.when(
        F.lag("role", 1).over(w).isNotNull()
        & (F.lag("role", 1).over(w) != F.col("role")),
        1,
    ).otherwise(0)
    turns = df.select(
        conv_col,
        F.col(order_col).alias("__ord"),
        F.col("role"),
        F.col("tool"),
        ms.alias("__ms"),
        gap_ms.alias("__gap_ms"),
        role_switch.alias("__switch"),
        token_count("text").alias("__n_tok"),
    )
    bound = F.struct(F.col("__ord").alias("o"), F.col("role").alias("r"),
                     F.col("__ms").alias("m"))
    return turns.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.collect_set("role").alias("roles"),
        F.count("tool").cast("bigint").alias("n_tool_calls"),
        F.sum((F.col("role") == F.lit("assistant")).cast("int"))
        .cast("bigint").alias("n_assistant"),
        F.sum("__n_tok").cast("bigint").alias("n_tokens"),
        F.min("__ms").cast("bigint").alias("min_ms"),
        F.max("__ms").cast("bigint").alias("max_ms"),
        F.max("__gap_ms").cast("bigint").alias("max_gap_ms"),
        F.sum("__switch").cast("bigint").alias("n_role_switches"),
        F.min_by(bound, F.col("__ord")).alias("first_turn"),
        F.max_by(bound, F.col("__ord")).alias("last_turn"),
    )


def merge_conv_deltas(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two delta frames (batch A's turns precede batch B's per
    the conv_stats_deltas contract). Conversations present in only one
    side pass through unchanged; for shared conversations the single
    cross-batch adjacency (A.last_turn, B.first_turn) supplies the
    boundary gap and switch."""
    an = a.select(*[F.col(c).alias(f"a_{c}") for c in a.columns])
    bn = b.select(*[F.col(c).alias(f"b_{c}") for c in b.columns])
    conv = a.columns[0]
    j = an.join(
        bn, an[f"a_{conv}"] == bn[f"b_{conv}"], "full_outer"
    )
    both = j[f"a_{conv}"].isNotNull() & j[f"b_{conv}"].isNotNull()
    a_only = j[f"b_{conv}"].isNull()

    def pick(c, merged):
        return (
            F.when(a_only, F.col(f"a_{c}"))
            .when(~both, F.col(f"b_{c}"))
            .otherwise(merged)
        )

    boundary_gap = F.col("b_first_turn.m") - F.col("a_last_turn.m")
    boundary_switch = (
        F.col("a_last_turn.r") != F.col("b_first_turn.r")
    ).cast("bigint")
    return j.select(
        F.coalesce(F.col(f"a_{conv}"), F.col(f"b_{conv}")).alias(conv),
        pick("n_turns", F.col("a_n_turns") + F.col("b_n_turns"))
        .alias("n_turns"),
        pick("roles", F.array_distinct(
            F.concat(F.col("a_roles"), F.col("b_roles")))).alias("roles"),
        pick("n_tool_calls",
             F.col("a_n_tool_calls") + F.col("b_n_tool_calls"))
        .alias("n_tool_calls"),
        pick("n_assistant", F.col("a_n_assistant") + F.col("b_n_assistant"))
        .alias("n_assistant"),
        pick("n_tokens", F.col("a_n_tokens") + F.col("b_n_tokens"))
        .alias("n_tokens"),
        pick("min_ms", F.least("a_min_ms", "b_min_ms")).alias("min_ms"),
        pick("max_ms", F.greatest("a_max_ms", "b_max_ms")).alias("max_ms"),
        pick("max_gap_ms", F.greatest(
            F.coalesce(F.col("a_max_gap_ms"), F.lit(None).cast("bigint")),
            F.col("b_max_gap_ms"),
            boundary_gap,
        )).alias("max_gap_ms"),
        pick("n_role_switches",
             F.col("a_n_role_switches") + F.col("b_n_role_switches")
             + boundary_switch).alias("n_role_switches"),
        pick("first_turn", F.col("a_first_turn")).alias("first_turn"),
        pick("last_turn", F.col("b_last_turn")).alias("last_turn"),
    )


def finalize_conv_deltas(deltas: DataFrame) -> DataFrame:
    """Delta frame → the exact :func:`conv_stats` output schema."""
    n = F.col("n_turns")
    return deltas.select(
        deltas.columns[0],
        "n_turns",
        F.size("roles").cast("bigint").alias("n_roles"),
        "n_tool_calls",
        F.round(F.col("n_tool_calls") / n, 6).alias("tool_frac"),
        "n_assistant",
        "n_tokens",
        F.round(F.col("n_tokens") / n, 6).alias("avg_turn_tokens"),
        (F.col("max_ms") - F.col("min_ms")).cast("bigint").alias("span_ms"),
        "max_gap_ms",
        "n_role_switches",
        F.when(n > 1, F.round(F.col("n_role_switches") / (n - 1), 6))
        .alias("alternation_rate"),
    )


def conv_episodes(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    gap_minutes: int = 60,
) -> DataFrame:
    """Segment each conversation into episodes at inter-turn time gaps
    > ``gap_minutes`` (the sessionize recipe applied to transcripts).

    Output: the input columns + ``episode`` (0-based, per conv).
    This is the principled bound on hot-conversation skew: a 10^5-turn
    agent log is one window partition for every per-conversation
    operator, but its (conv, episode) pieces are bounded by activity
    bursts — downstream windows keyed on (conv_col, "episode") get
    skew-unit = one episode. One window Exchange, reused by the
    running-sum numbering.
    """
    w = Window.partitionBy(conv_col).orderBy(order_col)
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    gap = ms - F.unix_millis(F.lag("ts", 1).over(w).cast("timestamp"))
    brk = F.when(gap > gap_minutes * 60_000, 1).otherwise(0)
    return df.withColumn(
        "episode",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )


def repeated_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    lookback: int = 5,
) -> DataFrame:
    """Flag turns whose text exactly repeats any of the previous
    ``lookback`` turns in the conversation — the bot-loop / retry-storm
    signal SFT curation drops before training.

    Compares md5 digests inside a bounded window frame (collect_list
    over ROWS lookback PRECEDING .. 1 PRECEDING), so per-row state is
    ``lookback`` digests regardless of conversation length. Output:
    input columns + ``is_repeat`` (boolean, NULL-text turns never
    match).
    """
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(-lookback, -1)
    )
    digest = F.md5(F.col("text"))
    prev = F.collect_list(digest).over(w)
    return df.withColumn(
        "is_repeat",
        F.when(
            F.col("text").isNotNull(),
            F.array_contains(prev, digest),
        ).otherwise(F.lit(False)),
    )


def _rendered(role: Column, text: Column) -> Column:
    # NULL text is in-contract upstream (tokenize documents it); render
    # it as an empty turn so n_chars keeps describing the emitted string
    return F.concat(F.lit("<|"), role, F.lit("|>"), F.coalesce(text, F.lit("")))


def chat_examples(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    mask_role: str = "assistant",
) -> DataFrame:
    """Render each conversation into one newline-joined training string
    with character-offset loss-mask spans over ``mask_role`` turns.

    Output: (conv_id, example_text, n_chars, mask_spans) where
    ``mask_spans`` is a comma-joined ``start:end`` list (end exclusive)
    such that ``example_text[start:end]`` is exactly the rendered
    ``<|role|>text`` of each masked turn — the invariant
    tests/test_transcript_stats.py slices back out and checks.

    Shape: a running-sum window over ``conv_col`` computes each turn's
    byte offset, then a ``groupBy(conv_col)`` assembles the ordered
    string via sort_array(collect_list(struct)) — partitioning is
    reused, so the text shuffles once.
    """
    w = Window.partitionBy(conv_col).orderBy(order_col)
    rendered = _rendered(F.col("role"), F.col("text"))
    # +1 for the '\n' separator that concat adds AFTER every turn but
    # the last; offsets count it uniformly because turn i's offset only
    # sums separators of turns < i.
    piece_len = F.length(rendered) + F.lit(1)
    offset = F.coalesce(
        F.sum(piece_len).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    turns = df.select(
        conv_col,
        F.col(order_col).alias("__ord"),
        F.col("role"),
        rendered.alias("__r"),
        offset.alias("__off"),
        F.length(rendered).cast("bigint").alias("__len"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("__ord"), F.col("__r"), F.col("__off"),
                                F.col("__len"), F.col("role")))
    )
    span = lambda x: F.concat(  # noqa: E731
        x["__off"].cast("string"), F.lit(":"),
        (x["__off"] + x["__len"]).cast("string"),
    )
    return (
        turns.groupBy(conv_col)
        .agg(ordered.alias("__t"))
        .select(
            conv_col,
            F.array_join(
                F.transform(F.col("__t"), lambda x: x["__r"]), "\n"
            ).alias("example_text"),
            F.aggregate(
                F.col("__t"), F.lit(0).cast("bigint"),
                lambda acc, x: acc + x["__len"] + 1,
            ).alias("__tot"),
            F.array_join(
                F.transform(
                    F.filter(F.col("__t"), lambda x: x["role"] == mask_role),
                    span,
                ),
                ",",
            ).alias("mask_spans"),
        )
        .select(
            conv_col,
            "example_text",
            (F.col("__tot") - 1).alias("n_chars"),  # no trailing separator
            "mask_spans",
        )
    )


def boilerplate_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
    min_convs: int = 10,
) -> DataFrame:
    """Cross-corpus boilerplate-turn detection — the RefinedWeb /
    CCNet line-dedup policy (Penedo et al. 2023 §3.4, "remove
    duplicated lines") applied to transcripts: a turn whose exact text
    occurs in >= ``min_convs`` DISTINCT conversations is boilerplate
    (canned greetings, disclaimers, template confirmations). Unlike
    :func:`crfsuite_spark.operators.dedup.span_dedup` there is no
    canonical survivor — text repeated across that many independent
    conversations carries no training signal anywhere, so the flag
    marks EVERY occurrence (the caller filters or masks).

    Returns the input rows + ``n_convs`` (distinct conversations the
    exact text appears in) + ``is_boilerplate``. NULL/empty text is
    never flagged (empty turns are a different curation signal).

    Scale shape: digests are md5(text), a uniform key; the distinct
    (digest, conv) count is two partial-aggregated groupBys (the
    per-partition dedup collapses hot boilerplate before the shuffle,
    exactly the skew that motivates the operator). The flag joins back
    on the digest key — AQE converts it to a broadcast join when the
    frequent set is small (the common case: boilerplate digests are
    few), and the sort-merge fallback stays spillable when it is not.
    The corpus text itself never moves: only digests shuffle.
    """
    digest = F.md5(F.col(text_col))
    has_text = F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    counts = (
        df.where(has_text)
        .select(digest.alias("__digest"), F.col(conv_col).alias("__conv"))
        .distinct()
        .groupBy("__digest")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n_convs"))
    )
    flagged = (
        df.withColumn("__digest", F.when(has_text, digest))
        .join(counts, "__digest", "left")
        .withColumn("n_convs", F.coalesce(F.col("__n_convs"), F.lit(0)))
        .withColumn("is_boilerplate", F.col("n_convs") >= F.lit(min_convs))
        .drop("__digest", "__n_convs")
    )
    return flagged


def conv_entity_overlap(
    mentions: DataFrame,
    conv: str = "conv_id",
    entity: str = "canonical_id",
    min_jaccard: float = 0.25,
    max_entity_convs: int | None = 1000,
) -> DataFrame:
    """Related-conversation pairs by shared-entity Jaccard:
    (conv_a, conv_b, n_shared, n_a, n_b, jaccard) for conversation
    pairs whose LINKED entity sets overlap — the retrieval/curation
    query behind "other conversations about these entities" and
    cross-conversation dedup triage. conv_a < conv_b canonical.

    Sparse-similarity-join shape (same as n-gram Jaccard dedup, with
    entities as the shingles): distinct (conv, entity) map-side, pair
    candidates generated by self-joining on the ENTITY key — so only
    conversations sharing at least one entity ever pair, never the
    all-pairs square. A ubiquitous entity is the classic hot key;
    ``max_entity_convs`` drops entities above the bound (documented
    loss: pairs sharing ONLY ubiquitous entities are missed — by
    construction the pairs PMI would score near zero anyway). Set
    sizes join back as two aggregated frames on uniform conv keys;
    the final Jaccard filter is a map-side predicate."""
    m = (
        mentions.select(
            F.col(conv).alias("c"), F.col(entity).alias("e")
        )
        .where(F.col(entity).isNotNull())
        .distinct()
    )
    if max_entity_convs:
        edf = m.groupBy("e").agg(F.count(F.lit(1)).alias("__n"))
        m = (
            m.join(edf.where(F.col("__n") <= max_entity_convs), "e")
            .drop("__n")
        )
    sizes = m.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = m.select(F.col("e"), F.col("c").alias("conv_a"))
    b = m.select(F.col("e"), F.col("c").alias("conv_b"))
    shared = (
        a.join(b, "e")
        .where(F.col("conv_a") < F.col("conv_b"))
        .groupBy("conv_a", "conv_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    return (
        shared.join(
            sizes.select(F.col("c").alias("conv_a"), F.col("n").alias("n_a")),
            "conv_a",
        )
        .join(
            sizes.select(F.col("c").alias("conv_b"), F.col("n").alias("n_b")),
            "conv_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_shared")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .where(F.col("jaccard") >= F.lit(float(min_jaccard)))
        .select("conv_a", "conv_b", "n_shared", "n_a", "n_b", "jaccard")
    )


def topic_segments(
    mentions: DataFrame,
    jaccard_threshold: float = 0.2,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    entity: str = "canonical_id",
) -> DataFrame:
    """Entity-shift topic segmentation: split each conversation into
    segments at mention-bearing turns whose entity set has Jaccard <
    ``jaccard_threshold`` against the previous mention-bearing turn —
    the TextTiling idea (Hearst 1997) with linked entities as the
    lexical signal, which is what a transcript KG already has. Output
    per mention-bearing turn: (conv_id, turn_idx, entities,
    jaccard_prev, is_boundary, segment) — segment is a 1-based
    ordinal; downstream chunkers cut conversations at boundaries
    instead of fixed windows.

    Jaccard against the PREVIOUS turn only (not a decayed window) —
    deterministic, one lag. First mention-bearing turn of a conv is
    always a boundary; ``jaccard_prev`` is NULL there. NULL entity
    ids (unlinked mentions) are dropped FIRST: a turn whose mentions
    all failed linking carries no topic signal and must not
    force-split the conversation with an empty set.

    Scale shape: entity sets collapse per (conv, turn) in one
    map-side-combined groupBy; the lag + running boundary count are
    conversation-bounded windows over the TURN-grain aggregate (same
    class as the W1 feature windows — partitioned on the uniform conv
    key, never a global sort)."""
    from pyspark.sql import Window

    sets = (
        mentions.where(F.col(entity).isNotNull())
        .groupBy(F.col(conv).alias("conv_id"),
                 F.col(turn).alias("turn_idx"))
        .agg(F.sort_array(F.collect_set(entity)).alias("entities"))
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("entities").over(w)
    inter = F.size(F.array_intersect(F.col("entities"), prev))
    uni = F.size(F.array_union(F.col("entities"), prev))
    jac = (inter / uni).alias("jaccard_prev")
    flagged = sets.select(
        "conv_id", "turn_idx", "entities",
        jac,
        (prev.isNull() | ((inter / uni) < F.lit(float(jaccard_threshold))))
        .alias("is_boundary"),
    )
    run = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return flagged.withColumn(
        "segment", F.sum(F.col("is_boundary").cast("int")).over(run)
    )

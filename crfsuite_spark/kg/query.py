"""Conjunctive triple-pattern matching (SPARQL-style basic graph
patterns) compiled to Catalyst join chains.

The reference engine (bnosac/crfsuite) stops at producing annotated
tokens/chunks; querying the *materialized* triple table is part of this
engine's KG-construction tier.  Semantics follow the public SPARQL 1.1
spec restricted to conjunctive basic graph patterns with DISTINCT
projection and post-match FILTERs — a pattern is a (subj, pred, obj)
triple of terms where a term starting with ``?`` is a variable and
anything else is a constant.

Spark-first compilation:

- Each pattern is ONE filtered scan of the triple frame: constants
  become scan predicates (pushed to parquet, so a constant-predicate
  pattern over a pred-partitioned table prunes to that predicate's
  files), variables become column renames, a variable repeated WITHIN
  a pattern becomes a same-row equality filter.
- Each pattern scan is DEDUPLICATED after projecting to its variables
  (a narrow map-side-combined distinct). An RDF graph is a SET of
  triples, so this is the SPARQL-correct semantics — and at scale it
  is the difference between joining edge sets and joining mention
  streams: 100 M provenance duplicates of 10 distinct employment
  edges would otherwise SQUARE through every shared-variable join
  (measured: a 3-pattern query over a 2.75 M-mention table with a
  small entity vocabulary never finished without it). Tables already
  collapsed to distinct triples can skip the extra exchange with
  ``assume_distinct=True``.
- Patterns are joined most-constrained-first (constant count desc),
  greedily picking a next pattern that shares a variable with the
  already-bound set so every join is an equi-join on those shared
  variables; disconnected pattern groups fall back to an explicit
  cross join (their true semantics).  Join *strategy* is left to AQE,
  which sees runtime sizes after the constant filters — a fully-bound
  or two-constant pattern collapses to a few rows and broadcasts
  itself without any driver-side guess here.
- No UDFs, no collect: the whole query is one declarative plan, so at
  100 TB it inherits partition pruning, AQE skew splitting, and
  whole-stage codegen for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SLOTS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _sort_exprs(order_by: list[str]):
    """``["city DESC", "n NULLS LAST", "person"]`` → Column sort orders.

    ``F.expr("p DESC")`` is a trap: Spark's expression parser reads it
    as ``p AS DESC`` (an alias) and sorts ascending — direction words
    are statement-level syntax, not expression syntax.  So the
    direction / null-ordering suffixes are peeled off here and applied
    with the Column API; everything before them may be any SQL
    expression.
    """
    out = []
    for spec in order_by:
        s = spec.strip()
        nulls = None
        for suffix, mode in ((" NULLS FIRST", "first"), (" NULLS LAST", "last")):
            if s.upper().endswith(suffix):
                s, nulls = s[: -len(suffix)].rstrip(), mode
                break
        direction = "asc"
        for suffix, mode in ((" DESC", "desc"), (" ASC", "asc")):
            if s.upper().endswith(suffix):
                s, direction = s[: -len(suffix)].rstrip(), mode
                break
        col = F.expr(s)
        if direction == "desc":
            col = col.desc_nulls_first() if nulls == "first" else (
                col.desc_nulls_last() if nulls == "last" else col.desc())
        else:
            col = col.asc_nulls_first() if nulls == "first" else (
                col.asc_nulls_last() if nulls == "last" else col.asc())
        out.append(col)
    return out


def _has_seq_path(pattern) -> bool:
    return (
        len(pattern) == 3
        and not _is_var(pattern[1])
        and "/" in pattern[1]
    )


def _expand_sequences(patterns, sources):
    """SPARQL sequence paths ``p1/p2`` → the spec's own algebra
    translation: ``(?x, p1/p2, ?y)`` becomes ``(?x, p1, ?__seqI_0)
    . (?__seqI_0, p2, ?y)`` with the internal variable projected away
    (SPARQL 1.1 §9.1 translates sequence paths to exactly this BGP, so
    binding multiplicity — one solution per distinct intermediate — is
    the spec's, not an approximation).  Each hop may itself be ``^p``,
    ``p+`` or ``p1|p2``; note alternation binds TIGHTER than sequence
    here (``a|b/c`` reads ``(a|b)/c`` — SPARQL's precedence is the
    reverse; split such paths into explicit patterns when it matters).

    Internal variables are real join columns, so the whole sequence is
    still one Catalyst join chain — no recursion, no driver loop.
    """
    out_p, out_s = [], []
    for i, pat in enumerate(patterns):
        src = None if sources is None else sources[i]
        if _has_seq_path(pat):
            hops = pat[1].split("/")
            if any(not h or h in ("^", "+", "*", "?") for h in hops):
                raise ValueError(f"empty hop in sequence path {pat[1]!r}")
            if src is not None:
                raise ValueError(
                    "sources cannot override a sequence-path pattern "
                    "(it expands to multiple scans)"
                )
            cur = pat[0]
            for j, hop in enumerate(hops):
                nxt = pat[2] if j == len(hops) - 1 else f"?__seq{i}_{j}"
                out_p.append((cur, hop, nxt))
                out_s.append(None)
                cur = nxt
        else:
            out_p.append(pat)
            out_s.append(src)
    return out_p, (None if sources is None else out_s)


def _pred_filter(base: str) -> F.Column:
    """Scan predicate for a path-term base: ``p`` equality, ``p1|p2``
    alternation (IN-list), ``!p1|p2`` negated property set (NOT IN —
    SPARQL ``!(p1|p2)``).  All three reach the parquet scan as pushed
    filters."""
    if base.startswith("!") and len(base) > 1:
        return ~F.col("pred").isin(base[1:].split("|"))
    if "|" in base:
        return F.col("pred").isin(base.split("|"))
    return F.col("pred") == F.lit(base)


def _bind_src_dst(df: DataFrame, pattern, idx: int):
    """Apply a pattern's subj/obj terms to a (src, dst) pair frame:
    constants filter, variables rename, a repeated variable forces
    src = dst, no variables → a one-row ground marker."""
    var_slot: dict[str, str] = {}
    n_consts = 0
    for slot, term in (("src", pattern[0]), ("dst", pattern[2])):
        if _is_var(term):
            name = term[1:]
            if name in var_slot:  # (?x, path, ?x): pairs closing on self
                df = df.filter(F.col(slot) == F.col(var_slot[name]))
            else:
                var_slot[name] = slot
        else:
            df = df.filter(F.col(slot) == F.lit(term))
            n_consts += 1
    if not var_slot:
        return df.select(F.lit(1).alias(f"__ground_{idx}")).limit(1), n_consts
    return (
        df.select(*[F.col(s).alias(n) for n, s in var_slot.items()]),
        n_consts,
    )


def _identity_pairs(triples: DataFrame, pattern) -> DataFrame:
    """The zero-length-path pair frame for ``p*`` / ``p?`` terms.

    SPARQL's ZeroLengthPath: with a constant on either end the
    zero-length match binds the other end to that constant (even when
    it appears in no triple — the spec evaluates the term, not the
    graph); with variables on both ends it binds ?x = ?y for every
    node of the graph, which costs one distinct over the subj∪obj
    vocabulary — fine at entity-vocabulary scale, but prefer anchoring
    one end of a ``*`` pattern at 100 TB.
    """
    s_term, o_term = pattern[0], pattern[2]
    if not _is_var(s_term) or not _is_var(o_term):
        const = s_term if not _is_var(s_term) else o_term
        return triples.sparkSession.createDataFrame(
            [(const, const)], "src string, dst string"
        )
    nodes = (
        triples.select(F.col("subj").alias("src"))
        .unionByName(triples.select(F.col("obj").alias("src")))
        .distinct()
    )
    return nodes.select("src", F.col("src").alias("dst"))


def _compile_pattern(triples: DataFrame, pattern, idx: int,
                     assume_distinct: bool = False, path_hops: int = 3):
    """One pattern → (frame-with-variable-columns, n_constants, pinned).

    A pattern with no variables compiles to an existence probe: a
    one-row marker frame if the triple is present, empty otherwise
    (its cross join then keeps or annihilates the other bindings —
    exactly SPARQL's semantics for a fully-ground pattern).

    A constant predicate ending in ``+`` (SPARQL property path
    ``pred{1,path_hops}``) compiles to the semi-naive bounded closure
    (kg/graph.py:property_path) instead of a single-edge scan; its
    persisted rounds are returned as ``pinned``.  ``pred*``
    (zero-or-more, ``pred{0,path_hops}``) adds the zero-length
    identity pairs to that closure; ``pred?`` (zero-or-one) adds them
    to the single-edge scan.  All quantifiers accept an alternation
    base (``(p1|p2)+`` ≡ ``p1|p2+`` here — the quantifier applies to
    the whole alternation).
    """
    if len(pattern) != 3:
        raise ValueError(f"pattern {pattern!r} is not a (subj, pred, obj) triple")
    p_term = pattern[1]
    if not _is_var(p_term) and p_term.startswith("^") and len(p_term) > 1:
        # SPARQL inverse path ``^pred``: the same edges traversed
        # object→subject, i.e. the pattern with subj/obj swapped.  The
        # recursion composes with ``+`` for free: ``(^p)+`` equals
        # ``^(p+)`` as a relation (inverse of a closure is the closure
        # of the inverse), so ``^pred+`` is well-defined too.
        return _compile_pattern(
            triples, (pattern[2], p_term[1:], pattern[0]), idx,
            assume_distinct, path_hops,
        )
    if not _is_var(p_term) and p_term.endswith("+") and len(p_term) > 1:
        from crfsuite_spark.kg.graph import property_path

        pp = property_path(triples, p_term[:-1], max_hops=path_hops)
        # closure pairs are distinct already
        bound, extra = _bind_src_dst(pp.select("src", "dst"), pattern, idx)
        return bound, 1 + extra, pp.pinned_caches
    if not _is_var(p_term) and p_term.endswith("*") and len(p_term) > 1:
        from crfsuite_spark.kg.graph import property_path

        pp = property_path(triples, p_term[:-1], max_hops=path_hops)
        pairs = (
            _identity_pairs(triples, pattern)
            .unionByName(pp.select("src", "dst"))
            .distinct()
        )
        bound, extra = _bind_src_dst(pairs, pattern, idx)
        return bound, 1 + extra, pp.pinned_caches
    if not _is_var(p_term) and p_term.endswith("?") and len(p_term) > 1:
        edges = triples.filter(_pred_filter(p_term[:-1])).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
        pairs = _identity_pairs(triples, pattern).unionByName(edges).distinct()
        bound, extra = _bind_src_dst(pairs, pattern, idx)
        return bound, 1 + extra, []
    df = triples
    var_slot: dict[str, str] = {}
    n_consts = 0
    for slot, term in zip(_SLOTS, pattern):
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"empty variable name in pattern {pattern!r}")
            if name in var_slot:  # repeated var within the pattern
                df = df.filter(F.col(slot) == F.col(var_slot[name]))
            else:
                var_slot[name] = slot
        elif slot == "pred" and ("|" in term or term.startswith("!")):
            # SPARQL alternation ``p1|p2`` (IN-list) or negated
            # property set ``!p1|p2`` ≡ ``!(p1|p2)`` (NOT IN), both
            # pushed to parquet like an equality.  Only the predicate
            # slot parses ``|``/``!``; entity constants keep the
            # characters literally.
            df = df.filter(_pred_filter(term))
            n_consts += 1
        else:
            df = df.filter(F.col(slot) == F.lit(term))
            n_consts += 1
    if not var_slot:
        marker = df.select(F.lit(1).alias(f"__ground_{idx}")).limit(1)
        return marker, n_consts, []
    out = df.select(*[F.col(slot).alias(name) for name, slot in var_slot.items()])
    if not assume_distinct:
        out = out.distinct()
    return out, n_consts, []


def match_patterns(
    triples: DataFrame,
    patterns,
    select: list[str] | None = None,
    filters: list[str] | None = None,
    optional: list | None = None,
    bind: dict[str, str] | None = None,
    exists: list | None = None,
    not_exists: list | None = None,
    minus: list | None = None,
    values: dict[str, list] | None = None,
    bindings: DataFrame | None = None,
    order_by: list[str] | None = None,
    limit: int | None = None,
    offset: int | None = None,
    distinct: bool = True,
    assume_distinct: bool = False,
    sources: list[DataFrame] | None = None,
    path_hops: int = 3,
) -> DataFrame:
    """Match a conjunctive basic graph pattern against a triple frame.

    Parameters
    ----------
    triples : frame with ``subj``/``pred``/``obj`` string columns (the
        shape ``kg.triples.read_triples`` / ``kg.pipeline`` produce).
    patterns : list of ``(subj, pred, obj)`` terms; ``"?x"`` binds a
        variable, any other string matches that constant.  A constant
        predicate supports the SPARQL path forms: ``pred+`` (bounded
        transitive closure, see ``path_hops``), ``pred*``
        (zero-or-more: the closure plus zero-length identity pairs —
        see :func:`_identity_pairs` for the both-ends-variable cost),
        ``pred?`` (zero-or-one), ``^pred`` (inverse — the edge
        traversed object→subject), ``p1|p2`` alternation (an IN-list
        scan predicate, quantifiable: ``p1|p2+`` means ``(p1|p2)+``),
        ``!p1|p2`` negated property set (SPARQL ``!(p1|p2)``, a NOT-IN
        scan predicate, also quantifiable/invertible),
        and ``p1/p2`` sequence (expanded to the spec's chained-BGP
        translation with internal variables; see
        :func:`_expand_sequences` for the precedence caveat).
    select : variable names (without ``?``) to project; default = every
        variable in first-appearance order.
    filters : optional SQL boolean expressions over the bound variables
        (SPARQL FILTER analogue), e.g. ``["person <> org"]``.
    optional : patterns applied as SPARQL ``OPTIONAL`` blocks — each is
        a LEFT join on its variables shared with the required block
        (new variables stay NULL where the pattern has no match; rows
        are never removed).  Each optional pattern must share at least
        one variable with the required patterns, and is joined in list
        order (later optionals may join on variables earlier ones
        bound).
    distinct : set semantics on the projected rows (SPARQL
        ``SELECT DISTINCT``); pass False to keep binding multiplicity.
    assume_distinct : skip the per-pattern-scan dedup (see module
        docstring) when ``triples`` is already a distinct triple set.
    sources : override the frame ONE pattern position scans (same
        length as ``patterns``, None entries fall back to ``triples``)
        — the hook semi-naive rule evaluation uses to point one body
        position at the last round's delta (``kg/rules.py``).
    bind : SPARQL ``BIND(expr AS ?v)``: ``{"v": "sql expr"}`` adds
        computed variables, evaluated immediately after the required
        join chain (insertion order — later binds may reference
        earlier ones), so ``filters``/``values``/``select``/
        ``order_by`` can all use them; a bind may reference required-
        pattern variables only (not OPTIONAL-bound ones), and
        shadowing an existing variable raises (SPARQL forbids it
        too).  Pure scan-local column exprs — no shuffle.
    exists : list of pattern GROUPS applied as SPARQL ``FILTER
        EXISTS``: solutions are KEPT only when the group matches
        under the shared variables — a LEFT SEMI join on those
        variables (the dual of ``not_exists``; same narrow-projection
        build side).  A group sharing NO variable is an existence
        probe: if it matches nothing, EVERY solution drops.
    not_exists : list of pattern GROUPS (each a ``patterns`` list)
        applied as SPARQL ``FILTER NOT EXISTS``: solutions are removed
        when the group matches under the shared variables — a LEFT
        ANTI join on those variables (no row widening; at scale the
        anti side carries only the group's variable columns).  A group
        sharing NO variable with the bound set is an existence probe:
        if it matches anything, EVERY solution drops (SPARQL's
        semantics for a disconnected/ground NOT EXISTS group).
    minus : list of pattern groups applied as SPARQL ``MINUS``: same
        anti-join, except a group sharing no variable removes NOTHING
        (the disjoint-domain rule — the classic way MINUS and NOT
        EXISTS differ).  NULL shared values (from OPTIONAL) never
        match an anti-join so such rows are kept; SPARQL agrees when
        the NULL variable is the only shared one but would drop the
        row when the OTHER shared variables match — that corner
        diverges here (negate before you OPTIONAL if you need it).
    values : SPARQL ``VALUES`` with independent per-variable lists:
        ``{"person": ["per:ada", "per:bob"]}`` restricts that variable
        to the listed constants — an IN filter Catalyst pushes through
        the join chain down to the pattern scans.
    bindings : SPARQL ``VALUES`` with JOINT rows: a small DataFrame
        whose columns are variable names; solutions inner-join it on
        those columns.  This is the scale-correct way to parameterize
        a query with a seed table (broadcast by AQE when small).
        UNDEF is not supported — split into two calls instead.
    order_by : solution modifier ``ORDER BY``: SQL sort expressions
        (e.g. ``["city DESC", "person"]``) applied after projection.
    limit : solution modifier ``LIMIT``; with ``order_by`` the pair
        compiles to TakeOrderedAndProject (per-partition top-k + one
        k-row gather — no global sort materializes at 100 TB).
    offset : solution modifier ``OFFSET``: skip the first ``offset``
        solutions before ``limit`` applies (SQL ``LIMIT k OFFSET n``
        paging).  Only deterministic under a total ``order_by`` —
        Spark still plans per-partition top-(n+k), so paging stays
        a k-row gather, but each page recomputes the prefix: for deep
        pagination at scale, keyset-filter on the last-seen sort key
        instead.
    path_hops : bound for ``pred+`` property-path patterns (SPARQL
        ``pred{{1,path_hops}}``); such patterns scan the semi-naive
        closure instead of single edges. When any is used, unpersist
        the closure rounds via the result's ``pinned_caches``.

    >>> match_patterns(t, [("?p", "works_at", "?org"),
    ...                    ("?org", "located_in", "?city")])
    DataFrame[p, org, city]
    """
    if not patterns:
        raise ValueError("need at least one pattern")
    if sources is not None and len(sources) != len(patterns):
        raise ValueError("sources must have one entry per pattern")
    patterns, sources = _expand_sequences(patterns, sources)
    compiled = [
        _compile_pattern(
            triples if sources is None or sources[i] is None else sources[i],
            p, i, assume_distinct, path_hops,
        )
        for i, p in enumerate(patterns)
    ]
    pinned = [c for entry in compiled for c in entry[2]]

    order = sorted(range(len(compiled)), key=lambda i: (-compiled[i][1], i))
    acc = compiled[order[0]][0]
    bound = set(acc.columns)
    remaining = order[1:]
    while remaining:
        pick = next(
            (j for j in remaining if set(compiled[j][0].columns) & bound),
            remaining[0],
        )
        remaining = [j for j in remaining if j != pick]
        frame = compiled[pick][0]
        shared = sorted(set(frame.columns) & bound)
        acc = acc.join(frame, on=shared) if shared else acc.crossJoin(frame)
        bound |= set(frame.columns)

    for var, expr in (bind or {}).items():
        if var in bound:
            raise ValueError(
                f"bind would shadow already-bound variable {var!r}")
        acc = acc.withColumn(var, F.expr(expr))
        bound.add(var)

    for var, allowed in (values or {}).items():
        if var not in bound:
            raise ValueError(f"values restricts unbound variable {var!r}")
        acc = acc.filter(F.col(var).isin(list(allowed)))
    if bindings is not None:
        missing = [c for c in bindings.columns if c not in bound]
        if missing:
            raise ValueError(f"bindings name unbound variables: {missing}")
        acc = acc.join(bindings.distinct(), on=list(bindings.columns))

    for expr in filters or []:
        acc = acc.filter(F.expr(expr))

    for k, pat in enumerate(optional or []):
        if _has_seq_path(pat):
            # A sequence path is a multi-pattern group; OPTIONAL over a
            # group left-joins the group's joined solutions (the spec's
            # LeftJoin over the translated BGP), with bag multiplicity
            # — one row per distinct intermediate — preserved.
            frame = match_patterns(
                triples, [pat], distinct=False,
                assume_distinct=assume_distinct, path_hops=path_hops,
            )
            opt_pinned = frame.pinned_caches
        else:
            frame, _, opt_pinned = _compile_pattern(
                triples, pat, len(patterns) + k, assume_distinct, path_hops
            )
        pinned += opt_pinned
        shared = sorted(set(frame.columns) & bound)
        if not shared:
            raise ValueError(
                f"optional pattern {pat!r} shares no variable with the "
                "required patterns (an unanchored OPTIONAL is a cross "
                "product — express that as a required pattern instead)"
            )
        acc = acc.join(frame, on=shared, how="left")
        bound |= set(frame.columns)

    for grp in exists or []:
        pos = match_patterns(
            triples, grp, distinct=True,
            assume_distinct=assume_distinct, path_hops=path_hops,
        )
        pinned += pos.pinned_caches
        shared = sorted(set(pos.columns) & bound)
        if shared:
            # semi side projected to the shared variables only — the
            # exact dual of the NOT EXISTS anti join below
            acc = acc.join(
                pos.select(*shared).distinct(), on=shared,
                how="left_semi",
            )
        else:
            # Disconnected EXISTS: one-row existence marker; an EMPTY
            # group annihilates every solution, a non-empty keeps all.
            marker = pos.limit(1).select(F.lit(1).alias("__k"))
            acc = (
                acc.withColumn("__k", F.lit(1))
                .join(marker, on="__k", how="left_semi")
                .drop("__k")
            )

    for is_minus, groups in ((False, not_exists or []), (True, minus or [])):
        for grp in groups:
            neg = match_patterns(
                triples, grp, distinct=True,
                assume_distinct=assume_distinct, path_hops=path_hops,
            )
            pinned += neg.pinned_caches
            shared = sorted(set(neg.columns) & bound)
            if shared:
                # Anti side projected to the shared variables only: at
                # scale the negation group never widens the solution
                # rows, and Spark's partial-agg distinct on the narrow
                # projection keeps the anti build side small.
                acc = acc.join(
                    neg.select(*shared).distinct(), on=shared, how="left_anti"
                )
            elif not is_minus:
                # Disconnected NOT EXISTS: one-row existence marker; a
                # non-empty group annihilates every solution.
                marker = neg.limit(1).select(F.lit(1).alias("__k"))
                acc = (
                    acc.withColumn("__k", F.lit(1))
                    .join(marker, on="__k", how="left_anti")
                    .drop("__k")
                )
            # disconnected MINUS: the SPARQL disjoint-domain rule —
            # removes nothing, the group is dead code by construction.

    # Variables in first-appearance order across the ORIGINAL pattern
    # list (required, then optional; not join order), marker columns
    # and sequence-internal ``__seq*`` variables dropped.
    all_vars: list[str] = []
    for pat in list(patterns) + list(optional or []):
        for term in pat:
            if (_is_var(term) and not term[1:].startswith("__")
                    and term[1:] not in all_vars):
                all_vars.append(term[1:])
    all_vars += [v for v in (bind or {}) if v not in all_vars]
    out_cols = select if select is not None else all_vars
    unknown = [c for c in out_cols if c not in bound]
    if unknown:
        raise ValueError(f"select names unbound variables: {unknown}")
    acc = acc.select(*out_cols) if out_cols else acc.select(F.lit(1).alias("__match"))
    acc = acc.distinct() if distinct else acc
    if order_by:
        acc = acc.orderBy(*_sort_exprs(order_by))
    if offset is not None:
        acc = acc.offset(offset)
    if limit is not None:
        acc = acc.limit(limit)
    acc.pinned_caches = pinned
    return acc


def match_union(
    triples: DataFrame,
    groups,
    select: list[str] | None = None,
    filters: list[str] | None = None,
    distinct: bool = True,
    assume_distinct: bool = False,
    path_hops: int = 3,
) -> DataFrame:
    """SPARQL ``UNION`` of conjunctive pattern groups: each group is a
    ``patterns`` list for :func:`match_patterns`; the result is the
    bag union of the groups' bindings with SPARQL's NULL-padding for
    variables a group does not bind (an unbound variable, not an
    error). ``filters``/``select``/``distinct`` apply to the union —
    a filter referencing a variable some group leaves NULL simply
    fails for those rows, exactly SPARQL's error-is-false rule.

    Spark-first: the groups are independent join chains unioned by
    name — no shared state, so at scale each branch schedules as its
    own stage graph and the union is a zero-shuffle concatenation.
    """
    if not groups:
        raise ValueError("need at least one pattern group")
    parts = [
        match_patterns(triples, g, distinct=False,
                       assume_distinct=assume_distinct,
                       path_hops=path_hops)
        for g in groups
    ]
    all_vars: list[str] = []
    for p in parts:
        for c in p.columns:
            # a fully-ground group compiles to a __ground_i marker:
            # it contributes the empty solution (all vars NULL), the
            # marker itself is not a variable
            if not c.startswith("__") and c not in all_vars:
                all_vars.append(c)
    if not all_vars:
        raise ValueError("every union group is fully ground — nothing to bind")
    aligned = [
        p.select(
            *[
                F.col(v) if v in p.columns
                else F.lit(None).cast("string").alias(v)
                for v in all_vars
            ]
        )
        for p in parts
    ]
    acc = aligned[0]
    for p in aligned[1:]:
        acc = acc.unionByName(p)
    for expr in filters or []:
        acc = acc.filter(F.expr(expr))
    out_cols = select if select is not None else all_vars
    unknown = [c for c in out_cols if c not in all_vars]
    if unknown:
        raise ValueError(f"select names unbound variables: {unknown}")
    acc = acc.select(*out_cols)
    acc = acc.distinct() if distinct else acc
    acc.pinned_caches = [c for p in parts for c in p.pinned_caches]
    return acc


def match_aggregate(
    triples: DataFrame,
    patterns,
    group_by: list[str],
    aggs: dict[str, str],
    having: str | None = None,
    filters: list[str] | None = None,
    optional: list | None = None,
    not_exists: list | None = None,
    minus: list | None = None,
    values: dict[str, list] | None = None,
    bindings: DataFrame | None = None,
    order_by: list[str] | None = None,
    limit: int | None = None,
    offset: int | None = None,
    assume_distinct: bool = False,
    path_hops: int = 3,
) -> DataFrame:
    """SPARQL ``GROUP BY`` / aggregation over BGP solutions.

    Matches ``patterns`` with bag semantics (``distinct=False`` — the
    SPARQL solution multiset: per-pattern scans are still set-deduped
    because an RDF graph is a set of triples, but join/projection
    multiplicity is preserved, which is what COUNT must see), then one
    partial-aggregated ``groupBy`` over ``group_by`` variables with
    ``aggs`` as ``{out_name: SQL aggregate expression}``; ``having``
    is a SPARQL HAVING analogue filtered after the aggregation.

    Empty ``group_by`` = a global aggregation (one row), SPARQL's
    implicit single group.

    Spark-first: the whole query stays one declarative plan — the
    aggregation adds exactly one map-side-combined exchange on the
    grouping variables after the join chain, and AQE coalesces it.

    >>> match_aggregate(t, [("?p", "works_at", "?org")], ["org"],
    ...                 {"n_employees": "count(p)"},
    ...                 having="n_employees >= 2")
    DataFrame[org, n_employees]
    """
    if not aggs:
        raise ValueError("need at least one aggregate expression")
    sol = match_patterns(
        triples, patterns, filters=filters, optional=optional,
        not_exists=not_exists, minus=minus, values=values,
        bindings=bindings, distinct=False,
        assume_distinct=assume_distinct, path_hops=path_hops,
    )
    unknown = [g for g in group_by if g not in sol.columns]
    if unknown:
        raise ValueError(f"group_by names unbound variables: {unknown}")
    exprs = [F.expr(e).alias(name) for name, e in aggs.items()]
    out = sol.groupBy(*group_by).agg(*exprs) if group_by else sol.agg(*exprs)
    if having:
        out = out.filter(F.expr(having))
    if order_by:
        out = out.orderBy(*_sort_exprs(order_by))
    if offset is not None:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    out.pinned_caches = sol.pinned_caches
    return out


def match_ask(
    triples: DataFrame,
    patterns,
    filters: list[str] | None = None,
    values: dict[str, list] | None = None,
    bindings: DataFrame | None = None,
    assume_distinct: bool = False,
    path_hops: int = 3,
) -> DataFrame:
    """SPARQL ``ASK``: does the pattern group match at all?  Returns a
    one-row frame ``[ask: boolean]``.

    Spark-first: the solution frame is probed through ``limit(1)``
    BEFORE the aggregate, so the scheduler stops at the first
    surviving row (Spark's incremental take) — an ASK over 100 TB
    whose first partition matches reads one partition, not the corpus.
    """
    sol = match_patterns(
        triples, patterns, filters=filters, values=values,
        bindings=bindings, distinct=False,
        assume_distinct=assume_distinct, path_hops=path_hops,
    )
    out = sol.limit(1).agg((F.count(F.lit(1)) > 0).alias("ask"))
    out.pinned_caches = sol.pinned_caches
    return out


def describe_term(triples: DataFrame, term: str) -> DataFrame:
    """SPARQL ``DESCRIBE`` (symmetric concise form): every triple in
    which ``term`` is the subject or the object, tagged with the
    direction.  One scan, both constants pushed as an OR filter."""
    return triples.filter(
        (F.col("subj") == F.lit(term)) | (F.col("obj") == F.lit(term))
    ).select(
        "subj", "pred", "obj",
        F.when(F.col("subj") == F.lit(term), F.lit("out"))
        .otherwise(F.lit("in")).alias("direction"),
    ).distinct()

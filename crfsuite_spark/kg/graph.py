"""Graph analytics over materialized (subj, pred, obj) triple tables.

The construction pipeline (kg/pipeline.py) ends at a bucketed triple
table; these operators are the standard queries run OVER that graph —
edge-weight aggregation, degree profiles, PageRank entity importance,
bounded neighborhood expansion. The reference stops at tag/evaluate
(its triples live in R data frames, bnosac/crfsuite R/crf.R); a
KG at transcript scale needs the graph side too, so everything here is
declarative DataFrame code shaped for 10^12-edge tables:

- every aggregation is a partial-aggregated ``groupBy`` on a uniform
  entity/edge key (map-side combine — a hot entity's mentions collapse
  inside each partition before the shuffle);
- PageRank and k-hop are FIXED-iteration loops of join + groupBy; the
  edge frame (with out-degrees) is persisted once and re-scanned per
  iteration instead of being recomputed from the triple lineage;
- no ``collect()`` anywhere — seeds and counts stay in frames or
  scalars derived from one ``count()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def triple_support(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    conv: str = "conv_id",
) -> DataFrame:
    """Collapse mention-level triples into weighted edges:
    (subj, pred, obj, n_mentions, n_convs, confidence) where
    ``confidence`` = n_mentions / total mentions of (subj, pred) — the
    usual open-IE edge score (how often this object wins the slot).

    Two partial-aggregated groupBys; the (subj, pred) totals join back
    on the smaller aggregated side."""
    g = triples.groupBy(subj, pred, obj).agg(
        F.count("*").alias("n_mentions"),
        F.countDistinct(conv).alias("n_convs"),
    )
    tot = g.groupBy(subj, pred).agg(F.sum("n_mentions").alias("__tot"))
    return (
        g.join(tot, [subj, pred])
        .withColumn("confidence", F.col("n_mentions") / F.col("__tot"))
        .drop("__tot")
    )


def entity_degrees(
    triples: DataFrame, subj: str = "subj", obj: str = "obj"
) -> DataFrame:
    """Per-entity degree profile: (entity, out_triples, in_triples,
    out_neighbors, in_neighbors). One union + one groupBy on the
    entity key; distinct-neighbor counts via conditional
    ``countDistinct`` (NULLs from the other direction don't count)."""
    u = triples.select(
        F.col(subj).alias("entity"),
        F.col(obj).alias("nbr"),
        F.lit(1).alias("is_out"),
    ).unionByName(
        triples.select(
            F.col(obj).alias("entity"),
            F.col(subj).alias("nbr"),
            F.lit(0).alias("is_out"),
        )
    )
    return u.groupBy("entity").agg(
        F.sum("is_out").alias("out_triples"),
        (F.count("*") - F.sum("is_out")).alias("in_triples"),
        F.countDistinct(
            F.when(F.col("is_out") == 1, F.col("nbr"))
        ).alias("out_neighbors"),
        F.countDistinct(
            F.when(F.col("is_out") == 0, F.col("nbr"))
        ).alias("in_neighbors"),
    )


def pagerank(
    triples: DataFrame,
    n_iters: int = 3,
    damping: float = 0.85,
    subj: str = "subj",
    obj: str = "obj",
    seeds: DataFrame | None = None,
    seed_col: str = "entity",
) -> DataFrame:
    """Fixed-iteration PageRank over the distinct (subj → obj) edge
    set: (entity, rank).

    r_{t+1}(v) = (1-d)·s(v) + d · Σ_{u→v} r_t(u)/outdeg(u) — the
    simple (non-dangling-redistributing) formulation: rank flowing
    into sink nodes leaves the system, exactly like the textbook
    map-reduce PageRank, which keeps every iteration ONE join + ONE
    partial-aggregated groupBy and makes the fixed-iteration result
    reproducible in plain SQL (the driver oracles chain the same
    three iterations as CTEs). Convergence-to-tolerance is a caller
    loop away; fixed small n_iters is the production norm for entity
    importance at 10^12 edges, where each extra iteration is a full
    shuffle over the edge table.

    The teleport vector s is uniform 1/N without ``seeds``; with
    ``seeds`` (a frame of ``seed_col`` entities) it is the
    PERSONALIZED PageRank restart: 1/|S ∩ nodes| on the seed nodes,
    0 elsewhere (Jeh & Widom 2003 / Page et al. §6 "personalized"
    vector), and r_0 = s — the standard entity-salience query
    ("importance relative to THESE entities", e.g. a conversation's
    mention set). Seed mass not reachable stays 0: rank concentrates
    around the seeds instead of spreading to the whole graph.

    The degree-annotated edge frame and the teleport-annotated node
    frame are persisted (scanned once per iteration; unpersist via
    ``out.pinned_caches``). N and |S| are the only scalars (one
    ``count()`` each)."""
    edges = triples.select(
        F.col(subj).alias("src"), F.col(obj).alias("dst")
    ).distinct()
    nodes = (
        edges.select(F.col("src").alias("entity"))
        .unionByName(edges.select(F.col("dst").alias("entity")))
        .distinct()
    )
    if seeds is None:
        nodes = nodes.persist()
        n = nodes.count()
        nodes_t = nodes.select("entity", F.lit(1.0 / n).alias("__tele"))
    else:
        sdf = seeds.select(F.col(seed_col).alias("entity")).distinct()
        marked = nodes.join(
            sdf.withColumn("__s", F.lit(1.0)), "entity", "left"
        ).persist()
        n_s = marked.where(F.col("__s").isNotNull()).count()
        if n_s == 0:
            marked.unpersist()
            raise ValueError("no seed entity appears in the graph")
        nodes = marked
        nodes_t = marked.select(
            "entity",
            (F.coalesce(F.col("__s"), F.lit(0.0)) / n_s).alias("__tele"),
        )
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    e = edges.join(deg, "src").persist()
    ranks = nodes_t.select("entity", F.col("__tele").alias("rank"))
    for _ in range(n_iters):
        contrib = (
            e.join(ranks.withColumnRenamed("entity", "src"), "src")
            .select(
                F.col("dst").alias("entity"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("entity")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes_t.join(contrib, "entity", "left").select(
            "entity",
            (
                F.lit(1.0 - damping) * F.col("__tele")
                + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("rank"),
        )
    ranks.pinned_caches = [e, nodes]
    return ranks


def hits(
    triples: DataFrame,
    n_iters: int = 5,
    subj: str = "subj",
    obj: str = "obj",
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999, "Authoritative Sources in
    a Hyperlinked Environment") over the distinct directed edge set:
    (entity, hub, authority), both L2-normalized per iteration —

        a_{t+1}(v) = Σ_{u→v} h_t(u)   then a ← a/‖a‖₂
        h_{t+1}(u) = Σ_{u→v} a_{t+1}(v)  then h ← h/‖h‖₂

    the query-independent counterpart to :func:`pagerank` for
    bipartite-ish KGs (hub = entity pointing at many authorities:
    e.g. a conversation's active subject; authority = entity many
    subjects point at). Sinks keep hub 0, sources authority 0; like
    pagerank the fixed small iteration count is the production norm
    at 10^12 edges and makes the result reproducible in plain SQL.

    Per iteration: two uniform-key joins + two partial-aggregated
    groupBys + two 1-row norm aggregates crossJoin-broadcast back —
    no driver scalar per round, no window. The edge and node frames
    persist across iterations (release via ``out.pinned_caches``)."""
    edges = triples.select(
        F.col(subj).alias("src"), F.col(obj).alias("dst")
    ).distinct().persist()
    nodes = (
        edges.select(F.col("src").alias("entity"))
        .unionByName(edges.select(F.col("dst").alias("entity")))
        .distinct()
        .persist()
    )

    def _l2_normalized(df, col):
        nrm = df.agg(
            F.sqrt(F.sum(F.col(col) * F.col(col))).alias("__nrm")
        )
        return df.crossJoin(F.broadcast(nrm)).select(
            "entity",
            F.when(F.col("__nrm") > 0, F.col(col) / F.col("__nrm"))
            .otherwise(F.lit(0.0))
            .alias(col),
        )

    hubs = nodes.select("entity", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(n_iters):
        a_sum = (
            edges.join(
                hubs.withColumnRenamed("entity", "src"), "src"
            )
            .groupBy(F.col("dst").alias("entity"))
            .agg(F.sum("hub").alias("authority"))
        )
        auth = _l2_normalized(
            nodes.join(a_sum, "entity", "left").select(
                "entity",
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            ),
            "authority",
        )
        h_sum = (
            edges.join(
                auth.withColumnRenamed("entity", "dst"), "dst"
            )
            .groupBy(F.col("src").alias("entity"))
            .agg(F.sum("authority").alias("hub"))
        )
        hubs = _l2_normalized(
            nodes.join(h_sum, "entity", "left").select(
                "entity", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
        # truncate the iterated plan each round (node-scale frames —
        # cheap to materialize; without this Catalyst re-analysis of
        # the doubled join chain grows superlinearly per iteration)
        auth = auth.localCheckpoint(eager=False)
        hubs = hubs.localCheckpoint(eager=False)
    out = hubs.join(auth, "entity").select("entity", "hub", "authority")
    out.pinned_caches = [edges, nodes]
    return out


def top_objects(
    triples: DataFrame,
    k: int = 3,
    pred: str = "pred",
    obj: str = "obj",
    conv: str = "conv_id",
) -> DataFrame:
    """Heavy-hitter objects per predicate: (pred, obj, n_mentions,
    rank ≤ k), rank by (mentions desc, obj asc — deterministic).

    Aggregate-THEN-rank: the mention stream collapses map-side to one
    (pred, obj) row per pair before any window touches it, so the
    window sort runs over the distinct-pair frame — orders of magnitude
    smaller than the mentions, and the per-pred partitions it sorts are
    object-vocabulary-bounded. The naive single window over raw
    mentions would shuffle and sort the full 10^12-row stream."""
    agg = triples.groupBy(pred, obj).agg(F.count("*").alias("n_mentions"))
    w = Window.partitionBy(pred).orderBy(F.desc("n_mentions"), F.asc(obj))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def comention_edges(
    triples: DataFrame,
    scope: str = "conv_id",
    subj: str = "subj",
    obj: str = "obj",
    max_entities_per_scope: int | None = 1000,
) -> DataFrame:
    """Entity co-mention graph: (entity_a, entity_b, n_scopes) for
    entities (subject OR object position) appearing in the same scope
    (conversation by default), entity_a < entity_b.

    Shape: distinct (scope, entity) map-side, then ``collect_set`` per
    scope + HOF pair expansion — pairs are generated INSIDE each
    scope's row, so the shuffle carries one row per (scope, entity),
    never the quadratic pair stream; the final count is one
    partial-aggregated groupBy on the uniform pair key. Scopes are
    conversation-bounded, so the per-row set is small by construction;
    ``max_entities_per_scope`` drops degenerate scopes above the bound
    (the hot-shingle guard pattern — documented loss, no skew blowup).
    A scope with E entities still costs E² generated rows; the guard
    caps that at ~10^6 per degenerate scope."""
    m = (
        triples.select(F.col(scope).alias("s"), F.col(subj).alias("entity"))
        .unionByName(
            triples.select(F.col(scope).alias("s"), F.col(obj).alias("entity"))
        )
        .distinct()
    )
    sets = m.groupBy("s").agg(F.sort_array(F.collect_set("entity")).alias("es"))
    if max_entities_per_scope:
        sets = sets.where(F.size("es") <= max_entities_per_scope)
    pairs = sets.select(
        F.explode(
            F.expr(
                "filter(flatten(transform(es, x -> transform(es, y -> "
                "struct(x AS a, y AS b)))), p -> p.a < p.b)"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("n_scopes"))
        .select(
            F.col("a").alias("entity_a"), F.col("b").alias("entity_b"), "n_scopes"
        )
    )


def triangle_count(
    triples: DataFrame, subj: str = "subj", obj: str = "obj"
) -> DataFrame:
    """Global triangle count over the undirected distinct edge set —
    one row (n_triangles).

    Canonical orientation first (a < b), so each triangle is counted
    exactly once via the ordered 2-path + closing-edge join
    (a < b < c): two shuffle joins on uniform entity keys. At 10^12
    edges the 2-path join is the cost center and is exactly the shape
    AQE skew-split handles; a degree-capped variant (drop super-nodes,
    documented loss) is the standard mitigation and composes as a
    ``where`` on a degree join before this."""
    e = (
        triples.select(F.col(subj).alias("x"), F.col(obj).alias("y"))
        .where(F.col(subj) != F.col(obj))
        .select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .distinct()
    )
    e1 = e.select(F.col("a"), F.col("b"))
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a"), F.col("b").alias("c"))
    return (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count("*").alias("n_triangles"))
    )


def link_heuristics(
    triples: DataFrame,
    subj: str = "subj",
    obj: str = "obj",
    max_degree: int | None = None,
    exclude_known: bool = True,
) -> DataFrame:
    """Neighborhood-overlap link-prediction scores (Liben-Nowell &
    Kleinberg 2003, "The Link Prediction Problem for Social
    Networks"): for every unordered entity pair sharing at least one
    neighbor in the undirected distinct-edge graph, the four classic
    heuristics —

    - ``common_neighbors`` = |N(u) ∩ N(v)|
    - ``jaccard``          = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
    - ``adamic_adar``      = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w))
    - ``pref_attach``      = deg(u) · deg(v)

    the non-embedding KG-completion baselines every embedding model
    (kg/embeddings.py) is benchmarked against.  With
    ``exclude_known=True`` (the link-prediction setting) pairs already
    connected by an edge are anti-joined away.

    Under ``max_degree`` the intersection is computed over surviving
    centers only, and ``jaccard``'s union term stays the algebraic
    deg(u) + deg(v) − CN with the CAPPED CN (degrees are never
    capped) — a consistent, documented-loss proxy: a capped-out hub
    still counts once per side in the union instead of once total,
    so capped jaccard is a slight underestimate for exactly the pairs
    whose evidence was a hub anyway.

    Shape for 10^12 edges: one wedge self-join on the center node w —
    the classic deg(w)² fan-out, so ``max_degree`` drops hub centers
    before the join (same documented-loss guard as the hot-shingle
    cap in operators/dedup.py ngram_jaccard_pairs; a stopword-grade
    hub's wedges are noise for ranking anyway), and a w with one
    neighbor can't close a wedge so ln(deg(w)) ≥ ln 2 — no division
    guard needed.  Everything downstream is partial-aggregated
    groupBys and vocabulary-scale degree joins on uniform keys."""
    e = (
        triples.select(F.col(subj).alias("x"), F.col(obj).alias("y"))
        .where(F.col(subj) != F.col(obj))
        .select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .distinct()
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy("a").agg(F.count("*").alias("deg")).withColumnRenamed(
        "a", "node"
    )
    center = (
        und.join(deg, und["a"] == deg["node"])
        # a degree-1 center can't close a wedge (and ln(1)=0 would trap
        # ANSI division) — prune before the weight is ever computed
        .where(F.col("deg") >= 2)
        .select(
            F.col("a").alias("w"),
            F.col("b").alias("n"),
            (1.0 / F.log(F.col("deg"))).alias("aa_w"),
            F.col("deg").alias("deg_w"),
        )
    )
    if max_degree is not None:
        center = center.where(F.col("deg_w") <= max_degree)
    left = center.select("w", F.col("n").alias("u"), "aa_w")
    right = center.select("w", F.col("n").alias("v"))
    pairs = (
        left.join(right, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.sum("aa_w").alias("adamic_adar"),
        )
    )
    if exclude_known:
        pairs = pairs.join(
            e,
            (pairs["u"] == e["a"]) & (pairs["v"] == e["b"]),
            "left_anti",
        )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("__du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("__dv"))
    return (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common_neighbors",
            (
                F.col("common_neighbors")
                / (F.col("__du") + F.col("__dv") - F.col("common_neighbors"))
            ).alias("jaccard"),
            "adamic_adar",
            (F.col("__du") * F.col("__dv")).alias("pref_attach"),
        )
    )


def k_hop(
    triples: DataFrame,
    seeds: DataFrame,
    k: int = 2,
    subj: str = "subj",
    obj: str = "obj",
) -> DataFrame:
    """Bounded BFS over the directed edge set: (entity, hop) with
    hop = MINIMUM distance ≤ k from any seed. ``seeds`` is a one-column
    frame named ``entity`` (hop 0) — a frame, not a list, so seed
    selection stays distributed (e.g. "all entities matching X").

    Each hop is one join on the uniform src key + one distinct + one
    anti-join against the visited set; min-hop semantics come from the
    anti-join (a node is claimed by the FIRST frontier that reaches
    it). The frontier and visited sets are entity-id-only frames —
    tiny relative to the edge table — and each round's frontier is
    persisted since round h+1 joins it twice (expansion + anti-join).
    Unpersist via ``out.pinned_caches``."""
    edges = triples.select(
        F.col(subj).alias("src"), F.col(obj).alias("dst")
    ).distinct().persist()
    pinned = [edges]
    visited = seeds.select("entity", F.lit(0).alias("hop")).persist()
    pinned.append(visited)
    frontier = visited.select("entity")
    out = visited
    for h in range(1, k + 1):
        nxt = (
            frontier.join(edges, frontier["entity"] == edges["src"])
            .select(F.col("dst").alias("entity"))
            .distinct()
            .join(out.select("entity"), "entity", "left_anti")
            .select("entity", F.lit(h).alias("hop"))
            .persist()
        )
        pinned.append(nxt)
        out = out.unionByName(nxt)
        frontier = nxt.select("entity")
    out.pinned_caches = pinned
    return out


def property_path(
    triples: DataFrame,
    pred: str,
    max_hops: int = 2,
    subj: str = "subj",
    obj: str = "obj",
) -> DataFrame:
    """Bounded transitive closure over ONE predicate (the SPARQL
    property-path ``pred{1,k}`` analogue): (src, dst, hops) for every
    pair connected by 1..max_hops edges of ``pred``, hops = MINIMUM
    path length (cycles may close back onto src).  ``pred`` may be an
    alternation ``p1|p2`` — the closure then runs over the UNION edge
    set (SPARQL ``(p1|p2)+``), an IN-list scan predicate — or a
    negated property set ``!p1|p2`` (SPARQL ``!(p1|p2)``, NOT IN).

    Semi-naive evaluation — round h+1 expands only the pairs first
    DISCOVERED at round h (not the whole closure), so each round is
    one equi-join of the delta against the (persisted, pred-filtered,
    distinct) edge set on the uniform dst=src key plus one anti-join
    for the min-hops claim. That delta-only frontier is what keeps the
    k rounds near-linear in the closure size at 100 TB; the naive
    re-join of the full closure every round is quadratic. The pred
    filter reaches the scan, so a pred-partitioned table reads one
    predicate's slice. Unpersist via ``out.pinned_caches``."""
    if pred.startswith("!") and len(pred) > 1:
        pred_filter = ~F.col("pred").isin(pred[1:].split("|"))
    elif "|" in pred:
        pred_filter = F.col("pred").isin(pred.split("|"))
    else:
        pred_filter = F.col("pred") == F.lit(pred)
    edges = (
        triples.filter(pred_filter)
        .select(F.col(subj).alias("src"), F.col(obj).alias("dst"))
        .distinct()
        .persist()
    )
    pinned = [edges]
    out = edges.select("src", "dst", F.lit(1).alias("hops")).persist()
    pinned.append(out)
    delta = out.select("src", "dst")
    for h in range(2, max_hops + 1):
        step = edges.select(
            F.col("src").alias("dst"), F.col("dst").alias("nxt")
        )
        delta = (
            delta.join(step, "dst")
            .select("src", F.col("nxt").alias("dst"))
            .distinct()
            .join(out.select("src", "dst"), ["src", "dst"], "left_anti")
            .persist()
        )
        pinned.append(delta)
        out = out.unionByName(
            delta.select("src", "dst", F.lit(h).alias("hops"))
        )
    out.pinned_caches = pinned
    return out


def sample_neighbors(
    triples: DataFrame,
    seeds: DataFrame,
    fanouts=(10, 5),
    seed: int = 42,
) -> DataFrame:
    """Layered neighbor sampling for GNN mini-batch training (the
    GraphSAGE protocol, Hamilton et al. 2017): starting from ``seeds``
    (a one-column frame named ``entity``, like ``kg/graph.py:k_hop``),
    layer ``l`` keeps at most ``fanouts[l]`` out-neighbors per frontier
    node over the DISTINCT directed edge set; the next frontier is the
    sampled neighbors. Returns (layer, src, dst) sampled edges —
    layers are 1-based, nodes reached twice are expanded each time
    they re-enter the frontier (the GraphSAGE computation graph, not a
    BFS visited-set walk).

    The per-node choice ranks each node's adjacency by a portable md5
    hash of (src, dst, layer, seed) — deterministic under retries and
    bit-reproducible in the SQL oracle, unlike ``rand()``-ordered
    sampling. The rank is a window over src, so the unit of skew is
    one node's out-degree: the hub-node sort the fanout cap exists to
    bound is paid once per layer and never materializes more than the
    adjacency Spark would scan anyway. Frontier and sampled frames are
    node/edge-id-narrow; each layer is persisted because layer l+1
    both expands and returns it (unpersist via ``out.pinned_caches``).
    """
    if not fanouts:
        raise ValueError("need at least one fanout")
    edges = (
        triples.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
        .persist()
    )
    pinned = [edges]
    frontier = seeds.select(F.col("entity").alias("src")).distinct()
    layers = []
    for lvl, fanout in enumerate(fanouts, start=1):
        draw = F.expr(
            "CAST(conv(substr(md5(concat_ws(':', src, dst, "
            f"'{lvl}', '{seed}')), 1, 8), 16, 10) AS BIGINT)"
        )
        picked = (
            frontier.join(edges, "src")
            .withColumn(
                "__rk",
                F.row_number().over(
                    Window.partitionBy("src").orderBy(draw.asc(), F.col("dst"))
                ),
            )
            .filter(F.col("__rk") <= fanout)
            .select(F.lit(lvl).alias("layer"), "src", "dst")
            .persist()
        )
        pinned.append(picked)
        layers.append(picked)
        frontier = picked.select(F.col("dst").alias("src")).distinct()
    out = layers[0]
    for nxt in layers[1:]:
        out = out.unionByName(nxt)
    out.pinned_caches = pinned
    return out


def label_propagation(
    triples: DataFrame,
    n_iters: int = 3,
    subj: str = "subj",
    obj: str = "obj",
) -> DataFrame:
    """Fixed-iteration synchronous label propagation (Raghavan et al.
    2007) over the undirected distinct entity graph: (entity,
    community), community = the propagated label (an entity id).

    Deterministic variant — the classic LPA breaks count ties randomly
    and updates asynchronously, which is useless for reproducible
    curation runs and impossible to oracle; here every node
    SIMULTANEOUSLY adopts its neighbors' most frequent label, ties →
    lexicographically smallest label, so the result is a pure function
    of (edge set, n_iters) and the driver oracle chains the same
    iterations as SQL CTEs. Self-loops are dropped (a node's own label
    only re-enters through a neighbor).

    Scale shape: each iteration is ONE join of the symmetrized edge
    frame against the (node, label) frame on the uniform node key +
    TWO partial-aggregated groupBys (the (node, label) count collapses
    map-side; min_by picks the winner) — no windows, no sorts, the
    same per-iteration cost as :func:`pagerank`. The symmetrized edge
    frame is persisted (scanned once per iteration; release via
    ``out.pinned_caches``). Fixed small n_iters is the production norm
    (GraphFrames' own LPA is maxIter-bounded): at 10^12 edges each
    iteration is a full shuffle of the edge table, and 3-5 rounds give
    stable coarse communities on short-diameter entity graphs."""
    e = triples.select(F.col(subj).alias("a"), F.col(obj).alias("b"))
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("a").alias("entity")).distinct().select(
        "entity", F.col("entity").alias("community")
    )
    for _ in range(n_iters):
        counts = (
            sym.join(
                labels.select(
                    F.col("entity").alias("b"),
                    F.col("community").alias("nbr_label"),
                ),
                "b",
            )
            .groupBy(F.col("a").alias("entity"), F.col("nbr_label"))
            .agg(F.count("*").alias("cnt"))
        )
        labels = counts.groupBy("entity").agg(
            F.min_by(
                "nbr_label",
                F.struct((-F.col("cnt")).alias("nc"), F.col("nbr_label").alias("lb")),
            ).alias("community")
        )
    labels.pinned_caches = [sym]
    return labels


def predicate_signatures(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    type_sep: str = ":",
) -> DataFrame:
    """Schema induction over the triple table: for every predicate,
    the distribution of (subject type, object type) signatures — the
    domain/range profile an ontology layer needs before rule mining or
    SHACL shape authoring (the reference stops at tagging; at KG scale
    the emergent schema is itself a query). Entity types are the
    canonical-id prefix the linking stage emits (``per:alice_johnson``
    → ``per``); ids without a prefix profile as type ``''``.

    Output: (pred, subj_type, obj_type, n_triples, n_pred, share)
    where ``share`` = n_triples / n_pred (all triples of the
    predicate). A clean functional predicate shows one dominant
    signature with share ≈ 1; drift in a crawl shows up as new
    signatures gaining share between snapshots.

    Scale shape: type extraction is scan-local; the signature count is
    ONE partial-aggregated groupBy on (pred, subj_type, obj_type) —
    bounded by |preds| × |types|², tiny vs the edge table — and the
    per-predicate totals re-aggregate FROM that bounded frame (no
    second pass over the triples), joining back on the predicate key.
    """
    def etype(c):
        return F.when(
            F.instr(F.col(c), type_sep) > 0,
            F.substring_index(F.col(c), type_sep, 1),
        ).otherwise(F.lit(""))

    sigs = (
        triples.select(
            F.col(pred).alias("pred"),
            etype(subj).alias("subj_type"),
            etype(obj).alias("obj_type"),
        )
        .groupBy("pred", "subj_type", "obj_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triples"))
    )
    totals = sigs.groupBy("pred").agg(
        F.sum("n_triples").cast("bigint").alias("n_pred")
    )
    return sigs.join(totals, "pred").select(
        "pred", "subj_type", "obj_type", "n_triples", "n_pred",
        (F.col("n_triples") / F.col("n_pred")).alias("share"),
    )


def entity_salience(
    mentions: DataFrame,
    conv: str = "conv_id",
    entity: str = "canonical_id",
    turn: str = "turn_idx",
) -> DataFrame:
    """Per-(conversation, entity) salience over the linked mention
    stream: TF-ICF (term-frequency × inverse-CONVERSATION-frequency,
    the entity-level analogue of tf-idf — Dunietz & Gillick 2014 use
    the same frequency/position family for salient-entity detection):

        tf(c, e)  = mentions of e in c / total mentions in c
        icf(e)    = ln(N_convs / convs containing e)
        salience  = tf · icf

    plus the positional evidence a ranker wants alongside it:
    ``first_turn`` (earlier first mention ⇒ more salient) and
    ``n_turns`` (spread — how many distinct turns mention it).
    Globally-ubiquitous entities (the assistant's own name, a hub org)
    get icf ≈ 0 and rank below conversation-specific entities even
    with high counts; :func:`pagerank` with ``seeds`` answers the
    complementary GRAPH-side salience question.

    Scale shape: one partial-aggregated groupBy on the uniform
    (conv, entity) key does the heavy collapse; conversation totals
    are a second groupBy OF THE AGGREGATE (edge cardinality, not
    mention cardinality); the entity document-frequency table is
    entity-cardinality (vocabulary-sized) and broadcast; N_convs is a
    1-row aggregate crossJoin-broadcast back — no driver scalar, no
    window, nothing non-deterministic under AQE retries.
    """
    per = mentions.groupBy(
        F.col(conv).alias("conv_id"), F.col(entity).alias("entity")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_mentions"),
        F.min(turn).alias("first_turn"),
        F.countDistinct(turn).alias("n_turns"),
    )
    conv_tot = per.groupBy("conv_id").agg(
        F.sum("n_mentions").alias("__conv_mentions")
    )
    ent_df = per.groupBy("entity").agg(
        F.count(F.lit(1)).cast("bigint").alias("__df")
    )
    n_convs = per.select("conv_id").agg(
        F.countDistinct("conv_id").alias("__n")
    )
    tf = F.col("n_mentions") / F.col("__conv_mentions")
    icf = F.log(F.col("__n") / F.col("__df"))
    return (
        per.join(conv_tot, "conv_id")
        .join(F.broadcast(ent_df), "entity")
        .crossJoin(F.broadcast(n_convs))
        .select(
            "conv_id",
            "entity",
            "n_mentions",
            "first_turn",
            "n_turns",
            tf.alias("tf"),
            icf.alias("icf"),
            (tf * icf).alias("salience"),
        )
    )


def comention_pmi(
    triples: DataFrame,
    scope: str = "conv_id",
    subj: str = "subj",
    obj: str = "obj",
    max_entities_per_scope: int | None = 1000,
    min_pair_scopes: int = 1,
) -> DataFrame:
    """PMI/NPMI-weighted co-mention graph: (entity_a, entity_b,
    n_scopes, n_a, n_b, pmi, npmi) — :func:`comention_edges` counts
    re-weighted by pointwise mutual information (Church & Hanks 1990)
    so hub entities that co-occur with everything by sheer frequency
    stop dominating entity-relatedness ranking:

        pmi  = ln( N · c_ab / (c_a · c_b) )
        npmi = pmi / ln(N / c_ab)          (Bouma 2009; 1.0 when
                                            c_ab == N — always-together
                                            pairs, denominator 0)

    with N = scopes containing ≥1 entity, c_x = scopes containing x,
    c_ab = scopes containing both.

    Scale shape: pair counts come from :func:`comention_edges`
    (pairs expand INSIDE each scope row — the shuffle never carries
    the quadratic stream); per-entity scope counts are one
    partial-aggregated groupBy of the same distinct (scope, entity)
    frame and join back BROADCAST (entity cardinality = vocabulary,
    not mentions); N is a 1-row aggregate crossJoin-broadcast back.
    ``min_pair_scopes`` prunes the noisy singleton-pair tail before
    the joins (PMI on c_ab=1 is the classic rare-pair artifact).

    Consistency contract: ALL THREE counts (c_ab, c_x, N) are taken
    over the SAME scope universe — the scopes surviving the
    ``max_entities_per_scope`` guard. Counting marginals over every
    scope while the pair counts skip capped scopes would mix two
    universes and can flip the SIGN of pmi for pairs touching a
    capped scope (a degenerate scope then simply doesn't exist for
    this statistic, which is also what the guard means)."""
    m = (
        triples.select(F.col(scope).alias("s"), F.col(subj).alias("entity"))
        .unionByName(
            triples.select(F.col(scope).alias("s"), F.col(obj).alias("entity"))
        )
        .distinct()
    )
    if max_entities_per_scope:
        ok = (
            m.groupBy("s")
            .agg(F.count(F.lit(1)).alias("__sz"))
            .where(F.col("__sz") <= max_entities_per_scope)
            .select("s")
        )
        m = m.join(ok, "s", "left_semi")
    pairs = comention_edges(
        triples, scope=scope, subj=subj, obj=obj,
        max_entities_per_scope=max_entities_per_scope,
    ).where(F.col("n_scopes") >= min_pair_scopes)
    ent = m.groupBy("entity").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ent")
    )
    n = m.select(F.countDistinct("s").alias("__n"))
    pmi = F.log(
        F.col("__n") * F.col("n_scopes") / (F.col("n_a") * F.col("n_b"))
    )
    npmi = F.when(F.col("n_scopes") == F.col("__n"), F.lit(1.0)).otherwise(
        pmi / F.log(F.col("__n") / F.col("n_scopes"))
    )
    return (
        pairs.join(
            F.broadcast(ent.select(F.col("entity").alias("entity_a"),
                                   F.col("n_ent").alias("n_a"))),
            "entity_a",
        )
        .join(
            F.broadcast(ent.select(F.col("entity").alias("entity_b"),
                                   F.col("n_ent").alias("n_b"))),
            "entity_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "entity_a", "entity_b", "n_scopes", "n_a", "n_b",
            pmi.alias("pmi"), npmi.alias("npmi"),
        )
    )


def local_clustering(
    triples: DataFrame, subj: str = "subj", obj: str = "obj"
) -> DataFrame:
    """Per-entity local clustering coefficient over the undirected
    distinct edge set: (entity, degree, n_triangles, clustering) with

        clustering(v) = 2·T(v) / (deg(v)·(deg(v)−1)),  0 when deg < 2

    (Watts & Strogatz 1998) — the node-level companion to
    :func:`triangle_count`'s global scalar; low clustering at high
    degree flags hub/bridge entities, high clustering flags cliquish
    communities worth collapsing during canonicalization triage.

    Scale shape: same canonically-oriented (a < b < c) 2-path +
    closing-edge join as :func:`triangle_count` — each triangle
    materializes ONCE, then unpivots to its three corners and
    aggregates per entity (partial-aggregated, uniform entity key);
    degrees are one groupBy over the symmetrized edge list. The
    2-path join is the cost center, same AQE-skew-split / degree-cap
    mitigation story as triangle_count. Isolated directions (deg < 2)
    emit clustering 0.0, not NULL, so downstream ranking needs no
    null guard."""
    e = (
        triples.select(F.col(subj).alias("x"), F.col(obj).alias("y"))
        .where(F.col(subj) != F.col(obj))
        .select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("entity"))
        .unionByName(e.select(F.col("b").alias("entity")))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    tri = (
        e.join(e.select(F.col("a").alias("b"), F.col("b").alias("c")), "b")
        .join(e.select("a", F.col("b").alias("c")), ["a", "c"])
    )
    corners = (
        tri.select(F.col("a").alias("entity"))
        .unionByName(tri.select(F.col("b").alias("entity")))
        .unionByName(tri.select(F.col("c").alias("entity")))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return deg.join(corners, "entity", "left").select(
        "entity",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint").alias(
            "n_triangles"
        ),
        F.when(F.col("degree") < 2, F.lit(0.0))
        .otherwise(
            2.0 * F.coalesce(F.col("n_triangles"), F.lit(0))
            / (F.col("degree") * (F.col("degree") - 1))
        )
        .alias("clustering"),
    )


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    cost: str = "cost",
) -> DataFrame:
    """Bounded weighted shortest paths (Bellman-Ford over the min-plus
    semiring, k relaxation rounds): (entity, dist) = cheapest ≤k-hop
    path cost from any seed. With ``cost = -ln(confidence)`` from
    :func:`triple_support` this answers "how strongly connected is X
    to the seeds" — path confidence = exp(-dist), the product of edge
    confidences along the best path; :func:`k_hop` is the unweighted
    special case (all costs 1).

    ``seeds`` is a one-column ``entity`` frame (dist 0); ``edges``
    must carry non-negative costs (negative costs make bounded
    relaxation order-dependent — caller's contract, as in every BF
    formulation).

    Scale shape: per round, ONE join of the node-cardinality dist
    frame against the edge table on the uniform src key + one
    partial-aggregated min groupBy — the dist frame is tiny relative
    to edges, the k rounds are the textbook bounded-iteration
    compromise (full convergence at 10^12 edges is a driver loop on
    a distance-sum fixpoint probe away). Each round's dist persists
    (consumed twice: relax + union); release via
    ``out.pinned_caches``."""
    e = edges.select(
        F.col(src).alias("__src"),
        F.col(dst).alias("__dst"),
        F.col(cost).alias("__cost"),
    )
    pinned = []
    dist = seeds.select("entity", F.lit(0.0).alias("dist")).persist()
    pinned.append(dist)
    for _ in range(k):
        cand = dist.join(e, dist["entity"] == e["__src"]).select(
            F.col("__dst").alias("entity"),
            (F.col("dist") + F.col("__cost")).alias("dist"),
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("entity")
            .agg(F.min("dist").alias("dist"))
            .persist()
        )
        pinned.append(dist)
    dist.pinned_caches = pinned
    return dist


def k_core(
    triples: DataFrame,
    k: int = 2,
    rounds: int = 5,
    subj: str = "subj",
    obj: str = "obj",
) -> DataFrame:
    """Bounded k-core peeling over the undirected distinct edge set:
    (entity, degree) for nodes surviving ``rounds`` rounds of
    "remove every node with degree < k" (Seidman 1983 cores). The
    dense-subgraph filter canonicalization triage runs before
    clustering: a peeled hairball keeps only the parts with real
    mutual support, shedding pendant chains that unravel iteratively
    (a chain peels one link per round — exactly what single-pass
    degree filters miss). ``degree`` is measured over the edge set
    ENTERING the final round (it may still count neighbors that
    round peels); once the rounds have converged it equals the exact
    within-core degree.

    FIXED round count, not a fixpoint probe, so the result is
    deterministic and SQL-replayable; rounds ≥ the longest pendant
    chain gives the exact k-core, and a caller that needs certainty
    loops on a count fixpoint (one scalar probe per round — the
    production pattern at 10^12 edges, where each round is the cost
    and the bound is chosen, not discovered).

    Per round: ONE partial-aggregated degree groupBy over surviving
    edges + two semi-joins (endpoint ∈ survivors) on uniform entity
    keys — node-cardinality frames against the edge table, no
    windows, no collect. Each round's edge frame persists (consumed
    by degree + next round); release via ``out.pinned_caches``."""
    e = (
        triples.select(F.col(subj).alias("x"), F.col(obj).alias("y"))
        .where(F.col(subj) != F.col(obj))
        .select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .distinct()
        .persist()
    )
    pinned = [e]
    deg = None
    for _ in range(rounds):
        deg = (
            e.select(F.col("a").alias("entity"))
            .unionByName(e.select(F.col("b").alias("entity")))
            .groupBy("entity")
            .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
            .where(F.col("degree") >= k)
        )
        e = (
            e.join(
                deg.select(F.col("entity").alias("a")), "a", "left_semi"
            )
            .join(
                deg.select(F.col("entity").alias("b")), "b", "left_semi"
            )
            .select("a", "b")
            .persist()
        )
        pinned.append(e)
    out = deg if deg is not None else e.select(
        F.col("a").alias("entity"), F.lit(0).cast("bigint").alias("degree")
    ).limit(0)
    out.pinned_caches = pinned
    return out


def infer_entity_types(
    triples: DataFrame,
    unknown_prefix: str = "unk",
    type_sep: str = ":",
    subj: str = "subj",
    obj: str = "obj",
    pred: str = "pred",
) -> DataFrame:
    """Type the UNTYPED entities (the ``unk:`` surrogates
    kg/linking.py mints for unlinkable mentions) by voting through
    predicate signatures: each (predicate, slot) the surrogate
    appears in contributes that slot's type distribution among TYPED
    entities, weighted by the surrogate's mention count there —
    inferred_type = argmax of the accumulated vote (score desc, type
    asc deterministic tiebreak). The standard schema-side half of
    entity typing (works_at's subject slot is 94% ``per`` ⇒ an
    unknown subject of works_at is probably a person) — the text
    side (context windows) is the tagger's job upstream.

    Output: (entity, inferred_type, score, n_mentions) — ``score``
    the winning vote mass, ``n_mentions`` the surrogate's total slot
    occurrences (the evidence size a consumer thresholds on).

    Scale shape: the signature table aggregates TYPED slots once
    (bounded: preds × types) and broadcasts; surrogate evidence is
    ONE partial-aggregated groupBy on (entity, pred, slot); the vote
    join is against the broadcast signature frame and the winner one
    map-side ``max_by`` per entity. The mention stream shuffles once,
    on the entity key."""
    def slots(side, slot_name):
        other = obj if side == subj else subj
        return triples.select(
            F.col(side).alias("entity"),
            F.col(pred).alias("pred"),
            F.lit(slot_name).alias("slot"),
        )

    occ = slots(subj, "s").unionByName(slots(obj, "o"))
    typed = occ.where(
        F.col("entity").contains(type_sep)
        & (F.substring_index(F.col("entity"), type_sep, 1)
           != unknown_prefix)
    )
    sig = (
        typed.groupBy(
            "pred", "slot",
            F.substring_index(F.col("entity"), type_sep, 1).alias(
                "etype"
            ),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
    )
    sig_tot = sig.groupBy("pred", "slot").agg(
        F.sum("__c").alias("__t")
    )
    sig = sig.join(sig_tot, ["pred", "slot"]).select(
        "pred", "slot", "etype", (F.col("__c") / F.col("__t")).alias("__share")
    )
    unk = (
        occ.where(
            F.substring_index(F.col("entity"), type_sep, 1)
            == unknown_prefix
        )
        .groupBy("entity", "pred", "slot")
        .agg(F.count(F.lit(1)).cast("double").alias("__m"))
    )
    votes = (
        unk.join(F.broadcast(sig), ["pred", "slot"])
        .groupBy("entity", "etype")
        .agg(F.sum(F.col("__m") * F.col("__share")).alias("__score"))
    )
    n_m = unk.groupBy("entity").agg(
        F.sum("__m").cast("bigint").alias("n_mentions")
    )
    key = F.struct(
        (-F.col("__score")).alias("ns"), F.col("etype").alias("t")
    )
    row = F.struct(
        F.col("etype").alias("inferred_type"),
        F.col("__score").alias("score"),
    )
    won = votes.groupBy("entity").agg(F.min_by(row, key).alias("__w"))
    return won.join(n_m, "entity").select(
        "entity",
        F.col("__w.inferred_type").alias("inferred_type"),
        F.col("__w.score").alias("score"),
        "n_mentions",
    )

"""Canonicalization: connected components over entity-similarity edges.

GraphFrames is not a baked-in dependency, so this is a from-scratch
DataFrame implementation of the public large-star/small-star
alternation (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) specialized to the hash-to-min variant:

    label(v) ← min(label(v), min over neighbours' labels)

iterated to fixpoint. Each iteration is two shuffles (edge join +
min agg); convergence is detected with a changed-count aggregate.
For entity-canonicalization graphs the diameter is tiny (alias
cliques), so 2-4 iterations suffice; the iteration count is capped
and each round is persisted + the previous round unpersisted so the
lineage does not grow unboundedly (important for resumability and
for AQE re-planning each round at true sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """(src, dst) undirected edges → (node, component) with component =
    min node id in the component (lexicographic for strings).

    Small-graph fast path: entity-canonicalization edge sets are usually
    tiny relative to the corpus (distinct near-duplicate surfaces), and
    each distributed CC round costs several fixed-overhead Spark jobs.
    Below ``small_graph_threshold`` edges the components are computed
    with a driver-side union-find in one collect — same output, one job
    instead of ~4 per round. The distributed path remains for genuinely
    large similarity graphs."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    if small_graph_threshold:
        head = sym.limit(small_graph_threshold + 1).collect()
        if len(head) <= small_graph_threshold:
            if not head:
                # empty edge set: createDataFrame([]) can't infer a schema,
                # so derive the typed empty frame from sym itself
                out = sym.select(
                    F.col("a").alias("node"), F.col("a").alias("component")
                )
                sym.unpersist()
                return out
            sym.unpersist()
            parent: dict = {}

            def find(x):
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for row in head:
                a, b = row["a"], row["b"]
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by MIN id so the representative matches the
                    # distributed path's min-label convergence
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            rows = [(n, find(n)) for n in parent]
            spark = edges.sparkSession
            return spark.createDataFrame(rows, ["node", "component"])
    # initial label: min(self, min neighbour)
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("label"))
        .withColumnRenamed("a", "node")
        .persist()
    )
    for _ in range(max_iterations):
        # propagate: node takes min of its label and neighbours' labels
        neigh = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("a", "node")
        )
        # localCheckpoint truncates lineage — without it the iterated plan
        # grows until Catalyst itself OOMs (classic iterative-DataFrame trap)
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        # pointer jumping: label(v) ← label(label(v)) — O(log n) convergence
        ptr = new_labels.select(
            F.col("node").alias("label"), F.col("label").alias("plabel")
        )
        new_labels = (
            new_labels.join(ptr, "label", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("plabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def canonical_entities(
    linked_mentions: DataFrame,
    id_col: str = "canonical_id",
    surface_col: str = "__norm_surface",
    extra_edges: DataFrame | None = None,
) -> DataFrame:
    """Cluster entity ids that co-refer: ids sharing a normalized
    surface form get an edge; optional extra similarity edges union in.
    Returns (canonical_id, entity_cluster) — entity_cluster is the
    stable cluster representative (min id)."""
    ids = linked_mentions.select(id_col).distinct()
    if surface_col in linked_mentions.columns:
        pairs = (
            linked_mentions.select(surface_col, id_col)
            .distinct()
            .groupBy(surface_col)
            .agg(F.collect_set(id_col).alias("ids"))
            .where(F.size("ids") > 1)
            .select(F.explode(F.expr(
                "filter(transform(flatten(transform(ids, x -> transform(ids, y -> struct(x as src, y as dst)))), p -> p), p -> p.src < p.dst)"
            )).alias("e"))
            .select("e.src", "e.dst")
        )
    else:
        pairs = None
    edges = pairs
    if extra_edges is not None:
        edges = extra_edges if edges is None else edges.unionByName(extra_edges)
    if edges is None or not edges.take(1):
        return ids.select(
            F.col(id_col), F.col(id_col).alias("entity_cluster")
        )
    cc = connected_components(edges)
    return (
        ids.join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("entity_cluster"),
        )
    )


def canonicalize_by_embedding(
    entity_emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "entity",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Entity canonicalization from EMBEDDING proximity: entities whose
    vectors are cosine-near (≥ threshold) merge transitively into one
    cluster — the semantic complement to the surface-form/LSH path
    (``kg/linking.py:canonicalize_surrogates``), fed naturally by a
    trained ``kg/embeddings.py`` model via ``model.to_frames(spark)``.

    Returns ``(id_col, entity_cluster)`` for EVERY input entity
    (singletons map to themselves).  Scale shape: candidate pairs come
    from the hyperplane-bucketed self-join (hot buckets re-split, the
    corpus never goes quadratic — operators/similarity.py), and the
    transitive closure is the pure-DataFrame connected components.
    The bucketed cache handle is exposed as ``out.bucketed_frame``.
    """
    from crfsuite_spark.operators.similarity import embedding_dup_pairs

    pairs = embedding_dup_pairs(
        entity_emb, dim, threshold, n_planes,
        id_col=id_col, vec_col=vec_col, seed=seed,
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    ids = entity_emb.select(F.col(id_col).alias("canonical_id")).distinct()
    out = canonical_entities(ids, extra_edges=edges).select(
        F.col("canonical_id").alias(id_col), "entity_cluster"
    )
    out.bucketed_frame = pairs.bucketed_frame
    return out


def bcubed(
    assign: DataFrame,
    pred_col: str = "cluster",
    gold_col: str = "canonical_id",
) -> DataFrame:
    """B-cubed extrinsic evaluation of a clustering against gold ids
    (Bagga & Baldwin 1998; the metric Amigó et al. 2009 show uniquely
    satisfies all four clustering-evaluation constraints) — THE
    quality gate for the canonicalization stage: how well do the
    surrogate clusters reproduce the gold entity partition.

    Per-item B³ precision = fraction of the item's predicted cluster
    sharing its gold id; recall = fraction of its gold cluster sharing
    its predicted cluster. Averaged over items both collapse into the
    (pred, gold) contingency table: with ``n_pg`` the cell counts and
    ``n_p``/``n_g`` the marginals,

        precision = Σ n_pg² / n_p / N      recall = Σ n_pg² / n_g / N

    so the O(N²) pairwise definition becomes ONE partial-aggregated
    groupBy over the assignment rows plus arithmetic on the bounded
    contingency frame (≤ |mentions| cells, in practice ≈ |entities|).
    Nothing per-pair ever materializes — the scale shape that lets the
    gate run over every crawl's full mention set.

    Returns a single row: (n_items, b3_precision, b3_recall, b3_f1).
    Rows with a NULL predicted or gold id are excluded (unlinked
    mentions are a coverage metric, not a clustering one).
    """
    cells = (
        assign.where(F.col(pred_col).isNotNull() & F.col(gold_col).isNotNull())
        .groupBy(
            F.col(pred_col).alias("__p"), F.col(gold_col).alias("__g")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("__n"))
    )
    psz = cells.groupBy("__p").agg(F.sum("__n").alias("__np"))
    gsz = cells.groupBy("__g").agg(F.sum("__n").alias("__ng"))
    joined = cells.join(psz, "__p").join(gsz, "__g")
    out = joined.agg(
        F.sum("__n").cast("bigint").alias("n_items"),
        (F.sum(F.col("__n") * F.col("__n") / F.col("__np")) / F.sum("__n"))
        .alias("b3_precision"),
        (F.sum(F.col("__n") * F.col("__n") / F.col("__ng")) / F.sum("__n"))
        .alias("b3_recall"),
    )
    return out.select(
        "n_items",
        "b3_precision",
        "b3_recall",
        (
            2 * F.col("b3_precision") * F.col("b3_recall")
            / (F.col("b3_precision") + F.col("b3_recall"))
        ).alias("b3_f1"),
    )

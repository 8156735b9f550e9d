"""TransE knowledge-graph embeddings: distributed training and
link-prediction evaluation over (subj, pred, obj) triple frames.

Completes the graph-learning data path this engine already preps for
(kg/negatives.py corrupt-tail sampling, kg/splits.py FB15k-protocol
splitting, kg/graph.py neighbor fanout sampling): the public TransE
model (Bordes et al. 2013, "Translating Embeddings for Modeling
Multi-relational Data") scores a triple by ``-||E[h] + R[r] - E[t]||²``
and trains with a margin-ranking loss against corrupted triples.

Scale + determinism design (same regime as the CRF trainer):

- **Embedding tables are broadcast model state**, exactly like the CRF
  weight matrix: entity/relation vocabularies are dictionary-scale
  (bounded like ``kg/linking.py``'s alias dictionary), the triple
  STREAM is what scales.  Per epoch ONE broadcast ships the tables
  out; the returning gradient payloads are SPARSE over the entities a
  partition actually touched (≤ 4 per triple), so payload size scales
  with partition triple count, not vocabulary size — the dense form
  made each partition ship the whole (n_entities × dim) matrix and
  measurably INVERTED scaling (8 cores beat 32 on 200k triples:
  100k vs 64k triples/s/epoch) before this fix.  Partials merge
  partition-id-ordered below the tree threshold (deterministic
  summation order → bit-reproducible runs), executor-side treeReduce
  above it.
- **Full-batch subgradient descent**, not per-partition SGD: every
  epoch computes the exact margin-loss subgradient over all triples,
  so the result is independent of partitioning (up to float summation
  order) and reproducible — the property the batch CRF trainer has
  and iterative-mixing SGD does not.
- **Negatives are portable-hash draws** keyed on (triple-ids, epoch,
  side, seed) with the classic n-1 skip trick (kg/negatives.py's
  idiom), so retries/AQE replans and different partitionings corrupt
  each triple identically.
- **Filtered ranks without a driver-side known-set**: the raw rank is
  a vectorized all-entity scan per test triple (Arrow batches against
  the broadcast tables); the "filtered" correction — known true tails
  that outscore the test tail — is a JOIN against the known-triple
  frame, aggregated distributedly.  The known set is never collected.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants): a
    deterministic uint64 → uint64 mix, the vectorized counterpart of
    the md5 draw for in-partition negative sampling (no SQL mirror
    needed, so speed wins over cross-engine portability here)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
    return x ^ (x >> np.uint64(31))


def _draw_indices(h, r, t, epoch: int, side: int, seed: int,
                  n: int) -> np.ndarray:
    """Deterministic uniform draws in [0, n), keyed per (triple ids,
    epoch, side, seed) — identical under any partitioning/replan."""
    with np.errstate(over="ignore"):
        key = (
            h.astype(np.uint64) * np.uint64(0x100000001B3)
            + r.astype(np.uint64) * np.uint64(0x1000193)
            + t.astype(np.uint64) * np.uint64(0x10001)
            + np.uint64(epoch * 2 + side)
            + np.uint64(seed) * np.uint64(0x9E3779B9)
        ) & _M64
    return (_mix64(key) % np.uint64(n)).astype(np.int64)


def _cx_split(x: np.ndarray):
    """Split a Re‖Im-packed array (..., 2d) into (real, imag) halves.
    ComplEx (Trouillon et al. 2016, "Complex Embeddings for Simple
    Link Prediction") vectors are stored as width-2d REAL rows — the
    first d columns the real part, the last d the imaginary part — so
    every piece of harness machinery that only sees real arrays
    (broadcast, sparse payload reduce, warm start, parquet roundtrip,
    unit-norm projection) works unchanged."""
    d = x.shape[-1] // 2
    return x[..., :d], x[..., d:]


def _cx_grad_t(ent_h: np.ndarray, rel_r: np.ndarray) -> np.ndarray:
    """∂s/∂t for ComplEx s = Re⟨h, r, conj(t)⟩ = Re(h∘r)·Re(t)
    + Im(h∘r)·Im(t), packed Re‖Im.  Doubles as the rank-scan QUERY
    vector: s = _cx_grad_t(h, r) · t for every candidate t, so the
    all-entity scoring scan stays ONE matmul exactly like DistMult."""
    hr, hi = _cx_split(ent_h)
    rr, ri = _cx_split(rel_r)
    return np.concatenate([hr * rr - hi * ri, hr * ri + hi * rr], axis=-1)


def _cx_grad_h(rel_r: np.ndarray, ent_t: np.ndarray) -> np.ndarray:
    """∂s/∂h: (rr·tr + ri·ti) ‖ (rr·ti − ri·tr)."""
    rr, ri = _cx_split(rel_r)
    tr, ti = _cx_split(ent_t)
    return np.concatenate([rr * tr + ri * ti, rr * ti - ri * tr], axis=-1)


def _cx_grad_r(ent_h: np.ndarray, ent_t: np.ndarray) -> np.ndarray:
    """∂s/∂r: (hr·tr + hi·ti) ‖ (hr·ti − hi·tr)."""
    hr, hi = _cx_split(ent_h)
    tr, ti = _cx_split(ent_t)
    return np.concatenate([hr * tr + hi * ti, hr * ti - hi * tr], axis=-1)


@dataclass
class TransEModel:
    """Broadcastable KGE model state: sorted vocabularies plus float64
    embedding matrices (entities L2-normalized per the projection
    step).  ``scoring`` names the triple score the vectors were
    trained under and ranking uses: ``"transe"`` (negative L2 distance
    ‖h+r−t‖², lower distance = better), ``"distmult"`` (trilinear
    dot Σ h⊙r⊙t, higher = better; Yang et al. 2015, "Embedding
    Entities and Relations..."), ``"complex"`` (Re⟨h, r, conj(t)⟩
    over Re‖Im-packed rows, higher = better; Trouillon et al. 2016)
    or ``"rotate"`` (−‖h∘r − t‖² with unit-modulus relations, lower
    distance = better; Sun et al. 2019)."""

    entities: list
    relations: list
    ent_emb: np.ndarray  # (n_entities, dim)
    rel_emb: np.ndarray  # (n_relations, dim)
    log: list = field(default_factory=list)
    scoring: str = "transe"

    @property
    def dim(self) -> int:
        return int(self.ent_emb.shape[1])

    @classmethod
    def from_frames(cls, ent: DataFrame, rel: DataFrame,
                    scoring: str | None = None) -> "TransEModel":
        """Rebuild a model from the :meth:`to_frames` layout (e.g.
        after a parquet roundtrip).  Vocabulary order is re-sorted, so
        any row order on disk loads identically; the collect is
        model-state-sized by contract.  ``scoring`` is read from the
        relation frame's ``scoring`` column when present (written by
        :meth:`to_frames`) so a roundtrip preserves rank direction;
        an explicit argument overrides, and frames from older writes
        without the column fall back to ``"transe"``."""
        ent_rows = sorted((r["entity"], r["embedding"])
                          for r in ent.collect())
        rel_collected = rel.collect()
        rel_rows = sorted((r["relation"], r["embedding"])
                          for r in rel_collected)
        if scoring is None:
            stored = {r["scoring"] for r in rel_collected
                      if "scoring" in r.__fields__}
            scoring = stored.pop() if len(stored) == 1 else "transe"
        return cls(
            entities=[e for e, _ in ent_rows],
            relations=[r for r, _ in rel_rows],
            ent_emb=np.array([v for _, v in ent_rows], dtype=np.float64),
            rel_emb=np.array([v for _, v in rel_rows], dtype=np.float64),
            scoring=scoring,
        )

    def to_frames(self, spark) -> tuple[DataFrame, DataFrame]:
        """(entity_df, relation_df) with ``array<double>`` embedding
        columns — the writable/joinable form.  The relation frame
        carries a constant ``scoring`` column so :meth:`from_frames`
        restores rank direction without side-channel state."""
        ent = spark.createDataFrame(
            [(e, v.tolist()) for e, v in zip(self.entities, self.ent_emb)],
            "entity string, embedding array<double>",
        )
        rel = spark.createDataFrame(
            [(r, v.tolist(), self.scoring)
             for r, v in zip(self.relations, self.rel_emb)],
            "relation string, embedding array<double>, scoring string",
        )
        return ent, rel


def _segment_sum(idx_parts: list, val_parts: list):
    """Sum row contributions per index: concat → unique → one
    bincount per dim.  Bincount is the buffered C path (np.add.at's
    unbuffered scatter measured ~10× slower on this exact shape) and
    sums each bucket in input order — deterministic for a fixed
    concatenation order."""
    idx = np.concatenate(idx_parts)
    val = np.concatenate(val_parts)
    uidx, inv = np.unique(idx, return_inverse=True)
    rows = np.empty((len(uidx), val.shape[1]), dtype=np.float64)
    for k in range(val.shape[1]):
        rows[:, k] = np.bincount(inv, weights=val[:, k],
                                 minlength=len(uidx))
    return uidx, rows


def _merge_grad_partials(a, b):
    """Merge two (n, loss, (ent_idx, ent_rows, g_rel)) sparse gradient
    partials; the small relation gradient stays dense."""
    n_a, loss_a, (ia, ra, rel_a) = a
    n_b, loss_b, (ib, rb, rel_b) = b
    uidx, rows = _segment_sum([ia, ib], [ra, rb])
    return (n_a + n_b, loss_a + loss_b, (uidx, rows, rel_a + rel_b))


def _reduce_grad_partials(partials_df, n_partitions_hint: int,
                          tree_reduce_threshold: int = 64,
                          payload_bytes_hint: int | None = None,
                          driver_ingest_cap: int = 64 << 20):
    """Sum sparse epoch-gradient payloads: by default ONE partition-id-
    ordered segment-sum over all collected payloads (deterministic
    float order, no pairwise re-unique churn); executor-side treeReduce
    only when BOTH the partition count exceeds the threshold AND the
    worst-case driver ingest (partitions × vocab-dense payload,
    ``payload_bytes_hint``) exceeds ``driver_ingest_cap`` — the tree
    exists to protect the driver from P × vocab × dim bytes, and when
    the payloads are small it is pure overhead (an extra Python
    deserialization stage per epoch: measured 2.9 s vs 1.5 s for a
    3-epoch run at 275k triples / 24 entities, and the rdd path's
    first-call spin-up alone costs ~6 s)."""
    import pickle

    big_ingest = (
        payload_bytes_hint is None
        or payload_bytes_hint * n_partitions_hint > driver_ingest_cap
    )
    if n_partitions_hint > tree_reduce_threshold and big_ingest:
        try:
            return partials_df.rdd.map(
                lambda r: (r["n"], r["loss"], pickle.loads(r["w"]))
            ).treeReduce(_merge_grad_partials, depth=2)
        except ValueError:
            return None
    parts = sorted(partials_df.collect(), key=lambda r: r["pid"])
    if not parts:
        return None
    payloads = [pickle.loads(r["w"]) for r in parts]
    uidx, rows = _segment_sum([p[0] for p in payloads],
                              [p[1] for p in payloads])
    g_rel = payloads[0][2].copy()
    for p in payloads[1:]:
        g_rel += p[2]
    n = sum(r["n"] for r in parts)
    loss = 0.0
    for r in parts:
        loss += r["loss"]
    return (n, loss, (uidx, rows, g_rel))


def build_vocab(triples: DataFrame) -> tuple[list, list]:
    """Sorted entity (subj ∪ obj) and relation vocabularies.  These
    are model-state-sized (the same bounded-collect contract as the
    CRF label/attribute dictionaries and the linking alias dict).
    ONE tagged-union distinct job collects both vocabularies (the
    two-job form paid a second full scan + shuffle for the handful of
    relation strings); the driver-side sort is byte-order-identical to
    the previous Spark sort (UTF-8 ordering == code-point ordering)."""
    rows = (
        triples.select(
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("k"), F.col("subj").alias("v")),
                    F.struct(F.lit(0).alias("k"), F.col("obj").alias("v")),
                    F.struct(F.lit(1).alias("k"), F.col("pred").alias("v")),
                )
            ).alias("e")
        )
        .select(F.col("e.k").alias("k"), F.col("e.v").alias("v"))
        .distinct()
        .collect()
    )
    ents = sorted(r["v"] for r in rows if r["k"] == 0)
    rels = sorted(r["v"] for r in rows if r["k"] == 1)
    return ents, rels


def _index_triples(triples: DataFrame, ent2id: dict, rel2id: dict,
                   num_partitions: int | None) -> DataFrame:
    """Distinct (h, r, t) id rows via broadcast dicts — one Arrow pass,
    the mention stream never ships strings to the driver."""
    sc = triples.sparkSession.sparkContext
    maps_bc = sc.broadcast((ent2id, rel2id))

    def run(batches):
        e2i, r2i = maps_bc.value
        for pdf in batches:
            yield pd.DataFrame({
                "h": pdf["subj"].map(e2i).astype("int64"),
                "r": pdf["pred"].map(r2i).astype("int64"),
                "t": pdf["obj"].map(e2i).astype("int64"),
            })

    out = (
        triples.select("subj", "pred", "obj").distinct()
        .mapInPandas(run, "h long, r long, t long")
    )
    if num_partitions:
        out = out.repartition(num_partitions)
    return out


def train_kge(
    triples: DataFrame,
    dim: int = 32,
    epochs: int = 50,
    lr: float = 0.1,
    margin: float = 1.0,
    seed: int = 42,
    num_partitions: int | None = None,
    tree_reduce_threshold: int = 16,
    init: TransEModel | None = None,
    scoring: str = "transe",
) -> TransEModel:
    """Full-batch KG-embedding training with margin-ranking loss and
    hash-drawn corrupt-head AND corrupt-tail negatives (one of each
    per triple per epoch).  ``scoring`` picks the triple score:
    ``"transe"`` (distance, Bordes et al. 2013), ``"distmult"``
    (trilinear dot, Yang et al. 2015) or ``"complex"`` (real part of
    the Hermitian trilinear product, Trouillon et al. 2016; ``dim``
    must be even — vectors pack Re‖Im into one real row, complex
    dimension = dim/2) — the distributed harness (vocab, negatives,
    sparse payload reduce, warm start) is shared.  Entities re-project
    to the unit sphere after every step (the TransE/DistMult papers'
    normalization; for ComplEx this replaces the paper's L2
    regularizer — same role, keeps the projection step uniform).  ``model.log`` holds per-epoch
    ``{"epoch", "loss", "n_triples"}``.

    ``tree_reduce_threshold``: above this many partitions the epoch
    payloads merge executor-side (treeReduce) so the driver ingests
    ~√P payloads instead of P.  On a DENSE-touch workload (each
    partition hits most of the vocabulary) the gradient payload is
    ~vocab-sized per partition, so driver ingest is P × vocab × dim
    bytes — measured as the scaling inversion on local[32] (32
    collected payloads of ~13 MB each per epoch) — and the tree is
    what restores scaling; hence the low default.  Below it, payloads
    merge on the driver in partition-id order (deterministic float
    summation).

    ``init``: warm-start from a previous model (the incremental
    maintenance hook — fine-tune after an edge-store epoch commit
    lands new triples): vocabularies re-build from the CURRENT
    triples, rows known to ``init`` keep their vectors, new
    entities/relations draw the seeded random init.  Pair with few
    epochs for a cheap refresh instead of retraining from scratch.
    """
    from crfsuite_spark.train.trainer import EPOCH_PARTIAL_SCHEMA

    if scoring not in ("transe", "distmult", "complex", "rotate"):
        raise ValueError(f"unknown scoring {scoring!r}")
    if scoring in ("complex", "rotate") and dim % 2:
        raise ValueError(
            f"{scoring} scoring packs Re|Im — dim must be even")
    sc = triples.sparkSession.sparkContext
    entities, relations = build_vocab(triples)
    ent2id = {e: i for i, e in enumerate(entities)}
    rel2id = {r: i for i, r in enumerate(relations)}
    n_e, n_r = len(entities), len(relations)
    if n_e < 2:
        raise ValueError("need at least two entities to draw negatives")

    # persist lazily: the first epoch's pass fills the cache — an eager
    # count() here would add one full blocking job per training call
    # purely to warm it (getNumPartitions inspects the plan, no job)
    indexed = _index_triples(triples, ent2id, rel2id, num_partitions).persist()
    n_parts = indexed.rdd.getNumPartitions()

    def _unit_modulus(rel):
        """Project each packed complex component of every relation row
        onto the unit circle — the RotatE constraint |r_j| = 1 as a
        projected-gradient retraction (the paper's phase
        parameterization reaches the same manifold)."""
        d = rel.shape[1] // 2
        rr, ri = rel[:, :d], rel[:, d:]
        mod = np.maximum(np.sqrt(rr**2 + ri**2), 1e-12)
        return np.concatenate([rr / mod, ri / mod], axis=1)

    rng = np.random.RandomState(seed)
    bound = 6.0 / np.sqrt(dim)
    ent_emb = rng.uniform(-bound, bound, (n_e, dim))
    ent_emb /= np.linalg.norm(ent_emb, axis=1, keepdims=True)
    rel_emb = rng.uniform(-bound, bound, (n_r, dim))
    if scoring == "rotate":
        rel_emb = _unit_modulus(rel_emb)
    if init is not None:
        if init.dim != dim:
            raise ValueError(
                f"init model has dim {init.dim}, requested {dim}")
        if init.scoring != scoring:
            raise ValueError(
                f"init model was trained with scoring "
                f"{init.scoring!r}, requested {scoring!r}")
        old_e = {e: i for i, e in enumerate(init.entities)}
        old_r = {r: i for i, r in enumerate(init.relations)}
        for i, e in enumerate(entities):
            if e in old_e:
                ent_emb[i] = init.ent_emb[old_e[e]]
        for i, r in enumerate(relations):
            if r in old_r:
                rel_emb[i] = init.rel_emb[old_r[r]]

    log: list[dict] = []
    for epoch in range(1, epochs + 1):
        w_bc = sc.broadcast((ent_emb, rel_emb))

        def run(batches, _epoch=epoch):
            import pickle

            from pyspark import TaskContext

            ent, rel = w_bc.value
            g_rel = np.zeros_like(rel)
            acc_idx: list = []
            acc_rows: list = []
            loss = 0.0
            n = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                h = pdf["h"].to_numpy()
                r = pdf["r"].to_numpy()
                t = pdf["t"].to_numpy()
                n += len(h)
                # hash-drawn corruptions with the n-1 skip trick
                neg_t = _draw_indices(h, r, t, _epoch, 0, seed, n_e - 1)
                neg_t += neg_t >= t
                neg_h = _draw_indices(h, r, t, _epoch, 1, seed, n_e - 1)
                neg_h += neg_h >= h
                idx_parts: list = []
                val_parts: list = []
                if scoring == "transe":
                    d_pos_vec = ent[h] + rel[r] - ent[t]
                    d_pos = (d_pos_vec**2).sum(axis=1)
                elif scoring == "rotate":  # minimize ||h∘r − t||²
                    d_pos_vec = _cx_grad_t(ent[h], rel[r]) - ent[t]
                    d_pos = (d_pos_vec**2).sum(axis=1)
                elif scoring == "distmult":  # maximize s = Σ h⊙r⊙t
                    s_pos = (ent[h] * rel[r] * ent[t]).sum(axis=1)
                else:  # complex: maximize s = Re⟨h, r, conj(t)⟩
                    s_pos = (_cx_grad_t(ent[h], rel[r]) * ent[t]).sum(axis=1)
                for nh, nt in ((h, neg_t), (neg_h, t)):
                    if scoring == "transe":
                        d_neg_vec = ent[nh] + rel[r] - ent[nt]
                        d_neg = (d_neg_vec**2).sum(axis=1)
                        hinge = margin + d_pos - d_neg
                        viol = hinge > 0
                        gp = 2.0 * d_pos_vec[viol]
                        gn = 2.0 * d_neg_vec[viol]
                        idx_parts += [h[viol], t[viol], nh[viol], nt[viol]]
                        val_parts += [gp, -gp, -gn, gn]
                        grel = gp - gn
                    elif scoring == "rotate":
                        # distance hinge like transe, but the product
                        # h∘r is complex: ∂D/∂h = 2·conj(r)∘d and
                        # ∂D/∂r = 2·conj(h)∘d (both = _cx_grad_h),
                        # ∂D/∂t = −2d — Sun et al. 2019 with the
                        # unit-modulus constraint enforced by
                        # projection after the step instead of a
                        # phase parameterization
                        d_neg_vec = (_cx_grad_t(ent[nh], rel[r])
                                     - ent[nt])
                        d_neg = (d_neg_vec**2).sum(axis=1)
                        hinge = margin + d_pos - d_neg
                        viol = hinge > 0
                        dp, dn = d_pos_vec[viol], d_neg_vec[viol]
                        rv_ = rel[r][viol]
                        idx_parts += [h[viol], t[viol], nh[viol], nt[viol]]
                        val_parts += [2.0 * _cx_grad_h(rv_, dp),
                                      -2.0 * dp,
                                      -2.0 * _cx_grad_h(rv_, dn),
                                      2.0 * dn]
                        grel = 2.0 * (_cx_grad_h(ent[h][viol], dp)
                                      - _cx_grad_h(ent[nh][viol], dn))
                    elif scoring == "distmult":
                        s_neg = (ent[nh] * rel[r] * ent[nt]).sum(axis=1)
                        hinge = margin - s_pos + s_neg
                        viol = hinge > 0
                        hv, tv = ent[h][viol], ent[t][viol]
                        rv_ = rel[r][viol]
                        nhv, ntv = ent[nh][viol], ent[nt][viol]
                        idx_parts += [h[viol], t[viol], nh[viol], nt[viol]]
                        val_parts += [-(rv_ * tv), -(hv * rv_),
                                      rv_ * ntv, nhv * rv_]
                        grel = nhv * ntv - hv * tv
                    else:  # complex — same hinge, Wirtinger-split grads
                        s_neg = (_cx_grad_t(ent[nh], rel[r])
                                 * ent[nt]).sum(axis=1)
                        hinge = margin - s_pos + s_neg
                        viol = hinge > 0
                        hv, tv = ent[h][viol], ent[t][viol]
                        rv_ = rel[r][viol]
                        nhv, ntv = ent[nh][viol], ent[nt][viol]
                        idx_parts += [h[viol], t[viol], nh[viol], nt[viol]]
                        val_parts += [-_cx_grad_h(rv_, tv),
                                      -_cx_grad_t(hv, rv_),
                                      _cx_grad_h(rv_, ntv),
                                      _cx_grad_t(nhv, rv_)]
                        grel = _cx_grad_r(nhv, ntv) - _cx_grad_r(hv, tv)
                    loss += float(np.maximum(0.0, hinge).sum())
                    rv = r[viol]
                    for k in range(grel.shape[1]):
                        g_rel[:, k] += np.bincount(
                            rv, weights=grel[:, k], minlength=len(rel))
                if idx_parts:
                    bi, br = _segment_sum(idx_parts, val_parts)
                    acc_idx.append(bi)
                    acc_rows.append(br)
            if n == 0:
                return
            # sparse payload: only the entity rows this partition
            # touched ship back (size ∝ min(partition triples,
            # vocabulary)), in float32 — partition sums stay float64,
            # the halved payload is what crosses the wire and merges
            uidx, rows = _segment_sum(acc_idx, acc_rows)
            yield pd.DataFrame({
                "pid": [TaskContext.get().partitionId()],
                "n": [n], "loss": [loss],
                "w": [pickle.dumps((uidx, rows.astype(np.float32),
                                    g_rel.astype(np.float32)))],
            })

        red = _reduce_grad_partials(
            indexed.mapInPandas(run, EPOCH_PARTIAL_SCHEMA),
            n_parts, tree_reduce_threshold,
            # vocab-dense worst case per partition: every entity row +
            # the relation matrix, float32 (matches the payload dtype)
            payload_bytes_hint=(n_e + n_r) * dim * 4,
        )
        w_bc.unpersist()
        if red is None:
            break
        total, loss, (ent_idx, ent_rows, g_rel) = red
        scale = lr / max(total, 1)
        ent_emb = ent_emb.copy()
        ent_emb[ent_idx] -= scale * ent_rows
        rel_emb = rel_emb - scale * g_rel
        if scoring == "rotate":
            rel_emb = _unit_modulus(rel_emb)
        norms = np.linalg.norm(ent_emb, axis=1, keepdims=True)
        ent_emb = ent_emb / np.maximum(norms, 1e-12)
        log.append({"epoch": epoch, "loss": float(loss),
                    "n_triples": int(total)})

    indexed.unpersist()
    return TransEModel(entities, relations, ent_emb, rel_emb, log,
                       scoring=scoring)


def train_transe(triples: DataFrame, **kw) -> TransEModel:
    """TransE (Bordes et al. 2013) via :func:`train_kge`."""
    return train_kge(triples, scoring="transe", **kw)


def train_distmult(triples: DataFrame, **kw) -> TransEModel:
    """DistMult (Yang et al. 2015) via :func:`train_kge`."""
    return train_kge(triples, scoring="distmult", **kw)


def train_complex(triples: DataFrame, **kw) -> TransEModel:
    """ComplEx (Trouillon et al. 2016) via :func:`train_kge` —
    ``dim`` is the REAL storage width (complex dimension = dim/2)."""
    return train_kge(triples, scoring="complex", **kw)


def train_rotate(triples: DataFrame, **kw) -> TransEModel:
    """RotatE (Sun et al. 2019, "RotatE: Knowledge Graph Embedding by
    Relational Rotation in Complex Space") via :func:`train_kge`:
    score = −‖h∘r − t‖² with relations projected to unit modulus per
    complex component after every step.  ``dim`` is the REAL storage
    width (complex dimension = dim/2)."""
    return train_kge(triples, scoring="rotate", **kw)


def link_prediction_ranks(
    model: TransEModel,
    test_triples: DataFrame,
    known_triples: DataFrame | None = None,
    batch_size: int = 1024,
) -> DataFrame:
    """Filtered tail-prediction rank per test triple (the FB15k
    protocol): rank = 1 + #{entities e strictly better than the true
    tail under ``model.scoring``, (h, r, e) not a known true triple}
    — lower distance for TransE, higher trilinear dot for DistMult.
    Ties rank optimistically (strictly-better counting), deterministic
    under the exact float scores.

    Two distributed stages, no driver-side known-set:

    1. raw scan — each Arrow batch of test rows scores ALL entities
       against the broadcast tables ((B, n_e) distance matrix via
       one matmul) → raw strictly-better count + the true distance;
    2. filtered correction — test ⋈ known on (subj, pred) scores only
       the known tails (a per-row gather, no n_e fan-out) and counts
       those that outscore the true tail; subtracting them from the
       raw count is exactly the filtered-rank definition.
    """
    spark = test_triples.sparkSession
    sc = spark.sparkContext
    ent2id = {e: i for i, e in enumerate(model.entities)}
    rel2id = {r: i for i, r in enumerate(model.relations)}
    higher_is_better = model.scoring in ("distmult", "complex")
    is_complex = model.scoring == "complex"
    is_rotate = model.scoring == "rotate"
    w_bc = sc.broadcast((model.ent_emb, model.rel_emb, ent2id, rel2id))

    def raw(batches):
        ent, rel, e2i, r2i = w_bc.value
        sq = (ent**2).sum(axis=1)
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo:lo + batch_size]
                h = chunk["subj"].map(e2i).to_numpy()
                r = chunk["pred"].map(r2i).to_numpy()
                t = chunk["obj"].map(e2i).to_numpy()
                if higher_is_better:
                    # DistMult q = h⊙r; ComplEx q = Re‖Im expansion of
                    # h∘r (score = q·t in BOTH cases — one matmul)
                    q = (_cx_grad_t(ent[h], rel[r]) if is_complex
                         else ent[h] * rel[r])  # (B, d)
                    d_all = q @ ent.T
                else:
                    # TransE q = h + r; RotatE q = h∘r — both rank by
                    # ||q − e||² = ||q||² − 2 q·e + ||e||² (one matmul)
                    q = (_cx_grad_t(ent[h], rel[r]) if is_rotate
                         else ent[h] + rel[r])  # (B, d)
                    d_all = (
                        (q**2).sum(axis=1, keepdims=True)
                        - 2.0 * q @ ent.T
                        + sq[None, :]
                    )
                d_true = d_all[np.arange(len(chunk)), t]
                if higher_is_better:
                    raw_cnt = (d_all > d_true[:, None]).sum(axis=1)
                else:
                    raw_cnt = (d_all < d_true[:, None]).sum(axis=1)
                yield pd.DataFrame({
                    "subj": chunk["subj"], "pred": chunk["pred"],
                    "obj": chunk["obj"],
                    "d_true": d_true, "raw_cnt": raw_cnt,
                })

    # The raw scan is compute-bound per ROW (an n_entities × dim
    # matmul per test triple), so partitioning must follow core
    # count, not byte size — AQE coalesces a few-thousand-row test
    # frame to ONE partition and serializes the whole eval otherwise
    # (measured: eval time flat from 8 to 32 cores until this).
    scored = (
        test_triples.select("subj", "pred", "obj").distinct()
        .repartition(sc.defaultParallelism)
        .mapInPandas(
            raw,
            "subj string, pred string, obj string, d_true double, raw_cnt long",
        )
    )
    if known_triples is None:
        return scored.select(
            "subj", "pred", "obj",
            (F.col("raw_cnt") + F.lit(1)).cast("long").alias("rank"),
        )

    def pair_dist(batches):
        ent, rel, e2i, r2i = w_bc.value
        for pdf in batches:
            h = pdf["subj"].map(e2i).to_numpy()
            r = pdf["pred"].map(r2i).to_numpy()
            k = pdf["known_obj"].map(e2i).to_numpy()
            if is_complex:
                d = (_cx_grad_t(ent[h], rel[r]) * ent[k]).sum(axis=1)
            elif higher_is_better:
                d = (ent[h] * rel[r] * ent[k]).sum(axis=1)
            elif is_rotate:
                d = ((_cx_grad_t(ent[h], rel[r]) - ent[k]) ** 2).sum(
                    axis=1)
            else:
                d = ((ent[h] + rel[r] - ent[k]) ** 2).sum(axis=1)
            out = pdf[["subj", "pred", "obj", "d_true"]].copy()
            out["known_obj"] = pdf["known_obj"]
            out["d_known"] = d
            yield out

    known = known_triples.select(
        F.col("subj"), F.col("pred"), F.col("obj").alias("known_obj")
    ).distinct()
    pairs = scored.join(known, on=["subj", "pred"]).filter(
        F.col("known_obj") != F.col("obj")
    )
    corr = (
        pairs.mapInPandas(
            pair_dist,
            "subj string, pred string, obj string, d_true double, "
            "known_obj string, d_known double",
        )
        .filter(
            F.col("d_known") > F.col("d_true") if higher_is_better
            else F.col("d_known") < F.col("d_true")
        )
        .groupBy("subj", "pred", "obj")
        .agg(F.count(F.lit(1)).alias("sub_cnt"))
    )
    return (
        scored.join(corr, on=["subj", "pred", "obj"], how="left")
        .select(
            "subj", "pred", "obj",
            (F.col("raw_cnt") + F.lit(1)
             - F.coalesce(F.col("sub_cnt"), F.lit(0)))
            .cast("long").alias("rank"),
        )
    )


def evaluate_link_prediction(ranks: DataFrame) -> DataFrame:
    """FB15k summary metrics over a rank frame: one partial-aggregated
    row of MRR and Hits@{1,3,10}."""
    return ranks.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.lit(1.0) / F.col("rank")), 6).alias("mrr"),
        F.round(F.avg((F.col("rank") <= 1).cast("double")), 6).alias("hits1"),
        F.round(F.avg((F.col("rank") <= 3).cast("double")), 6).alias("hits3"),
        F.round(F.avg((F.col("rank") <= 10).cast("double")), 6).alias("hits10"),
    )

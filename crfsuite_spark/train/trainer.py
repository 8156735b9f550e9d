"""Distributed CRF training: Spark featurization + gradient jobs,
driver-side L-BFGS.

Mirrors the reference's training lifecycle (SURVEY.md §3.1,
src/crf/src/train_lbfgs.c:217-341) re-architected for Spark:

1. feature generation A1 (crf1d_feature.c:155-257) = one groupBy
   aggregation with a HAVING minfreq filter — Catalyst does the
   partial/final hash agg;
2. featurization to int ids (quark.c interning → broadcast dict) via a
   streaming mapInPandas pass (whole sequences, Arrow-batched);
3. per-L-BFGS-iteration gradient = one Spark job over the *cached*
   featurized sequences: mapInPandas accumulates ONE (loss, gradient)
   partial per PARTITION with the batched numpy kernel; at small
   partition counts the driver sums them in partition-id order
   (deterministic float summation), above ``tree_reduce_threshold``
   they are tree-reduced executor-side so the driver receives a single
   vector regardless of cluster width;
4. L2 regularization + L-BFGS update on the driver
   (train_lbfgs.c:98-106; kernel/lbfgs.py).

Scale notes: the training corpus for a tagger is a bounded sample even
at a 10^12-turn table (you train on ~10^5-10^6 labelled sequences, then
decode everything); the decode path (decode/tagger.py) is the
unbounded one. A dense gradient partial is an n_params float64 vector
(~80 MB at the ~10^6-attribute ceiling); above 4M parameters the
trainer automatically switches to CSR (idx, val) partials bounded by
each partition's OBSERVED features (``sparse_gradient=``, bit-identical
to the dense path), and driver memory stays bounded by
min(n_partitions, tree_reduce_threshold) partials either way.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crfsuite_spark.kernel import crf
from crfsuite_spark.kernel.lbfgs import minimize_lbfgs
from crfsuite_spark.operators.sequences import group_bounds, iter_sequence_frames
from crfsuite_spark.train.model import CRFModel

FEATURIZED_SCHEMA = (
    "seq_id string, labels array<int>, aids array<int>, offsets array<int>"
)
FEATURIZED_SCHEMA_EMB = FEATURIZED_SCHEMA + ", embs array<double>"


def generate_state_features(
    df: DataFrame, attrs_col: str = "attrs", label_col: str = "label", minfreq: float = 1.0
) -> pd.DataFrame:
    """A1: (attribute, label) distinct + freq + HAVING minfreq
    (crf1d_feature.c:155-257, minfreq filter at 128-133)."""
    out = (
        df.select(F.explode(attrs_col).alias("attribute"), F.col(label_col).alias("label"))
        .groupBy("attribute", "label")
        .agg(F.count(F.lit(1)).cast("double").alias("freq"))
        .where(F.col("freq") >= F.lit(minfreq))
    )
    return out.toPandas()


def generate_transition_features(
    df: DataFrame,
    seq_cols: list[str],
    order_col: str,
    label_col: str = "label",
    minfreq: float = 1.0,
) -> pd.DataFrame:
    """A1 transition half: observed adjacent (prev, cur) label pairs with
    freq ≥ minfreq (crf1d_feature.c:167-178 emits one transition feature
    per adjacent pair; minfreq filter at 139-144). The reference's
    DEFAULT model class trains only these observed pairs — the dense
    L×L matrix is the ``feature.possible_transitions=1`` option
    (crf1d_feature.c:238-248, crf1d_encode.c:791-795)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*seq_cols).orderBy(order_col)
    pairs = (
        df.select(
            F.lag(label_col).over(w).alias("prev"),
            F.col(label_col).alias("cur"),
        )
        .where(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).cast("double").alias("freq"))
        .where(F.col("freq") >= F.lit(minfreq))
    )
    return pairs.toPandas()


def build_dicts(state_feats: pd.DataFrame, labels_df: pd.DataFrame | list[str]):
    """Deterministic string→id interning (quark.c analogue, sorted order)."""
    if isinstance(labels_df, list):
        labels = sorted(labels_df)
    else:
        labels = sorted(labels_df["label"].unique().tolist())
    attrs = sorted(state_feats["attribute"].unique().tolist())
    return labels, attrs


def transition_mask(
    tokens: DataFrame,
    seq_cols: list[str],
    order_col: str,
    label2id: dict[str, int],
    label_col: str = "label",
    minfreq: float = 1.0,
    possible_transitions: bool = False,
) -> "np.ndarray":
    """[L, L] float mask of EXISTING transition features: 1 for observed
    adjacent label pairs (freq ≥ minfreq), dense 1s when
    ``possible_transitions``. The reference generates transition
    features once in the shared crf1de encoder for every trainer
    (crf1d_encode.c:875-890) — updates to non-features are impossible,
    which this mask mirrors for the online trainers."""
    L = len(label2id)
    if possible_transitions:
        return np.ones((L, L), dtype=np.float64)
    pairs = generate_transition_features(
        tokens, seq_cols, order_col, label_col, minfreq
    )
    m = np.zeros((L, L), dtype=np.float64)
    for r in pairs.itertuples():
        if r.prev in label2id and r.cur in label2id:
            m[label2id[r.prev], label2id[r.cur]] = 1.0
    return m


# auto partition sizing for the L-BFGS eval loop (train_crf): at
# least this many sequences per partition before fanning out wider —
# below it, per-task fixed costs exceed the gradient math
_SEQS_PER_EVAL_PARTITION = 1024


def featurize_sequences(
    df: DataFrame,
    attr2id: dict[str, int] | None,
    label2id: dict[str, int],
    seq_cols: list[str],
    order_col: str,
    attrs_col: str = "attrs",
    label_col: str = "label",
    num_partitions: int | None = None,
    embeddings_col: str | None = None,
    attr_lookup: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """Token rows → one row per sequence with int-id arrays.

    Unknown attributes are dropped (aid<0 skip, crfsuite.hpp:403-410).
    Output: (seq_id, labels array<int>, aids flat array<int>,
    offsets array<int> of length T+1 into aids[, embs: the per-token
    real-valued attribute vectors flattened per sequence —
    R/modelling.R:131-139]).

    Attribute interning, two modes:

    - ``attr2id`` dict (default): a broadcast Python dict — fine for
      minfreq-pruned dictionaries (the reference's observed-feature
      default keeps these bounded).
    - ``attr_lookup=(sorted_h, slot_aid)``: attribute strings are
      hashed to int64 JVM-side (``xxhash64``) BEFORE the shuffle, and
      executors resolve them by binary search on a broadcast sorted
      hash array — the same CQDB-analogue decode uses
      (model.attr_hash_table). The broadcast is 16 bytes/attr numpy
      instead of a Python string dict, and no attribute string ever
      crosses the Python boundary; used by the ``possible_states``
      full-dictionary path where A can reach 10^6.
    """
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    if attr_lookup is not None:
        lookup_bc = spark.sparkContext.broadcast(
            ("hash", np.ascontiguousarray(attr_lookup[0]),
             np.ascontiguousarray(attr_lookup[1]))
        )
    else:
        lookup_bc = spark.sparkContext.broadcast(("dict", attr2id, None))
    l2i_bc = spark.sparkContext.broadcast(label2id)
    keep = [*seq_cols, order_col, attrs_col] + ([label_col] if label_col else [])
    if embeddings_col:
        keep.append(embeddings_col)

    def fe(batches):
        mode, lk_a, lk_b = lookup_bc.value
        a2i = lk_a if mode == "dict" else None
        sh, sa = (lk_a, lk_b) if mode == "hash" else (None, None)
        l2i = l2i_bc.value
        for pdf in iter_sequence_frames(batches, seq_cols):
            bounds = group_bounds(pdf, seq_cols)
            rows = {"seq_id": [], "labels": [], "aids": [], "offsets": []}
            if embeddings_col:
                rows["embs"] = []
                emb_all = pdf[embeddings_col].to_numpy()
            attrs_all = pdf[attrs_col].to_numpy()
            labels_all = (
                pdf[label_col].map(l2i).to_numpy() if label_col else np.zeros(len(pdf))
            )
            for s, e in zip(bounds[:-1], bounds[1:]):
                aids, offsets = [], [0]
                for t in range(s, e):
                    if mode == "dict":
                        aids.extend(
                            a2i[a] for a in attrs_all[t] if a in a2i
                        )
                    else:
                        hs = np.asarray(attrs_all[t], dtype=np.int64)
                        if len(hs) and len(sh):
                            pos = np.minimum(
                                np.searchsorted(sh, hs), len(sh) - 1
                            )
                            known = sh[pos] == hs
                            aids.extend(sa[pos[known]].tolist())
                    offsets.append(len(aids))
                rows["seq_id"].append(
                    "\x00".join(str(pdf.iloc[s][k]) for k in seq_cols)
                )
                rows["labels"].append(labels_all[s:e].astype(np.int32).tolist())
                rows["aids"].append(aids)
                rows["offsets"].append(offsets)
                if embeddings_col:
                    rows["embs"].append(
                        np.concatenate([np.asarray(v, dtype=np.float64) for v in emb_all[s:e]]).tolist()
                    )
            yield pd.DataFrame(rows)

    proj = list(keep)
    if attr_lookup is not None:
        # hash the attribute strings JVM-side BEFORE the shuffle: the
        # exchange and the Arrow hop move fixed-width int64 arrays
        # (same trick as decode/tagger.py)
        proj[proj.index(attrs_col)] = F.expr(
            f"transform(`{attrs_col}`, a -> xxhash64(a))"
        ).alias(attrs_col)
    ordered = (
        df.select(*proj)
        .repartition(n_part, *seq_cols)
        .sortWithinPartitions(*seq_cols, order_col)
    )
    schema = FEATURIZED_SCHEMA_EMB if embeddings_col else FEATURIZED_SCHEMA
    return ordered.mapInPandas(fe, schema)


def _pack_batch(pdf: pd.DataFrame, emb_dim: int = 0):
    """Concatenate a batch of sequence rows into flat numpy arrays."""
    lengths = pdf["labels"].map(len).to_numpy(dtype=np.int64)
    labels = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["labels"]])
    aids = (
        np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["aids"]])
        if len(pdf)
        else np.zeros(0, dtype=np.int64)
    )
    # per-token attr counts → global offsets
    counts = np.concatenate(
        [np.diff(np.asarray(o, dtype=np.int64)) for o in pdf["offsets"]]
    )
    tok_offsets = np.concatenate([[0], np.cumsum(counts)])
    embs = None
    if emb_dim:
        embs = np.concatenate(
            [np.asarray(x, dtype=np.float64) for x in pdf["embs"]]
        ).reshape(-1, emb_dim)
    return lengths, labels, aids, tok_offsets, embs


def batch_objective(
    lengths: np.ndarray,
    labels: np.ndarray,
    aids: np.ndarray,
    tok_offsets: np.ndarray,
    embs: np.ndarray | None,
    state_w: np.ndarray,
    trans_w: np.ndarray,
    emb_w: np.ndarray | None = None,
    sparse_state: bool = False,
) -> tuple[float, object, np.ndarray, np.ndarray | None]:
    """NLL loss + gradients for one packed batch of sequences.

    Returns (loss, g_state [A, L], g_trans [L, L], g_emb [D, L] | None)
    where gradient = model expectation − observed counts
    (crf1d_encode.c:318-424, 893-945), all computed with the batched
    log-space kernel. ``embs [N, D]`` are the real-valued attributes
    (reference embeddings, rcpp_crfsuite.cpp:91-99): score contribution
    E @ emb_w, gradient Eᵀ(p − onehot(gold)).

    ``sparse_state``: return the state gradient as ``(uniq_aids [U],
    g_local [U, L])`` — only attributes OBSERVED in this batch carry a
    nonzero gradient, so at the ~10^6-attribute ceiling this avoids a
    dense [A, L] allocation per batch (the CSR switch promised in the
    module docstring). Accumulation order per (attr, label) cell is the
    occurrence order of ``aids``, identical to the dense ``np.add.at``
    path, so results are bit-identical.
    """
    A, L = state_w.shape
    B = len(lengths)
    N = int(lengths.sum())
    # token index for every attribute occurrence
    attr_counts = np.diff(tok_offsets)
    tok_of_aid = np.repeat(np.arange(N), attr_counts)
    # K1 state scores per token [N, L]
    S = np.zeros((N, L), dtype=np.float64)
    if len(aids):
        np.add.at(S, tok_of_aid, state_w[aids])
    if embs is not None and emb_w is not None:
        S += embs @ emb_w
    # pad to [B, T_max, L]
    T_max = int(lengths.max())
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    seq_of_tok = np.repeat(np.arange(B), lengths)
    pos_in_seq = np.arange(N) - starts[seq_of_tok]
    state = np.full((B, T_max, L), 0.0, dtype=np.float64)
    state[seq_of_tok, pos_in_seq] = S
    # forward-backward marginals (K4-K6)
    p_state, p_trans, log_norm = crf.marginals_batch(state, trans_w, lengths)
    # gold path score (K7)
    gold_state = S[np.arange(N), labels].sum()
    adj = seq_of_tok[1:] == seq_of_tok[:-1] if N > 1 else np.zeros(0, dtype=bool)
    prev_l, next_l = labels[:-1][adj], labels[1:][adj]
    gold_trans = trans_w[prev_l, next_l].sum() if adj.any() else 0.0
    loss = float(log_norm.sum() - gold_state - gold_trans)
    # gradient: state
    p_flat = p_state[seq_of_tok, pos_in_seq]  # [N, L]
    if sparse_state:
        uniq, inv = (
            np.unique(aids, return_inverse=True)
            if len(aids)
            else (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
        )
        g_local = np.zeros((len(uniq), L), dtype=np.float64)
        if len(aids):
            np.add.at(g_local, inv, p_flat[tok_of_aid])  # model expectation (A4)
            np.add.at(
                g_local.reshape(-1), inv * L + labels[tok_of_aid], -1.0
            )  # observed (A3)
        g_state = (uniq, g_local)
    else:
        g_state = np.zeros((A, L), dtype=np.float64)
        if len(aids):
            np.add.at(g_state, aids, p_flat[tok_of_aid])  # model expectation (A4)
            np.add.at(
                g_state.reshape(-1), aids * L + labels[tok_of_aid], -1.0
            )  # observed (A3)
    g_emb = None
    if embs is not None and emb_w is not None:
        m = p_flat.copy()
        m[np.arange(N), labels] -= 1.0  # model expectation − observed
        g_emb = embs.T @ m
    # gradient: transitions
    g_trans = p_trans.copy()
    if adj.any():
        np.add.at(g_trans.reshape(-1), prev_l * L + next_l, -1.0)
    return loss, g_state, g_trans, g_emb


EPOCH_PARTIAL_SCHEMA = "pid int, n long, loss double, w binary"


def _merge_epoch_partials(a, b):
    """Merge two (n, loss, arrays) epoch partials: counts and losses
    sum; the weight arrays are PRE-SCALED by n_partition/n_total on the
    executors, so the parameter-mixing weighted average is a plain
    elementwise sum — associative, hence tree-reducible. ``None``
    entries (e.g. the PA trainers' absent covariance slots) stay None."""
    n_a, l_a, arrs_a = a
    n_b, l_b, arrs_b = b
    merged = tuple(
        None if x is None else x + y for x, y in zip(arrs_a, arrs_b)
    )
    return (n_a + n_b, l_a + l_b, merged)


def reduce_epoch_partials(
    partials_df, n_partitions_hint: int, tree_reduce_threshold: int = 64
):
    """Sum the online trainers' per-partition epoch payloads
    (EPOCH_PARTIAL_SCHEMA rows; ``w`` pickles a tuple of numpy arrays
    already scaled by n/n_total).

    Below ``tree_reduce_threshold`` partitions: collect and sum in
    partition-id order — the same deterministic float-summation order
    the historical driver-side mixing used, so results are
    bit-identical to it. Above: treeReduce the payloads executor-side,
    so the driver receives exactly ONE payload regardless of cluster
    width — the same bound the batch trainer's gradient reduce has.
    (At 10^6 attrs × 9 labels a dense payload is ~72 MB; collecting one
    per partition per epoch would ship tens of GB to the driver on a
    real cluster.) Returns (n, loss, arrays) or None if every
    partition was empty."""
    if n_partitions_hint > tree_reduce_threshold:
        try:
            return partials_df.rdd.map(
                lambda r: (r["n"], r["loss"], pickle.loads(r["w"]))
            ).treeReduce(_merge_epoch_partials, depth=2)
        except ValueError:
            return None  # empty RDD: no partition yielded a payload
    parts = sorted(partials_df.collect(), key=lambda r: r["pid"])
    if not parts:
        return None
    acc = None
    for r in parts:
        cur = (r["n"], r["loss"], pickle.loads(r["w"]))
        acc = cur if acc is None else _merge_epoch_partials(acc, cur)
    return acc


def _merge_sparse_partials(a, b):
    """Merge two sparse (loss, idx, val, tail) gradient partials.

    Per shared index the addition order is a-then-b, the same order the
    dense treeReduce's elementwise ``a + b`` uses — bit-identical."""
    loss_a, ia, va, ta = a
    loss_b, ib, vb, tb = b
    idx = np.concatenate([ia, ib])
    val = np.concatenate([va, vb])
    uidx, inv = np.unique(idx, return_inverse=True)
    sval = np.zeros(len(uidx), dtype=np.float64)
    np.add.at(sval, inv, val)
    return (loss_a + loss_b, uidx, sval, ta + tb)


def train_crf(
    tokens: DataFrame,
    seq_cols: list[str],
    order_col: str,
    attrs_col: str = "attrs",
    label_col: str = "label",
    minfreq: float = 1.0,
    c1: float = 0.0,
    c2: float = 1.0,
    max_iterations: int = 100,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    log: list | None = None,
    embeddings_col: str | None = None,
    possible_states: bool = False,
    possible_transitions: bool = False,
    tree_reduce_threshold: int = 64,
    linesearch: str = "morethuente",
    epsilon: float = 1e-5,
    num_memories: int = 6,
    period: int = 10,
    delta: float = 1e-5,
    max_linesearch: int = 20,
    sparse_gradient: bool | None = None,
    holdout_df: DataFrame | None = None,
    materialize_attrs: bool = True,
) -> CRFModel:
    """Train a linear-chain CRF (method=lbfgs, the reference default).

    ``tokens``: one row per token with attrs_col array<string> and
    label_col gold BIO label. One Spark job per L-BFGS evaluation.
    ``embeddings_col``: optional array<double> column of per-token
    real-valued attributes (the reference's embeddings matrix,
    R/modelling.R:16,131-139). ``c1`` > 0 adds L1 regularization via
    OWL-QN exactly like the reference (train_lbfgs.c:289-291 sets
    orthantwise_c = c1 and forces backtracking line search).

    ``possible_states`` / ``possible_transitions`` mirror the
    reference's ``feature.possible_states`` / ``feature.possible_transitions``
    (crf1d_encode.c:791-795, densify at crf1d_feature.c:217-248): by
    DEFAULT only OBSERVED (attribute, label) state features and observed
    adjacent (prev, cur) transition features become trainable parameters
    — an absent feature scores 0, exactly like the C engine. Setting
    either flag densifies that family to the full grid (all attributes ×
    labels / all label pairs), including attributes whose observed
    features were minfreq-pruned, matching the C densify loops which
    iterate the full dictionaries. With ``possible_states`` the
    attribute dictionary is built distributedly (sorted zipWithIndex
    ids; executors intern via a broadcast sorted-xxhash64 table) — no
    attribute string reaches the driver during training; strings are
    pulled once at model assembly, or never when
    ``materialize_attrs=False`` (the returned model then decodes via
    its pre-seeded hash table but cannot ``save()``).

    ``sparse_gradient``: ship gradient partials as (index, value) CSR
    pairs over only the attributes each partition actually OBSERVED,
    instead of a dense n_params vector — bit-identical results (tested),
    but partial size scales with per-partition distinct features, not
    with the parameter count. ``None`` (default) auto-enables above
    4M parameters (a dense partial would be ≥32 MB; at the 10^6-attribute
    possible_states ceiling, ~80 MB × hundreds of partitions).

    ``holdout_df``: optional held-out token frame (same shape as
    ``tokens``); when given, EVERY L-BFGS iteration decodes it with the
    current weights and appends the per-label + overall P/R/F1 to the
    iteration log under ``"holdout"`` — the reference's per-iteration
    holdout report (src/crf/src/holdout.c:44-81, wired into the L-BFGS
    progress callback at train_lbfgs.c:150-153). Costs one distributed
    decode job per iteration, exactly like the reference costs one
    tagging pass per iteration.
    """
    spark = tokens.sparkSession
    label_values = [
        r[0] for r in tokens.select(label_col).distinct().collect()
    ]
    attr_ids_df = None
    attr_lookup = None
    if possible_states:
        # densify over the FULL attribute dictionary (crf1d_feature.c:217-225
        # iterates every interned attribute, not just minfreq survivors);
        # the per-(attr, label) frequency aggregation is unused here.
        #
        # The dictionary is built DISTRIBUTEDLY: distinct → global sort →
        # zipWithIndex assigns exactly the sorted ranks a driver-side sort
        # would, but no attribute STRING reaches the driver during
        # training — the driver pulls only the (xxhash64, id) int table
        # (16 bytes/attr, ~16 MB at the 10^6-attribute ceiling) and
        # broadcasts it as sorted numpy arrays, the same CQDB-analogue
        # lookup decode uses (model.attr_hash_table). Strings are
        # materialized ONCE at model assembly (the artifact interns them,
        # like the reference's CQDB chunks) — or never, with
        # ``materialize_attrs=False``.
        distinct_attrs = tokens.select(F.explode(attrs_col).alias("a")).distinct()
        attr_ids_df = spark.createDataFrame(
            distinct_attrs.orderBy("a").rdd.zipWithIndex().map(
                lambda t: (t[0][0], int(t[1]))
            ),
            "a string, aid long",
        ).persist()
        hp = attr_ids_df.select(F.xxhash64("a").alias("h"), "aid").toPandas()
        h = hp["h"].to_numpy(np.int64)
        aid_arr = hp["aid"].to_numpy(np.int64)
        order = np.argsort(h, kind="stable")
        sorted_h, slot_aid = h[order], aid_arr[order]
        if len(sorted_h) > 1 and (sorted_h[1:] == sorted_h[:-1]).any():
            raise ValueError("xxhash64 collision among attributes")
        attr_lookup = (sorted_h, slot_aid)
        attrs = None  # materialized lazily by _final_attrs()
        A = len(sorted_h)
        labels = sorted(set(label_values))
    else:
        state_feats = generate_state_features(tokens, attrs_col, label_col, minfreq)
        labels, attrs = build_dicts(state_feats, label_values)
        A = len(attrs)
    label2id = {l: i for i, l in enumerate(labels)}
    attr2id = {a: i for i, a in enumerate(attrs)} if attrs is not None else None
    L = len(labels)

    def _final_attrs() -> list[str]:
        """Attribute strings for the model artifact. In possible_states
        mode this is the ONLY driver-side string materialization (one
        Arrow pull in id order, the size of the model's own dictionary);
        materialize_attrs=False skips even that and returns [] — the
        model then decodes via its pre-seeded hash table but cannot
        save()/coefficients()."""
        nonlocal attrs
        if attrs is None:
            attrs = (
                attr_ids_df.orderBy("aid").select("a").toPandas()["a"].tolist()
                if materialize_attrs
                else []
            )
        return attrs

    # parameter layout: [K state feats] + [D*L embeddings] + [Kt transitions]
    if possible_states:
        # dense grid: the layout is the identity — represented as None so
        # no A*L index array is materialized or broadcast (~80 MB at the
        # 10^6-attribute ceiling)
        sf_flat = None
    else:
        sf_flat = np.sort(
            state_feats["attribute"].map(attr2id).to_numpy() * L
            + state_feats["label"].map(label2id).to_numpy()
        )
    if possible_transitions:
        tf_flat = np.arange(L * L, dtype=np.int64)
    else:
        trans_feats = generate_transition_features(
            tokens, seq_cols, order_col, label_col, minfreq
        )
        tf_flat = (
            np.sort(
                trans_feats["prev"].map(label2id).to_numpy() * L
                + trans_feats["cur"].map(label2id).to_numpy()
            )
            if len(trans_feats)
            else np.zeros(0, dtype=np.int64)
        )
    K = A * L if sf_flat is None else len(sf_flat)
    Kt = len(tf_flat)
    D = 0
    if embeddings_col:
        D = int(tokens.select(F.size(embeddings_col)).first()[0])

    featurized = featurize_sequences(
        tokens, attr2id, label2id, seq_cols, order_col, attrs_col, label_col,
        num_partitions, embeddings_col=embeddings_col,
        attr_lookup=attr_lookup,
    ).persist()
    n_seq = featurized.count()  # materialize the cache

    sc = spark.sparkContext
    if num_partitions is None:
        # right-size the eval partitioning to the data: L-BFGS runs
        # ~1-2 jobs per iteration over this cached frame, so at small
        # corpus sizes per-task fixed costs (scheduling, Python worker
        # round-trip, broadcast fetch) dominate a 4k-token partition —
        # the same file-size≈task-size discipline as
        # spark.sql.files.maxPartitionBytes, applied to the iteration
        # loop. ≥1024 sequences per partition, capped at the session's
        # parallelism; big corpora are unaffected (reference protocol,
        # 16k sequences / 25 iterations: 30.0 s → ~21 s at local[32]).
        opt = max(1, min(sc.defaultParallelism, -(-n_seq // _SEQS_PER_EVAL_PARTITION)))
        if opt < featurized.rdd.getNumPartitions():
            packed = featurized.coalesce(opt).persist()
            packed.count()  # cache-to-cache repack of tiny id arrays
            featurized.unpersist()
            featurized = packed
    dims_bc = sc.broadcast((A, L, D, sf_flat, tf_flat))
    n_params = K + D * L + Kt
    if sparse_gradient is None:
        sparse_gradient = n_params > 4_000_000
    # above tree_reduce_threshold partials, sum them in a shuffle tree
    # instead of shipping all to the driver (each partial is n_params
    # float64 — ~80 MB at the 10^6-attribute ceiling; hundreds of them
    # OOM a driver). With sparse_gradient the partials are (idx, val)
    # pairs bounded by per-partition observed features instead.

    def fun_grad(w: np.ndarray) -> tuple[float, np.ndarray]:
        w_bc = sc.broadcast(w)

        def grad_partials(batches):
            """ONE (loss, grad) partial per PARTITION: accumulate across
            Arrow batches inside the iterator so driver/tree traffic is
            bounded by the partition count, never the batch count."""
            A_, L_, D_, sf, tf = dims_bc.value
            wv = w_bc.value
            if sf is None:
                # dense grid (possible_states): identity layout, skip the
                # scatter copy
                state_w = wv[:K].reshape(A_, L_)
            else:
                state_w = np.zeros(A_ * L_, dtype=np.float64)
                state_w[sf] = wv[:K]
                state_w = state_w.reshape(A_, L_)
            emb_w = wv[K:K + D_ * L_].reshape(D_, L_) if D_ else None
            trans_w = np.zeros(L_ * L_, dtype=np.float64)
            trans_w[tf] = wv[K + D_ * L_:]
            trans_w = trans_w.reshape(L_, L_)
            total = 0.0
            seen = False
            if sparse_gradient:
                sidx_parts: list = []
                sval_parts: list = []
                tail = np.zeros(D_ * L_ + Kt, dtype=np.float64)
            else:
                acc = np.zeros(n_params, dtype=np.float64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                seen = True
                packed = _pack_batch(pdf, emb_dim=D_)
                loss, g_state, g_trans, g_emb = batch_objective(
                    *packed, state_w, trans_w, emb_w,
                    sparse_state=sparse_gradient,
                )
                total += loss
                if sparse_gradient:
                    uniq, g_local = g_state
                    flat = (uniq[:, None] * L_ + np.arange(L_)).ravel()
                    vals = g_local.ravel()
                    if sf is not None:
                        # map dense-grid flat ids onto the observed-feature
                        # parameter layout; drop non-feature cells exactly
                        # like the dense path's acc[:K] += g[sf] gather
                        if K:
                            pos = np.minimum(np.searchsorted(sf, flat), K - 1)
                            valid = sf[pos] == flat
                            flat, vals = pos[valid], vals[valid]
                        else:
                            # degenerate K=0 (every observed state feature
                            # minfreq-pruned): no state parameters exist, so
                            # every entry drops — mirrors the dense path's
                            # empty acc[:K] gather
                            flat, vals = flat[:0], vals[:0]
                    nz = vals != 0.0  # dropping exact zeros is float-exact
                    sidx_parts.append(flat[nz])
                    sval_parts.append(vals[nz])
                    if D_:
                        tail[:D_ * L_] += g_emb.reshape(-1)
                    tail[D_ * L_:] += g_trans.reshape(-1)[tf]
                else:
                    acc[:K] += (
                        g_state.reshape(-1) if sf is None
                        else g_state.reshape(-1)[sf]
                    )
                    if D_:
                        acc[K:K + D_ * L_] += g_emb.reshape(-1)
                    acc[K + D_ * L_:] += g_trans.reshape(-1)[tf]
            if seen:
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
                if sparse_gradient:
                    cidx = np.concatenate(sidx_parts) if sidx_parts else np.zeros(0, np.int64)
                    cval = np.concatenate(sval_parts) if sval_parts else np.zeros(0)
                    # per-index addition order == batch order == the dense
                    # path's += order, so the aggregate is bit-identical
                    uidx, inv = np.unique(cidx, return_inverse=True)
                    sval = np.zeros(len(uidx), dtype=np.float64)
                    np.add.at(sval, inv, cval)
                    payload = pickle.dumps((uidx, sval, tail))
                else:
                    payload = pickle.dumps(acc)
                yield pd.DataFrame(
                    {"pid": [pid], "loss": [total], "grad": [payload]}
                )

        partials_df = featurized.mapInPandas(
            grad_partials, "pid int, loss double, grad binary"
        )
        n_part_hint = featurized.rdd.getNumPartitions()
        if n_part_hint > tree_reduce_threshold:
            # cluster scale: tree-sum the partials executor-side; the
            # driver receives exactly one (loss, grad)
            if sparse_gradient:
                loss, uidx, sval, tail = partials_df.rdd.map(
                    lambda r: (r["loss"], *pickle.loads(r["grad"]))
                ).treeReduce(_merge_sparse_partials, depth=2)
                grad = np.zeros(n_params, dtype=np.float64)
                grad[uidx] = sval
                grad[n_params - len(tail):] += tail
            else:
                loss, grad = partials_df.rdd.map(
                    lambda r: (r["loss"], pickle.loads(r["grad"]))
                ).treeReduce(lambda a, b: (a[0] + b[0], a[1] + b[1]), depth=2)
                grad = grad.copy()
        else:
            # small partition counts: collect and sum in partition-id
            # order — deterministic float summation, so repeated runs on
            # the same partitioning are bit-identical
            parts = sorted(partials_df.collect(), key=lambda r: r["pid"])
            loss = 0.0
            grad = np.zeros(n_params, dtype=np.float64)
            for r in parts:
                loss += r["loss"]
                if sparse_gradient:
                    uidx, sval, tail = pickle.loads(r["grad"])
                    np.add.at(grad, uidx, sval)
                    grad[n_params - len(tail):] += tail
                else:
                    grad += pickle.loads(r["grad"])
        w_bc.destroy()
        # L2 (train_lbfgs.c:98-106)
        if c2 > 0:
            loss += c2 * float(w @ w)
            grad += 2.0 * c2 * w
        return loss, grad

    iter_log: list[dict] = log if log is not None else []

    def _model_from(wvec: np.ndarray) -> CRFModel:
        sw = np.zeros(A * L, dtype=np.float64)
        if sf_flat is None:
            sw[:] = wvec[:K]
        else:
            sw[sf_flat] = wvec[:K]
        tw = np.zeros(L * L, dtype=np.float64)
        tw[tf_flat] = wvec[K + D * L:]
        m = CRFModel(
            labels=labels, attrs=_final_attrs(),
            state_w=sw.reshape(A, L), trans_w=tw.reshape(L, L),
            emb_names=[f"{embeddings_col}[{j}]" for j in range(D)],
            emb_w=wvec[K:K + D * L].reshape(D, L) if D else None,
        )
        if attr_lookup is not None and not m.attrs:
            # materialize_attrs=False: seed the decode hash table so the
            # model tags without ever interning strings driver-side
            m._attr_hash_cache = {"string": attr_lookup}
        return m

    def cb(it, w, f, gnorm):
        entry = {"iter": it, "loss": f, "gnorm": gnorm}
        if holdout_df is not None:
            # the reference's per-iteration holdout report (holdout.c:44-81
            # via the progress callback train_lbfgs.c:150-153): one
            # distributed decode + P/R/F1 of the fold per iteration
            from crfsuite_spark.train.options import holdout_log_entry_from_model

            entry["holdout"] = holdout_log_entry_from_model(
                _model_from(w), holdout_df, seq_cols, order_col,
                label_col=label_col, attrs_col=attrs_col,
            )
        iter_log.append(entry)
        if checkpoint_dir:
            np.save(f"{checkpoint_dir}/w_iter{it:04d}.npy", w)

    res = minimize_lbfgs(
        fun_grad, np.zeros(n_params), max_iterations=max_iterations, callback=cb,
        l1_c=c1, linesearch=linesearch, epsilon=epsilon,
        num_memories=num_memories, period=period, delta=delta,
        max_linesearch=max_linesearch,
    )
    featurized.unpersist()

    final_attrs = _final_attrs()
    if attr_ids_df is not None:
        attr_ids_df.unpersist()
    state_w = np.zeros(A * L, dtype=np.float64)
    if sf_flat is None:
        state_w[:] = res.x[:K]
    else:
        state_w[sf_flat] = res.x[:K]
    trans_w = np.zeros(L * L, dtype=np.float64)
    trans_w[tf_flat] = res.x[K + D * L:]
    model = CRFModel(
        labels=labels,
        attrs=final_attrs,
        state_w=state_w.reshape(A, L),
        trans_w=trans_w.reshape(L, L),
        emb_names=[f"{embeddings_col}[{j}]" for j in range(D)],
        emb_w=res.x[K:K + D * L].reshape(D, L) if D else None,
        meta={
            "n_sequences": int(n_seq),
            "n_attributes": int(A),
            "n_state_features": int(K),
            "n_transition_features": int(Kt),
            "n_iterations": res.n_iter,
            "final_loss": float(res.fun),
            "converged": bool(res.converged),
            "c1": c1,
            "c2": c2,
            "minfreq": minfreq,
            "possible_states": possible_states,
            "possible_transitions": possible_transitions,
        },
    )
    if attr_lookup is not None and not final_attrs:
        model._attr_hash_cache = {"string": attr_lookup}
    return model

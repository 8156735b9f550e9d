"""Pegasos-style L2-regularized SGD trainer (reference T2,
src/crf/src/train_l2sgd.c).

Objective (train_l2sgd.c:46-50): f(w) = (λ/2)‖w‖² + Σᵢ −log P(yᵢ|xᵢ),
λ = 2C/N. Per sequence (train_l2sgd.c:186-200):

    η = 1/(λ(t₀+t));  decay *= (1−ηλ);  gain = η/decay
    w_stored[k] -= gain · g[k]        (g = model exp − observed)
    at epoch end: w = decay · w_stored (the O(active) decay trick the
    reference documents at train_l2sgd.c:69-78)

Stopping: improvement ratio of the epoch loss over a ``period`` ring
buffer < epsilon (train_l2sgd.c:229-260); best-epoch weights kept.
Calibration (train_l2sgd.c:289-380): pick η₀ by trying a geometric
ladder of rates on a ≤1000-sequence sample and keeping the largest
rate that decreases the sample loss; t₀ = 1/(λη₀).

Distribution: the reference shuffles and walks sequences strictly
sequentially; here each epoch runs the exact sequential loop per
partition from the broadcast mixed weights and the driver averages
partition results weighted by sequence count (iterative parameter
mixing — same harness as train/perceptron.py). One partition
degenerates to the reference algorithm with a fixed shuffle order.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from crfsuite_spark.kernel import crf
from crfsuite_spark.train.model import CRFModel
from crfsuite_spark.train.trainer import (
    EPOCH_PARTIAL_SCHEMA,
    _pack_batch,
    build_dicts,
    featurize_sequences,
    generate_state_features,
    reduce_epoch_partials,
)


def _seq_iter(pdf):
    lengths, labels, aids, tok_offsets, _ = _pack_batch(pdf)
    tok = 0
    for T in lengths:
        T = int(T)
        aid_lists = [
            aids[tok_offsets[tok + t]: tok_offsets[tok + t + 1]] for t in range(T)
        ]
        yield aid_lists, labels[tok: tok + T]
        tok += T


def _sgd_step(aid_lists, gold, w_state, w_trans, gain, decay, trans_mask=None):
    """One per-sequence gradient step on the decay-scaled weights.

    The true weights are decay * w_stored; state scores must therefore
    be computed with the decayed weights (gm->set_weights(gm, w, decay)
    at train_l2sgd.c:194)."""
    T = len(gold)
    L = w_state.shape[1]
    state = crf.state_scores(aid_lists, w_state) * decay
    p_state, p_trans, log_norm = crf.marginals(state, w_trans * decay)
    # loss (unscaled by λ-term; accumulated by caller)
    gs = float(state[np.arange(T), gold].sum())
    if T > 1:
        gs += float((w_trans * decay)[gold[:-1], gold[1:]].sum())
    loss = log_norm - gs
    # state gradient: model expectation − observed, applied sparsely
    for t in range(T):
        ids = aid_lists[t]
        if len(ids):
            w_state[ids, :] -= gain * p_state[t]
            w_state[ids, gold[t]] += gain
    # transition gradient — BOTH terms restricted to EXISTING transition
    # features (observed-only default; trainer.transition_mask). With
    # minfreq > 1 a gold pair seen fewer times than the threshold is NOT
    # a feature, so its empirical term must be masked too or the weight
    # grows one-sidedly.
    if trans_mask is not None:
        w_trans -= gain * p_trans * trans_mask
        if T > 1:
            idx = gold[:-1] * L + gold[1:]
            np.add.at(
                w_trans.reshape(-1), idx, gain * trans_mask.reshape(-1)[idx]
            )
    else:
        w_trans -= gain * p_trans
        if T > 1:
            np.add.at(
                w_trans.reshape(-1), gold[:-1] * L + gold[1:], gain
            )
    return loss


def _epoch_pass(pdf_iter, w_state, w_trans, lam, t0, t_start, trans_mask=None):
    """Sequential SGD over a partition. Returns (n, sum_loss, t)."""
    decay = 1.0
    t = t_start
    n = 0
    sum_loss = 0.0
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        for aid_lists, gold in _seq_iter(pdf):
            eta = 1.0 / (lam * (t0 + t))
            decay *= (1.0 - eta * lam)
            gain = eta / decay
            sum_loss += _sgd_step(aid_lists, gold, w_state, w_trans, gain,
                                  decay, trans_mask)
            t += 1
            n += 1
    w_state *= decay
    w_trans *= decay
    return n, sum_loss, t


def train_l2sgd(
    tokens: DataFrame,
    seq_cols: list[str],
    order_col: str,
    attrs_col: str = "attrs",
    label_col: str = "label",
    minfreq: float = 1.0,
    c2: float = 1.0,
    max_iterations: int = 20,
    period: int = 10,
    epsilon: float = 1e-4,
    calibration_samples: int = 500,
    num_partitions: int | None = None,
    log: list | None = None,
    possible_transitions: bool = False,
    holdout_df: DataFrame | None = None,
    tree_reduce_threshold: int = 64,
) -> CRFModel:
    """Distributed l2sgd via iterative parameter mixing.

    ``holdout_df``: when given, every epoch decodes the fold with the
    mixed weights and logs per-label P/R/F1 (reference per-iteration
    holdout report, holdout.c:44-81).

    Epoch mixing rides :func:`reduce_epoch_partials`: frac-scaled
    partials, partition-id-ordered sum below ``tree_reduce_threshold``
    partitions (bit-identical to driver-side mixing), executor-side
    treeReduce above it — ONE payload to the driver per epoch
    regardless of cluster width."""
    from crfsuite_spark.train.trainer import transition_mask

    spark = tokens.sparkSession
    sc = spark.sparkContext
    state_feats = generate_state_features(tokens, attrs_col, label_col, minfreq)
    label_values = [r[0] for r in tokens.select(label_col).distinct().collect()]
    labels, attrs = build_dicts(state_feats, label_values)
    label2id = {l: i for i, l in enumerate(labels)}
    attr2id = {a: i for i, a in enumerate(attrs)}
    A, L = len(attrs), len(labels)
    tmask = transition_mask(
        tokens, seq_cols, order_col, label2id, label_col, minfreq,
        possible_transitions,
    )

    featurized = featurize_sequences(
        tokens, attr2id, label2id, seq_cols, order_col, attrs_col, label_col,
        num_partitions,
    ).persist()
    n_seq = featurized.count()
    lam = 2.0 * c2 / max(n_seq, 1)

    # --- calibration: geometric eta ladder on a driver sample
    # (train_l2sgd.c:289-380 simplified: keep the largest rate that
    # lowers the one-pass sample loss) ---
    sample = featurized.limit(min(calibration_samples, n_seq)).toPandas()
    best_eta, best_loss = None, np.inf
    for eta0 in (1.0, 0.5, 0.1, 0.05, 0.01):
        ws = np.zeros((A, L))
        wt = np.zeros((L, L))
        t0_c = 1.0 / (lam * eta0)
        _, loss, _ = _epoch_pass([sample], ws, wt, lam, t0_c, 0, tmask)
        if np.isfinite(loss) and loss < best_loss:
            best_loss, best_eta = loss, eta0
    eta0 = best_eta or 0.1
    t0 = 1.0 / (lam * eta0)

    w_state = np.zeros((A, L))
    w_trans = np.zeros((L, L))
    best = (np.inf, w_state, w_trans)
    pf: list[float] = []
    iter_log: list[dict] = log if log is not None else []
    t_global = 0

    for epoch in range(1, max_iterations + 1):
        w_bc = sc.broadcast((w_state, w_trans, t_global, tmask))

        def run(batches):
            ws, wt, t_start, tm = w_bc.value
            ws, wt = ws.copy(), wt.copy()
            n, loss, t_end = _epoch_pass(batches, ws, wt, lam, t0, t_start, tm)
            if n == 0:
                return
            from pyspark import TaskContext

            frac = n / n_seq  # epoch total is always n_seq
            yield pd.DataFrame({
                "pid": [TaskContext.get().partitionId()],
                "n": [n], "loss": [loss],
                "w": [pickle.dumps((frac * ws, frac * wt))],
            })

        red = reduce_epoch_partials(
            featurized.mapInPandas(run, EPOCH_PARTIAL_SCHEMA),
            featurized.rdd.getNumPartitions(), tree_reduce_threshold,
        )
        if red is None:
            break
        total, sum_loss, (w_state, w_trans) = red
        t_global += total
        # objective incl. L2 term (train_l2sgd.c:215-218)
        norm2 = float((w_state * w_state).sum() + (w_trans * w_trans).sum())
        sum_loss += 0.5 * lam * norm2 * n_seq
        if sum_loss < best[0]:
            best = (sum_loss, w_state.copy(), w_trans.copy())
        improvement = (
            (pf[-period] - sum_loss) / abs(sum_loss) if len(pf) >= period else epsilon
        )
        pf.append(sum_loss)
        entry = {"epoch": epoch, "loss": float(sum_loss),
                 "eta0": eta0, "improvement": float(improvement)}
        if holdout_df is not None:
            from crfsuite_spark.train.options import holdout_log_entry

            entry["holdout"] = holdout_log_entry(
                labels, attrs, w_state, w_trans, holdout_df,
                seq_cols, order_col, label_col, attrs_col,
            )
        iter_log.append(entry)
        w_bc.destroy()
        if improvement < epsilon:
            break

    featurized.unpersist()
    _, w_state, w_trans = best
    return CRFModel(
        labels=labels, attrs=attrs, state_w=w_state, trans_w=w_trans,
        meta={"method": "l2sgd", "n_sequences": int(n_seq),
              "n_iterations": len(iter_log), "eta0": eta0, "c2": c2,
              "final_loss": iter_log[-1]["loss"] if iter_log else None},
    )

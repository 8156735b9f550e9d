"""Passive-Aggressive (T4) and AROW (T5) online trainers.

Reference update rules, per sequence (Viterbi with current weights,
update only on mistakes, delta = φ(gold) − φ(pred)):

- PA (src/crf/src/train_passive_aggressive.c:186-205, loop 317-389):
  cost = (score(pred) − score(gold)) + 1        [error-insensitive]
       = (score(pred) − score(gold)) + sqrt(d)  [error-sensitive]
  τ: PA   cost/‖δ‖²
     PA-I min(c, cost/‖δ‖²)
     PA-II cost/(‖δ‖² + 1/(2c))
  w += τ·δ, optional running average like the perceptron.
- AROW (src/crf/src/train_arow.c:320-383):
  cost = score(pred) − score(gold) + d
  α = cost / (γ + Σ_k δ_k²·cov_k)
  mean_k += α·cov_k·δ_k;   cov_k = 1/(1/cov_k + δ_k²/γ), cov init
  = ``variance`` (default 1).

Distribution: the same iterative-parameter-mixing harness as the
averaged perceptron (train/perceptron.py) — per epoch each partition
runs the exact sequential loop from the broadcast mixed weights, the
driver averages partition results weighted by sequence count. One
partition degenerates to the reference algorithm.
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


def _path_delta(aid_lists, gold, pred, L, trans_mask=None):
    """Sparse feature delta φ(gold) − φ(pred) for one sequence.

    Keys: ("s", aid, label) state features and ("t", l1, l2)
    transitions; mirrors the features_on_path double walk
    (train_passive_aggressive.c:357-371). ``trans_mask``: transitions
    that are not generated features (observed-only default) contribute
    no delta — exactly as the reference's feature walk, which can only
    visit ids that exist."""
    delta: dict = {}
    T = len(gold)
    for t in range(T):
        g, p = int(gold[t]), int(pred[t])
        if g != p:
            for a in aid_lists[t]:
                ks, kp = ("s", int(a), g), ("s", int(a), p)
                delta[ks] = delta.get(ks, 0.0) + 1.0
                delta[kp] = delta.get(kp, 0.0) - 1.0
        if t > 0:
            pg, pp = int(gold[t - 1]), int(pred[t - 1])
            tg = ("t", pg, g)
            tp = ("t", pp, p)
            if tg != tp:
                if trans_mask is None or trans_mask[pg, g]:
                    delta[tg] = delta.get(tg, 0.0) + 1.0
                if trans_mask is None or trans_mask[pp, p]:
                    delta[tp] = delta.get(tp, 0.0) - 1.0
    return {k: v for k, v in delta.items() if v != 0.0}


def _apply(delta, coef, w_state, w_trans, cov_state=None, cov_trans=None):
    for k, v in delta.items():
        if k[0] == "s":
            scale = cov_state[k[1], k[2]] if cov_state is not None else 1.0
            w_state[k[1], k[2]] += coef * scale * v
        else:
            scale = cov_trans[k[1], k[2]] if cov_trans is not None else 1.0
            w_trans[k[1], k[2]] += coef * scale * v


def _partition_pass_online(
    pdf, w_state, w_trans, method, c, gamma, error_sensitive,
    cov_state=None, cov_trans=None, trans_mask=None,
):
    """Sequential PA/AROW pass over one partition. Returns (n, loss)."""
    lengths, labels, aids, tok_offsets, _ = _pack_batch(pdf)
    loss = 0.0
    tok = 0
    for T in lengths:
        T = int(T)
        aid_lists = [
            aids[tok_offsets[tok + t]: tok_offsets[tok + t + 1]] for t in range(T)
        ]
        state = crf.state_scores(aid_lists, w_state)
        path, sv = crf.viterbi(state, w_trans)
        gold = labels[tok: tok + T]
        d = int((path != gold).sum())
        if d:
            sc = crf.path_score(state, w_trans, gold)
            delta = _path_delta(aid_lists, gold, path, w_state.shape[1], trans_mask)
            if method == "arow":
                cost = sv - sc + d  # train_arow.c:336
                frac = gamma
                for k, v in delta.items():
                    cv = (cov_state if k[0] == "s" else cov_trans)[k[1], k[2]]
                    frac += v * v * cv
                alpha = cost / frac
                _apply(delta, alpha, w_state, w_trans, cov_state, cov_trans)
                for k, v in delta.items():
                    cov = cov_state if k[0] == "s" else cov_trans
                    cov[k[1], k[2]] = 1.0 / (1.0 / cov[k[1], k[2]] + v * v / gamma)
            else:
                err = sv - sc
                cost = err + (np.sqrt(d) if error_sensitive else 1.0)
                norm2 = sum(v * v for v in delta.values())
                if norm2 == 0.0:
                    # mispredicted but zero feature delta (e.g. all
                    # attributes minfreq-pruned): no direction to move in —
                    # skip the update instead of dividing by zero
                    loss += cost
                    tok += T
                    continue
                if method == "pa":
                    tau = cost / norm2
                elif method == "pa1":
                    tau = min(c, cost / norm2)
                else:  # pa2
                    tau = cost / (norm2 + 0.5 / c)
                _apply(delta, tau, w_state, w_trans)
            loss += cost
        tok += T
    return len(lengths), loss


def train_online(
    tokens: DataFrame,
    seq_cols: list[str],
    order_col: str,
    method: str = "pa1",  # pa | pa1 | pa2 | arow
    attrs_col: str = "attrs",
    label_col: str = "label",
    minfreq: float = 1.0,
    c: float = 1.0,
    gamma: float = 1.0,
    variance: float = 1.0,
    error_sensitive: bool = True,
    max_iterations: int = 10,
    epsilon: float = 0.0,
    num_partitions: int | None = None,
    log: list | None = None,
    possible_transitions: bool = False,
    holdout_df: DataFrame | None = None,
    tree_reduce_threshold: int = 64,
) -> CRFModel:
    """Distributed PA / AROW via iterative parameter mixing.

    ``holdout_df``: when given, every epoch decodes the fold with the
    mixed weights and logs per-label P/R/F1 (reference per-iteration
    holdout report, holdout.c:44-81).

    Epoch mixing rides :func:`reduce_epoch_partials`: partials (weights
    + AROW covariance) are frac-scaled executor-side, summed in
    partition-id order below ``tree_reduce_threshold`` partitions
    (bit-identical to driver-side mixing) and tree-reduced
    executor-side above it — ONE payload to the driver per epoch
    regardless of cluster width."""
    from crfsuite_spark.train.trainer import transition_mask

    assert method in ("pa", "pa1", "pa2", "arow"), method
    spark = tokens.sparkSession
    sc_ = spark.sparkContext
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

    w_state = np.zeros((A, L), dtype=np.float64)
    w_trans = np.zeros((L, L), dtype=np.float64)
    # AROW confidence (diagonal covariance), init = variance
    # (train_arow.c exchange_options)
    cov_state = np.full((A, L), variance) if method == "arow" else None
    cov_trans = np.full((L, L), variance) if method == "arow" else None
    iter_log: list[dict] = log if log is not None else []

    for it in range(max_iterations):
        payload = (w_state, w_trans, cov_state, cov_trans, tmask)
        w_bc = sc_.broadcast(payload)

        def epoch(batches):
            ws, wt, cs, ct, tm = w_bc.value
            ws, wt = ws.copy(), wt.copy()
            cs = cs.copy() if cs is not None else None
            ct = ct.copy() if ct is not None else None
            n, loss = 0, 0.0
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                dn, dloss = _partition_pass_online(
                    pdf, ws, wt, method, c, gamma, error_sensitive, cs, ct,
                    trans_mask=tm,
                )
                n += dn
                loss += dloss
            if n == 0:
                return
            from pyspark import TaskContext

            # frac-scale so the mixing average is an associative sum
            # (epoch total is always n_seq: every cached sequence is
            # processed exactly once per epoch)
            frac = n / n_seq
            yield pd.DataFrame({
                "pid": [TaskContext.get().partitionId()],
                "n": [n], "loss": [loss],
                "w": [pickle.dumps((
                    frac * ws, frac * wt,
                    frac * cs if cs is not None else None,
                    frac * ct if ct is not None else None,
                ))],
            })

        red = reduce_epoch_partials(
            featurized.mapInPandas(epoch, EPOCH_PARTIAL_SCHEMA),
            featurized.rdd.getNumPartitions(), tree_reduce_threshold,
        )
        if red is None:
            break
        total, loss, (w_state, w_trans, mix_cs, mix_ct) = red
        if method == "arow":
            cov_state, cov_trans = mix_cs, mix_ct
        ratio = loss / total if total else 0.0
        entry = {"iter": it, "loss": float(loss), "mean_cost": ratio}
        if holdout_df is not None:
            from crfsuite_spark.train.options import holdout_log_entry

            entry["holdout"] = holdout_log_entry(
                labels, attrs, w_state, w_trans, holdout_df,
                seq_cols, order_col, label_col, attrs_col,
            )
        iter_log.append(entry)
        w_bc.destroy()
        if ratio <= epsilon:
            break

    featurized.unpersist()
    return CRFModel(
        labels=labels, attrs=attrs, state_w=w_state, trans_w=w_trans,
        meta={"method": method, "n_sequences": int(n_seq),
              "n_iterations": len(iter_log),
              "final_mean_cost": iter_log[-1]["mean_cost"] if iter_log else None},
    )

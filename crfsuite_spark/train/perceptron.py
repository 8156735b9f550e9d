"""Averaged structured perceptron trainer (reference T3,
src/crf/src/train_averaged_perceptron.c:106-245).

Per-sequence update rule (train_averaged_perceptron.c:175-201): Viterbi-
decode with current weights; on a mistake add φ(gold) − φ(pred); keep a
running average ``wa = w − ws/c`` (203-205); stop when the training
error ratio drops below epsilon.

The reference is single-threaded and strictly sequential in the
sequence order. A faithful-but-distributed re-architecture uses
**iterative parameter mixing** (McDonald, Hall & Mann, NAACL 2010 — a
published, public algorithm): each epoch, every partition runs the
exact reference update loop over its own (cached, featurized)
sequences starting from the broadcast mixed weights, then the driver
averages the per-partition results weighted by sequence count. With a
fixed partitioning this is deterministic run-to-run; with one
partition it degenerates to the reference algorithm exactly.
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


def _partition_pass(pdf: pd.DataFrame, w_state, w_trans, avg_state, avg_trans,
                    counter, trans_mask=None):
    """One sequential perceptron pass over a partition's sequences.

    Mirrors train_averaged_perceptron.c:175-205: per sequence, Viterbi
    with current weights; on error update w by (gold − pred) feature
    deltas; the averaged weights accumulate c-weighted updates so
    ``avg = w − ws/c`` holds without storing every intermediate w.
    Returns (n_seq, label-ratio loss, counter).
    """
    lengths, labels, aids, tok_offsets, _ = _pack_batch(pdf)
    loss = 0.0
    tok = 0  # global token cursor
    for b, T in enumerate(lengths):
        T = int(T)
        aid_lists = [
            aids[tok_offsets[tok + t]: tok_offsets[tok + t + 1]] for t in range(T)
        ]
        state = crf.state_scores(aid_lists, w_state)
        path, _ = crf.viterbi(state, w_trans)
        gold = labels[tok: tok + T]
        d = int((path != gold).sum())
        if d:
            # loss = ratio of wrongly predicted labels
            # (train_averaged_perceptron.c:196-198)
            loss += d / T
            for t in range(T):
                g, p = int(gold[t]), int(path[t])
                if g != p:
                    ids = aid_lists[t]
                    w_state[ids, g] += 1.0
                    w_state[ids, p] -= 1.0
                    avg_state[ids, g] += counter
                    avg_state[ids, p] -= counter
                if t > 0:
                    pg, pp = int(gold[t - 1]), int(path[t - 1])
                    if (pg, g) != (pp, p):
                        # updates land only on EXISTING transition
                        # features (observed-only default; see
                        # trainer.transition_mask)
                        if trans_mask is None or trans_mask[pg, g]:
                            w_trans[pg, g] += 1.0
                            avg_trans[pg, g] += counter
                        if trans_mask is None or trans_mask[pp, p]:
                            w_trans[pp, p] -= 1.0
                            avg_trans[pp, p] -= counter
        counter += 1
        tok += T
    return len(lengths), loss, counter


def train_perceptron(
    tokens: DataFrame,
    seq_cols: list[str],
    order_col: str,
    attrs_col: str = "attrs",
    label_col: str = "label",
    minfreq: float = 1.0,
    max_iterations: int = 10,
    epsilon: float = 0.0,
    num_partitions: int | None = None,
    log: list | None = None,
    possible_transitions: bool = False,
    holdout_df: DataFrame | None = None,
    tree_reduce_threshold: int = 64,
) -> CRFModel:
    """Distributed averaged perceptron via iterative parameter mixing.

    ``holdout_df``: when given, every epoch decodes the fold with the
    AVERAGED weights and logs per-label P/R/F1 (reference per-iteration
    holdout report, holdout.c:44-81).

    Epoch mixing rides :func:`reduce_epoch_partials`: partials are
    frac-scaled executor-side (the weighted average becomes an
    associative sum), summed in partition-id order below
    ``tree_reduce_threshold`` partitions (bit-identical to driver-side
    mixing) and tree-reduced executor-side above it, so the driver
    receives ONE weight payload per epoch regardless of cluster
    width."""
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

    w_state = np.zeros((A, L), dtype=np.float64)
    w_trans = np.zeros((L, L), dtype=np.float64)
    # pre-bind the averaged weights so max_iterations=0 (or an empty first
    # epoch) falls back to zeros instead of UnboundLocalError in the
    # for/else assignment below
    aw_state = np.zeros((A, L), dtype=np.float64)
    aw_trans = np.zeros((L, L), dtype=np.float64)
    iter_log: list[dict] = log if log is not None else []

    for it in range(max_iterations):
        w_bc = sc.broadcast((w_state, w_trans, tmask))

        def epoch(batches):
            ws, wt, tm = w_bc.value
            ws = ws.copy()
            wt = wt.copy()
            avg_s = np.zeros_like(ws)
            avg_t = np.zeros_like(wt)
            counter = 1
            n, loss = 0, 0.0
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                dn, dloss, counter = _partition_pass(
                    pdf, ws, wt, avg_s, avg_t, counter, trans_mask=tm
                )
                n += dn
                loss += dloss
            if n == 0:
                return
            # averaged weights for this partition: w − ws_acc/c
            c = counter
            aw_s = ws - avg_s / c
            aw_t = wt - avg_t / c
            # parameter mixing (McDonald et al. 2010): pre-scale by this
            # partition's sequence fraction so the weighted average is an
            # associative elementwise sum (every cached sequence is
            # processed each epoch, so the epoch total is always n_seq)
            from pyspark import TaskContext

            frac = n / n_seq
            yield pd.DataFrame({
                "pid": [TaskContext.get().partitionId()],
                "n": [n], "loss": [loss],
                "w": [pickle.dumps(
                    (frac * ws, frac * wt, frac * aw_s, frac * aw_t)
                )],
            })

        red = reduce_epoch_partials(
            featurized.mapInPandas(epoch, EPOCH_PARTIAL_SCHEMA),
            featurized.rdd.getNumPartitions(), tree_reduce_threshold,
        )
        if red is None:
            break
        total, loss, (w_state, w_trans, aw_state, aw_trans) = red
        # convergence: loss/N < epsilon (train_averaged_perceptron.c:221)
        ratio = loss / total if total else 0.0
        entry = {"iter": it, "loss": float(loss), "error_ratio": ratio}
        if holdout_df is not None:
            from crfsuite_spark.train.options import holdout_log_entry

            entry["holdout"] = holdout_log_entry(
                labels, attrs, aw_state, aw_trans, holdout_df,
                seq_cols, order_col, label_col, attrs_col,
            )
        iter_log.append(entry)
        w_bc.destroy()
        if ratio <= epsilon:
            w_state, w_trans = aw_state, aw_trans
            break
    else:
        w_state, w_trans = aw_state, aw_trans

    featurized.unpersist()
    return CRFModel(
        labels=labels, attrs=attrs, state_w=w_state, trans_w=w_trans,
        meta={
            "method": "averaged-perceptron",
            "n_sequences": int(n_seq),
            "n_iterations": len(iter_log),
            "final_error_ratio": iter_log[-1]["error_ratio"] if iter_log else None,
        },
    )

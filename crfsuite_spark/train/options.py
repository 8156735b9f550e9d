"""Hyperparameter registry + holdout evaluation + grid tuning.

Re-expresses three reference facilities:

- **T8 parameter registry** (src/crf/src/params.c; surfaced as
  ``crf_options`` at R/modelling.R:348-362 and
  ``crfsuite_model_parameters`` at src/rcpp_crfsuite.cpp:13-34): typed
  options with defaults and help strings, per training method. Defaults
  below are the reference's (train_lbfgs.c:161-209,
  train_averaged_perceptron.c exchange_options, train_l2sgd.c).
- **T6 holdout evaluation** (src/crf/src/holdout.c:44-81, wired at
  train_lbfgs.c:150-153): decode a held-out fold and log per-label
  P/R/F1.
- **T7 grid tuning** (``crf_caretmethod``, R/modelling.R:389-477;
  corpus inst/crftuning/crftuning.R:34-61): fit a model per grid point,
  score on a validation fold, return the metric table.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Option:
    name: str
    default: object
    type: str
    help: str


# crf1de encoder options shared by every trainer
# (crf1d_encode.c:789-795 exchange_options)
FEATURE_OPTIONS = [
    Option("feature.minfreq", 0.0, "float", "minimum frequency of features"),
    Option("feature.possible_states", False, "bool",
           "densify state features to all attribute × label pairs"),
    Option("feature.possible_transitions", False, "bool",
           "densify transition features to all label × label pairs"),
]

# reference defaults: train_lbfgs.c:161-209
LBFGS_OPTIONS = FEATURE_OPTIONS + [
    Option("c1", 0.0, "float", "L1 regularization coefficient (OWL-QN when > 0)"),
    Option("c2", 1.0, "float", "L2 regularization coefficient"),
    Option("max_iterations", 2147483647, "int", "maximum L-BFGS iterations"),
    Option("num_memories", 6, "int", "L-BFGS correction pairs"),
    Option("epsilon", 1e-5, "float", "convergence tolerance on ||g||/||w||"),
    Option("period", 10, "int", "iterations to test stopping criterion"),
    Option("delta", 1e-5, "float", "minimum loss improvement over period"),
    Option("linesearch", "MoreThuente", "string", "line search method"),
    Option("max_linesearch", 20, "int", "maximum line search trials"),
]

# train_l2sgd.c exchange_options (c2=1, max_iterations=1000, period=10,
# delta=1e-6, calibration.* block)
L2SGD_OPTIONS = FEATURE_OPTIONS + [
    Option("c2", 1.0, "float", "L2 regularization coefficient"),
    Option("max_iterations", 1000, "int", "maximum SGD epochs"),
    Option("period", 10, "int", "epochs over which to test improvement"),
    Option("delta", 1e-6, "float", "minimum loss improvement over period"),
    Option("calibration.eta", 0.1, "float", "initial learning-rate candidate"),
    Option("calibration.rate", 2.0, "float", "eta multiplier between trials"),
    Option("calibration.samples", 1000, "int", "sequences used to calibrate eta"),
    Option("calibration.candidates", 10, "int", "number of eta candidates to accept"),
    Option("calibration.max_trials", 20, "int", "maximum eta trials"),
]

# train_averaged_perceptron.c exchange_options
AP_OPTIONS = FEATURE_OPTIONS + [
    Option("max_iterations", 100, "int", "maximum epochs"),
    Option("epsilon", 0.0, "float", "stop when label-error ratio < epsilon"),
]

# train_passive_aggressive.c exchange_options (type 0/1/2 = PA, PA-I, PA-II)
PA_OPTIONS = FEATURE_OPTIONS + [
    Option("type", 1, "int", "PA variant: 0=PA, 1=PA-I, 2=PA-II"),
    Option("c", 1.0, "float", "aggressiveness parameter"),
    Option("error_sensitive", True, "bool", "cost includes sqrt(#wrong labels)"),
    Option("averaging", True, "bool", "average weights over updates"),
    Option("max_iterations", 100, "int", "maximum epochs"),
    Option("epsilon", 0.0, "float", "stop when error ratio < epsilon"),
]

# train_arow.c exchange_options
AROW_OPTIONS = FEATURE_OPTIONS + [
    Option("variance", 1.0, "float", "initial variance of every parameter"),
    Option("gamma", 1.0, "float", "tradeoff between loss and confidence update"),
    Option("max_iterations", 100, "int", "maximum epochs"),
    Option("epsilon", 0.0, "float", "stop when error ratio < epsilon"),
]

METHODS = {
    "lbfgs": LBFGS_OPTIONS,
    "l2sgd": L2SGD_OPTIONS,
    "averaged-perceptron": AP_OPTIONS,
    "passive-aggressive": PA_OPTIONS,
    "arow": AROW_OPTIONS,
}


def crf_options(method: str = "lbfgs") -> list[Option]:
    """T8: the tunable options of a training method with defaults/help
    (crf_options analogue, R/modelling.R:348-362)."""
    if method not in METHODS:
        raise ValueError(f"unknown method {method!r}; have {sorted(METHODS)}")
    return list(METHODS[method])


def holdout_split(
    df: DataFrame, group_col: str, k: int = 5, fold: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Deterministic group-hash holdout split (dataset.c:44-86 splits by
    group id; we hash so folds are balanced regardless of id shape).
    Returns (train_df, holdout_df)."""
    bucket = F.pmod(F.xxhash64(F.col(group_col)), F.lit(k))
    return df.where(bucket != fold), df.where(bucket == fold)


def holdout_evaluation(
    model,
    holdout_df: DataFrame,
    seq_cols: list[str],
    order_col: str,
    label_col: str = "label",
    attrs_col: str = "attrs",
) -> dict:
    """T6: decode the holdout fold with ``model`` and compute the
    reference's per-label + overall P/R/F1 (holdout.c:44-81 →
    crfsuite.c:398-455 finalize)."""
    from crfsuite_spark.decode.tagger import decode
    from crfsuite_spark.operators.evaluate import crf_evaluation

    pred = decode(
        holdout_df.withColumnRenamed(label_col, "label_gold"),
        model, seq_cols=seq_cols, order_col=order_col, attrs_col=attrs_col,
        with_marginal=False,
        passthrough_cols=[*seq_cols, order_col, "label_gold"],
    )
    return crf_evaluation(pred, gold_col="label_gold", pred_col="label")


def holdout_log_entry_from_model(
    model,
    holdout_df: DataFrame,
    seq_cols: list[str],
    order_col: str,
    label_col: str = "label",
    attrs_col: str = "attrs",
) -> dict:
    """JSON-able per-iteration holdout record (the reference evaluates
    the holdout fold after EVERY iteration for every trainer —
    holdout.c:44-81 via each trainer's progress hook): decode the fold
    with the interim model, return parsed per-label + overall P/R/F1.
    The single source of the log-record shape for all four trainers."""
    ev = holdout_evaluation(
        model, holdout_df, seq_cols, order_col,
        label_col=label_col, attrs_col=attrs_col,
    )
    return {"overall": ev["overall"], "bylabel": ev["bylabel"].to_dict("records")}


def holdout_log_entry(
    labels,
    attrs,
    state_w,
    trans_w,
    holdout_df: DataFrame,
    seq_cols: list[str],
    order_col: str,
    label_col: str = "label",
    attrs_col: str = "attrs",
) -> dict:
    """Weight-matrix convenience wrapper over
    :func:`holdout_log_entry_from_model` (used by the online trainers,
    which carry raw state/transition matrices mid-epoch)."""
    from crfsuite_spark.train.model import CRFModel

    return holdout_log_entry_from_model(
        CRFModel(labels=labels, attrs=attrs, state_w=state_w, trans_w=trans_w),
        holdout_df, seq_cols, order_col,
        label_col=label_col, attrs_col=attrs_col,
    )


def tune_crf(
    tokens: DataFrame,
    seq_cols: list[str],
    order_col: str,
    grid: dict[str, list],
    group_col: str | None = None,
    k: int = 5,
    fold: int = 0,
    metric: str = "f1_weighted",
    **fixed,
) -> list[dict]:
    """T7 grid tuning: one (train, holdout-evaluate) per grid point.

    ``grid`` maps train_crf kwargs (c2, minfreq, max_iterations, ...) to
    candidate values; returns one dict per combination with the holdout
    overall metrics, sorted best-first by ``metric``.
    """
    from crfsuite_spark.train.trainer import train_crf

    group_col = group_col or seq_cols[0]
    train_df, holdout_df = holdout_split(tokens, group_col, k=k, fold=fold)
    results = []
    keys = sorted(grid)
    for combo in itertools.product(*(grid[k_] for k_ in keys)):
        params = dict(zip(keys, combo))
        model = train_crf(
            train_df, seq_cols=seq_cols, order_col=order_col, **params, **fixed
        )
        ev = holdout_evaluation(model, holdout_df, seq_cols, order_col)
        results.append({**params, **ev["overall"], "model": model})
    results.sort(key=lambda r: -(r.get(metric) or 0.0))
    return results

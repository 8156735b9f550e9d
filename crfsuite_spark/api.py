"""User-facing facade mirroring the reference's R API surface.

``crf()`` ↔ R/modelling.R:107-152 (train with a string-keyed options
dict exactly like ``crf(..., options = list("feature.minfreq" = 5))``),
``predict_crf()`` ↔ R/modelling.R:278-311 (``type='marginal'`` returns
the token-aligned viterbi frame, ``type='sequence'`` the per-sequence
probability frame). A user of the reference package can switch by
replacing the data.frame with a token DataFrame and naming the sequence
key columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crfsuite_spark.train.model import CRFModel
from crfsuite_spark.train.options import crf_options

# reference option string -> trainer kwarg
_COMMON = {
    "feature.minfreq": "minfreq",
    "feature.possible_transitions": "possible_transitions",
    "max_iterations": "max_iterations",
}
_RENAMES = {
    "lbfgs": {
        **_COMMON,
        "c1": "c1",
        "c2": "c2",
        "linesearch": "linesearch",
        "feature.possible_states": "possible_states",
        "epsilon": "epsilon",
        "num_memories": "num_memories",
        "period": "period",
        "delta": "delta",
        "max_linesearch": "max_linesearch",
    },
    # reference 'delta' (min improvement over period, train_l2sgd.c) is
    # this implementation's epsilon parameter
    "l2sgd": {**_COMMON, "c2": "c2", "period": "period", "delta": "epsilon",
              "calibration.samples": "calibration_samples"},
    "averaged-perceptron": {**_COMMON, "epsilon": "epsilon"},
    "passive-aggressive": {**_COMMON, "c": "c", "epsilon": "epsilon",
                           "error_sensitive": "error_sensitive"},
    "arow": {**_COMMON, "variance": "variance", "gamma": "gamma",
             "epsilon": "epsilon"},
}


def crf(
    tokens: DataFrame,
    seq_cols: list[str],
    order_col: str,
    method: str = "lbfgs",
    options: dict | None = None,
    attrs_col: str = "attrs",
    label_col: str = "label",
    embeddings_col: str | None = None,
    num_partitions: int | None = None,
    log: list | None = None,
) -> CRFModel:
    """Train a CRF with reference-style string options.

    ``method`` ∈ {lbfgs, l2sgd, averaged-perceptron, passive-aggressive,
    arow} (crfsuite_train.c:225-283 trainer ids); ``options`` uses the
    registry names from :func:`crf_options` — unknown keys raise, like
    the reference's parameter interface (params.c get/set)."""
    method = {"pa": "passive-aggressive", "ap": "averaged-perceptron"}.get(method, method)
    registry = {o.name: o for o in crf_options(method)}
    options = dict(options or {})
    unknown = set(options) - set(registry)
    if unknown:
        raise ValueError(f"unknown option(s) for {method}: {sorted(unknown)}")
    rename = _RENAMES[method]
    # seed from the registry's reference defaults so an unsupplied option
    # behaves as documented (e.g. l2sgd delta=1e-6, calibration.samples=1000)
    # instead of silently falling back to the Python trainers' own defaults
    kw = {rename[k]: registry[k].default for k in rename if k in registry}
    kw.update({rename[k]: v for k, v in options.items() if k in rename})
    # registry-listed options with no knob in this implementation
    # ('type' is consumed below for PA): accept the default value as a
    # no-op, reject anything else — a silently ignored setting is worse
    # than an error
    for k, v in options.items():
        if k in rename or (method == "passive-aggressive" and k == "type"):
            continue
        if v != registry[k].default:
            raise NotImplementedError(
                f"option {k!r} is fixed at {registry[k].default!r} in this "
                f"implementation (got {v!r})"
            )
    if "linesearch" in kw:
        # reference spells these MoreThuente / Backtracking (params.c)
        kw["linesearch"] = str(kw["linesearch"]).lower()
    base = dict(
        seq_cols=seq_cols, order_col=order_col, attrs_col=attrs_col,
        label_col=label_col, num_partitions=num_partitions, log=log,
    )
    if method == "lbfgs":
        from crfsuite_spark.train.trainer import train_crf

        return train_crf(tokens, embeddings_col=embeddings_col, **base, **kw)
    if embeddings_col:
        raise ValueError("embeddings are only supported with method='lbfgs'")
    if method == "l2sgd":
        from crfsuite_spark.train.l2sgd import train_l2sgd

        return train_l2sgd(tokens, **base, **kw)
    if method == "averaged-perceptron":
        from crfsuite_spark.train.perceptron import train_perceptron

        return train_perceptron(tokens, **base, **kw)
    if method == "passive-aggressive":
        pa_type = int(options.get("type", 1))
        from crfsuite_spark.train.online import train_online

        return train_online(
            tokens, method={0: "pa", 1: "pa1", 2: "pa2"}[pa_type], **base, **kw
        )
    if method == "arow":
        from crfsuite_spark.train.online import train_online

        return train_online(tokens, method="arow", **base, **kw)
    raise ValueError(f"unknown method {method!r}")


def predict_crf(
    model: CRFModel,
    newdata: DataFrame,
    seq_cols: list[str],
    order_col: str,
    type: str = "marginal",
    attrs_col: str = "attrs",
    embeddings_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Viterbi-tag ``newdata`` like ``predict.crf`` (R/modelling.R:278-311).

    ``type='marginal'``: token-aligned frame with ``label`` + its
    per-position ``marginal`` (the reference's viterbi data.frame);
    ``type='sequence'``: one row per sequence with the whole-path
    ``probability`` (the reference's sequence data.frame)."""
    from crfsuite_spark.decode.tagger import decode

    if type not in ("marginal", "sequence"):
        raise ValueError("type must be 'marginal' or 'sequence'")
    out = decode(
        newdata, model, seq_cols=seq_cols, order_col=order_col,
        attrs_col=attrs_col, with_marginal=True,
        num_partitions=num_partitions, embeddings_col=embeddings_col,
    )
    if type == "sequence":
        return (
            out.groupBy(*seq_cols)
            .agg(F.first("seq_prob").alias("probability"))
        )
    return out

"""Evaluation aggregates: confusion matrix, per-label P/R/F1, triple-set
parity — the metric contract for the P/R ≥ 0.95 gate.

Mirrors the reference's two evaluation layers:
- C engine token-level accumulation (crfsuite_evaluation_accmulate /
  _finalize, src/crf/src/crfsuite.c:369-455): confusion counts →
  precision = correct/predicted, recall = correct/gold, F1 harmonic,
  macro average, item & instance accuracy;
- R one-vs-rest ``crf_evaluation`` (R/evaluation.R:85-123): per-label
  2x2 collapse; overall = support-WEIGHTED mean and unweighted mean
  over ``labels_overall`` (default: all labels except 'O').

All heavy lifting is one groupBy(gold, pred).count() crosstab — a
single shuffle regardless of table size; the per-label arithmetic runs
on the tiny aggregate driver-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion(df: DataFrame, gold_col: str, pred_col: str) -> DataFrame:
    """A6 confusion counts: (gold, pred, n)."""
    return (
        df.groupBy(F.col(gold_col).alias("gold"), F.col(pred_col).alias("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def crf_evaluation(
    df: DataFrame,
    gold_col: str = "label_gold",
    pred_col: str = "label_pred",
    labels_overall: list[str] | None = None,
    exclude: tuple[str, ...] = ("O",),
) -> dict:
    """Per-label + overall P/R/F1 following R/evaluation.R:85-123.

    Returns {"bylabel": pandas DF, "overall": dict}.
    """
    conf = confusion(df, gold_col, pred_col).toPandas()
    labels = sorted(set(conf["gold"]) | set(conf["pred"]))
    rows = []
    for lab in labels:
        tp = conf[(conf["gold"] == lab) & (conf["pred"] == lab)]["n"].sum()
        n_pred = conf[conf["pred"] == lab]["n"].sum()
        n_gold = conf[conf["gold"] == lab]["n"].sum()
        precision = tp / n_pred if n_pred else 0.0
        recall = tp / n_gold if n_gold else 0.0
        f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
        rows.append({
            "label": lab, "precision": precision, "recall": recall,
            "f1": f1, "support": int(n_gold),
        })
    bylabel = pd.DataFrame(rows)
    if labels_overall is None:
        labels_overall = [l for l in labels if l not in exclude]
    sub = bylabel[bylabel["label"].isin(labels_overall)]
    wsum = sub["support"].sum()
    overall = {
        "precision_weighted": float((sub["precision"] * sub["support"]).sum() / wsum) if wsum else 0.0,
        "recall_weighted": float((sub["recall"] * sub["support"]).sum() / wsum) if wsum else 0.0,
        "f1_weighted": float((sub["f1"] * sub["support"]).sum() / wsum) if wsum else 0.0,
        "precision_mean": float(sub["precision"].mean()) if len(sub) else 0.0,
        "recall_mean": float(sub["recall"].mean()) if len(sub) else 0.0,
        "f1_mean": float(sub["f1"].mean()) if len(sub) else 0.0,
        "accuracy": None,
    }
    total = conf["n"].sum()
    correct = conf[conf["gold"] == conf["pred"]]["n"].sum()
    overall["accuracy"] = float(correct / total) if total else 0.0
    return {"bylabel": bylabel, "overall": overall}


def set_prf(pred: DataFrame, gold: DataFrame, keys: list[str]) -> dict:
    """Set-level precision/recall/F1 over distinct key tuples (used for
    entity-mention spans and for (subj, pred, obj) triples)."""
    p = pred.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    n_pred = p.count()
    n_gold = g.count()
    n_both = p.join(g, keys, "inner").count()
    precision = n_both / n_pred if n_pred else 0.0
    recall = n_both / n_gold if n_gold else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision, "recall": recall, "f1": f1,
        "n_pred": n_pred, "n_gold": n_gold, "n_correct": n_both,
    }

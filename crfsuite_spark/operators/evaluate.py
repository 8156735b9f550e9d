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
    seq_cols: list[str] | None = None,
) -> dict:
    """Per-label + overall metrics following R/evaluation.R:2-22,85-123.

    Per label (one-vs-rest 2×2 collapse, ``as_2d_table``): accuracy,
    precision = tp/(tp+fp), recall = tp/(tp+fn),
    **specificity** = tn/(tn+fp), F1, support.
    Overall: support-weighted and unweighted means over
    ``labels_overall`` (default: all labels except 'O'), item accuracy,
    and — when ``seq_cols`` is given — **instance accuracy**: the
    fraction of sequences whose every token is correct
    (crfsuite.c:369-396 whole-sequence accumulation).

    Returns {"bylabel": pandas DF, "overall": dict}.
    """
    conf = confusion(df, gold_col, pred_col).toPandas()
    total = int(conf["n"].sum())
    labels = sorted(set(conf["gold"]) | set(conf["pred"]))
    rows = []
    for lab in labels:
        tp = int(conf[(conf["gold"] == lab) & (conf["pred"] == lab)]["n"].sum())
        n_pred = int(conf[conf["pred"] == lab]["n"].sum())
        n_gold = int(conf[conf["gold"] == lab]["n"].sum())
        fp = n_pred - tp
        fn = n_gold - tp
        tn = total - tp - fp - fn
        precision = tp / n_pred if n_pred else 0.0
        recall = tp / n_gold if n_gold else 0.0
        specificity = tn / (tn + fp) if (tn + fp) else 0.0
        acc = (tp + tn) / total if total else 0.0
        f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
        rows.append({
            "label": lab, "accuracy": acc, "precision": precision,
            "recall": recall, "specificity": specificity,
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
        "specificity_weighted": float((sub["specificity"] * sub["support"]).sum() / wsum) if wsum else 0.0,
        "precision_mean": float(sub["precision"].mean()) if len(sub) else 0.0,
        "recall_mean": float(sub["recall"].mean()) if len(sub) else 0.0,
        "f1_mean": float(sub["f1"].mean()) if len(sub) else 0.0,
        "specificity_mean": float(sub["specificity"].mean()) if len(sub) else 0.0,
        "accuracy": None,
    }
    correct = conf[conf["gold"] == conf["pred"]]["n"].sum()
    overall["accuracy"] = float(correct / total) if total else 0.0
    if seq_cols:
        overall["instance_accuracy"] = instance_accuracy(
            df, seq_cols, gold_col, pred_col
        )
    return {"bylabel": bylabel, "overall": overall}


def instance_accuracy(
    df: DataFrame, seq_cols: list[str], gold_col: str, pred_col: str
) -> float:
    """Whole-sequence accuracy: fraction of sequences with every token
    correct (crfsuite.c:388-391 ``num_correct == num_observation`` per
    instance). One shuffle on the sequence key, map-side partial min."""
    per_seq = df.groupBy(*seq_cols).agg(
        F.min((F.col(gold_col) == F.col(pred_col)).cast("int")).alias("__all_ok")
    )
    row = per_seq.agg(
        F.avg("__all_ok").alias("acc"), F.count(F.lit(1)).alias("n")
    ).first()
    return float(row["acc"]) if row["n"] else 0.0


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


def calibration_report(
    df: DataFrame,
    conf_col: str = "marginal",
    correct_col: str = "correct",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram binning of per-token confidence against
    correctness — the ECE protocol of Guo et al. 2017 applied to the
    tagger's Viterbi-label marginal (K11, the confidence the reference
    itself exposes via `Tagger::marginal`, crfsuite.hpp:540-591). A
    trusted confidence lets a 100 TB pipeline route low-margin spans
    to re-review instead of re-decoding everything; this query is the
    gate that says whether the marginals can be trusted as
    probabilities.

    Bins are equal-width on [0, 1] (confidence 1.0 lands in the last
    bin). Output per bin: (bin, n, avg_conf, accuracy, abs_gap).
    Scale shape: ONE partial-aggregated groupBy on the bounded bin key
    — the token stream collapses map-side into ≤ n_bins rows.
    """
    conf = F.col(conf_col).cast("double")
    bin_ = F.least(
        F.floor(conf * n_bins).cast("int"), F.lit(n_bins - 1)
    ).alias("bin")
    return (
        df.where(conf.isNotNull())
        .groupBy(bin_)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.avg(conf).alias("avg_conf"),
            F.avg(F.col(correct_col).cast("double")).alias("accuracy"),
        )
        .withColumn("abs_gap", F.abs(F.col("accuracy") - F.col("avg_conf")))
    )


def expected_calibration_error(
    df: DataFrame,
    conf_col: str = "marginal",
    correct_col: str = "correct",
    n_bins: int = 10,
) -> DataFrame:
    """ECE = Σ (n_b / N) · |accuracy_b − avg_conf_b| over the
    reliability bins of :func:`calibration_report` — one scalar row
    (n_tokens, ece, max_gap). Pure arithmetic on the ≤ n_bins frame."""
    bins = calibration_report(df, conf_col, correct_col, n_bins)
    return bins.agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        (F.sum(F.col("n") * F.col("abs_gap")) / F.sum("n")).alias("ece"),
        F.max("abs_gap").alias("max_gap"),
    )


def triple_prf(
    pred: DataFrame,
    gold: DataFrame,
    keys: list[str] | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """Distributed per-group extraction P/R/F1 — :func:`set_prf` as a
    FRAME (one row per ``by`` group, e.g. per predicate), so the
    north-rule metric itself scales: no counts collected to the
    driver, the report stays joinable for dashboards and per-predicate
    regression gates.

    ``keys`` is the match grain (default mention grain:
    ``conv_id, turn_idx, subj, pred, obj`` — set semantics after
    ``distinct``); ``by`` the report grain (default ``pred``; must be
    ⊆ keys). Output: by-cols + (n_gold, n_pred, n_correct, precision,
    recall, f1) with 0.0 (never NULL) on empty denominators, matching
    :func:`crf_evaluation`'s zero-guard contract
    (reference R/evaluation.R:85-123 computes the same family
    label-wise on one machine).

    Shape: both sides dedup with ONE partial-aggregated distinct each,
    the correct-count is an inner join at distinct-triple grain on the
    uniform full key, and all three counts aggregate per ``by`` group —
    a full-outer join of three tiny per-group frames at report
    cardinality. The mention streams never join each other raw."""
    if keys is None:
        keys = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    if by is None:
        by = ["pred"]
    p = pred.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    np_ = p.groupBy(*by).agg(F.count(F.lit(1)).cast("bigint").alias("n_pred"))
    ng = g.groupBy(*by).agg(F.count(F.lit(1)).cast("bigint").alias("n_gold"))
    nc = (
        p.join(g, keys, "inner")
        .groupBy(*by)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_correct"))
    )
    j = (
        ng.join(np_, list(by), "full_outer")
        .join(nc, list(by), "full_outer")
        .select(
            *by,
            F.coalesce("n_gold", F.lit(0)).cast("bigint").alias("n_gold"),
            F.coalesce("n_pred", F.lit(0)).cast("bigint").alias("n_pred"),
            F.coalesce("n_correct", F.lit(0)).cast("bigint").alias(
                "n_correct"
            ),
        )
    )
    prec = F.when(
        F.col("n_pred") > 0, F.col("n_correct") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("n_gold") > 0, F.col("n_correct") / F.col("n_gold")
    ).otherwise(F.lit(0.0))
    return j.select(
        "*",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            prec + rec > 0, 2 * prec * rec / (prec + rec)
        ).otherwise(F.lit(0.0)).alias("f1"),
    )


def extraction_yield(
    turns: DataFrame,
    triples: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
) -> DataFrame:
    """Per-conversation extraction-yield report: (conv_id, n_turns,
    n_triple_turns, n_triples, n_entities, coverage) with coverage =
    fraction of turns that produced ≥1 triple — the monitoring query a
    production extraction pipeline alarms on (a coverage cliff after a
    model/template change is the canonical silent-failure signal, long
    before any gold-labelled P/R is available).

    ``turns`` is the turn-grain frame (one row per (conv, turn) — the
    transcript table itself works), ``triples`` the mention-grain
    extraction output.

    Shape: one partial-aggregated groupBy per side on the uniform conv
    key (the triple side pre-collapses distinct turns and entities via
    conditional countDistinct in the same pass), one equi-join of two
    conv-cardinality aggregates, left join so zero-yield conversations
    REPORT with coverage 0.0 instead of vanishing."""
    t = turns.groupBy(F.col(conv).alias("conv_id")).agg(
        F.countDistinct(turn).alias("n_turns")
    )
    x = triples.groupBy(F.col(conv).alias("conv_id")).agg(
        F.countDistinct(turn).alias("n_triple_turns"),
        F.count(F.lit(1)).cast("bigint").alias("n_triples"),
    )
    ents = (
        triples.select(F.col(conv).alias("conv_id"),
                       F.col("subj").alias("e"))
        .unionByName(
            triples.select(F.col(conv).alias("conv_id"),
                           F.col("obj").alias("e"))
        )
        .groupBy("conv_id")
        .agg(F.countDistinct("e").alias("n_entities"))
    )
    return (
        t.join(x, "conv_id", "left")
        .join(ents, "conv_id", "left")
        .select(
            "conv_id",
            "n_turns",
            F.coalesce("n_triple_turns", F.lit(0)).cast("bigint").alias(
                "n_triple_turns"
            ),
            F.coalesce("n_triples", F.lit(0)).cast("bigint").alias(
                "n_triples"
            ),
            F.coalesce("n_entities", F.lit(0)).cast("bigint").alias(
                "n_entities"
            ),
            (
                F.coalesce("n_triple_turns", F.lit(0))
                / F.col("n_turns")
            ).alias("coverage"),
        )
    )


def span_agreement(
    pred: DataFrame,
    gold: DataFrame,
    keys: list[str] | None = None,
    type_col: str = "entity_type",
    start_col: str = "start_tok",
    end_col: str = "end_tok",
) -> DataFrame:
    """Span-level NER agreement with BOTH exact-boundary and lenient
    (any-overlap, same type) credit, per entity type — the MUC-style
    companion to :func:`triple_prf`: exact-only scoring reads a
    one-token boundary slip as a double error (FP+FN), while the
    exact/lenient GAP is precisely the boundary-error budget, the
    first thing to triage when a tagger regresses (reference
    R/evaluation.R scores token-level only; span grain is what the
    chunkrange annotation format S9 stores).

    Output per type: (entity_type, n_gold, n_pred, n_exact,
    n_lenient_p, n_lenient_g, precision_exact, recall_exact,
    precision_lenient, recall_lenient) where lenient precision counts
    predicted spans overlapping ANY same-type gold span in the same
    sequence (each span counts once — semi-join semantics, no
    double-credit fanout) and lenient recall the mirror image.

    Shape: both sides dedup once; exact matches are ONE equi-join at
    distinct-span grain; the lenient sides are LeftSemi joins with an
    equi prefix on (keys, type) plus the interval-overlap range
    residual — sequence-bounded, so the per-key candidate set is a
    turn's spans, never a cross-sequence fanout; all counts collapse
    in partial-aggregated per-type groupBys and meet in a tiny
    full-outer report join. Zero denominators report 0.0, never NULL.
    """
    if keys is None:
        keys = ["conv_id", "turn_idx"]
    cols = keys + [type_col, start_col, end_col]
    p = pred.select(*cols).distinct()
    g = gold.select(*cols).distinct()
    per = lambda df, name: df.groupBy(type_col).agg(
        F.count(F.lit(1)).cast("bigint").alias(name)
    )
    exact = per(p.join(g, cols, "inner"), "n_exact")

    def overlap_semi(left, right):
        # aliased condition: left/right may share lineage (e.g. a
        # perturbed copy of the same frame), so bare Column refs
        # would be ambiguous
        cond = " AND ".join(
            [f"l.`{k}` = r.`{k}`" for k in keys + [type_col]]
            + [
                f"l.`{start_col}` <= r.`{end_col}`",
                f"r.`{start_col}` <= l.`{end_col}`",
            ]
        )
        return left.alias("l").join(
            right.alias("r"), F.expr(cond), "left_semi"
        )

    len_p = per(overlap_semi(p, g), "n_lenient_p")
    len_g = per(overlap_semi(g, p), "n_lenient_g")
    rep = (
        per(g, "n_gold")
        .join(per(p, "n_pred"), type_col, "full_outer")
        .join(exact, type_col, "full_outer")
        .join(len_p, type_col, "full_outer")
        .join(len_g, type_col, "full_outer")
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("bigint")
    ratio = lambda num, den: F.when(
        den > 0, num.cast("double") / den
    ).otherwise(F.lit(0.0))
    n_gold, n_pred = z("n_gold"), z("n_pred")
    n_exact, n_lp, n_lg = z("n_exact"), z("n_lenient_p"), z("n_lenient_g")
    return rep.select(
        type_col,
        n_gold.alias("n_gold"),
        n_pred.alias("n_pred"),
        n_exact.alias("n_exact"),
        n_lp.alias("n_lenient_p"),
        n_lg.alias("n_lenient_g"),
        ratio(n_exact, n_pred).alias("precision_exact"),
        ratio(n_exact, n_gold).alias("recall_exact"),
        ratio(n_lp, n_pred).alias("precision_lenient"),
        ratio(n_lg, n_gold).alias("recall_lenient"),
    )


def cohens_kappa(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Cohen's κ inter-annotator agreement (Cohen 1960) over two label
    columns: ONE row (n, po, pe, kappa) with po observed agreement,
    pe chance agreement from the marginals, κ = (po − pe)/(1 − pe)
    (κ = 1.0 when pe = 1 — degenerate single-label case where po must
    also be 1). The QC gate for the S9 annotation workflow
    (inst/app/annotation.Rmd stores raw chunks; double-annotated
    overlaps need an agreement number before the labels train
    anything).

    Shape: the token stream collapses ONCE into the (a, b)
    contingency (label-vocab² rows, map-side combined); every other
    quantity — marginals, po, pe — is algebra on that bounded frame
    (two re-aggregations + one 1-row join), nothing driver-side."""
    cells = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(
            F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("__n"))
    )
    tot = cells.agg(
        F.sum("__n").alias("n"),
        (
            F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n"))
                  .otherwise(F.lit(0.0)))
        ).alias("__agree"),
    )
    ma = cells.groupBy("__a").agg(F.sum("__n").alias("__na"))
    mb = cells.groupBy("__b").agg(F.sum("__n").alias("__nb"))
    pe_row = (
        ma.join(mb, ma["__a"] == mb["__b"])
        .agg(F.sum(F.col("__na") * F.col("__nb")).alias("__pe_num"))
    )
    return (
        tot.crossJoin(pe_row)
        .select(
            F.col("n").cast("bigint").alias("n"),
            (F.col("__agree") / F.col("n")).alias("po"),
            (F.coalesce("__pe_num", F.lit(0.0)) / (F.col("n") * F.col("n"))
             ).alias("pe"),
        )
        .select(
            "n", "po", "pe",
            F.when(F.col("pe") >= 1.0, F.lit(1.0))
            .otherwise((F.col("po") - F.col("pe")) / (1.0 - F.col("pe")))
            .alias("kappa"),
        )
    )


def acceptance_curve(
    df: DataFrame,
    conf_col: str = "confidence",
    correct_col: str = "correct",
    n_bins: int = 10,
) -> DataFrame:
    """Auto-accept operating curve: for each candidate threshold
    t = bin/n_bins, the (n_accepted, n_correct_accepted, precision,
    coverage) you'd get by auto-accepting everything with confidence
    ≥ t — the query that turns :func:`calibration_report`'s "can the
    confidence be trusted" into the operational "WHERE do we set the
    cutoff" (pick the highest coverage whose precision clears the
    product bar; everything below routes to review).

    Shape: ONE map-side-combined groupBy bins the stream to ≤ n_bins
    rows (identical collapse to calibration_report); the
    cumulative-from-the-top sums are a window over that bounded frame
    only. ``coverage`` = accepted correct / all correct (recall of
    the auto-accept gate); precision guards against the 0-accepted
    top bin with 0.0, never NULL."""
    from pyspark.sql import Window

    conf = F.col(conf_col).cast("double")
    bin_ = F.least(
        F.floor(conf * n_bins).cast("int"), F.lit(n_bins - 1)
    ).alias("bin")
    bins = (
        df.where(conf.isNotNull())
        .groupBy(bin_)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__n"),
            F.sum(F.col(correct_col).cast("double")).alias("__c"),
        )
    )
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = bins.agg(F.sum("__c").alias("__tc"))
    acc = F.sum("__n").over(w)
    cor = F.sum("__c").over(w)
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            (F.col("bin") / F.lit(float(n_bins))).alias("threshold"),
            acc.cast("bigint").alias("n_accepted"),
            cor.cast("bigint").alias("n_correct_accepted"),
            F.when(acc > 0, cor / acc).otherwise(F.lit(0.0)).alias(
                "precision"
            ),
            F.when(F.col("__tc") > 0, cor / F.col("__tc"))
            .otherwise(F.lit(0.0))
            .alias("coverage"),
        )
    )

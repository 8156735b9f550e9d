"""T6/T7/T8 (options, holdout eval, grid tuning) + S1/S2 readers."""

import pytest
from pyspark.sql import functions as F

from crfsuite_spark.train.options import (
    crf_options,
    holdout_evaluation,
    holdout_split,
    tune_crf,
)
from crfsuite_spark.sources.conll import read_conll, read_wikiner


def test_crf_options_registry():
    opts = {o.name: o for o in crf_options("lbfgs")}
    assert opts["c2"].default == 1.0
    assert opts["num_memories"].default == 6
    assert opts["epsilon"].default == 1e-5
    ap = {o.name: o for o in crf_options("averaged-perceptron")}
    assert "max_iterations" in ap
    with pytest.raises(ValueError):
        crf_options("nope")


def test_holdout_split_partitions_groups(spark, synth):
    df = spark.createDataFrame(synth.tokens)
    tr, ho = holdout_split(df, "conv_id", k=4, fold=1)
    tr_convs = {r[0] for r in tr.select("conv_id").distinct().collect()}
    ho_convs = {r[0] for r in ho.select("conv_id").distinct().collect()}
    assert tr_convs and ho_convs
    assert not (tr_convs & ho_convs)
    assert tr.count() + ho.count() == df.count()


@pytest.fixture(scope="module")
def small_feat(spark, synth):
    from crfsuite_spark.functions.templates import cbind_attributes

    toks = spark.createDataFrame(synth.tokens)
    return cbind_attributes(
        toks, terms=["token"], by=["conv_id", "turn_idx"],
        order_col="token_idx", from_offset=-1, to_offset=1, ngram_max=1,
    ).persist()


def test_holdout_evaluation_and_tuning(spark, small_feat):
    results = tune_crf(
        small_feat, seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
        grid={"c2": [0.1, 1.0]}, k=4, fold=0,
        max_iterations=25, num_partitions=4,
    )
    assert len(results) == 2
    assert results[0]["f1_weighted"] >= results[1]["f1_weighted"]
    assert results[0]["f1_weighted"] > 0.8
    # T6 directly: evaluation dict shape
    tr, ho = holdout_split(small_feat, "conv_id", k=4, fold=0)
    ev = holdout_evaluation(
        results[0]["model"], ho, ["conv_id", "turn_idx"], "token_idx"
    )
    assert {"precision_weighted", "recall_weighted", "accuracy"} <= set(ev["overall"])
    assert not ev["bylabel"].empty


CONLL = """-DOCSTART- -X- O
De Art O
tekst N O
. Punc O

Antwerpen N B-LOC
is V O

-DOCSTART- -X- O
Jan N B-PER
Peeters N I-PER
"""


def test_read_conll(spark, tmp_path):
    p = tmp_path / "ned.train"
    p.write_text(CONLL)
    df = read_conll(spark, str(p)).toPandas().sort_values(["doc_id", "sentence_id", "token_id"])
    assert list(df["token"]) == ["De", "tekst", ".", "Antwerpen", "is", "Jan", "Peeters"]
    assert df["doc_id"].nunique() == 2
    # sentence boundaries: blank line splits doc 1 into two sentences
    d1 = df[df["doc_id"] == 1]
    assert d1["sentence_id"].nunique() == 2
    assert list(df[df["token"] == "Peeters"]["label"]) == ["I-PER"]
    assert list(d1["token_id"])[:3] == [1, 2, 3]


def test_read_wikiner(spark, tmp_path):
    p = tmp_path / "wikiner.txt"
    p.write_text("Jan|NNP|B-PER gaat|V|O\nnaar|Prep|O Gent|N|B-LOC\n")
    df = read_wikiner(spark, str(p)).toPandas().sort_values(["sentence_id", "token_id"])
    assert list(df["token"]) == ["Jan", "gaat", "naar", "Gent"]
    assert list(df["label"]) == ["B-PER", "O", "O", "B-LOC"]


def test_model_summary(spark):
    """S8 summary.crf analogue: dimensions, size, iteration log."""
    import numpy as np
    from crfsuite_spark.train.model import CRFModel

    m = CRFModel(labels=["A", "B"], attrs=["x", "y"],
                 state_w=np.array([[1.0, 0.0], [0.0, 2.0]]),
                 trans_w=np.zeros((2, 2)), meta={"c2": 1.0})
    log = [{"iter": 1, "loss": 5.0, "gnorm": 1.0},
           {"iter": 2, "loss": 3.0, "gnorm": 0.5}]
    s = m.summary(iter_log=log)
    assert s["n_labels"] == 2 and s["n_attributes"] == 2
    assert s["n_nonzero_weights"] == 2
    assert s["c2"] == 1.0
    assert s["last_iteration"]["loss"] == 3.0
    assert len(s["iterations"]) == 2 and s["size_mb"] >= 0


def test_read_conll_many_files_per_file_windows(spark, tmp_path):
    """A multi-file corpus: windows are per-file (no single-partition
    global sort in the token plan) and doc/sentence ids are globally
    unique, deterministic in file-name order."""
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.train").write_text(CONLL)
    (d / "b.train").write_text(
        "-DOCSTART- -X- O\nGent N B-LOC\nligt V O\n\nmooi Adj O\n"
    )
    df = read_conll(spark, str(d))
    pdf = df.toPandas().sort_values(["doc_id", "sentence_id", "token_id"])
    # a.train carries docs 1-2 / sentences 1-3; b.train offsets after it
    assert pdf["doc_id"].nunique() == 3
    assert list(pdf[pdf["doc_id"] == 3]["token"]) == ["Gent", "ligt", "mooi"]
    # ids don't collide across files
    a = pdf[pdf["token"] == "Peeters"]["sentence_id"].iloc[0]
    b = pdf[pdf["token"] == "Gent"]["sentence_id"].iloc[0]
    assert a != b
    # plan: the token stream has NO single-partition exchange — the
    # cumulative-sum windows hash-partition by file
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    # determinism across runs
    pdf2 = read_conll(spark, str(d)).toPandas().sort_values(
        ["doc_id", "sentence_id", "token_id"]
    )
    assert list(pdf["token"]) == list(pdf2["token"])
    assert list(pdf["doc_id"]) == list(pdf2["doc_id"])


def test_read_wikiner_many_files(spark, tmp_path):
    """Multi-file WikiNER: per-file windows, globally unique sentence
    ids in file-name order, deterministic."""
    d = tmp_path / "wk"
    d.mkdir()
    (d / "a.txt").write_text("Jan|NNP|B-PER gaat|V|O\nnaar|Prep|O Gent|N|B-LOC\n")
    (d / "b.txt").write_text("Marie|NNP|B-PER slaapt|V|O\n")
    df = read_wikiner(spark, str(d)).toPandas().sort_values(
        ["sentence_id", "token_id"]
    )
    assert list(df["token"]) == ["Jan", "gaat", "naar", "Gent", "Marie", "slaapt"]
    assert df["sentence_id"].nunique() == 3
    # b.txt's sentence comes after both of a.txt's
    assert df[df["token"] == "Marie"]["sentence_id"].iloc[0] == 2


def test_read_conll_boundary_less_files_no_collision(spark, tmp_path):
    """Files WITHOUT a leading -DOCSTART-/blank line start their ids at
    0; per-file offsets must still keep ids globally disjoint
    (regression: offset-by-max merged unrelated files into one doc)."""
    d = tmp_path / "bl"
    d.mkdir()
    (d / "a.train").write_text("tok1 X O\ntok2 X O")
    (d / "b.train").write_text("tok3 X O")
    (d / "c.train").write_text("-DOCSTART- -X- O\ntok4 X O")
    df = read_conll(spark, str(d)).toPandas()
    by_tok = df.set_index("token")
    # three files -> three distinct (doc_id, sentence_id) groups
    groups = df.groupby(["doc_id", "sentence_id"])["token"].apply(list).to_dict()
    assert sorted(map(sorted, groups.values())) == [
        ["tok1", "tok2"], ["tok3"], ["tok4"]]
    # ids strictly ordered by file name
    assert by_tok.loc["tok1", "doc_id"] < by_tok.loc["tok3", "doc_id"] \
        < by_tok.loc["tok4", "doc_id"]
    # no duplicated order keys within any group
    assert not df.duplicated(["doc_id", "sentence_id", "token_id"]).any()


def test_read_conll_line_mode_identical(spark, tmp_path, monkeypatch):
    """Large-file fallback (sources/conll.py:_lines_frame): the
    line-mode scan parses a multi-file corpus IDENTICALLY to the
    wholetext fast path — same globally-unique ids, same tokens — and
    auto mode flips to line-mode once a file exceeds the size
    threshold."""
    import crfsuite_spark.sources.conll as conll_mod

    d = tmp_path / "big"
    d.mkdir()
    (d / "a.train").write_text(CONLL)
    # synthetic "one big file": 300 two-token sentences, several docs
    lines = ["-DOCSTART- -X- O"]
    for i in range(300):
        if i % 60 == 0 and i:
            lines.append("-DOCSTART- -X- O")
        lines.append(f"tok{i} N B-LOC")
        lines.append(f"w{i} V O")
        lines.append("")
    (d / "b.train").write_text("\n".join(lines) + "\n")

    cols = ["doc_id", "sentence_id", "token_id", "token", "pos", "label"]

    def norm(df):
        return (
            df.toPandas()[cols].astype({"doc_id": "int64", "sentence_id": "int64"})
            .sort_values(cols).reset_index(drop=True)
        )

    whole = norm(read_conll(spark, str(d), line_mode=False))
    line = norm(read_conll(spark, str(d), line_mode=True))
    assert len(whole) == 600 + 7  # 300 sents × 2 toks + 7 from CONLL fixture
    assert whole.equals(line)

    # auto probe: shrink the threshold so every file counts as "big"
    monkeypatch.setattr(conll_mod, "WHOLETEXT_MAX_BYTES", 10)
    auto = norm(conll_mod.read_conll(spark, str(d)))
    assert whole.equals(auto)


def test_read_wikiner_line_mode_identical(spark, tmp_path):
    p = tmp_path / "wk2"
    p.mkdir()
    (p / "a.txt").write_text("Jan|NNP|B-PER gaat|V|O\nnaar|Prep|O Gent|N|B-LOC\n")
    (p / "b.txt").write_text("Marie|NNP|B-PER slaapt|V|O\n")
    cols = ["sentence_id", "token_id", "token", "pos", "label"]

    def norm(df):
        return (
            df.toPandas()[cols].astype({"sentence_id": "int64"})
            .sort_values(cols).reset_index(drop=True)
        )

    assert norm(read_wikiner(spark, str(p), line_mode=False)).equals(
        norm(read_wikiner(spark, str(p), line_mode=True))
    )

"""Training correctness: gradient vs finite differences (numpy level)
and end-to-end Spark train → decode → entity-level P/R on held-out
conversations (the reference's CoNLL-2002 validation contract,
R/evaluation.R:85-123)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crfsuite_spark.kernel import crf
from crfsuite_spark.train.trainer import batch_objective, train_crf
from crfsuite_spark.train.model import CRFModel
from crfsuite_spark.decode.tagger import decode
from crfsuite_spark.functions.templates import cbind_attributes


def _rand_problem(seed=0, B=4, L=3, A=6, max_T=5):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(1, max_T + 1, size=B)
    labels = np.concatenate([rng.integers(0, L, size=t) for t in lengths])
    counts = rng.integers(0, 4, size=int(lengths.sum()))
    aids = np.concatenate([rng.integers(0, A, size=c) for c in counts]) if counts.sum() else np.zeros(0, dtype=np.int64)
    tok_offsets = np.concatenate([[0], np.cumsum(counts)])
    return lengths, labels, aids.astype(np.int64), tok_offsets.astype(np.int64)


def test_gradient_matches_finite_differences():
    L, A = 3, 6
    packed = _rand_problem(seed=1, B=5, L=L, A=A)
    rng = np.random.default_rng(2)
    state_w = rng.normal(0, 0.5, size=(A, L))
    trans_w = rng.normal(0, 0.5, size=(L, L))

    loss, g_state, g_trans, _ = batch_objective(*packed, None, state_w, trans_w)
    eps = 1e-6
    for idx in [(0, 0), (2, 1), (5, 2)]:
        sp = state_w.copy(); sp[idx] += eps
        sm = state_w.copy(); sm[idx] -= eps
        fp, _, _, _ = batch_objective(*packed, None, sp, trans_w)
        fm, _, _, _ = batch_objective(*packed, None, sm, trans_w)
        assert abs((fp - fm) / (2 * eps) - g_state[idx]) < 1e-5
    for idx in [(0, 1), (2, 2), (1, 0)]:
        tp = trans_w.copy(); tp[idx] += eps
        tm = trans_w.copy(); tm[idx] -= eps
        fp, _, _, _ = batch_objective(*packed, None, state_w, tp)
        fm, _, _, _ = batch_objective(*packed, None, state_w, tm)
        assert abs((fp - fm) / (2 * eps) - g_trans[idx]) < 1e-5


def test_embedding_gradient_matches_finite_differences():
    L, A, D = 3, 6, 4
    packed = _rand_problem(seed=7, B=5, L=L, A=A)
    N = int(packed[0].sum())
    rng = np.random.default_rng(8)
    embs = rng.normal(size=(N, D))
    state_w = rng.normal(0, 0.5, size=(A, L))
    trans_w = rng.normal(0, 0.5, size=(L, L))
    emb_w = rng.normal(0, 0.5, size=(D, L))
    loss, _, _, g_emb = batch_objective(*packed, embs, state_w, trans_w, emb_w)
    eps = 1e-6
    for idx in [(0, 0), (2, 1), (3, 2)]:
        ep = emb_w.copy(); ep[idx] += eps
        em = emb_w.copy(); em[idx] -= eps
        fp, _, _, _ = batch_objective(*packed, embs, state_w, trans_w, ep)
        fm, _, _, _ = batch_objective(*packed, embs, state_w, trans_w, em)
        assert abs((fp - fm) / (2 * eps) - g_emb[idx]) < 1e-5


def test_loss_is_nll():
    # loss must equal sum of per-sequence -log p(gold)
    L, A = 3, 5
    lengths, labels, aids, tok_offsets = _rand_problem(seed=3, B=3, L=L, A=A)
    rng = np.random.default_rng(4)
    state_w = rng.normal(size=(A, L))
    trans_w = rng.normal(size=(L, L))
    loss, _, _, _ = batch_objective(lengths, labels, aids, tok_offsets, None, state_w, trans_w)
    expected = 0.0
    pos = 0
    tok = 0
    for T in lengths:
        aid_lists = [
            aids[tok_offsets[tok + t]: tok_offsets[tok + t + 1]] for t in range(T)
        ]
        state = crf.state_scores(aid_lists, state_w)
        expected -= crf.sequence_log_prob(state, trans_w, labels[pos: pos + T])
        pos += T
        tok += T
    assert abs(loss - expected) < 1e-9


@pytest.fixture(scope="module")
def featurized_tokens(spark, synth):
    toks = spark.createDataFrame(synth.tokens)
    return cbind_attributes(
        toks, terms=["token", "pos"], by=["conv_id", "turn_idx"],
        order_col="token_idx", from_offset=-2, to_offset=2, ngram_max=2,
    ).persist()


@pytest.fixture(scope="module")
def trained(spark, featurized_tokens):
    convs = [r[0] for r in featurized_tokens.select("conv_id").distinct().collect()]
    convs = sorted(convs)
    holdout = set(convs[: max(2, len(convs) // 5)])
    train_df = featurized_tokens.where(~F.col("conv_id").isin(list(holdout)))
    model = train_crf(
        train_df, seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
        minfreq=1.0, c2=0.5, max_iterations=60, num_partitions=8,
    )
    return model, holdout


def test_train_fits_and_decodes_heldout(spark, featurized_tokens, synth, trained):
    model, holdout = trained
    assert set(model.labels) == set(synth.tokens["label"].unique())
    test_df = featurized_tokens.where(F.col("conv_id").isin(list(holdout)))
    out = decode(
        test_df, model, seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
        with_marginal=True,
    ).toPandas()
    gold = synth.tokens[synth.tokens["conv_id"].isin(holdout)]
    merged = out.merge(
        gold[["conv_id", "turn_idx", "token_idx", "label"]],
        on=["conv_id", "turn_idx", "token_idx"], suffixes=("_pred", "_gold"),
    )
    assert len(merged) == len(gold)
    acc = (merged["label_pred"] == merged["label_gold"]).mean()
    assert acc > 0.97, f"token accuracy {acc}"
    assert ((out["marginal"] > 0) & (out["marginal"] <= 1 + 1e-9)).all()
    assert ((out["seq_prob"] > 0) & (out["seq_prob"] <= 1 + 1e-9)).all()


def test_model_save_load_roundtrip(tmp_path, trained):
    model, _ = trained
    p = str(tmp_path / "model")
    model.save(p)
    loaded = CRFModel.load(p)
    assert loaded.labels == model.labels
    # weights survive the round trip (zero-weight features pruned)
    s1, t1 = model.coefficients()
    s2, t2 = loaded.coefficients()
    assert np.allclose(
        s1.sort_values(["attribute", "label"])["weight"].to_numpy(),
        s2.sort_values(["attribute", "label"])["weight"].to_numpy(),
    )
    assert np.allclose(
        t1.sort_values(["from_label", "to_label"])["weight"].to_numpy(),
        t2.sort_values(["from_label", "to_label"])["weight"].to_numpy(),
    )


def test_train_decode_with_embeddings(spark):
    """Embeddings-only signal: string attrs are constant (useless), the
    label is recoverable only from the embedding vector — the reference
    embeddings path (R/modelling.R:131-139) must carry the model."""
    import pandas as pd

    rng = np.random.default_rng(11)
    protos = {"O": [1.0, 0.0, 0.0], "B-X": [0.0, 1.0, 0.0], "I-X": [0.0, 0.0, 1.0]}
    rows = []
    for c in range(30):
        for t in range(6):
            lab = ["O", "B-X", "I-X"][int(rng.integers(0, 3))]
            vec = (np.array(protos[lab]) + rng.normal(0, 0.1, 3)).tolist()
            rows.append((f"c{c:02d}", 0, t, ["bias"], vec, lab))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "token_idx", "attrs", "emb", "label"])
    df = spark.createDataFrame(pdf)
    train = df.where(F.col("conv_id") < "c24")
    test = df.where(F.col("conv_id") >= "c24")
    model = train_crf(
        train, seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
        c2=0.1, max_iterations=60, num_partitions=4, embeddings_col="emb",
    )
    assert model.emb_w is not None and model.emb_w.shape == (3, 3)
    out = decode(
        test, model, seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
        with_marginal=False, embeddings_col="emb",
    ).toPandas()
    gold = pdf[pdf["conv_id"] >= "c24"]
    merged = out.merge(gold[["conv_id", "turn_idx", "token_idx", "label"]],
                       on=["conv_id", "turn_idx", "token_idx"], suffixes=("_pred", "_gold"))
    acc = (merged["label_pred"] == merged["label_gold"]).mean()
    assert acc > 0.9, f"embedding-driven accuracy {acc}"


def test_model_emb_save_load_roundtrip(tmp_path):
    m = CRFModel(
        labels=["A", "B"], attrs=["x"],
        state_w=np.array([[1.0, 0.0]]), trans_w=np.zeros((2, 2)),
        emb_names=["emb[0]", "emb[1]"], emb_w=np.array([[0.5, -0.5], [0.0, 2.0]]),
    )
    p = str(tmp_path / "m")
    m.save(p)
    loaded = CRFModel.load(p)
    assert loaded.emb_names == m.emb_names
    assert np.allclose(loaded.emb_w, m.emb_w)


def test_averaged_perceptron_fits(spark, featurized_tokens, synth):
    from crfsuite_spark.train.perceptron import train_perceptron

    convs = sorted(r[0] for r in featurized_tokens.select("conv_id").distinct().collect())
    holdout = set(convs[: max(2, len(convs) // 5)])
    train_df = featurized_tokens.where(~F.col("conv_id").isin(list(holdout)))
    log = []
    model = train_perceptron(
        train_df, seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
        max_iterations=8, num_partitions=4, log=log,
    )
    assert model.meta["method"] == "averaged-perceptron"
    assert log and log[-1]["error_ratio"] <= log[0]["error_ratio"]
    test_df = featurized_tokens.where(F.col("conv_id").isin(list(holdout)))
    out = decode(
        test_df, model, seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
        with_marginal=False,
    ).toPandas()
    gold = synth.tokens[synth.tokens["conv_id"].isin(holdout)]
    merged = out.merge(
        gold[["conv_id", "turn_idx", "token_idx", "label"]],
        on=["conv_id", "turn_idx", "token_idx"], suffixes=("_pred", "_gold"),
    )
    acc = (merged["label_pred"] == merged["label_gold"]).mean()
    assert acc > 0.9, f"perceptron heldout accuracy {acc}"


def test_l1_training_sparsifies(spark, featurized_tokens):
    """c1 > 0 (OWL-QN, train_lbfgs.c:289-291) yields a sparser state
    weight matrix than pure L2 at equal iterations."""
    sub = featurized_tokens.where(F.col("conv_id") < "conv_00010")
    dense = train_crf(sub, ["conv_id", "turn_idx"], "token_idx",
                      c2=0.1, max_iterations=40, num_partitions=4)
    sparse = train_crf(sub, ["conv_id", "turn_idx"], "token_idx",
                       c1=1.0, c2=0.0, max_iterations=40, num_partitions=4)
    nz_dense = int((dense.state_w != 0).sum())
    nz_sparse = int((sparse.state_w != 0).sum())
    assert nz_sparse < nz_dense * 0.8, (nz_sparse, nz_dense)


@pytest.mark.parametrize("method", ["pa1", "arow"])
def test_online_trainers_fit(spark, featurized_tokens, synth, method):
    from crfsuite_spark.train.online import train_online

    convs = sorted(r[0] for r in featurized_tokens.select("conv_id").distinct().collect())
    holdout = set(convs[: max(2, len(convs) // 5)])
    train_df = featurized_tokens.where(~F.col("conv_id").isin(list(holdout)))
    model = train_online(
        train_df, seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
        method=method, max_iterations=6, num_partitions=4,
    )
    assert model.meta["method"] == method
    test_df = featurized_tokens.where(F.col("conv_id").isin(list(holdout)))
    out = decode(
        test_df, model, seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
        with_marginal=False,
    ).toPandas()
    gold = synth.tokens[synth.tokens["conv_id"].isin(holdout)]
    merged = out.merge(
        gold[["conv_id", "turn_idx", "token_idx", "label"]],
        on=["conv_id", "turn_idx", "token_idx"], suffixes=("_pred", "_gold"),
    )
    acc = (merged["label_pred"] == merged["label_gold"]).mean()
    assert acc > 0.85, f"{method} heldout accuracy {acc}"


def test_l2sgd_fits(spark, featurized_tokens, synth):
    from crfsuite_spark.train.l2sgd import train_l2sgd

    convs = sorted(r[0] for r in featurized_tokens.select("conv_id").distinct().collect())
    holdout = set(convs[: max(2, len(convs) // 5)])
    train_df = featurized_tokens.where(~F.col("conv_id").isin(list(holdout)))
    log = []
    model = train_l2sgd(
        train_df, seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
        c2=1.0, max_iterations=10, num_partitions=4, log=log,
    )
    assert model.meta["method"] == "l2sgd"
    assert log and log[-1]["loss"] <= log[0]["loss"]
    test_df = featurized_tokens.where(F.col("conv_id").isin(list(holdout)))
    out = decode(
        test_df, model, seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
        with_marginal=False,
    ).toPandas()
    gold = synth.tokens[synth.tokens["conv_id"].isin(holdout)]
    merged = out.merge(
        gold[["conv_id", "turn_idx", "token_idx", "label"]],
        on=["conv_id", "turn_idx", "token_idx"], suffixes=("_pred", "_gold"),
    )
    acc = (merged["label_pred"] == merged["label_gold"]).mean()
    assert acc > 0.9, f"l2sgd heldout accuracy {acc}"


def test_long_sequence_cap_and_split(spark, featurized_tokens, trained):
    """Hot-skew safety valve: capping sequence length and decoding in
    overlapped chunks reproduces the uncapped Viterbi labels (the
    influence horizon of an NER chain is far below the overlap)."""
    import pandas as pd

    model, _ = trained
    # build ONE long sequence by concatenating many turns of a conv
    toks = featurized_tokens.where(F.col("conv_id") == "conv_00001").toPandas()
    toks = toks.sort_values(["turn_idx", "token_idx"]).reset_index(drop=True)
    toks["turn_idx"] = 0
    toks["token_idx"] = range(len(toks))
    long_df = spark.createDataFrame(toks)
    full = decode(
        long_df, model, ["conv_id", "turn_idx"], "token_idx",
        with_marginal=False,
    ).toPandas().sort_values("token_idx")
    split = decode(
        long_df, model, ["conv_id", "turn_idx"], "token_idx",
        with_marginal=False, max_seq_len=16, overlap=8,
    ).toPandas().sort_values("token_idx")
    assert len(split) == len(full) == len(toks)
    agree = (full["label"].to_numpy() == split["label"].to_numpy()).mean()
    assert agree >= 0.99, f"split decode agreement {agree}"


def test_hashed_templates_decode_identical(spark, featurized_tokens, synth, trained):
    """The hash-native template path (xxhash64(name, value), no attr
    strings) must produce IDENTICAL labels to the string-template path
    for the same trained model."""
    from crfsuite_spark.functions.templates import cbind_attribute_hashes

    model, holdout = trained
    toks = spark.createDataFrame(synth.tokens).where(
        F.col("conv_id").isin(list(holdout))
    )
    via_strings = decode(
        featurized_tokens.where(F.col("conv_id").isin(list(holdout))),
        model, ["conv_id", "turn_idx"], "token_idx", with_marginal=False,
    ).toPandas()
    hashed_feat = cbind_attribute_hashes(
        toks, terms=["token", "pos"], by=["conv_id", "turn_idx"],
        order_col="token_idx", from_offset=-2, to_offset=2, ngram_max=2,
    )
    via_hashes = decode(
        hashed_feat, model, ["conv_id", "turn_idx"], "token_idx",
        with_marginal=False, attrs_hashed=True,
    ).toPandas()
    key = ["conv_id", "turn_idx", "token_idx"]
    merged = via_strings.merge(via_hashes[key + ["label"]], on=key,
                               suffixes=("_s", "_h"))
    assert len(merged) == len(via_strings) == len(via_hashes)
    assert (merged["label_s"] == merged["label_h"]).all()


def test_pa_zero_feature_delta_does_not_crash(spark):
    """Regression: a mispredicted single-token sequence whose attributes
    were all minfreq-pruned yields an empty feature delta (norm2=0); the
    PA update must skip it instead of dividing by zero."""
    from crfsuite_spark.train.online import train_online

    rows = [
        # frequent pattern so SOME features survive minfreq=2
        ("c1", 0, 0, ["tok=a"], "A"),
        ("c2", 0, 0, ["tok=a"], "A"),
        ("c3", 0, 0, ["tok=b"], "B"),
        ("c4", 0, 0, ["tok=b"], "B"),
        # singleton token, gold label sorts AFTER the viterbi-default:
        # its only attribute is pruned -> empty delta on a mispredict
        ("c5", 0, 0, ["tok=rare"], "B"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, token_idx int, attrs array<string>, label string"
    )
    model = train_online(
        df, seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
        method="pa", minfreq=2.0, max_iterations=3, num_partitions=2,
    )
    assert set(model.labels) == {"A", "B"}


def _mk_tokens(spark, seqs):
    rows = []
    for ci, seq in enumerate(seqs):
        for ti, (tok, lab) in enumerate(seq):
            rows.append((f"c{ci}", 0, ti, [f"tok={tok}"], lab))
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, token_idx int, attrs array<string>, label string"
    )


def test_observed_only_transitions_default(spark):
    """Reference default (feature.possible_transitions=0): only OBSERVED
    adjacent label pairs become trainable transition parameters; the
    unobserved pairs stay exactly 0 (crf1d_feature.c:167-178, densify is
    opt-in at 238-248)."""
    import numpy as np
    from crfsuite_spark.train.trainer import train_crf

    # transitions observed: A->B, B->A only (never A->A, B->B)
    seqs = [
        [("x", "A"), ("y", "B"), ("x", "A"), ("y", "B")],
        [("y", "B"), ("x", "A")],
    ] * 3
    df = _mk_tokens(spark, seqs)
    m = train_crf(df, ["conv_id", "turn_idx"], "token_idx",
                  max_iterations=20, num_partitions=2)
    ia, ib = m.labels.index("A"), m.labels.index("B")
    assert m.meta["n_transition_features"] == 2
    assert m.trans_w[ia, ia] == 0.0 and m.trans_w[ib, ib] == 0.0
    assert m.trans_w[ia, ib] != 0.0 and m.trans_w[ib, ia] != 0.0


def test_possible_transitions_matches_dense_when_all_observed(spark):
    """When every label pair IS observed, densify is a no-op: the default
    observed-only model and possible_transitions=1 produce identical
    parameters (same feature set -> same convex optimum path)."""
    import numpy as np
    from crfsuite_spark.train.trainer import train_crf

    # cover all 4 transitions of {A,B}
    seqs = [
        [("x", "A"), ("x", "A"), ("y", "B"), ("y", "B"), ("x", "A")],
        [("y", "B"), ("x", "A"), ("y", "B")],
    ] * 3
    df = _mk_tokens(spark, seqs)
    kw = dict(seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
              max_iterations=25, num_partitions=2)
    m0 = train_crf(df, **kw)
    m1 = train_crf(df, possible_transitions=True, **kw)
    assert m0.meta["n_transition_features"] == 4
    assert m1.meta["n_transition_features"] == 4
    np.testing.assert_allclose(m0.trans_w, m1.trans_w, atol=1e-10)
    np.testing.assert_allclose(m0.state_w, m1.state_w, atol=1e-10)


def test_possible_states_densifies_attr_grid(spark):
    """possible_states=1: every (attribute, label) pair is trainable,
    including pairs never observed together (crf1d_feature.c:217-225)."""
    from crfsuite_spark.train.trainer import train_crf

    seqs = [[("x", "A"), ("y", "B")]] * 4
    df = _mk_tokens(spark, seqs)
    m0 = train_crf(df, ["conv_id", "turn_idx"], "token_idx",
                   max_iterations=10, num_partitions=2)
    m1 = train_crf(df, ["conv_id", "turn_idx"], "token_idx",
                   max_iterations=10, num_partitions=2, possible_states=True)
    # observed-only: 2 state features; densified: 2 attrs x 2 labels = 4
    assert m0.meta["n_state_features"] == 2
    assert m1.meta["n_state_features"] == 4


def test_gradient_tree_reduce_matches_driver_sum(spark):
    """The treeReduce partial-sum path must train to the same optimum as
    the deterministic driver-side sorted sum."""
    import numpy as np
    from crfsuite_spark.train.trainer import train_crf

    seqs = [
        [("x", "A"), ("y", "B"), ("z", "O")],
        [("z", "O"), ("x", "A")],
        [("y", "B"), ("z", "O"), ("y", "B")],
    ] * 4
    df = _mk_tokens(spark, seqs)
    kw = dict(seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
              max_iterations=20, num_partitions=4)
    m_sum = train_crf(df, **kw)
    m_tree = train_crf(df, tree_reduce_threshold=0, **kw)
    np.testing.assert_allclose(m_sum.state_w, m_tree.state_w, atol=1e-8)
    np.testing.assert_allclose(m_sum.trans_w, m_tree.trans_w, atol=1e-8)


def test_crf_options_registry_all_methods():
    """T8 parity: all five reference trainers are registered with the
    shared crf1de feature options (params.c / crf1d_encode.c:789-795)."""
    from crfsuite_spark.train.options import crf_options

    for method in ("lbfgs", "l2sgd", "averaged-perceptron",
                   "passive-aggressive", "arow"):
        opts = {o.name: o for o in crf_options(method)}
        assert "feature.minfreq" in opts
        assert "feature.possible_states" in opts
        assert "feature.possible_transitions" in opts
        assert "max_iterations" in opts
    assert {o.name for o in crf_options("l2sgd")} >= {"c2", "calibration.eta"}
    assert {o.name for o in crf_options("arow")} >= {"variance", "gamma"}
    assert {o.name for o in crf_options("passive-aggressive")} >= {"type", "c"}


@pytest.mark.parametrize("which", ["perceptron", "pa1", "arow", "l2sgd"])
def test_online_trainers_observed_only_transitions(spark, which):
    """All trainers share the crf1de feature set: transition parameters
    exist only for OBSERVED adjacent pairs by default (the reference
    generates features once for every trainer, crf1d_encode.c:875-890),
    so unobserved pairs must stay exactly 0."""
    import numpy as np

    seqs = [
        [("x", "A"), ("y", "B"), ("x", "A"), ("y", "B")],
        [("y", "B"), ("x", "A")],
    ] * 4
    df = _mk_tokens(spark, seqs)
    kw = dict(seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
              max_iterations=5, num_partitions=2)
    if which == "perceptron":
        from crfsuite_spark.train.perceptron import train_perceptron
        m = train_perceptron(df, **kw)
    elif which == "l2sgd":
        from crfsuite_spark.train.l2sgd import train_l2sgd
        m = train_l2sgd(df, **kw)
    else:
        from crfsuite_spark.train.online import train_online
        m = train_online(df, method=which, **kw)
    ia, ib = m.labels.index("A"), m.labels.index("B")
    # A->A and B->B never observed -> no trainable parameter -> exact 0
    assert m.trans_w[ia, ia] == 0.0, which
    assert m.trans_w[ib, ib] == 0.0, which


def test_l2sgd_minfreq_pruned_transition_stays_zero(spark):
    """Regression: with minfreq > 1, a gold transition observed only
    once is NOT a feature — the empirical +gain term must be masked too,
    or its weight grows one-sidedly."""
    from crfsuite_spark.train.l2sgd import train_l2sgd

    # A->B occurs 4 times; B->A exactly once (below minfreq=2)
    seqs = [[("x", "A"), ("y", "B")]] * 4 + [[("y", "B"), ("x", "A")]]
    df = _mk_tokens(spark, seqs)
    m = train_l2sgd(df, ["conv_id", "turn_idx"], "token_idx",
                    minfreq=2.0, max_iterations=4, num_partitions=2)
    ia, ib = m.labels.index("A"), m.labels.index("B")
    assert m.trans_w[ib, ia] == 0.0  # pruned pair: not a parameter
    assert m.trans_w[ia, ib] != 0.0  # surviving pair trains


def test_sparse_gradient_bit_identical_weights(spark):
    """CSR (idx, val) gradient partials must train to BIT-identical
    weights vs the dense partial path, on both the observed-features
    and the possible_states dense-grid layouts."""
    import numpy as np
    from crfsuite_spark.train.trainer import train_crf

    seqs = [
        [("x", "A"), ("y", "B"), ("z", "O")],
        [("z", "O"), ("x", "A")],
        [("y", "B"), ("z", "O"), ("y", "B")],
    ] * 4
    df = _mk_tokens(spark, seqs)
    for ps in (False, True):
        kw = dict(seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
                  max_iterations=15, num_partitions=4, possible_states=ps)
        dense = train_crf(df, sparse_gradient=False, **kw)
        sparse = train_crf(df, sparse_gradient=True, **kw)
        assert np.array_equal(dense.state_w, sparse.state_w), f"ps={ps}"
        assert np.array_equal(dense.trans_w, sparse.trans_w), f"ps={ps}"
        # and through the treeReduce path too
        tree = train_crf(df, sparse_gradient=True, tree_reduce_threshold=0, **kw)
        assert np.array_equal(dense.state_w, tree.state_w), f"ps={ps} tree"


def test_sparse_state_gradient_fd_at_100k_attrs():
    """The sparse state gradient is FD-correct and dense-equal at a
    100k-attribute dictionary (the scale the CSR switch exists for)."""
    from crfsuite_spark.train.trainer import batch_objective

    A, L = 100_000, 3
    rng = np.random.default_rng(11)
    B = 6
    lengths = rng.integers(2, 6, size=B)
    N = int(lengths.sum())
    labels = rng.integers(0, L, size=N)
    counts = rng.integers(1, 4, size=N)
    aids = rng.integers(0, A, size=int(counts.sum())).astype(np.int64)
    tok_offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    packed = (lengths, labels, aids, tok_offsets, None)
    state_w = np.zeros((A, L))
    touched = np.unique(aids)
    state_w[touched] = rng.normal(0, 0.5, size=(len(touched), L))
    trans_w = rng.normal(0, 0.5, size=(L, L))

    loss_d, gd, gt_d, _ = batch_objective(*packed, state_w, trans_w)
    loss_s, (uniq, g_local), gt_s, _ = batch_objective(
        *packed, state_w, trans_w, sparse_state=True
    )
    assert loss_s == loss_d and np.array_equal(gt_s, gt_d)
    # sparse rows == dense rows at observed attrs; dense zero elsewhere
    assert np.array_equal(gd[uniq], g_local)
    mask = np.ones(A, dtype=bool); mask[uniq] = False
    assert not gd[mask].any()
    # FD spot-check a few observed coordinates
    eps = 1e-6
    for a in touched[:3]:
        for l in range(L):
            sp = state_w.copy(); sp[a, l] += eps
            sm = state_w.copy(); sm[a, l] -= eps
            fp, *_ = batch_objective(*packed, sp, trans_w, sparse_state=True)
            fm, *_ = batch_objective(*packed, sm, trans_w, sparse_state=True)
            assert abs((fp - fm) / (2 * eps) - gd[a, l]) < 1e-4


def test_per_iteration_holdout_metrics(spark):
    """holdout_df= logs the reference's per-iteration holdout P/R/F1
    (holdout.c:44-81 via the progress callback): every iteration entry
    carries the metrics and fit quality improves over training."""
    from crfsuite_spark.train.trainer import train_crf

    seqs = [
        [("x", "A"), ("y", "B"), ("z", "O")],
        [("z", "O"), ("x", "A"), ("y", "B")],
        [("y", "B"), ("z", "O")],
    ] * 3
    df = _mk_tokens(spark, seqs)
    log: list = []
    train_crf(df, ["conv_id", "turn_idx"], "token_idx", holdout_df=df,
              max_iterations=8, num_partitions=2, log=log)
    assert log and all("holdout" in e for e in log)
    f1s = [e["holdout"]["overall"]["f1_weighted"] for e in log]
    assert f1s[-1] >= f1s[0]
    assert f1s[-1] > 0.95  # memorizable toy -> near-perfect holdout fit
    # per-label table present, reference finalize() shape
    assert any(r["label"] == "A" for r in log[-1]["holdout"]["bylabel"])


@pytest.mark.parametrize("which", ["perceptron", "l2sgd", "pa1"])
def test_online_trainers_per_iteration_holdout(spark, which):
    """All trainers log the reference's per-iteration holdout P/R/F1
    when given a fold (holdout.c:44-81 applies to every method)."""
    seqs = [
        [("x", "A"), ("y", "B"), ("z", "O")],
        [("z", "O"), ("x", "A"), ("y", "B")],
    ] * 3
    df = _mk_tokens(spark, seqs)
    log: list = []
    kw = dict(seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
              max_iterations=3, num_partitions=2, log=log, holdout_df=df)
    if which == "perceptron":
        from crfsuite_spark.train.perceptron import train_perceptron
        train_perceptron(df, **kw)
    elif which == "l2sgd":
        from crfsuite_spark.train.l2sgd import train_l2sgd
        train_l2sgd(df, **kw)
    else:
        from crfsuite_spark.train.online import train_online
        train_online(df, method="pa1", **kw)
    assert log and all("holdout" in e for e in log)
    last = log[-1]["holdout"]
    assert 0.0 <= last["overall"]["f1_weighted"] <= 1.0
    assert any(r["label"] == "A" for r in last["bylabel"])


def test_sparse_state_gradient_matches_dense_random():
    """Property: sparse and dense state gradients are bit-identical on
    random problems, including empty-attribute and repeated-aid cases."""
    from hypothesis import given, settings, strategies as st
    from crfsuite_spark.train.trainer import batch_objective as bo

    @settings(max_examples=25, deadline=None)
    @given(seed=st.integers(0, 100_000))
    def check(seed):
        packed = _rand_problem(seed=seed, B=4, L=3, A=12)
        rng = np.random.default_rng(seed + 1)
        state_w = rng.normal(size=(12, 3))
        trans_w = rng.normal(size=(3, 3))
        ld, gd, gtd, _ = bo(*packed, None, state_w, trans_w)
        ls, (uniq, gl), gts, _ = bo(*packed, None, state_w, trans_w,
                                    sparse_state=True)
        assert ls == ld
        assert np.array_equal(gts, gtd)
        dense_from_sparse = np.zeros_like(gd)
        if len(uniq):
            dense_from_sparse[uniq] = gl
        assert np.array_equal(dense_from_sparse, gd)

    check()


def test_epoch_mixing_tree_reduce_matches_collect(spark, featurized_tokens):
    """At ≥128 partitions the online trainers' epoch mixing rides the
    executor-side treeReduce (threshold 64 < 128): the driver receives
    ONE payload per epoch, and the mixed model matches the
    deterministic partition-id-ordered collect path (threshold forced
    above the partition count) to float-associativity tolerance."""
    from crfsuite_spark.train.l2sgd import train_l2sgd
    from crfsuite_spark.train.online import train_online
    from crfsuite_spark.train.perceptron import train_perceptron

    sub = featurized_tokens.where(F.col("conv_id") < "conv_00012")
    kw = dict(seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
              max_iterations=2, num_partitions=128)
    for fn, extra in [
        (train_perceptron, {}),
        (train_online, {"method": "arow"}),
        (train_l2sgd, {"c2": 1.0}),
    ]:
        tree = fn(sub, **kw, **extra, tree_reduce_threshold=64)
        coll = fn(sub, **kw, **extra, tree_reduce_threshold=1 << 30)
        assert np.allclose(tree.state_w, coll.state_w, rtol=1e-9, atol=1e-11), fn
        assert np.allclose(tree.trans_w, coll.trans_w, rtol=1e-9, atol=1e-11), fn


def test_featurize_hash_lookup_matches_dict(spark):
    """featurize_sequences' broadcast sorted-hash interning (the
    possible_states path) produces IDENTICAL sequence rows to the
    Python-dict path at a ~10^5-attribute dictionary — attribute
    strings never cross to Python in hash mode."""
    import pandas as pd
    from crfsuite_spark.train.trainer import featurize_sequences

    rng = np.random.default_rng(5)
    rows = []
    for ci in range(300):
        T = 12
        for ti in range(T):
            # mostly-unique attrs build a ~10^5 dictionary; a few shared
            # + some never-in-dict attrs exercise dedup and unknown-drop
            attrs = [f"a{ci}_{ti}_{j}" for j in range(18)]
            attrs += [f"a_shared{rng.integers(0, 50)}" for _ in range(2)]
            attrs.append("unknown-attr-never-in-dict" + str(rng.integers(10)))
            rows.append((f"c{ci:04d}", 0, ti, attrs, "O" if ti % 2 else "B"))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, token_idx int, attrs array<string>, label string",
    ).persist()
    vocab = sorted({a for r in rows for a in r[3] if a.startswith("a")})
    assert len(vocab) > 60_000
    a2i = {a: i for i, a in enumerate(vocab)}
    l2i = {"B": 0, "O": 1}
    kw = dict(seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
              num_partitions=8)
    via_dict = featurize_sequences(df, a2i, l2i, **kw).toPandas()
    # hash table: xxhash64 of each vocab string via one Spark job
    hp = (
        spark.createDataFrame(pd.DataFrame({"a": vocab, "aid": range(len(vocab))}))
        .select(F.xxhash64("a").alias("h"), "aid").toPandas()
    )
    h = hp["h"].to_numpy(np.int64)
    order = np.argsort(h, kind="stable")
    lookup = (h[order], hp["aid"].to_numpy(np.int64)[order])
    via_hash = featurize_sequences(df, None, l2i, attr_lookup=lookup, **kw).toPandas()
    df.unpersist()
    a = via_dict.sort_values("seq_id").reset_index(drop=True)
    b = via_hash.sort_values("seq_id").reset_index(drop=True)
    assert list(a["seq_id"]) == list(b["seq_id"])
    for c in ("labels", "aids", "offsets"):
        assert all(list(x) == list(y) for x, y in zip(a[c], b[c])), c


def test_possible_states_distributed_dict_no_string_materialization(spark):
    """possible_states at a ~10^5-attribute dictionary: training runs on
    the distributed sorted-id dictionary + broadcast hash table; with
    materialize_attrs=False no attribute string is ever pulled to the
    driver, yet the model decodes (pre-seeded hash table) and training
    makes progress."""
    from crfsuite_spark.decode.tagger import decode
    from crfsuite_spark.train.trainer import train_crf

    rows = []
    for ci in range(500):
        for ti in range(12):
            lab = "B" if ti % 3 == 0 else "O"
            # unique label-informative attrs → ~10^5-entry dictionary
            attrs = [f"{lab}u{ci}_{ti}_{j}" for j in range(16)]
            attrs.append(f"{lab}shared")
            rows.append((f"c{ci:04d}", 0, ti, attrs, lab))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, token_idx int, attrs array<string>, label string",
    ).persist()
    log = []
    m = train_crf(
        df, ["conv_id", "turn_idx"], "token_idx",
        possible_states=True, materialize_attrs=False,
        max_iterations=6, num_partitions=8, log=log,
    )
    assert m.attrs == [] and m.meta["n_attributes"] > 90_000
    assert m.state_w.shape[0] == m.meta["n_attributes"]
    assert len(log) >= 2 and log[-1]["loss"] < log[0]["loss"]
    out = decode(df, m, ["conv_id", "turn_idx"], "token_idx",
                 with_marginal=False).toPandas()
    gold = {(r[0], r[1], r[2]): r[4] for r in rows}
    acc = np.mean([
        gold[(r.conv_id, r.turn_idx, r.token_idx)] == r.label
        for r in out.itertuples()
    ])
    df.unpersist()
    assert acc > 0.95, acc

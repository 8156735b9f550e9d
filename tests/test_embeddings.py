"""TransE embedding training + link-prediction ranks — kg/embeddings.py.

Training gates: loss decreases, runs are bit-deterministic, and on a
structured graph the learned embeddings beat random at filtered tail
prediction. Rank machinery is cross-checked against a brute-force
Python evaluator here and against DuckDB by the driver oracle
(kg_link_pred_ranks uses closed-form hash embeddings both engines can
build).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crfsuite_spark.kg.embeddings import (
    TransEModel,
    build_vocab,
    evaluate_link_prediction,
    link_prediction_ranks,
    train_transe,
)


def _block_graph():
    """Two relation-disjoint blocks: r1 maps a* → b*, r2 maps b* → c*.
    Structure a translation model can fit."""
    rows = []
    for i in range(6):
        rows.append((f"a{i}", "r1", f"b{i}"))
        rows.append((f"b{i}", "r2", f"c{i}"))
        rows.append((f"a{i}", "r1", f"b{(i + 1) % 6}"))
    return rows


@pytest.fixture(scope="module")
def graph(spark):
    return spark.createDataFrame(_block_graph(), ["subj", "pred", "obj"])


def test_vocab_sorted_and_complete(graph):
    ents, rels = build_vocab(graph)
    assert rels == ["r1", "r2"]
    assert ents == sorted(ents) and len(ents) == 18


def test_training_loss_decreases(graph):
    model = train_transe(graph, dim=16, epochs=25, lr=0.5, seed=7)
    losses = [e["loss"] for e in model.log]
    assert len(losses) == 25
    assert losses[-1] < 0.5 * losses[0]
    # entities stay on the unit sphere (the TransE projection step)
    norms = np.linalg.norm(model.ent_emb, axis=1)
    assert np.allclose(norms, 1.0)


def test_training_deterministic(graph):
    m1 = train_transe(graph, dim=8, epochs=5, lr=0.3, seed=11)
    m2 = train_transe(graph, dim=8, epochs=5, lr=0.3, seed=11)
    assert np.array_equal(m1.ent_emb, m2.ent_emb)
    assert np.array_equal(m1.rel_emb, m2.rel_emb)
    m3 = train_transe(graph, dim=8, epochs=5, lr=0.3, seed=12)
    assert not np.array_equal(m1.ent_emb, m3.ent_emb)


def _brute_force_ranks(model, tests, known):
    """Reference filtered-rank evaluator: python loops only."""
    e2i = {e: i for i, e in enumerate(model.entities)}
    r2i = {r: i for i, r in enumerate(model.relations)}
    out = {}
    for s, p, o in tests:
        q = model.ent_emb[e2i[s]] + model.rel_emb[r2i[p]]
        d = ((q[None, :] - model.ent_emb) ** 2).sum(axis=1)
        d_true = d[e2i[o]]
        rank = 1
        for cand in model.entities:
            if cand == o or (s, p, cand) in known:
                continue
            if d[e2i[cand]] < d_true:
                rank += 1
        out[(s, p, o)] = rank
    return out


def test_ranks_match_brute_force(spark, graph):
    rows = _block_graph()
    model = train_transe(graph, dim=8, epochs=10, lr=0.3, seed=3)
    tests = rows[:8]
    exp = _brute_force_ranks(model, tests, set(rows))
    got = {
        (r.subj, r.pred, r.obj): r.rank
        for r in link_prediction_ranks(
            model, spark.createDataFrame(tests, ["subj", "pred", "obj"]),
            known_triples=graph,
        ).collect()
    }
    assert got == exp


def test_ranks_unfiltered_vs_filtered(spark, graph):
    model = train_transe(graph, dim=8, epochs=10, lr=0.3, seed=3)
    tests = spark.createDataFrame(_block_graph()[:8], ["subj", "pred", "obj"])
    raw = link_prediction_ranks(model, tests)
    filt = link_prediction_ranks(model, tests, known_triples=graph)
    joined = raw.withColumnRenamed("rank", "raw_rank").join(
        filt, ["subj", "pred", "obj"])
    assert joined.filter(F.col("rank") > F.col("raw_rank")).count() == 0


def test_link_prediction_beats_random(spark, graph):
    """Filtered MRR on held-in triples must far exceed the random
    baseline (E[MRR] ≈ H(n)/n ≈ 0.19 for n=18 entities)."""
    model = train_transe(graph, dim=16, epochs=40, lr=0.5, seed=7)
    ranks = link_prediction_ranks(model, graph, known_triples=graph)
    m = evaluate_link_prediction(ranks).collect()[0]
    assert m.n == 18
    assert m.mrr > 0.5
    assert m.hits3 > 0.6


def test_to_frames_roundtrip(spark, graph):
    model = train_transe(graph, dim=4, epochs=2, lr=0.3, seed=5)
    ent, rel = model.to_frames(spark)
    assert ent.count() == 18 and rel.count() == 2
    row = ent.filter(F.col("entity") == "a0").collect()[0]
    assert np.allclose(row.embedding,
                       model.ent_emb[model.entities.index("a0")])


def test_partition_count_invariance(spark, graph):
    """Full-batch gradients: 1-partition and 8-partition runs agree to
    payload tolerance (per-partition sums are float64; the shipped
    payload is float32, so partitioning shifts results by ~1e-7
    relative — orders below any training-relevant signal)."""
    m1 = train_transe(graph, dim=8, epochs=5, lr=0.3, seed=11,
                      num_partitions=1)
    m8 = train_transe(graph, dim=8, epochs=5, lr=0.3, seed=11,
                      num_partitions=8)
    assert np.allclose(m1.ent_emb, m8.ent_emb, atol=1e-5)
    assert np.allclose(m1.rel_emb, m8.rel_emb, atol=1e-5)


def test_from_frames_roundtrip(spark, graph, tmp_path):
    model = train_transe(graph, dim=4, epochs=2, lr=0.3, seed=5)
    ent, rel = model.to_frames(spark)
    ent.write.parquet(str(tmp_path / "ent"))
    rel.write.parquet(str(tmp_path / "rel"))
    loaded = TransEModel.from_frames(
        spark.read.parquet(str(tmp_path / "ent")),
        spark.read.parquet(str(tmp_path / "rel")),
    )
    assert loaded.entities == model.entities
    assert loaded.relations == model.relations
    assert np.array_equal(loaded.ent_emb, model.ent_emb)
    assert np.array_equal(loaded.rel_emb, model.rel_emb)


def test_warm_start_incremental(spark, graph):
    """The incremental-maintenance hook: fine-tuning a trained model
    on an extended graph keeps known vectors as the starting point
    (epochs=0 shows the splice), and a short warm refresh fits new
    triples far faster than the same budget from scratch."""
    base = train_transe(graph, dim=8, epochs=20, lr=0.5, seed=7)
    extra = spark.createDataFrame(
        _block_graph() + [("c0", "r1", "d0"), ("c1", "r1", "d1")],
        ["subj", "pred", "obj"],
    )
    spliced = train_transe(extra, dim=8, epochs=0, lr=0.5, seed=7,
                           init=base)
    i_old = spliced.entities.index("a0")
    assert np.array_equal(spliced.ent_emb[i_old],
                          base.ent_emb[base.entities.index("a0")])
    assert "d0" in spliced.entities and "d0" not in base.entities

    warm = train_transe(extra, dim=8, epochs=5, lr=0.5, seed=7, init=base)
    cold = train_transe(extra, dim=8, epochs=5, lr=0.5, seed=7)
    assert warm.log[-1]["loss"] < cold.log[-1]["loss"]

    with pytest.raises(ValueError, match="dim"):
        train_transe(extra, dim=4, epochs=1, init=base)


def _brute_force_ranks_dot(model, tests, known):
    """Reference filtered-rank evaluator for DistMult (higher dot =
    better)."""
    e2i = {e: i for i, e in enumerate(model.entities)}
    r2i = {r: i for i, r in enumerate(model.relations)}
    out = {}
    for s, p, o in tests:
        q = model.ent_emb[e2i[s]] * model.rel_emb[r2i[p]]
        sc = model.ent_emb @ q
        s_true = sc[e2i[o]]
        rank = 1
        for cand in model.entities:
            if cand == o or (s, p, cand) in known:
                continue
            if sc[e2i[cand]] > s_true:
                rank += 1
        out[(s, p, o)] = rank
    return out


def test_distmult_loss_decreases_and_beats_random(spark, graph):
    from crfsuite_spark.kg.embeddings import train_distmult

    model = train_distmult(graph, dim=16, epochs=40, lr=0.5, seed=7)
    assert model.scoring == "distmult"
    losses = [e["loss"] for e in model.log]
    assert losses[-1] < 0.5 * losses[0]
    ranks = link_prediction_ranks(model, graph, known_triples=graph)
    m = evaluate_link_prediction(ranks).collect()[0]
    assert m.mrr > 0.4  # random baseline ≈ 0.19 at 18 entities


def test_distmult_ranks_match_brute_force(spark, graph):
    from crfsuite_spark.kg.embeddings import train_distmult

    rows = _block_graph()
    model = train_distmult(graph, dim=8, epochs=10, lr=0.3, seed=3)
    tests = rows[:8]
    exp = _brute_force_ranks_dot(model, tests, set(rows))
    got = {
        (r.subj, r.pred, r.obj): r.rank
        for r in link_prediction_ranks(
            model, spark.createDataFrame(tests, ["subj", "pred", "obj"]),
            known_triples=graph,
        ).collect()
    }
    assert got == exp


def test_kge_scoring_mismatch_raises(spark, graph):
    from crfsuite_spark.kg.embeddings import train_distmult

    base = train_transe(graph, dim=8, epochs=1, seed=7)
    with pytest.raises(ValueError, match="scoring"):
        train_distmult(graph, dim=8, epochs=1, seed=7, init=base)
    with pytest.raises(ValueError, match="unknown scoring"):
        from crfsuite_spark.kg.embeddings import train_kge
        train_kge(graph, scoring="rotatee")
    with pytest.raises(ValueError, match="dim must be even"):
        from crfsuite_spark.kg.embeddings import train_complex
        train_complex(graph, dim=7, epochs=1, seed=7)


def test_complex_score_matches_complex_arithmetic():
    """The Re‖Im-packed helpers equal literal numpy complex algebra:
    score, and all three gradients via finite differences on s."""
    from crfsuite_spark.kg.embeddings import (
        _cx_grad_h, _cx_grad_r, _cx_grad_t)

    rng = np.random.RandomState(0)
    d = 5
    h, r, t = rng.randn(3, 3, 2 * d)

    def as_cx(x):
        return x[..., :d] + 1j * x[..., d:]

    s_ref = np.real(np.sum(as_cx(h) * as_cx(r) * np.conj(as_cx(t)),
                           axis=-1))
    s_packed = (_cx_grad_t(h, r) * t).sum(axis=-1)
    assert np.allclose(s_packed, s_ref)
    # gradient identities: s is linear in each argument
    assert np.allclose((_cx_grad_h(r, t) * h).sum(axis=-1), s_ref)
    assert np.allclose((_cx_grad_r(h, t) * r).sum(axis=-1), s_ref)
    # finite differences on every packed coordinate of h, r, t
    eps = 1e-6
    for arr, grad in ((h, _cx_grad_h(r, t)), (r, _cx_grad_r(h, t)),
                      (t, _cx_grad_t(h, r))):
        for k in range(2 * d):
            up = arr.copy()
            up[..., k] += eps
            if arr is h:
                s_up = (_cx_grad_t(up, r) * t).sum(axis=-1)
            elif arr is r:
                s_up = (_cx_grad_t(h, up) * t).sum(axis=-1)
            else:
                s_up = (_cx_grad_t(h, r) * up).sum(axis=-1)
            assert np.allclose((s_up - s_packed) / eps, grad[..., k],
                               atol=1e-5)


def test_complex_loss_decreases_and_beats_random(spark, graph):
    from crfsuite_spark.kg.embeddings import train_complex

    model = train_complex(graph, dim=16, epochs=40, lr=0.5, seed=7)
    assert model.scoring == "complex"
    assert model.log[-1]["loss"] < model.log[0]["loss"]
    ranks = link_prediction_ranks(model, graph, known_triples=graph)
    mrr = evaluate_link_prediction(ranks).collect()[0]["mrr"]
    n_e = len(model.entities)
    # random filtered MRR ≈ H(n)/n; the trained model must clear 2×
    rand_mrr = sum(1.0 / k for k in range(1, n_e + 1)) / n_e
    assert mrr > 2 * rand_mrr


def test_complex_ranks_match_brute_force(spark, graph):
    from crfsuite_spark.kg.embeddings import train_complex

    rows = _block_graph()
    known = set(rows)
    model = train_complex(graph, dim=8, epochs=10, lr=0.3, seed=3)
    e2i = {e: i for i, e in enumerate(model.entities)}
    r2i = {r: i for i, r in enumerate(model.relations)}
    d = model.dim // 2

    def score(h, r, t):
        eh = model.ent_emb[e2i[h]]
        er = model.rel_emb[r2i[r]]
        et = model.ent_emb[e2i[t]]
        hc = eh[:d] + 1j * eh[d:]
        rc = er[:d] + 1j * er[d:]
        tc = et[:d] + 1j * et[d:]
        return float(np.real(np.sum(hc * rc * np.conj(tc))))

    exp = {}
    for h, r, t in set(rows):
        s_true = score(h, r, t)
        better = sum(
            1 for c in model.entities
            if c != t and (h, r, c) not in known and score(h, r, c) > s_true
        )
        exp[(h, r, t)] = better + 1
    got = {
        (r["subj"], r["pred"], r["obj"]): r["rank"]
        for r in link_prediction_ranks(
            model, graph, known_triples=graph,
        ).collect()
    }
    assert got == exp


def test_from_frames_restores_scoring(spark, graph, tmp_path):
    """A parquet roundtrip keeps the model's rank direction: the
    relation frame carries a ``scoring`` column, ``from_frames``
    reads it (explicit arg still overrides), and frames without the
    column (older writes / hand-built vector tables) default to
    transe."""
    from crfsuite_spark.kg.embeddings import train_complex

    model = train_complex(graph, dim=8, epochs=2, lr=0.3, seed=5)
    ent, rel = model.to_frames(spark)
    ent.write.parquet(str(tmp_path / "ent"))
    rel.write.parquet(str(tmp_path / "rel"))
    loaded = TransEModel.from_frames(
        spark.read.parquet(str(tmp_path / "ent")),
        spark.read.parquet(str(tmp_path / "rel")),
    )
    assert loaded.scoring == "complex"
    assert np.array_equal(loaded.ent_emb, model.ent_emb)
    # explicit override wins
    forced = TransEModel.from_frames(ent, rel, scoring="transe")
    assert forced.scoring == "transe"
    # legacy frames (no scoring column) fall back to transe
    legacy = TransEModel.from_frames(ent, rel.drop("scoring"))
    assert legacy.scoring == "transe"


def test_rotate_distance_gradients_finite_difference():
    """D(h,r,t) = ||h∘r − t||² in packed Re|Im form: the training
    branch's closed-form gradients (2·conj(r)∘d for h, 2·conj(h)∘d
    for r, −2d for t) match central finite differences."""
    from crfsuite_spark.kg.embeddings import _cx_grad_h, _cx_grad_t

    rng = np.random.RandomState(1)
    d = 4
    h, r, t = rng.randn(3, 5, 2 * d)

    def D(h_, r_, t_):
        return ((_cx_grad_t(h_, r_) - t_) ** 2).sum(axis=-1)

    dvec = _cx_grad_t(h, r) - t
    grads = {
        "h": 2.0 * _cx_grad_h(r, dvec),
        "r": 2.0 * _cx_grad_h(h, dvec),
        "t": -2.0 * dvec,
    }
    eps = 1e-6
    for name, arr in (("h", h), ("r", r), ("t", t)):
        for k in range(2 * d):
            up, dn = arr.copy(), arr.copy()
            up[..., k] += eps
            dn[..., k] -= eps
            args_up = {"h": h, "r": r, "t": t, name: up}
            args_dn = {"h": h, "r": r, "t": t, name: dn}
            fd = (D(args_up["h"], args_up["r"], args_up["t"])
                  - D(args_dn["h"], args_dn["r"], args_dn["t"])) / (2 * eps)
            assert np.allclose(fd, grads[name][..., k], atol=1e-5), (name, k)


def test_rotate_loss_decreases_and_relations_unit_modulus(spark, graph):
    from crfsuite_spark.kg.embeddings import train_rotate

    model = train_rotate(graph, dim=16, epochs=40, lr=0.5, seed=7)
    assert model.scoring == "rotate"
    assert model.log[-1]["loss"] < model.log[0]["loss"]
    # |r_j| = 1 for every packed complex component after every step
    d = model.dim // 2
    mod = np.sqrt(model.rel_emb[:, :d] ** 2 + model.rel_emb[:, d:] ** 2)
    assert np.allclose(mod, 1.0)
    ranks = link_prediction_ranks(model, graph, known_triples=graph)
    mrr = evaluate_link_prediction(ranks).collect()[0]["mrr"]
    n_e = len(model.entities)
    rand_mrr = sum(1.0 / k for k in range(1, n_e + 1)) / n_e
    assert mrr > 2 * rand_mrr


def test_rotate_ranks_match_brute_force(spark, graph):
    from crfsuite_spark.kg.embeddings import train_rotate

    rows = _block_graph()
    known = set(rows)
    model = train_rotate(graph, dim=8, epochs=10, lr=0.3, seed=3)
    e2i = {e: i for i, e in enumerate(model.entities)}
    r2i = {r: i for i, r in enumerate(model.relations)}
    d = model.dim // 2

    def dist(h, r, t):
        eh = model.ent_emb[e2i[h]]
        er = model.rel_emb[r2i[r]]
        et = model.ent_emb[e2i[t]]
        hc = eh[:d] + 1j * eh[d:]
        rc = er[:d] + 1j * er[d:]
        tc = et[:d] + 1j * et[d:]
        return float(np.sum(np.abs(hc * rc - tc) ** 2))

    exp = {}
    for h, r, t in set(rows):
        d_true = dist(h, r, t)
        better = sum(
            1 for c in model.entities
            if c != t and (h, r, c) not in known and dist(h, r, c) < d_true
        )
        exp[(h, r, t)] = better + 1
    got = {
        (r["subj"], r["pred"], r["obj"]): r["rank"]
        for r in link_prediction_ranks(
            model, graph, known_triples=graph,
        ).collect()
    }
    assert got == exp


def test_rotate_dim_must_be_even(spark, graph):
    from crfsuite_spark.kg.embeddings import train_rotate

    with pytest.raises(ValueError, match="dim must be even"):
        train_rotate(graph, dim=5, epochs=1, seed=7)

"""DSIR importance-resampling selection (operators/selection.py):
exact-value parity with an independent pure-Python reference, selection
behavior on a two-style corpus, determinism, and edge cases."""

import hashlib
import math
import re

import pytest

from crfsuite_spark.operators.selection import dsir_select, dsir_weights


def _ref_grams(text):
    toks = [t for t in re.split(r"\s+", (text or "").lower().strip()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _ref_bucket(gram, n_buckets, seed):
    h = hashlib.md5(f"{gram}:{seed}".encode()).hexdigest()[:8]
    return int(h, 16) % n_buckets


def _ref_logweights(raw, target, n_buckets, alpha, seed):
    """Independent reference: dict-based counts, float math."""
    ct, cr = [0] * n_buckets, [0] * n_buckets
    for counts, docs in ((ct, target), (cr, raw)):
        for _, text in docs:
            for g in _ref_grams(text):
                counts[_ref_bucket(g, n_buckets, seed)] += 1
    zt = math.log(sum(ct) + alpha * n_buckets)
    zr = math.log(sum(cr) + alpha * n_buckets)
    lr = [
        (math.log(ct[b] + alpha) - zt) - (math.log(cr[b] + alpha) - zr)
        for b in range(n_buckets)
    ]
    return {
        i: sum(lr[_ref_bucket(g, n_buckets, seed)] for g in _ref_grams(t))
        for i, t in raw
    }


RAW = [
    (0, "the cat sat on the mat"),
    (1, "stock market prices rose sharply today"),
    (2, "the dog sat on the rug"),
    (3, "quarterly earnings beat market expectations"),
    (4, "a cat and a dog"),
    (5, "bond yields and market futures"),
    (6, ""),
    (7, None),
    (8, "cat"),
]
TARGET = [
    (100, "the cat chased the dog"),
    (101, "a dog sat near the cat"),
    (102, "cats and dogs sat together"),
]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id int, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id int, text string")
    return raw, tgt


def test_dsir_weights_match_reference(spark, frames):
    """Spark logweights == the independent Python reference to 1e-9,
    including empty/NULL/single-token docs (weight 0.0 / unigram-only)."""
    raw, tgt = frames
    got = {
        r["doc_id"]: (r["logweight"], r["n_grams"])
        for r in dsir_weights(raw, tgt, n_buckets=256, seed=7).collect()
    }
    want = _ref_logweights(RAW, TARGET, 256, 1.0, 7)
    assert set(got) == set(want)
    for d, w in want.items():
        assert got[d][0] == pytest.approx(w, abs=1e-9), d
    assert got[6] == (0.0, 0)  # empty text
    assert got[7] == (0.0, 0)  # NULL text
    assert got[8][1] == 1      # single token: unigram only, no bigram


def test_dsir_select_prefers_target_like(spark, frames):
    """Animal-style target → the animal-style raw docs (0,2,4,8) carry
    higher weights than the finance docs, and top-4 selection is
    dominated by them."""
    raw, tgt = frames
    w = {
        r["doc_id"]: r["logweight"]
        for r in dsir_weights(raw, tgt, n_buckets=256, seed=7).collect()
    }
    animal, finance = [0, 2, 4, 8], [1, 3, 5]
    assert min(w[d] for d in animal) > max(w[d] for d in finance)
    picked = {
        r["doc_id"]
        for r in dsir_select(
            raw, tgt, k=4, n_buckets=256, seed=7, temperature=0.25
        ).collect()
    }
    assert len(picked) == 4
    assert len(picked & set(animal)) >= 3
    # T→0 degenerates to deterministic top-k by weight: exactly the
    # four highest-weight eligible docs (8, 4, 2, 0 per the weight
    # ordering asserted above).
    argmax = {
        r["doc_id"]
        for r in dsir_select(
            raw, tgt, k=4, n_buckets=256, seed=7, temperature=1e-6
        ).collect()
    }
    assert argmax == {8, 4, 2, 0}


def test_dsir_deterministic_under_repartition(spark, frames):
    """Same weights and same selected set regardless of input
    partitioning (portable-hash everything; no RNG state)."""
    raw, tgt = frames
    a = dsir_select(raw, tgt, k=5, n_buckets=256, seed=7).collect()
    b = dsir_select(
        raw.repartition(13), tgt.repartition(5), k=5, n_buckets=256, seed=7
    ).collect()
    key = lambda rows: sorted(
        (r["doc_id"], round(r["gumbel_key"], 9)) for r in rows
    )
    assert key(a) == key(b)


def test_dsir_bucket_guard(spark, frames):
    raw, tgt = frames
    with pytest.raises(ValueError):
        dsir_weights(raw, tgt, n_buckets=1 << 20)


def test_dsir_scoring_scan_local(spark, frames):
    """The scoring plan is map-only: after the two bounded fit jobs run
    eagerly, the returned frame is scan + project — ZERO Exchange (the
    module-docstring contract: corpus text never shuffles)."""
    raw, tgt = frames
    out = dsir_weights(raw, tgt, n_buckets=64, seed=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_dsir_predicate_target_matches_frame_target(spark, frames):
    """The one-scan predicate-target fit produces bit-identical weights
    and selection to the two-frame fit when the predicate selects the
    same rows (here: the animal-style docs double as the target)."""
    from pyspark.sql import functions as F

    raw, _ = frames
    animal_ids = [0, 2, 4, 8]
    tgt_frame = raw.where(F.col("doc_id").isin(animal_ids))
    pred = F.col("doc_id").isin(animal_ids)
    wa = {r["doc_id"]: r["logweight"]
          for r in dsir_weights(raw, tgt_frame, n_buckets=256, seed=7).collect()}
    wb = {r["doc_id"]: r["logweight"]
          for r in dsir_weights(raw, pred, n_buckets=256, seed=7).collect()}
    assert wa == wb
    sa = {(r["doc_id"], r["gumbel_key"]) for r in
          dsir_select(raw, tgt_frame, k=4, n_buckets=256, seed=7).collect()}
    sb = {(r["doc_id"], r["gumbel_key"]) for r in
          dsir_select(raw, pred, k=4, n_buckets=256, seed=7).collect()}
    assert sa == sb

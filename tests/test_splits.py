"""KG train/valid/test splitting (kg/splits.py) vs a pure-Python
mirror of the draw and the training-entity closure."""

import hashlib

import pytest

from crfsuite_spark.kg.splits import split_triples

SCALE = 1_000_000


def _draw(subj, pred, obj, seed):
    h = int(
        hashlib.md5(f"{subj}:{pred}:{obj}:{seed}".encode()).hexdigest()[:8], 16
    )
    return h % SCALE


def _mirror(rows, weights, seed):
    total = sum(weights)
    t_train = int(weights[0] / total * SCALE)
    t_valid = t_train + int(weights[1] / total * SCALE)
    out = []
    for r in rows:
        d = _draw(r[2], r[3], r[4], seed)
        split = "train" if d < t_train else ("valid" if d < t_valid else "test")
        out.append(r + (split,))
    ents = {r[2] for r in out if r[5] == "train"} | {
        r[4] for r in out if r[5] == "train"
    }
    return [
        r for r in out if r[5] == "train" or (r[2] in ents and r[4] in ents)
    ]


@pytest.fixture(scope="module")
def mentions(spark, synth):
    # real generator triples: entity surfaces repeat across mentions
    import os

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    return spark.read.parquet(
        os.path.join(fixtures, "gold_triples_synthetic.parquet")
    )


def test_split_matches_pure_python_mirror(mentions):
    rows = [tuple(r) for r in mentions.collect()]
    for weights, seed in [((0.8, 0.1, 0.1), 42), ((0.5, 0.25, 0.25), 7)]:
        got = sorted(
            tuple(r)
            for r in split_triples(mentions, weights=weights, seed=seed).collect()
        )
        exp = sorted(_mirror(rows, weights, seed))
        assert got == exp, (weights, seed)
        # and the protocol invariant directly: no eval-only entities
        ents = {r[2] for r in got if r[5] == "train"} | {
            r[4] for r in got if r[5] == "train"
        }
        for r in got:
            if r[5] != "train":
                assert r[2] in ents and r[4] in ents


def test_duplicate_mentions_share_split(spark):
    dup = spark.createDataFrame(
        [("c1", 1, "a", "p", "b"), ("c9", 9, "a", "p", "b")],
        "conv_id string, turn_idx int, subj string, pred string, obj string",
    )
    # seed=4 puts (a,p,b) in train (md5 draw 3897 < 340000)
    out = split_triples(dup, weights=(0.34, 0.33, 0.33), seed=4).collect()
    assert [r["split"] for r in out] == ["train", "train"]
    # seed=1 puts it in valid: with no training graph the closure is
    # empty and the protocol drops every evaluation row
    assert split_triples(dup, weights=(0.34, 0.33, 0.33), seed=1).count() == 0


def test_bad_weights_raise(spark, mentions):
    with pytest.raises(ValueError):
        split_triples(mentions, weights=(1.0, -0.1, 0.1))

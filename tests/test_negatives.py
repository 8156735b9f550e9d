"""Type-consistent corrupt-tail negative sampling (kg/negatives.py)."""

import pytest

from crfsuite_spark.kg.negatives import negative_samples

ROWS = [
    # conv, turn, subj, pred, obj
    ("c1", 1, "per:ada", "works_at", "org:acme"),
    ("c1", 2, "per:bob", "works_at", "org:initech"),
    ("c1", 3, "org:acme", "located_in", "loc:berlin"),
    ("c2", 1, "per:ada", "visited", "loc:oslo"),
    ("c2", 2, "per:ada", "visited", "loc:berlin"),
    # duplicate mention of row 0 (another conv)
    ("c2", 3, "per:ada", "works_at", "org:acme"),
    ("c2", 4, "per:bob", "visited", "loc:tokyo"),
    # 'misc' type with a single entity -> no negative possible
    ("c2", 5, "per:bob", "saw", "misc:thing"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, subj string, pred string, obj string"
    )


def test_negatives_typed_excluded_and_counted(triples):
    out = negative_samples(triples, k=3, seed=7).collect()
    # 7 eligible mention rows (misc:thing dropped) x 3 ranks
    assert len(out) == 21
    for r in out:
        assert r["neg_obj"] != r["obj"]
        assert r["neg_obj"].split(":")[0] == r["obj"].split(":")[0]
        assert 0 <= r["neg_rank"] < 3
    assert not [r for r in out if r["obj"] == "misc:thing"]


def test_negatives_deterministic_and_triple_keyed(triples):
    a = sorted(map(tuple, negative_samples(triples, k=2, seed=7).collect()))
    b = sorted(map(tuple, negative_samples(triples, k=2, seed=7).collect()))
    assert a == b
    # duplicate mentions of the SAME triple draw the SAME negatives
    per_mention = {}
    for r in negative_samples(triples, k=2, seed=7).collect():
        key = (r["subj"], r["pred"], r["obj"], r["neg_rank"])
        per_mention.setdefault(key, set()).add(r["neg_obj"])
    assert all(len(v) == 1 for v in per_mention.values())
    # a different seed moves at least one draw (loc pool has 3
    # entities, so its draws are mod-2 and seed-sensitive; the
    # two-entity org pool is forced regardless of seed)
    c = sorted(map(tuple, negative_samples(triples, k=2, seed=8).collect()))
    assert a != c


def test_negatives_two_entity_type_flips(triples):
    # org type has exactly 2 entities: the negative MUST be the other
    out = [
        r
        for r in negative_samples(triples, k=2, seed=7).collect()
        if r["obj"].startswith("org:")
    ]
    assert out
    flip = {"org:acme": "org:initech", "org:initech": "org:acme"}
    for r in out:
        assert r["neg_obj"] == flip[r["obj"]]

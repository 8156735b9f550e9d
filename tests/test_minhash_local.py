"""Bit-exactness of the driver-side MinHash mirror
(operators/minhash_local.py) against the distributed pipeline — the
contract that lets kg/linking.py switch paths on input size without the
driver correctness harness seeing any difference.
"""

import random
import string

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crfsuite_spark.operators import minhash_local as ml
from crfsuite_spark.operators.minhash import (
    minhash_self_pairs,
    minhash_signature,
)


def _rand_strings(n, seed, maxlen=40, alphabet=string.ascii_lowercase + "0123456789 "):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        L = rng.randrange(0, maxlen)
        out.append("".join(rng.choice(alphabet) for _ in range(L)))
    return out


def test_xxh64_string_parity(spark):
    texts = _rand_strings(200, 1) + ["", "a", "ab", "abc", "abcd" * 20,
                                     "naïve café — ünïcødé ✓", "x" * 31, "x" * 32, "x" * 33]
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    exp = [ml.xxh64_bytes(t.encode("utf-8")) for t in texts]
    assert got == exp


def test_xxh64_long_parity(spark):
    rng = random.Random(2)
    vals = [rng.randrange(-(2 ** 63), 2 ** 63) for _ in range(200)] + [0, 1, -1, 2 ** 63 - 1, -(2 ** 63)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    exp = [ml.xxh64_long(v) for v in vals]
    assert got == exp


def test_xxh64_multicol_long_parity(spark):
    rng = random.Random(3)
    rows = [tuple(rng.randrange(0, 2 ** 31) for _ in range(4)) for _ in range(100)]
    df = spark.createDataFrame(rows, "a long, b long, c long, d long")
    got = [r[0] for r in df.select(F.xxhash64("a", "b", "c", "d")).collect()]
    exp = [ml.xxh64_longs(list(r)) for r in rows]
    assert got == exp


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5_32"])
def test_signature_parity(spark, hash_fn):
    texts = [t for t in _rand_strings(60, 4) if t]
    df = spark.createDataFrame([(str(i), t) for i, t in enumerate(texts)], "id string, text string")
    sig = minhash_signature(df, "id", "text", n_hashes=8, shingle_size=3,
                            hash_fn=hash_fn).toPandas().set_index("id").sort_index()
    sets, mh = ml.local_signatures(texts, 8, 3, hash_fn=hash_fn)
    for i, t in enumerate(texts):
        row = sig.loc[str(i)]
        assert list(row["__hs"]) == sets[i], t
        assert [row[f"mh{j}"] for j in range(8)] == list(mh[i]), t


def test_xxh64_windows_matches_scalar():
    import numpy as np

    rng = random.Random(9)
    for k in (1, 3, 4, 5, 8, 11, 16, 31):
        data = bytes(rng.randrange(256) for _ in range(200 + k))
        arr = np.frombuffer(data, dtype=np.uint8)
        win = np.lib.stride_tricks.sliding_window_view(arr, k)
        got = ml.xxh64_windows(win).view(np.int64)
        exp = [ml.xxh64_bytes(data[i:i + k]) for i in range(len(data) - k + 1)]
        assert got.tolist() == exp, f"k={k}"


@pytest.mark.parametrize("texts", [
    ["hello world text", "aa", "", "x" * 40, "abc abc abc abc"],
    ["naïve café ünïcode", "mixed ascii and ünïcode", "日本語テキスト"],
])
def test_numpy_signature_impl_parity(spark, texts):
    """impl='numpy' is bit-identical to the HOF path: same __hs arrays
    (order included), same signatures — ASCII vector path and
    non-ASCII scalar fallback both covered; NULL text drops in both."""
    rows = [(str(i), t) for i, t in enumerate(texts)] + [("null", None)]
    df = spark.createDataFrame(rows, "id string, text string")
    hof = (minhash_signature(df, "id", "text", 8, 3)
           .toPandas().sort_values("id").reset_index(drop=True))
    npy = (minhash_signature(df, "id", "text", 8, 3, impl="numpy")
           .toPandas().sort_values("id").reset_index(drop=True))
    assert list(hof["id"]) == list(npy["id"])  # NULL dropped in both
    for i in range(len(hof)):
        assert list(hof.loc[i, "__hs"]) == list(npy.loc[i, "__hs"]), texts
        for j in range(8):
            assert hof.loc[i, f"mh{j}"] == npy.loc[i, f"mh{j}"]


def test_self_pairs_numpy_impl_parity(spark):
    rng = random.Random(12)
    base = _rand_strings(25, 13, maxlen=30)
    texts = [b + " tail" for b in base] + [b + " tail2" for b in base if rng.random() < 0.6]
    ids = [f"d{i:03d}" for i in range(len(texts))]
    df = spark.createDataFrame(list(zip(ids, texts)), "id string, text string")
    outs = []
    for impl in ("hof", "numpy"):
        o = minhash_self_pairs(df, "id", "text", 16, 8, 5, 0.5, impl=impl)
        outs.append(o.toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
        for c in o.pinned_caches:
            c.unpersist()
    assert len(outs[0]) > 0
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_self_pairs_parity(spark):
    # near-dup-rich corpus: templated strings with small perturbations
    rng = random.Random(5)
    base = _rand_strings(30, 6, maxlen=25)
    texts = []
    for b in base:
        texts.append(b + " company")
        if rng.random() < 0.7:
            texts.append(b + " companx")  # near-dup of the above
    ids = [f"id{i:03d}" for i in range(len(texts))]
    df = spark.createDataFrame(list(zip(ids, texts)), "id string, text string")
    dist = minhash_self_pairs(df, "id", "text", n_hashes=16, bands=8,
                              shingle_size=3, jaccard_threshold=0.6)
    got = dist.toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    for c in dist.pinned_caches:
        c.unpersist()
    loc = ml.local_self_pairs(ids, texts, n_hashes=16, bands=8,
                              shingle_size=3, jaccard_threshold=0.6)
    loc = loc.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(got) > 0  # the fixture must actually exercise pairs
    pd.testing.assert_frame_equal(got, loc)  # bit-exact incl. jaccard


def test_fuzzy_best_parity(spark):
    from crfsuite_spark.kg.linking import _fuzzy_best, normalize_surface

    aliases = [
        ("acme corporation", "org:acme", 5.0),
        ("acme corp", "org:acme", 4.0),
        ("acme corporation", "org:acme2", 5.0),  # multi-entity alias
        ("zeta systems", "org:zeta", 3.0),
        ("dave miller", "per:dave", 2.0),
        ("dav miller", "per:dave2", None),  # NULL weight -> -inf
    ]
    misses = ["acme corporatin", "zeta system", "dav miler", "qqqqq zzzzz"]
    alias_df = spark.createDataFrame(
        [(a, c, w, "x", "t") for a, c, w in aliases],
        "alias string, canonical_id string, weight double, canonical_name string, entity_type string",
    )
    miss_df = spark.createDataFrame([(m,) for m in misses], "__norm string")
    dist = (
        _fuzzy_best(miss_df, alias_df, 0.3)
        .toPandas().sort_values("__norm").reset_index(drop=True)
    )
    dict_rows = [
        (a, c, w if w is not None else float("-inf")) for a, c, w in aliases
    ]
    loc = ml.local_fuzzy_best(misses, dict_rows, jaccard_threshold=0.3)
    loc = (
        pd.DataFrame(loc, columns=["__norm", "__fuzzy_id"])
        .sort_values("__norm").reset_index(drop=True)
    )
    assert len(dist) > 0
    pd.testing.assert_frame_equal(dist, loc)


def test_link_mentions_paths_agree_randomized(spark):
    """End-to-end randomized cross-path check: for several seeded
    corpora of misspelled/unknown surfaces, the default (driver-mirror)
    path and the fully-distributed path (fuzzy_collect_threshold=0)
    produce identical (surface, canonical_id, link_method) sets, and
    canonicalize_surrogates agrees across its two paths on top."""
    from crfsuite_spark.kg.linking import canonicalize_surrogates, link_mentions

    aliases = [
        ("acme corporation", "org:acme", 5.0),
        ("acme corp", "org:acme", 4.0),
        ("zeta systems", "org:zeta", 3.0),
        ("dave miller", "per:dave", 2.0),
        ("miller holdings", "org:miller", 1.0),
    ]
    alias_df = spark.createDataFrame(
        [(a, c, w, "x", "t") for a, c, w in aliases],
        "alias string, canonical_id string, weight double, canonical_name string, entity_type string",
    )
    alpha = string.ascii_lowercase + " "
    for seed in range(5):
        rng = random.Random(100 + seed)
        surfaces = []
        for a, _, _ in aliases * 3:
            # perturb: drop/substitute a char, vary case, append noise
            s = list(a)
            op = rng.randrange(4)
            if op == 0 and len(s) > 3:
                del s[rng.randrange(len(s))]
            elif op == 1:
                s[rng.randrange(len(s))] = rng.choice(alpha)
            elif op == 2:
                s.append(rng.choice(alpha))
            surfaces.append("".join(s).title())
        surfaces += ["".join(rng.choice(alpha) for _ in range(8)) for _ in range(5)]
        rng.shuffle(surfaces)
        m = spark.createDataFrame([(s,) for s in surfaces], "surface string")
        key = lambda rows: sorted(
            (r["surface"], r["canonical_id"], r["link_method"]) for r in rows
        )
        a_rows = link_mentions(m, alias_df, fuzzy=True, jaccard_threshold=0.4)
        b_rows = link_mentions(m, alias_df, fuzzy=True, jaccard_threshold=0.4,
                               fuzzy_collect_threshold=0)
        assert key(a_rows.collect()) == key(b_rows.collect()), f"seed {seed}"
        ca = canonicalize_surrogates(a_rows, jaccard_threshold=0.5)
        cb = canonicalize_surrogates(b_rows, jaccard_threshold=0.5,
                                     driver_threshold=0)
        assert key(ca.collect()) == key(cb.collect()), f"canon seed {seed}"


def test_pair_cap_returns_none():
    texts = ["same text here"] * 100  # every row collides in every band
    ids = [f"i{i}" for i in range(100)]
    assert ml.local_self_pairs(ids, texts, pair_cap=10) is None

"""domain_divergence (functions/analysis.py): parity with a pure-Python
reference and the basic information-theory invariants."""

import hashlib
import math

import pytest

from crfsuite_spark.functions.analysis import domain_divergence

B = 64
A = 1.0


def _bucket(tok):
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B


def _ref(rows):
    counts, keys = {}, set()
    for key, text in rows:
        keys.add(key)
        for tok in text.lower().strip().split():
            counts[(key, _bucket(tok))] = counts.get((key, _bucket(tok)), 0) + 1
    nk = {k: sum(c for (kk, _), c in counts.items() if kk == k) for k in keys}
    cb = [sum(counts.get((k, b), 0) for k in keys) for b in range(B)]
    n = sum(cb)
    out = {}
    for k in keys:
        kl = js = 0.0
        for b in range(B):
            p = (counts.get((k, b), 0) + A) / (nk[k] + A * B)
            q = (cb[b] + A) / (n + A * B)
            m = (p + q) / 2.0
            kl += p * math.log(p / q)
            js += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
        out[k] = (nk[k], kl, js)
    return out


ROWS = [
    ("web", "the quick brown fox jumps over the lazy dog"),
    ("web", "a dog and a cat share the house"),
    ("web", "the weather is nice today"),
    ("code", "def main args return int zero exit"),
    ("code", "import numpy as np from spark import functions"),
    ("mixed", "the quick import numpy dog return"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "source string, text string")


def test_matches_python_reference(docs):
    got = {
        r["source"]: (r["n_tokens"], r["kl"], r["js"])
        for r in domain_divergence(docs, "source", "text", n_buckets=B).collect()
    }
    want = _ref(ROWS)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(round(want[k][1], 6), abs=1e-9)
        assert got[k][2] == pytest.approx(round(want[k][2], 6), abs=1e-9)


def test_invariants(docs):
    out = {r["source"]: r for r in
           domain_divergence(docs, "source", "text", n_buckets=B).collect()}
    for k, r in out.items():
        assert r["kl"] >= 0.0, k
        assert 0.0 <= r["js"] <= math.log(2) + 1e-9, k
    # code is farther from the (web-dominated) corpus than web is
    assert out["code"]["kl"] > out["web"]["kl"]
    assert out["code"]["js"] > out["web"]["js"]

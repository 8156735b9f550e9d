"""Lexical relevance (operators/relevance.py): exact parity with a
pure-Python mirror on a hand-built corpus including NULL/empty
documents, plus the contract corners (absent token-less docs, query
multiplicity ignored, empty query rejected)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from crfsuite_spark.operators.relevance import (
    bm25_score,
    term_frequencies,
    tfidf_terms,
)

DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the dog sat"),
    ("d3", "cat CAT  cat"),  # case-fold + multi-space
    ("d4", ""),  # token-less: absent from index, counts toward N
    ("d5", None),  # NULL text: same
    ("d6", "a completely different document entirely"),
]


def _tok(s):
    return s.strip().lower().split() if s and s.strip() else []


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_term_frequencies_mirror(spark, docs):
    got = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in term_frequencies(docs).collect()
    }
    exp = {}
    for d, t in DOCS:
        for term, c in Counter(_tok(t)).items():
            exp[(d, term)] = c
    assert got == exp
    assert ("d3", "cat") in got and got[("d3", "cat")] == 3
    assert not any(d in ("d4", "d5") for d, _ in got)


def test_tfidf_mirror(spark, docs):
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"])
        for r in tfidf_terms(docs).collect()
    }
    n = len(DOCS)  # token-less docs count toward N
    dfreq = Counter(term for _, t in DOCS for term in set(_tok(t)))
    for d, t in DOCS:
        for term, c in Counter(_tok(t)).items():
            tf, df, w = got[(d, term)]
            assert (tf, df) == (c, dfreq[term])
            assert w == pytest.approx(c * math.log(n / dfreq[term]))
    assert len(got) == sum(len(set(_tok(t))) for _, t in DOCS)
    # a term in every non-empty doc still has df < N -> idf > 0
    assert got[("d1", "the")][2] > 0


def _bm25_mirror(query, k1=1.2, b=0.75):
    n = len(DOCS)
    dls = {d: len(_tok(t)) for d, t in DOCS}
    avgdl = sum(dls.values()) / n
    dfreq = Counter(term for _, t in DOCS for term in set(_tok(t)))
    exp = {}
    for d, t in DOCS:
        cnt = Counter(_tok(t))
        s = 0.0
        for term in set(query):
            tf = cnt.get(term, 0)
            if not tf:
                continue
            idf = math.log(
                1 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5)
            )
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * dls[d] / avgdl)
            )
        if s:
            exp[d] = s
    return exp


def test_bm25_mirror(spark, docs):
    query = ["cat", "mat", "absent_term"]
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_score(docs, query).collect()
    }
    exp = _bm25_mirror(query)
    assert set(got) == set(exp) == {"d1", "d3"}
    for d in exp:
        assert got[d] == pytest.approx(exp[d])
    # d1 matches two query terms; d3 is shorter with tf=3 on one
    assert got["d3"] > 0 and got["d1"] > 0


def test_bm25_query_multiplicity_and_params(spark, docs):
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_score(docs, ["cat"]).collect()
    }
    dup = {
        r["doc_id"]: r["score"]
        for r in bm25_score(docs, ["cat", "cat"]).collect()
    }
    assert dup == base  # bag dedup: multiplicity carries no weight
    # b=0 removes length normalization entirely
    flat = {
        r["doc_id"]: r["score"]
        for r in bm25_score(docs, ["cat"], b=0.0).collect()
    }
    exp = _bm25_mirror(["cat"], b=0.0)
    for d in exp:
        assert flat[d] == pytest.approx(exp[d])
    with pytest.raises(ValueError, match="non-empty"):
        bm25_score(docs, [])

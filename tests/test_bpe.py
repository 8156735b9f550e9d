"""BPE vocabulary induction + tokenization (operators/bpe.py): merge
table exact-parity with an independent pure-Python reference
(Sennrich-style, dict/regex-based — deliberately a different code shape
from the operator's tuple incremental form), tokenization invariants,
determinism, OOV handling, and the scan-local plan contract."""

import re

import pytest

from crfsuite_spark.operators.bpe import (
    BPEModel,
    bpe_tokenize,
    bpe_train,
    word_histogram,
)

CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "widest widest widest"),
    (4, "the lowest of the low"),
    (5, ""),
    (6, None),
    (7, "LOW Low lOw"),  # casefolds into 'low'
]


# ---- independent reference: subword-nmt-style, string/regex based ----

def _ref_histogram(corpus):
    hist = {}
    for _, text in corpus:
        for w in (text or "").lower().split():
            hist[w] = hist.get(w, 0) + 1
    return hist


def _ref_train(corpus, num_merges, min_pair_freq=2):
    # words as space-joined symbol strings: "l o w</w>"
    vocab = {}
    for w, f in _ref_histogram(corpus).items():
        syms = list(w)
        syms[-1] += "</w>"
        vocab[" ".join(syms)] = f
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for word, f in vocab.items():
            s = word.split(" ")
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_freq:
            break
        merges.append(best)
        pat = re.compile(
            r"(?<!\S)" + re.escape(best[0] + " " + best[1]) + r"(?!\S)"
        )
        vocab = {pat.sub(best[0] + best[1], w): f for w, f in vocab.items()}
    return merges


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id int, text string")


def test_word_histogram(spark, corpus_df):
    got = {r["word"]: r["freq"] for r in word_histogram(corpus_df).collect()}
    assert got == _ref_histogram(CORPUS)
    pruned = {
        r["word"]: r["freq"]
        for r in word_histogram(corpus_df, min_freq=3).collect()
    }
    assert pruned == {w: f for w, f in got.items() if f >= 3}


def test_bpe_train_matches_reference(spark, corpus_df):
    """Merge tables identical to the independent reference for several
    merge budgets (incl. exhaustion: requesting more merges than pairs
    above min_pair_freq stops early at the same table)."""
    for k in (1, 5, 20, 200):
        model = bpe_train(corpus_df, num_merges=k)
        assert model.merges == _ref_train(CORPUS, k), k


def test_bpe_tokenize_roundtrip_and_oov(spark, corpus_df):
    model = bpe_train(corpus_df, num_merges=30)
    out = {
        r["doc_id"]: r["pieces"]
        for r in bpe_tokenize(corpus_df, model).collect()
    }
    # pieces concatenate back to the lowercased words (</w> marks ends)
    for doc_id, text in CORPUS:
        joined = "".join(out[doc_id])
        words = (text or "").lower().split()
        assert joined == "".join(w + "</w>" for w in words)
    assert out[5] == [] and out[6] == []  # empty + NULL text
    # frequent word fully merged into one piece
    assert "low</w>" in out[0]
    # OOV word segments deterministically into known subwords/chars
    oov = spark.createDataFrame([(9, "slowest")], "doc_id int, text string")
    pieces = bpe_tokenize(oov, model).collect()[0]["pieces"]
    assert "".join(pieces) == "slowest</w>"
    assert len(pieces) >= 2  # unseen word is not a single learned piece


def test_bpe_deterministic_under_repartition(spark, corpus_df):
    a = bpe_train(corpus_df, num_merges=15).merges
    b = bpe_train(corpus_df.repartition(7), num_merges=15).merges
    assert a == b


def test_bpe_model_frame_roundtrip(spark, corpus_df):
    model = bpe_train(corpus_df, num_merges=10)
    back = BPEModel.from_frame(model.to_frame(spark))
    assert back.merges == model.merges and back.ranks == model.ranks


def test_bpe_max_words_guard(spark, corpus_df):
    with pytest.raises(ValueError, match="max_words"):
        bpe_train(corpus_df, num_merges=1, max_words=2)


def test_bpe_tokenize_scan_local(spark, corpus_df):
    """Tokenization is one Arrow projection over the scan — ZERO
    Exchange (the corpus text never shuffles)."""
    model = bpe_train(corpus_df, num_merges=10)
    out = bpe_tokenize(corpus_df, model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bpe_tokenize_matches_histogram_tokenization(spark):
    """Train/inference pre-tokenization parity: a word containing
    non-ASCII whitespace (NBSP) is ONE type in the histogram and must
    be ONE word at tokenize time too (ASCII-\\s split on both sides;
    str.split() would fragment it and strand the learned merges)."""
    w = "foo\u00a0bar"  # NBSP inside the word — explicit escape
    df = spark.createDataFrame(
        [(0, f"{w} {w}"), (1, w)],
        "doc_id int, text string",
    )
    hist = {r["word"]: r["freq"] for r in word_histogram(df).collect()}
    assert hist == {w: 3}
    model = bpe_train(df, num_merges=20, min_pair_freq=1)
    out = {
        r["doc_id"]: r["pieces"] for r in bpe_tokenize(df, model).collect()
    }
    # the frequent (seen) word merges all the way to a single piece
    assert out[1] == [w + "</w>"]
    assert out[0] == [w + "</w>", w + "</w>"]


def test_bpe_fuzz_against_reference(spark):
    """Randomized parity: 3 seeded corpora of random short words (skewed
    frequencies, so merge tie-breaks get exercised) — merge tables and
    all segmentations must equal the independent reference."""
    import random

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        words = ["".join(rng.choices("abcde", k=rng.randint(1, 7)))
                 for _ in range(40)]
        corpus = [
            (i, " ".join(rng.choices(words, k=rng.randint(0, 12))))
            for i in range(30)
        ]
        df = spark.createDataFrame(corpus, "doc_id int, text string")
        model = bpe_train(df, num_merges=25)
        assert model.merges == _ref_train(corpus, 25), seed

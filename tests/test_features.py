"""Feature templates and scalar text features vs hand-computed oracles.

Covers the reference semantics: lag/lead windows (W1), n-gram pastes
with NA propagation (W2/P1), field=value tagging (W3/P10), BOS/EOS
(W5), NA-attribute drop (P12), txt_feature scalars (P2-P8), and the
tokenizer invariant (text == join of tokens, exact offsets).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crfsuite_spark.functions import text as TXT
from crfsuite_spark.functions.templates import cbind_attributes
from crfsuite_spark.functions.tokenize import tokenize


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        ("d1", 0, "Hello", "NNP"),
        ("d1", 1, "world", "N"),
        ("d1", 2, ".", "Punc"),
        ("d2", 0, "One", "Num"),
        ("d2", 1, "token", "N"),
    ]
    return spark.createDataFrame(rows, "doc string, idx int, token string, pos string")


def attrs_map(df):
    out = {}
    for r in df.collect():
        out[(r["doc"], r["idx"])] = set(r["attrs"])
    return out


def test_window_templates_hand_oracle(tiny):
    out = cbind_attributes(
        tiny, terms=["token"], by=["doc"], order_col="idx",
        from_offset=-1, to_offset=1, ngram_max=2, bos_eos=False,
    )
    m = attrs_map(out)
    # middle token of d1: all three window attrs + both bigrams
    assert m[("d1", 1)] == {
        "token[t-1]=Hello", "token[t]=world", "token[t+1]=.",
        "token[t-1]-token[t]=Hello-world", "token[t-1]-token[t+1]=Hello-.",
        "token[t]-token[t+1]=world-.",
    }
    # first token: lag is NULL → attribute dropped, ngrams with lag dropped
    assert m[("d1", 0)] == {
        "token[t]=Hello", "token[t+1]=world", "token[t]-token[t+1]=Hello-world",
    }
    # last token of d1: lead NULL
    assert m[("d1", 2)] == {
        "token[t-1]=world", "token[t]=.", "token[t-1]-token[t]=world-.",
    }


def test_window_templates_bos_eos(tiny):
    out = cbind_attributes(
        tiny, terms=["token"], by=["doc"], order_col="idx",
        from_offset=0, to_offset=0, ngram_max=1, bos_eos=True,
    )
    m = attrs_map(out)
    assert "BOS+0" in m[("d1", 0)] and "EOS-0" in m[("d1", 2)]
    assert "BOS+1" in m[("d1", 1)] and "EOS-1" in m[("d1", 1)]
    # 2-token doc: first token is both BOS+0 and EOS-1
    assert {"BOS+0", "EOS-1"} <= m[("d2", 0)]


def test_multi_term_one_shuffle(tiny):
    out = cbind_attributes(
        tiny, terms=["token", "pos"], by=["doc"], order_col="idx",
        from_offset=-1, to_offset=1, ngram_max=2, bos_eos=False,
    )
    m = attrs_map(out)
    assert "pos[t-1]-pos[t]=NNP-N" in m[("d1", 1)]
    # one shared Window operator → one shuffle for the whole template set
    phys = out._jdf.queryExecution().sparkPlan().toString()
    assert phys.count("Window") == 1


def test_txt_feature_scalars(spark):
    df = spark.createDataFrame(
        [("Hello",), ("http://x.io",), ("a@b.com",), ("1,234.5",), ("olé",), (None,)],
        "s string",
    )
    out = df.select(
        TXT.is_capitalised("s").alias("cap"),
        TXT.is_url("s").alias("url"),
        TXT.is_email("s").alias("email"),
        TXT.is_number("s").alias("num"),
        TXT.prefix("s", 3).alias("pre"),
        TXT.suffix("s", 3).alias("suf"),
        TXT.shape("s").alias("shape"),
    ).collect()
    r = {i: row.asDict() for i, row in enumerate(out)}
    assert r[0]["cap"] == "true" and r[4]["cap"] == "false"
    assert r[1]["url"] == "true" and r[0]["url"] == "false"
    assert r[2]["email"] == "true"
    assert r[3]["num"] == "true" and r[0]["num"] == "false"
    assert r[0]["pre"] == "Hel" and r[0]["suf"] == "llo"
    assert r[4]["suf"] == "olé"  # shorter than n → whole string (R clamp)
    assert r[0]["shape"] == "Xxxxx"
    assert all(v is None for v in r[5].values())


def test_txt_sprintf_na_propagation(spark):
    df = spark.createDataFrame([("a", "b"), ("a", None)], "x string, y string")
    out = df.select(TXT.txt_sprintf("%s|%s", "x", "y").alias("z")).collect()
    assert out[0]["z"] == "a|b"
    assert out[1]["z"] is None


def test_tokenizer_roundtrip(spark, synth):
    tdf = spark.createDataFrame(synth.transcripts)
    toks = tokenize(tdf).orderBy("conv_id", "turn_idx", "token_idx")
    got = toks.toPandas()
    exp = synth.tokens.sort_values(["conv_id", "turn_idx", "token_idx"]).reset_index(drop=True)
    # token text, pos, and offsets all match the generator's gold table
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "token_idx", "token", "pos", "start", "end"]].reset_index(drop=True),
        exp[["conv_id", "turn_idx", "token_idx", "token", "pos", "start", "end"]],
        check_dtype=False,
    )

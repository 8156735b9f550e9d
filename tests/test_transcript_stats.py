"""Conversation-level analytics (operators/transcripts.py): exact-value
parity against a plain-pandas recomputation, the mask-span slice
invariant for SFT example rendering, and the single-Exchange plan shape
that makes both rollups a one-shuffle job at transcript scale."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crfsuite_spark.operators.transcripts import chat_examples, conv_stats


@pytest.fixture(scope="module")
def tdf(spark, synth):
    return spark.createDataFrame(synth.transcripts).persist()


def _pandas_conv_stats(t: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for conv_id, g in t.sort_values("turn_idx").groupby("conv_id"):
        ms = g["ts"].astype("datetime64[ms]").astype("int64")
        gaps = ms.diff().dropna()
        switches = int((g["role"] != g["role"].shift()).iloc[1:].sum())
        n = len(g)
        n_tok = g["text"].map(
            lambda t: len(t.split()) if t is not None and t.strip() else 0
        )
        rows.append({
            "conv_id": conv_id,
            "n_turns": n,
            "n_roles": g["role"].nunique(),
            "n_tool_calls": int(g["tool"].notna().sum()),
            "tool_frac": round(g["tool"].notna().sum() / n, 6),
            "n_assistant": int((g["role"] == "assistant").sum()),
            "n_tokens": int(n_tok.sum()),
            "avg_turn_tokens": round(n_tok.mean(), 6),
            "span_ms": int(ms.max() - ms.min()),
            "max_gap_ms": int(gaps.max()) if len(gaps) else None,
            "n_role_switches": switches,
            "alternation_rate": round(switches / (n - 1), 6) if n > 1 else None,
        })
    return pd.DataFrame(rows).sort_values("conv_id").reset_index(drop=True)


def test_conv_stats_exact(tdf, synth):
    got = (
        conv_stats(tdf).orderBy("conv_id").toPandas().reset_index(drop=True)
    )
    want = _pandas_conv_stats(synth.transcripts)
    assert list(got.columns) == list(want.columns)
    for c in want.columns:
        pd.testing.assert_series_equal(
            got[c], want[c], check_dtype=False, check_names=False,
            obj=c,
        )


def test_conv_stats_single_turn_conversation(spark):
    t = spark.createDataFrame(
        pd.DataFrame({
            "conv_id": ["c1"], "turn_idx": [0], "role": ["user"],
            "text": ["hello there"], "tool": [None],
            "ts": [pd.Timestamp("2025-01-01")],
        })
    )
    row = conv_stats(t).collect()[0]
    assert row.n_turns == 1
    assert row.span_ms == 0
    assert row.max_gap_ms is None
    assert row.n_role_switches == 0
    assert row.alternation_rate is None


def test_chat_examples_mask_spans_slice_back(tdf):
    for row in chat_examples(tdf).collect():
        text = row.example_text
        assert len(text) == row.n_chars
        spans = row.mask_spans.split(",") if row.mask_spans else []
        for sp in spans:
            s, e = map(int, sp.split(":"))
            piece = text[s:e]
            assert piece.startswith("<|assistant|>"), piece
            # a span covers a whole rendered turn: bounded by the
            # separator (or the string edge) on both sides
            assert s == 0 or text[s - 1] == "\n"
            assert e == len(text) or text[e] == "\n"


def test_chat_examples_reconstructs_ordered_turns(tdf, synth):
    got = {r.conv_id: r.example_text for r in chat_examples(tdf).collect()}
    t = synth.transcripts.sort_values(["conv_id", "turn_idx"])
    for conv_id, g in t.groupby("conv_id"):
        want = "\n".join("<|%s|>%s" % (r.role, r.text) for r in g.itertuples())
        assert got[conv_id] == want


def test_transcript_rollups_single_exchange(tdf):
    for q in (conv_stats(tdf), chat_examples(tdf)):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan


def test_chat_examples_null_text_keeps_invariants(spark):
    """NULL text renders as an empty turn: n_chars still equals
    len(example_text) and mask spans still slice rendered turns."""
    t = spark.createDataFrame(
        pd.DataFrame({
            "conv_id": ["c", "c", "c"], "turn_idx": [0, 1, 2],
            "role": ["user", "assistant", "user"],
            "text": ["hi", None, "bye"],
            "tool": [None, None, None],
            "ts": pd.to_datetime(["2025-01-01"] * 3),
        })
    )
    row = chat_examples(t).collect()[0]
    assert row.example_text == "<|user|>hi\n<|assistant|>\n<|user|>bye"
    assert row.n_chars == len(row.example_text)
    s, e = map(int, row.mask_spans.split(":"))
    assert row.example_text[s:e] == "<|assistant|>"
    # conv_stats: NULL text counts 0 tokens, not NULL aggregates
    stats = conv_stats(t).collect()[0]
    assert stats.n_tokens == 2


def test_sft_pairs_bounded_context(spark, synth):
    from crfsuite_spark.operators.transcripts import sft_pairs

    k = 3
    got = {
        (r.conv_id, r.turn_idx): (r.context, r.target)
        for r in sft_pairs(
            spark.createDataFrame(synth.transcripts), max_context_turns=k
        ).collect()
    }
    t = synth.transcripts.sort_values(["conv_id", "turn_idx"])
    n_checked = 0
    for conv_id, g in t.groupby("conv_id"):
        rows = list(g.itertuples())
        for i, r in enumerate(rows):
            if r.role != "assistant":
                assert (conv_id, r.turn_idx) not in got
                continue
            want_ctx = "\n".join(
                "<|%s|>%s" % (p.role, p.text) for p in rows[max(0, i - k):i]
            )
            ctx, target = got[(conv_id, r.turn_idx)]
            assert ctx == want_ctx, (conv_id, r.turn_idx)
            assert target == r.text
            n_checked += 1
    assert n_checked > 20


def test_sft_pairs_first_turn_empty_context(spark):
    from crfsuite_spark.operators.transcripts import sft_pairs

    t = spark.createDataFrame(
        pd.DataFrame({
            "conv_id": ["c"], "turn_idx": [0], "role": ["assistant"],
            "text": ["hello"], "tool": [None],
            "ts": pd.to_datetime(["2025-01-01"]),
        })
    )
    row = sft_pairs(t).collect()[0]
    assert row.context == "" and row.n_context_chars == 0
    assert row.target == "hello"


def test_conv_episodes_splits_at_gaps(spark):
    from crfsuite_spark.operators.transcripts import conv_episodes

    ts = pd.to_datetime([
        "2025-01-01 10:00", "2025-01-01 10:30",   # episode 0
        "2025-01-01 12:01",                        # 91-min gap -> 1
        "2025-01-01 12:30", "2025-01-02 09:00",   # overnight -> 2
    ])
    t = spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c"] * 5, "turn_idx": range(5),
        "role": ["user"] * 5, "text": ["x"] * 5, "tool": [None] * 5,
        "ts": ts,
    }))
    got = {r.turn_idx: r.episode
           for r in conv_episodes(t, gap_minutes=60).collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


def test_repeated_turns_bounded_lookback(spark):
    from crfsuite_spark.operators.transcripts import repeated_turns

    texts = ["a", "b", "a",          # 'a' repeats within lookback 2
             "c", "d", "a"]          # 'a' again, but >2 turns back
    t = spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c"] * 6, "turn_idx": range(6),
        "role": ["user"] * 6, "text": texts, "tool": [None] * 6,
        "ts": pd.to_datetime(["2025-01-01"] * 6),
    }))
    got = {r.turn_idx: r.is_repeat
           for r in repeated_turns(t, lookback=2).collect()}
    assert got == {0: False, 1: False, 2: True,
                   3: False, 4: False, 5: False}
    # NULL text never matches, even against itself
    t2 = spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c"] * 2, "turn_idx": [0, 1],
        "role": ["user"] * 2, "text": [None, None], "tool": [None] * 2,
        "ts": pd.to_datetime(["2025-01-01"] * 2),
    }))
    assert all(not r.is_repeat for r in repeated_turns(t2).collect())


def _stats_pd(df):
    return (
        df.orderBy("conv_id").toPandas().reset_index(drop=True)
    )


def test_conv_deltas_merge_equals_one_pass(tdf, spark):
    """merge(agg(A), agg(B)) == agg(A ∪ B) for contiguous turn splits,
    including conversations entirely inside one batch."""
    from crfsuite_spark.operators.transcripts import (
        conv_stats_deltas, finalize_conv_deltas, merge_conv_deltas,
    )

    a = tdf.where(F.col("turn_idx") < 4)
    b = tdf.where(F.col("turn_idx") >= 4)
    merged = finalize_conv_deltas(
        merge_conv_deltas(conv_stats_deltas(a), conv_stats_deltas(b))
    )
    want = _stats_pd(conv_stats(tdf))
    got = _stats_pd(merged)
    assert list(got.columns) == list(want.columns)
    for c in want.columns:
        pd.testing.assert_series_equal(
            got[c], want[c], check_dtype=False, check_names=False, obj=c
        )


def test_conv_deltas_three_way_fold(tdf):
    """Folding three contiguous batches in sequence matches one pass
    (associativity of the merge under the contiguity contract)."""
    from crfsuite_spark.operators.transcripts import (
        conv_stats_deltas, finalize_conv_deltas, merge_conv_deltas,
    )

    parts = [
        tdf.where(F.col("turn_idx") < 2),
        tdf.where((F.col("turn_idx") >= 2) & (F.col("turn_idx") < 6)),
        tdf.where(F.col("turn_idx") >= 6),
    ]
    acc = conv_stats_deltas(parts[0])
    for p in parts[1:]:
        acc = merge_conv_deltas(acc, conv_stats_deltas(p))
    got = _stats_pd(finalize_conv_deltas(acc))
    want = _stats_pd(conv_stats(tdf))
    for c in want.columns:
        pd.testing.assert_series_equal(
            got[c], want[c], check_dtype=False, check_names=False, obj=c
        )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_conv_deltas_random_contiguous_splits(tdf, synth, seed):
    """Random PER-CONVERSATION split points (not one global cut):
    each conversation is cut at its own random turn, batches stay
    contiguous, and the fold still matches one pass."""
    import numpy as np

    from crfsuite_spark.operators.transcripts import (
        conv_stats_deltas, finalize_conv_deltas, merge_conv_deltas,
    )

    rng = np.random.default_rng(seed)
    cuts = {
        conv: int(rng.integers(0, g.turn_idx.max() + 2))
        for conv, g in synth.transcripts.groupby("conv_id")
    }
    cut_expr = F.coalesce(
        *[
            F.when(F.col("conv_id") == c, F.lit(v)) for c, v in cuts.items()
        ]
    ) if len(cuts) else F.lit(0)
    marked = tdf.withColumn("__cut", cut_expr)
    a = marked.where(F.col("turn_idx") < F.col("__cut")).drop("__cut")
    b = marked.where(F.col("turn_idx") >= F.col("__cut")).drop("__cut")
    got = _stats_pd(finalize_conv_deltas(
        merge_conv_deltas(conv_stats_deltas(a), conv_stats_deltas(b))
    ))
    want = _stats_pd(conv_stats(tdf))
    for c in want.columns:
        pd.testing.assert_series_equal(
            got[c], want[c], check_dtype=False, check_names=False, obj=c
        )


def test_conv_stats_masked_role_parameter(spark):
    t = spark.createDataFrame(
        pd.DataFrame({
            "conv_id": ["c", "c"], "turn_idx": [0, 1],
            "role": ["user", "agent"], "text": ["hi", "yo"],
            "tool": [None, None],
            "ts": pd.to_datetime(["2025-01-01", "2025-01-02"]),
        })
    )
    row = chat_examples(t, mask_role="agent").collect()[0]
    s, e = map(int, row.mask_spans.split(":"))
    assert row.example_text[s:e] == "<|agent|>yo"


def test_boilerplate_turns_cross_corpus_flag(spark):
    from crfsuite_spark.operators.transcripts import boilerplate_turns

    rows = [
        # greeting repeated across 3 conversations (incl. twice in c1)
        ("c1", 0, "assistant", "Hello! How can I help?", None, None),
        ("c1", 5, "assistant", "Hello! How can I help?", None, None),
        ("c2", 0, "assistant", "Hello! How can I help?", None, None),
        ("c3", 0, "assistant", "Hello! How can I help?", None, None),
        # unique content
        ("c1", 1, "user", "summarize the report", None, None),
        ("c2", 1, "user", "book a flight", None, None),
        # repeated in only 2 convs -> below min_convs=3
        ("c2", 2, "assistant", "Done.", None, None),
        ("c3", 1, "assistant", "Done.", None, None),
        # NULL / empty text never flagged
        ("c3", 2, "tool", None, "search", None),
        ("c1", 2, "user", "   ", None, None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp",
    )
    out = {(r["conv_id"], r["turn_idx"]): (r["n_convs"], r["is_boilerplate"])
           for r in boilerplate_turns(t, min_convs=3).collect()}
    # every occurrence of the 3-conv greeting is flagged, incl. both in c1
    assert out[("c1", 0)] == (3, True)
    assert out[("c1", 5)] == (3, True)
    assert out[("c2", 0)] == (3, True)
    assert out[("c3", 0)] == (3, True)
    # 2-conv repeat is kept
    assert out[("c2", 2)] == (2, False)
    assert out[("c3", 1)] == (2, False)
    # unique and NULL/blank rows survive with n_convs 0/1
    assert out[("c1", 1)] == (1, False)
    assert out[("c3", 2)] == (0, False)
    assert out[("c1", 2)] == (0, False)
    assert len(out) == len(rows)

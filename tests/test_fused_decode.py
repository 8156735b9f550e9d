"""Fused zero-shuffle decode (decode/fused.py) vs the canonical
tokenize → cbind_attributes → decode chain: exact parity and the
zero-Exchange plan contract."""

import numpy as np
import pandas as pd
import pytest

from crfsuite_spark.datagen.transcripts import generate
from crfsuite_spark.decode.fused import decode_fused
from crfsuite_spark.kg.pipeline import (
    SEQ_COLS,
    PipelineConfig,
    extract_triples,
    featurize_transcripts,
    tag_transcripts,
)

KEY = ["conv_id", "turn_idx", "token_idx"]


def _canon(transcripts, model, cfg):
    return (
        tag_transcripts(transcripts, model, cfg)
        .toPandas()
        .sort_values(KEY)
        .reset_index(drop=True)
    )


def _fused(transcripts, model, cfg):
    return (
        decode_fused(
            transcripts,
            model,
            seq_cols=SEQ_COLS,
            terms=cfg.terms,
            from_offset=cfg.from_offset,
            to_offset=cfg.to_offset,
            ngram_max=cfg.ngram_max,
            with_marginal=cfg.with_marginal,
        )
        .toPandas()
        .sort_values(KEY)
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def trained_model(spark, synth):
    """A model trained through the FULL template set (window singles,
    n-grams, BOS/EOS) so fused parity exercises every resolver path —
    the session lexicon_model only carries token[t]= attrs."""
    from crfsuite_spark.train.trainer import train_crf

    transcripts = spark.createDataFrame(synth.transcripts)
    feat = featurize_transcripts(transcripts, PipelineConfig())
    gold = spark.createDataFrame(
        synth.tokens[["conv_id", "turn_idx", "token_idx", "label"]]
    )
    lab = feat.join(gold, KEY)
    model = train_crf(lab, SEQ_COLS, "token_idx", max_iterations=8)
    assert any(a.startswith("BOS+") for a in model.attrs)
    assert any("-" in a.split("=", 1)[0] for a in model.attrs)  # n-grams
    return model


def test_fused_labels_bit_identical(spark, synth, trained_model):
    transcripts = spark.createDataFrame(synth.transcripts)
    cfg = PipelineConfig(fused_decode=False)
    canon = _canon(transcripts, trained_model, cfg)
    fused = _fused(transcripts, trained_model, cfg)
    pd.testing.assert_frame_equal(canon, fused)


def test_fused_marginals_match(spark, synth, trained_model):
    transcripts = spark.createDataFrame(synth.transcripts)
    cfg = PipelineConfig(fused_decode=False, with_marginal=True)
    canon = _canon(transcripts, trained_model, cfg)
    fused = _fused(transcripts, trained_model, cfg)
    assert list(canon.columns) == list(fused.columns)
    pd.testing.assert_frame_equal(
        canon.drop(columns=["marginal", "seq_prob"]),
        fused.drop(columns=["marginal", "seq_prob"]),
    )
    # float accumulation order differs between the paths; labels above
    # are exact, the probabilities agree to numerical noise
    np.testing.assert_allclose(canon["marginal"], fused["marginal"], atol=1e-9)
    np.testing.assert_allclose(canon["seq_prob"], fused["seq_prob"], atol=1e-9)


def test_fused_zero_exchange_plan(spark, synth, lexicon_model):
    transcripts = spark.createDataFrame(synth.transcripts)
    out = decode_fused(transcripts, lexicon_model, seq_cols=SEQ_COLS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_fused_edge_cases_match_canonical(spark, trained_model):
    # NULL text, empty text, consecutive spaces (token_idx gaps),
    # 1-token turn (BOS+0 and EOS-0 on the same token), 2-token turn,
    # unknown vocabulary (attribute misses drop, crfsuite.hpp:403-410)
    rows = [
        ("c1", 0, "user", None, None, None),
        ("c1", 1, "agent", "", None, None),
        ("c1", 2, "user", "Alice  visits   Paris", None, None),
        ("c1", 3, "agent", "ok", None, None),
        ("c1", 4, "user", "go now", None, None),
        ("c2", 0, "user", "zzzunknown qqqnever 12345 . Xx", None, None),
        ("c2", 1, "agent", " leading and trailing ", None, None),
    ]
    transcripts = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        ).astype({"turn_idx": "int32"})
    )
    cfg = PipelineConfig(fused_decode=False, with_marginal=True)
    canon = _canon(transcripts, trained_model, cfg)
    fused = _fused(transcripts, trained_model, cfg)
    pd.testing.assert_frame_equal(
        canon.drop(columns=["marginal", "seq_prob"]),
        fused.drop(columns=["marginal", "seq_prob"]),
    )
    np.testing.assert_allclose(canon["marginal"], fused["marginal"], atol=1e-9)
    # the double-space turn keeps posexplode positions (gaps survive)
    got = fused[(fused.conv_id == "c1") & (fused.turn_idx == 2)]["token_idx"]
    assert list(got) == [0, 2, 5]


def test_fused_token_only_terms(spark, synth, lexicon_model):
    transcripts = spark.createDataFrame(synth.transcripts)
    cfg = PipelineConfig(terms=["token"], fused_decode=False)
    canon = _canon(transcripts, lexicon_model, cfg)
    fused = _fused(transcripts, lexicon_model, cfg)
    pd.testing.assert_frame_equal(canon, fused)


def test_fused_rejects_unknown_terms(spark, synth, lexicon_model):
    transcripts = spark.createDataFrame(synth.transcripts)
    with pytest.raises(ValueError, match="only derives"):
        decode_fused(transcripts, lexicon_model, terms=["token", "role"])


def test_tag_transcripts_routes_fused_and_falls_back(spark, synth, lexicon_model):
    transcripts = spark.createDataFrame(synth.transcripts)
    fused_plan = (
        tag_transcripts(transcripts, lexicon_model, PipelineConfig())
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in fused_plan, fused_plan
    canon_plan = (
        tag_transcripts(transcripts, lexicon_model, PipelineConfig(fused_decode=False))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in canon_plan  # the canonical single token shuffle


def test_fused_randomized_parity_decks(spark):
    """Property test (fixed seed decks): random corpora — mixed-case
    words, digits, punctuation, unicode, multi-spaces, empty/NULL
    turns — decoded with random-weight models (random attr subsets,
    nonzero transitions) must match the canonical chain exactly:
    labels, spans, and relations."""
    import numpy as np

    from crfsuite_spark.decode.fused import decode_relations_fused
    from crfsuite_spark.kg.spans import assemble_relations, assemble_spans
    from crfsuite_spark.train.model import CRFModel

    labels = ["O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-REL", "I-REL"]
    alphabet = [
        "Alice", "bob", "Acme", "visits", "the", "12", "x", "éclair",
        ".", ",", "-", "a=b", "ACME", "woRks", "at",
    ]
    for deck in range(6):
        rng = np.random.default_rng(1000 + deck)
        rows = []
        for conv in range(6):
            for turn in range(5):
                n = int(rng.integers(0, 9))
                toks = list(rng.choice(alphabet, size=n))
                text = None if n == 0 and rng.random() < 0.5 else " ".join(toks)
                if text and rng.random() < 0.3:
                    text = text.replace(" ", "  ", 1)  # token_idx gap
                rows.append((f"c{conv}", turn, "user", text, None, None))
        transcripts = spark.createDataFrame(
            pd.DataFrame(
                rows,
                columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
            ).astype({"turn_idx": "int32"})
        )
        cfg = PipelineConfig(fused_decode=False)
        # model: random subset of the attrs this corpus actually
        # generates, plus never-matching ones; normal weights
        feat = featurize_transcripts(transcripts, cfg)
        from pyspark.sql import functions as F

        all_attrs = [
            r[0]
            for r in feat.select(F.explode("attrs").alias("a")).distinct().collect()
        ]
        k = max(1, int(len(all_attrs) * 0.6))
        idx = rng.permutation(len(all_attrs))[:k]
        attrs = sorted([all_attrs[i] for i in idx] + ["token[t]=neverseen"])
        model = CRFModel(
            labels=labels,
            attrs=attrs,
            state_w=rng.normal(size=(len(attrs), len(labels))),
            trans_w=rng.normal(size=(len(labels), len(labels))),
        )
        canon = _canon(transcripts, model, cfg)
        fused = _fused(transcripts, model, cfg)
        pd.testing.assert_frame_equal(canon, fused), deck
        decoded = tag_transcripts(transcripts, model, cfg)
        canon_rel = (
            assemble_relations(assemble_spans(decoded)).toPandas().drop(columns=["pred"])
        )
        fused_rel = decode_relations_fused(
            transcripts, model, seq_cols=SEQ_COLS, terms=cfg.terms,
            from_offset=cfg.from_offset, to_offset=cfg.to_offset,
            ngram_max=cfg.ngram_max,
        ).toPandas()
        pd.testing.assert_frame_equal(
            _norm(canon_rel), _norm(fused_rel[canon_rel.columns])
        ), deck


def test_viterbi_outputs_length_bucketing_bit_identical(monkeypatch):
    """One pathological long sequence must not inflate the padded
    tensor for the whole batch: the bucketed path (tiny forced budget)
    returns bit-identical labels/marginals to the dense path."""
    from crfsuite_spark.decode import tagger

    rng = np.random.default_rng(3)
    lengths = np.array([3, 1, 40, 2, 2, 5, 1, 17, 4, 4])
    n = int(lengths.sum())
    L = 4
    S = rng.normal(size=(n, L))
    trans = rng.normal(size=(L, L))
    labels = np.array(["a", "b", "c", "d"], dtype=object)
    dense = tagger.viterbi_outputs(S, lengths, trans, labels, True)
    monkeypatch.setattr(tagger, "_PAD_CELL_BUDGET", 16)
    bucketed = tagger.viterbi_outputs(S, lengths, trans, labels, True)
    assert (dense["label"] == bucketed["label"]).all()
    np.testing.assert_array_equal(dense["marginal"], bucketed["marginal"])
    np.testing.assert_array_equal(dense["seq_prob"], bucketed["seq_prob"])


def test_fused_rowwise_unique_fallback_matches_radix(spark, synth, trained_model, monkeypatch):
    """Forcing the exact row-wise unique path (the guard against
    vocab^k int64 overflow on huge batches) must give identical labels
    to radix coding."""
    from crfsuite_spark.decode import fused as fused_mod

    transcripts = spark.createDataFrame(synth.transcripts.head(60))
    cfg = PipelineConfig(fused_decode=False)
    baseline = _fused(transcripts, trained_model, cfg)
    monkeypatch.setattr(fused_mod, "_RADIX_LIMIT", 1)
    forced = _fused(transcripts, trained_model, cfg)
    pd.testing.assert_frame_equal(baseline, forced)


def test_pipeline_triples_identical_through_fused(spark, synth, lexicon_model):
    from crfsuite_spark.datagen.transcripts import build_alias_dict

    transcripts = spark.createDataFrame(synth.transcripts)
    alias = spark.createDataFrame(build_alias_dict())
    out = {}
    for name, cfg in [
        ("canon", PipelineConfig(fused_decode=False)),
        ("fused", PipelineConfig(fused_decode=True)),
    ]:
        t = extract_triples(tag_transcripts(transcripts, lexicon_model, cfg), alias, cfg)
        out[name] = (
            t.toPandas()
            .sort_values(list(t.columns))
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(out["canon"], out["fused"])


def _norm(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_fused_spans_match_assemble_spans(spark, synth, trained_model):
    from crfsuite_spark.decode.fused import decode_spans_fused
    from crfsuite_spark.kg.spans import assemble_spans

    transcripts = spark.createDataFrame(synth.transcripts)
    cfg = PipelineConfig(fused_decode=False)
    canon = assemble_spans(tag_transcripts(transcripts, trained_model, cfg)).toPandas()
    fused = decode_spans_fused(
        transcripts, trained_model, seq_cols=SEQ_COLS, terms=cfg.terms,
        from_offset=cfg.from_offset, to_offset=cfg.to_offset,
        ngram_max=cfg.ngram_max,
    ).toPandas()
    pd.testing.assert_frame_equal(_norm(canon), _norm(fused[canon.columns]))


def test_fused_relations_match_assemble_relations(spark, synth, trained_model):
    from crfsuite_spark.decode.fused import decode_relations_fused
    from crfsuite_spark.kg.spans import assemble_relations, assemble_spans

    transcripts = spark.createDataFrame(synth.transcripts)
    cfg = PipelineConfig(fused_decode=False)
    decoded = tag_transcripts(transcripts, trained_model, cfg)
    canon = (
        assemble_relations(assemble_spans(decoded))
        .toPandas()
        .drop(columns=["pred"])
    )
    fused = decode_relations_fused(
        transcripts, trained_model, seq_cols=SEQ_COLS, terms=cfg.terms,
        from_offset=cfg.from_offset, to_offset=cfg.to_offset,
        ngram_max=cfg.ngram_max,
    ).toPandas()
    pd.testing.assert_frame_equal(_norm(canon), _norm(fused[canon.columns]))


def test_fused_relations_zero_exchange_plan(spark, synth, lexicon_model):
    from crfsuite_spark.decode.fused import decode_relations_fused

    transcripts = spark.createDataFrame(synth.transcripts)
    out = decode_relations_fused(transcripts, lexicon_model, seq_cols=SEQ_COLS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_run_pipeline_fused_matches_staged(spark, synth, lexicon_model):
    from crfsuite_spark.datagen.transcripts import build_alias_dict
    from crfsuite_spark.kg.pipeline import run_pipeline

    transcripts = spark.createDataFrame(synth.transcripts)
    alias = spark.createDataFrame(build_alias_dict())
    staged = run_pipeline(
        transcripts, lexicon_model, alias, PipelineConfig(fused_decode=False)
    ).toPandas()
    fused = run_pipeline(
        transcripts, lexicon_model, alias, PipelineConfig(fused_decode=True)
    ).toPandas()
    assert list(staged.columns) == list(fused.columns)
    pd.testing.assert_frame_equal(_norm(staged), _norm(fused))

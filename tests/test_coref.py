"""Pronoun coreference (kg/coref.py): brute-force reference parity on
the crafted corpus, recovered-triple e2e through the relation grammar,
and the one-Exchange plan contract."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crfsuite_spark.datagen.coref import coref_conversations
from crfsuite_spark.kg.coref import (
    PRONOUN_TYPES,
    resolve_pronouns,
    spans_with_antecedents,
)


def _brute_force(tokens: pd.DataFrame, spans: pd.DataFrame) -> pd.DataFrame:
    """Per-pronoun linear scan over all prior mentions — the obvious
    O(n^2) reference the window implementation must match."""
    out = []
    for conv, gt in tokens.groupby("conv_id"):
        ms = spans[spans.conv_id == conv]
        mentions = [
            (int(r.turn_idx), int(r.end_tok), r.entity_type, r.surface)
            for r in ms.itertuples()
        ]
        for r in gt.itertuples():
            pron = r.token.lower()
            if pron not in PRONOUN_TYPES:
                continue
            ok_types = PRONOUN_TYPES[pron]
            prior = [
                m for m in mentions
                if m[2] in ok_types
                and (m[0], m[1]) < (int(r.turn_idx), int(r.token_idx))
            ]
            best = max(prior, key=lambda m: (m[0], m[1])) if prior else None
            out.append({
                "conv_id": conv, "turn_idx": int(r.turn_idx),
                "token_idx": int(r.token_idx), "pronoun": pron,
                "ant_turn_idx": best[0] if best else None,
                "ant_pos": best[1] if best else None,
                "ant_type": best[2] if best else None,
                "ant_surface": best[3] if best else None,
            })
    return (
        pd.DataFrame(out)
        .sort_values(["conv_id", "turn_idx", "token_idx"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("seed", [77, 101, 202])
def test_resolve_matches_brute_force(spark, seed):
    toks, spans = coref_conversations(n_convs=12, seed=seed)
    got = (
        resolve_pronouns(spark.createDataFrame(toks),
                         spark.createDataFrame(spans))
        .orderBy("conv_id", "turn_idx", "token_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    want = _brute_force(toks, spans)
    assert len(got) == len(want) > 0
    for c in want.columns:
        pd.testing.assert_series_equal(
            got[c], want[c], check_dtype=False, check_names=False, obj=c
        )


def test_unresolvable_openers_stay_null(spark):
    toks, spans = coref_conversations(n_convs=24, seed=77)
    got = resolve_pronouns(
        spark.createDataFrame(toks), spark.createDataFrame(spans)
    ).toPandas()
    # the builder opens some conversations with pronoun-only turns
    # before any mention — those must come back NULL, not resolved
    first_mention = spans.groupby("conv_id").turn_idx.min()
    openers = got[
        got.apply(
            lambda r: r.turn_idx < first_mention.get(r.conv_id, 10**9), axis=1
        )
    ]
    assert len(openers) > 0
    assert openers.ant_surface.isna().all()


def test_recovers_pronominal_triples(spark):
    """'Alice Johnson founded Acme Corp . / She works at Globex .'
    yields (Alice Johnson, works_at, Globex) only via coref."""
    from crfsuite_spark.kg.spans import assemble_relations

    rows = []
    for ti, words in enumerate([
        "Alice Johnson founded Acme Corp .".split(),
        "She works at Globex .".split(),
    ]):
        rows += [("c1", ti, i, w) for i, w in enumerate(words)]
    tokens = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "token_idx", "token"])
    )
    spans = spark.createDataFrame(pd.DataFrame(
        [("c1", 0, 1, "PER", "Alice Johnson", 0, 1),
         ("c1", 0, 2, "ORG", "Acme Corp", 3, 4),
         ("c1", 1, 1, "REL", "works at", 1, 2),
         ("c1", 1, 2, "ORG", "Globex", 3, 3)],
        columns=["conv_id", "turn_idx", "span_id", "entity_type", "surface",
                 "start_tok", "end_tok"],
    ))
    entity_spans = spans.where(F.col("entity_type") != "REL")
    resolved = resolve_pronouns(tokens, entity_spans)
    augmented = spans_with_antecedents(spans, resolved)
    rels = assemble_relations(augmented).collect()
    got = {(r.subj_surface, r.pred, r.obj_surface) for r in rels}
    assert ("Alice Johnson", "works_at", "Globex") in got, got
    # without coref the turn-1 relation has no subject
    base = {(r.subj_surface, r.pred, r.obj_surface)
            for r in assemble_relations(spans).collect()}
    assert ("Alice Johnson", "works_at", "Globex") not in base


def _pronoun_corpus(spark):
    """Two-turn conversation whose second relation is only reachable
    through coref, plus the lexicon model and alias dictionary that let
    the full pipeline decode and link it."""
    import numpy as np

    from crfsuite_spark.train.model import CRFModel

    turns = [
        ("c1", 0, "Alice Johnson founded Acme Corp .",
         ["B-PER", "I-PER", "B-REL", "B-ORG", "I-ORG", "O"]),
        ("c1", 1, "She works at Globex .",
         ["O", "B-REL", "I-REL", "B-ORG", "O"]),
    ]
    tdf = spark.createDataFrame(
        pd.DataFrame(
            [(c, t, "user", s, None, pd.Timestamp("2025-01-01"))
             for c, t, s, _ in turns],
            columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        )
    )
    votes = {}
    for _, _, text, labels in turns:
        for tok, lab in zip(text.split(), labels):
            votes.setdefault(tok, lab)
    labels = sorted(set(votes.values()))
    attrs = sorted("token[t]=" + t for t in votes)
    state_w = np.zeros((len(attrs), len(labels)))
    for tok, lab in votes.items():
        state_w[attrs.index("token[t]=" + tok), labels.index(lab)] = 5.0
    model = CRFModel(labels=labels, attrs=attrs, state_w=state_w,
                     trans_w=np.zeros((len(labels), len(labels))))
    alias = spark.createDataFrame(pd.DataFrame(
        {"alias": ["Alice Johnson", "Acme Corp", "Globex"],
         "canonical_id": ["per:alice", "org:acme", "org:globex"],
         "weight": [1.0, 1.0, 1.0]}
    ))
    return tdf, model, alias


@pytest.mark.parametrize("fused", [True, False])
def test_pipeline_coref_recovers_triple(spark, fused):
    from crfsuite_spark.kg.pipeline import PipelineConfig, run_pipeline

    tdf, model, alias = _pronoun_corpus(spark)
    base_cfg = dict(fuzzy_linking=False, canonicalize=False,
                    fused_decode=fused)
    with_coref = {
        (r.subj, r.pred, r.obj)
        for r in run_pipeline(tdf, model, alias,
                              PipelineConfig(coref=True, **base_cfg)).collect()
    }
    without = {
        (r.subj, r.pred, r.obj)
        for r in run_pipeline(tdf, model, alias,
                              PipelineConfig(coref=False, **base_cfg)).collect()
    }
    assert ("per:alice", "founded", "org:acme") in without
    assert ("per:alice", "works_at", "org:globex") not in without
    assert with_coref == without | {("per:alice", "works_at", "org:globex")}


def test_custom_pronoun_types_three_way_and_new_type(spark):
    """The pronoun_types override supports >2 compatible types and
    types outside the built-in PER/ORG/LOC universe."""
    toks = spark.createDataFrame(pd.DataFrame(
        [("c", 2, 0, "they"), ("c", 3, 0, "it")],
        columns=["conv_id", "turn_idx", "token_idx", "token"],
    ))
    spans = spark.createDataFrame(pd.DataFrame(
        [("c", 0, "GPE", "Ruritania", 0, 0),
         ("c", 1, "ORG", "Acme", 0, 0)],
        columns=["conv_id", "turn_idx", "entity_type", "surface",
                 "start_tok", "end_tok"],
    ))
    got = {
        r.pronoun: (r.ant_type, r.ant_surface)
        for r in resolve_pronouns(
            toks, spans,
            pronoun_types={"they": ("PER", "ORG", "GPE"), "it": ("GPE",)},
        ).collect()
    }
    # 'they': ORG at turn 1 is more recent than GPE at turn 0
    assert got["they"] == ("ORG", "Acme")
    assert got["it"] == ("GPE", "Ruritania")


def test_streaming_state_fn_multi_mention_turn():
    """Arrow hands array cells to the state fn as numpy.ndarray; a turn
    with two mentions and two pronouns must not trip ndarray truthiness
    (regression for `row.mentions or []`)."""
    import numpy as np

    from crfsuite_spark.streaming.coref_state import coref_state_fn

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.v = v

        def setTimeoutDuration(self, ms):
            pass

    pdf = pd.DataFrame({
        "conv_id": ["c"], "turn_idx": [0],
        "prons": [np.array([{"pos": 3, "pronoun": "she"},
                            {"pos": 5, "pronoun": "it"}])],
        "mentions": [np.array([
            {"pos": 1, "etype": "PER", "surface": "Alice Johnson"},
            {"pos": 2, "etype": "ORG", "surface": "Acme"}])],
    })
    out = pd.concat(list(coref_state_fn()(("c",), iter([pdf]), FakeState())))
    got = {r.pronoun: r.ant_surface for r in out.itertuples()}
    assert got == {"she": "Alice Johnson", "it": "Acme"}


def test_pipeline_coref_fused_matches_staged_exactly(spark):
    """The pronoun-pruned fused coref path (emit='coref' union +
    staged re-assembly of resolved-pronoun turns only) must emit the
    SAME rows as full staged assembly over augmented spans."""
    from crfsuite_spark.kg.pipeline import PipelineConfig, run_pipeline

    tdf, model, alias = _pronoun_corpus(spark)
    base = dict(fuzzy_linking=False, canonicalize=False, coref=True)
    cols = ["conv_id", "turn_idx", "subj", "pred", "obj",
            "subj_surface", "obj_surface", "rel_surface"]
    fused = sorted(
        tuple(r) for r in run_pipeline(
            tdf, model, alias, PipelineConfig(fused_decode=True, **base)
        ).select(*cols).collect()
    )
    staged = sorted(
        tuple(r) for r in run_pipeline(
            tdf, model, alias, PipelineConfig(fused_decode=False, **base)
        ).select(*cols).collect()
    )
    assert fused == staged and len(fused) == 2


class _FakeState:
    exists = False
    hasTimedOut = False

    def update(self, v):
        self.v = v
        self.exists = True

    @property
    def get(self):
        return self.v

    def setTimeoutDuration(self, ms):
        pass


def test_streaming_state_fn_multi_chunk_ordering():
    """One micro-batch delivered as TWO Arrow chunks with the later
    turns in the FIRST chunk: the state fn must merge and sort across
    chunks, not per chunk (regression for per-chunk sort_values)."""
    from crfsuite_spark.streaming.coref_state import coref_state_fn

    chunk_late = pd.DataFrame({
        "conv_id": ["c"], "turn_idx": [5],
        "prons": [[{"pos": 0, "pronoun": "she"}]],
        "mentions": [[{"pos": 1, "etype": "PER", "surface": "Carol Wu"}]],
    })
    chunk_early = pd.DataFrame({
        "conv_id": ["c"], "turn_idx": [1],
        "prons": [[]],
        "mentions": [[{"pos": 0, "etype": "PER", "surface": "Alice Johnson"}]],
    })
    out = pd.concat(list(
        coref_state_fn()(("c",), iter([chunk_late, chunk_early]),
                         _FakeState())
    ))
    # turn 1's Alice precedes turn 5's pronoun; turn 5's own mention
    # (pos 1) is AFTER the pronoun (pos 0) so must not win
    assert out.iloc[0].ant_surface == "Alice Johnson"


def test_streaming_state_fn_custom_types_survive_state():
    """A custom pronoun_types map's types persist across micro-batches
    (regression for the hardcoded PER/ORG/LOC state slots)."""
    from crfsuite_spark.streaming.coref_state import coref_state_fn

    types = {"it": ("GPE",)}
    fn = coref_state_fn(pronoun_types=types)
    state = _FakeState()
    batch1 = pd.DataFrame({
        "conv_id": ["c"], "turn_idx": [0], "prons": [[]],
        "mentions": [[{"pos": 0, "etype": "GPE", "surface": "Ruritania"}]],
    })
    list(fn(("c",), iter([batch1]), state))
    batch2 = pd.DataFrame({
        "conv_id": ["c"], "turn_idx": [1],
        "prons": [[{"pos": 0, "pronoun": "it"}]], "mentions": [[]],
    })
    out = pd.concat(list(fn(("c",), iter([batch2]), state)))
    assert out.iloc[0].ant_surface == "Ruritania"
    assert out.iloc[0].ant_type == "GPE"


def test_resolve_single_exchange(spark):
    toks, spans = coref_conversations(n_convs=4, seed=77)
    q = resolve_pronouns(spark.createDataFrame(toks),
                         spark.createDataFrame(spans))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan

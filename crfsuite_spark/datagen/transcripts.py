"""Deterministic synthetic transcript generator (FIXTURES.md F1/F2/F5/F6).

Generates the Iceberg-shaped transcript table
``(conv_id, turn_idx, role, text, tool, ts)`` with seeded entity and
relation mentions, plus the gold token/label table, the alias
dictionary for entity linking, and the gold triple set.

Everything is seeded ``numpy.random.default_rng(seed)`` — per-turn text
is byte-stable across runs (the per-turn text-equality invariant from
BASELINE.json:input_hint). Text is the space-join of its tokens, so
``split(text, ' ')`` retokenizes exactly.

One "hot" conversation gets ~100x the median turn count to exercise
conv_id-salted repartitioning (FIXTURES.md F1 skew requirement).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

LABELS = ["O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC", "B-REL", "I-REL"]

# --- entity catalog: canonical_id -> list of surface-form aliases -----------
PERSONS = {
    "per:alice_johnson": ["Alice Johnson", "Alice", "Ms. Johnson", "A. Johnson"],
    "per:bob_smith": ["Bob Smith", "Bob", "Mr. Smith"],
    "per:carol_wu": ["Carol Wu", "Carol", "Dr. Wu"],
    "per:david_miller": ["David Miller", "Dave Miller", "David"],
    "per:eva_novak": ["Eva Novak", "Eva"],
    "per:frank_ocean": ["Frank Ocean", "Frank"],
    "per:grace_kim": ["Grace Kim", "Grace"],
    "per:henry_ford": ["Henry Ford", "Henry"],
}
ORGS = {
    "org:acme_corp": ["Acme Corp", "Acme Corporation", "ACME"],
    "org:globex": ["Globex", "Globex Inc", "Globex Incorporated"],
    "org:initech": ["Initech", "Initech LLC"],
    "org:umbrella": ["Umbrella Group", "Umbrella"],
    "org:stark_industries": ["Stark Industries", "Stark Ind"],
    "org:wayne_enterprises": ["Wayne Enterprises", "Wayne Ent"],
    "org:hooli": ["Hooli", "Hooli Inc"],
    "org:pied_piper": ["Pied Piper", "PiedPiper"],
}
LOCS = {
    "loc:berlin": ["Berlin"],
    "loc:tokyo": ["Tokyo"],
    "loc:new_york": ["New York", "New York City", "NYC"],
    "loc:paris": ["Paris"],
    "loc:san_francisco": ["San Francisco", "SF"],
    "loc:london": ["London"],
    "loc:zurich": ["Zurich"],
    "loc:sao_paulo": ["Sao Paulo"],
}

# relation surface phrase -> predicate id; (subj_kind, obj_kind)
RELATIONS = [
    ("works at", "works_at", "PER", "ORG"),
    ("is employed by", "works_at", "PER", "ORG"),
    ("founded", "founded", "PER", "ORG"),
    ("is the founder of", "founded", "PER", "ORG"),
    ("is located in", "located_in", "ORG", "LOC"),
    ("is headquartered in", "located_in", "ORG", "LOC"),
    ("visited", "visited", "PER", "LOC"),
    ("traveled to", "visited", "PER", "LOC"),
    ("partnered with", "partnered_with", "ORG", "ORG"),
    ("acquired", "acquired", "ORG", "ORG"),
    ("met with", "met_with", "PER", "PER"),
]
PRED_BY_PHRASE = {phrase: pred for phrase, pred, _, _ in RELATIONS}

# sentence frames around the (subj, rel, obj) core; {S}/{R}/{O} are slots
FRAMES = [
    ("", " ."),
    ("I heard that ", " ."),
    ("Did you know ", " ?"),
    ("According to the report , ", " ."),
    ("The memo says ", " ."),
    ("Fun fact : ", " ."),
]

NOISE_SENTENCES = [
    "Thanks for the update .",
    "Can you run the query again ?",
    "The deployment finished without errors .",
    "Let me check the logs for that job .",
    "The weather today is quite nice .",
    "Please summarize the previous discussion .",
    "That test suite is still flaky on CI .",
    "We should schedule a retro for friday .",
    "The dashboard shows a spike at noon .",
    "I will open a ticket for the regression .",
]

VERB_WORDS = {
    "works", "employed", "founded", "located", "headquartered", "visited",
    "traveled", "partnered", "acquired", "met", "heard", "know", "says",
    "run", "finished", "check", "summarize", "shows", "open", "schedule",
}
FUNC_WORDS = {
    "at", "by", "in", "of", "to", "with", "the", "a", "is", "that", "for",
    "i", "did", "you", "according", "fun", "fact", "me", "can", "we",
    "should", "will", "it", "again", "still", "quite", "without",
}


def _pos_of(token: str) -> str:
    """Deterministic POS-ish tag (closed set like FIXTURES.md F2)."""
    low = token.lower()
    if token in {".", ",", "?", ":", "!", ";"}:
        return "Punc"
    if low in VERB_WORDS:
        return "V"
    if low in FUNC_WORDS:
        return "Prep" if low in {"at", "by", "in", "of", "to", "with"} else "Art"
    if token[:1].isupper():
        return "NNP"
    if low.isdigit():
        return "Num"
    return "N"


@dataclass
class SynthResult:
    transcripts: pd.DataFrame  # conv_id, turn_idx, role, text, tool, ts
    tokens: pd.DataFrame  # conv_id, turn_idx, token_idx, token, pos, label, start, end
    alias_dict: pd.DataFrame  # alias, canonical_id, canonical_name, entity_type, weight
    gold_triples: pd.DataFrame  # conv_id, turn_idx, subj, pred, obj
    gold_mentions: pd.DataFrame  # conv_id, turn_idx, start_tok, end_tok, entity_type, surface, canonical_id


def build_alias_dict() -> pd.DataFrame:
    rows = []
    for kind, catalog in (("PER", PERSONS), ("ORG", ORGS), ("LOC", LOCS)):
        for cid, aliases in catalog.items():
            canonical = aliases[0]
            for i, alias in enumerate(aliases):
                rows.append({
                    "alias": alias.lower(),
                    "canonical_id": cid,
                    "canonical_name": canonical,
                    "entity_type": kind,
                    "weight": 1.0 / (1 + i),
                })
    return pd.DataFrame(rows)


def generate(
    n_convs: int = 40,
    turns_per_conv: int = 12,
    hot_factor: int = 0,
    seed: int = 42,
    entity_turn_prob: float = 0.7,
    entity_pool: int = 0,
) -> SynthResult:
    """Generate the full fixture set.

    ``hot_factor`` > 0 adds one extra conversation with
    ``hot_factor * turns_per_conv`` turns (skew exercise).

    ``entity_pool`` > 0 makes each conversation pre-draw that many
    entities per kind and sample its mentions from the pool — the
    topical stickiness real conversations have, and the within-conv
    same-entity/different-alias co-occurrence that alias/acronym
    mining (kg/mining.py) feeds on.  Default 0 keeps the historical
    per-turn uniform draw AND the exact RNG call sequence, so the
    seed-42 gold fixtures are byte-stable.
    """
    rng = np.random.default_rng(seed)
    catalogs = {"PER": list(PERSONS.items()), "ORG": list(ORGS.items()), "LOC": list(LOCS.items())}
    t_rows, tok_rows, triple_rows, mention_rows = [], [], [], []
    base_ts = datetime(2025, 1, 1)
    conv_sizes = [(f"conv_{i:05d}", turns_per_conv + int(rng.integers(-4, 5))) for i in range(n_convs)]
    if hot_factor > 0:
        conv_sizes.append(("conv_hot", turns_per_conv * hot_factor))
    roles = ["user", "assistant", "tool"]
    for conv_id, n_turns in conv_sizes:
        if entity_pool > 0:
            conv_catalogs = {
                kind: [cat[i] for i in rng.choice(
                    len(cat), size=min(entity_pool, len(cat)), replace=False
                )]
                for kind, cat in catalogs.items()
            }
        else:
            conv_catalogs = catalogs
        for turn_idx in range(n_turns):
            role = roles[int(rng.integers(0, 3))]
            tool = "search" if role == "tool" and rng.random() < 0.5 else None
            ts = base_ts + timedelta(minutes=int(rng.integers(0, 500000)))
            tokens: list[str] = []
            labels: list[str] = []

            def emit(words: list[str], tags: list[str]):
                tokens.extend(words)
                labels.extend(tags)

            if rng.random() < entity_turn_prob:
                phrase, pred, skind, okind = RELATIONS[int(rng.integers(0, len(RELATIONS)))]
                s_id, s_aliases = conv_catalogs[skind][int(rng.integers(0, len(conv_catalogs[skind])))]
                o_id, o_aliases = conv_catalogs[okind][int(rng.integers(0, len(conv_catalogs[okind])))]
                if skind == okind and s_id == o_id:  # avoid self-relations
                    o_id, o_aliases = conv_catalogs[okind][(int(rng.integers(0, max(len(conv_catalogs[okind]) - 1, 1))) + 1 + conv_catalogs[okind].index((s_id, s_aliases))) % len(conv_catalogs[okind])]
                s_surface = s_aliases[int(rng.integers(0, len(s_aliases)))]
                o_surface = o_aliases[int(rng.integers(0, len(o_aliases)))]
                prefix, suffix = FRAMES[int(rng.integers(0, len(FRAMES)))]
                if prefix:
                    pw = prefix.strip().split(" ")
                    emit(pw, ["O"] * len(pw))
                s_words = s_surface.split(" ")
                s_start = len(tokens)
                emit(s_words, [f"B-{skind}"] + [f"I-{skind}"] * (len(s_words) - 1))
                mention_rows.append((conv_id, turn_idx, s_start, len(tokens) - 1, skind, s_surface, s_id))
                r_words = phrase.split(" ")
                emit(r_words, ["B-REL"] + ["I-REL"] * (len(r_words) - 1))
                o_words = o_surface.split(" ")
                o_start = len(tokens)
                emit(o_words, [f"B-{okind}"] + [f"I-{okind}"] * (len(o_words) - 1))
                mention_rows.append((conv_id, turn_idx, o_start, len(tokens) - 1, okind, o_surface, o_id))
                sw = suffix.strip().split(" ")
                emit(sw, ["O"] * len(sw))
                triple_rows.append({
                    "conv_id": conv_id, "turn_idx": turn_idx,
                    "subj": s_id, "pred": pred, "obj": o_id,
                })
            else:
                words = NOISE_SENTENCES[int(rng.integers(0, len(NOISE_SENTENCES)))].split(" ")
                emit(words, ["O"] * len(words))

            text = " ".join(tokens)
            t_rows.append({
                "conv_id": conv_id, "turn_idx": turn_idx, "role": role,
                "text": text, "tool": tool, "ts": ts,
            })
            pos = 0
            for i, (tok, lab) in enumerate(zip(tokens, labels)):
                tok_rows.append({
                    "conv_id": conv_id, "turn_idx": turn_idx, "token_idx": i,
                    "token": tok, "pos": _pos_of(tok), "label": lab,
                    "start": pos, "end": pos + len(tok) - 1,
                })
                pos += len(tok) + 1

    transcripts = pd.DataFrame(t_rows)
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    tokens_df = pd.DataFrame(tok_rows)
    for c in ("turn_idx", "token_idx", "start", "end"):
        tokens_df[c] = tokens_df[c].astype("int32")
    mentions = pd.DataFrame(
        mention_rows,
        columns=["conv_id", "turn_idx", "start_tok", "end_tok", "entity_type", "surface", "canonical_id"],
    )
    triples = pd.DataFrame(triple_rows, columns=["conv_id", "turn_idx", "subj", "pred", "obj"])
    triples["turn_idx"] = triples["turn_idx"].astype("int32")
    return SynthResult(transcripts, tokens_df, build_alias_dict(), triples, mentions)


def to_spark(spark, result: SynthResult):
    """Create Spark DataFrames for the fixture set."""
    return {
        "transcripts": spark.createDataFrame(result.transcripts),
        "tokens": spark.createDataFrame(result.tokens),
        "alias_dict": spark.createDataFrame(result.alias_dict),
        "gold_triples": spark.createDataFrame(result.gold_triples),
        "gold_mentions": spark.createDataFrame(result.gold_mentions),
    }

"""Deterministic pronoun-bearing conversations for the coref surface.

The main transcript generator (datagen/transcripts.py) never emits
pronouns — every mention is a full surface form — so the coreference
resolver gets its own seeded builder: conversations that interleave
entity-introducing statements with pronoun follow-ups, including
no-antecedent openers and ambiguous-type pronouns (they/it) whose
resolution must pick the most recent compatible mention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .transcripts import LOCS, ORGS, PERSONS

PRON_BY_KIND = {
    "PER": ["he", "she", "they"],
    "ORG": ["it", "they"],
    "LOC": ["there", "it"],
}
INTRO = {
    "PER": "{m} joined the call .",
    "ORG": "The contract with {m} is signed .",
    "LOC": "The offsite happens in {m} .",
}
FOLLOW = {
    "PER": "{p} confirmed the budget .",
    "ORG": "{p} shipped the release .",
    "LOC": "{p} the team met again .",
}


def coref_conversations(n_convs: int = 24, seed: int = 77):
    """Build (tokens, spans) pandas frames: a token stream plus the
    gold entity spans, both deterministic in ``seed``.

    Each conversation opens with 0-2 pronoun-only turns (unresolvable),
    then alternates entity introductions and pronoun follow-ups.
    """
    rng = np.random.default_rng(seed)
    catalog = {
        "PER": [a[0] for a in PERSONS.values()],
        "ORG": [a[0] for a in ORGS.values()],
        "LOC": [a[0] for a in LOCS.values()],
    }
    tok_rows, span_rows = [], []
    for ci in range(n_convs):
        conv = f"coref_{ci:04d}"
        turn = 0

        def add_turn(text: str, mention: str | None, kind: str | None):
            nonlocal turn
            words = text.split()
            for i, w in enumerate(words):
                tok_rows.append((conv, turn, i, w))
            if mention is not None:
                mw = mention.split()
                start = words.index(mw[0])
                span_rows.append(
                    (conv, turn, kind, mention, start, start + len(mw) - 1)
                )
            turn += 1

        for _ in range(int(rng.integers(0, 3))):
            kind = str(rng.choice(list(PRON_BY_KIND)))
            pron = str(rng.choice(PRON_BY_KIND[kind]))
            add_turn(FOLLOW[kind].format(p=pron.capitalize()), None, None)
        for _ in range(int(rng.integers(2, 6))):
            kind = str(rng.choice(list(catalog)))
            mention = str(rng.choice(catalog[kind]))
            add_turn(INTRO[kind].format(m=mention), mention, kind)
            if rng.random() < 0.8:
                pron = str(rng.choice(PRON_BY_KIND[kind]))
                add_turn(FOLLOW[kind].format(p=pron.capitalize()), None, None)

    tokens = pd.DataFrame(
        tok_rows, columns=["conv_id", "turn_idx", "token_idx", "token"]
    )
    spans = pd.DataFrame(
        span_rows,
        columns=["conv_id", "turn_idx", "entity_type", "surface",
                 "start_tok", "end_tok"],
    )
    for c in ("turn_idx", "token_idx"):
        tokens[c] = tokens[c].astype(np.int32)
    for c in ("turn_idx", "start_tok", "end_tok"):
        spans[c] = spans[c].astype(np.int32)
    return tokens, spans

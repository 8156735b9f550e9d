"""Deterministic ambiguous-mention corpus for entity disambiguation.

Every ambiguous alias ("Johnson", "Smith", "Acme", "Springfield") maps
to two canonical entities with disjoint profile vocabularies; each
generated mention draws its context words from the TRUE entity's
profile plus shared noise, so a context-vs-profile scorer has signal
and the builder's ``gold_id`` column gives tests an accuracy target.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

PROFILES = {
    "per:alice_johnson": "alice johnson engineer software acme berlin kubernetes deploys",
    "per:amy_johnson": "amy johnson pilot aviation airline london cockpit altitude",
    "per:bob_smith": "bob smith sales enterprise accounts chicago quota pipeline",
    "per:brian_smith": "brian smith chef restaurant cuisine paris kitchen menu",
    "org:acme_corp": "acme corp software company cloud berlin platform releases",
    "org:acme_labs": "acme labs research biotech genomics tokyo trials assay",
    "loc:springfield_il": "springfield illinois midwest capital lincoln prairie",
    "loc:springfield_ma": "springfield massachusetts newengland basketball armory river",
}

ALIASES = [
    ("Johnson", "per:alice_johnson"),
    ("Johnson", "per:amy_johnson"),
    ("Alice Johnson", "per:alice_johnson"),
    ("Amy Johnson", "per:amy_johnson"),
    ("Smith", "per:bob_smith"),
    ("Smith", "per:brian_smith"),
    ("Bob Smith", "per:bob_smith"),
    ("Brian Smith", "per:brian_smith"),
    ("Acme", "org:acme_corp"),
    ("Acme", "org:acme_labs"),
    ("Acme Corp", "org:acme_corp"),
    ("Acme Labs", "org:acme_labs"),
    ("Springfield", "loc:springfield_il"),
    ("Springfield", "loc:springfield_ma"),
]

NOISE = ("the and with about after during meeting update report status"
         " question team next week okay thanks").split()


def disambig_mentions(n_mentions: int = 120, seed: int = 13):
    """Build (mentions, alias_dict, profiles) pandas frames.

    mentions: (mention_id, surface, context, gold_id) — context mixes
    3-5 profile words of the gold entity with 2-4 shared noise words,
    shuffled; surface is a uniformly drawn alias of the gold entity.
    """
    rng = np.random.default_rng(seed)
    by_entity: dict[str, list[str]] = {}
    for alias, cid in ALIASES:
        by_entity.setdefault(cid, []).append(alias)
    entities = sorted(by_entity)
    rows = []
    for mid in range(n_mentions):
        gold = entities[int(rng.integers(0, len(entities)))]
        surface = by_entity[gold][int(rng.integers(0, len(by_entity[gold])))]
        pwords = PROFILES[gold].split()
        k = int(rng.integers(3, 6))
        ctx = [pwords[i] for i in rng.choice(len(pwords), size=k, replace=False)]
        ctx += [NOISE[i] for i in
                rng.choice(len(NOISE), size=int(rng.integers(2, 5)),
                           replace=False)]
        rng.shuffle(ctx)
        rows.append((mid, surface, " ".join(ctx), gold))
    mentions = pd.DataFrame(
        rows, columns=["mention_id", "surface", "context", "gold_id"]
    )
    mentions["mention_id"] = mentions["mention_id"].astype(np.int64)
    alias_dict = pd.DataFrame(ALIASES, columns=["alias", "canonical_id"])
    profiles = pd.DataFrame(
        sorted(PROFILES.items()), columns=["canonical_id", "profile"]
    )
    return mentions, alias_dict, profiles

"""Generate gold fixture parquets for the driver's DuckDB oracle.

The two rows-only scoreboard queries (`crf_decode_synthetic`,
`kg_triples_synthetic`) use the seed-deterministic synthetic generator,
so their expected outputs can be derived INDEPENDENTLY of the pipeline
under test and checked in as parquet fixtures the oracle SQL SELECTs
from (`read_parquet`):

- **decode**: the query's lexicon model has zero transition weights and
  one `token[t]=` attribute per vocabulary token, so Viterbi degenerates
  to a per-token argmax of gold vote counts (monotonic log1p transform
  preserves the argmax; np.argmax ties break to the lowest label index =
  lexicographically smallest label). That argmax is recomputed here in
  plain pandas — no CRF kernel, no Spark — from the generator's gold
  token table.
- **triples**: the generator emits the gold (subj, pred, obj) set
  directly (datagen/transcripts.py SynthResult.gold_triples); pipeline
  parity against it is already pytest-asserted
  (tests/test_kg.py::test_e2e_triples_from_gold_labels).

Rerun after changing the generator: python tools/make_gold_fixtures.py
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def gold_decode(data) -> pd.DataFrame:
    votes = (
        data.tokens.groupby(["token", "label"]).size().reset_index(name="n")
    )
    labels = sorted(data.tokens["label"].unique())
    # per token: max votes, tie -> lexicographically smallest label
    # (labels sorted ascending; stable sort keeps first max)
    best = (
        votes.sort_values(["token", "n", "label"], ascending=[True, False, True])
        .drop_duplicates("token")
        .rename(columns={"label": "pred"})[["token", "pred"]]
    )
    out = data.tokens.merge(best, on="token", how="left")
    out["pred"] = out["pred"].fillna(labels[0])  # unseen token -> label 0
    out = out[["conv_id", "turn_idx", "token_idx", "token", "pos", "pred"]]
    out = out.rename(columns={"pred": "label"})
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    out["token_idx"] = out["token_idx"].astype(np.int32)
    return out


def main() -> None:
    from crfsuite_spark.datagen.transcripts import generate

    data = generate(n_convs=20, turns_per_conv=8, seed=42)

    dec = gold_decode(data)
    dec.to_parquet(
        os.path.join(FIXTURES, "gold_decode_synthetic.parquet"), index=False
    )
    print(f"gold_decode_synthetic: {len(dec)} rows")

    tri = data.gold_triples[["conv_id", "turn_idx", "subj", "pred", "obj"]].copy()
    tri["turn_idx"] = tri["turn_idx"].astype(np.int32)
    tri.to_parquet(
        os.path.join(FIXTURES, "gold_triples_synthetic.parquet"), index=False
    )
    print(f"gold_triples_synthetic: {len(tri)} rows")

    # per-turn timestamps for the temporal/lifecycle oracles (valid-time
    # scoping, incremental merge): the generator's seeded ts, one row per
    # turn, joined to the triples fixture on (conv_id, turn_idx)
    ts = data.transcripts[["conv_id", "turn_idx", "ts"]].copy()
    # Spark's parquet reader rejects TIMESTAMP(NANOS); write micros
    ts["ts"] = ts["ts"].astype("datetime64[us]")
    ts.to_parquet(
        os.path.join(FIXTURES, "gold_turn_ts_synthetic.parquet"), index=False
    )
    print(f"gold_turn_ts_synthetic: {len(ts)} rows")

    # the gold mention stream (surface + canonical_id supervision) so
    # the alias-mining oracles (kg_mine_aliases, kg_mine_acronyms) can
    # replicate co-occurrence mining in DuckDB SQL.  Generated from a
    # LARGER corpus than the decode fixtures (120 convs, own seed):
    # acronym mining needs conversation-local acronym + full-name
    # co-occurrence, which is sparse at 20 conversations
    gm = generate(
        n_convs=120, turns_per_conv=8, seed=91, entity_pool=3
    ).gold_mentions.copy()
    for c in ("turn_idx", "start_tok", "end_tok"):
        gm[c] = gm[c].astype(np.int32)
    gm.to_parquet(
        os.path.join(FIXTURES, "gold_mentions_synthetic.parquet"), index=False
    )
    print(f"gold_mentions_synthetic: {len(gm)} rows")

    # the generator's alias dictionary, checked in so the e2e oracle
    # (kg_triples_fused_e2e) can replicate exact linking in DuckDB SQL
    data.alias_dict.to_parquet(
        os.path.join(FIXTURES, "alias_dict_synthetic.parquet"), index=False
    )
    print(f"alias_dict_synthetic: {len(data.alias_dict)} rows")

    # the full turn table (all six input_hint columns) so the
    # conversation-analytics oracles (tr_conv_stats, tr_chat_examples)
    # can recompute the rollups in DuckDB SQL from the same rows
    turns = data.transcripts[
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ].copy()
    turns["ts"] = turns["ts"].astype("datetime64[us]")
    turns.to_parquet(
        os.path.join(FIXTURES, "gold_turns_synthetic.parquet"), index=False
    )
    print(f"gold_turns_synthetic: {len(turns)} rows")

    # pronoun-bearing conversations for the coref oracle
    # (kg_coref_resolve): token stream + gold entity spans
    from crfsuite_spark.datagen.coref import coref_conversations

    ctoks, cspans = coref_conversations(n_convs=24, seed=77)
    ctoks.to_parquet(
        os.path.join(FIXTURES, "coref_tokens_synthetic.parquet"), index=False
    )
    cspans.to_parquet(
        os.path.join(FIXTURES, "coref_spans_synthetic.parquet"), index=False
    )
    print(f"coref fixtures: {len(ctoks)} tokens, {len(cspans)} spans")

    # ambiguous-alias mentions + dictionary + entity profiles for the
    # disambiguation oracle (kg_disambiguate)
    from crfsuite_spark.datagen.disambig import disambig_mentions

    dm, da, dp = disambig_mentions(n_mentions=200, seed=13)
    dm.to_parquet(
        os.path.join(FIXTURES, "disambig_mentions_synthetic.parquet"),
        index=False,
    )
    da.to_parquet(
        os.path.join(FIXTURES, "disambig_alias_synthetic.parquet"), index=False
    )
    dp.to_parquet(
        os.path.join(FIXTURES, "disambig_profiles_synthetic.parquet"),
        index=False,
    )
    print(f"disambig fixtures: {len(dm)} mentions, {len(da)} aliases, "
          f"{len(dp)} profiles")


if __name__ == "__main__":
    main()

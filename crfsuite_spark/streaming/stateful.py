"""Custom stateful streaming operator: per-conversation running entity
state via ``applyInPandasWithState``.

The batch pipeline treats each turn as an independent CRF sequence; on
a live stream it is often useful to carry *conversation-level* state
across micro-batches — e.g. the set of entities mentioned so far and a
running turn count, emitted as a delta per update. This is the
``applyInPandasWithState`` pattern the batch engine cannot express:
arbitrary per-key state with timeout-based eviction, updated
incrementally as turns arrive.

State per ``conv_id``: (n_turns_seen, max_turn_idx, entity_counts as
parallel lists). Each micro-batch emits one row per conversation
updated in that batch with the merged totals. Conversations idle past
``state_ttl`` are evicted via processing-time timeout (the bounded-state
requirement at 10^12-turn scale: state size tracks ACTIVE
conversations, not history).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_turns long, max_turn int, ents array<string>, counts array<long>"
OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, max_turn int, n_distinct_entities int, "
    "top_entity string"
)


def _extract_mentions(texts: pd.Series, lexicon: set[str]) -> dict[str, int]:
    counts: dict[str, int] = {}
    for t in texts:
        if not t:
            continue
        for w in str(t).split():
            w = w.strip(".,;:!?\"'")
            if w in lexicon:
                counts[w] = counts.get(w, 0) + 1
    return counts


def conversation_state_fn(lexicon: set[str], state_ttl_ms: int = 3_600_000):
    """Build the (key, pdf_iter, state) -> pdf_iter function for
    ``applyInPandasWithState``."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n_turns, max_turn, ents, counts = (
            state.get if state.exists else (0, -1, [], [])
        )
        ent_counts = dict(zip(ents, counts))
        for pdf in pdfs:
            n_turns += len(pdf)
            if len(pdf):
                max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            for ent, c in _extract_mentions(pdf["text"], lexicon).items():
                ent_counts[ent] = ent_counts.get(ent, 0) + c
        ents = sorted(ent_counts)
        state.update((n_turns, max_turn, ents, [ent_counts[e] for e in ents]))
        state.setTimeoutDuration(state_ttl_ms)
        top = max(ent_counts, key=lambda e: (ent_counts[e], e)) if ent_counts else None
        yield pd.DataFrame({
            "conv_id": [key[0]],
            "n_turns": [n_turns],
            "max_turn": [max_turn],
            "n_distinct_entities": [len(ents)],
            "top_entity": [top],
        })

    return fn


def conversation_entity_state(
    transcripts: DataFrame,
    lexicon: set[str],
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming DataFrame of per-conversation running entity stats.

    ``transcripts`` must be a streaming DataFrame with (conv_id,
    turn_idx, text). One output row per conversation per micro-batch
    that touched it.
    """
    return (
        transcripts.groupBy("conv_id")
        .applyInPandasWithState(
            conversation_state_fn(lexicon, state_ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )

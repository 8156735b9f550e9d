"""Streaming pronoun coreference: per-conversation antecedent state.

The batch resolver (kg/coref.py) is one window over the whole
conversation; on a live stream the same semantics need carried state —
the most recent completed mention per entity type — updated as turns
arrive and read by pronouns in later micro-batches. This is the
``applyInPandasWithState`` shape: per-conv_id state of one (turn,
pos, surface) slot per tracked entity type (the pronoun_types map's
type universe; PER/ORG/LOC by default), bounded and TTL-evicted, so
state size tracks ACTIVE conversations at 10^12-turn scale, never
history.

Input rows are turns ALREADY annotated by the upstream extraction pass
(the fused decoder emits spans per turn inside the same micro-batch):
(conv_id, turn_idx, prons: array<struct<pos,pronoun>>,
 mentions: array<struct<pos,etype,surface>>).

Contract: turns of one conversation arrive in turn_idx order ACROSS
micro-batches (standard for transcript logs; within a batch rows are
sorted here). Under that contract the output is row-identical to the
batch resolver — asserted by tests/test_streaming.py's
batch-parity test, which splits the corpus mid-conversation.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from crfsuite_spark.kg.coref import PRONOUN_TYPES

STATE_SCHEMA = "turns array<int>, poss array<int>, surfaces array<string>"
OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, token_idx int, pronoun string, "
    "ant_turn_idx int, ant_pos int, ant_type string, ant_surface string"
)


def coref_state_fn(
    state_ttl_ms: int = 3_600_000,
    pronoun_types: dict | None = None,
):
    """Build the applyInPandasWithState function: resolve pronouns
    against carried per-type last-mention state, mention-before-pronoun
    at identical (turn, pos) like the batch window's tie order.
    ``pronoun_types`` follows the batch resolver's contract; the state
    slots are driven by its type universe, so custom maps carry their
    types across micro-batches exactly like the defaults."""
    pronoun_types = PRONOUN_TYPES if pronoun_types is None else pronoun_types
    tracked = sorted({t for ts in pronoun_types.values() for t in ts})

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            turns, poss, surfaces = state.get
            last = {
                t: (turns[i], poss[i], surfaces[i])
                for i, t in enumerate(tracked)
                if i < len(turns) and turns[i] >= 0
            }
        else:
            last = {}
        out = []
        # a conversation can span several Arrow chunks within one
        # micro-batch (maxRecordsPerBatch); per-chunk sorting would
        # process turns out of order across chunk boundaries, so
        # buffer the group's chunks and sort ONCE
        chunks = [pdf for pdf in pdfs if len(pdf)]
        merged = (
            pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        )
        if len(merged):
            for row in merged.sort_values("turn_idx").itertuples():
                # one merged (pos-ordered) event stream per turn;
                # mentions sort before pronouns at the same pos.
                # Arrow delivers array cells as numpy.ndarray, whose
                # truthiness throws for len >= 2 — test None explicitly
                mentions = [] if row.mentions is None else list(row.mentions)
                prons = [] if row.prons is None else list(row.prons)
                events = [(int(m["pos"]), 0, m) for m in mentions] + [
                    (int(p["pos"]), 1, p) for p in prons
                ]
                for pos, kind, ev in sorted(events, key=lambda e: (e[0], e[1])):
                    if kind == 0:
                        last[ev["etype"]] = (
                            int(row.turn_idx), pos, ev["surface"]
                        )
                        continue
                    pron = ev["pronoun"].lower()
                    cands = [
                        (t,) + last[t]
                        for t in pronoun_types.get(pron, ())
                        if t in last
                    ]
                    best = (
                        max(cands, key=lambda c: (c[1], c[2])) if cands else None
                    )
                    out.append({
                        "conv_id": key[0],
                        "turn_idx": int(row.turn_idx),
                        "token_idx": pos,
                        "pronoun": pron,
                        "ant_turn_idx": best[1] if best else None,
                        "ant_pos": best[2] if best else None,
                        "ant_type": best[0] if best else None,
                        "ant_surface": best[3] if best else None,
                    })
        state.update((
            [last[t][0] if t in last else -1 for t in tracked],
            [last[t][1] if t in last else -1 for t in tracked],
            [last[t][2] if t in last else "" for t in tracked],
        ))
        state.setTimeoutDuration(state_ttl_ms)
        if out:
            yield pd.DataFrame(out)

    return fn


def streaming_coref(
    annotated: DataFrame,
    state_ttl_ms: int = 3_600_000,
    pronoun_types: dict | None = None,
) -> DataFrame:
    """Streaming DataFrame of resolved pronouns (batch-parity schema).

    ``annotated``: streaming frame (conv_id, turn_idx, prons, mentions)
    — see module docstring for the array element types.
    """
    return annotated.groupBy("conv_id").applyInPandasWithState(
        coref_state_fn(state_ttl_ms, pronoun_types),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

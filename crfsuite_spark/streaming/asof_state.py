"""Streaming as-of join: per-key "latest right row so far" state.

The streaming twin of :func:`crfsuite_spark.operators.asof.asof_join`:
left events pick up the most recent right row with ``r.ts <= l.ts``
(optionally strict / within a tolerance), where "most recent" is over
everything that has ARRIVED up to the left row's micro-batch — the
standard enrich-stream-with-latest-snapshot semantics (a right row
that arrives later than a left row already emitted can NOT
retro-match; buffering for that is a watermark-join problem, which
Spark's built-in stream-stream interval join covers at the cost of
emitting on watermark close. This operator trades retro-matching for
immediate emission and O(1) state per key).

State per key: the single best (max ts, then max id) right row seen —
bounded regardless of stream length, evicted via processing-time
timeout. Within a micro-batch, the group's rows are sorted by
(ts, right-before-left, id) before replay, so intra-batch ordering
matches the batch operator exactly; when arrival order respects event
time per key, the whole output matches batch
:func:`~crfsuite_spark.operators.asof.asof_join` row-for-row
(tested in tests/test_streaming.py).

Input: ONE unioned stream with columns
(id long, key string-or-long, ts timestamp, side int, value double),
side 0 = right (snapshot/dimension), 1 = left (event to enrich) — the
same tagging trick the batch union+window uses. Output: one row per
LEFT input row.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "r_ts long, r_id long, r_value double"
OUTPUT_SCHEMA = (
    "id long, key long, ts timestamp, "
    "asof_id long, asof_value double, asof_ts timestamp"
)


def asof_state_fn(
    tolerance_s: float | None = None,
    strict: bool = False,
    state_ttl_ms: int = 3_600_000,
):
    """Build the (key, pdf_iter, state) -> pdf_iter function for
    ``applyInPandasWithState``. Timestamps are carried as int64
    nanoseconds inside state."""
    tol_ns = None if tolerance_s is None else int(tolerance_s * 1e9)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best = state.get if state.exists else None  # (ts_ns, id, value)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        ts_ns = pd.to_datetime(batch["ts"]).astype("int64")
        # right rows first at equal ts (the strict/non-strict decision
        # is made at match time against best's ts, so one sort works
        # for both modes), max id last among right ties
        order = sorted(
            range(len(batch)),
            key=lambda i: (ts_ns.iat[i], int(batch["side"].iat[i]), int(batch["id"].iat[i])),
        )
        out_id, out_ts, m_id, m_val, m_ts = [], [], [], [], []
        for i in order:
            t = int(ts_ns.iat[i])
            if int(batch["side"].iat[i]) == 0:
                cand = (t, int(batch["id"].iat[i]), float(batch["value"].iat[i]))
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
            else:
                ok = (
                    best is not None
                    and (best[0] < t if strict else best[0] <= t)
                    and (tol_ns is None or t - best[0] <= tol_ns)
                )
                out_id.append(int(batch["id"].iat[i]))
                out_ts.append(t)
                m_id.append(best[1] if ok else None)
                m_val.append(best[2] if ok else None)
                m_ts.append(best[0] if ok else None)
        if best is not None:
            state.update((int(best[0]), int(best[1]), float(best[2])))
        state.setTimeoutDuration(state_ttl_ms)
        if out_id:
            yield pd.DataFrame(
                {
                    "id": pd.array(out_id, dtype="Int64"),
                    "key": pd.array([key[0]] * len(out_id), dtype="Int64"),
                    "ts": pd.to_datetime(pd.array(out_ts, dtype="Int64")),
                    "asof_id": pd.array(m_id, dtype="Int64"),
                    "asof_value": pd.array(m_val, dtype="Float64"),
                    "asof_ts": pd.to_datetime(pd.array(m_ts, dtype="Int64")),
                }
            )

    return fn


def streaming_asof(
    tagged: DataFrame,
    tolerance_s: float | None = None,
    strict: bool = False,
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming as-of join over a pre-tagged unioned stream with
    columns (id, key, ts, side, value); side 0 = right, 1 = left.
    Emits one row per left input row, enriched with the latest
    qualifying right row seen so far for its key."""
    return tagged.groupBy("key").applyInPandasWithState(
        asof_state_fn(tolerance_s, strict, state_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

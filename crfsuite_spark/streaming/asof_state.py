"""Streaming as-of join: per-key "latest right rows so far" state.

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

State per key: the TWO best right rows — the (max ts, max id) one and
the best with a STRICTLY earlier ts. The second is what makes
``strict=True`` correct: a left row whose ts equals the current best's
ts must match the previous-ts right row, which a single-row state
would have already overwritten. Bounded regardless of stream length,
evicted via processing-time timeout. Within a micro-batch, the group's
rows are sorted by (ts, right-before-left, id) before replay, so
intra-batch ordering matches the batch operator exactly; when arrival
order respects event time per key, the whole output matches batch
:func:`~crfsuite_spark.operators.asof.asof_join` row-for-row in both
modes (tested in tests/test_streaming.py).

NULL timestamps follow SQL comparison semantics, matching the batch
operator: a NULL-ts right row is ignored (never "before everything" —
the NaT→INT64_MIN sentinel hazard), and a NULL-ts left row is emitted
unmatched.

Input: ONE unioned stream with columns
(id long, key <key_type>, ts timestamp, side int, value double),
side 0 = right (snapshot/dimension), 1 = left (event to enrich) — the
same tagging trick the batch union+window uses. Output: one row per
LEFT input row. ``key_type`` (default ``long``) parameterizes the
grouping column's type, e.g. ``string`` for conv_id-keyed transcripts.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = (
    "r_ts long, r_id long, r_value double, "
    "p_ts long, p_id long, p_value double"
)


def output_schema(key_type: str = "long") -> str:
    return (
        f"id long, key {key_type}, ts timestamp, "
        "asof_id long, asof_value double, asof_ts timestamp"
    )


def asof_state_fn(
    tolerance_s: float | None = None,
    strict: bool = False,
    state_ttl_ms: int = 3_600_000,
):
    """Build the (key, pdf_iter, state) -> pdf_iter function for
    ``applyInPandasWithState``. Timestamps are carried as int64
    nanoseconds inside state; state is (best, prev) where prev is the
    best right row with ts strictly below best's ts (None fields when
    absent)."""
    tol_ns = None if tolerance_s is None else int(tolerance_s * 1e9)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best = prev = None  # each: (ts_ns, id, value)
        if state.exists:
            r_ts, r_id, r_val, p_ts, p_id, p_val = state.get
            if r_ts is not None:
                best = (r_ts, r_id, r_val)
            if p_ts is not None:
                prev = (p_ts, p_id, p_val)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        ts_dt = pd.to_datetime(batch["ts"])
        valid = ts_dt.notna()
        # right rows first at equal ts (one sort serves both modes —
        # the strict decision happens at match time against state),
        # max id last among right ties; NULL-ts rows sort last and are
        # handled explicitly below
        sentinel = (1 << 62)
        ts_ns = ts_dt.astype("int64").where(valid, sentinel)
        order = sorted(
            range(len(batch)),
            key=lambda i: (
                int(ts_ns.iat[i]),
                int(batch["side"].iat[i]),
                int(batch["id"].iat[i]),
            ),
        )
        out_id, out_ts, m_id, m_val, m_ts = [], [], [], [], []
        for i in order:
            is_right = int(batch["side"].iat[i]) == 0
            if not valid.iat[i]:
                if not is_right:  # NULL-ts left row: emitted unmatched
                    out_id.append(int(batch["id"].iat[i]))
                    out_ts.append(None)
                    m_id.append(None)
                    m_val.append(None)
                    m_ts.append(None)
                continue  # NULL-ts right row: never matches (SQL <=)
            t = int(ts_ns.iat[i])
            if is_right:
                cand = (t, int(batch["id"].iat[i]), float(batch["value"].iat[i]))
                if best is None:
                    best = cand
                elif cand[0] > best[0]:
                    prev, best = best, cand
                elif cand[0] == best[0]:
                    if cand[1] > best[1]:
                        best = cand  # prev keeps the strictly-earlier ts
                elif prev is None or (cand[0], cand[1]) > (prev[0], prev[1]):
                    # cand[0] < best[0] here: a late right between prev
                    # and best (arrival-order violation) — still track
                    # the best strictly-earlier row
                    prev = cand
            else:
                hit = None
                for cand in (best, prev):
                    if cand is None:
                        continue
                    if cand[0] < t if strict else cand[0] <= t:
                        hit = cand
                        break
                ok = hit is not None and (
                    tol_ns is None or t - hit[0] <= tol_ns
                )
                out_id.append(int(batch["id"].iat[i]))
                out_ts.append(t)
                m_id.append(hit[1] if ok else None)
                m_val.append(hit[2] if ok else None)
                m_ts.append(hit[0] if ok else None)
        if best is not None or prev is not None:
            b = best or (None, None, None)
            p = prev or (None, None, None)
            state.update((b[0], b[1], b[2], p[0], p[1], p[2]))
        state.setTimeoutDuration(state_ttl_ms)
        if out_id:
            yield pd.DataFrame(
                {
                    "id": pd.array(out_id, dtype="Int64"),
                    "key": [key[0]] * len(out_id),
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
    key_type: str = "long",
) -> DataFrame:
    """Streaming as-of join over a pre-tagged unioned stream with
    columns (id, key, ts, side, value); side 0 = right, 1 = left.
    Emits one row per left input row, enriched with the latest
    qualifying right row seen so far for its key. ``key_type`` must
    name the key column's Spark SQL type (default ``long``)."""
    from pyspark.sql import functions as F

    # groupBy groups NULL keys into one group, but a SQL equality join
    # never matches NULL = NULL: drop NULL-key RIGHT rows (they can
    # match nothing) and keep NULL-key LEFT rows (emitted unmatched by
    # the state fn, since their group then holds no right state) —
    # same guard as the batch operator (operators/asof.py)
    tagged = tagged.where(
        F.col("key").isNotNull() | (F.col("side") == 1)
    )
    return tagged.groupBy("key").applyInPandasWithState(
        asof_state_fn(tolerance_s, strict, state_ttl_ms),
        outputStructType=output_schema(key_type),
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

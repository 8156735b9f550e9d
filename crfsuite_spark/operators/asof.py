"""As-of (point-in-time) join — the temporal join Spark lacks natively.

For every left row (keys, ts) attach the single most recent right row
with the same keys and ``right.ts <= left.ts`` (optionally within a
lookback ``tolerance``) — the canonical "price as of trade time" /
"latest profile snapshot before this event" join of time-series stores
(kdb+ aj, pandas merge_asof, DuckDB ASOF JOIN — the driver oracle uses
DuckDB's native one against this implementation).

Scale shape — the union+window trick, NOT a range join:

- A naive range join (``l.ts >= r.ts`` + argmax) explodes to
  O(|L|·|R|) per key before aggregation; Spark's broadcast range join
  needs a small side. Instead: tag both sides, UNION on the shared
  (keys, ts) spine, and take ``last(payload, ignorenulls=True)`` over a
  keys-partitioned, (ts, side)-ordered running window. Cost is ONE hash
  Exchange + per-key sort — the same shape as sessionize — and it
  scales to both sides being 100 TB facts (no broadcast, no fan-out).
  Plan-asserted single-Exchange in tests/test_asof.py.
- Ordering (ts ASC, side ASC) with right = side 0 makes an equal-ts
  right row visible to the left row (inclusive <=); ``strict=True``
  flips the side order so equal-ts rows are NOT matched (<).
- Determinism: several right rows on the same (keys, ts) tie-break by
  ``right_id_col`` (max wins) — folded into the window ORDERING, not a
  separate dedup groupBy, so the whole join stays one Exchange. Without
  a tie-break column the winner would be partition-order-dependent, so
  ``right_id_col`` is required.

Left rows with no match (or only matches older than ``tolerance``)
keep NULL payload columns — left-join semantics, row count preserved
(tested invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    right_id_col: str,
    prefix: str = "asof_",
    tolerance_s: float | None = None,
    strict: bool = False,
) -> DataFrame:
    """Attach the latest-at-or-before right payload to every left row.

    - ``on``: equality key columns present on both sides.
    - ``ts_col``: timestamp column present on both sides.
    - ``payload_cols``: right columns to attach, each emitted as
      ``prefix + name`` (NULL when no right row qualifies).
    - ``right_id_col``: deterministic tie-break among right rows
      sharing (on, ts) — the max wins. Also emitted as
      ``prefix + right_id_col``.
    - ``tolerance_s``: max lookback in seconds (None = unbounded).
    - ``strict``: require ``right.ts < left.ts`` instead of ``<=``.
    """
    if ts_col in payload_cols:
        raise ValueError("ts_col is carried implicitly; remove it from payload_cols")
    pay = list(dict.fromkeys([right_id_col] + list(payload_cols)))

    p_type = right.select(F.struct(*pay).alias("__p")).schema["__p"].dataType
    l_type = left.select(F.struct(*left.columns).alias("__l")).schema["__l"].dataType
    tie_type = right.schema[right_id_col].dataType
    l = left.select(
        *on,
        F.col(ts_col),
        F.lit(None).cast(p_type).alias("__p"),
        F.lit(1 if not strict else -1).alias("__side"),
        F.lit(None).cast(tie_type).alias("__tie"),
        F.struct(*left.columns).alias("__l"),
    )
    # a NULL right timestamp compares false to everything in SQL (and
    # in DuckDB's ASOF JOIN / pandas merge_asof) — without this filter
    # it would sort nulls-first and spuriously match as "before
    # everything". NULL-ts LEFT rows need no guard: they sort before
    # every surviving right row, so they see no match. NULL equality
    # KEYS need the same guard: Window.partitionBy groups NULL keys
    # into one partition, but a SQL equality join never matches NULL =
    # NULL — dropping NULL-key right rows leaves NULL-key left rows
    # alone in their partition, i.e. unmatched, exactly the join
    # semantics the DuckDB ASOF oracle implements.
    key_ok = F.lit(True)
    for c in on:
        key_ok = key_ok & F.col(c).isNotNull()
    r = right.where(F.col(ts_col).isNotNull() & key_ok).select(
        *on,
        F.col(ts_col),
        F.struct(*pay).alias("__p"),
        F.lit(0).alias("__side"),
        F.col(right_id_col).alias("__tie"),
        F.lit(None).cast(l_type).alias("__l"),
    )
    u = l.unionByName(r)

    # (ts, side, tie) ordering: side 0 = right. Non-strict: left side 1
    # → right sorts first at equal ts (visible). Strict: left side -1 →
    # left sorts first (equal-ts right rows invisible). __tie ASC among
    # right rows sharing (on, ts) puts the max right_id_col LAST, so
    # last() picks it — the tie-collapse costs ordering, not a second
    # Exchange.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__p", ignorenulls=True).over(w)
    matched_ts = F.last(
        F.when(F.col("__side") == 0, F.col(ts_col)), ignorenulls=True
    ).over(w)
    out = (
        u.withColumn("__m", matched)
        .withColumn("__mts", matched_ts)
        .where(F.col("__side") != 0)
    )
    if tolerance_s is not None:
        fresh = (
            F.col(ts_col).cast("double") - F.col("__mts").cast("double")
        ) <= float(tolerance_s)
        out = out.withColumn(
            "__m", F.when(fresh, F.col("__m"))
        ).withColumn("__mts", F.when(fresh, F.col("__mts")))
    keep = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    keep += [F.col(f"__m.{c}").alias(prefix + c) for c in pay]
    keep.append(F.col("__mts").alias(prefix + ts_col))
    return out.select(*keep)

"""Temporal joins: as-of (most-recent-at-or-before) matching.

The reference has no temporal operators; this is a training-data /
event-analytics extension (the brief's "operator Spark lacks" class —
expressed as a composition of existing DataFrame ops, case (a)).

Spark has no ASOF JOIN. The naive rewrite — a range theta-join
``l.ts >= r.ts`` + argmax — explodes quadratically per key. The
scalable shape used here is union-tag + running last:

1. tag right rows side=0, left rows side=1, union them;
2. one window over (partition by keys, order by ts, side, id) with
   ``last(payload, ignorenulls=True)`` and rows unbounded preceding —
   each left row sees the latest right payload at-or-before it;
3. keep the left rows.

ONE shuffle on the join keys, no join node at all, and per-key memory
is O(1) in the running window (Spark's window sort spills). Ties:
a right row at exactly left.ts matches (side 0 sorts first); equal
timestamps break deterministically by the id column. At 100 TB this
is the same plan — the shuffle is keyed by user/entity and the sort
is per-partition."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str],
    id_col: str = "event_id",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row of the same
    ``on`` key with ``right_ts <= left_ts`` (backward as-of). Right
    payload columns come back prefixed ``asof_``; rows with no match
    keep NULLs. ``tolerance_seconds`` voids matches older than the
    window (pandas ``merge_asof(tolerance=...)`` analog)."""
    lcols = left.columns
    l = left.select(*lcols, F.lit(1).alias("_side"))
    payload = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c).alias(c) for c in right_payload]
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        F.col(id_col),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), F.col("_side").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_payload", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if tolerance_seconds is not None:
        in_window = F.col("_m._rts") >= (
            F.col(left_ts) - F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS")
        )
        matched = matched.withColumn("_m", F.when(in_window, F.col("_m")))
    return matched.select(
        *lcols,
        F.col("_m._rts").alias("asof_ts"),
        *[F.col(f"_m.{c}").alias(f"asof_{c}") for c in right_payload],
    )

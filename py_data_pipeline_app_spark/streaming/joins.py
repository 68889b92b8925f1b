"""Stream-stream event-time join: pair two event streams on a key
within a bounded time gap (extension — the reference has no streaming,
SURVEY.md §2.8; this is the click-attribution / conversion-pairing
operator every event pipeline needs).

The SAME builder works on batch and streaming frames — Spark defines
the join as a plain DataFrame op — which is how the DuckDB oracle
checks it: the batch run over the full table equals the streaming
run's accumulated output (stream-stream INNER joins emit each match
as soon as both sides have arrived; the watermark only bounds state
and drops late data, so a replay with no late arrivals is exact).

Mechanics on a stream: both sides carry a watermark, and the join
condition includes the time-range bound ``l_ts <= r_ts <= l_ts +
max_delay`` — that is what lets Spark compute how long each side's
rows can still find a partner and EVICT state past it (left rows after
``watermark + max_delay``, right rows after ``watermark``). Without
the range bound the state store grows with the whole stream.

Scale: the join shuffles both streams on the key — same plan as a
batch equi-join with residual range predicate; skewed keys are AQE /
salting territory exactly like any other join. At 100 TB/day the state
store holds only ``max_delay + watermark`` worth of events per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_time_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_payload: list[str] | None = None,
    right_payload: list[str] | None = None,
    max_delay: str = "30 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` x ``right`` rows sharing ``on`` where the right
    event lands inside ``[left_ts, left_ts + max_delay]``. Output
    columns: ``on``, ``l_ts``, ``r_ts``, then payloads prefixed
    ``l_`` / ``r_``. On streaming inputs both sides get ``watermark``
    applied (required for state eviction); batch inputs are joined
    as-is — identical rows, which the correctness gate verifies.

    ``how="left_outer"`` keeps left rows with no partner (nulls on the
    right) — "views that never converted". On a stream, an unmatched
    left row can only be DECLARED unmatched once the watermark has
    passed its whole candidate window (``l_ts + max_delay``), so
    null-padded rows emit with that delay, and rows whose window the
    watermark never crosses (the tail of a drained stream) are
    withheld — inherent to the model, not a bug; batch mode has no
    such boundary and is the reconciliation path."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported how={how!r}")
    lp = list(left_payload or [])
    rp = list(right_payload or [])

    l = left.select(
        F.col(on),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in lp],
    )
    r = right.select(
        F.col(on).alias("_r_key"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in rp],
    )
    # watermarks demand TIMESTAMP (not NTZ); the cast is session-TZ
    # stable (UTC, session.py) and only applied on the streaming path
    # so batch output types stay bit-identical to the source
    if l.isStreaming:
        l = l.withColumn("l_ts", F.col("l_ts").cast("timestamp")).withWatermark(
            "l_ts", watermark
        )
    if r.isStreaming:
        r = r.withColumn("r_ts", F.col("r_ts").cast("timestamp")).withWatermark(
            "r_ts", watermark
        )

    cond = (
        (l[on] == r["_r_key"])
        & (r["r_ts"] >= l["l_ts"])
        & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, how).drop("_r_key")


def view_click_pairs(
    events: DataFrame,
    *,
    max_delay: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Attribution pairing on the driver's events shape: every (view,
    click) pair of the same user where the click follows the view
    within ``max_delay``. Works on the batch table and on a stream of
    the same schema (filters split one source into the two sides —
    on a real bus these would be two topics)."""
    views = events.filter(F.col("event_type") == "view")
    clicks = events.filter(F.col("event_type") == "click")
    return event_time_join(
        views,
        clicks,
        on="user_id",
        left_payload=["event_id"],
        right_payload=["event_id", "value"],
        max_delay=max_delay,
        watermark=watermark,
    )

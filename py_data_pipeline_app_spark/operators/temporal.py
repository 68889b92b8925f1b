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
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach one right row of the same ``on`` key
    per ``direction`` (pandas ``merge_asof`` semantics):

    - ``backward`` (default): most recent right with rts <= lts;
    - ``forward``: earliest right with rts >= lts;
    - ``nearest``: whichever of the two has the smaller |rts - lts|
      (ties go backward, matching pandas).

    Right payload columns come back prefixed ``asof_``; rows with no
    match keep NULLs. ``tolerance_seconds`` voids matches farther than
    the window in the match direction. Forward is the same single
    union-tag window pass as backward with the frame mirrored
    (running FIRST over [current, following)); nearest runs both
    passes over the SAME shuffle/sort (two window specs, one
    partitioning — Spark reuses the exchange) and picks per-row."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unsupported direction={direction!r}")
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

    # backward: right rows sort BEFORE left at equal ts (side 0 < 1) so
    # a same-instant right is inside [preceding, current]; forward
    # mirrors the tie order so it is inside [current, following]
    w_back = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), F.col("_side").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), F.col("_side").desc(), F.col(id_col).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    if direction in ("backward", "nearest"):
        u = u.withColumn("_mb", F.last("_payload", ignorenulls=True).over(w_back))
    if direction in ("forward", "nearest"):
        u = u.withColumn("_mf", F.first("_payload", ignorenulls=True).over(w_fwd))
    matched = u.filter(F.col("_side") == 1)

    def gated(m: str, cmp_col) -> F.Column:
        if tolerance_seconds is None:
            return F.col(m)
        return F.when(cmp_col, F.col(m))

    tol = (
        F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS")
        if tolerance_seconds is not None
        else None
    )
    lts = F.col(left_ts)
    if direction == "backward":
        matched = matched.withColumn(
            "_m", gated("_mb", F.col("_mb._rts") >= lts - tol if tol is not None else None)
        )
    elif direction == "forward":
        matched = matched.withColumn(
            "_m", gated("_mf", F.col("_mf._rts") <= lts + tol if tol is not None else None)
        )
    else:  # nearest
        mb = (
            F.when(F.col("_mb._rts") >= lts - tol, F.col("_mb"))
            if tol is not None
            else F.col("_mb")
        )
        mf = (
            F.when(F.col("_mf._rts") <= lts + tol, F.col("_mf"))
            if tol is not None
            else F.col("_mf")
        )
        matched = matched.withColumn("_gb", mb).withColumn("_gf", mf)
        gap_b = F.unix_micros(lts.cast("timestamp")) - F.unix_micros(
            F.col("_gb._rts").cast("timestamp")
        )
        gap_f = F.unix_micros(F.col("_gf._rts").cast("timestamp")) - F.unix_micros(
            lts.cast("timestamp")
        )
        matched = matched.withColumn(
            "_m",
            F.when(F.col("_gb").isNull(), F.col("_gf"))
            .when(F.col("_gf").isNull(), F.col("_gb"))
            .when(gap_f < gap_b, F.col("_gf"))
            .otherwise(F.col("_gb")),  # ties -> backward, pandas-style
        )
    return matched.select(
        *lcols,
        F.col("_m._rts").alias("asof_ts"),
        *[F.col(f"_m.{c}").alias(f"asof_{c}") for c in right_payload],
    )


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    fact_ts: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bin_seconds: int = 21600,
) -> DataFrame:
    """Range (interval-containment) join: every fact row is paired with
    every interval row whose half-open window ``[start, end)`` contains
    ``fact_ts`` (and whose ``keys`` match, when given). A fact inside k
    overlapping intervals comes back k times — attribution semantics.
    Dedup ("does the fact fall in ANY window") is a ``groupBy`` away.

    Why not ``facts.join(intervals, ts.between(s, e))``? With no equi
    key that condition plans as BroadcastNestedLoopJoin — every fact
    row is tested against EVERY interval, O(|facts| x |intervals|)
    compute even when intervals are short. The scalable shape is the
    bin-bucketed rewrite (the same idea behind Databricks' range-join
    optimization and bucketed overlap joins in genomics engines):

    1. pick a bin width; each fact lands in exactly ONE bin
       (``floor(unix(ts) / w)``);
    2. each interval EXPLODES into every bin its span overlaps —
       short intervals hit few bins;
    3. equi-join on (keys..., bin) — a plain shuffled join Catalyst
       and AQE know how to plan, skew-splittable like any other —
       then re-check exact containment to drop same-bin near-misses.

    No duplicate pairs by construction: a fact has exactly one bin, so
    each (fact, interval) pair meets at most once. Cost scales with
    bin-sharing candidate pairs, not the cross product; the interval
    side is replicated ~span/bin_seconds rows per interval, so pick
    ``bin_seconds`` near the typical interval length.

    NULL ``end_col`` means a still-open interval ``[start, inf)``:
    those cannot be exploded into finitely many bins, so they take a
    keys-only equi-join (or a broadcast cross join when ``keys`` is
    empty — the open set is the small "current state" slice by
    contract) + ``ts >= start`` filter, unioned in."""
    keys = list(keys or [])
    w = int(bin_seconds)
    if w <= 0:
        raise ValueError("bin_seconds must be positive")
    overlap = set(facts.columns) & set(intervals.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"facts/intervals share non-key columns {sorted(overlap)}; "
            "rename one side"
        )

    # exact integer microseconds — unix_timestamp() truncates to whole
    # seconds, which would mis-bin sub-second boundaries. The cast
    # accepts TIMESTAMP_NTZ too; applied identically to both sides, so
    # bins stay aligned regardless of session timezone.
    wus = w * 1_000_000

    def micros(c: str) -> F.Column:
        return F.unix_micros(F.col(c).cast("timestamp"))

    f = facts.withColumn("_bin", F.floor(micros(fact_ts) / wus))

    bounded = intervals.filter(F.col(end_col).isNotNull())
    open_iv = intervals.filter(F.col(end_col).isNull())

    start_bin = F.floor(micros(start_col) / wus)
    # end is EXCLUSIVE: an interval ending exactly on a bin edge does
    # not reach into that bin — hence the 1-microsecond nudge back
    # before flooring.
    end_bin = F.floor((micros(end_col) - 1) / wus)
    b = bounded.withColumn(
        "_bin", F.explode(F.sequence(start_bin, F.greatest(end_bin, start_bin)))
    )

    contained = (F.col(fact_ts) >= F.col(start_col)) & (
        F.col(fact_ts) < F.col(end_col)
    )
    matched = f.join(b, on=keys + ["_bin"], how="inner").filter(contained)

    if keys:
        open_joined = f.join(open_iv, on=keys, how="inner")
    else:
        open_joined = f.join(F.broadcast(open_iv), how="cross")
    open_joined = open_joined.filter(F.col(fact_ts) >= F.col(start_col))

    return matched.unionByName(open_joined).drop("_bin")



"""Round-8 second-wave relational queries: Q3/Q8/Q12/Q17 shapes,
the RANGE-frame moving average, and their plan shapes."""

import contextlib
import io

from pyspark.sql import functions as F

from py_data_pipeline_app_spark.plans.queries import QUERIES
from py_data_pipeline_app_spark.sources.parquet import load_table


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_market_share_sums_to_one_per_region(spark, sf_dir):
    rows = QUERIES["nation_market_share"](spark, sf_dir).collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r.region_share)
        assert r.nation_revenue > 0
    for region, shares in by_region.items():
        assert abs(sum(shares) - 1.0) < 1e-4, (region, shares)


def test_market_share_window_runs_after_aggregation(spark, sf_dir):
    plan = plan_of(QUERIES["nation_market_share"](spark, sf_dir))
    # the share window must consume the aggregate, not the fact table:
    # Window appears above HashAggregate in the formatted tree (lower
    # operator id = closer to the sink)
    w = plan.index("Window")
    agg = plan.index("HashAggregate")
    assert w < agg, "window should run over the ~25-row aggregate"


def test_daily_trend_first_day_and_mean(spark, sf_dir):
    rows = sorted(
        QUERIES["daily_value_trend"](spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert rows[0].ma7 == round(rows[0].day_value, 2)
    # any row's ma7 is the mean of day_values within the trailing week
    for i, r in enumerate(rows):
        window = [
            x.day_value for x in rows[: i + 1] if (r.day - x.day).days <= 6
        ]
        assert abs(r.ma7 - sum(window) / len(window)) < 0.02, r


def test_small_quantity_counts_match_direct_filter(spark, sf_dir):
    out = QUERIES["small_quantity_order_revenue"](spark, sf_dir)
    total = sum(r.n_small_lots for r in out.collect())

    li = load_table(spark, "lineitem", sf_dir)
    pa = li.groupBy("l_partkey").agg(
        (
            0.5
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
                / F.count("l_quantity")
            )
        ).alias("half_avg")
    ).withColumnRenamed("l_partkey", "pk")
    direct = (
        li.join(pa, li["l_partkey"] == pa["pk"])
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .count()
    )
    assert total == direct


def test_shipping_priority_plan_and_order(spark, sf_dir):
    df = QUERIES["shipping_priority_top10"](spark, sf_dir)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan  # no global sort materialization
    assert plan.count("PushedFilters: [Is") >= 2  # date/segment hit the scans
    rows = df.collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_lateness_counts_are_consistent(spark, sf_dir):
    rows = QUERIES["order_priority_lateness"](spark, sf_dir).collect()
    li_count = load_table(spark, "lineitem", sf_dir).count()
    assert sum(r.n_lineitems for r in rows) == li_count
    for r in rows:
        assert r.high_late + r.low_late <= r.n_lineitems


def test_interval_attribution_matches_naive_theta_join(spark, sf_dir):
    out = {
        r.window_type: r.n_events
        for r in QUERIES["interval_window_attribution"](spark, sf_dir).collect()
    }
    events = load_table(spark, "events", sf_dir)
    wins = (
        events.groupBy("event_type")
        .agg(F.min("ts").alias("ws"))
        .select(
            F.col("event_type").alias("wt"),
            "ws",
            (F.col("ws") + F.expr("INTERVAL 72 HOURS")).alias("we"),
        )
    )
    naive = {
        r.wt: r.n
        for r in events.crossJoin(wins)
        .filter((F.col("ts") >= F.col("ws")) & (F.col("ts") < F.col("we")))
        .groupBy("wt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == naive


def test_top_revenue_suppliers_keeps_ties_and_matches_max(spark, sf_dir):
    """Q15 shape: every returned supplier's revenue equals the global
    max, and the winner set is exactly the argmax set of the directly
    recomputed per-supplier revenues (ties kept — the semantic that
    distinguishes join-on-max from a row_number()-based argmax)."""
    out = QUERIES["top_revenue_suppliers"](spark, sf_dir).collect()
    assert out, "a non-empty quarter must produce at least one winner"

    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    rev = (
        load_table(spark, "lineitem", sf_dir)
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("r")
        )
    )
    best = rev.agg(F.max("r")).first()[0]
    winners = {r.l_suppkey for r in rev.filter(F.col("r") == best).collect()}
    assert {r.s_suppkey for r in out} == winners
    assert all(r.total_revenue == best for r in out)


def test_top_revenue_suppliers_plan_has_no_global_sort(spark, sf_dir):
    """The argmax must fold via a two-phase max agg + broadcast joins —
    never a global sort or a single-partition window."""
    df = QUERIES["top_revenue_suppliers"](spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan or "partial" in plan.lower()
    # supplier side never shuffles: the only Exchange keys on l_suppkey
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([a-z_0-9#]+)", plan)
    assert all(k.startswith("l_suppkey") for k in exchanges), exchanges


def test_promo_part_suppliers_matches_inner_join_distinct(spark, sf_dir):
    """Semi-join semantics: same supplier set as the naive
    inner-join-then-distinct, each supplier exactly once."""
    out = QUERIES["promo_part_suppliers"](spark, sf_dir).collect()
    ids = [r.s_suppkey for r in out]
    assert len(ids) == len(set(ids)), "semi join must not fan out"

    part = (
        load_table(spark, "part", sf_dir)
        .filter((F.col("p_type") == "PROMO") & (F.col("p_size") >= 25))
        .select("p_partkey")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_quantity") >= 49)
    naive = {
        r.l_suppkey
        for r in li.join(part, li["l_partkey"] == part["p_partkey"])
        .select("l_suppkey")
        .distinct()
        .collect()
    }
    assert set(ids) == naive


def test_promo_part_suppliers_plan_is_two_semi_joins(spark, sf_dir):
    """Both EXISTS hops plan as LeftSemi (match fan-out never
    materialized) and the part filters reach the parquet scan."""
    df = QUERIES["promo_part_suppliers"](spark, sf_dir)
    plan = plan_of(df, mode="extended")
    assert plan.count("LeftSemi") >= 2, plan
    formatted = plan_of(df)
    assert "PushedFilters: [IsNotNull(p_type)" in formatted or (
        "EqualTo(p_type,PROMO)" in formatted
    )

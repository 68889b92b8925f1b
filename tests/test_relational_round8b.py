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

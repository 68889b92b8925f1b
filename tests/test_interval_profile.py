"""interval_join (operators/temporal.py) and profile_columns
(operators/profile.py): containment semantics, bin-edge behavior,
open intervals, plan shape, and the one-job profile."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from py_data_pipeline_app_spark.operators.profile import profile_columns
from py_data_pipeline_app_spark.operators.temporal import interval_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    facts = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01T00:00:00")),  # exactly at a start -> in
            (2, 7, _ts("2024-01-01T05:59:59.500")),  # sub-second before end
            (3, 7, _ts("2024-01-01T06:00:00")),  # exactly at an end -> out
            (4, 8, _ts("2024-01-02T12:00:00")),  # key mismatch vs iv 1
            (5, 7, _ts("2024-03-01T00:00:00")),  # inside the open interval
        ],
        "fact_id long, k long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, 7, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T06:00:00")),
            (11, 7, _ts("2024-01-01T03:00:00"), _ts("2024-01-01T09:00:00")),
            (12, 8, _ts("2024-01-02T00:00:00"), _ts("2024-01-03T00:00:00")),
            (13, 7, _ts("2024-02-01T00:00:00"), None),  # open-ended
        ],
        "iv_id long, k long, start timestamp, end timestamp",
    )
    return facts, intervals


def pairs(df):
    return sorted((r.fact_id, r.iv_id) for r in df.collect())


def test_keyed_containment(frames):
    facts, intervals = frames
    out = interval_join(
        facts,
        intervals,
        fact_ts="ts",
        start_col="start",
        end_col="end",
        keys=["k"],
        bin_seconds=3600,
    )
    # fact 1: start-inclusive, iv 10 only; fact 2: overlap region -> both;
    # fact 3: end-exclusive for 10, inside 11; fact 4: key-matched iv 12;
    # fact 5: open interval 13
    assert pairs(out) == [(1, 10), (2, 10), (2, 11), (3, 11), (4, 12), (5, 13)]


def test_keyless_matches_naive(spark, frames):
    facts, intervals = frames
    out = interval_join(
        facts.drop("k"),
        intervals.drop("k").filter(F.col("end").isNotNull()),
        fact_ts="ts",
        start_col="start",
        end_col="end",
        bin_seconds=7200,
    )
    naive = (
        facts.drop("k")
        .join(
            intervals.drop("k").filter(F.col("end").isNotNull()),
            on=[
                F.col("ts") >= F.col("start"),
                F.col("ts") < F.col("end"),
            ],
        )
    )
    assert pairs(out) == sorted((r.fact_id, r.iv_id) for r in naive.collect())


def test_no_duplicate_pairs_with_wide_bins_and_long_intervals(spark):
    # an interval spanning 50 bins must still produce each pair once
    facts = spark.createDataFrame(
        [(i, _ts("2024-01-01T00:00:00")) for i in range(3)],
        "fact_id long, ts timestamp",
    ).withColumn("ts", F.col("ts") + F.expr("make_interval(0,0,0,0,fact_id,0,0)"))
    intervals = spark.createDataFrame(
        [(99, _ts("2023-12-31T00:00:00"), _ts("2024-01-03T00:00:00"))],
        "iv_id long, start timestamp, end timestamp",
    )
    out = interval_join(
        facts,
        intervals,
        fact_ts="ts",
        start_col="start",
        end_col="end",
        bin_seconds=3600,
    )
    assert pairs(out) == [(0, 99), (1, 99), (2, 99)]


def test_bounded_branch_is_equi_join(frames):
    facts, intervals = frames
    import contextlib
    import io

    out = interval_join(
        facts,
        intervals.filter(F.col("end").isNotNull()),
        fact_ts="ts",
        start_col="start",
        end_col="end",
        keys=["k"],
        bin_seconds=3600,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # the whole point: a hash/sort-merge equi join, never a nested loop
    assert "NestedLoop" not in plan


def test_interval_join_works_stream_static(spark, tmp_path, frames):
    """The bin-bucketed rewrite is stream-compatible: a streaming facts
    frame against static intervals is a pair of stream-static joins
    (equi on the bin + the broadcast open-interval branch), needing no
    watermark because the static side never grows. Accumulated output
    equals the batch run."""
    facts, intervals = frames
    batch_pairs = pairs(
        interval_join(
            facts,
            intervals,
            fact_ts="ts",
            start_col="start",
            end_col="end",
            keys=["k"],
            bin_seconds=3600,
        )
    )

    facts.write.parquet(f"{tmp_path}/landing/f1")
    stream = spark.readStream.schema(facts.schema).parquet(f"{tmp_path}/landing/*")
    joined = interval_join(
        stream,
        intervals,
        fact_ts="ts",
        start_col="start",
        end_col="end",
        keys=["k"],
        bin_seconds=3600,
    )
    q = (
        joined.writeStream.format("parquet")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .option("path", f"{tmp_path}/out")
        .trigger(availableNow=True)
        .queryName("iv_stream")
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r.fact_id, r.iv_id) for r in spark.read.parquet(f"{tmp_path}/out").collect()
    )
    assert got == batch_pairs


def test_bounded_branch_is_equi_join_without_broadcast(spark, frames):
    """At 100 TB both sides are big and nothing broadcasts: with the
    broadcast threshold off, the bounded branch must plan as a shuffled
    equi-join on the bin (SortMergeJoin/ShuffledHashJoin), never a
    nested loop — that is the entire point of the bin rewrite."""
    import contextlib
    import io

    facts, intervals = frames
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = interval_join(
            facts,
            intervals.filter(F.col("end").isNotNull()),
            fact_ts="ts",
            start_col="start",
            end_col="end",
            keys=["k"],
            bin_seconds=3600,
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        assert "NestedLoop" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_overlapping_non_key_columns_rejected(frames):
    facts, intervals = frames
    with pytest.raises(ValueError, match="share non-key"):
        interval_join(
            facts,
            intervals.withColumnRenamed("iv_id", "fact_id"),
            fact_ts="ts",
            start_col="start",
            end_col="end",
            keys=["k"],
        )


from hypothesis import given, settings
from hypothesis import strategies as st

_US = 1_000_000


@settings(max_examples=8, deadline=None)
@given(
    facts=st.lists(
        st.integers(min_value=0, max_value=100_000),  # offset seconds
        min_size=1,
        max_size=20,
    ),
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=100_000),  # start offset
            st.integers(min_value=0, max_value=50_000),  # duration (may be 0)
        ),
        min_size=1,
        max_size=10,
    ),
    bin_seconds=st.sampled_from([1, 7, 3600, 86400]),
)
@pytest.mark.oracle
def test_interval_join_matches_naive_model(spark, facts, ivs, bin_seconds):
    """Property: for arbitrary facts/intervals and any bin width, the
    bin-bucketed join returns exactly the naive containment pairs —
    including empty intervals, bin-edge alignments, and widths far
    from the interval scale."""
    base = 1_700_000_000  # epoch seconds
    fdf = spark.createDataFrame(
        [(i, (base + s) * _US) for i, s in enumerate(facts)],
        "fact_id long, us long",
    ).select("fact_id", F.timestamp_micros(F.col("us")).alias("ts"))
    idf = spark.createDataFrame(
        [(j, (base + s) * _US, (base + s + d) * _US) for j, (s, d) in enumerate(ivs)],
        "iv_id long, sus long, eus long",
    ).select(
        "iv_id",
        F.timestamp_micros(F.col("sus")).alias("start"),
        F.timestamp_micros(F.col("eus")).alias("end"),
    )
    got = sorted(
        (r.fact_id, r.iv_id)
        for r in interval_join(
            fdf,
            idf,
            fact_ts="ts",
            start_col="start",
            end_col="end",
            bin_seconds=bin_seconds,
        ).collect()
    )
    expect = sorted(
        (i, j)
        for i, s in enumerate(facts)
        for j, (ivs_s, d) in enumerate(ivs)
        if ivs_s <= s < ivs_s + d
    )
    assert got == expect


# ---------------------------------------------------------------------------


def test_profile_basic(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "a"), (2, None, "b"), (3, 10.0, None), (4, 9.0, "a")],
        "id long, x double, s string",
    )
    prof = {r.column_name: r for r in profile_columns(df, ["x", "s"]).collect()}
    x = prof["x"]
    assert (x.n_present, x.n_null, x.n_distinct) == (3, 1, 3)
    # min/max computed on the NATIVE type: 9.0 < 10.0 numerically even
    # though "10.0" < "9.0" lexically
    assert (x.min_value, x.max_value) == ("2.500000", "10.000000")
    s = prof["s"]
    assert (s.n_present, s.n_null, s.n_distinct) == (3, 1, 2)
    assert (s.min_value, s.max_value) == ("a", "b")


def test_profile_is_one_job(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, x double")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    profile_columns(df, ["id", "x"], exact=False).collect()
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after - before <= 2  # one agg job (+ a possible AQE stage probe)


def test_profile_plan_shapes(spark):
    import contextlib
    import io

    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, x double")

    def plan(exact):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            profile_columns(df, ["id", "x"], exact=exact).explain("formatted")
        return buf.getvalue()

    # exact path: melt (Generate) + keyed aggs — never the Expand that
    # multi-count(DISTINCT) would plan, whose first-phase hash map drags
    # every min/max buffer through per-value groups
    p = plan(True)
    assert "Expand" not in p and "Generate" in p
    # approx path: single straight-line agg, no Expand (the stack
    # unpivot is a Generate over the ONE agg output row — fine)
    p = plan(False)
    assert "Expand" not in p


def test_profile_exact_matches_approx_invariants_and_ints(spark):
    # integer column exercises the double-proxy -> native re-render
    df = spark.createDataFrame(
        [(10, "a"), (9, "b"), (None, "b"), (2, None)], "i long, s string"
    )
    prof = {r.column_name: r for r in profile_columns(df, ["i", "s"]).collect()}
    i = prof["i"]
    assert (i.n_present, i.n_null, i.n_distinct) == (3, 1, 3)
    assert (i.min_value, i.max_value) == ("2", "10")  # numeric, not lexical


def test_profile_quantiles_exact_and_approx(spark):
    df = spark.createDataFrame(
        [(float(v), "s") for v in range(1, 101)], "x double, s string"
    )
    for exact in (True, False):
        prof = {
            r.column_name: r
            for r in profile_columns(
                df, ["x", "s"], exact=exact, quantiles=[0.5, 0.95]
            ).collect()
        }
        assert abs(prof["x"].q50 - 50.5) <= 1.0  # exact: interpolated 50.5
        assert abs(prof["x"].q95 - 95.0) <= 1.5
        assert prof["s"].q50 is None and prof["s"].q95 is None
    with pytest.raises(ValueError, match="quantiles"):
        profile_columns(df, ["x"], quantiles=[1.5])


def test_profile_validates_columns(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="not in frame"):
        profile_columns(df, ["nope"])
    with pytest.raises(ValueError, match="non-empty"):
        profile_columns(df, [])
    with pytest.raises(ValueError, match="duplicates"):
        profile_columns(df, ["id", "id"])


def test_profile_exact_min_max_beyond_double_precision(spark):
    # 2^53 and 2^53+1 collapse in a double; the long carrier must not
    big = 1 << 53
    df = spark.createDataFrame([(big,), (big + 1,)], "v long")
    row = profile_columns(df, ["v"]).collect()[0]
    assert (row.min_value, row.max_value) == (str(big), str(big + 1))
    assert row.n_distinct == 2


def test_profile_empty_frame_yields_zero_rows_per_column(spark):
    df = spark.createDataFrame([], "id long, x double, s string")
    for exact in (True, False):
        rows = {
            r.column_name: r
            for r in profile_columns(df, ["id", "x", "s"], exact=exact).collect()
        }
        assert set(rows) == {"id", "x", "s"}
        for r in rows.values():
            assert (r.n_present, r.n_null, r.n_distinct) == (0, 0, 0)
            assert r.min_value is None and r.max_value is None


def test_profile_awkward_column_names(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b")], ["order total", "it's"]
    )
    for exact in (True, False):
        rows = {
            r.column_name: r
            for r in profile_columns(
                df, ["order total", "it's"], exact=exact
            ).collect()
        }
        assert rows["order total"].n_present == 2
        assert rows["it's"].n_distinct == 2


def test_profile_signed_zero_counts_once(spark):
    """-0.0 and 0.0 are one DISTINCT value in both engines (Spark
    normalizes signed zero in grouping keys, DuckDB in equality); the
    profiler's injective string key must not split them. NaN stays a
    countable value (both engines count it once)."""
    from py_data_pipeline_app_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(0.0,), (-0.0,), (float("nan"),), (None,), (1.5,)], "x double"
    )
    for exact in (True, False):
        row = profile_columns(df, ["x"], exact=exact).collect()[0]
        assert row.n_present == 4
        assert row.n_null == 1
        assert row.n_distinct == 3  # {0.0, NaN, 1.5}
        assert row.min_value == "0.000000"

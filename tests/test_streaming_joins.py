"""Stream-stream event-time join (streaming/joins.py): batch
semantics, window-bound filtering, and streaming-vs-batch parity."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from py_data_pipeline_app_spark.sources.parquet import load_table
from py_data_pipeline_app_spark.streaming.joins import (
    event_time_join,
    view_click_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    views = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01T10:00:00")),
            (2, 7, _ts("2024-01-01T11:00:00")),
            (3, 8, _ts("2024-01-01T10:00:00")),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    clicks = spark.createDataFrame(
        [
            (11, 7, _ts("2024-01-01T10:10:00")),  # pairs with view 1
            (12, 7, _ts("2024-01-01T11:29:59")),  # pairs with view 2 only
            (13, 7, _ts("2024-01-01T09:59:59")),  # before every view
            (14, 9, _ts("2024-01-01T10:10:00")),  # no matching user
        ],
        "event_id long, user_id long, ts timestamp",
    )
    return views, clicks


def test_batch_semantics(sides):
    views, clicks = sides
    out = event_time_join(
        views,
        clicks,
        on="user_id",
        left_payload=["event_id"],
        right_payload=["event_id"],
        max_delay="30 minutes",
    )
    pairs = sorted((r.l_event_id, r.r_event_id) for r in out.collect())
    # click 11 is 10min after view 1 (in) and an hour before view 2 (out);
    # click 12 is 89:59 after view 1 (out), 29:59 after view 2 (in, edge)
    assert pairs == [(1, 11), (2, 12)]


def test_inclusive_window_edges(spark):
    views = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01T10:00:00"))], "event_id long, user_id long, ts timestamp"
    )
    clicks = spark.createDataFrame(
        [
            (11, 7, _ts("2024-01-01T10:00:00")),  # simultaneous: in
            (12, 7, _ts("2024-01-01T10:30:00")),  # exactly max_delay: in
            (13, 7, _ts("2024-01-01T10:30:00.000001")),  # just past: out
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = event_time_join(
        views, clicks, on="user_id", right_payload=["event_id"], max_delay="30 minutes"
    )
    assert sorted(r.r_event_id for r in out.collect()) == [11, 12]


def test_streaming_matches_batch(spark, tmp_path):
    """The real parity check: the same events fed through a file
    stream (two sides = two filtered readers of one landing dir,
    watermarked, time-range-bounded join) accumulate exactly the rows
    the batch builder produces on the full table."""
    events = load_table(spark, "events", SF_DIR)
    batch = view_click_pairs(events)
    batch_rows = sorted(
        (r.user_id, r.l_event_id, r.r_event_id) for r in batch.collect()
    )
    assert batch_rows, "fixture data must produce at least one pair"

    landing = str(tmp_path / "landing")
    # two files split on event time (second strictly later -> nothing
    # arrives behind the watermark, so no rows are dropped as late)
    cut = _ts("2024-01-16T00:00:00")
    events.filter(F.col("ts") < cut).write.parquet(landing + "/f1")
    events.filter(F.col("ts") >= cut).write.parquet(landing + "/f2")

    stream = spark.readStream.schema(events.schema).parquet(landing + "/*")
    joined = view_click_pairs(stream, watermark="1 hour")
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("path", out)
        .trigger(availableNow=True)
        .queryName("vc_join_parity")
        .start()
    )
    q.awaitTermination(300)

    got = sorted(
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in spark.read.parquet(out).collect()
    )
    assert got == batch_rows


def test_batch_left_outer_keeps_unmatched_views(sides):
    views, clicks = sides
    out = event_time_join(
        views,
        clicks,
        on="user_id",
        left_payload=["event_id"],
        right_payload=["event_id"],
        max_delay="30 minutes",
        how="left_outer",
    )
    rows = {r.l_event_id: r.r_event_id for r in out.collect()}
    # every view survives; 3 (user 8) has no click at all -> null
    assert rows == {1: 11, 2: 12, 3: None}


@pytest.mark.oracle
def test_streaming_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    """Outer semantics on a live stream: an unmatched view can only be
    declared unmatched once the watermark passes its candidate window,
    which takes a LATER batch. Three single-file micro-batches:
    b1 = matched pair + unmatched view, b2 = late events advancing
    both sides' watermarks past the unmatched view's window, b3 = even
    later events giving the evicted state a batch to emit in."""
    schema = "event_id long, user_id long, event_type string, ts timestamp"

    def land(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{tmp_path}/landing/{name}"
        )

    land(
        "f1",
        [
            (1, 7, "view", _ts("2024-01-01T10:00:00")),  # never clicked
            (2, 8, "view", _ts("2024-01-01T10:05:00")),
            (12, 8, "click", _ts("2024-01-01T10:10:00")),  # matches 2
        ],
    )
    land(
        "f2",
        [
            (3, 90, "view", _ts("2024-01-01T12:00:00")),
            (13, 91, "click", _ts("2024-01-01T12:00:00")),
        ],
    )
    land(
        "f3",
        [
            (4, 92, "view", _ts("2024-01-01T13:00:00")),
            (14, 93, "click", _ts("2024-01-01T13:00:00")),
        ],
    )

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        f"{tmp_path}/landing/*"
    )
    views = stream.filter(F.col("event_type") == "view")
    clicks = stream.filter(F.col("event_type") == "click")
    joined = event_time_join(
        views,
        clicks,
        on="user_id",
        left_payload=["event_id"],
        right_payload=["event_id"],
        max_delay="30 minutes",
        watermark="10 minutes",
        how="left_outer",
    )
    q = (
        joined.writeStream.format("parquet")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .option("path", f"{tmp_path}/out")
        .trigger(availableNow=True)
        .queryName("vc_outer")
        .start()
    )
    q.awaitTermination(300)

    got = {r.l_event_id: r.r_event_id for r in spark.read.parquet(f"{tmp_path}/out").collect()}
    assert got[2] == 12  # matched pair emitted eagerly
    assert 1 in got and got[1] is None  # unmatched view null-padded post-watermark


def test_streaming_plan_is_stateful_join(spark, tmp_path):
    events = load_table(spark, "events", SF_DIR)
    landing = str(tmp_path / "landing")
    events.limit(10).write.parquet(landing + "/f1")
    stream = spark.readStream.schema(events.schema).parquet(landing + "/*")
    joined = view_click_pairs(stream, watermark="1 hour")
    # both sides must carry event-time watermarks or Spark refuses the
    # stream-stream join at analysis time; reaching a logical plan with
    # watermark nodes on both inputs is the structural check
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2

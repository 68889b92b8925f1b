"""Custom stateful operator (applyInPandasWithState): the streamed
per-user profile fold converges to the batch aggregation."""

import tempfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from py_data_pipeline_app_spark.streaming.stateful import (
    user_profile_batch,
    user_profile_stream,
)

EVENTS_SCHEMA = "user_id long, ts timestamp, value double"


def _rows(batch):
    return [(u, datetime.fromisoformat(t), v) for u, t, v in batch]


BATCH1 = _rows(
    [
        (1, "2024-01-01T10:00:00", 5.0),
        (1, "2024-01-01T10:05:00", 2.5),
        (2, "2024-01-01T10:01:00", 1.0),
    ]
)
BATCH2 = _rows(
    [
        (1, "2024-01-01T11:00:00", 10.0),
        (3, "2024-01-01T11:30:00", None),  # null value -> counted, adds 0
    ]
)


def test_stateful_stream_converges_to_batch(spark, tmp_path):
    landing = tmp_path / "landing"
    ckpt = str(tmp_path / "ckpt")
    for i, batch in enumerate((BATCH1, BATCH2)):
        spark.createDataFrame(batch, EVENTS_SCHEMA).coalesce(1).write.parquet(
            str(landing / f"b{i}")
        )
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing / "*"))
    )
    # idle_eviction=False: a ProcessingTimeTimeout registration keeps an
    # availableNow query alive (no-data batches until the timeout could
    # fire — measured as a 120 s awaitTermination burn), and drain-and-
    # exit is exactly the backfill mode the flag exists for
    q = (
        user_profile_stream(stream, idle_eviction=False)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("profiles")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow drain did not terminate"

    updates = spark.sql("SELECT * FROM profiles").collect()
    # final state per user = the update with the highest event count
    final = {}
    for r in updates:
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r

    expected = {
        r.user_id: r
        for r in user_profile_batch(
            spark.createDataFrame(BATCH1 + BATCH2, EVENTS_SCHEMA)
        ).collect()
    }
    assert set(final) == set(expected) == {1, 2, 3}
    for uid, exp in expected.items():
        got = final[uid]
        assert got.n_events == exp.n_events, uid
        assert abs(got.total_value - exp.total_value) < 0.01, uid
        assert got.first_ts == exp.first_ts and got.last_ts == exp.last_ts, uid
    # state crossed micro-batches: user 1 saw both files
    assert final[1].n_events == 3
    # and emitted one update row per micro-batch it appeared in
    assert len([r for r in updates if r.user_id == 1]) == 2


def test_eviction_variant_emits_then_needs_explicit_stop(spark, tmp_path):
    """The DEFAULT (idle_eviction=True) fold registers a processing-time
    timeout, which keeps even an availableNow query alive so pending
    timeouts can fire — the documented operational contract is: drain
    the sink, then stop explicitly. This pins both halves: rows arrive,
    and the query is still active when they have."""
    import time

    landing = tmp_path / "landing"
    spark.createDataFrame(BATCH1, EVENTS_SCHEMA).coalesce(1).write.parquet(
        str(landing / "b0")
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(landing / "*"))
    q = (
        user_profile_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("profiles_evict")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM profiles_evict").first().c >= 2:
                break
            time.sleep(0.5)
        rows = {r.user_id: r for r in spark.sql("SELECT * FROM profiles_evict").collect()}
        assert set(rows) == {1, 2}
        assert rows[1].n_events == 2 and rows[2].n_events == 1
        assert q.isActive, "timeout registration should hold the query active"
    finally:
        q.stop()

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
    q = (
        user_profile_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("profiles")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

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

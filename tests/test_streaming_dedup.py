"""Streaming exact dedup: in-batch + cross-batch drops within the
watermark, re-emission after state expiry."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import types as T

from py_data_pipeline_app_spark.streaming.dedup import (
    read_dedup_output,
    start_dedup_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _ts(h: int, m: int = 0) -> datetime:
    return datetime(2024, 1, 1, h, m)


def test_streaming_dedup_within_and_beyond_watermark(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def land(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{landing}/{name}"
        )

    def run(qn):
        q = start_dedup_stream(
            spark, landing + "/*", ckpt, SCHEMA, out,
            watermark="1 hour", query_name=qn,
        )
        q.awaitTermination(180)
        return read_dedup_output(spark, out)

    # batch 1: A, B, and an in-batch duplicate of A
    land(
        "b1",
        [
            (1, "Alpha doc!", _ts(10, 0)),
            (2, "Beta doc.", _ts(10, 5)),
            (3, "alpha DOC", _ts(10, 1)),  # same normalized content as 1
        ],
    )
    out1 = run("dedup_s1")
    ids1 = {r.doc_id for r in out1.collect()}
    assert len(ids1) == 2
    assert 2 in ids1 and (1 in ids1) != (3 in ids1)  # exactly one alpha copy

    # batch 2: a duplicate of B inside the watermark (dropped) and a
    # filler that advances the watermark past every batch-1 state
    land(
        "b2",
        [
            (4, "beta doc", _ts(10, 10)),  # dup of 2, state live -> drop
            (5, "fresh content", _ts(13, 0)),  # advances watermark to 12:00
        ],
    )
    ids2 = {r.doc_id for r in run("dedup_s2").collect()}
    assert 4 not in ids2
    assert 5 in ids2

    # batch 3: alpha reappears AFTER its state expired -> re-emitted
    land("b3", [(6, "alpha doc", _ts(13, 5))])
    ids3 = {r.doc_id for r in run("dedup_s3").collect()}
    assert 6 in ids3

    # sink layout is replay-idempotent: one overwrite-mode subdir per
    # micro-batch, so a crashed batch's retry replaces its partial
    # output instead of appending duplicates
    subdirs = [p.name for p in (tmp_path / "out").iterdir() if p.is_dir()]
    assert subdirs and all(s.startswith("batch-") for s in subdirs)

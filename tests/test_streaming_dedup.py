"""Streaming exact dedup: in-batch + cross-batch drops within the
watermark, re-emission after state expiry."""

from __future__ import annotations

import pytest

from datetime import datetime

from pyspark.sql import types as T

from py_data_pipeline_app_spark.functions.frames import local_rows_df
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

# streaming lifecycle parity suites are multi-second end-to-end runs —
# slow tier by module (round-11 split; see pytest.ini)
pytestmark = pytest.mark.oracle


def _ts(h: int, m: int = 0) -> datetime:
    return datetime(2024, 1, 1, h, m)


def test_streaming_dedup_within_and_beyond_watermark(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def land(name, rows):
        local_rows_df(spark, SCHEMA, rows).write.parquet(
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


def test_streaming_near_dup_matches_batch_lsh(spark, tmp_path):
    """The near-dup stream folds each micro-batch into the persisted
    LSH index; the union of all emitted pairs must equal one batch
    minhash run over everything streamed (the incremental parity
    contract, exercised through the streaming front door)."""
    from py_data_pipeline_app_spark.operators.dedup import minhash_dedup_pairs
    from py_data_pipeline_app_spark.streaming.dedup import start_near_dup_stream

    landing = str(tmp_path / "landing")
    base = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
    ]
    b1, b2 = [], []
    for i, t in enumerate(base):
        b1.append((i * 10, t, _ts(10, i)))
        # batch 2 lands a word-set duplicate (identical signature ->
        # collides in every band, guaranteed cross-batch pair) and a
        # near-variant of each batch-1 doc
        b2.append((i * 10 + 1, t, _ts(11, i)))
        b2.append((i * 10 + 2, t + " with extra trailing words", _ts(11, 30 + i)))

    def land(name, rows):
        local_rows_df(spark, SCHEMA, rows).write.parquet(
            f"{landing}/{name}"
        )

    def run(qn):
        q = start_near_dup_stream(
            spark,
            landing + "/*",
            str(tmp_path / "ckpt"),
            SCHEMA,
            str(tmp_path / "index"),
            str(tmp_path / "pairs"),
            threshold=0.5,
            query_name=qn,
        )
        q.awaitTermination(180)

    land("b1", b1)
    run("neardup_s1")
    land("b2", b2)
    run("neardup_s2")

    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "pairs"))
        .collect()
    )
    all_docs = local_rows_df(spark, SCHEMA, b1 + b2).select("doc_id", "text")
    expected = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_dedup_pairs(all_docs, threshold=0.5).collect()
    )
    assert got == expected
    # cross-batch pairs actually surfaced (not just within-batch)
    b1_ids = {r[0] for r in b1}
    assert any((a in b1_ids) != (b in b1_ids) for a, b, _ in got)


def test_streaming_near_dup_auto_compaction_bounds_index(spark, tmp_path):
    """With compact_every=2 the index's batch subdirectory count stays
    bounded across many micro-batches (newest always kept for replay
    safety), and pair parity with one batch LSH run survives the
    compactions."""
    import os

    from py_data_pipeline_app_spark.operators.dedup import minhash_dedup_pairs
    from py_data_pipeline_app_spark.streaming.dedup import start_near_dup_stream

    landing = str(tmp_path / "landing")
    pool = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
    ]
    batches = []
    for k in range(5):
        batches.append(
            [
                (k * 10, pool[k % 3], _ts(9 + k, 0)),
                (k * 10 + 1, pool[(k + 1) % 3] + " trailing tail", _ts(9 + k, 30)),
            ]
        )

    def land(name, rows):
        local_rows_df(spark, SCHEMA, rows).write.parquet(
            f"{landing}/{name}"
        )

    for k, rows in enumerate(batches):
        land(f"b{k}", rows)
        q = start_near_dup_stream(
            spark,
            landing + "/*",
            str(tmp_path / "ckpt"),
            SCHEMA,
            str(tmp_path / "index"),
            str(tmp_path / "pairs"),
            threshold=0.5,
            compact_every=2,
            query_name=f"autocompact_s{k}",
        )
        q.awaitTermination(180)

    # 5 micro-batches, compactions after batches 2 and 4: at most the
    # newest batch + the consolidated batch remain per table (plus one
    # uncompacted batch between compaction points)
    for sub in ("bands", "toksets"):
        names = [
            d
            for d in os.listdir(os.path.join(str(tmp_path / "index"), sub))
            if d.startswith("batch-")
        ]
        assert 1 <= len(names) <= 3, names

    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "pairs"))
        .collect()
    )
    all_docs = local_rows_df(
        spark, SCHEMA, [r for b in batches for r in b]
    ).select("doc_id", "text")
    expected = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_dedup_pairs(all_docs, threshold=0.5).collect()
    )
    assert got == expected

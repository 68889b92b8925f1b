"""Multimodal operators (operators/media.py): deterministic media
derivation, metadata filters, payload profiling, mapInPandas feature
extraction, and feature-space similarity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from py_data_pipeline_app_spark.operators import media as M
from py_data_pipeline_app_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return M.media_from_documents(load_table(spark, "documents", sf_dir)).cache()


def test_derivation_schema_and_modal_nullability(media):
    rows = media.collect()
    assert rows, "empty media table"
    for r in rows:
        assert r.kind in ("image", "audio", "video")
        assert r.mime == {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[r.kind]
        assert isinstance(r.payload, (bytes, bytearray)) and len(r.payload) > 0
        if r.kind == "image":
            assert r.meta.width is not None and r.meta.duration_ms is None
        if r.kind == "audio":
            assert r.meta.width is None and r.meta.sample_rate is not None
        if r.kind == "video":
            assert r.meta.width is not None and r.meta.duration_ms is not None
            assert r.meta.sample_rate is None


def test_filter_media_predicates(media):
    out = M.filter_media(
        media, kinds=("image", "video"), min_width=400
    ).collect()
    assert all(r.kind != "audio" and r.meta.width >= 400 for r in out)
    # complement + filtered partitions the visual assets
    visual = media.filter(F.col("kind") != "audio").count()
    below = M.filter_media(media, kinds=("image", "video")).filter(
        F.col("meta.width") < 400
    ).count()
    assert len(out) + below == visual


def test_payload_profile_counts_duplicates(spark):
    rows = [
        (1, "image", b"aaa", "image/png", (8, 8, None, None)),
        (2, "image", b"aaa", "image/png", (8, 8, None, None)),
        (3, "image", b"bbb", "image/png", (8, 8, None, None)),
        (4, "audio", b"ccc", "audio/wav", (None, None, 100, 16000)),
    ]
    from py_data_pipeline_app_spark import schemas

    df = spark.createDataFrame(rows, schemas.MEDIA)
    prof = {(r.kind, r.mime): r for r in M.payload_profile(df).collect()}
    img = prof[("image", "image/png")]
    assert img.n_assets == 3
    assert img.total_bytes == 9
    assert img.n_distinct_payloads == 2
    assert img.n_dup_payloads == 1
    assert prof[("audio", "audio/wav")].n_dup_payloads == 0


def test_byte_histogram_matches_numpy(media):
    feats = {r.media_id: r for r in M.extract_features(media, dim=16).collect()}
    sample = media.filter(F.col("media_id") < 20).collect()
    assert sample
    for r in sample:
        b = np.frombuffer(bytes(r.payload), dtype=np.uint8)
        expected = (np.bincount(b // 16, minlength=16)[:16] / len(b)).astype(np.float32)
        got = np.array(feats[r.media_id].feature, dtype=np.float32)
        assert np.array_equal(got, expected), r.media_id
        # histogram is a distribution
        assert abs(float(got.sum()) - 1.0) < 1e-3


def test_n_frames_per_modality(media):
    feats = M.extract_features(media, dim=16)
    joined = feats.join(media.select("media_id", F.col("meta.duration_ms").alias("d")), "media_id")
    for r in joined.collect():
        if r.kind == "image":
            assert r.n_frames == 1
        else:
            assert r.n_frames == max(1, r.d // 40)


def test_stub_decoders_raise(media):
    with pytest.raises(Exception) as ei:
        M.extract_features(media, decoder="image_rgb").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
    with pytest.raises(ValueError):
        M.extract_features(media, decoder="nope")


def test_feature_topk_self_rank_one(media):
    feats = M.extract_features(media, dim=16).cache()
    queries = feats.filter(F.col("media_id") < 4).select(
        F.col("media_id").alias("query_id"), "feature"
    )
    out = M.media_feature_topk(feats, queries, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        # each asset is its own nearest neighbor at cosine 1.0
        assert rows[0].media_id == qid and rows[0].score == 1.0

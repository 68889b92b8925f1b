"""Streaming embedding ingest: per-batch IVF appends must probe
identically to one full rebuild (arrival-order independence), across a
compaction boundary, with bounded append-directory count."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from py_data_pipeline_app_spark.operators.similarity import (
    build_ivf_index,
    ivf_topk_indexed,
)
from py_data_pipeline_app_spark.streaming.embeddings import (
    start_embedding_ingest_stream,
)

# streaming lifecycle parity suites are multi-second end-to-end runs —
# slow tier by module (round-11 split; see pytest.ini)
pytestmark = pytest.mark.oracle

SF_DIR = "/root/testdata/sf0.001"

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df.cache().count()
    return df


def _probe(spark, index, queries):
    return sorted(
        map(tuple, ivf_topk_indexed(spark, index, queries, k=5, nprobe=4).collect())
    )


def test_streamed_appends_probe_like_full_rebuild(spark, emb, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    index = str(tmp_path / "index")
    # initial corpus = vec_id % 4 == 0; three streamed batches cover the rest
    initial = emb.filter(F.col("vec_id") % 4 == 0)
    build_ivf_index(initial, index, n_centroids=16)
    for part in (1, 2, 3):
        emb.filter(F.col("vec_id") % 4 == part).coalesce(1).write.parquet(
            f"{landing}/b{part}"
        )
        q = start_embedding_ingest_stream(
            spark, landing + "/*", ckpt, SCHEMA, index, compact_every=2
        )
        q.awaitTermination(120)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = _probe(spark, index, queries)

    # reference: one rebuild over everything with the SAME centroids
    # (drawn from the initial corpus, like the streamed index's)
    ref_index = str(tmp_path / "ref_index")
    cents = spark.read.parquet(f"{index}/centroids")
    build_ivf_index(emb, ref_index, cents=cents)
    want = _probe(spark, ref_index, queries)
    assert got == want

    # compaction kept the append listing bounded: batch ids 0..2 ran,
    # compact at id 2 merged all but the newest
    import os

    appends = os.path.join(index, "appends")
    n_appends = (
        len([d for d in os.listdir(appends) if d.startswith("batch-")])
        if os.path.isdir(appends)
        else 0
    )
    assert n_appends <= 1, n_appends


def test_replayed_batch_token_overwrites(spark, emb, tmp_path):
    """A micro-batch retried with the same id must overwrite its own
    append, not duplicate rows (simulated by calling the append twice
    with one token, exactly what foreachBatch replay does)."""
    from py_data_pipeline_app_spark.operators.similarity import ivf_index_append

    index = str(tmp_path / "index")
    initial = emb.filter(F.col("vec_id") % 2 == 0)
    build_ivf_index(initial, index, n_centroids=8)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    ivf_index_append(spark, index, batch, batch_token="00000007")
    ivf_index_append(spark, index, batch, batch_token="00000007")  # replay
    total = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{index}/appends")
        .count()
    )
    assert total == batch.count()


def test_streamed_ivfpq_appends_probe_like_full_rebuild(spark, emb, tmp_path):
    """index_kind='ivfpq': streamed batches of PQ codes must probe
    identically to one compressed rebuild with the same tables."""
    import pyspark.sql.functions as F2

    from py_data_pipeline_app_spark.operators.quantization import (
        build_ivfpq_index,
        ivfpq_topk,
    )

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    index = str(tmp_path / "index")
    initial = emb.filter(F2.col("vec_id") % 3 == 0)
    build_ivfpq_index(initial, index, n_centroids=16, m=8, ksub=16, dim=64)
    for part in (1, 2):
        emb.filter(F2.col("vec_id") % 3 == part).coalesce(1).write.parquet(
            f"{landing}/b{part}"
        )
        q = start_embedding_ingest_stream(
            spark, landing + "/*", ckpt, SCHEMA, index, index_kind="ivfpq"
        )
        q.awaitTermination(120)
    queries = emb.filter(F2.col("vec_id") < 10).select(
        F2.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        map(tuple, ivfpq_topk(spark, index, queries, k=5, nprobe=4).collect())
    )
    ref = str(tmp_path / "ref")
    cents = spark.read.parquet(f"{index}/centroids")
    cbs = spark.read.parquet(f"{index}/codebooks")
    build_ivfpq_index(emb, ref, cents=cents, codebooks=cbs)
    want = sorted(
        map(tuple, ivfpq_topk(spark, ref, queries, k=5, nprobe=4).collect())
    )
    assert got == want


def test_streamed_semantic_appends_match_full_rebuild(spark, emb, tmp_path):
    """index_kind='semantic': streamed id-range batches folded into the
    persisted SemDeDup index must produce exactly the kept/dropped
    verdicts of one full semantic_dedup rebuild over everything with
    the initial corpus's centroids. (Range batches, not modulo — the
    semantic append enforces per-cluster id monotonicity.)"""
    from py_data_pipeline_app_spark.operators.similarity import (
        _md5_sample_centroids,
        build_semantic_index,
        semantic_dedup,
        semantic_index_state,
    )

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    index = str(tmp_path / "index")
    n = emb.count()
    initial = emb.filter(F.col("vec_id") < n // 2)
    build_semantic_index(initial, index, threshold=0.8, n_centroids=8)
    for i, (lo, hi) in enumerate([(n // 2, 3 * n // 4), (3 * n // 4, n)]):
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.parquet(f"{landing}/b{i}")
        q = start_embedding_ingest_stream(
            spark,
            landing + "/*",
            ckpt,
            SCHEMA,
            index,
            index_kind="semantic",
            compact_every=1,
        )
        q.awaitTermination(120)
    got = sorted(
        map(tuple, semantic_index_state(spark, index).collect())
    )
    # expected rebuild runs over the SAME raw float frame the stream
    # ingested — a double-cast detour here would compute threshold
    # cosines in different arithmetic than the index did, which can
    # flip verdicts for vectors near the 0.8 boundary (latent flake)
    cents_raw = _md5_sample_centroids(
        initial, n_centroids=8, id_col="vec_id", vec_col="embedding"
    )
    want = sorted(
        map(
            tuple,
            semantic_dedup(
                emb, threshold=0.8, n_centroids=8, cents=cents_raw
            ).collect(),
        )
    )
    assert got == want


def test_streamed_semantic_reorder_appends_match_full_rebuild(
    spark, emb, tmp_path
):

    """index_kind='semantic' with allow_reorder=True: a multi-producer
    feed delivering id ranges OUT OF ORDER (high range first) must
    still converge to one full rebuild's verdicts — the out-of-order
    batch takes the recompute-mode append instead of refusing."""
    from py_data_pipeline_app_spark.operators.similarity import (
        _md5_sample_centroids,
        build_semantic_index,
        semantic_dedup,
        semantic_index_state,
    )

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    index = str(tmp_path / "index")
    n = emb.count()
    initial = emb.filter(F.col("vec_id") % 3 == 2)
    build_semantic_index(initial, index, threshold=0.8, n_centroids=8)
    # high remainder class first, then the LOW one — interleaved below
    # every cluster's history max
    for i, part in enumerate([1, 0]):
        emb.filter(F.col("vec_id") % 3 == part).coalesce(1).write.parquet(
            f"{landing}/b{i}"
        )
        q = start_embedding_ingest_stream(
            spark,
            landing + "/*",
            ckpt,
            SCHEMA,
            index,
            index_kind="semantic",
            allow_reorder=True,
        )
        q.awaitTermination(120)
    got = sorted(map(tuple, semantic_index_state(spark, index).collect()))
    cents = _md5_sample_centroids(
        initial, n_centroids=8, id_col="vec_id", vec_col="embedding"
    )
    want = sorted(
        map(
            tuple,
            semantic_dedup(
                emb, threshold=0.8, n_centroids=8, cents=cents
            ).collect(),
        )
    )
    assert got == want


def test_reorder_flag_rejected_for_order_independent_kinds(spark, tmp_path):
    with pytest.raises(ValueError, match="allow_reorder"):
        start_embedding_ingest_stream(
            spark,
            str(tmp_path / "l") + "/*",
            str(tmp_path / "c"),
            SCHEMA,
            str(tmp_path / "i"),
            index_kind="ivf",
            allow_reorder=True,
        )


def test_streamed_trained_opq_ivfpq_matches_full_rebuild(
    spark, emb, tmp_path
):
    """Round-12 verdict task 8 (stretch): the one-call streaming story
    in the TRAINED-OPQ configuration — an index built by
    ``build_ivfpq_index_trained(opq_iters>0)`` (the measured
    0.92-re-ranked-recall setup) takes streamed micro-batch appends
    across a compaction boundary and probes — both ADC and re-ranked —
    identically to one rebuild over everything with the same trained
    tables. The appends must encode through the PERSISTED
    checksum-verified rotation; a batch encoded in the unrotated space
    would silently score garbage."""
    import os

    import pyspark.sql.functions as F2

    from py_data_pipeline_app_spark.operators.quantization import (
        build_ivfpq_index,
        build_ivfpq_index_trained,
        ivfpq_topk,
        ivfpq_topk_rerank,
    )

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    index = str(tmp_path / "index")
    initial = emb.filter(F2.col("vec_id") % 3 == 0)
    build_ivfpq_index_trained(
        initial, index, n_centroids=16, m=8, ksub=16, dim=64, opq_iters=2
    )
    cfg = spark.read.parquet(f"{index}/config").first()
    assert cfg.rotation_checksum  # the trained path actually rotated

    for part in (1, 2):
        emb.filter(F2.col("vec_id") % 3 == part).coalesce(1).write.parquet(
            f"{landing}/b{part}"
        )
        q = start_embedding_ingest_stream(
            spark, landing + "/*", ckpt, SCHEMA, index,
            index_kind="ivfpq", compact_every=1,
        )
        q.awaitTermination(120)
    appends = os.path.join(index, "appends")
    n_appends = (
        len([d for d in os.listdir(appends) if d.startswith("batch-")])
        if os.path.isdir(appends)
        else 0
    )
    assert n_appends <= 1, n_appends  # batch 1 crossed a compaction

    queries = emb.filter(F2.col("vec_id") < 10).select(
        F2.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        map(tuple, ivfpq_topk(spark, index, queries, k=5, nprobe=4).collect())
    )
    got_rr = sorted(
        map(
            tuple,
            ivfpq_topk_rerank(
                spark, index, emb, queries, k=5, nprobe=4
            ).collect(),
        )
    )

    # reference: one rebuild over everything with the SAME trained
    # tables — centroids, codebooks AND the persisted OPQ rotation
    ref = str(tmp_path / "ref")
    cents = spark.read.parquet(f"{index}/centroids")
    cbs = spark.read.parquet(f"{index}/codebooks")
    rot = [
        [float(x) for x in r.coeffs]
        for r in sorted(
            spark.read.parquet(f"{index}/rotation").collect(),
            key=lambda r: r.row_id,
        )
    ]
    build_ivfpq_index(
        emb, ref, n_centroids=16, m=8, ksub=16, dim=64,
        cents=cents, codebooks=cbs, rotation=rot,
    )
    want = sorted(
        map(tuple, ivfpq_topk(spark, ref, queries, k=5, nprobe=4).collect())
    )
    want_rr = sorted(
        map(
            tuple,
            ivfpq_topk_rerank(
                spark, ref, emb, queries, k=5, nprobe=4
            ).collect(),
        )
    )
    assert got == want
    assert got_rr == want_rr


def test_streamed_semantic_two_level_matches_full_rebuild(spark, emb, tmp_path):
    """index_kind='semantic' over a TWO_LEVEL-built index (round 13):
    the streaming append needs no flag — it reads the assign_mode
    pinned in the config manifest and replays the scaled-k coarse→fine
    fold, so streamed batches still reproduce one
    semantic_dedup(two_level=True) rebuild exactly."""
    from py_data_pipeline_app_spark.operators.similarity import (
        _md5_sample_centroids,
        build_semantic_index,
        semantic_dedup,
        semantic_index_state,
    )

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    index = str(tmp_path / "index")
    n = emb.count()
    initial = emb.filter(F.col("vec_id") < n // 2)
    build_semantic_index(
        initial, index, threshold=0.8, n_centroids=8, two_level=True
    )
    for i, (lo, hi) in enumerate([(n // 2, 3 * n // 4), (3 * n // 4, n)]):
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.parquet(f"{landing}/b{i}")
        q = start_embedding_ingest_stream(
            spark,
            landing + "/*",
            ckpt,
            SCHEMA,
            index,
            index_kind="semantic",
            compact_every=1,
        )
        q.awaitTermination(120)
    got = sorted(map(tuple, semantic_index_state(spark, index).collect()))
    cents_raw = _md5_sample_centroids(
        initial, n_centroids=8, id_col="vec_id", vec_col="embedding"
    )
    want = sorted(
        map(
            tuple,
            semantic_dedup(
                emb, threshold=0.8, n_centroids=8, cents=cents_raw,
                two_level=True,
            ).collect(),
        )
    )
    assert got == want

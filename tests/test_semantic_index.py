"""Incremental SemDeDup index lifecycle: append-vs-rebuild parity,
the per-cluster monotone-id guard, tombstone (forget) semantics,
idempotent replays, empty batches, centroid drift, and compaction
parity. The registered query's oracle re-checks the build+append
parity cross-engine; these tests cover the mutation surfaces the
single gate row can't reach."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from py_data_pipeline_app_spark.operators.similarity import (
    _md5_sample_centroids,
    build_semantic_index,
    ivf_index_delete,
    semantic_dedup,
    semantic_index_append,
    semantic_index_compact,
    semantic_index_state,
)

THRESH = 0.8
K = 8


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    return df.localCheckpoint()


def _fresh(tmp_path, name):
    p = str(tmp_path / name)
    shutil.rmtree(p, ignore_errors=True)
    return p


def _state_rows(spark, idx):
    return sorted(tuple(r) for r in semantic_index_state(spark, idx).collect())


def _rebuild_rows(emb, base):
    """semantic_dedup over the full corpus with the BASE batch's
    centroids — the semantics the incremental index must reproduce."""
    cents = _md5_sample_centroids(
        base, n_centroids=K, id_col="vec_id", vec_col="embedding"
    )
    return sorted(
        tuple(r)
        for r in semantic_dedup(
            emb, threshold=THRESH, n_centroids=K, cents=cents
        ).collect()
    )


def test_two_appends_match_rebuild(spark, emb, tmp_path):
    n = emb.count()
    a, b = n // 3, 2 * n // 3
    base = emb.filter(F.col("vec_id") < a)
    idx = _fresh(tmp_path, "sem_two")
    build_semantic_index(base, idx, threshold=THRESH, n_centroids=K)
    semantic_index_append(
        spark, idx, emb.filter((F.col("vec_id") >= a) & (F.col("vec_id") < b))
    )
    semantic_index_append(spark, idx, emb.filter(F.col("vec_id") >= b))
    assert _state_rows(spark, idx) == _rebuild_rows(emb, base)


def test_append_is_idempotent_by_token(spark, emb, tmp_path):
    n = emb.count()
    base = emb.filter(F.col("vec_id") < n // 2)
    batch = emb.filter(F.col("vec_id") >= n // 2)
    idx = _fresh(tmp_path, "sem_idem")
    build_semantic_index(base, idx, threshold=THRESH, n_centroids=K)
    semantic_index_append(spark, idx, batch, batch_token="b1")
    once = _state_rows(spark, idx)
    # a foreachBatch-style replay re-runs the same token: same rows
    semantic_index_append(spark, idx, batch, batch_token="b1")
    assert _state_rows(spark, idx) == once == _rebuild_rows(emb, base)


def test_out_of_order_id_refused_before_writing(spark, emb, tmp_path):
    n = emb.count()
    idx = _fresh(tmp_path, "sem_mono")
    build_semantic_index(
        emb.filter(F.col("vec_id") >= n // 2), idx, threshold=THRESH, n_centroids=K
    )
    before = _state_rows(spark, idx)
    with pytest.raises(ValueError, match="not above cluster"):
        semantic_index_append(spark, idx, emb.filter(F.col("vec_id") < n // 2))
    # the refused append must not have landed anything
    assert _state_rows(spark, idx) == before


def test_tombstone_forgets_history(spark, tmp_path):
    """Deleting an id removes it from the state immediately AND stops
    it dropping future arrivals (forget semantics): append a clone of
    a deleted vector — it must come back kept, while a clone of a
    still-present vector must drop. Synthetic orthogonal basis
    vectors make every verdict deterministic: cos is 1.0 between
    clones and 0.0 between distinct rows."""
    from py_data_pipeline_app_spark.functions.frames import local_rows_df

    def basis(i):
        return [1.0 if j == i else 0.0 for j in range(8)]

    corpus = local_rows_df(
        spark,
        "vec_id long, embedding array<double>",
        [(i, basis(i)) for i in range(6)],
    )
    idx = _fresh(tmp_path, "sem_del")
    build_semantic_index(corpus, idx, threshold=THRESH, n_centroids=2)
    state = {r.vec_id: r.kept for r in semantic_index_state(spark, idx).collect()}
    assert all(state.values()), "orthogonal vectors must all be kept"
    ivf_index_delete(
        spark,
        idx,
        local_rows_df(spark, "vec_id long", [(0,)]),
        batch_token="rm0",
    )
    state = {r.vec_id: r.kept for r in semantic_index_state(spark, idx).collect()}
    assert 0 not in state
    clones = local_rows_df(
        spark,
        "vec_id long, embedding array<double>",
        [(100, basis(0)), (101, basis(1))],
    )
    semantic_index_append(spark, idx, clones, batch_token="clones")
    state = {r.vec_id: r.kept for r in semantic_index_state(spark, idx).collect()}
    assert state[100], "clone of the forgotten vector must be kept"
    assert not state[101], "clone of a live vector must drop"


def test_compaction_preserves_state_and_consumes_appends(spark, emb, tmp_path):
    import os

    n = emb.count()
    base = emb.filter(F.col("vec_id") < n // 2)
    idx = _fresh(tmp_path, "sem_compact")
    build_semantic_index(base, idx, threshold=THRESH, n_centroids=K)
    semantic_index_append(spark, idx, emb.filter(F.col("vec_id") >= n // 2))
    ivf_index_delete(
        spark, idx, emb.filter(F.col("vec_id") % 13 == 5).select("vec_id")
    )
    before = _state_rows(spark, idx)
    merged = semantic_index_compact(spark, idx)
    assert merged >= 1
    assert _state_rows(spark, idx) == before
    assert not os.path.exists(f"{idx}/appends")
    assert not os.path.exists(f"{idx}/deletes")  # full compaction consumes


def test_empty_append_does_not_poison(spark, emb, tmp_path):
    n = emb.count()
    base = emb.filter(F.col("vec_id") < n)
    idx = _fresh(tmp_path, "sem_empty")
    build_semantic_index(base, idx, threshold=THRESH, n_centroids=K)
    before = _state_rows(spark, idx)
    semantic_index_append(
        spark, idx, emb.filter(F.col("vec_id") < 0), batch_token="empty"
    )
    assert _state_rows(spark, idx) == before


def test_centroid_drift_fails_loudly(spark, emb, tmp_path):
    n = emb.count()
    idx = _fresh(tmp_path, "sem_drift")
    build_semantic_index(
        emb.filter(F.col("vec_id") < n // 2), idx, threshold=THRESH, n_centroids=K
    )
    # corrupt the persisted centroids (simulate a partial overwrite)
    cents = spark.read.parquet(f"{idx}/centroids")
    cents.withColumn(
        "cvec", F.transform("cvec", lambda x: x + F.lit(1.0))
    ).write.mode("overwrite").parquet(f"{idx}/centroids2")
    shutil.rmtree(f"{idx}/centroids")
    shutil.move(f"{idx}/centroids2", f"{idx}/centroids")
    with pytest.raises(ValueError, match="checksum"):
        semantic_index_append(spark, idx, emb.filter(F.col("vec_id") >= n // 2))


def test_rebuild_over_mutated_index_refused(spark, emb, tmp_path):
    n = emb.count()
    base = emb.filter(F.col("vec_id") < n // 2)
    idx = _fresh(tmp_path, "sem_rebuild")
    build_semantic_index(base, idx, threshold=THRESH, n_centroids=K)
    semantic_index_append(spark, idx, emb.filter(F.col("vec_id") >= n // 2))
    with pytest.raises(ValueError, match="appended batches"):
        build_semantic_index(emb, idx, threshold=THRESH, n_centroids=K)

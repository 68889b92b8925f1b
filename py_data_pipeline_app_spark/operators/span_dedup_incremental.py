"""Incremental corpus-level span deduplication: the crawl-cadence twin
of :func:`~py_data_pipeline_app_spark.operators.curation.
chunk_dedup_rebuild` (extension — no reference evidence).

The batch operator re-fingerprints the whole corpus per run; a crawl
pipeline instead folds each new snapshot against a persisted
chunk-fingerprint index: a span survives iff its fingerprint has never
been seen — in ANY previous batch or earlier in this one — and the
batch's NEW fingerprints append to the index. Per-fold cost is
∝ |batch| chunks plus one broadcast-or-keyed join against the
fingerprint set; history is never re-chunked.

Parity contract (tested + oracle-checked): folding batches in id order
(every doc id in batch k sorts before every id in batch k+1) emits
exactly the per-document rebuilds of one batch ``chunk_dedup_rebuild``
over the concatenated corpus — first-occurrence order is (batch, doc,
pos) both ways.

Index layout (shared helper pattern with the incremental LSH index):
``fps/batch-{token}`` subdirectories of distinct fingerprints, written
in overwrite mode (a retried fold replaces its own partial append, and
its history read excludes its own token — exactly-once under
foreachBatch replay); a one-row config manifest pins ``chunk_tokens``
(fingerprints of different span sizes NEVER match, so a drifted fold
would silently dedup nothing — it fails loudly instead); mutators are
serialized by the same atomic lock marker.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from py_data_pipeline_app_spark.functions.frames import local_rows_df
from py_data_pipeline_app_spark.functions.text import tokens
from py_data_pipeline_app_spark.operators.dedup_incremental import (
    _acquire_index_lock,
    _append_batch,
    _pinned_history,
)

FPS_SUBDIR = "fps"
CONFIG_SUBDIR = "config"


def _check_or_write_config(
    spark: SparkSession, index_path: str, chunk_tokens: int
) -> None:
    path = f"{index_path}/{CONFIG_SUBDIR}"
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jvm_path):
        have = spark.read.parquet(path).first().chunk_tokens
        if have != chunk_tokens:
            raise ValueError(
                f"span index at {index_path} was built with chunk_tokens="
                f"{have}, fold requested {chunk_tokens}; fingerprints of "
                "different span sizes never match, so this fold would "
                "silently dedup nothing - rebuild the index or match its "
                "configuration"
            )
        return
    local_rows_df(
        spark, "chunk_tokens int", [(chunk_tokens,)]
    ).write.mode("overwrite").parquet(path)


def incremental_span_fold(
    spark: SparkSession,
    index_path: str,
    batch: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 10,
    batch_token: str | None = None,
) -> DataFrame:
    """Fold a document batch against the persisted span index and
    return the batch's rebuilt documents (id, text_deduped, n_chunks,
    n_kept) — semantics identical to the batch operator run over
    history∪batch, paid at batch cost.

    Scale shape: chunking/fingerprinting is a per-row projection; the
    history check is one left join keyed by the 16-byte fingerprint
    (Spark broadcasts it while the distinct-fp set is small and
    shuffles both sides by fp once it is not — either way cost is
    ∝ batch + matching index rows, never ∝ corpus text); the
    within-batch first-occurrence window and the rebuild groupBy are
    the batch operator's own two keyed exchanges. The index append is
    the batch's distinct NEW fingerprints only, so the index grows by
    novel content, not by corpus size.

    NOTE the returned frame is LAZY but the index append is EAGER —
    fold order is the dedup precedence order, so the append cannot
    wait for a consumer that may never collect."""
    token = batch_token or uuid.uuid4().hex[:12]
    fs, lock = _acquire_index_lock(spark, index_path, "span fold")
    try:
        _check_or_write_config(spark, index_path, chunk_tokens)
        from py_data_pipeline_app_spark.operators.curation import (
            with_token_chunks,
        )

        exploded = with_token_chunks(batch, text_col, chunk_tokens).select(
            F.col(id_col), F.posexplode(F.col("_chunks")).alias("pos", "chunk")
        ).withColumn("fp", F.md5(F.col("chunk")))
        hist_like = exploded.select("fp").limit(0)
        # distinct() makes the fold tolerant of duplicate fingerprints
        # in history (a compaction that crashed after writing its
        # merged directory but before deleting the sources) — without
        # it the left join below fans out chunk rows per duplicate and
        # corrupts n_chunks/n_kept; the LSH fold gets the same
        # tolerance from its candidate distinct
        history = (
            _pinned_history(
                spark, index_path, FPS_SUBDIR, hist_like, exclude_token=token
            )
            .distinct()
            .withColumn("_seen", F.lit(True))
        )
        w = Window.partitionBy("fp").orderBy(id_col, "pos")
        marked = (
            exploded.withColumn("rn", F.row_number().over(w))
            .join(history, "fp", "left")
            .withColumn(
                "is_first", (F.col("rn") == 1) & F.col("_seen").isNull()
            )
        )
        # EAGER index append: this batch's novel fingerprints become
        # history for every later fold
        new_fps = (
            exploded.select("fp")
            .distinct()
            .join(history.select("fp"), "fp", "left_anti")
        )
        _append_batch(new_fps, index_path, FPS_SUBDIR, token)
        rebuilt = marked.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.col("is_first").cast("int")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("is_first"),
                                F.struct(F.col("pos"), F.col("chunk")),
                            )
                        )
                    ),
                    lambda s: s.chunk,
                ),
                " ",
            ).alias("text_deduped"),
        )
        return rebuilt.select(
            id_col,
            "text_deduped",
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.col("n_kept").cast("int").alias("n_kept"),
        )
    finally:
        fs.delete(lock, False)


def compact_fps(spark: SparkSession, index_path: str, *, keep_newest: bool = False) -> int:
    """Merge the ``fps/batch-*`` subdirectories into one
    ``batch-compact-{token}`` directory of distinct fingerprints. Each
    fold adds one subdirectory the next fold's history read must list;
    a long-lived stream accretes one per micro-batch — compaction
    bounds that driver-side listing cost. ``keep_newest=True`` leaves
    the most recently WRITTEN batch untouched so the one micro-batch
    Structured Streaming could replay keeps overwriting its own append
    (the contract shared with the LSH/IVF compactors). Newest is by
    modification time, NOT name: a prior ``batch-compact-*`` directory
    sorts lexically after zero-padded numeric tokens, and protecting
    it instead of the real newest batch would hand a crash-replayed
    fold its own first-attempt fingerprints as history — every chunk
    of the replay would look seen and the rebuild would come back
    empty. Serialized with folds by the same lock. Returns the number
    of directories merged."""
    fs, lock = _acquire_index_lock(spark, index_path, "fps compaction")
    try:
        jvm = spark._jvm.org.apache.hadoop.fs.Path
        fps_path = jvm(f"{index_path}/{FPS_SUBDIR}")
        if not fs.exists(fps_path):
            return 0
        statuses = [
            s
            for s in fs.listStatus(fps_path)
            if s.isDirectory() and s.getPath().getName().startswith("batch-")
        ]
        if keep_newest and statuses:
            newest = max(
                statuses,
                key=lambda s: (s.getModificationTime(), str(s.getPath())),
            )
            statuses = [s for s in statuses if s is not newest]
        dirs = sorted(str(s.getPath()) for s in statuses)
        if len(dirs) < 2:
            return 0
        token = f"compact-{uuid.uuid4().hex[:12]}"
        merged = spark.read.parquet(*dirs).distinct()
        # staged-invisible write: _staging-* does not match the reader's
        # batch-* listing filter, so the merged copy becomes visible only
        # through the atomic rename — the duplicate-history crash window
        # shrinks to [rename, last source delete], and the fold's
        # history distinct makes even that window semantically harmless
        staging = f"{index_path}/{FPS_SUBDIR}/_staging-{token}"
        merged.write.mode("overwrite").parquet(staging)
        if not bool(
            fs.rename(jvm(staging), jvm(f"{index_path}/{FPS_SUBDIR}/batch-{token}"))
        ):
            # a silently-skipped rename followed by the source deletes
            # below would lose the merged rows (FileSystem.rename reports
            # most failures by returning false, not raising)
            raise IOError(f"compaction rename failed: {staging}")
        for d in dirs:
            fs.delete(jvm(d), True)
        return len(dirs)
    finally:
        fs.delete(lock, False)

"""Streaming embedding ingest: the incremental front door of the
persisted IVF index (extension — the reference has no streaming or
vector surface).

A daily/continuous embedding feed folds each arriving micro-batch into
``operators.similarity``'s persisted IVF index via
:func:`~py_data_pipeline_app_spark.operators.similarity.ivf_index_append`
— work ∝ batch (assignment against the persisted centroids only), never
∝ corpus. The index lives in parquet on shared storage, so the
streaming state store stays EMPTY and probes
(:func:`~py_data_pipeline_app_spark.operators.similarity.ivf_topk_indexed`)
see every committed batch immediately — the same state design as the
near-dup stream in ``streaming.dedup``.

Exactly-once under micro-batch replay: the append's ``batch_token`` is
the micro-batch id, and appends write ``appends/batch-{token}`` in
overwrite mode — a retried batch overwrites its own half-committed
append instead of duplicating rows. Compaction runs inside
foreachBatch every ``compact_every`` batches (structurally serialized
with appends) and keeps the newest batch subdirectory untouched so the
one batch Structured Streaming could still replay stays overwritable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def start_embedding_ingest_stream(
    spark: SparkSession,
    landing: str,
    checkpoint: str,
    schema: T.StructType,
    index_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = 16,
    index_kind: str = "ivf",
    allow_reorder: bool = False,
    query_name: str = "embedding_ingest",
) -> StreamingQuery:
    """File-landing → per-batch index append. The index must already
    exist (``build_ivf_index`` / ``build_ivfpq_index`` over the initial
    corpus — centroids, and for IVF-PQ the codebooks, are fixed at
    build time; appends never move them, which is what makes probe
    results independent of arrival order, parity-tested against one
    full rebuild). ``index_kind`` picks the layout: ``"ivf"`` appends
    raw vectors, ``"ivfpq"`` appends PQ codes (the compressed feed —
    same plumbing, 1/32 the bytes landing per batch), ``"semantic"``
    folds the batch into the persisted SemDeDup index
    (``build_semantic_index`` — kept verdicts computed against
    within-cluster history only; the feed must deliver per-cluster
    monotonically increasing ids, which a replayed micro-batch
    satisfies because the append excludes its own token's directory
    from history — OR pass ``allow_reorder=True`` for a multi-producer
    feed with interleaved ids: out-of-order batches then take the
    recompute-mode append, re-verdicting only their clusters with
    consumed-token replay protection; semantic kind only). A semantic
    index built with ``two_level=True`` (the scaled-k production
    mode) needs no flag here: the append reads the assignment mode
    pinned in the index's config manifest and replays the build's own
    fold. All
    layouts auto-compact keep-newest every ``compact_every`` batches.
    ``availableNow`` drains the landing directory and terminates, so
    repeated calls with one checkpoint fold newly landed files
    incrementally."""
    from py_data_pipeline_app_spark.operators.quantization import (
        ivfpq_index_append,
        ivfpq_index_compact,
    )
    from py_data_pipeline_app_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_compact,
        semantic_index_append,
        semantic_index_compact,
    )

    kinds = {
        "ivf": (ivf_index_append, ivf_index_compact),
        "ivfpq": (ivfpq_index_append, ivfpq_index_compact),
        "semantic": (semantic_index_append, semantic_index_compact),
    }
    if index_kind not in kinds:
        raise ValueError(
            f"index_kind must be one of {sorted(kinds)}, got {index_kind!r}"
        )
    append, compact = kinds[index_kind]
    if allow_reorder and index_kind != "semantic":
        raise ValueError(
            "allow_reorder applies to index_kind='semantic' only - the "
            "IVF/IVF-PQ appends are order-independent by construction"
        )
    extra = {"allow_reorder": True} if allow_reorder else {}
    stream = spark.readStream.schema(schema).parquet(landing)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append(
            spark,
            index_path,
            batch_df,
            id_col=id_col,
            vec_col=vec_col,
            batch_token=f"{batch_id:08d}",
            **extra,
        )
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact(spark, index_path, keep_newest=True)

    return (
        stream.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

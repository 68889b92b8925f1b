"""Streaming exact deduplication: the incremental front-door twin of
operators.dedup.exact_dedup (extension — the reference has no
streaming surface).

An ingestion stream dedups arriving documents by content fingerprint
with ``dropDuplicatesWithinWatermark``: state is keyed by the 16-byte
md5 of the normalized text and expires once the event-time watermark
passes the first occurrence's timestamp plus the delay — so state
size is bounded by the watermark horizon (arrival rate × delay), not
by corpus history. The semantic contract, asserted in tests:

- a duplicate arriving while the original's state is live (same
  micro-batch or later, within the watermark) is DROPPED;
- a duplicate arriving after the state expired is RE-EMITTED — exact
  global dedup over unbounded history is a batch job by definition
  (operators.dedup), the streaming operator bounds staleness instead.

At 100 TB-scale ingestion this is the right split: the stream keeps
the recent horizon clean in real time; a periodic batch exact_dedup
sweep (cheap: one shuffle on the fingerprint) reconciles history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from py_data_pipeline_app_spark.functions.text import normalize_text


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Add the content fingerprint and drop duplicates within the
    watermark horizon. Pure transformation — attach any sink."""
    return (
        stream.withColumn("fingerprint", F.md5(normalize_text(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def start_dedup_stream(
    spark: SparkSession,
    landing: str,
    checkpoint: str,
    schema: T.StructType,
    out_path: str,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    query_name: str = "deduped_docs",
) -> StreamingQuery:
    """File-landing → watermarked exact dedup → parquet sink
    (foreachBatch, so the query recovers from its checkpoint across
    restarts — the memory sink cannot). ``availableNow`` drains the
    landing dir and terminates, so repeated calls with one checkpoint
    fold newly landed files incrementally.

    The sink is IDEMPOTENT under micro-batch replay: each batch writes
    its own ``batch-{id}`` subdirectory in overwrite mode, so when
    Structured Streaming re-runs the last uncommitted batch after a
    crash, the retry overwrites the partial output instead of
    appending duplicates — exactly-once output, not just
    at-least-once (same pattern as warehouse.append's token subdirs).
    Read the result with ``read_dedup_output`` (recursive lookup over
    the batch subdirectories)."""
    stream = spark.readStream.schema(schema).parquet(landing)
    deduped = streaming_exact_dedup(
        stream, text_col=text_col, ts_col=ts_col, watermark=watermark
    )
    base = out_path.rstrip("/")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{base}/batch-{batch_id:08d}")

    return (
        deduped.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_dedup_output(spark: SparkSession, out_path: str) -> DataFrame:
    """Read every committed micro-batch's rows from the sink's
    ``batch-*`` subdirectories (recursive file lookup — no partition
    column is inferred, the schema is exactly what the stream wrote)."""
    return (
        spark.read.option("recursiveFileLookup", "true").parquet(out_path.rstrip("/"))
    )

"""Table-layout maintenance for cluster-scale parquet warehouses:
small-file compaction with data clustering, and bucketed tables for
shuffle-free co-located joins (extension — the reference's SQLite
storage has no layout dimension at all).

Why these are engine operators and not ops scripts: at 100 TB the
dominant query costs are (a) open-file overhead and lost min/max
pruning from millions of tiny ingest files, and (b) the exchange that
every fact-fact join pays when the tables aren't co-partitioned.
Compaction fixes (a) — fewer, larger, range-clustered files whose
per-column min/max statistics actually prune. Bucketing fixes (b) —
two tables bucketed by the join key into the same bucket count join
with zero Exchange on either side, which is the single biggest shuffle
a fact-fact pipeline avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    cluster_cols: list[str] | None = None,
    target_files: int | None = None,
    max_records_per_file: int | None = None,
) -> int:
    """Rewrite a parquet directory into fewer, clustered files.

    ``cluster_cols`` range-partitions and sorts the rewrite so each
    output file covers a narrow key range — parquet footer min/max
    statistics then prune whole files for key-range predicates (the
    poor man's Z-order, exact for a single clustering axis).
    ``target_files`` sets the rewrite width (default: let AQE coalesce);
    ``max_records_per_file`` caps file size regardless. Returns the
    number of files written."""
    df = spark.read.parquet(src)
    if cluster_cols:
        if target_files:
            df = df.repartitionByRange(target_files, *cluster_cols)
        else:
            df = df.repartitionByRange(*cluster_cols)
        df = df.sortWithinPartitions(*cluster_cols)
    elif target_files:
        df = df.repartition(target_files)
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(dst)
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(dst)
        .select(F.input_file_name().alias("_f"))
        .distinct()
        .count()
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join
    key. Two tables bucketed by their join key into the SAME bucket
    count join with no Exchange on either side — the shuffle is paid
    once at write time and amortized over every subsequent join; with
    ``sort_cols`` the sort-merge join skips its sort too."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "shard",
    files_per_shard: int = 1,
    shuffle_order: bool = False,
    verify: bool = True,
) -> int:
    """The curated-corpus SINK: write the training set as
    ``n_shards × files_per_shard`` parquet files with DETERMINISTIC
    membership and intra-file order.

    A trainer's data loader wants (a) a fixed shard count matched to
    its worker count, (b) the same document in the same shard on every
    rebuild (resumable runs, reproducible ablations — so membership is
    a hash of the id, never round-robin over an arbitrary partition
    layout), and (c) a stable order within each file so a (shard,
    part, offset) checkpoint identifies a sample forever.
    ``df.repartition`` round-robins from whatever partitioning the
    curation pipeline ended with — none of those properties hold.

    ``files_per_shard`` is the SCALE knob: with 1 (the default) each
    shard is exactly one file written by one task — simple addressing,
    but at 100 TB / 1,024 shards that funnels ~100 GB through a single
    task per file. Raising it splits each shard into ``part`` files by
    a second independent id hash (membership and order stay
    hash-deterministic; a sample address becomes (shard, part,
    offset)), multiplying write parallelism without changing which
    shard any document belongs to.

    One shuffle keyed on (shard, part), then an intra-partition sort;
    directory shard=i/part=j holds exactly the docs with
    hash(id) % n_shards == i and part-hash(id) % files_per_shard == j,
    in id order, in one file.

    ``shuffle_order`` replaces the id order inside each file with a
    deterministic pseudo-random order (sort by a third independent
    md5 of the id, ties by id): sequential readers then see ~IID
    batches even when ids correlate with source/crawl order — the
    trainer-side shuffle buffer stops being the only defense. The
    (shard, part, offset) addressing contract is unchanged — the
    order is still a pure function of the ids present, so a rebuild
    reproduces every offset; it is just no longer the sorted-id order.

    ``verify`` re-reads the sink and counts distinct (shard, part)
    directories — a cheap invariant job at test scale, skippable at
    100 TB (the write itself is deterministic; the read-back only
    guards against an empty hash cell). When verification runs and a
    cell IS empty (possible on corpora small relative to
    n_shards × files_per_shard), this RAISES: a trainer sized to
    n_shards workers must not silently discover a missing shard at
    epoch time. Returns the verified file count (or the expected count
    when ``verify=False``)."""
    from pyspark.sql import functions as F

    from py_data_pipeline_app_spark.operators.sampling import hash_bucket

    shard = (hash_bucket(F.col(id_col), seed) % F.lit(n_shards)).cast("int")
    out = df.withColumn("shard", shard)
    part_cols = ["shard"]
    if files_per_shard > 1:
        part = (
            hash_bucket(F.col(id_col), f"{seed}:part") % F.lit(files_per_shard)
        ).cast("int")
        out = out.withColumn("part", part)
        part_cols.append("part")
    sort_keys: list = [F.col(c) for c in part_cols]
    if shuffle_order:
        from py_data_pipeline_app_spark.functions.text import md5_long

        sort_keys.append(
            md5_long(
                F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}:order"))
            )
        )
    sort_keys.append(F.col(id_col))
    out = out.repartition(
        n_shards * files_per_shard, *part_cols
    ).sortWithinPartitions(*sort_keys)
    out.write.mode("overwrite").partitionBy(*part_cols).parquet(path)
    expected = n_shards * files_per_shard
    if not verify:
        return expected
    spark = df.sparkSession
    written = spark.read.parquet(path).select(*part_cols).distinct().count()
    if written < expected:
        raise ValueError(
            f"training-shard sink at {path} produced {written} of "
            f"{expected} (shard, part) cells - the corpus is too small for "
            f"n_shards={n_shards} x files_per_shard={files_per_shard} and a "
            "trainer sized to that layout would starve. Lower the shard "
            "count or accept the layout explicitly with verify=False."
        )
    return written

"""Incremental image perceptual-hash (dHash) near-dup index: fold NEW
media batches against a persisted band index without re-hashing or
re-blocking history (extension — no reference evidence; the crawl-
cadence lifecycle the round-13 verdict named as the dhash family's
missing piece, built on the ``dedup_incremental`` template).

Batch :func:`~py_data_pipeline_app_spark.operators.media.dhash_near_dup_pairs`
re-bands the WHOLE corpus every run — at crawl cadence on an image
corpus every micro-batch would pay a full posting-list rebuild to
answer "is this new image a near-dup of anything we already have".
The incremental fold keeps two append-only parquet tables:

- ``bands/``  — (media_id, band, bucket): every historical asset's
  hamming band buckets, produced by the SAME
  :func:`~py_data_pipeline_app_spark.operators.media.dhash_band_buckets`
  generator as the batch path, so both sides bucket identically by
  construction.
- ``hashes/`` — (media_id, dhash[, dhash_v]): the signatures
  themselves, the only payload exact-hamming verification needs (no
  re-decode of history at fold time — the ``toksets/`` analog, but a
  fixed 8/16 bytes per asset instead of a word set).

Per batch the work is proportional to ``|new| + |matching index
rows|``, never ``|history|``: hash the new batch (one Arrow map over
payloads), candidates = within-batch pairs (grouped chunk-capped
bucket expansion) ∪ new×history pairs (keyed equi-join on
(band, bucket)), verification = XOR + bit_count on the joined
signatures, then the batch's bands + hashes append under an
idempotent ``batch-{token}`` subdirectory.

Parity contract (tested in test_media_dedup_incremental.py): folding
batches B1..Bn sequentially and unioning the emitted pairs yields
EXACTLY the pairs of one batch ``dhash_near_dup_pairs`` run over
B1∪..∪Bn (same uncapped bucket setting) — within-batch pairs surface
at their own fold, cross-batch pairs at the later batch's fold, and
the pigeonhole recall guarantee (combined hamming < bands ⇒ some band
segment identical ⇒ co-block) holds across the batch boundary because
band keys are pure bit arithmetic on the hash: the same pair collides
in the same band whether its members arrived together or years apart.

Deletes and compaction reuse the LSH index machinery verbatim
(:func:`~py_data_pipeline_app_spark.operators.dedup_incremental.index_delete`
with ``id_col="media_id"`` and :func:`compact_media_index` — the
shared lock, tombstone anti-join, keep-newest replay protection, and
convergent crash model all apply unchanged).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from py_data_pipeline_app_spark.functions.frames import local_rows_df
from py_data_pipeline_app_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    _bucket_member_pairs,
)
from py_data_pipeline_app_spark.operators.dedup_incremental import (
    _acquire_index_lock,
    _append_batch,
    _pinned_history,
    _read_tombstones,
    _without_tombstoned,
    compact_index,
    index_delete,
)
from py_data_pipeline_app_spark.operators.media import (
    _dhash_hash_cols,
    dhash_band_buckets,
    dhash_hamming,
    media_dhash,
)

BANDS_SUBDIR = "bands"
HASHES_SUBDIR = "hashes"
CONFIG_SUBDIR = "config"


def _check_or_write_config(
    spark: SparkSession,
    index_path: str,
    decoder: str,
    axes: str,
    bands: int,
    max_hamming: int,
) -> None:
    """One index = one (decoder, axes, bands, max_hamming)
    configuration. ``decoder`` decides the hash SPACE itself (an image
    grid and an audio spectrogram never hash alike), ``axes`` the
    signature schema AND per-band segment width, ``bands`` the bucket
    keys — band keys from different configurations never match, so a
    drifted fold would silently emit no cross-history pairs (the worst
    dedup failure mode: false confidence); ``max_hamming`` decides
    which pairs folds emit, so drift there would make the
    union-of-folds parity contract meaningless. First fold persists
    the manifest; later folds fail loudly on drift (the
    ``assign_mode`` / LSH-config discipline)."""
    path = f"{index_path}/{CONFIG_SUBDIR}"
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jvm_path):
        row = spark.read.parquet(path).first()
        have = (row.decoder, row.axes, row.bands, row.max_hamming)
        want = (decoder, axes, bands, max_hamming)
        if have != want:
            raise ValueError(
                f"dhash index at {index_path} was built with (decoder, axes, "
                f"bands, max_hamming)={have}, fold requested {want}; hashes "
                "and band keys from different configurations never match, so "
                "this fold would silently miss every historical near-dup - "
                "rebuild the index or match its configuration"
            )
        return
    local_rows_df(
        spark,
        "decoder string, axes string, bands int, max_hamming int",
        [(decoder, axes, bands, max_hamming)],
    ).write.mode("overwrite").parquet(path)


def incremental_dhash_fold(
    spark: SparkSession,
    index_path: str,
    new_media: DataFrame,
    *,
    decoder: str = "payload_gray",
    axes: str = "both",
    bands: int = 8,
    max_hamming: int = 6,
    id_col: str = "media_id",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    batch_token: str | None = None,
) -> DataFrame:
    """Fold one batch of new media assets into the persisted dHash
    index.

    Returns the VERIFIED near-dup pairs the batch introduces — within
    the batch and between the batch and every previously folded asset
    — as (id_a, id_b, hamming) with exact (combined, for two-axis)
    hamming ≤ ``max_hamming``, normalized ``id_a < id_b``. The batch's
    bands and signatures are appended to the index before returning
    (eager write; the returned pairs frame stays lazy but is pinned to
    the pre-fold index state).

    ``new_media`` needs (media_id, payload) — filter to
    ``kind='image'`` first on a mixed-modality table. Defaults are the
    PRODUCTION configuration (two-axis signature, 16-bit band
    buckets); ``max_bucket_size`` chunk-caps WITHIN-BATCH viral
    buckets exactly like the batch path, the new×history side is a
    keyed equi-join whose skew is AQE's job. Pass ``None`` for the
    exact uncapped contract (and exact batch parity on pathological
    data).

    Folds are serialized by the index lock; a retried fold (crash
    after the index write, foreachBatch replay) excludes its own
    ``batch-{token}`` subdirectory from history, so replay is
    exactly-once — no self-pairs, no double-reported within-batch
    pairs. RE-folding a media_id already in the index is supported
    only for identical content: verification is latest-wins per id
    (the batch's signature shadows the historical one) but the old
    content's band rows remain — fold changed content under a new id.

    Scale shape per fold: one Arrow decode map over the batch, one
    explode (``bands`` rows per new asset), one chunk-capped grouped
    expansion, one (band, bucket) equi-join against history (the
    posting-list probe — Catalyst broadcasts the new side when small),
    one id-keyed join for verification. History is only ever touched
    through keyed joins; writing the band table bucketed by ``bucket``
    would make the probe shuffle-free on the history side at 100 TB."""
    fs, lock = _acquire_index_lock(spark, index_path, "dhash fold")
    try:
        _check_or_write_config(
            spark, index_path, decoder, axes, bands, max_hamming
        )
        new_hashes = media_dhash(
            new_media.select(F.col(id_col).alias("media_id"), "payload"),
            decoder=decoder,
            axes=axes,
        ).localCheckpoint(eager=True)  # one decode: bands, verify, append
        hash_cols = _dhash_hash_cols(new_hashes)
        new_buckets = dhash_band_buckets(new_hashes, bands=bands)

        token = batch_token or uuid.uuid4().hex[:12]
        tombs = _read_tombstones(spark, index_path)
        hist_buckets = _without_tombstoned(
            _pinned_history(
                spark, index_path, BANDS_SUBDIR, new_buckets,
                exclude_token=token,
            ),
            tombs,
        )

        within = _bucket_member_pairs(
            new_buckets,
            ["band", "bucket"],
            "media_id",
            max_bucket_size=max_bucket_size,
        ).select(F.col("_a").alias("id_a"), F.col("_b").alias("id_b"))
        across = (
            new_buckets.alias("n")
            .join(
                hist_buckets.alias("h"),
                (F.col("n.band") == F.col("h.band"))
                & (F.col("n.bucket") == F.col("h.bucket")),
            )
            .select(
                F.least(F.col("n.media_id"), F.col("h.media_id")).alias("id_a"),
                F.greatest(F.col("n.media_id"), F.col("h.media_id")).alias(
                    "id_b"
                ),
            )
            .filter(F.col("id_a") != F.col("id_b"))
        )
        cands = within.unionByName(across).distinct()

        hist_hashes = _without_tombstoned(
            _pinned_history(
                spark, index_path, HASHES_SUBDIR, new_hashes,
                exclude_token=token,
            ),
            tombs,
        )
        # latest-wins per media_id (re-ingest / pre-compaction retry
        # leftovers would otherwise fan the verify joins into duplicate
        # pair rows — the LSH fold's tokset discipline)
        hist_only = hist_hashes.join(
            new_hashes.select("media_id"), "media_id", "left_anti"
        ).dropDuplicates(["media_id"])
        all_hashes = new_hashes.unionByName(hist_only)
        ha = all_hashes.select(
            F.col("media_id").alias("id_a"),
            *[F.col(hc).alias(f"_ha{j}") for j, hc in enumerate(hash_cols)],
        )
        hb = all_hashes.select(
            F.col("media_id").alias("id_b"),
            *[F.col(hc).alias(f"_hb{j}") for j, hc in enumerate(hash_cols)],
        )
        verified = (
            cands.join(ha, "id_a")
            .join(hb, "id_b")
            .select(
                "id_a",
                "id_b",
                dhash_hamming(hash_cols).cast("int").alias("hamming"),
            )
            .filter(F.col("hamming") <= max_hamming)
        )

        _append_batch(new_buckets, index_path, BANDS_SUBDIR, token)
        _append_batch(new_hashes, index_path, HASHES_SUBDIR, token)
        return verified
    finally:
        fs.delete(lock, False)


def media_index_delete(
    spark: SparkSession,
    index_path: str,
    ids: DataFrame,
    *,
    batch_token: str | None = None,
) -> str | None:
    """Tombstone-delete assets from the persisted dHash index — the
    takedown path, FORGET-not-BLOCK semantics and crash model exactly
    as :func:`~py_data_pipeline_app_spark.operators.dedup_incremental.index_delete`
    (shared implementation; the tombstone set stores ``media_id`` and
    every fold anti-joins it out of both history reads)."""
    return index_delete(
        spark, index_path, ids, id_col="media_id", batch_token=batch_token
    )


def compact_media_index(
    spark: SparkSession, index_path: str, *, keep_newest: bool = True
) -> int:
    """Merge the dHash index's ``batch-*`` subdirectories into one
    consolidated batch —
    :func:`~py_data_pipeline_app_spark.operators.dedup_incremental.compact_index`
    on this index's layout (bands distinct; hashes deduped per
    media_id), inheriting the shared lock, tombstone application,
    keep-newest replay protection, and convergence-not-atomicity
    crash model unchanged."""
    return compact_index(
        spark,
        index_path,
        keep_newest=keep_newest,
        tables=((BANDS_SUBDIR, None), (HASHES_SUBDIR, ["media_id"])),
    )

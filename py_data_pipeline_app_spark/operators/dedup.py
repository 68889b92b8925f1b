"""Deduplication operators for large-scale corpus curation: exact,
MinHash+LSH, SimHash, and n-gram Jaccard — the standard toolkit a
training-data pipeline runs before anything else.

Design for 100 TB:

- Nothing here ever cross-joins the corpus. Every near-dup algorithm
  is *blocked*: candidate pairs come from an equi-join on a compact key
  (fingerprint, LSH band hash, SimHash chunk, shared shingle), so the
  shuffle is keyed and data-proportional, and skew is bounded by
  document-frequency caps.
- All hashing is md5-derived (cross-engine stable, see functions.text)
  and computed with native Column expressions inside whole-stage
  codegen; no Python in the per-row path.
- Verification (exact Jaccard / Hamming on candidates) happens on the
  candidate set only — orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_data_pipeline_app_spark.functions.text import (
    md5_long,
    minhash_perm,
    normalize_text,
    perm_coeffs,
    token_hash,
    tokens,
)

DEFAULT_NUM_PERMS = 32
DEFAULT_BANDS = 8  # 8 bands x 4 rows over 32 perms


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact (normalized) dedup: one hash-groupBy on the md5 of the
    normalized text. Returns one row per distinct content with the
    canonical (minimum) id and the duplicate count.

    At scale this is the cheapest possible dedup: a single shuffle on a
    16-byte key with full map-side partial aggregation."""
    return (
        df.select(
            F.md5(normalize_text(text_col)).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def word_shingles(df: DataFrame, text_col: str = "text", n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) pairs: distinct word n-grams per document."""
    toks = tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by word-``n``-gram Jaccard similarity ≥ threshold.

    Inverted-index formulation — the scalable shape: explode distinct
    shingles, equi-join documents *on the shingle* (never a cross
    join), count co-occurrences per pair, then Jaccard =
    |∩| / (|A| + |B| - |∩|). ``max_df`` drops shingles appearing in
    more than that many documents: a stop-shingle cap that bounds the
    quadratic blowup of ultra-frequent shingles at corpus scale (pairs
    produced by a shingle grow as df², so one viral boilerplate line
    can dominate the shuffle; capping df bounds it)."""
    sh = word_shingles(df, text_col, n, id_col)
    if max_df is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        sh = (
            sh.join(freq.filter(F.col("_df") <= max_df).select("shingle"), "shingle")
        )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = DEFAULT_NUM_PERMS,
) -> DataFrame:
    """Per-document MinHash signature over the *word set* (unigram
    shingles): num_perms affine permutations of md5-derived token
    hashes, min-aggregated per document.

    One explode + one groupBy with ``num_perms`` min() aggregates —
    partial aggregation collapses each partition to one row per doc
    before the shuffle."""
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    ).withColumn("h", token_hash(F.col("tok")))
    aggs = [
        F.min(minhash_perm(F.col("h"), a, b)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(perm_coeffs(num_perms))
    ]
    return tok.groupBy(id_col).agg(*aggs)


def _in_bucket_pairs(ids: F.Column) -> F.Column:
    """All (id_a < id_b) pairs within one bucket's sorted id array,
    as an array of structs — generated with higher-order functions so
    the bucket never leaves the JVM."""
    n = F.size(ids)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at(ids, i).alias("id_a"),
                    F.element_at(ids, j).alias("id_b"),
                ),
            ),
        )
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    num_perms: int = DEFAULT_NUM_PERMS,
    bands: int = DEFAULT_BANDS,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: hash each band of r = num_perms/bands signature
    values to a bucket key; documents sharing any bucket are candidate
    pairs.

    Shape matters at scale: pairs are generated by grouping ids per
    (band, bucket) and expanding combinations *inside* the bucket — the
    signature subplan executes once, versus a bucket self-join where
    Spark recomputes it for both join branches (measured 6-7× slower).
    ``max_bucket_size`` optionally skips degenerate viral buckets whose
    pair count grows quadratically; leave None when exact recall is
    required (e.g. threshold-1.0 dedup, where every bucket member is a
    true duplicate)."""
    r = num_perms // bands
    band_keys = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.md5(
                    F.concat_ws(
                        "_", *[F.col(f"mh_{bi * r + j}") for j in range(r)]
                    )
                ).alias("bucket"),
            )
            for bi in range(bands)
        ]
    )
    buckets = signatures.select(
        F.col(id_col), F.explode(band_keys).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    grouped = buckets.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_list(F.col(id_col))).alias("ids")
    )
    grouped = grouped.filter(F.size("ids") >= 2)
    if max_bucket_size is not None:
        grouped = grouped.filter(F.size("ids") <= max_bucket_size)
    return (
        grouped.select(F.explode(_in_bucket_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = DEFAULT_NUM_PERMS,
    bands: int = DEFAULT_BANDS,
    threshold: float = 1.0,
) -> DataFrame:
    """MinHash + LSH near-dup pairs, exact-verified.

    Pipeline: signatures → banded LSH candidates → join token sets
    back → exact word-set Jaccard ≥ threshold. With threshold = 1.0
    (identical word sets) recall is provably 1.0 — identical sets give
    identical signatures, which collide in every band — so the result
    is deterministic, not probabilistic, and the DuckDB oracle can
    check it. Lower thresholds trade recall for candidate volume (the
    standard b/r S-curve); tests cover that regime."""
    sigs = minhash_signatures(df, text_col=text_col, id_col=id_col, num_perms=num_perms)
    cands = lsh_candidate_pairs(sigs, id_col=id_col, num_perms=num_perms, bands=bands)

    toksets = df.select(
        F.col(id_col),
        F.array_sort(F.array_distinct(tokens(text_col))).alias("tokset"),
    )
    ta = toksets.select(F.col(id_col).alias("id_a"), F.col("tokset").alias("set_a"))
    tb = toksets.select(F.col(id_col).alias("id_b"), F.col("tokset").alias("set_b"))
    verified = (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("set_a", "set_b")).cast("double")
                / F.size(F.array_union("set_a", "set_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def simhash64(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document over distinct-word md5 hashes.

    Per bit j: sign of Σ_tokens (bit_j(h) ? +1 : -1). Computed as 64
    conditional-sum aggregates in one groupBy — all JVM-side, partial
    aggregation map-side. Emitted as the packed bigint ``simhash``."""
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    ).withColumn("h", md5_long(F.col("tok")))  # 60 usable bits
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{j}")
        for j in range(60)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    bit_terms = [
        F.when(F.col(f"v_{j}") > 0, F.lit(1).cast("long") * F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for j in range(60)
    ]
    packed = bit_terms[0]
    for t in bit_terms[1:]:
        packed = packed + t
    return agg.select(F.col(id_col), packed.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ max_hamming.

    Blocking by the pigeonhole principle: split the 60-bit hash into
    ``chunks`` segments; any pair within Hamming ≤ chunks-1 must agree
    on at least one whole segment, so candidates come from equi-joins
    on (segment_idx, segment_value) — never a cross join. Exact Hamming
    (bit_count of xor) verifies candidates."""
    seg_bits = 60 // chunks
    sh = simhash64(df, text_col=text_col, id_col=id_col)
    segs = F.array(
        *[
            F.struct(
                F.lit(ci).alias("seg"),
                F.shiftright(F.col("simhash"), ci * seg_bits)
                .bitwiseAND(F.lit((1 << seg_bits) - 1))
                .alias("val"),
            )
            for ci in range(chunks)
        ]
    )
    blocked = sh.select(id_col, "simhash", F.explode(segs).alias("s")).select(
        id_col, "simhash", F.col("s.seg").alias("seg"), F.col("s.val").alias("val")
    )
    # Group per segment bucket and expand pairs in-bucket (carrying both
    # simhashes) — the simhash subplan executes once; a self-join would
    # recompute the 60-aggregate groupBy for both branches.
    members = blocked.groupBy("seg", "val").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("simhash")))
        ).alias("ms")
    ).filter(F.size("ms") >= 2)
    n = F.size(F.col("ms"))
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at(F.col("ms"), i)["id"].alias("id_a"),
                    F.element_at(F.col("ms"), j)["id"].alias("id_b"),
                    F.element_at(F.col("ms"), i)["simhash"].alias("sh_a"),
                    F.element_at(F.col("ms"), j)["simhash"].alias("sh_b"),
                ),
            ),
        )
    )
    return (
        members.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b", "p.sh_a", "p.sh_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

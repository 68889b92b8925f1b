"""Corpus-curation operators for LLM training-data pipelines:
repetition-based quality filters, PII redaction, benchmark
decontamination, and sequence packing (extension — no reference
evidence; the reference app has no curation surface).

These are the standard passes a pretraining pipeline runs between raw
ingestion and tokenization — alongside the dedup family
(operators.dedup), quality scoring (functions.text), and the
deterministic split/sample operators (operators.sampling).

Design for 100 TB:

- Everything is native Column expressions — no Python in the per-row
  path; every aggregation is keyed by document (or by a bounded
  dimension) with map-side partial aggregation, so shuffles move
  per-document summaries, never token streams. Word/gram occurrence
  rows explode within a task and collapse back to one row per document
  before any exchange.
- Decontamination broadcasts the benchmark gram set (evaluation suites
  are MBs against a 100-TB corpus) — the corpus is scanned once and
  never shuffled except the final per-document rollup.
- Sequence packing is windowed *per shard*, never a global sort: each
  shard packs independently (that is also how a real tokenizer fleet
  consumes it), so the window's partition is bounded and the plan
  scales linearly with shard count.
- All randomness is md5-derived (functions.text.md5_long), so every
  operator is bit-reproducible in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from py_data_pipeline_app_spark.functions.text import tokens

# ---------------------------------------------------------------------------
# Repetition filters (Gopher-style rules 4-8: a document dominated by a
# few words or by repeated n-grams is boilerplate, not prose)
# ---------------------------------------------------------------------------


def word_repetition_stats(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document word-occurrence statistics: total/ distinct word
    counts, the most frequent word's share, and the share of
    occurrences belonging to repeated words.

    Shape: explode → count per (doc, word) → roll up per doc. Both
    aggregations combine map-side; only (doc, word, count) rows — and
    after the second partial, one row per document — cross a shuffle."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_w"))
    wc = tok.groupBy(id_col, "_w").agg(F.count(F.lit(1)).alias("_c"))
    return wc.groupBy(id_col).agg(
        F.sum("_c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("_c").alias("top_word_count"),
        F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0)).alias(
            "dup_word_occurrences"
        ),
    )


def ngram_array(text_col: Column | str, n: int) -> Column:
    """Word ``n``-grams of the text as an array of space-joined
    strings; texts shorter than ``n`` words yield their whole token
    run as the single gram (never an empty array, so downstream
    explodes keep every document)."""
    toks = tokens(text_col)
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
    return F.transform(
        starts, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )


def gram_repetition_stats(
    df: DataFrame, *, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document ``n``-gram repetition: total grams, the top gram's
    share, and the share of occurrences in repeated grams — same
    two-level rollup shape as :func:`word_repetition_stats`."""
    g = df.select(F.col(id_col), F.explode(ngram_array(text_col, n)).alias("_g"))
    gc = g.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    return gc.groupBy(id_col).agg(
        F.sum("_c").alias(f"n_{n}grams"),
        F.max("_c").alias(f"top_{n}gram_count"),
        F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0)).alias(
            f"dup_{n}gram_occurrences"
        ),
    )


def repetition_filter(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_top_word_frac: float = 0.10,
    max_dup_2gram_frac: float = 0.60,
) -> DataFrame:
    """Gopher-style repetition flags per document: the top word's
    occurrence share and the duplicate-2-gram occurrence share, each
    rounded and compared against its budget. Returns one row per
    document with the fractions and a ``flagged`` verdict (True =
    drop candidate)."""
    w = word_repetition_stats(df, text_col=text_col, id_col=id_col)
    g = gram_repetition_stats(df, n=2, text_col=text_col, id_col=id_col)
    j = w.join(g, id_col)
    top_word_frac = F.round(
        F.col("top_word_count").cast("double") / F.col("n_words"), 6
    )
    dup_2gram_frac = F.round(
        F.col("dup_2gram_occurrences").cast("double") / F.col("n_2grams"), 6
    )
    return j.select(
        id_col,
        F.col("n_words"),
        F.col("n_distinct_words"),
        top_word_frac.alias("top_word_frac"),
        dup_2gram_frac.alias("dup_2gram_frac"),
        (
            (top_word_frac > max_top_word_frac)
            | (dup_2gram_frac > max_dup_2gram_frac)
        ).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: Conservative patterns shared verbatim with the DuckDB oracle (plain
#: character classes + counted quantifiers — identical semantics in
#: Java regex and RE2).
EMAIL_RE = "[A-Za-z0-9#._]+@[A-Za-z0-9.-]+"
PHONE_RE = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(
    df: DataFrame, *, text_col: str, out_col: str = "scrubbed"
) -> DataFrame:
    """Redact emails and phone numbers from ``text_col``, adding the
    scrubbed text and per-row redaction counts. Counts are taken
    before replacement (size of regexp_extract_all), the scrub is two
    chained regexp_replace calls — all codegen'd, scan-bound."""
    c = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), 0))
    scrubbed = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.withColumn("n_emails", n_emails).withColumn(
        "n_phones", n_phones
    ).withColumn(out_col, scrubbed)


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document overlap with a benchmark set's word ``n``-grams —
    the standard eval-decontamination pass: a training document sharing
    a large fraction of its grams with any benchmark item leaks the
    benchmark.

    Returns (id, n_grams, n_hits, contamination_frac) for every
    document in ``docs``. The benchmark gram set is deduplicated and
    broadcast (eval suites are tiny next to the corpus); the corpus is
    scanned once — grams explode and re-collapse to one row per
    document around a broadcast left join, so the only shuffle is the
    per-document rollup."""
    bench_grams = (
        benchmark.select(F.explode(ngram_array(text_col, n)).alias("_bg"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(ngram_array(text_col, n)).alias("_g")
    )
    joined = doc_grams.join(
        F.broadcast(bench_grams), doc_grams._g == bench_grams._bg, "left"
    )
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"),
    )
    return agg.select(
        id_col,
        "n_grams",
        "n_hits",
        F.round(F.col("n_hits").cast("double") / F.col("n_grams"), 6).alias(
            "contamination_frac"
        ),
    )


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(
    docs: DataFrame,
    *,
    seq_len: int = 2048,
    n_shards: int = 8,
    token_col: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to fixed-budget training sequences
    (concat-and-chop packing): within a deterministic shard, documents
    are laid end-to-end in ``id_col`` order and a document belongs to
    the sequence where its first token lands.

    Adds (shard, seq_bin, n_tokens, offset) per document. Packing is
    windowed PER SHARD — each shard is an independent stream a
    tokenizer worker consumes, so no global sort exists in the plan
    and shard count scales with the cluster."""
    tok = token_col if token_col is not None else F.size(tokens(text_col))
    shard = (F.col(id_col) % n_shards).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = docs.select(F.col(id_col), shard.alias("shard"), tok.alias("n_tokens"))
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.withColumn("offset", offset).withColumn(
        "seq_bin", F.floor(F.col("offset") / seq_len).cast("int")
    )

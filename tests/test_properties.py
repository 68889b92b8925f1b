"""Property-based checks (hypothesis): the array-fold occurrence
kernel against a Python reference on arbitrary token multisets, and
PII scrub counts against known injections."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from py_data_pipeline_app_spark.operators.curation import (
    pii_scrub,
    run_length_stats,
)

WORD = st.text(alphabet="abcde", min_size=1, max_size=3)
TOKLIST = st.lists(WORD, min_size=0, max_size=40)


@settings(max_examples=15, deadline=None)
@given(st.lists(TOKLIST, min_size=1, max_size=20))
def test_run_length_stats_matches_counter(spark, toklists):
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(toklists)],
        "i long, toks array<string>",
    )
    out = df.select(
        "i", run_length_stats(F.sort_array(F.col("toks"))).alias("s")
    ).collect()
    for r in out:
        c = Counter(toklists[r.i])
        assert r.s.top_count == (max(c.values()) if c else 0)
        assert r.s.n_distinct == len(c)
        assert r.s.dup_occurrences == sum(v for v in c.values() if v > 1)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(WORD, min_size=1, max_size=10),  # filler words, no @/digits
            st.integers(min_value=0, max_value=3),  # emails injected
            st.integers(min_value=0, max_value=2),  # phones injected
        ),
        min_size=1,
        max_size=15,
    )
)
def test_pii_scrub_counts_match_injections(spark, rows):
    texts = []
    for words, n_em, n_ph in rows:
        parts = list(words)
        parts += [f"user{k}@host.example" for k in range(n_em)]
        parts += ["12-345-678-9012"] * n_ph
        texts.append(" ".join(parts))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "t"]
    )
    out = {r.i: r for r in pii_scrub(df, text_col="t").collect()}
    for i, (_, n_em, n_ph) in enumerate(rows):
        assert out[i].n_emails == n_em
        assert out[i].n_phones == n_ph
        assert "@" not in out[i].scrubbed or n_em == 0


@settings(max_examples=5, deadline=None)
@given(
    st.lists(TOKLIST.filter(bool), min_size=2, max_size=10),
    st.integers(min_value=2, max_value=3),  # number of fold batches
    st.sampled_from([1.0, 0.5]),
)
def test_incremental_fold_union_equals_batch_lsh(spark, toklists, n_batches, threshold):
    """Replay parity as a property: for ANY corpus and ANY split into
    sequential batches, the union of incremental_lsh_fold emissions
    equals one batch minhash_dedup_pairs run over the whole corpus
    (uncapped buckets on both sides)."""
    import tempfile

    from py_data_pipeline_app_spark.operators.dedup import minhash_dedup_pairs
    from py_data_pipeline_app_spark.operators.dedup_incremental import (
        incremental_lsh_fold,
    )

    docs = [(i, " ".join(toks)) for i, toks in enumerate(toklists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    expected = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_dedup_pairs(df, threshold=threshold).collect()
    )

    index = tempfile.mkdtemp(prefix="prop_lsh_")
    got = []
    for k in range(n_batches):
        batch = df.filter(F.col("doc_id") % n_batches == k)
        pairs = incremental_lsh_fold(
            spark,
            index,
            batch,
            threshold=threshold,
            max_bucket_size=None,
            batch_token=f"b{k}",
        )
        got.extend((r.id_a, r.id_b, r.jaccard) for r in pairs.collect())
    assert sorted(got) == expected

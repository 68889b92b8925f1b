"""Curation operators: repetition flags on crafted documents, PII
scrub counts, planted contamination, and sequence-packing invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from py_data_pipeline_app_spark.functions.frames import local_rows_df
from py_data_pipeline_app_spark.operators.curation import (
    contamination_stats,
    pack_sequences,
    pii_scrub,
    repetition_filter,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spam spam spam spam spam spam spam spam spam spam"),  # one word
        (2, "the quick brown fox jumps over the lazy dog today"),  # prose-ish
        (3, "go go stop go go stop go go stop go go stop"),  # repeated 2-grams
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    return local_rows_df(spark, "doc_id long, text string", rows)


def test_repetition_filter_flags_degenerate_docs(docs):
    out = {r.doc_id: r for r in repetition_filter(docs).collect()}
    assert out[1].flagged  # top_word_frac == 1.0
    assert out[1].top_word_frac == 1.0
    assert not out[4].flagged  # all-distinct words, no repeated grams
    assert out[4].dup_2gram_frac == 0.0
    assert out[3].flagged  # 'go go' dominates the 2-grams
    assert out[3].dup_2gram_frac > 0.6
    # doc 2: 'the' twice in 10 words = 0.2 > 0.10 budget -> flagged by
    # top word, but its gram repetition stays low
    assert out[2].top_word_frac == 0.2
    assert out[2].dup_2gram_frac == 0.0


def test_pii_scrub_counts_and_redacts(spark):
    df = local_rows_df(
        spark,
        "id long, t string",
        [
            (1, "reach me at a.b#1@mail.example or 12-345-678-9012"),
            (2, "no pii here at all"),
            (3, "two mails x@y.z and q@r.s plus 99-111-222-3333"),
        ],
    )
    out = {r.id: r for r in pii_scrub(df, text_col="t").collect()}
    assert out[1].n_emails == 1 and out[1].n_phones == 1
    assert "<EMAIL>" in out[1].scrubbed and "<PHONE>" in out[1].scrubbed
    assert "mail.example" not in out[1].scrubbed
    assert out[2].n_emails == 0 and out[2].n_phones == 0
    assert out[2].scrubbed == "no pii here at all"
    assert out[3].n_emails == 2 and out[3].n_phones == 1
    assert out[3].scrubbed.count("<EMAIL>") == 2


def test_pii_scrub_email_abutting_phone(spark):
    # The email domain class spans digits/hyphens, so an email glued to
    # a phone would swallow the phone digits if emails scrubbed first;
    # phone-first keeps counts consistent with the scrubbed text.
    df = local_rows_df(spark, "id long, t string", [(1, "ping a@b.c12-345-678-9012 now")])
    row = pii_scrub(df, text_col="t").collect()[0]
    assert row.n_phones == 1
    assert row.scrubbed.count("<PHONE>") == 1
    assert row.scrubbed.count("<EMAIL>") == row.n_emails == 1
    assert "9012" not in row.scrubbed


def test_contamination_finds_planted_overlap(spark):
    bench = local_rows_df(
        spark, "doc_id long, text string", [(100, "one two three four five six seven")]
    )
    docs = local_rows_df(
        spark,
        "doc_id long, text string",
        [
            (1, "one two three four five six seven"),  # identical -> frac 1.0
            (2, "zero one two three four five nine"),  # shares 'one..five' 5-gram
            (3, "alpha beta gamma delta epsilon zeta"),  # disjoint
        ],
    )
    out = {r.doc_id: r for r in contamination_stats(docs, bench, n=5).collect()}
    assert out[1].contamination_frac == 1.0
    assert out[3].n_hits == 0 and out[3].contamination_frac == 0.0
    assert 0.0 < out[2].contamination_frac < 1.0


def test_pack_sequences_invariants(spark):
    docs = local_rows_df(
        spark, "doc_id long, text string", [(i, "w " * (i % 50 + 1)) for i in range(200)]
    )
    packed = pack_sequences(docs, seq_len=64, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        # offsets are the exclusive running sum in id order
        run = 0
        for r in rows:
            assert r.shard == r.doc_id % 4
            assert r.offset == run
            assert r.seq_bin == r.offset // 64
            run += r.n_tokens


@pytest.mark.oracle
def test_cluster_keyed_split_has_zero_leakage(spark):
    # assigning splits by the cluster canonical id puts every near-dup
    # pair in one split — the property the leakage-safe build relies on
    from py_data_pipeline_app_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )
    from py_data_pipeline_app_spark.operators.sampling import hash_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=100)
    labels = connected_components(pairs)
    assigned = hash_split(
        labels, "comp", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("node", "split")
    a = assigned.withColumnRenamed("node", "id_a").withColumnRenamed("split", "sa")
    b = assigned.withColumnRenamed("node", "id_b").withColumnRenamed("split", "sb")
    crossing = (
        pairs.join(a, "id_a").join(b, "id_b").filter("sa <> sb").count()
    )
    assert pairs.count() > 0  # the property is vacuous without pairs
    assert crossing == 0


def test_chunk_dedup_rebuild_scrubs_repeats_keeps_first(spark):
    """Planted structure: an exact duplicate document scrubs to empty,
    shared boilerplate survives only in the document where it first
    appeared, and unique text is untouched."""
    from py_data_pipeline_app_spark.operators.curation import chunk_dedup_rebuild

    boiler = "all rights reserved contact us terms of service apply now"  # 10 tokens
    u1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    u2 = "one two three four five six seven eight nine ten"
    rows = [
        (1, u1 + " " + boiler),
        (2, u1 + " " + boiler),          # exact dup of 1 -> fully scrubbed
        (3, u2 + " " + boiler),          # keeps u2, loses the boilerplate
        (4, "totally unique words here"),
    ]
    df = local_rows_df(spark, "doc_id long, text string", rows)
    out = {r.doc_id: r for r in chunk_dedup_rebuild(df, chunk_tokens=10).collect()}
    assert out[1].text_deduped == rows[0][1]          # first doc keeps all
    assert out[1].n_chunks == 2 and out[1].n_kept == 2
    assert out[2].text_deduped == "" and out[2].n_kept == 0
    assert out[3].text_deduped == u2                  # boilerplate chunk gone
    assert out[3].n_chunks == 2 and out[3].n_kept == 1
    assert out[4].text_deduped == rows[3][1]


def test_token_diversity_matches_python_model(spark):
    """Simpson diversity = 1 − Σ(c/n)², computed independently in
    python over the same whitespace tokenization."""
    from py_data_pipeline_app_spark.operators.curation import token_diversity

    rows = [
        (1, "a a a a"),                      # max concentration
        (2, "w x y z"),                      # max diversity for n=4
        (3, "spam spam spam ham ham eggs"),
        (4, "one"),
    ]
    df = local_rows_df(spark, "doc_id long, text string", rows)
    got = {r.doc_id: r for r in token_diversity(df).collect()}
    for doc_id, text in rows:
        toks = text.split()
        n = len(toks)
        counts = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        simpson = round(1.0 - sum(c * c for c in counts.values()) / (n * n), 9)
        r = got[doc_id]
        assert r.n_tokens == n
        assert r.distinct_tokens == len(counts)
        assert r.simpson_diversity == simpson, doc_id
    assert got[1].simpson_diversity == 0.0
    assert got[2].simpson_diversity == 0.75


def test_perplexity_buckets_python_model(spark):
    """Cross-entropy recomputed in plain Python: top-V LM with
    count-desc/token-asc ranking, ln(c/total) logps, OOV floor."""
    import math

    from py_data_pipeline_app_spark.operators.curation import perplexity_buckets

    rows = [
        (1, "a a a b b c"),
        (2, "a b c d"),          # d is OOV under vocab_size=3
        (3, "zz yy zz yy"),      # all OOV -> worst score
    ]
    df = local_rows_df(spark, "doc_id long, text string", rows)
    got = {
        r.doc_id: r
        for r in perplexity_buckets(
            df, vocab_size=3, head_cutoff=1.2, tail_cutoff=2.0
        ).collect()
    }
    toks = {
        1: ["a", "a", "a", "b", "b", "c"],
        2: ["a", "b", "c", "d"],
        3: ["zz", "yy", "zz", "yy"],
    }
    counts: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    vocab = sorted(counts, key=lambda t: (-counts[t], t))[:3]
    lp = {t: round(math.log(counts[t] / total), 6) for t in vocab}
    floor = round(math.log(1.0 / total), 6)
    for did, ts in toks.items():
        want = round(-sum(lp.get(t, floor) for t in ts) / len(ts), 6)
        # python round() is banker's, Spark round is HALF_UP: allow one
        # ulp of the 6-dp rounding at exact .5 boundaries
        assert abs(got[did].cross_entropy - want) <= 1.01e-6, did
        assert got[did].n_tokens == len(ts)
    assert got[3].bucket == "tail" and not got[3].kept
    assert got[1].kept


def test_perplexity_external_lm(spark):
    """Scoring against a FIXED reference LM (the CCNet setup): docs the
    reference model never saw score by the reference's probabilities."""
    from py_data_pipeline_app_spark.operators.curation import (
        perplexity_buckets,
        unigram_lm,
    )

    ref = local_rows_df(spark, "doc_id long, text string", [(1, "clean clean text text")])
    lm = unigram_lm(ref, vocab_size=10)
    crawl = local_rows_df(
        spark, "doc_id long, text string", [(10, "clean text"), (11, "junk junk junk")]
    )
    got = {
        r.doc_id: r.cross_entropy
        for r in perplexity_buckets(crawl, lm=lm, tail_cutoff=1.0).collect()
    }
    # in-vocab doc scores ln(2/4); OOV-only doc scores the floor ln(1/4)
    import math

    assert abs(got[10] - round(-math.log(0.5), 6)) < 1e-6
    assert abs(got[11] - round(-math.log(0.25), 6)) < 1e-6


def test_bigram_merge_candidates_python_model(spark):
    from py_data_pipeline_app_spark.operators.curation import (
        bigram_merge_candidates,
    )

    rows = [
        (1, "new york new york city"),
        (2, "york new york is big"),
        (3, "one token"),
        (4, "solo"),
    ]
    df = local_rows_df(spark, "doc_id long, text string", rows)
    got = [(r.pair, r.n_occurrences) for r in bigram_merge_candidates(df, k=3).collect()]
    # python model
    from collections import Counter

    c = Counter()
    for _, t in rows:
        ws = t.split()
        c.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == want
    assert got[0] == ("new york", 3)


def test_benchmark_span_scrub_removes_planted_leak(spark):
    from py_data_pipeline_app_spark.operators.curation import benchmark_span_scrub

    bench_text = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12"
    clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    bench = local_rows_df(spark, "doc_id long, text string", [(100, bench_text)])
    docs = local_rows_df(
        spark,
        "doc_id long, text string",
        [
            # chunk 1 = bench tokens 2..11 (interior offset) -> removed
            (1, clean + " q2 q3 q4 q5 q6 q7 q8 q9 q10 q11"),
            (2, clean),                       # untouched
            (3, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"),  # fully leaked -> empty
        ],
    )
    out = {r.doc_id: r for r in benchmark_span_scrub(docs, bench).collect()}
    assert out[1].text_scrubbed == clean and out[1].n_removed == 1
    assert out[2].text_scrubbed == clean and out[2].n_removed == 0
    assert out[3].text_scrubbed == "" and out[3].n_removed == 1


def test_bigram_perplexity_flips_word_salad(spark):
    """The bigram mode's reason to exist, pinned: word salad built
    from the corpus' most frequent words is INVISIBLE to the unigram
    filter (identical CE to the natural sentence it scrambles — the
    unigram model cannot see order) and flips head → tail under the
    interpolated bigram. Natural repetitions of the sentence stay
    head under both."""
    from py_data_pipeline_app_spark.functions.frames import local_rows_df
    from py_data_pipeline_app_spark.operators.curation import (
        bigram_perplexity_buckets,
        perplexity_buckets,
    )

    nat = "the cat sat on the mat"
    salad = "mat the on sat cat the"  # same multiset, scrambled order
    docs = local_rows_df(
        spark,
        "doc_id long, text string",
        [(i, nat) for i in range(8)] + [(100, salad)],
    )
    kw = dict(vocab_size=16, head_cutoff=1.7, tail_cutoff=1.7)
    uni = {
        r.doc_id: (r.cross_entropy, r.bucket)
        for r in perplexity_buckets(docs, **kw).collect()
    }
    bi = {
        r.doc_id: (r.cross_entropy, r.bucket)
        for r in bigram_perplexity_buckets(docs, **kw).collect()
    }
    # unigram: salad is bit-identical to natural — both head
    assert uni[100][0] == uni[0][0]
    assert uni[0][1] == uni[100][1] == "head"
    # bigram: natural stays head, salad flips to tail
    assert bi[0][1] == "head"
    assert bi[100][1] == "tail", bi[100]
    assert bi[100][0] > bi[0][0]


def test_bigram_perplexity_unk_bounds_the_table(spark):
    """Out-of-vocabulary tokens map to ONE <unk> symbol before any
    counting, so rare-token spam cannot grow the bigram key space —
    and a doc of pure OOV noise still scores (through <unk>
    transitions), never drops."""
    from py_data_pipeline_app_spark.functions.frames import local_rows_df
    from py_data_pipeline_app_spark.operators.curation import (
        bigram_perplexity_buckets,
    )

    docs = local_rows_df(
        spark,
        "doc_id long, text string",
        [(i, "the cat sat on the mat") for i in range(8)]
        + [(200, "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8")],
    )
    out = {
        r.doc_id: r
        for r in bigram_perplexity_buckets(docs, vocab_size=4).collect()
    }
    assert out[200].n_tokens == 8  # every token scored
    assert out[200].cross_entropy is not None


def _lm_docs(spark):
    from py_data_pipeline_app_spark.functions.frames import local_rows_df

    return local_rows_df(
        spark,
        "doc_id long, text string",
        [(i, "the cat sat on the mat") for i in range(6)]
        + [(10, "the dog sat on the rug"), (11, "mat the on sat cat the"),
           (12, "zq zq zq zq"), (13, "")],
    )


def test_bigram_lm_frozen_matches_self_trained(spark, tmp_path):
    """Scoring a corpus against a model trained ON that corpus must be
    bit-identical to the self-trained mode — the persisted counts are
    the same integers the in-flight derivation produces."""
    from py_data_pipeline_app_spark.operators.curation import (
        bigram_lm_train,
        bigram_perplexity_buckets,
    )

    docs = _lm_docs(spark)
    path = str(tmp_path / "lm")
    manifest = bigram_lm_train(docs, path)
    assert manifest["total"] > 0 and manifest["vocab"]
    self_trained = sorted(
        map(tuple, bigram_perplexity_buckets(docs).collect())
    )
    frozen = sorted(
        map(tuple, bigram_perplexity_buckets(docs, bigram_lm=path).collect())
    )
    assert frozen == self_trained


def test_bigram_lm_scores_are_batch_independent(spark, tmp_path):
    """The frozen model's whole point: a document's score cannot depend
    on what batch it arrives with — scoring a feed in one piece equals
    scoring it split into arbitrary micro-batches (the append-vs-
    rebuild parity the streaming gate rides on). Self-trained scoring
    provably lacks this property (asserted too)."""
    from py_data_pipeline_app_spark.functions.frames import local_rows_df
    from py_data_pipeline_app_spark.operators.curation import (
        bigram_lm_train,
        bigram_perplexity_buckets,
    )

    path = str(tmp_path / "lm")
    bigram_lm_train(_lm_docs(spark), path)
    new = local_rows_df(
        spark,
        "doc_id long, text string",
        [(20, "the cat sat"), (21, "completely novel words here"),
         (22, "on the mat the cat sat"), (23, "zq the zq")],
    )
    whole = sorted(
        map(tuple, bigram_perplexity_buckets(new, bigram_lm=path).collect())
    )
    parts = []
    for lo, hi in ((20, 22), (22, 24)):
        part = new.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        parts += map(
            tuple, bigram_perplexity_buckets(part, bigram_lm=path).collect()
        )
    assert sorted(parts) == whole
    # the self-trained control: per-part scoring diverges from whole
    st_whole = sorted(map(tuple, bigram_perplexity_buckets(new).collect()))
    st_parts = []
    for lo, hi in ((20, 22), (22, 24)):
        part = new.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        st_parts += map(tuple, bigram_perplexity_buckets(part).collect())
    assert sorted(st_parts) != st_whole


def test_bigram_lm_floor_for_unseen_unk(spark, tmp_path):
    """A training corpus with FULL vocab coverage never counts <unk>;
    a scored batch's OOV token must then hit the add-one floor
    ln((1−λ)·1/total) (transitions) / ln(1/total) (first token), not a
    null that silently drops the token from the sum."""
    import math

    from py_data_pipeline_app_spark.functions.frames import local_rows_df
    from py_data_pipeline_app_spark.operators.curation import (
        bigram_lm_train,
        bigram_perplexity_buckets,
    )

    train = local_rows_df(
        spark, "doc_id long, text string", [(1, "a b a b")]
    )
    path = str(tmp_path / "lm")
    manifest = bigram_lm_train(train, path, vocab_size=8)
    assert manifest["total"] == 4  # a:2 b:2, no <unk> row anywhere
    out = bigram_perplexity_buckets(
        local_rows_df(spark, "doc_id long, text string", [(9, "a zzz")]),
        bigram_lm=path,
    ).collect()[0]
    lp_first = round(math.log(2 / 4), 6)  # 'a' scores pure unigram
    fl_back = round(math.log(0.3 * 1 / 4), 6)  # (a -> <unk>) floor
    want = round(-(lp_first + fl_back) / 2, 6)
    assert out.n_tokens == 2
    assert out.cross_entropy == want, (out.cross_entropy, want)


def test_bigram_lm_checksum_drift_raises(spark, tmp_path):
    """A model whose tables drifted from the manifest (partial rewrite,
    crashed retrain) must fail loudly at load — and verify=False (the
    streaming hot path) trusts the manifest without the two jobs."""
    import pytest as _pytest

    from py_data_pipeline_app_spark.operators.curation import (
        BIGRAM_LM_UNIGRAM,
        bigram_lm_frames,
        bigram_lm_train,
    )

    docs = _lm_docs(spark)
    path = str(tmp_path / "lm")
    bigram_lm_train(docs, path)
    uni = spark.read.parquet(f"{path}/{BIGRAM_LM_UNIGRAM}")
    doctored = uni.withColumn(
        "_cu", F.col("_cu") + F.lit(1)
    ).localCheckpoint()
    doctored.write.mode("overwrite").parquet(f"{path}/{BIGRAM_LM_UNIGRAM}")
    with _pytest.raises(ValueError, match="drifted"):
        bigram_lm_frames(spark, path)
    vocab, _, _ = bigram_lm_frames(spark, path, verify=False)
    assert vocab  # manifest still readable on the trusting path


def test_bigram_lm_train_empty_corpus_raises(spark, tmp_path):
    from py_data_pipeline_app_spark.functions.frames import local_rows_df
    from py_data_pipeline_app_spark.operators.curation import (
        bigram_lm_frames,
        bigram_lm_train,
    )
    import pytest as _pytest

    empty = local_rows_df(
        spark, "doc_id long, text string", [(1, ""), (2, None)]
    )
    path = str(tmp_path / "lm")
    with _pytest.raises(ValueError, match="no non-empty tokens"):
        bigram_lm_train(empty, path)
    # nothing committed: the manifest is the commit point
    with _pytest.raises(ValueError, match="manifest"):
        bigram_lm_frames(spark, path)


def test_bigram_perplexity_empty_corpus_returns_empty(spark):
    """A corpus with no non-empty tokens collects an EMPTY vocabulary —
    the map literal must stay typed (map<string,string>, not the
    map<null,null> an uncast F.array() infers, which fails analysis at
    element_at) and the result is simply the empty frame."""
    from py_data_pipeline_app_spark.functions.frames import local_rows_df
    from py_data_pipeline_app_spark.operators.curation import (
        bigram_perplexity_buckets,
    )

    docs = local_rows_df(
        spark, "doc_id long, text string", [(1, ""), (2, "   "), (3, None)]
    )
    out = bigram_perplexity_buckets(docs)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_tokens", "cross_entropy", "bucket", "kept",
    ]

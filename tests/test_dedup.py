"""Dedup operators: planted duplicates must be found, non-dups must
not, and the probabilistic regimes (LSH recall) behave as designed."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from py_data_pipeline_app_spark.functions.frames import local_rows_df
from py_data_pipeline_app_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_dup_pairs,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "The quick, brown fox JUMPS over the lazy dog!"),  # exact after norm
        (3, "dog lazy the over jumps fox brown quick the"),  # same word set, reordered
        (4, "an entirely different document about spark engines"),
        (5, "the quick brown fox jumps over the lazy cat"),  # near (1 word off)
        (6, "completely unrelated text with unique tokens zebra"),
    ]
    return local_rows_df(spark, "doc_id long, text string", rows)


def test_exact_dedup_groups_normalized_copies(corpus):
    out = exact_dedup(corpus).collect()
    groups = {r.canonical_id: r.n_copies for r in out}
    assert groups[1] == 2  # docs 1 and 2 normalize identically
    assert sum(groups.values()) == 6


def test_minhash_identical_sets_always_collide(corpus):
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(corpus, threshold=1.0).collect()
    }
    # 1, 2, 3 share the identical word set (after whitespace tokenising
    # doc 2 differs by punctuation => doc 2 tokens unequal). Doc1 vs 3:
    # same set => must be found. Pairs are exact-verified so no FPs.
    assert (1, 3) in pairs
    for a, b in pairs:
        assert a < b


def test_minhash_signature_identity_for_same_set(corpus):
    sigs = {r.doc_id: tuple(r)[1:] for r in minhash_signatures(corpus).collect()}
    assert sigs[1] == sigs[3]
    assert sigs[1] != sigs[4]


def test_lsh_candidates_superset_of_true_dups(corpus):
    sigs = minhash_signatures(corpus)
    cands = {
        (r.id_a, r.id_b) for r in lsh_candidate_pairs(sigs).collect()
    }
    assert (1, 3) in cands


def test_ngram_jaccard_finds_near_dup(corpus):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(corpus, n=3, threshold=0.5).collect()
    }
    # docs 1 and 5 share 6 of 7 trigram positions (distinct sets: 6 of 8)
    assert (1, 5) in pairs
    assert 0.5 <= pairs[(1, 5)] < 1.0
    assert (1, 4) not in pairs


def test_ngram_jaccard_max_df_drops_stop_shingles(spark):
    # shingle "a a a" appears in every doc; with max_df it contributes
    # no candidate pairs.
    rows = [(i, "a a a unique%d token%d word%d" % (i, i, i)) for i in range(6)]
    df = local_rows_df(spark, "doc_id long, text string", rows)
    no_cap = ngram_jaccard_pairs(df, n=3, threshold=0.01).count()
    capped = ngram_jaccard_pairs(df, n=3, threshold=0.01, max_df=3).count()
    assert no_cap > 0
    assert capped == 0


def test_simhash_hamming_zero_for_same_set(corpus):
    sh = {r.doc_id: r.simhash for r in simhash64(corpus).collect()}
    assert sh[1] == sh[3]  # same distinct-word set -> identical simhash
    assert sh[1] != sh[6]


def test_simhash_near_dup_pairs_block_and_verify(corpus):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup_pairs(corpus, max_hamming=3).collect()
    }
    assert pairs[(1, 3)] == 0
    assert (1, 6) not in pairs


def test_simhash_blocking_contract_vs_brute_force(corpus):
    # The operator's exact contract: a pair is emitted iff it agrees on
    # at least one 15-bit segment (pigeonhole blocking) AND its full
    # Hamming distance is within budget. Check against a brute-force
    # recomputation on the collected hashes.
    budget = 20
    sh = {r.doc_id: r.simhash for r in simhash64(corpus).collect()}
    expected = set()
    for a in sh:
        for b in sh:
            if a >= b:
                continue
            x = sh[a] ^ sh[b]
            hamming = bin(x).count("1")
            shares_segment = any(
                (sh[a] >> (15 * c)) & 0x7FFF == (sh[b] >> (15 * c)) & 0x7FFF
                for c in range(4)
            )
            if shares_segment and hamming <= budget:
                expected.add((a, b))
    got = {
        (r.id_a, r.id_b)
        for r in simhash_near_dup_pairs(corpus, max_hamming=budget).collect()
    }
    assert got == expected
    assert (1, 3) in got  # identical word sets: hamming 0, always found


def test_viral_bucket_arrays_are_bounded(spark):
    # A planted ~50k-member bucket must never materialize as one
    # collect_list row: chunk arrays stay near max_bucket_size, every
    # chunk-internal pair is produced, and small buckets are untouched.
    from py_data_pipeline_app_spark.operators.dedup import (
        _bucket_member_pairs,
        _chunked_bucket_arrays,
    )

    members = spark.range(50_000).select(
        F.lit("viral").alias("bucket"), F.col("id").alias("member")
    ).union(
        spark.range(10).select(F.lit("small").alias("bucket"), F.col("id").alias("member"))
    )
    cap = 100
    chunks = _chunked_bucket_arrays(
        members, ["bucket"], "member", max_bucket_size=cap
    ).select(
        "bucket", F.size("_ms").alias("n"), F.col("_ms").alias("ms")
    )
    sizes = chunks.groupBy("bucket").agg(
        F.max("n").alias("mx"), F.sum("n").alias("total"), F.count("*").alias("k")
    ).collect()
    by_bucket = {r.bucket: r for r in sizes}
    # hash-salting: chunk sizes concentrate around the cap (binomial
    # tail, not O(n)); 3x the cap is far beyond any realistic deviation
    assert by_bucket["viral"].mx <= 3 * cap
    assert by_bucket["viral"].total == 50_000
    assert by_bucket["viral"].k == 500
    # the small bucket is a single untouched chunk == old semantics
    assert by_bucket["small"].k == 1 and by_bucket["small"].mx == 10

    # pair expansion matches sum over chunks of C(size, 2)
    expected_pairs = chunks.select(
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p")
    ).collect()[0].p
    got = _bucket_member_pairs(
        members, ["bucket"], "member", max_bucket_size=cap
    ).count()
    assert got == int(expected_pairs)


def test_connected_components_merges_chains(spark):
    from py_data_pipeline_app_spark.operators.dedup import connected_components

    # chain 1-2-3 (no direct 1-3 edge), pair 10-11, isolated-pair 20-21
    edges = local_rows_df(
        spark, "id_a long, id_b long", [(2, 1), (2, 3), (10, 11), (21, 20)]
    )
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_long_path(spark):
    from py_data_pipeline_app_spark.operators.dedup import connected_components

    # a 12-node path stresses multi-round propagation (diameter 11)
    edges = local_rows_df(
        spark, "id_a long, id_b long", [(i, i + 1) for i in range(11, 0, -1)]
    )
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert set(got.values()) == {1}
    assert len(got) == 12


@pytest.mark.oracle
def test_connected_components_star_parity(spark):
    """The O(log n) large-star/small-star variant must produce the
    exact same (node, component) labeling as min-label propagation on
    chains, stars, random graphs, and the empty graph."""
    import random

    from py_data_pipeline_app_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(13)
    random_edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(50)
    ]
    cases = [
        [(2, 1), (2, 3), (10, 11), (21, 20)],                    # chain + pairs
        [(i, i + 1) for i in range(23, 0, -1)],                  # 24-node path
        [(0, i) for i in range(1, 9)],                           # star
        [e for e in random_edges if e[0] != e[1]],               # random
    ]
    for edges in cases:
        df = local_rows_df(spark, "id_a long, id_b long", edges)
        base = {r.node: r.comp for r in connected_components(df).collect()}
        star = {r.node: r.comp for r in connected_components_star(df).collect()}
        assert star == base, edges[:4]
    empty = local_rows_df(spark, "id_a long, id_b long", [])
    assert connected_components_star(empty).count() == 0


def test_connected_components_star_beats_diameter_bound(spark):
    """On a 40-node path the star variant converges within ~log2(n)
    rounds — min-label propagation would need 39; max_iter=8 proves
    the geometric halving actually happens."""
    from py_data_pipeline_app_spark.operators.dedup import (
        connected_components_star,
    )

    edges = local_rows_df(
        spark, "id_a long, id_b long", [(i, i + 1) for i in range(39, 0, -1)]
    )
    got = {
        r.node: r.comp
        for r in connected_components_star(edges, max_iter=8).collect()
    }
    assert set(got.values()) == {1}
    assert len(got) == 40


def test_cross_corpus_ngram_jaccard_matches_python_model(spark):
    """Cross-corpus pairs only (never left×left or right×right), with
    trigram-set Jaccard verified against an independent python model."""
    from py_data_pipeline_app_spark.operators.dedup import (
        cross_corpus_ngram_jaccard,
    )

    left_rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "completely unrelated content about spark plans"),
    ]
    right_rows = [
        (101, "the quick brown fox jumps over the lazy dog tonight"),
        (102, "pack my box with five dozen liquor jugs"),
        (103, "sphinx of black quartz judge my vow"),
    ]
    left = local_rows_df(spark, "doc_id long, text string", left_rows)
    right = local_rows_df(spark, "doc_id long, text string", right_rows)
    got = {
        (r.id_left, r.id_right): r.jaccard
        for r in cross_corpus_ngram_jaccard(
            left, right, n=3, threshold=0.3
        ).collect()
    }

    def tri(text):
        ws = text.split()
        if len(ws) < 3:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    expected = {}
    for lid, lt in left_rows:
        for rid, rt in right_rows:
            a, b = tri(lt), tri(rt)
            j = len(a & b) / len(a | b)
            if j >= 0.3:
                expected[(lid, rid)] = round(j, 6)
    assert expected, "fixture must produce at least one pair"
    assert got == expected
    # the exact duplicate pair scores 1.0; the superset pair is partial
    assert got[(2, 102)] == 1.0
    assert 0.3 <= got[(1, 101)] < 1.0


def test_cluster_canonicals_picks_best_quality_not_lowest_id(spark):
    """The canonical must be the highest-SCORING cluster member even
    when it is not the lowest id (the policy difference vs the kept
    flags), ties broken to the lowest id; docs in no pair are their
    own singleton canonical."""
    from py_data_pipeline_app_spark.functions.frames import local_rows_df
    from py_data_pipeline_app_spark.operators.dedup import cluster_canonicals

    docs = local_rows_df(
        spark, "doc_id long", [(1,), (2,), (3,), (7,), (8,), (9,)]
    )
    # chain cluster {1,2,3} (1-2, 2-3), pair cluster {7,8}, singleton 9
    pairs = local_rows_df(
        spark,
        "id_a long, id_b long",
        [(1, 2), (2, 3), (7, 8)],
    )
    scores = local_rows_df(
        spark,
        "doc_id long, quality_z double",
        [(1, 0.1), (2, 0.9), (3, 0.5), (7, 0.4), (8, 0.4), (9, -1.0)],
    )
    out = {
        r.doc_id: r for r in cluster_canonicals(docs, pairs, scores).collect()
    }
    assert out[1].canonical_id == 2 and not out[1].is_canonical
    assert out[2].canonical_id == 2 and out[2].is_canonical
    assert out[3].canonical_id == 2
    assert {out[1].component_id, out[2].component_id, out[3].component_id} == {1}
    # tie at 0.4 -> lowest id wins
    assert out[7].canonical_id == 7 and out[7].is_canonical
    assert out[8].canonical_id == 7 and not out[8].is_canonical
    # singleton is its own canonical
    assert out[9].component_id == 9 and out[9].is_canonical


def test_cluster_canonicals_string_ids(spark):
    """id_col is generic: string doc keys (the common shape for crawl
    corpora) must work through the argmax and the tie-break — the
    min(struct(-score, id)) form never negates the id."""
    from py_data_pipeline_app_spark.functions.frames import local_rows_df
    from py_data_pipeline_app_spark.operators.dedup import cluster_canonicals

    docs = local_rows_df(
        spark, "doc_id string", [("a",), ("b",), ("c",), ("z",)]
    )
    pairs = local_rows_df(
        spark, "id_a string, id_b string", [("a", "b"), ("b", "c")]
    )
    scores = local_rows_df(
        spark,
        "doc_id string, quality_z double",
        [("a", 0.2), ("b", 0.7), ("c", 0.7), ("z", 0.0)],
    )
    out = {
        r.doc_id: r for r in cluster_canonicals(docs, pairs, scores).collect()
    }
    # tie at 0.7 between b and c -> lexicographically lowest id wins
    assert out["a"].canonical_id == "b" and not out["a"].is_canonical
    assert out["b"].is_canonical and out["c"].canonical_id == "b"
    assert out["z"].is_canonical and out["z"].component_id == "z"

"""Round-8 additions: n-gram containment, boilerplate line strip,
winnowing fingerprints, hard-negative mining."""

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from py_data_pipeline_app_spark.functions.text import winnowing_fingerprints
from py_data_pipeline_app_spark.operators.curation import boilerplate_strip
from py_data_pipeline_app_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from py_data_pipeline_app_spark.operators.similarity import hard_negative_topk


# ---------------------------------------------------------------------------
# n-gram containment
# ---------------------------------------------------------------------------

_LONG = "the quick brown fox jumps over the lazy dog while rain falls on the quiet hills tonight"


def test_containment_catches_prefix_copy_jaccard_misses(spark):
    words = _LONG.split()
    prefix = " ".join(words[:8])  # 40% prefix
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=_LONG), Row(doc_id=2, text=prefix)]
    )
    cont = ngram_containment_pairs(docs, n=3, threshold=0.8).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r.id_a, r.id_b) == (1, 2)
    # every trigram of the prefix is in the long doc
    assert r.containment == 1.0
    # but Jaccard is low: 6 shared trigrams / 15 long-doc trigrams
    assert r.jaccard < 0.5
    jac = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert jac == []  # the registered jaccard pass is blind to it


def test_containment_formula_matches_python_model(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "gamma delta epsilon zeta lambda mu nu xi omicron pi"
    docs = spark.createDataFrame([Row(doc_id=1, text=a), Row(doc_id=2, text=b)])

    def tri(s):
        w = s.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    inter = len(tri(a) & tri(b))
    expect_c = inter / min(len(tri(a)), len(tri(b)))
    expect_j = inter / len(tri(a) | tri(b))
    got = ngram_containment_pairs(docs, n=3, threshold=0.0).collect()
    assert len(got) == 1
    assert abs(got[0].containment - expect_c) < 1e-6
    assert abs(got[0].jaccard - expect_j) < 1e-6


# ---------------------------------------------------------------------------
# boilerplate strip
# ---------------------------------------------------------------------------


def _mk_docs(spark):
    banner = "Accept cookies to continue"
    rows = [
        Row(doc_id=1, source="s1", text=f"{banner}\nreal content one\n\nmore one"),
        Row(doc_id=2, source="s1", text=f"{banner}\nreal content two"),
        Row(doc_id=3, source="s1", text=f"real content three\n{banner}"),
        # same banner but in a DIFFERENT source, below min_df there
        Row(doc_id=4, source="s2", text=f"{banner}\nother site content"),
        Row(doc_id=5, source="s2", text="plain doc"),
        # doc that is nothing but boilerplate
        Row(doc_id=6, source="s1", text=banner),
    ]
    return spark.createDataFrame(rows)


def test_boilerplate_stripped_per_source(spark):
    out = {r.doc_id: r for r in boilerplate_strip(_mk_docs(spark), min_df=3).collect()}
    assert out[1].text_clean == "real content one\n\nmore one"
    assert out[2].text_clean == "real content two"
    assert out[3].text_clean == "real content three"
    # s2 has df=1 for the banner -> kept there (per-source scoping)
    assert out[4].text_clean == "Accept cookies to continue\nother site content"
    assert out[5].text_clean == "plain doc"
    # all-boilerplate doc strips to empty
    assert out[6].text_clean == ""
    assert out[6].n_lines == 1 and out[6].n_kept == 0
    # counts: doc 1 has 4 lines, keeps 3 (blank separator always kept)
    assert out[1].n_lines == 4 and out[1].n_kept == 3


def test_boilerplate_normalized_matching_and_drop_all(spark):
    # case/whitespace variants of the same line count as one template
    rows = [
        Row(doc_id=1, source="s", text="ACCEPT   cookies TO continue\nbody a"),
        Row(doc_id=2, source="s", text="accept cookies to continue\nbody b"),
        Row(doc_id=3, source="s", text="Accept Cookies To Continue\nbody c"),
    ]
    out = {
        r.doc_id: r
        for r in boilerplate_strip(spark.createDataFrame(rows), min_df=3).collect()
    }
    # drop-ALL semantics: no first-occurrence survivor
    assert [out[i].text_clean for i in (1, 2, 3)] == ["body a", "body b", "body c"]


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------


def _py_winnow(text, gram=16, window=32):
    import re

    norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    m = max(len(norm) - gram + 1, 1)
    hashes = [
        int(hashlib.md5(norm[i : i + gram].encode()).hexdigest()[:15], 16)
        for i in range(m)
    ]
    if len(hashes) <= window:
        return {min(hashes)}
    return {
        min(hashes[p - window : p]) for p in range(window, len(hashes) + 1)
    }


def test_winnowing_matches_python_model(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog again and again tonight.",
        "short",
        "a" * 100,
        "Numbers 12345 and punctuation!!! collapse, as; expected -- here.",
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {}
    for r in winnowing_fingerprints(docs, gram=16, window=32).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for i, t in enumerate(texts):
        assert got[i] == _py_winnow(t), f"doc {i}"


def test_winnowing_shared_passage_guarantees_shared_fp(spark):
    shared = "this exact passage is long enough to span a full winnowing window easily"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"unique prefix one {shared} unique suffix alpha"),
            Row(doc_id=2, text=f"totally different opening {shared} other ending"),
        ]
    )
    fps = {}
    for r in winnowing_fingerprints(docs).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    # a passage >= window+gram-1 chars forces at least one common pick
    assert len(shared) >= 32 + 16 - 1
    assert fps[1] & fps[2]


# ---------------------------------------------------------------------------
# hard negatives
# ---------------------------------------------------------------------------


def test_hard_negatives_exclude_same_label_and_rank_correctly(spark):
    rows = []
    for i, (lab, vec) in enumerate(
        [
            (0, [1.0, 0.0]),
            (0, [0.9, 0.1]),
            (1, [0.8, 0.2]),
            (1, [0.0, 1.0]),
            (2, [0.7, 0.7]),
        ]
    ):
        rows.append(Row(vec_id=i, embedding=vec, label=lab))
    emb = spark.createDataFrame(rows)
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    got = hard_negative_topk(emb, queries, k=2).collect()
    # label-0 corpus rows (ids 0,1) are excluded; nearest different-label
    # to [1,0] is id 2 ([0.8,0.2]), then id 4 ([0.7,0.7])
    assert [(r.vec_id, r.rank) for r in sorted(got, key=lambda r: r.rank)] == [
        (2, 1),
        (4, 2),
    ]
    assert all(r.score <= 1.0 for r in got)


def test_winnowing_overlap_pairs_shared_passage(spark):
    from py_data_pipeline_app_spark.operators.dedup import winnowing_overlap_pairs

    shared = (
        "a genuinely long shared passage that runs well past one full "
        "winnowing window so several fingerprints must coincide between the two"
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"first document opening {shared} first ending"),
            Row(doc_id=2, text=f"second document different start {shared} tail two"),
            Row(doc_id=3, text="entirely unrelated text with no common passage at all"),
        ]
    )
    pairs = winnowing_overlap_pairs(docs, min_shared=3, max_df=None).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert pairs[0].n_shared >= 3

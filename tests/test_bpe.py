"""Iterative BPE trainer: property-matched against a pure-Python
reference implementation (greedy left-to-right merge application,
count-desc/pair-asc tie-break), determinism, marker-char guard,
and the registered wrapper's schema."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from py_data_pipeline_app_spark.functions.frames import local_rows_df
from py_data_pipeline_app_spark.operators.curation import (
    bpe_merge_table,
    bpe_train,
)


def py_bpe(texts, n_merges):
    """Reference BPE over word symbols: count adjacent pairs, take the
    most frequent (ties lexicographic), merge greedily left-to-right,
    repeat."""
    docs = [t.split() for t in texts]
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for d in docs:
            for a, b in zip(d, d[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, n))
        new_docs = []
        for d in docs:
            out, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == a and d[i + 1] == b:
                    out.append(a + " " + b)
                    i += 2
                else:
                    out.append(d[i])
                    i += 1
            new_docs.append(out)
        docs = new_docs
    return merges


def _df(spark, texts):
    return local_rows_df(
        spark, "doc_id long, text string", list(enumerate(texts))
    )


def test_matches_reference_with_overlaps(spark):
    texts = [
        "the cat sat on the mat",
        "the cat sat on the cat",
        "a cat a cat a cat a",
        "the the the the",  # self-overlapping run: greedy pairs floor(4/2)
        "on the mat sat the cat",
    ]
    assert bpe_train(_df(spark, texts), n_merges=6) == py_bpe(texts, 6)


def test_merged_symbols_remerge(spark):
    # round 2's winner contains round 1's merge — the iterative part
    texts = ["x y z"] * 4 + ["x y q"]
    got = bpe_train(_df(spark, texts), n_merges=2)
    assert got == [(1, "x", "y", 5), (2, "x y", "z", 4)]


def test_terminates_when_trained_out(spark):
    texts = ["a b", "c d"]
    got = bpe_train(_df(spark, texts), n_merges=10)
    # 2 merges collapse both docs to single symbols; loop stops loudly
    # short of n_merges instead of looping on nothing
    assert len(got) == 2


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_property_matches_reference(spark, texts):
    assert bpe_train(_df(spark, texts), n_merges=4) == py_bpe(texts, 4)


def test_deterministic(spark):
    texts = ["p q p q r", "q p q p r", "r r r"]
    a = bpe_train(_df(spark, texts), n_merges=5)
    b = bpe_train(_df(spark, texts), n_merges=5)
    assert a == b


def test_marker_chars_refused(spark):
    with pytest.raises(ValueError, match="marker"):
        bpe_train(_df(spark, ["bad ‹token› here"]), n_merges=1)


def test_merge_table_frame(spark):
    df = bpe_merge_table(_df(spark, ["u v u v", "u v w"]), n_merges=2)
    assert df.columns == [
        "merge_rank",
        "left_sym",
        "right_sym",
        "n_occurrences",
    ]
    rows = [tuple(r) for r in df.collect()]
    assert rows[0] == (1, "u", "v", 3)


def test_apply_reproduces_training_fixpoint(spark):
    """Encoding the TRAINING corpus with the trained merge table must
    land exactly on the trainer's final state (the defining property
    of BPE application), including merged-symbol re-merges."""
    from py_data_pipeline_app_spark.operators.curation import bpe_apply

    texts = [
        "the cat sat on the mat",
        "the cat sat on the cat",
        "a cat a cat a cat a",
        "the the the the",
    ]

    def py_apply(texts, merges):
        out = []
        for t in texts:
            d = t.split()
            for _, a, b, _ in merges:
                nd, i = [], 0
                while i < len(d):
                    if i + 1 < len(d) and d[i] == a and d[i + 1] == b:
                        nd.append(a + " " + b)
                        i += 2
                    else:
                        nd.append(d[i])
                        i += 1
                d = nd
            out.append(d)
        return out

    df = _df(spark, texts)
    merges = bpe_train(df, n_merges=4)
    got = {
        r.doc_id: (list(r.symbols), r.n_symbols, r.n_tokens)
        for r in bpe_apply(df, merges).collect()
    }
    want = py_apply(texts, merges)
    for i, t in enumerate(texts):
        syms, n_syms, n_toks = got[i]
        assert syms == want[i], (i, syms, want[i])
        assert n_syms == len(want[i])
        assert n_toks == len(t.split())


def test_apply_to_unseen_text(spark):
    """The tokenizer use case: merges trained on one corpus encode NEW
    text; unseen symbols pass through unmerged."""
    from py_data_pipeline_app_spark.operators.curation import bpe_apply

    train = _df(spark, ["x y z"] * 3)
    merges = bpe_train(train, n_merges=2)  # (x,y) then (x y,z)
    new = _df(spark, ["x y z w x y", "w w"])
    got = {r.doc_id: list(r.symbols) for r in bpe_apply(new, merges).collect()}
    assert got[0] == ["x y z", "w", "x y"]
    assert got[1] == ["w", "w"]

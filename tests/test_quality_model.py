"""Weak-label quality classifier: feature correctness against a Python
model, junk/prose separation on held-out documents, determinism."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from py_data_pipeline_app_spark.functions.frames import local_rows_df
from py_data_pipeline_app_spark.operators.quality_model import (
    quality_feature_frame,
    score_quality,
    train_quality_classifier,
)

CLEAN = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a gentle breeze carried the scent of rain across the open field",
    "she walked slowly through the quiet garden admiring every flower",
]
JUNK = [
    "buy buy buy buy buy buy buy buy buy buy buy buy",
    "zzz1 zzz2 zzz3 zzz4 zzz5 zzz6 zzz7 zzz8 999 888 777 666",
    "!!! ### $$$ %%% &&& *** ((( ))) @@@ ^^^ ~~~ |||",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(60):
        rows.append((i, CLEAN[i % len(CLEAN)] + f" sentence variant {i % 7}"))
    for i in range(60, 90):
        rows.append((i, JUNK[i % len(JUNK)]))
    return local_rows_df(spark, "doc_id long, text string", rows)


def test_features_match_python_model(spark):
    df = local_rows_df(
        spark, "doc_id long, text string", [(1, "aa bb aa cc 12 !!")]
    )
    r = quality_feature_frame(df).collect()[0]
    import math

    toks = ["aa", "bb", "aa", "cc", "12", "!!"]
    n = len(toks)
    assert abs(r.f_log_tokens - math.log(n + 1)) < 1e-9
    assert abs(r.f_distinct_ratio - 5 / 6) < 1e-9
    text = "aa bb aa cc 12 !!"
    punct = sum(1 for c in text if not (c.isalnum() or c.isspace()))
    digits = sum(1 for c in text if c.isdigit())
    assert abs(r.f_punct_share - punct / len(text)) < 1e-9
    assert abs(r.f_digit_share - digits / len(text)) < 1e-9
    c2 = 2 * 2 + 1 + 1 + 1 + 1
    assert abs(r.f_simpson - (1 - c2 / (n * n))) < 1e-9


def test_classifier_separates_heldout_junk(spark, corpus):
    """Train on even ids, score odd ids: planted junk must score below
    clean prose on documents the classifier never saw."""
    train = corpus.filter(F.col("doc_id") % 2 == 0)
    test = corpus.filter(F.col("doc_id") % 2 == 1)
    model = train_quality_classifier(train, vocab_size=16)
    scores = {r.doc_id: r.quality_prob for r in score_quality(model, test).collect()}
    clean_scores = [v for k, v in scores.items() if k < 60]
    junk_scores = [v for k, v in scores.items() if k >= 60]
    avg_clean = sum(clean_scores) / len(clean_scores)
    avg_junk = sum(junk_scores) / len(junk_scores)
    assert avg_clean > avg_junk + 0.2, (avg_clean, avg_junk)
    # threshold-free ranking quality: AUC of clean-above-junk pairs —
    # weak labels mislabel some docs, so probability CALIBRATION at 0.5
    # is not the contract; the ranking is
    pairs = [(c, j) for c in clean_scores for j in junk_scores]
    auc = sum(1.0 if c > j else 0.5 if c == j else 0.0 for c, j in pairs) / len(pairs)
    assert auc >= 0.8, auc


@pytest.mark.oracle
def test_training_is_deterministic(spark, corpus):
    m1 = train_quality_classifier(corpus, vocab_size=16)
    m2 = train_quality_classifier(corpus, vocab_size=16)
    c1 = [round(float(x), 9) for x in m1.coefficients]
    c2 = [round(float(x), 9) for x in m2.coefficients]
    assert c1 == c2


def test_linear_scorer_reproduces_model_decisions(spark, corpus):
    """Pin a fit's coefficients into score_quality_linear: its z>0
    decision must reproduce the model's prob>=0.5 decision everywhere
    except within the 6dp feature-rounding band around the boundary."""
    from py_data_pipeline_app_spark.operators.quality_model import (
        FEATURE_COLS,
        score_quality_linear,
    )

    model = train_quality_classifier(corpus, vocab_size=16)
    weights = dict(zip(FEATURE_COLS, (float(c) for c in model.coefficients)))
    probs = {r.doc_id: r.quality_prob for r in score_quality(model, corpus).collect()}
    lin = {
        r.doc_id: r
        for r in score_quality_linear(
            corpus, weights=weights, bias=float(model.intercept)
        ).collect()
    }
    assert set(lin) == set(probs)
    for doc_id, r in lin.items():
        if abs(r.quality_z) > 1e-3:
            assert r.predicted_good == (probs[doc_id] >= 0.5), (
                doc_id,
                r.quality_z,
                probs[doc_id],
            )


def test_linear_scorer_is_shuffle_free(spark, corpus):
    """The deployed scorer is a projection: no Exchange in the plan."""
    import contextlib
    import io

    from py_data_pipeline_app_spark.operators.quality_model import (
        score_quality_linear,
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        score_quality_linear(corpus).explain(mode="simple")
    assert "Exchange" not in buf.getvalue()

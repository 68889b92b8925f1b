"""JSONL corpus source: schema projection, rejects channel, roundtrip."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import types as T

from py_data_pipeline_app_spark.sources.jsonl import read_jsonl, write_jsonl

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


@pytest.fixture()
def corpus_path(tmp_path):
    p = tmp_path / "corpus.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en"}',
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
        "this is not json at all",
        '{"doc_id": 3, "text": "unterminated',
        '{"doc_id": 4, "text": "ok", "lang": "de", "extra": "ignored"}',
    ]
    p.write_text("\n".join(lines))
    return str(p)


def test_read_jsonl_splits_good_and_rejects(spark, corpus_path):
    good, rejects = read_jsonl(spark, corpus_path, SCHEMA)
    rows = {r.doc_id: r for r in good.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1].text == "hello world" and rows[2].lang == "fr"
    assert good.columns == ["doc_id", "text", "lang"]  # extra field pruned
    bad = [r.raw_line for r in rejects.collect()]
    assert len(bad) == 2
    assert "not json" in bad[0] or "not json" in bad[1]


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", "en"), (2, "beta", "fr")], SCHEMA
    )
    out = os.path.join(tempfile.mkdtemp(dir=tmp_path), "out")
    write_jsonl(df, out)
    good, rejects = read_jsonl(spark, out, SCHEMA)
    assert rejects.count() == 0
    assert {(r.doc_id, r.text, r.lang) for r in good.collect()} == {
        (1, "alpha", "en"),
        (2, "beta", "fr"),
    }

"""§2.9 escape hatch: the Arrow-batched custom-transform API reproduces
native-function results exactly — capability parity, with the native
path remaining the default."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from py_data_pipeline_app_spark.functions.custom import (
    grouped_transform,
    vectorized_scalar,
    vectorized_transform,
)
from py_data_pipeline_app_spark.operators.parse import parse_customer_blob

BLOBS = [
    "{C0001_Ann Lee_a@x.com_1990-01-02_12 Elm St_43899.65}",
    "  {C0002_Bo_b@y.org_1985-03-04_9 Oak Av_43900.1}  ",
    "{C0003_Cy_c@z.net_1970-11-30_7 Pine Rd_43901.2_extra_underscores}",
    "C0004_no_braces_at_all_x_y",
    "{too_few_fields}",
    "",
    "{C0005_Di_d@w.io_2000-12-31_1 Fir Ln_44000.9}",
]


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(
        [(b, i) for i, b in enumerate(BLOBS)], "raw string, _sheet_pos long"
    )


def test_vectorized_transform_parity_with_native_parse(raw):
    def _parse_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
        # reference-shaped per-line parse (app.py:94-104) in pandas;
        # defined in-test so cloudpickle ships it by value to workers
        out = []
        for raw_line, pos in zip(pdf["raw"], pdf["_sheet_pos"]):
            line = str(raw_line).strip()
            if not (line.startswith("{") and line.endswith("}") and len(line) >= 2):
                continue
            parts = line[1:-1].split("_", 5)
            if len(parts) != 6:
                continue
            out.append(parts + [pos])
        return pd.DataFrame(
            out,
            columns=[
                "customer_id", "name", "email", "dob", "address",
                "created_date", "_sheet_pos",
            ],
        )

    native, _ = parse_customer_blob(raw)
    hatch = vectorized_transform(
        raw,
        _parse_pdf,
        "customer_id string, name string, email string, dob string, "
        "address string, created_date string, _sheet_pos long",
    )
    key = lambda d: d["_sheet_pos"]
    assert sorted((r.asDict() for r in native.collect()), key=key) == sorted(
        (r.asDict() for r in hatch.collect()), key=key
    )


def test_vectorized_scalar_parity_with_native_cast(spark):
    df = spark.createDataFrame(
        [("1.50",), ("2.25",), ("garbage",), (None,)], "amount string"
    )
    to_double = vectorized_scalar(
        lambda s: pd.to_numeric(s, errors="coerce"), "double"
    )
    out = df.select(
        F.col("amount").try_cast("double").alias("native"),
        to_double("amount").alias("hatch"),
    ).collect()
    for r in out:
        assert r.native == r.hatch or (r.native is None and r.hatch is None)


def test_grouped_transform_parity_with_native_agg(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 7.0), ("b", 0.5)],
        "k string, v double",
    )

    def total(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "total": [pdf["v"].sum()]})

    hatch = {r.k: r.total for r in grouped_transform(df, ["k"], total, "k string, total double").collect()}
    native = {r.k: r.total for r in df.groupBy("k").agg(F.sum("v").alias("total")).collect()}
    assert hatch == native

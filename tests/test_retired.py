"""Retired-query gate: queries retired from the driver-facing registry
(round-9 headroom — the rotation invariant caps the registry at
2×gate_cap) keep their full DuckDB oracles and are value-checked here
on every pytest run instead of the driver's per-round prefix. Same
compare as tools/check_oracle.py: row count + column names +
order-insensitive multiset of normalized rows.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

from py_data_pipeline_app_spark.plans.queries import (
    QUERIES,
    RETIRED_ORACLES,
    RETIRED_QUERIES,
)
from py_data_pipeline_app_spark.schemas import TESTDATA_TABLES


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            v = 0.0
        return f"{v:.9g}"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def test_retired_disjoint_from_registry():
    assert not set(RETIRED_QUERIES) & set(QUERIES)
    # every retired query keeps a full value-check oracle
    assert set(RETIRED_ORACLES) == set(RETIRED_QUERIES)


@pytest.mark.oracle
@pytest.mark.parametrize("name", sorted(RETIRED_QUERIES))
def test_retired_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = RETIRED_QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(RETIRED_ORACLES[name])
    dcols = [c.lower() for c in rel.columns]
    drows = [tuple(r) for r in rel.fetchall()]

    assert sorted(scols) == sorted(dcols), name
    assert len(srows) == len(drows), name
    assert _norm_rows(scols, srows) == _norm_rows(dcols, drows), name

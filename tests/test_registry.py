"""Registry contract smoke: every registered query must build a plan
and execute at sf0.001, and every oracle key must name a registered
query — catches entries that would only crash inside the driver's
correctness gate."""

from __future__ import annotations

import pytest

from py_data_pipeline_app_spark.plans.queries import ORACLES, QUERIES


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_every_query_has_an_oracle():
    # current contract: full value-check coverage, zero rows-only rows
    assert sorted(set(QUERIES) - set(ORACLES)) == []


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_executes(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0, name

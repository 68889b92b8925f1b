"""Parquet sources for the driver testdata and engine warehouse.

Parquet is the engine's at-scale storage format: columnar, splittable,
predicate-pushdown- and column-pruning-friendly. Every query should show
``PushedFilters`` / a narrow ``ReadSchema`` in ``.explain("formatted")``
when it filters/projects (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from py_data_pipeline_app_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver's testdata was written with TIMESTAMP(NANOS) parquet columns,
# which Spark has no native type for. We read them as raw nanos longs
# (legacy conf) and convert to micros timestamps — same floor-division
# truncation DuckDB applies when it reads nanos into its micros TIMESTAMP,
# so oracle comparisons agree. On the engine's own warehouse (micros
# parquet) none of this triggers.
_NANOS_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one testdata table. Plain ``spark.read.parquet`` — scan-level
    pruning/pushdown is Catalyst's job; we must not materialize or cache
    eagerly here."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 — conf may be locked; reads then fail loudly
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        dtype = dict(df.dtypes).get(col)
        if dtype == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register the testdata tables as temp views for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)

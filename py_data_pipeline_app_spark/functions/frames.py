"""Small driver-literal DataFrames without Python-worker tasks.

``spark.createDataFrame(rows, schema)`` backs the frame with a
parallelized Python RDD sliced to ``defaultParallelism`` partitions.
Every execution of that plan — even under ``coalesce(1)`` — evaluates
all slices through Python workers, which costs ~4-5 s of fixed
per-action overhead on a 32-core local master (measured: a one-row
config-manifest parquet write dropped 4.7 s → 0.25 s with this
helper). The index builders write such manifests on every build, so
the overhead was the single largest fixed cost in the registered
index queries.

:func:`local_rows_df` instead renders the rows as ONE JVM-side
expression — ``inline(array(struct(...), ...))`` over a
single-partition ``range(1)`` — so the plan is a pure-JVM projection:
no Python task, no RDD scan, and Catalyst folds it to a local
relation. Intended for SMALL driver-known tables (config manifests,
anchor/segment label frames, trained centroid tables — tens to a few
thousand cells); large literals belong in parquet, and per-element
``F.lit`` composition of big matrices has its own cost story (see
``similarity.float_matrix_lit``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, _parse_datatype_string


def local_rows_df(
    spark: SparkSession, schema: str | StructType, rows: list[tuple]
) -> DataFrame:
    """DataFrame of driver-local ``rows`` under a DDL-string or
    ``StructType`` schema, built as a single JVM-side literal
    expression (zero Python tasks at execution — see module
    docstring). ``None`` cells become typed nulls; every cell is cast
    to its schema type, so names and types are identical to the
    ``createDataFrame`` equivalent. Nullability may be TIGHTER
    (non-null literal cells type non-nullable where createDataFrame
    marks everything nullable) — safe anywhere a nullable field is
    accepted, and parquet round-trips read back nullable either way.
    Empty ``rows`` yields an empty frame of the same shape, still with
    zero Python tasks (a ``limit(0)`` over one null-struct row)."""
    dt = schema if isinstance(schema, StructType) else _parse_datatype_string(schema)
    fields = dt.fields
    if not rows:
        nulls = F.struct(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in fields]
        )
        return spark.range(0, 1, 1, 1).select(F.inline(F.array(nulls))).limit(0)
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(r, fields)
            ]
        )
        for r in rows
    ]
    return spark.range(0, 1, 1, 1).select(F.inline(F.array(*structs)))

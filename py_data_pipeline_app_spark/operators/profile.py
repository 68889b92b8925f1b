"""One-pass column profiling: per-column presence / null / distinct /
min / max stats in a SINGLE aggregation job (extension — the
reference's pandas app profiles nothing; this is the ``ANALYZE
TABLE``-shaped operator every warehouse-scale ingest needs before
trusting a new drop of data).

Shape: one ``agg`` carrying every per-column expression at once, then
an ``unpivot`` (``stack``) of the single result row into one row per
column. The whole profile is ONE scan + one (tiny) aggregation —
adding columns widens the aggregation buffer, it does not add jobs or
scans. Min/max are computed on the NATIVE type (string min of a
numeric column would compare lexically: "10" < "9") and stringified
only afterwards, through the repo's decimal(18,6) convention so Spark
and DuckDB render doubles identically.

Distinct counts: ``exact=True`` uses ``count(DISTINCT col)`` — with
several distinct aggregates in one job Catalyst plans an ``Expand``
(input replicated once per distinct column +1). Exact is what the
cross-engine oracle can verify, so the registered query pins it, and
at sf0.1 the expand factor is harmless. At 100 TB flip ``exact=False``:
``approx_count_distinct`` (HyperLogLog++) folds into the ordinary
partial-aggregate path — no Expand, no extra shuffle, rsd-bounded
error — which is the same swap the ``event_user_distinct`` query
documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _stringify(col: F.Column, dtype: T.DataType) -> F.Column:
    """Render a min/max value as a cross-engine-deterministic string.
    Doubles/floats go through decimal(18,6) (Java's 1.0E7 vs DuckDB's
    10000000.0 otherwise disagree); timestamps through a fixed
    second-resolution format; everything else casts directly."""
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return col.cast("decimal(18,6)").cast("string")
    if isinstance(dtype, T.TimestampType):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def profile_columns(
    df: DataFrame,
    cols: list[str],
    *,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``cols`` of ``df`` in one aggregation job. Returns one
    row per column: (column_name, n_present, n_null, n_distinct,
    min_value, max_value) with min/max stringified deterministically.
    ``exact=False`` swaps count(DISTINCT) for HyperLogLog++ with
    relative standard deviation ``rsd`` — the 100 TB configuration."""
    if not cols:
        raise ValueError("cols must be non-empty")
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")

    aggs = []
    for c in cols:
        col = F.col(c)
        distinct = (
            F.count_distinct(col) if exact else F.approx_count_distinct(col, rsd)
        )
        aggs += [
            F.count(col).alias(f"__present_{c}"),
            F.count(F.when(col.isNull(), F.lit(1))).alias(f"__null_{c}"),
            distinct.alias(f"__distinct_{c}"),
            _stringify(F.min(col), dtypes[c]).alias(f"__min_{c}"),
            _stringify(F.max(col), dtypes[c]).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)

    parts = ", ".join(
        f"'{c}', __present_{c}, __null_{c}, __distinct_{c}, __min_{c}, __max_{c}"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {parts}) AS "
            "(column_name, n_present, n_null, n_distinct, min_value, max_value)"
        )
    )

"""The vectorized custom-transform escape hatch (SURVEY.md §2.9).

Everything the reference computes is expressible with native Column
functions, and the engine keeps it that way — native expressions run
inside whole-stage codegen and are the fast path. But the reference
demonstrates a *capability*: arbitrary per-line Python (its blob parse,
app.py:94-104). For logic that genuinely cannot be expressed natively
(exotic parsers, model scoring, third-party libraries), the engine
exposes three Arrow-batched entry points — never row-at-a-time Python
UDFs:

- :func:`vectorized_scalar` — pandas Series → Series scalar columns
  (``pandas_udf``): ~10-100× the throughput of a per-row Python UDF
  because rows cross the JVM↔Python boundary as Arrow record batches.
- :func:`vectorized_transform` — whole-DataFrame map with a declared
  output schema (``mapInPandas``): N→M rows per batch, no shuffle.
- :func:`grouped_transform` — per-group pandas function
  (``applyInPandas``): one shuffle on the keys, then each group is a
  pandas DataFrame in a single task.

Tests prove the hatch reproduces the native blob parse bit-for-bit
(tests/test_custom.py) — the point is parity of capability, while the
native path stays the default for performance.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def vectorized_scalar(
    fn: Callable, return_type: T.DataType | str
) -> Callable[..., Column]:
    """Wrap ``fn(pandas.Series, ...) -> pandas.Series`` as an
    Arrow-batched scalar UDF usable in any Column position.

    >>> double = vectorized_scalar(lambda s: s * 2, "double")
    >>> df.select(double("amount"))
    """
    return F.pandas_udf(fn, returnType=return_type)


def vectorized_transform(
    df: DataFrame,
    fn: Callable,  # (pandas.DataFrame) -> pandas.DataFrame
    schema: T.StructType | str,
) -> DataFrame:
    """Map every Arrow batch of ``df`` through ``fn`` (``mapInPandas``).

    ``fn`` receives a pandas DataFrame per batch and returns one with
    columns matching ``schema`` — it may change the row count (filter,
    explode, reject-channel splits). A pure map: no shuffle, preserves
    partitioning, so it composes with downstream joins/aggs without
    extra exchanges."""

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(gen, schema=schema)


def grouped_transform(
    df: DataFrame,
    keys: list[str],
    fn: Callable,  # (pandas.DataFrame) -> pandas.DataFrame
    schema: T.StructType | str,
) -> DataFrame:
    """Custom per-group logic (``applyInPandas``): shuffles once on
    ``keys``, then each group arrives as one pandas DataFrame.

    Skew warning at scale: a viral key puts its whole group in one
    task — pre-split hot keys (salting) before reaching for this."""
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)

"""Scalar expression helpers — all native Column expressions (JVM-side,
whole-stage-codegen'd). No Python UDFs here: everything the reference
computes per-row is expressible with built-in functions (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Excel's day-serial epoch. Serial 1 = 1900-01-01, and Excel's fictional
# 1900-02-29 makes 1899-12-30 the correct epoch for post-1900 dates
# (reference stores transaction_date as serial-day text and created_date
# as serial float with a time fraction — SURVEY.md §1.2).
EXCEL_EPOCH = "1899-12-30"


def excel_serial_to_date(col: Column | str) -> Column:
    """Excel serial day number (int or numeric string) → DateType."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_add(F.to_date(F.lit(EXCEL_EPOCH)), c.cast("int"))


def excel_serial_to_timestamp(col: Column | str) -> Column:
    """Excel serial float (day + time fraction) → TimestampType.

    e.g. '43899.6575694444' → 2020-03-09 15:46:54 UTC.
    """
    c = F.col(col) if isinstance(col, str) else col
    seconds = c.cast("double") * F.lit(86400.0)
    # round, don't truncate: serial floats carry ~1e-10-day representation
    # error (e.g. .6575694444 * 86400 = 56813.999996) that truncation
    # would turn into a systematic -1s bias
    return F.timestamp_seconds(
        F.unix_timestamp(F.to_timestamp(F.lit(EXCEL_EPOCH))) + F.round(seconds, 0).cast("long")
    )


def money_round(col: Column | str, scale: int = 2) -> Column:
    """Half-even (banker's) rounding to `scale` decimal places.

    The reference rounds with pandas/numpy ``.round(2)`` which is
    HALF_EVEN (reference app.py:140,146,150); Spark's ``round`` is
    HALF_UP and would mismatch golden values ending in .xx5 — so the
    engine always uses ``bround`` for money (SURVEY.md §2.2 P7).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.bround(c, scale)


def null_safe_double(col: Column | str) -> Column:
    """String → DoubleType, NULL on garbage.

    Exact analog of the reference's ``pd.to_numeric(errors='coerce')``
    (app.py:133): ``try_cast`` yields NULL on unparseable strings instead
    of raising (under Spark 4 ANSI mode a plain cast throws)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")

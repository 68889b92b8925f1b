"""Customer-blob parsing — operators P1/P2/P3/P4 of SURVEY.md §2.2.

The reference parses ``{id_name_email_dob_address_created}`` lines with a
per-row Python loop (reference app.py:93-107). Here the whole parse is
native Column expressions — trim, prefix/suffix filters, substring,
split-with-limit — so it runs inside whole-stage codegen with zero
Python in the loop, and scales linearly with partitions.

Malformed rows are not swallowed (the reference try/excepts and prints,
app.py:103-104): ``parse_customer_blob`` returns (parsed, rejects) so
bad records land in an auditable channel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _stripped(col: Column) -> Column:
    return F.trim(col)


def parse_customer_blob(raw: DataFrame, blob_col: str = "raw") -> tuple[DataFrame, DataFrame]:
    """(parsed, rejects) from a single-blob-column DataFrame.

    parsed: customer_id,name,email,dob,address,created_date
    (+ passthrough of any other columns, e.g. ``_sheet_pos``).
    rejects: original rows that fail the format contract, tagged with a
    reject reason.
    """
    passthrough = [c for c in raw.columns if c != blob_col]

    line = _stripped(F.col(blob_col))
    well_braced = line.startswith("{") & line.endswith("}") & (F.length(line) >= F.lit(2))
    # strip the braces: substring(line, 2, length-2)  (reference slices [1:-1], app.py:99)
    inner = line.substr(F.lit(2), F.length(line) - F.lit(2))
    parts = F.split(inner, "_", 6)

    staged = raw.select(
        F.col(blob_col),
        *passthrough,
        well_braced.alias("_braced"),
        F.when(well_braced, parts).alias("_parts"),
    )

    ok = staged.filter(F.col("_braced") & (F.size("_parts") == 6))
    parsed = ok.select(
        F.col("_parts")[0].alias("customer_id"),
        F.col("_parts")[1].alias("name"),
        F.col("_parts")[2].alias("email"),
        F.col("_parts")[3].alias("dob"),
        F.col("_parts")[4].alias("address"),
        F.col("_parts")[5].alias("created_date"),
        *passthrough,
    )

    rejects = staged.filter(~F.col("_braced") | (F.size("_parts") != 6)).select(
        F.col(blob_col).alias("raw_line"),
        *passthrough,
        F.when(~F.col("_braced"), F.lit("not_braced"))
        .otherwise(F.lit("wrong_field_count"))
        .alias("reject_reason"),
    )
    return parsed, rejects

"""Enrichment joins — operators J1/J2/J3 of SURVEY.md §2.3.

The reference chains two pandas inner merges (app.py:131-132):
transactions ⋈ products on product_code, then ⋈ customers on
customer_id. Spark-first realization: both dimensions are small
relative to the fact, so we broadcast them — the fact table never
shuffles for these joins, which is the property that survives a
100× scale-up (dims grow with |customers|, facts with |events|).

The reference keeps duplicate customer_ids in the join side, which
fans out and double-counts those customers downstream (a documented
reference bug — SURVEY.md §2.3 J2). The engine dedups by default
(keep the LAST occurrence, matching what the SQLite dimension would
store) and offers ``strict_compat=True`` to reproduce the fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_last_by_key(df: DataFrame, key: str, order_col: str) -> DataFrame:
    """Keep the last row per key, ordered by ``order_col`` (e.g. the
    ingest sheet position). Set-based last-write-wins."""
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def enrich_transactions(
    transactions: DataFrame,
    products: DataFrame,
    customers: DataFrame,
    *,
    strict_compat: bool = False,
    customer_order_col: str = "_sheet_pos",
) -> DataFrame:
    """transactions ⋈ products ⋈ customers (inner, broadcast dims).

    Inner semantics intentionally drop transactions with unknown
    product_code / customer_id, matching the reference merges.
    """
    if not strict_compat and customer_order_col in customers.columns:
        customers = dedup_last_by_key(customers, "customer_id", customer_order_col)
    customers = customers.drop(customer_order_col) if customer_order_col in customers.columns else customers

    return transactions.join(F.broadcast(products), "product_code", "inner").join(
        F.broadcast(customers), "customer_id", "inner"
    )

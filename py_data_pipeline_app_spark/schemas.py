"""Explicit schemas for every table the engine touches.

The reference is stringly-typed (pd.read_excel header=None, object
dtype everywhere — reference app.py:67); we declare schemas explicitly
and never rely on inference (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference data model (3-sheet workbook, SURVEY.md §1.2 / FIXTURES.md) ---

# Transactions sheet after header promotion (reference app.py:126-127).
# amount stays string at ingest: the reference casts with errors='coerce'
# (app.py:133) which we reproduce with cast('double') → NULL on garbage.
TRANSACTIONS = T.StructType(
    [
        T.StructField("transaction_id", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("transaction_date", T.StringType()),  # Excel serial day as text
        T.StructField("product_code", T.StringType()),
        T.StructField("amount", T.StringType()),
        T.StructField("payment_type", T.StringType()),
    ]
)

# Customers sheet: one blob column per row (reference README.md:65-71),
# plus the sheet position needed for order-aware SCD semantics (SURVEY §2.7).
CUSTOMERS_RAW = T.StructType(
    [
        T.StructField("raw", T.StringType()),
        T.StructField("_sheet_pos", T.LongType()),
    ]
)

# Parsed customer record (reference app.py:106).
CUSTOMERS = T.StructType(
    [
        T.StructField("customer_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("dob", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("created_date", T.StringType()),
        T.StructField("_sheet_pos", T.LongType()),
    ]
)

PRODUCTS = T.StructType(
    [
        T.StructField("product_code", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("unit_price", T.StringType()),
    ]
)

# --- Warehouse state tables (SQLite in the reference, app.py:20-52) ---

UPLOADS = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("filename", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("transactions_rows", T.LongType()),
        T.StructField("customers_rows", T.LongType()),
        T.StructField("products_rows", T.LongType()),
    ]
)

CUSTOMER_DIM = T.StructType(
    [
        T.StructField("customer_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("dob", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("created_date", T.StringType()),
        T.StructField("upload_id", T.LongType()),
    ]
)

ADDRESS_CHANGES = T.StructType(
    [
        T.StructField("customer_id", T.StringType()),
        T.StructField("old_address", T.StringType()),
        T.StructField("new_address", T.StringType()),
        T.StructField("change_timestamp", T.StringType()),
        T.StructField("upload_id", T.LongType()),
    ]
)

# --- Multimodal extension: opaque binary payload + typed metadata ---

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

# Driver testdata table names (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

"""py_data_pipeline_app_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference app ``jedmarcnocum/py_data_pipeline_app``
(a pandas/Flask Excel→SQLite ETL; see SURVEY.md): Excel workbook ingest
with header promotion, a custom customer-blob parser, a slowly-changing
customer dimension with an append-only address-change log, transaction
enrichment joins, spend aggregation/ranking and top-spender-per-category
reports — plus the large-scale training-data operators a 100 TB pipeline
needs (dedup, similarity search, text analysis, multimodal columns).

Architecture: lazy DataFrame composition, explicit schemas, Catalyst
optimization; no row-at-a-time Python in the hot path.
"""

from py_data_pipeline_app_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

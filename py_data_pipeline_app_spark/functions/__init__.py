from py_data_pipeline_app_spark.functions.scalar import (
    excel_serial_to_date,
    excel_serial_to_timestamp,
    money_round,
)

__all__ = ["excel_serial_to_date", "excel_serial_to_timestamp", "money_round"]

from bikes_data_warehouse_etl_spark.operators.merge import (
    classify_changes,
    scd1_merge,
    scd2_merge,
)
from bikes_data_warehouse_etl_spark.operators.cdc import anti_join_new_rows

__all__ = [
    "classify_changes",
    "scd1_merge",
    "scd2_merge",
    "anti_join_new_rows",
]

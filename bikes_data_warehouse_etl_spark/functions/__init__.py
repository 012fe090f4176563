from bikes_data_warehouse_etl_spark.functions.cleaning import (
    age_at,
    age_bucket,
    clean_name,
    parse_ddmmyyyy,
)
from bikes_data_warehouse_etl_spark.functions.datetime_fns import (
    quarter_name,
    start_of_week_sunday,
    week_of_year_sqlserver,
    yyyymm,
)

__all__ = [
    "clean_name",
    "parse_ddmmyyyy",
    "age_at",
    "age_bucket",
    "week_of_year_sqlserver",
    "start_of_week_sunday",
    "quarter_name",
    "yyyymm",
]

from bikes_data_warehouse_etl_spark.plans.date_dim import build_date_dim

__all__ = ["build_date_dim"]

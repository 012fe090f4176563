"""bikes_data_warehouse_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference warehouse pipeline
(snigdha89/Bikes_Data_Warehouse_ETL): CSV/parquet sources, cleaning
transforms, SCD1/SCD2 merges, anti-join CDC, star-schema fact/dim
builders, a generated date dimension — plus the large-scale
training-data operators (dedup families, similarity search, text
analysis, multimodal column plumbing) that a 100 TB pipeline needs.

Everything is expressed declaratively through the DataFrame / Spark SQL
API so Catalyst + Tungsten choose the physical strategy; Python UDFs are
confined to the explicitly-marked extension points.
"""

from bikes_data_warehouse_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

from bikes_data_warehouse_etl_spark.plans.date_dim import build_date_dim
# importing synthetic + extensions populates the QUERIES registry
from bikes_data_warehouse_etl_spark.plans.synthetic import QUERIES
from bikes_data_warehouse_etl_spark.plans import extensions  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import analytics  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import coverage  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops2  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops3  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops4  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops5  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops6  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops7  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops8  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops9  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops10  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops11  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops12  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops13  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops14  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops15  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops16  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops17  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops18  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops19  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops20  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops21  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops22  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops23  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops24  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops25  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops26  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops27  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops28  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops29  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops30  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops31  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops32  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops33  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops34  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops35  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops36  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops37  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops38  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops39  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops40  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops41  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops42  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops43  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops44  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops45  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops46  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops47  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops48  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops49  # noqa: F401
from bikes_data_warehouse_etl_spark.plans import pipeline_ops50  # noqa: F401

__all__ = ["build_date_dim", "QUERIES"]

"""Explicit StructType schemas for the nine bikes source extracts.

The reference infers CSV schemas (pandas ``read_csv`` with no dtypes —
ref ``ETLScript_withSCDimplementation.py:22`` et al.), which produces
the month-first date ambiguity documented in SURVEY.md §1.5.2. This
engine always reads with explicit schemas: dates arrive as *strings*
(dd-MM-yyyy) and are parsed uniformly by the cleaning layer — never by
inference.

Column names follow the CSV headers (ref ``SourceData/*.csv``); target
ODS types follow the DDL (ref ``SQLserver Scripts/Createtables_BIKES.sql:40-118``,
``numeric(10)`` → LongType).
"""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def _st(*fields: tuple[str, object, bool]) -> StructType:
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


# ref SourceData/Customer.csv — DOB kept as string; parsed as dd-MM-yyyy downstream
CUSTOMER = _st(
    ("customer_id", LongType(), False),
    ("first_name", StringType(), True),
    ("last_name", StringType(), True),
    ("gender", StringType(), True),
    ("DOB", StringType(), True),
    ("job_industry_category", StringType(), True),
    ("wealth_segment", StringType(), True),
    ("deceased_indicator", StringType(), True),
)

# ref SourceData/Address.csv (UTF-8 BOM — Spark's CSV reader strips it natively)
ADDRESS = _st(
    ("ADDRESSID", LongType(), False),
    ("CITY", StringType(), True),
    ("COUNTRY", StringType(), True),
    ("REGION", StringType(), True),
    ("POSTALCODE", LongType(), True),
)

# ref SourceData/BusinessPartner.csv
BUSINESS_PARTNER = _st(
    ("PARTNERID", LongType(), False),
    ("EMAILADDRESS", StringType(), True),
    ("ADDRESSID", LongType(), True),
    ("COMPANYNAME", StringType(), True),
)

# ref SourceData/ProductCategory.csv
PRODUCT_CATEGORY = _st(
    ("PRODCATEGORYID", StringType(), False),
    ("PRODCATEGORYNAME", StringType(), True),
)

# ref SourceData/Product.csv — SCD2 target (ref Createtables_BIKES.sql:73-82)
PRODUCT = _st(
    ("PRODUCTID", StringType(), False),
    ("PRODCATEGORYID", StringType(), True),
    ("PARTNERID", LongType(), True),
    ("PRICE", LongType(), True),
)

# ref SourceData/ProductDetail.csv
PRODUCT_DETAIL = _st(
    ("PRODUCTID", StringType(), False),
    ("PRODUCT_NAME", StringType(), True),
)

# ref SourceData/Store.csv (UTF-8 BOM)
STORE = _st(
    ("StoreID", LongType(), False),
    ("manager", StringType(), True),
    ("AddressID", LongType(), True),
    ("phone", StringType(), True),
)

# ref SourceData/SalesOrder.csv — Date kept as string (dd-MM-yyyy)
SALES_ORDER = _st(
    ("SalesOrderID", LongType(), False),
    ("PARTNERID", LongType(), True),
    ("SALESORG", StringType(), True),
    ("GROSSAMOUNT", LongType(), True),
    ("Ordertype", StringType(), True),
    ("StoreID", LongType(), True),
    ("Date", StringType(), True),
    ("RATING", LongType(), True),
    ("customer_id", LongType(), True),
)

# ref SourceData/SalesOrderItems.csv
SALES_ORDER_ITEMS = _st(
    ("SalesOrderItemsID", LongType(), False),
    ("PRODUCTID", StringType(), True),
    ("SalesOrderID", LongType(), True),
    ("GROSSAMOUNT", LongType(), True),
    ("QUANTITY", LongType(), True),
)

SOURCE_SCHEMAS: dict[str, StructType] = {
    "Customer": CUSTOMER,
    "Address": ADDRESS,
    "BusinessPartner": BUSINESS_PARTNER,
    "ProductCategory": PRODUCT_CATEGORY,
    "Product": PRODUCT,
    "ProductDetail": PRODUCT_DETAIL,
    "Store": STORE,
    "SalesOrder": SALES_ORDER,
    "SalesOrderItems": SALES_ORDER_ITEMS,
}

"""Calendar expressions with SQL-Server conventions (SURVEY §2.8 F8-F19).

The reference's date dimension and Act_Perd_Dim derivations use SQL
Server defaults: weeks start Sunday (DATEFIRST 7), ``DATEPART(WEEK)``
is the Jan-1-anchored calendar week (not ISO), quarter names Q1-Q4.
Spark's defaults differ (``weekofyear`` is ISO, ``date_trunc('week')``
is Monday-start), so these are implemented explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def start_of_week_sunday(d: Column | str) -> Column:
    """Sunday-start week floor (F17).

    Reference: ``DATEADD(DAY, 1 - DATEPART(WEEKDAY, d), d)``
    (ref BikesDWSQl.sql:194-197). ``dayofweek`` is 1=Sunday in both
    engines. NOT ``date_trunc('week')`` (Monday-start).
    """
    d = _c(d)
    return F.date_sub(d, F.dayofweek(d) - 1)


def week_of_year_sqlserver(d: Column | str) -> Column:
    """SQL-Server ``DATEPART(WEEK, d)`` (F10).

    Calendar week: Jan 1 is always in week 1; weeks advance every
    Sunday. Equivalent closed form:
    ``floor((dayofyear + weekday(Jan1) - 2) / 7) + 1`` with 1=Sunday
    weekday numbering.
    """
    d = _c(d)
    jan1 = F.trunc(d, "year")
    return (
        F.floor((F.dayofyear(d) + F.dayofweek(jan1) - 2) / 7) + 1
    ).cast("int")


def quarter_name(d: Column | str) -> Column:
    """Quarter label Q1-Q4 (ref BikesDWSQl.sql:182-187)."""
    return F.concat(F.lit("Q"), F.quarter(_c(d)).cast("string"))


def yyyymm(d: Column | str) -> Column:
    """Integer yyyymm month key: ``DATE_YEAR * 100 + DATE_MONTH``
    (ref BikesDWSQl.sql:189)."""
    d = _c(d)
    return (F.year(d) * 100 + F.month(d)).cast("int")

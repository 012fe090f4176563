"""Cleaning / derivation expressions (reference parity: SURVEY §2.8).

All pure Column→Column expression builders — JVM-side, codegen-friendly,
zero Python UDFs. Each documents the reference behavior it reproduces
(file:line) and any deliberate divergence from a reference *bug*
(SURVEY §1.5).
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def clean_name(col: Column | str) -> Column:
    """Strip ALL non-word characters (F1).

    Reference: ``re.sub(r'\\W+', '', x)`` applied to first/last name
    (ref ETLScript_withSCDimplementation.py:27-28). ``regexp_replace``
    has identical \\W semantics.
    """
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, r"\W+", "")


def parse_ddmmyyyy(col: Column | str) -> Column:
    """Parse a dd-MM-yyyy string into a DateType (F2/F5).

    The reference parses DOB *two different ways* — explicitly
    ``%d-%m-%Y`` for the age computation (ref :32) but month-first for
    the stored column via ``astype('datetime64[ns]')`` (ref :39, :553).
    That inconsistency is a documented bug (SURVEY §1.5.2); this engine
    parses uniformly day-first.
    """
    return F.to_date(F.col(col) if isinstance(col, str) else col, "dd-MM-yyyy")


def age_at(dob: Column | str, as_of: Column | str) -> Column:
    """Calendar age at ``as_of``, birthday-aware (F3).

    Reference: ``today.year - born.year - ((today.month, today.day) <
    (born.month, born.day))`` (ref :31-36) — but against the wall clock
    (``date.today()``, ref :33). The engine takes an explicit as-of date
    so results are deterministic (SURVEY §1.5.3).

    Implemented with exact lexicographic (month, day) comparison;
    ``floor(months_between/12)`` is avoided (month-end edge cases).
    """
    d = F.col(dob) if isinstance(dob, str) else dob
    a = F.col(as_of) if isinstance(as_of, str) else as_of
    birthday_not_reached = (F.month(a) < F.month(d)) | (
        (F.month(a) == F.month(d)) & (F.dayofmonth(a) < F.dayofmonth(d))
    )
    return (
        F.year(a) - F.year(d) - F.when(birthday_not_reached, 1).otherwise(0)
    ).cast("long")


def age_bucket(age: Column | str) -> Column:
    """Right-closed age buckets (F4).

    Reference: ``pd.cut(bins=[18,30,40,50,60,70,120], labels=['18-29',
    '30-39','40-49','50-59','60-69','70+'], include_lowest=True)``
    (ref :43-45) → intervals [18,30], (30,40], …, (70,120]. So age 30 →
    '18-29', 40 → '30-39', 70 → '60-69'; <18 or >120 → NULL
    (SURVEY §1.5.1). A left-closed Bucketizer would be wrong here.
    """
    a = F.col(age) if isinstance(age, str) else age
    return (
        F.when(a < 18, F.lit(None).cast("string"))  # pd.cut: below range → NaN
        .when(a <= 30, "18-29")
        .when(a <= 40, "30-39")
        .when(a <= 50, "40-49")
        .when(a <= 60, "50-59")
        .when(a <= 70, "60-69")
        .when(a <= 120, "70+")
        .otherwise(F.lit(None).cast("string"))
    )

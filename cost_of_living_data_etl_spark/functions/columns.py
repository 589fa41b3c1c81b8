"""Reusable native Column expressions.

The reference's entire "UDF surface" is three row-wise pandas lambdas
(reference app.py:54,71,83,102). All are expressible as JVM-side
column expressions — no Python UDFs, so they stay inside whole-stage
codegen and cost nothing extra at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def decomma_to_double(col: str | Column) -> Column:
    """``"1,234.56"`` → ``1234.56`` (reference app.py:71, C2).

    Native regexp_replace + cast; NULL-safe (NULL stays NULL).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, ",", "").cast("double")


def with_county_suffix(col: str | Column, suffix: str = " COUNTY") -> Column:
    """``"Kent"`` → ``"Kent COUNTY"`` (reference app.py:54,83,102, C3).

    Normalizes lake county names to the warehouse dim_location form.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(c, F.lit(suffix))


def uppercase_columns(df: DataFrame) -> DataFrame:
    """Rename every column to UPPERCASE.

    Makes the reference's implicit Snowflake-connector uppercase
    contract (SURVEY.md §1.2) explicit and testable.
    """
    return df.withColumnsRenamed({c: c.upper() for c in df.columns})

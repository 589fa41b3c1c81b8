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


def det_sum(expr: str) -> Column:
    """Deterministic-order double sum of a SQL expression: fold the
    sorted value list from 0.0.

    Plain ``sum(double)`` adds in partition order, so the last ulps
    differ run-to-run and engine-to-engine — fatal for the driver's
    exact-hash oracle gate. This form collects, sorts, then left-folds
    from ``CAST(0.0 AS DOUBLE)``; its DuckDB twin is
    ``list_reduce(list_sort(list(x)), (a, b) -> a + b)`` (a left fold
    seeded with the first element — ``0.0 + x0 == x0`` exactly, so
    both folds add the same values in the same order). Oracle-replay
    variant only: at 100 TB run the plain partial-agg sum (map-side
    combine) and accept last-ulp drift.
    """
    return F.expr(
        f"aggregate(array_sort(collect_list({expr})), CAST(0.0 AS DOUBLE),"
        " (a, x) -> a + x)"
    )

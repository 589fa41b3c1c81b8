"""Explicit input/output schemas for the cost-of-living ETL.

The reference relies on pandas CSV inference (reference app.py:29) and
the Snowflake connector's uppercase result columns (app.py:140,143).
Both contracts are made explicit here: declared StructTypes kill CSV
inference nondeterminism (and let Spark skip the inference pass — one
fewer full read of the data) and give Catalyst exact types for pushdown.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --- lake CSV inputs (FIXTURES.md A1-A3) -----------------------------------

# usd_amount arrives as a string with thousands commas in expenses
# (app.py:71) and as a plain numeric in living_wage; declared as string
# everywhere and cast explicitly in the transform — the cast is the
# operator, not an accident of inference.
LIVING_WAGE_SCHEMA = StructType(
    [
        StructField("wage_level", StringType()),
        StructField("num_adults", IntegerType()),
        StructField("num_children", StringType()),  # string-of-int; cast downstream (app.py:53)
        StructField("num_working", IntegerType()),
        StructField("county", StringType()),
        StructField("usd_amount", DoubleType()),
    ]
)

EXPENSES_SCHEMA = StructType(
    [
        StructField("expense_category", StringType()),
        StructField("num_adults", IntegerType()),
        StructField("num_children", StringType()),
        StructField("num_working", IntegerType()),
        StructField("county", StringType()),
        StructField("usd_amount", StringType()),  # "12,345.67" — de-comma'd in transform (app.py:71)
    ]
)

TYPICAL_SALARIES_SCHEMA = StructType(
    [
        StructField("occupational_area", StringType()),
        StructField("typical_annual_salary", DoubleType()),
        StructField("county", StringType()),
    ]
)

LAKE_SCHEMAS = {
    "living_wage": LIVING_WAGE_SCHEMA,
    "expenses": EXPENSES_SCHEMA,
    "typical_salaries": TYPICAL_SALARIES_SCHEMA,
}

# --- warehouse dimensions (FIXTURES.md A4-A5) ------------------------------

DIM_LOCATION_SCHEMA = StructType(
    [
        StructField("LOCATION_ID", LongType()),
        StructField("COUNTY", StringType()),
        StructField("STATE", StringType()),
    ]
)

DIM_DATE_SCHEMA = StructType(
    [
        StructField("DATE_ID", LongType()),
        StructField("DATE", DateType()),
    ]
)

# --- fact outputs (FIXTURES.md A6, reference app.py:172-192) ---------------

FACT_ANNUAL_EXPENSE_COLS = [
    "CATEGORY",
    "NUMBER_OF_CHILDREN",
    "AMOUNT",
    "NUMBER_OF_ADULTS",
    "NUMBER_OF_WORKING_ADULTS",
    "SNAPSHOT_DATE_ID",
    "LOCATION_ID",
]

FACT_LIVING_WAGE_COLS = [
    "NUMBER_OF_ADULTS",
    "NUMBER_OF_CHILDREN",
    "NUMBER_OF_WORKING_ADULTS",
    "HOURLY_WAGE",
    "SNAPSHOT_DATE_ID",
    "LOCATION_ID",
]

FACT_TYPICAL_ANNUAL_SALARY_COLS = [
    "OCCUPATION",
    "SALARY",
    "SNAPSHOT_DATE_ID",
    "LOCATION_ID",
]

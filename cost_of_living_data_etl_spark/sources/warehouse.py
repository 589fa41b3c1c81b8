"""Warehouse source/sink.

The reference reads dims from and appends facts to Snowflake
(reference app.py:140,143,195-197). This engine's warehouse is a
parquet/Delta-style directory of tables: reads are plain scans with
Catalyst pushdown; writes are ``mode("append")`` — the same semantics
as the reference's ``write_pandas`` append-load.

In production the same API binds to JDBC / spark-snowflake by
swapping the format; pushdown of filters/projections into the remote
source is automatic for DSv2 connectors, which is what the reference
hand-encodes in its SQL strings (app.py:140,143, S5/S6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class Warehouse:
    """A directory-of-parquet-tables warehouse with append semantics."""

    def __init__(self, root: str):
        self.root = root

    def path(self, table: str) -> str:
        return f"{self.root}/{table}"

    def read(self, spark: SparkSession, table: str, schema: StructType | None = None) -> DataFrame:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(self.path(table))

    def append(self, df: DataFrame, table: str) -> None:
        """Append-load (reference app.py:195-197, S7)."""
        df.write.mode("append").parquet(self.path(table))

    def overwrite(self, df: DataFrame, table: str) -> None:
        df.write.mode("overwrite").parquet(self.path(table))

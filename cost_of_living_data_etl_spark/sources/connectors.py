"""Real-connector bindings: s3a object store + JDBC / Snowflake
warehouse option wiring.

The reference talks to S3 through boto3 (reference app.py:13-30,
118-123) and to Snowflake through snowflake-connector + write_pandas
(app.py:124-131,140,143,195-197). Spark replaces both client loops
with declarative source/sink config: the lake path becomes an
``s3a://`` URI plus Hadoop ``fs.s3a.*`` credentials, and the
warehouse becomes a ``format("jdbc")`` / ``format("net.snowflake.
spark.snowflake")`` reader/writer. This module holds exactly that
wiring — pure option construction, no network: every function returns
either an option dict or a lazily-configured reader/writer, so the
bindings are unit-testable in a sandbox and the credentials path is
identical in production.

All option names are public Spark/Hadoop/spark-snowflake surface
(hadoop-aws ``fs.s3a.*``; Spark JDBC source options; spark-snowflake
``sfURL``/``sfUser``/... options). No endpoints, accounts, or bucket
names are baked in — they arrive via the config dataclasses.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

SNOWFLAKE_FORMAT = "net.snowflake.spark.snowflake"


@dataclass(frozen=True)
class S3aConfig:
    """Credentials + addressing for an s3a:// lake.

    ``endpoint``/``path_style`` cover S3-compatible stores (MinIO,
    Ceph); leaving them unset targets AWS per hadoop-aws defaults.
    """

    access_key: str
    secret_key: str
    endpoint: str | None = None
    region: str | None = None
    path_style_access: bool = False

    def hadoop_conf(self) -> dict[str, str]:
        """``fs.s3a.*`` entries to apply on the Hadoop configuration
        (or as ``spark.hadoop.fs.s3a.*`` session confs)."""
        conf = {
            "fs.s3a.access.key": self.access_key,
            "fs.s3a.secret.key": self.secret_key,
            "fs.s3a.aws.credentials.provider": (
                "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
            ),
        }
        if self.endpoint:
            conf["fs.s3a.endpoint"] = self.endpoint
        if self.region:
            conf["fs.s3a.endpoint.region"] = self.region
        if self.path_style_access:
            conf["fs.s3a.path.style.access"] = "true"
        return conf

    def lake_root(self, bucket: str) -> str:
        """Root URI for :func:`~...sources.lake.read_lake_csv` — the
        same function reads ``file:/`` fixtures and ``s3a://``
        production unchanged."""
        return f"s3a://{bucket}"

    def apply(self, spark: SparkSession) -> None:
        """Install the credentials on a live session's Hadoop conf."""
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for k, v in self.hadoop_conf().items():
            hconf.set(k, v)


@dataclass(frozen=True)
class JdbcConfig:
    """Generic JDBC warehouse (Postgres, MySQL, Redshift, ...)."""

    url: str
    user: str
    password: str
    driver: str | None = None

    def reader_options(
        self,
        *,
        table: str | None = None,
        query: str | None = None,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        num_partitions: int | None = None,
        fetch_size: int = 10_000,
    ) -> dict[str, str]:
        """Options for ``spark.read.format("jdbc")``.

        Exactly one of ``table``/``query``. The partition_column
        quartet is what makes a JDBC read DISTRIBUTED (N concurrent
        range queries instead of one connection pulling everything) —
        at warehouse scale always set it on a clustered numeric key.
        Catalyst pushes filters/projections into the remote SQL on
        top of whichever form is used (S5/S6 pushdown parity,
        reference app.py:140,143).
        """
        if (table is None) == (query is None):
            raise ValueError("exactly one of table= or query= is required")
        opts = {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "fetchsize": str(fetch_size),
        }
        if self.driver:
            opts["driver"] = self.driver
        if table is not None:
            opts["dbtable"] = table
        else:
            opts["query"] = query  # type: ignore[assignment]
        partition_args = (partition_column, lower_bound, upper_bound, num_partitions)
        if any(a is not None for a in partition_args):
            if any(a is None for a in partition_args):
                raise ValueError(
                    "partition_column, lower_bound, upper_bound and "
                    "num_partitions must be set together"
                )
            opts.update(
                partitionColumn=str(partition_column),
                lowerBound=str(lower_bound),
                upperBound=str(upper_bound),
                numPartitions=str(num_partitions),
            )
        return opts

    def writer_options(self, table: str, batch_size: int = 10_000) -> dict[str, str]:
        opts = {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "dbtable": table,
            "batchsize": str(batch_size),
        }
        if self.driver:
            opts["driver"] = self.driver
        return opts


@dataclass(frozen=True)
class SnowflakeConfig:
    """spark-snowflake connector wiring (the reference's warehouse,
    app.py:124-131, re-expressed as the official Spark connector)."""

    account: str
    user: str
    password: str
    database: str
    schema: str
    warehouse: str
    role: str | None = None

    def options(self) -> dict[str, str]:
        opts = {
            "sfURL": f"{self.account}.snowflakecomputing.com",
            "sfUser": self.user,
            "sfPassword": self.password,
            "sfDatabase": self.database,
            "sfSchema": self.schema,
            "sfWarehouse": self.warehouse,
        }
        if self.role:
            opts["sfRole"] = self.role
        return opts


WarehouseConfig = JdbcConfig | SnowflakeConfig


def _format_and_options(cfg: WarehouseConfig, *, table: str | None = None,
                        query: str | None = None, write: bool = False) -> tuple[str, dict[str, str]]:
    if isinstance(cfg, SnowflakeConfig):
        opts = cfg.options()
        if write:
            opts["dbtable"] = str(table)
        elif table is not None:
            opts["dbtable"] = table
        elif query is not None:
            opts["query"] = query
        else:
            raise ValueError("table= or query= is required")
        return SNOWFLAKE_FORMAT, opts
    if write:
        return "jdbc", cfg.writer_options(str(table))
    return "jdbc", cfg.reader_options(table=table, query=query)


def remote_reader(
    spark: SparkSession,
    cfg: WarehouseConfig,
    *,
    table: str | None = None,
    query: str | None = None,
) -> Any:
    """Configured (NOT yet loaded) DataFrameReader for a remote
    warehouse table/query — ``.load()`` is the caller's first network
    touch, mirroring the reference's read of dims (app.py:140,143)."""
    fmt, opts = _format_and_options(cfg, table=table, query=query)
    return spark.read.format(fmt).options(**opts)


def remote_append_writer(df: DataFrame, cfg: WarehouseConfig, table: str) -> Any:
    """Configured (NOT yet saved) append DataFrameWriter — the
    reference's write_pandas append-load (app.py:195-197) as a Spark
    sink; ``.save()`` executes."""
    fmt, opts = _format_and_options(cfg, table=table, write=True)
    return df.write.format(fmt).options(**opts).mode("append")


class RemoteWarehouse:
    """The local parquet ``Warehouse`` API bound to a remote engine:
    drop-in for ``run_pipeline(..., warehouse=...)`` in a deployment
    with real credentials — same read/append surface, JDBC or
    Snowflake underneath."""

    def __init__(self, cfg: WarehouseConfig):
        self.cfg = cfg

    def read(self, spark: SparkSession, table: str, schema=None) -> DataFrame:
        reader = remote_reader(spark, self.cfg, table=table)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load()

    def append(self, df: DataFrame, table: str) -> None:
        remote_append_writer(df, self.cfg, table).save()

"""Connector binding layer: option construction only (no network —
the sandbox has none; production credentials arrive via the config
dataclasses and the same code paths)."""

from __future__ import annotations

import pytest

from cost_of_living_data_etl_spark.sources.connectors import (
    SNOWFLAKE_FORMAT,
    JdbcConfig,
    RemoteWarehouse,
    S3aConfig,
    SnowflakeConfig,
    remote_append_writer,
    remote_reader,
)


def test_s3a_hadoop_conf_minimal_and_full():
    minimal = S3aConfig(access_key="AK", secret_key="SK")
    conf = minimal.hadoop_conf()
    assert conf["fs.s3a.access.key"] == "AK"
    assert conf["fs.s3a.secret.key"] == "SK"
    assert "fs.s3a.endpoint" not in conf

    full = S3aConfig(
        access_key="AK",
        secret_key="SK",
        endpoint="minio.internal:9000",
        region="us-east-1",
        path_style_access=True,
    )
    conf = full.hadoop_conf()
    assert conf["fs.s3a.endpoint"] == "minio.internal:9000"
    assert conf["fs.s3a.endpoint.region"] == "us-east-1"
    assert conf["fs.s3a.path.style.access"] == "true"
    assert full.lake_root("my-bucket") == "s3a://my-bucket"


def test_s3a_apply_sets_session_hadoop_conf(spark):
    S3aConfig(access_key="AK", secret_key="SK", endpoint="e:9000").apply(spark)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "AK"
    assert hconf.get("fs.s3a.endpoint") == "e:9000"


def test_jdbc_reader_options_table_vs_query():
    cfg = JdbcConfig(url="jdbc:postgresql://h/db", user="u", password="p")
    t = cfg.reader_options(table="dim_location")
    assert t["dbtable"] == "dim_location" and "query" not in t
    q = cfg.reader_options(query="SELECT 1")
    assert q["query"] == "SELECT 1" and "dbtable" not in q
    with pytest.raises(ValueError):
        cfg.reader_options()
    with pytest.raises(ValueError):
        cfg.reader_options(table="t", query="q")


def test_jdbc_partitioned_read_requires_full_quartet():
    cfg = JdbcConfig(url="jdbc:postgresql://h/db", user="u", password="p")
    opts = cfg.reader_options(
        table="fact",
        partition_column="location_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
    )
    assert opts["partitionColumn"] == "location_id"
    assert opts["numPartitions"] == "64"
    with pytest.raises(ValueError, match="together"):
        cfg.reader_options(table="fact", partition_column="location_id")


def test_jdbc_writer_options_include_driver_when_set():
    cfg = JdbcConfig(
        url="jdbc:postgresql://h/db", user="u", password="p",
        driver="org.postgresql.Driver",
    )
    opts = cfg.writer_options("FACT_LIVING_WAGE")
    assert opts["dbtable"] == "FACT_LIVING_WAGE"
    assert opts["driver"] == "org.postgresql.Driver"


def test_snowflake_options_shape():
    cfg = SnowflakeConfig(
        account="acct-id", user="u", password="p",
        database="db", schema="sch", warehouse="wh", role="loader",
    )
    opts = cfg.options()
    assert opts["sfURL"] == "acct-id.snowflakecomputing.com"
    assert opts["sfWarehouse"] == "wh"
    assert opts["sfRole"] == "loader"


def test_remote_reader_and_writer_configure_lazily(spark):
    """Construction must not touch the network — .load()/.save() is
    the first remote call."""
    jdbc = JdbcConfig(url="jdbc:postgresql://h/db", user="u", password="p")
    sf = SnowflakeConfig(
        account="a", user="u", password="p",
        database="d", schema="s", warehouse="w",
    )
    remote_reader(spark, jdbc, table="dim_location")
    remote_reader(spark, sf, query="SELECT 1")
    df = spark.range(3)
    remote_append_writer(df, jdbc, "t")
    remote_append_writer(df, sf, "t")
    assert SNOWFLAKE_FORMAT == "net.snowflake.spark.snowflake"


def test_remote_warehouse_matches_local_api():
    from cost_of_living_data_etl_spark.sources.warehouse import Warehouse

    for method in ("read", "append"):
        assert hasattr(RemoteWarehouse, method) and hasattr(Warehouse, method)

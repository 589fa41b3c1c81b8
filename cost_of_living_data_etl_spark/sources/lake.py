"""Lake (data-lake CSV) source.

Replaces the reference's sequential boto3 list → filter-keys → N GETs →
N parses → concat (reference app.py:13-30, S1-S4) with ONE distributed
multi-file CSV scan:

- the date partition becomes a path segment (partition pruning at the
  listing level — only that date's directory is scanned),
- the category substring-filter on object keys becomes a
  ``pathGlobFilter`` (evaluated during file listing, zero data read),
- the per-file concat (UNION ALL) is implicit in a multi-file scan,
- the declared schema skips Spark's inference pass entirely.

Works identically on ``file:/``, ``s3a://``, ``abfss://`` etc. — at
100 TB, the same call fans out over every executor, with splittable
files read in ``spark.sql.files.maxPartitionBytes`` chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from cost_of_living_data_etl_spark.plans.schemas import LAKE_SCHEMAS

LAKE_PREFIX = "real_estate/cost_of_living"


def read_lake_csv(
    spark: SparkSession,
    lake_root: str,
    category: str,
    extract_date: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Read all CSV files of one category for one extract date.

    Mirrors ``get_df_from_s3`` (reference app.py:13-30): any file whose
    name contains ``category`` under the date-partition prefix.
    """
    schema = schema or LAKE_SCHEMAS[category]
    path = f"{lake_root}/{LAKE_PREFIX}/{extract_date}"
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("pathGlobFilter", f"*{category}*")
        # recursive: tolerate nested layout under the date partition
        .option("recursiveFileLookup", True)
        .csv(path)
    )


def read_lake_csv_audited(
    spark: SparkSession,
    lake_root: str,
    category: str,
    extract_date: str,
    schema: StructType | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Lake CSV read that QUARANTINES malformed rows instead of
    silently nulling them: returns (clean_rows, corrupt_rows).

    The reference trusts ``pd.read_csv`` (reference app.py:29) — a
    truncated upload or stray delimiter either crashes the Lambda or
    silently corrupts a load. Spark's PERMISSIVE mode parks each
    unparseable line's raw text in a ``_corrupt_record`` column; the
    clean frame drops it, the quarantine frame keeps (raw_line) for
    the data-quality report. The parsed frame is cached because Spark
    (correctly) refuses corrupt-column-only queries against a raw CSV
    scan; at 100 TB the equivalent is landing the parsed frame once
    and splitting from that materialization — same cost model.
    """
    from pyspark.sql.types import StringType, StructField

    schema = schema or LAKE_SCHEMAS[category]
    audited = StructType(
        schema.fields + [StructField("_corrupt_record", StringType())]
    )
    path = f"{lake_root}/{LAKE_PREFIX}/{extract_date}"
    raw = (
        spark.read.schema(audited)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("pathGlobFilter", f"*{category}*")
        .option("recursiveFileLookup", True)
        .csv(path)
    )
    raw = raw.cache()
    is_bad = raw["_corrupt_record"].isNotNull()
    clean = raw.filter(~is_bad).drop("_corrupt_record")
    corrupt = raw.filter(is_bad).select(
        raw["_corrupt_record"].alias("raw_line")
    )
    return clean, corrupt


def read_lake_jsonl(
    spark: SparkSession,
    lake_root: str,
    category: str,
    extract_date: str,
    schema: StructType,
) -> DataFrame:
    """JSON-lines variant of the lake read — same layout contract
    (date-partition prefix + category glob), for feeds that land as
    newline-delimited JSON instead of CSV.

    The explicit schema matters even more than for CSV: schema
    inference on JSON is a FULL extra pass over the data (Spark reads
    everything once just to guess types) — at 100 TB that doubles
    ingest cost and can mis-type sparse fields from whichever files
    the sample hits. Malformed lines go to ``_corrupt_record`` under
    the default PERMISSIVE mode instead of failing the load.
    """
    path = f"{lake_root}/{LAKE_PREFIX}/{extract_date}"
    return (
        spark.read.schema(schema)
        .option("pathGlobFilter", f"*{category}*")
        .option("recursiveFileLookup", True)
        .json(path)
    )

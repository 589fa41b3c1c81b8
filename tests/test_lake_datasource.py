"""Custom Python Data Source vs the native lake reader.

The connector must produce the same rows as the native multi-file CSV
scan on the same lake layout, and must parallelize the way the
reference's sequential loop doesn't: one input partition per listed
object.
"""

from __future__ import annotations

import pytest

from cost_of_living_data_etl_spark.plans.schemas import LAKE_SCHEMAS
from cost_of_living_data_etl_spark.sources.lake import LAKE_PREFIX, read_lake_csv
from cost_of_living_data_etl_spark.sources import lake_datasource
from cost_of_living_data_etl_spark.sources.lake_datasource import register

EXTRACT = "2024-06-01"


@pytest.fixture(scope="module")
def lake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("lake_ds")
    d = root / LAKE_PREFIX / EXTRACT
    d.mkdir(parents=True)
    (d / "living_wage_1.csv").write_text(
        "wage_level,num_adults,num_children,num_working,county,usd_amount\n"
        "LIVING WAGE,2,2,1,Kent,21.34\n"
        "POVERTY WAGE,2,2,1,Kent,10.00\n"
    )
    (d / "living_wage_2.csv").write_text(
        "wage_level,num_adults,num_children,num_working,county,usd_amount\n"
        "LIVING WAGE,1,0,1,Sussex,15.50\n"
    )
    (d / "expenses_1.csv").write_text(
        "expense_category,num_adults,num_children,num_working,county,usd_amount\n"
        'HOUSING,2,2,1,Kent,"12,345.67"\n'
    )
    return str(root)


@pytest.fixture(scope="module")
def registered(spark):
    register(spark)
    return spark


def test_prefix_mirrors_native_constant():
    # the connector duplicates the literal to stay import-free for
    # by-value pickling; keep the two constants in lock-step
    assert lake_datasource.LAKE_PREFIX == LAKE_PREFIX


def _custom_read(spark, lake_root, category):
    return (
        spark.read.format("lake_objects")
        .schema(LAKE_SCHEMAS[category])
        .option("root", lake_root)
        .option("category", category)
        .option("extract_date", EXTRACT)
        .load()
    )


def test_matches_native_reader(registered, lake_root):
    custom = _custom_read(registered, lake_root, "living_wage")
    native = read_lake_csv(registered, lake_root, "living_wage", EXTRACT)
    assert custom.schema == native.schema
    assert sorted(map(tuple, custom.collect())) == sorted(
        map(tuple, native.collect())
    )


def test_category_filter_applies_at_listing(registered, lake_root):
    rows = _custom_read(registered, lake_root, "expenses").collect()
    assert len(rows) == 1
    # quoted comma-grouped money survives as the raw string (C2 cast
    # happens downstream in the transform, same as the native path)
    assert rows[0]["usd_amount"] == "12,345.67"


def test_one_partition_per_object(registered, lake_root):
    df = _custom_read(registered, lake_root, "living_wage")
    assert df.rdd.getNumPartitions() == 2  # two listed objects


def test_empty_listing_yields_empty_frame(registered, lake_root):
    df = (
        registered.read.format("lake_objects")
        .schema(LAKE_SCHEMAS["living_wage"])
        .option("root", lake_root)
        .option("category", "nonexistent")
        .option("extract_date", EXTRACT)
        .load()
    )
    assert df.count() == 0

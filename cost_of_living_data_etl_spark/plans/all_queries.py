"""Import every query-defining module so catalog registration runs."""

from cost_of_living_data_etl_spark.plans import relational  # noqa: F401

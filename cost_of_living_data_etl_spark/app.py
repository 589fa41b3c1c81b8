"""Reference-parity entry point: ``main(event)`` → full ETL run.

The reference is an AWS Lambda handler ``main(event, context)``
triggered with ``{"extractDate": "YYYY-MM-DD"}`` (reference
app.py:106,202-205, README.md:29) and configured through a soup of
nine environment variables read at call time (app.py:117-132,
README.md:5-17). This module mirrors that surface Spark-side:

- :class:`AppConfig` replaces the env-var soup with one explicit,
  test-injectable object; :meth:`AppConfig.from_env` keeps the
  12-factor path for deployments (generic names — the reference's
  own names are AWS/Snowflake-credential-specific).
- :func:`main` accepts the exact Lambda event shape and drives
  :func:`~cost_of_living_data_etl_spark.plans.etl.run_pipeline`.

Unlike the reference — which returns an unconditional
``{"statusCode": 200}`` with no row-count check (app.py:199) — the
response carries the per-fact appended row counts, so a caller can
detect the silent-empty-load case (empty ``dim_date`` ⇒ 0 rows
everywhere, app.py:156-164) without re-reading the warehouse.
"""

from __future__ import annotations

import datetime as dt
import os
from collections.abc import Mapping
from dataclasses import dataclass
from typing import Any

from pyspark.sql import SparkSession

from cost_of_living_data_etl_spark.plans.etl import run_pipeline
from cost_of_living_data_etl_spark.session import get_spark
from cost_of_living_data_etl_spark.sources.warehouse import Warehouse


@dataclass(frozen=True)
class AppConfig:
    """Everything the reference reads from env vars, as one value.

    ``as_of = None`` reproduces the reference's ``date.today()``
    snapshot stamping (app.py:57,84,101); tests inject a fixed date.
    """

    lake_root: str
    warehouse_root: str
    state: str = "DE"
    as_of: dt.date | None = None

    @classmethod
    def from_env(cls, env: Mapping[str, str] | None = None) -> "AppConfig":
        """12-factor construction (reference app.py:117-132 analogue).

        LAKE_ROOT and WAREHOUSE_ROOT are required; STATE_FILTER and
        AS_OF_DATE (ISO date, for deterministic re-runs) are optional.
        """
        env = os.environ if env is None else env
        missing = [k for k in ("LAKE_ROOT", "WAREHOUSE_ROOT") if not env.get(k)]
        if missing:
            raise KeyError(f"missing required config env vars: {missing}")
        as_of = env.get("AS_OF_DATE")
        return cls(
            lake_root=env["LAKE_ROOT"],
            warehouse_root=env["WAREHOUSE_ROOT"],
            state=env.get("STATE_FILTER", "DE"),
            as_of=dt.date.fromisoformat(as_of) if as_of else None,
        )


def main(
    event: Mapping[str, Any],
    context: Any = None,
    config: AppConfig | None = None,
    spark: SparkSession | None = None,
) -> dict[str, Any]:
    """Lambda-shaped handler (reference app.py:106): run the ETL for
    one extract date.

    ``event["extractDate"]`` selects the lake date partition
    (reference app.py:26,132). ``config``/``spark`` are injectable for
    tests and embedding; by default config comes from the environment
    and the session from the engine factory.
    """
    try:
        extract_date = event["extractDate"]
    except (KeyError, TypeError):
        raise ValueError(
            'event must carry {"extractDate": "YYYY-MM-DD"} (reference README.md:29)'
        ) from None
    if not isinstance(extract_date, str):
        raise ValueError(
            'event["extractDate"] must be a "YYYY-MM-DD" string, '
            f"got {type(extract_date).__name__}"
        )
    dt.date.fromisoformat(extract_date)  # fail fast on malformed dates

    cfg = config if config is not None else AppConfig.from_env()
    session = spark if spark is not None else get_spark(app_name="cost-of-living-etl")
    counts = run_pipeline(
        session,
        cfg.lake_root,
        Warehouse(cfg.warehouse_root),
        extract_date,
        as_of=cfg.as_of,
        state=cfg.state,
    )
    return {"statusCode": 200, "counts": counts}

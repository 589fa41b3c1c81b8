"""Time-series strength features over the seasonal decomposition.

Hyndman's STL-feature pair (`feasts`/tsfeatures `trend_strength` /
`seasonal_strength`): F_T = max(0, 1 − Var(R)/Var(T+R)) and
F_S = max(0, 1 − Var(R)/Var(S+R)) over an additive decomposition
y = T + S + R — the [0, 1] summary that turns "look at the
decomposition plot" into a routable scalar (forecast-model selection,
anomaly-detector gating, which series deserve a seasonal model at
all). Computed directly on the catalog's decomposition
(`q_seasonal_decompose_revenue` — same trend window, same det-summed
day-of-week seasonal), so the feature and the plot can never disagree.

Parity: the three component series are bit-identical across engines
by the decomposition's own contract; each variance is
(Σx² − (Σx)²/n)/n with BOTH folds det_sum-ordered and the final
ratio/clamp one shared text — identical inputs, identical ops. The
cancellation in the moment form costs common precision, not parity
(both engines lose the SAME digits).

100 TB: the decomposition is calendar-bounded after its daily rollup;
this adds one ≤|days|-row aggregate on top — constant cost at any
corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.functions.columns import det_sum
from cost_of_living_data_etl_spark.plans.analytics_extra import (
    _SEASONAL_ORACLE,
    q_seasonal_decompose_revenue,
)
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.plans.mllite import _DSUM_SQL

#: shared texts: population variance from det-summed moments, and the
#: clamped strength ratio (variance-0 guard ⇒ strength 0: a flat
#: component carries no structure to be strong about)
_VAR_EXPR = "(sq_{s} - tot_{s} * tot_{s} / n) / n"
_STRENGTH_EXPR = (
    "CASE WHEN var_{d} > 0 THEN greatest(CAST(0.0 AS DOUBLE),"
    " CAST(1.0 AS DOUBLE) - var_r / var_{d}) ELSE CAST(0.0 AS DOUBLE) END"
)

#: the three component series of the strength formulas
_SERIES = {
    "r": "residual",                # remainder
    "dz": "trend + residual",       # deseasonalized  (y − S)
    "dt": "seasonal + residual",    # detrended       (y − T)
}

_TS_STRENGTH_ORACLE = (
    f"""
WITH decomp AS ({_SEASONAL_ORACLE}),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
"""
    + ",\n".join(
        f"           {_DSUM_SQL.format(x=expr)} AS tot_{s},\n"
        f"           {_DSUM_SQL.format(x=f'({expr}) * ({expr})')} AS sq_{s}"
        for s, expr in _SERIES.items()
    )
    + f"""
    FROM decomp
),
v AS (
    SELECT n,
           {_VAR_EXPR.format(s="r")} AS var_r,
           {_VAR_EXPR.format(s="dz")} AS var_dz,
           {_VAR_EXPR.format(s="dt")} AS var_dt
    FROM m
)
SELECT n AS n_days,
       {_STRENGTH_EXPR.format(d="dz")} AS trend_strength,
       {_STRENGTH_EXPR.format(d="dt")} AS seasonal_strength,
       var_r AS var_residual
FROM v
"""
)


def ts_strength(decomp: DataFrame) -> DataFrame:
    """Strength features from any (trend, seasonal, residual)
    decomposition frame — factored so constructed decompositions can
    pin the closed-form cases (pure trend ⇒ F_T = 1, pure seasonality
    ⇒ F_S = 1, pure noise ⇒ both 0)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for s, expr in _SERIES.items():
        aggs.append(det_sum(expr).alias(f"tot_{s}"))
        aggs.append(det_sum(f"({expr}) * ({expr})").alias(f"sq_{s}"))
    m = decomp.groupBy().agg(*aggs)
    v = m.selectExpr(
        "n",
        f"{_VAR_EXPR.format(s='r')} AS var_r",
        f"{_VAR_EXPR.format(s='dz')} AS var_dz",
        f"{_VAR_EXPR.format(s='dt')} AS var_dt",
    )
    return v.selectExpr(
        "n AS n_days",
        f"{_STRENGTH_EXPR.format(d='dz')} AS trend_strength",
        f"{_STRENGTH_EXPR.format(d='dt')} AS seasonal_strength",
        "var_r AS var_residual",
    )


@register(
    "q_ts_strength_revenue",
    oracle=_TS_STRENGTH_ORACLE,
    tags=("timeseries", "features", "seasonality", "diagnostics"),
)
def q_ts_strength_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend and seasonal strength of daily revenue (Hyndman STL
    features, in [0, 1]) computed on the catalog's own additive
    decomposition — the scalar answer to "does this series need a
    seasonal model, and how much of it is trend vs noise?". See the
    module docstring for formulas and the parity contract."""
    return ts_strength(q_seasonal_decompose_revenue(spark, sf_dir))

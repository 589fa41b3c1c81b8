"""Spatial: grid-blocked nearest-neighbor join.

The fixture schema carries no geography, so coordinates are synthetic
— two independent md5 streams per key on a 1,000,000² integer plane
(the house deterministic-randomness convention) — but the OPERATOR is
the real one: a bounded-radius nearest-neighbor join via grid
blocking, the standard spatial-join shape (geohash/S2 cells play the
grid role on a sphere; the plumbing — cell assignment, 3×3 neighbor
probe, exact verify-and-argmin — is identical).

Integer-plane design keeps it bit-exact end-to-end: coordinates,
Chebyshev radius checks, and squared Euclidean distances are all
BIGINT arithmetic — no haversine transcendentals to drift by an ulp
between engines. The oracle is DEFINITIONAL (brute-force all-pairs
within the radius), so the hash match proves the 3×3 grid probe is
lossless, not just self-consistent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table

GRID_MAX = 1_000_000  # coordinate plane: [0, GRID_MAX)²
GRID_R = 100_000  # search radius (Chebyshev) == cell size

# md5-derived integer coordinate: axis-salted so x and y are
# independent streams; 15 hex digits fit int64 exactly (house idiom)
_COORD = (
    "cast(conv(substring(md5(concat('{axis}:', cast({key} AS STRING))),"
    f" 1, 15), 16, 10) AS BIGINT) % {GRID_MAX}"
)
_COORD_SQL = (
    "CAST(('0x' || substr(md5('{axis}:' || CAST({key} AS VARCHAR)),"
    f" 1, 15)) AS BIGINT) % {GRID_MAX}"
)

_SPATIAL_ORACLE = f"""
WITH c AS (
    SELECT c_custkey,
           {_COORD_SQL.format(axis="x", key="c_custkey")} AS cx,
           {_COORD_SQL.format(axis="y", key="c_custkey")} AS cy
    FROM customer
),
s AS (
    SELECT s_suppkey,
           {_COORD_SQL.format(axis="x", key="s_suppkey")} AS sx,
           {_COORD_SQL.format(axis="y", key="s_suppkey")} AS sy
    FROM supplier
),
cand AS (
    SELECT c.c_custkey, s.s_suppkey,
           (c.cx - s.sx) * (c.cx - s.sx)
             + (c.cy - s.sy) * (c.cy - s.sy) AS d2
    FROM c, s
    WHERE abs(c.cx - s.sx) <= {GRID_R} AND abs(c.cy - s.sy) <= {GRID_R}
),
best AS (
    SELECT c_custkey, s_suppkey, d2,
           row_number() OVER (PARTITION BY c_custkey
                              ORDER BY d2, s_suppkey) AS rk
    FROM cand
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(s_suppkey AS BIGINT) AS nearest_suppkey,
       CAST(d2 AS BIGINT) AS dist2
FROM best WHERE rk = 1 ORDER BY c_custkey
"""


@register(
    "q_spatial_nn_join",
    oracle=_SPATIAL_ORACLE,
    tags=("spatial", "grid-join", "nearest-neighbor"),
)
def q_spatial_nn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier within a Chebyshev radius of each customer on
    the synthetic integer plane, by GRID BLOCKING: suppliers land in
    their (x div R, y div R) cell once; each customer probes its 3×3
    cell neighborhood — with cell size == radius R, any point within
    L∞ ≤ R of the probe lies in those 9 cells, so the probe is
    PROVABLY complete (the brute-force oracle checks exactly that).
    Candidates then verify the radius and argmin exact squared
    Euclidean distance with (d2, key) tie-break.

    This is the spatial-join pattern: swap the integer grid for
    geohash/S2 cells and the radius check for haversine, and the plan
    is a production store-to-warehouse assignment. All-integer here —
    coordinates, radius, distances — so both engines are bit-exact
    with no transcendental drift.

    100 TB: suppliers shuffle once to cells; customers replicate ×9
    (cell-key pairs, no payload); per-cell candidate lists are
    density-bounded, and the argmin is a partial-agg `min(struct)` —
    no global sort, no all-pairs.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(_COORD.format(axis="x", key="c_custkey")).alias("cx"),
        F.expr(_COORD.format(axis="y", key="c_custkey")).alias("cy"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr(_COORD.format(axis="x", key="s_suppkey")).alias("sx"),
        F.expr(_COORD.format(axis="y", key="s_suppkey")).alias("sy"),
    )
    s_cells = s.select(
        "s_suppkey",
        "sx",
        "sy",
        F.expr(f"sx div {GRID_R}").alias("ci"),
        F.expr(f"sy div {GRID_R}").alias("cj"),
    )
    offsets = F.expr(
        "explode(array(-1, 0, 1))"
    )  # two explodes -> 9 probe cells
    c_probes = (
        c.select("c_custkey", "cx", "cy", offsets.alias("di"))
        .select("c_custkey", "cx", "cy", "di", offsets.alias("dj"))
        .select(
            "c_custkey",
            "cx",
            "cy",
            F.expr(f"cx div {GRID_R} + di").alias("ci"),
            F.expr(f"cy div {GRID_R} + dj").alias("cj"),
        )
    )
    cand = (
        c_probes.join(s_cells, ["ci", "cj"])
        .filter(
            (F.abs(F.col("cx") - F.col("sx")) <= GRID_R)
            & (F.abs(F.col("cy") - F.col("sy")) <= GRID_R)
        )
        .select(
            "c_custkey",
            "s_suppkey",
            (
                (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx"))
                + (F.col("cy") - F.col("sy")) * (F.col("cy") - F.col("sy"))
            ).alias("d2"),
        )
    )
    best = (
        cand.groupBy("c_custkey")
        .agg(F.min(F.struct("d2", "s_suppkey")).alias("m"))
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("m.s_suppkey").cast("long").alias("nearest_suppkey"),
            F.col("m.d2").cast("long").alias("dist2"),
        )
    )
    return best.orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Moran's I spatial autocorrelation over the customer grid
# ---------------------------------------------------------------------------

MORAN_CELL = 100_000  # 10×10 aggregation grid over the coordinate plane

#: shared texts: grid-cell id (exact: coords < 1e6 divide exactly in
#: doubles), cell mean from exact cent sums, and the I ratio
_GCELL = f"CAST(floor({{c}} / CAST({MORAN_CELL} AS DOUBLE)) AS INT)"
_CELL_MEAN = "CAST(cents AS DOUBLE) / (CAST(100.0 AS DOUBLE) * n)"
_MORAN_I = (
    "CASE WHEN z2 > 0 AND w > 0 THEN"
    " (CAST(n_cells AS DOUBLE) / w) * (cross_sum / z2)"
    " ELSE NULL END"
)
_MORAN_E = (
    "CASE WHEN n_cells > 1 THEN"
    " CAST(-1.0 AS DOUBLE) / (n_cells - 1) ELSE NULL END"
)

_MORAN_ORACLE = f"""
WITH pts AS (
    SELECT {_GCELL.format(c=_COORD_SQL.format(axis="x", key="c_custkey"))} AS gx,
           {_GCELL.format(c=_COORD_SQL.format(axis="y", key="c_custkey"))} AS gy,
           CAST(round(c_acctbal * 100) AS BIGINT) AS yc
    FROM customer
),
cells AS (
    SELECT gx, gy, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(yc) AS BIGINT) AS cents
    FROM pts GROUP BY 1, 2
),
vals AS (SELECT gx, gy, {_CELL_MEAN} AS v FROM cells),
st AS (
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           {{fold_v}} / count(*) AS vbar
    FROM vals
),
zc AS (SELECT gx, gy, v - vbar AS z FROM vals, st),
adj AS (
    SELECT CAST(count(*) AS BIGINT) AS w, {{fold_cross}} AS cross_sum
    FROM zc a JOIN zc b
      ON abs(a.gx - b.gx) + abs(a.gy - b.gy) = 1
),
z2t AS (SELECT {{fold_z2}} AS z2 FROM zc)
SELECT st.n_cells, adj.w AS n_adjacent_pairs,
       {_MORAN_I} AS moran_i, {_MORAN_E} AS expected_i
FROM st, adj, z2t
""".format(
    fold_v="list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_sort(list(v))), (a, b) -> a + b)",
    fold_cross="list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_sort(list(a.z * b.z))), (a, b) -> a + b)",
    fold_z2="list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_sort(list(z * z))), (a, b) -> a + b)",
)


def moran_i(vals: DataFrame) -> DataFrame:
    """Moran's I over (gx, gy, v) grid cells with binary rook
    adjacency: I = (n/W)·Σ_adj z_i z_j / Σ z_i², z = v − v̄. All sums
    are det-ordered folds over the bounded cell grid; NULL when the
    values are constant (zero variance) or no cell has a neighbour —
    the statistic is undefined there, not zero. Expected value under
    no autocorrelation E[I] = −1/(n−1) emitted beside it."""
    st = vals.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (
            F.expr(
                "aggregate(array_sort(collect_list(v)),"
                " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            )
            / F.count(F.lit(1))
        ).alias("vbar"),
    )
    zc = vals.crossJoin(F.broadcast(st)).select(
        "gx", "gy", (F.col("v") - F.col("vbar")).alias("z")
    )
    a, b = zc.alias("a"), zc.alias("b")
    adj = (
        a.join(
            b,
            (
                F.abs(F.col("a.gx") - F.col("b.gx"))
                + F.abs(F.col("a.gy") - F.col("b.gy"))
            )
            == 1,
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).cast("long").alias("w"),
            F.expr(
                "aggregate(array_sort(collect_list(a.z * b.z)),"
                " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            ).alias("cross_sum"),
        )
    )
    z2t = zc.groupBy().agg(
        F.expr(
            "aggregate(array_sort(collect_list(z * z)),"
            " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("z2")
    )
    return (
        st.crossJoin(F.broadcast(adj))
        .crossJoin(F.broadcast(z2t))
        .selectExpr(
            "n_cells",
            "w AS n_adjacent_pairs",
            f"{_MORAN_I} AS moran_i",
            f"{_MORAN_E} AS expected_i",
        )
    )


@register(
    "q_moran_i_customer_balance",
    oracle=_MORAN_ORACLE,
    tags=("spatial", "autocorrelation", "moran", "statistics"),
)
def q_moran_i_customer_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Moran's I spatial autocorrelation of mean customer account
    balance over the 10×10 grid of the synthetic coordinate plane —
    the "is this attribute spatially clustered?" statistic beside the
    spatial NN join (I > E[I]: clustering; ≈ E[I] = −1/(n−1): spatial
    randomness — which is the truth here, since md5 coordinates are
    independent of balances, making the fixture a null-calibration
    check). Cell means come from exact cent sums; every float sum is
    a det-ordered fold over the ≤100-cell grid; rook-adjacency weights
    are exact counts. See `moran_i`.

    100 TB: one partial-agg pass to the bounded cell grid (cells are
    geohash/S2 buckets in production); the statistic is grid-bounded
    regardless of point count."""
    pts = load_table(spark, sf_dir, "customer").select(
        F.expr(
            _GCELL.format(c=_COORD.format(axis="x", key="c_custkey"))
        ).alias("gx"),
        F.expr(
            _GCELL.format(c=_COORD.format(axis="y", key="c_custkey"))
        ).alias("gy"),
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("yc"),
    )
    cells = pts.groupBy("gx", "gy").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yc").cast("long").alias("cents"),
    )
    vals = cells.select("gx", "gy", F.expr(_CELL_MEAN).alias("v"))
    return moran_i(vals)


# ---------------------------------------------------------------------------
# Getis-Ord G* hotspot scores (local complement of the global Moran's I)
# ---------------------------------------------------------------------------

#: G*ᵢ z-score, ONE shared text over exact neighbourhood sums:
#: (Σ_j w_ij v_j − v̄·Wᵢ) / (S·√((n·Wᵢ − Wᵢ²)/(n−1))), wᵢᵢ = 1
#: (the star variant includes the cell itself); Wᵢ = |neighbourhood|.
_GSTAR = (
    "CASE WHEN n_cells > 1 AND (CAST(n_cells AS DOUBLE) * wi - wi * wi) > 0"
    " AND s2 > 0 THEN"
    " (nsum - vbar * wi)"
    " / (sqrt(s2) * sqrt((CAST(n_cells AS DOUBLE) * wi - wi * wi)"
    " / (n_cells - 1.0)))"
    " ELSE NULL END"
)

_GSTAR_ORACLE = f"""
WITH pts AS (
    SELECT {_GCELL.format(c=_COORD_SQL.format(axis="x", key="c_custkey"))} AS gx,
           {_GCELL.format(c=_COORD_SQL.format(axis="y", key="c_custkey"))} AS gy,
           CAST(round(c_acctbal * 100) AS BIGINT) AS yc
    FROM customer
),
cells AS (
    SELECT gx, gy, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(yc) AS BIGINT) AS cents
    FROM pts GROUP BY 1, 2
),
vals AS (SELECT gx, gy, {_CELL_MEAN} AS v FROM cells),
st AS (
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           {{fold_v}} / count(*) AS vbar,
           {{fold_v2}} / count(*) AS v2bar
    FROM vals
),
nb AS (
    SELECT a.gx, a.gy,
           CAST(count(*) AS BIGINT) AS wi,
           {{fold_nsum}} AS nsum
    FROM vals a JOIN vals b
      ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
    GROUP BY a.gx, a.gy
),
z AS (
    SELECT nb.gx, nb.gy, nb.wi, st.n_cells,
           nb.nsum, st.vbar,
           greatest(st.v2bar - st.vbar * st.vbar, CAST(0.0 AS DOUBLE)) AS s2
    FROM nb, st
)
SELECT CAST(gx AS INT) AS gx, CAST(gy AS INT) AS gy,
       CAST(wi AS BIGINT) AS n_neighbourhood,
       {_GSTAR} AS gstar_z
FROM z
""".format(
    fold_v="list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_sort(list(v))), (a, b) -> a + b)",
    fold_v2="list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_sort(list(v * v))), (a, b) -> a + b)",
    fold_nsum="list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_sort(list(b.v))), (a, b) -> a + b)",
)


def gstar_scores(vals: DataFrame) -> DataFrame:
    """Getis-Ord G*ᵢ z-scores over (gx, gy, v) cells with binary
    queen-neighbourhood weights (Chebyshev ≤ 1, self included): per
    cell, how far its NEIGHBOURHOOD total sits from what spatial
    randomness predicts — positive = hot spot, negative = cold spot;
    NULL on zero-variance surfaces or degenerate denominators. All
    sums det-ordered folds over the bounded grid; one shared z text."""
    st = vals.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (
            F.expr(
                "aggregate(array_sort(collect_list(v)),"
                " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            )
            / F.count(F.lit(1))
        ).alias("vbar"),
        (
            F.expr(
                "aggregate(array_sort(collect_list(v * v)),"
                " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            )
            / F.count(F.lit(1))
        ).alias("v2bar"),
    )
    a, b = vals.alias("a"), vals.alias("b")
    nb = (
        a.join(
            b,
            (F.abs(F.col("a.gx") - F.col("b.gx")) <= 1)
            & (F.abs(F.col("a.gy") - F.col("b.gy")) <= 1),
        )
        .groupBy(F.col("a.gx").alias("gx"), F.col("a.gy").alias("gy"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("wi"),
            F.expr(
                "aggregate(array_sort(collect_list(b.v)),"
                " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            ).alias("nsum"),
        )
    )
    z = nb.crossJoin(F.broadcast(st)).select(
        "gx",
        "gy",
        "wi",
        "n_cells",
        "nsum",
        "vbar",
        F.expr(
            "greatest(v2bar - vbar * vbar, CAST(0.0 AS DOUBLE))"
        ).alias("s2"),
    )
    return z.selectExpr(
        "CAST(gx AS INT) AS gx",
        "CAST(gy AS INT) AS gy",
        "CAST(wi AS BIGINT) AS n_neighbourhood",
        f"{_GSTAR} AS gstar_z",
    )


@register(
    "q_gstar_hotspots_customer_balance",
    oracle=_GSTAR_ORACLE,
    tags=("spatial", "hotspot", "getis-ord", "statistics"),
)
def q_gstar_hotspots_customer_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Getis-Ord G* hotspot map of mean customer balance over the
    synthetic 10×10 grid — the LOCAL complement of the global Moran's
    I: per cell, the z-score of its queen-neighbourhood total against
    spatial randomness (hot/cold spots the global statistic averages
    away). Same exact-cent cell means, det-ordered folds, bounded-grid
    scale shape as `q_moran_i_customer_balance`; see `gstar_scores`."""
    pts = load_table(spark, sf_dir, "customer").select(
        F.expr(
            _GCELL.format(c=_COORD.format(axis="x", key="c_custkey"))
        ).alias("gx"),
        F.expr(
            _GCELL.format(c=_COORD.format(axis="y", key="c_custkey"))
        ).alias("gy"),
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("yc"),
    )
    cells = pts.groupBy("gx", "gy").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yc").cast("long").alias("cents"),
    )
    vals = cells.select("gx", "gy", F.expr(_CELL_MEAN).alias("v"))
    return gstar_scores(vals).orderBy("gx", "gy")

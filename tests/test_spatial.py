"""Spatial grid join vs an engine-independent Python brute force —
the third vote beside Spark and the DuckDB oracle, reimplementing the
md5 coordinates from hashlib.
"""

from __future__ import annotations

import hashlib

from cost_of_living_data_etl_spark.plans.spatial import (
    GRID_MAX,
    GRID_R,
    q_spatial_nn_join,
)


def _coord(axis: str, key: int) -> int:
    h = hashlib.md5(f"{axis}:{key}".encode()).hexdigest()[:15]
    return int(h, 16) % GRID_MAX


def test_spatial_nn_matches_python_bruteforce(spark, sf_smoke):
    import duckdb

    cust = [
        r[0]
        for r in duckdb.sql(
            f"SELECT c_custkey FROM '{sf_smoke}/customer.parquet'"
        ).fetchall()
    ]
    supp = [
        r[0]
        for r in duckdb.sql(
            f"SELECT s_suppkey FROM '{sf_smoke}/supplier.parquet'"
        ).fetchall()
    ]
    spos = [(k, _coord("x", k), _coord("y", k)) for k in supp]
    want = {}
    for ck in cust:
        cx, cy = _coord("x", ck), _coord("y", ck)
        best = None
        for sk, sx, sy in spos:
            if abs(cx - sx) <= GRID_R and abs(cy - sy) <= GRID_R:
                d2 = (cx - sx) ** 2 + (cy - sy) ** 2
                cand = (d2, sk)
                if best is None or cand < best:
                    best = cand
        if best is not None:
            want[ck] = (best[1], best[0])

    got = {
        r["c_custkey"]: (r["nearest_suppkey"], r["dist2"])
        for r in q_spatial_nn_join(spark, sf_smoke).collect()
    }
    assert got == want
    assert len(got) > 0  # the radius actually matches someone


def test_moran_checkerboard_is_exactly_minus_one(spark):
    """2×2 checkerboard (±1): every rook pair is opposite-signed —
    perfect negative autocorrelation, I = (4/8)·(−8/4) = −1 exactly."""
    from cost_of_living_data_etl_spark.plans.spatial import moran_i

    vals = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, -1.0), (1, 0, -1.0), (1, 1, 1.0)],
        "gx int, gy int, v double",
    )
    r = moran_i(vals).collect()[0]
    assert (r["n_cells"], r["n_adjacent_pairs"]) == (4, 8)
    assert r["moran_i"] == -1.0
    assert r["expected_i"] == -1.0 / 3


def test_moran_clustered_line_and_degenerate_null(spark):
    """1×4 line (1, 1, −1, −1): neighbours mostly share sign —
    I = (4/6)·(2/4) exactly (same op order as the shared text). A
    constant surface has zero variance: I is NULL, not 0."""
    from cost_of_living_data_etl_spark.plans.spatial import moran_i

    line = spark.createDataFrame(
        [(0, 0, 1.0), (1, 0, 1.0), (2, 0, -1.0), (3, 0, -1.0)],
        "gx int, gy int, v double",
    )
    r = moran_i(line).collect()[0]
    assert r["n_adjacent_pairs"] == 6
    assert r["moran_i"] == (4.0 / 6.0) * (2.0 / 4.0)

    flat = spark.createDataFrame(
        [(0, 0, 5.0), (1, 0, 5.0), (0, 1, 5.0)], "gx int, gy int, v double"
    )
    assert moran_i(flat).collect()[0]["moran_i"] is None


def test_gstar_single_hot_cell_and_flat_null(spark):
    """4×4 flat field with one hot cell: the hot cell's G* is the
    maximum and matches the hand formula; a far corner scores
    negative; a constant surface yields NULL everywhere."""
    import math

    from cost_of_living_data_etl_spark.plans.spatial import gstar_scores

    cells = [
        (x, y, 16.0 if (x, y) == (1, 1) else 0.0)
        for x in range(4)
        for y in range(4)
    ]
    got = {
        (r["gx"], r["gy"]): r["gstar_z"]
        for r in gstar_scores(
            spark.createDataFrame(cells, "gx int, gy int, v double")
        ).collect()
    }
    n, vbar, v2bar = 16, 1.0, 16.0
    s2 = v2bar - vbar * vbar  # 15
    def z(wi, nsum):
        return (nsum - vbar * wi) / (
            math.sqrt(s2) * math.sqrt((n * wi - wi * wi) / (n - 1.0))
        )
    assert abs(got[(1, 1)] - z(9, 16.0)) < 1e-12
    # the MAX z belongs to a small neighbourhood containing the hot
    # cell (the corner sees it through wi = 4, not 9) — G* rewards
    # concentration, which is exactly its point; every cell whose
    # neighbourhood misses the hot value scores negative
    best = max(got, key=got.get)
    assert max(abs(best[0] - 1), abs(best[1] - 1)) <= 1
    for (x, y), v in got.items():
        if max(abs(x - 1), abs(y - 1)) > 1:
            assert v < 0, ((x, y), v)
    assert abs(got[(3, 3)] - z(4, 0.0)) < 1e-12

    flat = [(x, y, 7.0) for x in range(4) for y in range(4)]
    for r in gstar_scores(
        spark.createDataFrame(flat, "gx int, gy int, v double")
    ).collect():
        assert r["gstar_z"] is None

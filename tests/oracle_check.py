"""Local re-implementation of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and values
(order-insensitive, float-tolerant). Keeping this in-tree means every
oracle mismatch is caught at `pytest` time, not at driver-verify time.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v,
                na_action="ignore",
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(spark_df, oracle: str, sf_dir: str, rel_tol: float = 1e-6):
    got = _canon(spark_df.toPandas())
    con = duckdb_con(sf_dir)
    try:
        want = _canon(con.execute(oracle).fetchdf())
    finally:
        con.close()

    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"

    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = g.astype("float64").to_numpy()
            wa = w.astype("float64").to_numpy()
            for i, (x, y) in enumerate(zip(ga, wa)):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert math.isclose(x, y, rel_tol=rel_tol, abs_tol=1e-9), (
                    f"col {c} row {i}: spark={x!r} oracle={y!r}"
                )
        else:
            mism = (g.astype(str) != w.astype(str))
            if mism.any():
                i = int(mism.idxmax())
                raise AssertionError(
                    f"col {c} first mismatch at row {i}: "
                    f"spark={g.iloc[i]!r} oracle={w.iloc[i]!r}"
                )

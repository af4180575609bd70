"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side, sorts
columns by name and rows by value, and asserts cell-level equality.
Used by tests to catch hash-mismatches before the driver does.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # DuckDB DATE materializes as datetime64 in pandas while Spark
            # DateType gives datetime.date objects; render midnight-only
            # columns as dates so both sides normalize identically.
            # Timestamps compare at microsecond precision (Spark
            # TimestampType = micros; DuckDB TIMESTAMP = micros).
            nonnull = s.dropna()
            if len(nonnull) and (nonnull.dt.normalize() == nonnull).all():
                rendered = s.dt.strftime("%Y-%m-%d")
            else:
                rendered = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
            # strftime leaves NaN where the input was NaT — pin missing to
            # None so object columns never mix NaN and None (pandas is
            # deprecating NaN==None equality in comparisons)
            df[c] = rendered.astype(object).where(s.notna(), None)
        elif s.dtype == object:
            df[c] = s.map(_norm_cell)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype(float)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def _norm_cell(v):
    import datetime

    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    # scalar missing markers beyond None/NaN: pd.NA (nullable dtypes
    # rendered to object) and pd.NaT — normalize all to None
    if v is pd.NA or v is pd.NaT:
        return None
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0):
            return v.strftime("%Y-%m-%d")
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    return v


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "query") -> None:
    left = _normalize(spark_df.toPandas())
    right = _normalize(oracle_df)
    assert list(left.columns) == list(right.columns), (
        f"{name}: column mismatch spark={list(left.columns)} oracle={list(right.columns)}"
    )
    assert len(left) == len(right), f"{name}: row count spark={len(left)} oracle={len(right)}"
    pd.testing.assert_frame_equal(
        left, right, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9,
        obj=name,
    )


def run_and_compare(spark, sf_dir: str, name: str) -> None:
    from iceberg_geo_poc_spark.registry import all_oracles, all_queries

    qfn = all_queries()[name]
    oracle = all_oracles().get(name)
    sdf = qfn(spark, sf_dir)
    if oracle is None:
        assert sdf.count() >= 0  # rows-only check
        return
    con = duckdb_con(sf_dir)
    try:
        odf = con.sql(oracle).df()
    finally:
        con.close()
    compare(sdf, odf, name)

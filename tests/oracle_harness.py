"""Local replica of the driver's differential-correctness check:
run each suite query on Spark and its oracle SQL on DuckDB over the
same parquet, then compare row-count + column names + exact values
(order-insensitive). Exact equality — the driver hashes values, so
'close' is not good enough; the suite's determinism contract
(decimal accumulation, unique tie-breaks) is what this verifies.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = [
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
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; the .scale rungs are
        # Spark-written parquet DIRECTORIES — glob their part files
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object and s.map(
            lambda v: v is None or isinstance(v, datetime.date)
        ).all() and s.notna().any():
            s = pd.to_datetime(s)
            df[c] = s
        if pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s)
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    sort_cols = list(df.columns)
    df = df.sort_values(by=sort_cols, kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _num_kind(dtype) -> str | None:
    """'int' / 'float' for strictly-numeric dtypes, None otherwise
    (bool is NOT numeric here — pandas treats it as an int subtype)."""
    if pd.api.types.is_bool_dtype(dtype):
        return None
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    return None


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions; empty = pass."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    # int-vs-float dtype skew: value-equal but type-skewed columns
    # (DuckDB SUM(BIGINT) -> HUGEINT -> float64 vs Spark int64) hash
    # DIFFERENTLY in the driver even though the forgiving == compare
    # below passes (123 == 123.0). This was the r14
    # text_classifier_train red row — fail it locally too.
    for c in spark_pdf.columns:
        ks = _num_kind(spark_pdf[c].dtype)
        ko = _num_kind(oracle_pdf[c].dtype)
        if ks and ko and ks != ko:
            problems.append(
                f"column {c}: int/float dtype skew — spark={spark_pdf[c].dtype}"
                f" oracle={oracle_pdf[c].dtype} (driver value-hash diverges;"
                f" CAST the oracle or align the Spark type)"
            )
    if problems:
        return problems
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(sv, ov))
            if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"column {c}: {len(bad)}/{len(sv)} values differ; first at sorted-row {i}: spark={x!r} oracle={y!r}"
            )
    return problems


def run_one(spark, con, name: str, fn, sql: str, sf_dir: str) -> list[str]:
    spark_df = fn(spark, sf_dir)
    oracle_pdf = con.execute(sql).fetchdf()
    return compare(spark_df, oracle_pdf)

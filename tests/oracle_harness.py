"""Local mimic of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() twin on DuckDB over the same parquet dir, compare
row count + column names + order-insensitive values.

Comparison is EXACT (bit-level for floats): our aggregates are built to be
order-independent (decimal summation), so any mismatch is a real semantics
bug, not noise.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = -1
    oracle_rows: int = -1
    mismatches: list = field(default_factory=list)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):  # Spark-written rungs (scaleup.py) are dirs
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            # normalize ns-vs-us precision differences
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            pass
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort", na_position="last").reset_index(
        drop=True
    )


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
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def compare_one(name: str, spark_df, oracle_pdf: pd.DataFrame) -> CompareResult:
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        return CompareResult(
            name, False,
            f"column mismatch: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}",
            len(spdf), len(oracle_pdf),
        )
    if len(spdf) != len(oracle_pdf):
        return CompareResult(
            name, False, f"row count: spark={len(spdf)} oracle={len(oracle_pdf)}",
            len(spdf), len(oracle_pdf),
        )
    a, b = _canon(spdf), _canon(oracle_pdf)
    # vectorized fast path: canonical dtypes + row order make equals() exact
    # (NaNs in matching positions compare equal); fall back to the per-cell
    # loop only to REPORT mismatches
    if a.equals(b):
        return CompareResult(name, True, "", len(spdf), len(oracle_pdf))
    mismatches = []
    for i in range(len(a)):
        for c in a.columns:
            va, vb = a.iloc[i][c], b.iloc[i][c]
            if not _values_equal(va, vb):
                mismatches.append((i, c, va, vb))
                if len(mismatches) >= 5:
                    break
        if len(mismatches) >= 5:
            break
    if mismatches:
        return CompareResult(
            name, False, f"value mismatches (first 5): {mismatches}", len(spdf), len(oracle_pdf),
            mismatches,
        )
    # equals() was stricter than cell semantics (e.g. None vs NaN in object
    # columns) but the authoritative per-cell loop found nothing
    return CompareResult(name, True, "", len(spdf), len(oracle_pdf))


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> list[CompareResult]:
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_conn(sf_dir)
    results = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                results.append(CompareResult(name, n >= 0, f"rows-only check: {n} rows", n, -1))
                continue
            opdf = con.execute(oracles[name]).df()
            results.append(compare_one(name, sdf, opdf))
        except Exception as e:  # surface, keep going
            results.append(CompareResult(name, False, f"EXCEPTION: {type(e).__name__}: {e}"))
    return results

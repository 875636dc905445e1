"""Local replica of the driver's correctness gate (SURVEY.md §5.2.1).

Runs a registry query on Spark and its DuckDB oracle on the same parquet
tables, then compares row count, column names, and order-insensitive
values — the same three checks the driver records in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pandas as pd

from data_pipelines_using_llm_spark.sources.tables import TABLE_NAMES

FLOAT_ATOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            sample = s.dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (dt.date, dt.datetime, pd.Timestamp)
            ):
                df[c] = pd.to_datetime(s)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "bool":
            df[c] = df[c].astype("bool")
    sort_cols = list(df.columns)
    if len(df):
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    return df


def string_repr_hash(pdf: pd.DataFrame) -> str:
    """Order-insensitive hash over raw string representations — the most
    conservative model of the driver's value-hash (no type normalization),
    so DATE-vs-TIMESTAMP and int-width representation drift gets caught."""
    import hashlib

    pdf = pdf[sorted(pdf.columns)]
    recs = sorted(tuple(str(v) for v in r) for r in pdf.itertuples(index=False))
    return hashlib.md5(str(recs).encode()).hexdigest()


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count {len(spark_pdf)} != oracle {len(oracle_pdf)}")
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns {sorted(spark_pdf.columns)} != oracle {sorted(oracle_pdf.columns)}"
        )
    if problems:
        return problems

    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(
            bv.dtype, np.floating
        ):
            av = av.astype("float64")
            bv = bv.astype("float64")
            both_nan = np.isnan(av) & np.isnan(bv)
            close = np.isclose(av, bv, rtol=0.0, atol=FLOAT_ATOL) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                problems.append(
                    f"column {c!r}: {int((~close).sum())} value mismatches, "
                    f"first at row {i}: {av[i]!r} vs {bv[i]!r}"
                )
            elif not ((av == bv) | both_nan).all():
                n = int((~((av == bv) | both_nan)).sum())
                problems.append(
                    f"column {c!r}: {n} values differ within {FLOAT_ATOL} "
                    "(exact-hash risk — round harder in the query)"
                )
        else:
            eq = (av == bv) | (pd.isna(a[c]).to_numpy() & pd.isna(b[c]).to_numpy())
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(
                    f"column {c!r}: {int((~eq).sum())} value mismatches, "
                    f"first at row {i}: {av[i]!r} vs {bv[i]!r}"
                )
    if not problems and string_repr_hash(spark_pdf) != string_repr_hash(oracle_pdf):
        for c in spark_pdf.columns:
            sa = sorted(map(str, spark_pdf[c]))
            sb = sorted(map(str, oracle_pdf[c]))
            if sa != sb:
                i = next(j for j, (x, y) in enumerate(zip(sa, sb)) if x != y)
                problems.append(
                    f"column {c!r}: string repr differs (hash risk), e.g. "
                    f"{sa[i]!r} vs {sb[i]!r}"
                )
    return problems


def run_check(spark, sf_dir: str, name: str) -> list[str]:
    from data_pipelines_using_llm_spark.registry import all_queries

    spec = all_queries()[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return [] if len(spark_pdf) >= 0 else ["spark query failed"]
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.sql(spec.oracle).df()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)

"""Local imitation of the driver's DuckDB oracle comparison."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_run(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].round(6)
        else:
            try:
                pdf[c] = pdf[c].astype("int64")
            except (TypeError, ValueError):
                pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def compare(spark_df, sf_dir: str, sql: str) -> tuple[bool, str]:
    a = normalize(spark_df.toPandas())
    b = normalize(duck_run(sf_dir, sql))
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return False, f"row counts differ: spark={len(a)} duck={len(b)}"
    eq = a.equals(b)
    if not eq:
        diff = (a != b) & ~(a.isna() & b.isna())
        rows = diff.any(axis=1)
        return False, f"values differ in {int(rows.sum())} rows; first:\n{a[rows].head(3)}\nvs\n{b[rows].head(3)}"
    return True, "ok"

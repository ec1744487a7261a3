"""Emulates the driver's gate: run a queries() entry in Spark and its
oracle_sql() in DuckDB on the same parquet dir; compare order-insensitively."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        except duckdb.Error:
            pass
    return con.sql(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_match(spark_df, duck_df: pd.DataFrame, name: str, atol: float = 1e-8):
    s = normalize(spark_df.toPandas())
    d = normalize(duck_df)
    assert list(s.columns) == list(d.columns), f"{name}: columns {list(s.columns)} vs {list(d.columns)}"
    assert len(s) == len(d), f"{name}: row count {len(s)} vs {len(d)}"
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind in "fc" or dv.dtype.kind in "fc":
            diff = (sv.astype(float) - dv.astype(float)).abs()
            bad = diff > atol
            assert not bad.any(), (
                f"{name}.{c}: {int(bad.sum())} mismatches, max diff {diff.max()}\n"
                f"{pd.concat([s[bad], d[bad]], axis=1).head()}"
            )
        else:
            eq = sv.astype(str).values == dv.astype(str).values
            assert eq.all(), (
                f"{name}.{c}: {(~eq).sum()} mismatches\n"
                f"spark:\n{s[~eq].head()}\nduck:\n{d[~eq].head()}"
            )

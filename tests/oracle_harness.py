"""Mini replica of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet tables, compare row count,
column names, and an order-insensitive canonical value set.

If a query passes here with *exact* canonical-string equality, the
driver's value-hash comparison should also pass.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from legalchatbot_vectordb_exp_spark.io_tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            f = float(v)
            return _canon(f)
    except Exception:
        pass
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str):
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    sc = canonical_rows(s_cols, s_rows)
    dc = canonical_rows(d_cols, d_rows)
    if sc != dc:
        diff_s = [r for r in sc if r not in set(dc)][:5]
        diff_d = [r for r in dc if r not in set(sc)][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only: {diff_s}\n duck-only: {diff_d}"
        )

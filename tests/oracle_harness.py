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


_TYPE_CLASS = {
    # spark simpleString prefixes / duckdb type names -> coarse class.
    # int vs float is exactly the divergence the driver's value-hash
    # catches but _canon masks (3.0 vs 3 canonicalize identically), so
    # the census must fail on it even when every value compares equal.
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "integer": "int", "hugeint": "int128", "uhugeint": "int128",
    "utinyint": "int", "usmallint": "int", "uinteger": "int",
    "ubigint": "int",
    "float": "float", "double": "float", "real": "float",
    "decimal": "decimal",
    "string": "str", "varchar": "str",
    "boolean": "bool",
    "timestamp": "timestamp", "timestamp_ns": "timestamp",
    "timestamp_ntz": "timestamp",
    "timestamp with time zone": "timestamp",
    "date": "date",
}


def _type_class(t: str) -> str:
    t = str(t).lower()
    base = t.split("(")[0].strip()
    return _TYPE_CLASS.get(base, base)


def check_types(spark_df, rel, name: str) -> None:
    """Strict cross-engine type check (r6 VERDICT #3): a column whose
    coarse type class differs between Spark and DuckDB (int vs float,
    or any HUGEINT/DECIMAL on the DuckDB side) hash-diverges in the
    driver even when all values compare equal under _canon."""
    s_types = {f.name: _type_class(f.dataType.simpleString())
               for f in spark_df.schema.fields}
    d_types = {c: _type_class(t) for c, t in zip(rel.columns, rel.types)}
    bad = []
    for col, dt in d_types.items():
        if dt in ("int128", "decimal"):
            bad.append((col, "duckdb", dt, "hash-fragile type"))
        st = s_types.get(col)
        if st is not None and st != dt and dt not in ("int128", "decimal"):
            bad.append((col, "spark", st, f"duckdb {dt}"))
    assert not bad, f"{name}: strict type mismatch {bad}"


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str,
            strict_types: bool = True):
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    if strict_types:
        check_types(spark_df, con.sql(sql), name)
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

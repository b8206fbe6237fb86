"""Query/oracle registry + shared cross-engine SQL fragments.

Determinism contract for every registered pair (see FIXTURES.md):
identical double fold order, round(…,6) on displayed floats, DECIMAL
for money sums, explicit tie-breaks on ranked output, and md5/sha2 hex
strings as the only hash primitives (bit-identical on both engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from legalchatbot_vectordb_exp_spark.functions import text as _text

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# --------- DuckDB fragments mirroring functions.vector (same fold order)


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]), "
        f"x -> x[1] * x[2])), (acc, x) -> acc + x)"
    )


def sql_norm(v: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({v}::DOUBLE[], x -> x * x)), (acc, x) -> acc + x))"
    )


# whitespace words, trimmed, empties dropped — mirrors
# functions.text.words, using the SAME explicit class (RE2 \s lacks
# \x0B, Java \s has it — defensive cross-engine parity hardening,
# pinned by tests/test_whitespace_parity.py)
def sql_words(text: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(trim({text}), "
        f"'{_text.WS_SPLIT}'), w -> w <> '')"
    )


# Python str.strip() twin — mirrors functions.text.py_strip (RE2 takes
# the same \x{...} escapes as Java regex)
_PY_SPACE = _text.PY_SPACE_CLASS


def sql_py_strip(expr: str) -> str:
    return (
        f"regexp_replace({expr}, '^{_PY_SPACE}+|{_PY_SPACE}+$', '', 'g')"
    )

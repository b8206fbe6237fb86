"""Cross-engine whitespace regression tests.

CORRECTNESS_r05 flagged ``sequence_packing`` as hash-red on the driver:
Java regex ``\\s`` includes ``\\x0B`` (vertical tab) while DuckDB's RE2
``\\s`` does not, so any document containing ``\\x0B`` tokenized
differently between the engine and its oracle.  The fix is one explicit
shared class (``functions.text.ASCII_WS`` / ``WS_SPLIT``); these tests
pin that Spark ``words()``, DuckDB ``sql_words()``, and the Python
``re.ASCII`` twin agree on adversarial whitespace — exactly the
divergence class the driver's data generation can hit and ours may not.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from legalchatbot_vectordb_exp_spark.functions.text import (
    ASCII_WS,
    PUNCT_PATTERN,
    TOKEN_PATTERN,
    WS_SPLIT,
    words,
)
from legalchatbot_vectordb_exp_spark.registry import sql_words

# every ASCII char Java \s matches, plus Unicode spaces that none of
# the engines should split on (they are NOT in the explicit class)
NASTY = [
    "plain text here",
    "vertical\x0btab",                 # the r05 divergence
    "form\x0cfeed and\ttab",
    "cr\rlf\nmix \x0b\x0c\t end",
    "nbsp stays one-token",       # \xa0 not ASCII ws
    "ideographic　space one",      # 　 not ASCII ws
    "line sep stays",             #   not ASCII ws
    "  leading and trailing \x0b ",
    "",
    "\x0b\x0c\t\r\n ",                 # whitespace-only
]


def py_words(text: str) -> list[str]:
    # Python re.ASCII \s == [ \t\n\r\f\v] == the explicit class
    return [w for w in re.split(r"\s+", text.strip(), flags=re.ASCII)
            if w]


def test_ascii_ws_class_is_java_s():
    # the explicit class must be exactly Java's \s membership
    assert set(ASCII_WS.replace(r"\t", "\t").replace(r"\n", "\n")
               .replace(r"\x{000b}", "\x0b").replace(r"\f", "\f")
               .replace(r"\r", "\r")) == set(" \t\n\x0b\f\r")


def test_no_bare_s_in_shared_patterns():
    # a bare \s must never reappear in an oracle-paired pattern
    for pat in (WS_SPLIT, TOKEN_PATTERN, PUNCT_PATTERN):
        assert r"\s" not in pat, pat


def test_words_three_engine_parity(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(NASTY)], "i int, text string"
    ).select("i", words("text").alias("ws"))
    spark_out = {r["i"]: list(r["ws"]) for r in df.collect()}

    con = duckdb.connect()
    duck_out = {}
    for i, t in enumerate(NASTY):
        con.execute(
            f"SELECT {sql_words('?::VARCHAR')} AS ws", [t]
        )
        duck_out[i] = con.fetchone()[0]

    for i, t in enumerate(NASTY):
        expect = py_words(t)
        assert spark_out[i] == expect, (i, t, spark_out[i], expect)
        assert duck_out[i] == expect, (i, t, duck_out[i], expect)


def test_token_and_punct_pattern_parity(spark):
    import pyspark.sql.functions as F

    texts = ["a\x0bb!", "x y?", "1\x0c2;3", "no-ws,here"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    ).select(
        "i",
        F.size(
            F.regexp_extract_all("text", F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("ntok"),
        F.size(
            F.regexp_extract_all("text", F.lit(PUNCT_PATTERN), F.lit(0))
        ).alias("npunct"),
    )
    spark_out = {r["i"]: (r["ntok"], r["npunct"]) for r in df.collect()}

    con = duckdb.connect()
    for i, t in enumerate(texts):
        con.execute(
            f"SELECT len(regexp_extract_all(?, '{TOKEN_PATTERN}')), "
            f"len(regexp_extract_all(?, '{PUNCT_PATTERN}'))",
            [t, t],
        )
        assert tuple(con.fetchone()) == spark_out[i], (i, t)


def test_sequence_packing_survives_vertical_tab(spark, tmp_path):
    """End-to-end: a documents table salted with \\x0B/\\x0C text must
    hash-match between q_sequence_packing and its oracle."""
    import pyspark.sql.functions as F

    from legalchatbot_vectordb_exp_spark.queries import ORACLES, QUERIES
    from tests.oracle_harness import compare

    texts = NASTY[:8] + ["normal doc body with several words"] * 4
    pdir = str(tmp_path / "wsdata")
    import os
    import shutil

    import pandas as pd

    os.makedirs(pdir, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "source": [f"src{i % 3}" for i in range(len(texts))],
            "text": texts,
        }
    ).to_parquet(f"{pdir}/documents.parquet", index=False)
    # the harness registers every table; borrow the smoke tables
    for t in ("region nation customer supplier part orders lineitem "
              "events embeddings").split():
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", f"{pdir}/{t}.parquet"
        )

    from tests.oracle_harness import duckdb_conn

    con = duckdb_conn(pdir)
    name = "sequence_packing"
    compare(QUERIES[name](spark, pdir), con, ORACLES[name], name)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship single-query top-k cosine search at
sf0.001.  ``queries()`` / ``oracle_sql()`` — the operator registry from
``legalchatbot_vectordb_exp_spark.queries`` (each Spark query paired
with a DuckDB oracle where SQL-expressible).

Registration ORDER is the freshness-rotation POLICY AS CODE (round-16
verdict item: "encode the rotation as code, not prose"): the driver
samples a prefix of ``queries()`` for its correctness report (50 per
round), so the order is computed at import time from the committed
``CORRECTNESS_r*.json`` artifacts — every query keyed by the LAST
round it earned a driver row, stalest first (a query never sampled,
i.e. newly added this round, sorts before everything).  With 50 slots
per round and ~175 queries, every query re-earns a driver-green row at
least every ⌈175/50⌉ = 4 rounds, with no hand-maintained list to rot.
Ties (same last round) break by registration order, which keeps
same-family queries adjacent and the sample deterministic.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from legalchatbot_vectordb_exp_spark.queries import ORACLES, QUERIES  # noqa: E402


def _last_driver_round() -> dict[str, int]:
    """query name → last round with a committed driver row (0 if
    never sampled).  Reads the CORRECTNESS_r*.json artifacts next to
    this module; malformed/missing artifacts degrade to {} (original
    registration order) rather than breaking the driver contract."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for q in data:
            last[q] = max(last.get(q, 0), rnd)
    return last


def _ordered(d: dict) -> dict:
    last = _last_driver_round()
    reg_pos = {name: i for i, name in enumerate(QUERIES)}
    names = sorted(d, key=lambda q: (last.get(q, 0), reg_pos.get(q, 0)))
    return {q: d[q] for q in names}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["topk_cosine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLES)

"""As-of join edge cases: no prior right row, exact-timestamp tie,
latest-of-several, key isolation."""

from __future__ import annotations

import datetime as dt

from legalchatbot_vectordb_exp_spark.operators.asof import asof_join


def t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, t(10), "L1"),   # right rows at 5 and 9 → picks 9
            (1, t(4), "L2"),    # before any right row → null
            (1, t(5), "L3"),    # tie with right at 5 → matches (<=)
            (2, t(30), "L4"),   # key 2 has its own rights only
        ],
        ["k", "ts", "lname"],
    )
    right = spark.createDataFrame(
        [
            (1, t(5), "R5"),
            (1, t(9), "R9"),
            (2, t(29), "R29"),
            (3, t(1), "R_other"),  # never leaks across keys
        ],
        ["k", "ts", "rname"],
    )
    out = {
        r.lname: r.right_rname
        for r in asof_join(left, right, on="k", ts="ts").collect()
    }
    assert out == {"L1": "R9", "L2": None, "L3": "R5", "L4": "R29"}


def test_asof_join_preserves_left_columns_and_count(spark):
    left = spark.createDataFrame(
        [(1, t(i), f"x{i}") for i in range(20)], ["k", "ts", "payload"]
    )
    right = spark.createDataFrame([(1, t(7), 7.0)], ["k", "ts", "v"])
    out = asof_join(left, right, on="k", ts="ts")
    rows = out.collect()
    assert len(rows) == 20  # left join: every left row survives
    assert {r.payload for r in rows} == {f"x{i}" for i in range(20)}
    matched = [r for r in rows if r.right_v is not None]
    assert all(r.ts >= t(7) for r in matched)
    assert len(matched) == 13  # minutes 7..19

"""Pre-snapshot gate for the bench scoreboard (round-14 verdict item
4): two consecutive rounds lost ALL 150 timings to ONE broken query
because ``bench.py`` had no per-query fault isolation.  This gate runs
the harness in-process on a tiny poisoned suite and pins the contract
mechanically: a query that raises lands in ``errors``, every other
query still gets a timing, and the artifact is always produced.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench  # noqa: E402

SF_DIR = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
)


def _good(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/region.parquet").select(
        "r_regionkey"
    )


def _boom(spark, sf_dir):
    raise RuntimeError("poisoned query (gate fixture)")


def _boom_lazy(spark, sf_dir):
    # fails at EXECUTION time, not plan time — the shape that voided
    # rounds 13/14 (an exception out of the noop-sink save)
    import pyspark.sql.functions as F

    return spark.read.parquet(f"{sf_dir}/region.parquet").select(
        F.raise_error(F.lit("poisoned at execution"))
    )


def test_one_broken_query_never_voids_the_suite(spark):
    payload = bench.main(
        queries={
            "aaa_boom": _boom,  # alphabetically FIRST, like round 13
            "good_scan": _good,
            "zzz_boom_lazy": _boom_lazy,
        },
        sf_dir=SF_DIR,
        stop=False,  # shared pytest session stays up
        emit=False,  # do not clobber bench_latest.json
    )
    assert set(payload["errors"]) == {"aaa_boom", "zzz_boom_lazy"}
    assert "good_scan" in payload["queries"]
    assert payload["queries"]["good_scan"] >= 0.0
    assert "aaa_boom" not in payload["queries"]
    assert payload["value"] >= 0.0


def test_clean_suite_has_no_errors_key(spark):
    payload = bench.main(
        queries={"good_scan": _good},
        sf_dir=SF_DIR,
        stop=False,
        emit=False,
    )
    assert "errors" not in payload
    assert set(payload["queries"]) == {"good_scan"}

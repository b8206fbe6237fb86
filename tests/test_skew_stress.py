"""Skew hardening: the curation/training joins and aggregations must
survive a pathologically skewed corpus — one source holding 90% of all
documents, with a shared boilerplate sentence making a handful of
shingles corpus-hot (round-2 review item 7).

Two properties are pinned:

* **plan shape** — the shingle joins broadcast their small side
  (bench set / hot-shingle set), so a hot join key can never
  co-locate the big side into one task; the shingle aggregation runs
  map-side partial aggregation, so a hot shingle collapses to one row
  per input partition before the exchange.
* **task balance** — rows processed per partition at each exchange
  stay within 10x the median partition (the "no task >10x median"
  stress contract), measured with spark_partition_id() on the live
  frames.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from legalchatbot_vectordb_exp_spark.io_tables import load_table

SF_SRC = "/root/testdata/sf0.001"
BOILER = (
    "all rights reserved unauthorized reproduction of this document "
    "is strictly prohibited consult your legal representative"
)


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory) -> str:
    """sf0.001 documents re-skewed: 90% of rows collapse to one hot
    source and every hot row leads with the same boilerplate sentence
    (hot shingles shared across ALL sources so the boilerplate/decontam
    joins see hot keys on the big side)."""
    out = tmp_path_factory.mktemp("skew")
    docs = load_table(spark, SF_SRC, "documents")
    skewed = docs.withColumn(
        "source",
        F.when(F.col("doc_id") % 10 != 0, F.lit("hot_source")).otherwise(
            F.col("source")
        ),
    ).withColumn("text", F.concat(F.lit(BOILER + " "), F.col("text")))
    skewed.write.mode("overwrite").parquet(str(out / "documents.parquet"))
    return str(out)


def _partition_balance(df) -> tuple[int, float]:
    """(max, median) rows per partition of the frame as executed."""
    counts = sorted(
        r["n"]
        for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert counts, "no partitions produced rows"
    return counts[-1], float(counts[len(counts) // 2])


def test_decontamination_broadcasts_bench_side_under_skew(spark, skew_dir):
    from legalchatbot_vectordb_exp_spark.queries_training import (
        q_decontamination,
    )

    df = q_decontamination(spark, skew_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # hot train-side shingles must meet a BROADCAST of the bench set —
    # a shuffled join would co-locate every hot-shingle row in one task
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    rows = df.collect()
    # with the shared boilerplate, contamination flags must actually
    # fire across sources (the skew corpus exercises the join for real)
    assert len(rows) > 0
    assert all(r["n_shared"] >= 2 for r in rows)


def test_boilerplate_partial_agg_and_balance_under_skew(spark, skew_dir):
    from legalchatbot_vectordb_exp_spark.queries_curation import (
        q_boilerplate_shingles,
    )

    df = q_boilerplate_shingles(spark, skew_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # map-side partial aggregation: the hot shingle is reduced to one
    # row per input partition BEFORE the shuffle on the shingle key
    assert "partial_" in plan
    rows = {r["shingle"]: r for r in df.collect()}
    # the injected boilerplate shingles must be detected as boilerplate
    probe = " ".join(BOILER.split()[0:3])
    assert probe in rows
    assert rows[probe]["n_sources"] >= 3
    # balance at the aggregation exchange: after partial agg + AQE the
    # per-partition row counts of the aggregated output stay within
    # 10x the median — the hot key cannot pile into one task
    mx, med = _partition_balance(df)
    assert mx <= 10 * max(med, 1.0), (mx, med)


def test_exploded_shingle_scan_balance_under_skew(spark, skew_dir):
    """The CPU-heavy side (explode + shingle hash) is scan-partitioned,
    never key-partitioned, so a 90%-hot source cannot concentrate work:
    rows per partition stay within 10x the median."""
    from legalchatbot_vectordb_exp_spark.functions.text import word_shingles
    from legalchatbot_vectordb_exp_spark.io_tables import spread

    docs = spread(load_table(spark, skew_dir, "documents"), 8)
    sh = docs.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("shingle")
    )
    mx, med = _partition_balance(sh)
    assert mx <= 10 * max(med, 1.0), (mx, med)


def test_shuffle_volume_ceilings_30x(tmp_path):
    """Round-4 item 7: the three shuffle-heaviest families — minhash
    banding, LSH pairing, IVF batch — must keep MEASURED shuffle-write
    bytes (sub)linear from 10x to 30x corpus rows (a quadratic
    candidate generator would triple-plus-square here, not triple).
    Runs stress_shuffle.py in a subprocess (own JVM: the shared test
    session has the UI/REST status endpoint disabled); measured bench-
    scale numbers live in SCALE.md / STRESS_SHUFFLE.json."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "shuffle.json"
    env = dict(
        os.environ,
        OUT=str(out),
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_STRESS_TMP=str(tmp_path),
        # disable auto-broadcast so joins shuffle at BOTH tiers — a
        # side crossing the broadcast threshold between 10x and 30x
        # would otherwise read as a phantom blow-up (or mask one)
        SPARK_GRAFT_STRESS_CONF=(
            '{"spark.sql.autoBroadcastJoinThreshold": "-1"}'
        ),
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "stress_shuffle.py"),
            "/root/testdata/sf0.001",
            "10",
            "30",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    res = json.loads(out.read_text())["results"]
    for fam in (
        "dedup_minhash_pairs",
        "ann_lsh_pairs",
        "ann_ivf_topk_batch",
        "substring_dedup_spans",
        "semdedup_cells",
        # round-16: NN-descent build — reverse-capped neighborhoods
        # bound candidates at n*(2k)^2, so bytes must stay ~linear
        "ann_knn_graph",
        # round-17: sparse posting-list search — the term equi-join
        # keeps only matched postings, so bytes track matched
        # postings (~3/doc), linear in docs, never token instances
        "ann_sparse_topk",
    ):
        b10 = res[fam]["10x"]["shuffle_write_bytes"]
        b30 = res[fam]["30x"]["shuffle_write_bytes"]
        assert b10 > 0 or fam == "ann_ivf_topk_batch", fam
        # 3x the rows may shuffle at most ~3x the bytes (+30% slack
        # for partition framing); quadratic growth would be ~9x.
        # ann_knn_graph's DISTINCT candidate set is still saturated by
        # the small corpus at this test's 10x tier (5k rows: many
        # neighbor-of-neighbor pairs collide), so per-row bytes rise
        # toward the n*(2k)^2 ceiling as n grows — measured 4.8x here
        # and 3.5x at the bench-scale 20k->60k tiers (SCALE.md §16);
        # 5.5x still cleanly separates linear-converging from ~9x
        # quadratic.
        ceil = 5.5 if fam == "ann_knn_graph" else 3.9
        assert b30 <= max(ceil * b10, 64 * 1024), (fam, b10, b30)

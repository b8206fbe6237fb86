"""Top-k planner strategy selection + skew operators + bucketed join."""

from __future__ import annotations

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.io_tables import load_table
from legalchatbot_vectordb_exp_spark.operators.skew import salted_agg, salted_join
from legalchatbot_vectordb_exp_spark.plans.topk_planner import plan_topk_search


def test_planner_single_query_uses_takeordered(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    plan = plan_topk_search(emb, qvec, k=3)
    assert plan.strategy == "exact-takeordered"
    assert plan.result.count() == 3


def test_planner_batch_window_vs_pruned(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    small = plan_topk_search(emb, queries, k=3, corpus_rows=500, query_rows=3)
    assert small.strategy == "exact-window"
    # simulate big-corpus stats: planner flips to the pruned path + hint
    big = plan_topk_search(
        emb, queries, k=3, corpus_rows=10**9, query_rows=100
    )
    assert big.strategy == "exact-window-pruned"
    assert big.hint == "consider-ivf"
    # both strategies return identical results on the real data
    a = sorted(map(tuple, small.result.select("query_id", "vec_id", "rank").collect()))
    b = sorted(map(tuple, big.result.select("query_id", "vec_id", "rank").collect()))
    assert a == b


def test_salted_join_matches_plain_join(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_smoke, "customer").select(
        "c_custkey", "c_name"
    ).withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, cust, on="o_custkey", n_salts=4).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_agg_minmax(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select("event_type", "value")
    direct = (
        ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    )
    salted = salted_agg(
        ev,
        key_cols=["event_type"],
        aggs={"lo": ("value", "min"), "hi": ("value", "max")},
        n_salts=4,
    ).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, salted))


def test_bucketed_join_avoids_shuffle(spark, sf_smoke, tmp_path):
    """Bucketing both sides on the join key co-locates rows: the join
    plan has no shuffle exchange on either side.  (Tables go to the
    session's default warehouse — warehouse.dir is a static conf — and
    are dropped, files included, in the finally block.)"""
    orders = load_table(spark, sf_smoke, "orders")
    li = load_table(spark, sf_smoke, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_ivf_batch_plan_broadcasts_probe_frame(spark, sf_smoke):
    """ann_ivf_topk_batch: the probe frame must broadcast (BHJ) and the
    only exchange in the plan is the per-query window rank — the corpus
    side never shuffles before the join."""
    from legalchatbot_vectordb_exp_spark.queries_ann import (
        q_ann_ivf_topk_batch,
    )

    df = q_ann_ivf_topk_batch(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 1, plan


def test_simhash_pairs_plan_no_cartesian(spark, sf_smoke):
    from legalchatbot_vectordb_exp_spark.queries_dedup import (
        q_dedup_simhash_pairs,
    )

    df = q_dedup_simhash_pairs(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_pairs_blocked_no_driver_collect(spark, sf_smoke):
    """The block-pair pair search must never materialize the corpus on
    the driver: building the plan with DataFrame.collect() poisoned
    must succeed (VERDICT r01 flagged the old collect+broadcast shape)."""
    from pyspark.sql import DataFrame

    from legalchatbot_vectordb_exp_spark.operators.ann import (
        cosine_pairs_blocked,
    )

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    )
    orig = DataFrame.collect

    def poisoned(self):
        raise AssertionError("driver collect() during plan construction")

    DataFrame.collect = poisoned
    try:
        pairs = cosine_pairs_blocked(emb, threshold=0.5, n_blocks=4)
    finally:
        DataFrame.collect = orig
    # evaluating the lazy plan is allowed — only construction is pinned
    assert pairs.columns == ["id_a", "id_b", "cos"]
    rows = pairs.collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert r.cos >= 0.5


def test_cosine_pairs_blocked_matches_bruteforce(spark, sf_smoke):
    """Block-pair result is bit-identical to the O(n²) expression plan
    regardless of block count."""
    from legalchatbot_vectordb_exp_spark.operators.ann import (
        cosine_pairs_blocked,
    )

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    )
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= 0.5)
    )
    expect = sorted(map(tuple, brute.collect()))
    for nb in (1, 3, 8):
        got = sorted(
            map(
                tuple,
                cosine_pairs_blocked(
                    emb, threshold=0.5, n_blocks=nb
                ).collect(),
            )
        )
        assert got == expect, f"n_blocks={nb}"


def test_heap_prune_tie_break_matches_unpruned(spark):
    """Duplicate vectors give bit-identical scores; the per-partition
    prune must keep the same rows the final (score desc, id asc) rank
    would select (ADVICE r01: unstable score-only sort dropped ties)."""
    from legalchatbot_vectordb_exp_spark.operators.topk import (
        topk_search_batch,
    )

    # 12 corpus rows, only 3 distinct vectors → heavy ties at every k
    corpus = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(12)],
        "vec_id long, embedding array<double>",
    ).repartition(4)
    queries = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [0.5, 2.0])],
        "query_id long, query_vec array<double>",
    )
    kw = dict(corpus=corpus, queries=queries, k=2)
    plain = topk_search_batch(prune_per_partition=False, **kw)
    pruned = topk_search_batch(prune_per_partition=True, **kw)
    key = lambda df: sorted(  # noqa: E731
        map(tuple, df.select("query_id", "vec_id", "score", "rank").collect())
    )
    assert key(plain) == key(pruned)


def test_shipping_priority_plan_pushdown_and_takeordered(spark, sf_smoke):
    """Q3 shape: date predicates reach the parquet scans; the top-10 is
    TakeOrderedAndProject over the aggregate, not a global sort."""
    from legalchatbot_vectordb_exp_spark.queries import QUERIES

    df = QUERIES["shipping_priority"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters:" in plan and "l_shipdate" in plan


def test_hybrid_rrf_plan_take_ordered_not_full_sort(spark, sf_smoke):
    """Both retriever top-100 cuts and the final top-20 must be
    take-ordered (per-partition heaps), never a global Sort+Limit."""
    from legalchatbot_vectordb_exp_spark.queries import QUERIES

    df = QUERIES["hybrid_rrf"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") >= 3
    assert "CartesianProduct" not in plan


def test_bm25_plan_broadcasts_stats_no_cartesian(spark, sf_smoke):
    """The 1-row stats and 3-row df frames must broadcast; the fact
    (tf) side must never cartesian-join."""
    from legalchatbot_vectordb_exp_spark.queries import QUERIES

    df = QUERIES["bm25_rank"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_no_exchange_under_join(spark, sf_smoke):
    """Both sides bucketed by the join key: with broadcast disabled the
    join must run as a SortMergeJoin with no shuffle exchange under it
    — the only ShuffleExchange in the plan belongs to the final
    aggregate.  This is the write-once/join-forever contract bucketing
    buys at 100 TB."""
    from legalchatbot_vectordb_exp_spark.queries import QUERIES

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = QUERIES["bucketed_join_equivalence"](spark, sf_smoke)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    # the bucketed scans feed the join exchange-free, so the one and
    # only hashpartitioning exchange in the plan is the aggregate's
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_curation_scan_stage_queries_no_shuffle(spark, sf_smoke):
    """text_normalize and repetition_score are pure projections: no
    exchange of any kind in the executed plan."""
    from legalchatbot_vectordb_exp_spark.queries import QUERIES

    for name in ("text_normalize", "repetition_score"):
        plan = (
            QUERIES[name](spark, sf_smoke)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, name


def test_temperature_sample_broadcasts_rates(spark, sf_smoke):
    """The per-source threshold frame must broadcast; the corpus side
    must not shuffle (no hash-partition exchange over documents)."""
    from legalchatbot_vectordb_exp_spark.queries import QUERIES

    plan = (
        QUERIES["temperature_sample"](spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sequence_packing_single_window_exchange(spark, sf_smoke):
    """Packing must shuffle exactly once — the per-shard window — and
    sort only within shard partitions, never globally."""
    from legalchatbot_vectordb_exp_spark.queries import QUERIES

    df = QUERIES["sequence_packing"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_decontamination_broadcasts_benchmark(spark, sf_smoke):
    from legalchatbot_vectordb_exp_spark.queries import QUERIES

    plan = (
        QUERIES["decontamination"](spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_partitioned_roundtrip_prunes(spark, sf_smoke):
    """The lang filter on the partitioned layout must be a PARTITION
    filter (directory skip), not a data filter over every file."""
    from legalchatbot_vectordb_exp_spark.queries_rag import (
        q_partitioned_roundtrip,
    )

    df = q_partitioned_roundtrip(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the lang predicate must appear among the partition filters —
    # grab the scan line and check it mentions lang = en there
    scan_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert any("lang" in ln and "en" in ln for ln in scan_lines), scan_lines


def test_chunk_overlap_no_shuffle(spark, sf_smoke):
    """Chunking is scan-stage: explode + slice with zero exchanges."""
    from legalchatbot_vectordb_exp_spark.queries_rag import q_chunk_overlap

    plan = (
        q_chunk_overlap(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:2000]


def test_anomaly_mad_broadcasts_stats(spark, sf_smoke):
    """Per-type median/MAD stats must broadcast back against the
    stream — a shuffled join would move the corpus twice for a
    5-row statistics frame."""
    from legalchatbot_vectordb_exp_spark.queries_analytics import (
        q_events_anomaly_mad,
    )

    plan = (
        q_events_anomaly_mad(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_containment_no_cartesian(spark, sf_smoke):
    """Containment candidates come from the shingle equi-join — never
    an all-pairs product."""
    from legalchatbot_vectordb_exp_spark.queries_dedup import (
        q_dedup_containment,
    )

    plan = (
        q_dedup_containment(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_cdc_apply_anti_join_merge(spark, sf_smoke):
    """The merge keeps untouched base rows via an anti join on the key
    (the MERGE INTO shape), and the feed compaction's row_number()=1
    cut is pushed below the exchange as a WindowGroupLimit — each map
    task pre-trims to one candidate row per key before shuffling."""
    from legalchatbot_vectordb_exp_spark.queries_analytics import q_cdc_apply

    df = q_cdc_apply(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_mmr_batch_single_query_id_shuffle(spark, sf_smoke):
    """Batch MMR: queries broadcast over the corpus, ONE hash exchange
    on query_id feeding both the top-pool window and the grouped
    greedy (applyInPandas reuses the window's partitioning — its
    ClusteredDistribution(query_id) is already satisfied), and never a
    cartesian product on the corpus."""
    from legalchatbot_vectordb_exp_spark.queries_rag import q_topk_mmr_batch

    plan = (
        q_topk_mmr_batch(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "hashpartitioning(query_id" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_ivf_batch_copartition_fallback(spark, sf_smoke):
    """The co-partitioned IVF batch strategy (probe frame too big to
    broadcast): no BroadcastExchange anywhere, both join inputs hash-
    exchanged on cluster_id into a shuffled-hash join, and the result
    rows are identical to the broadcast strategy's."""
    from legalchatbot_vectordb_exp_spark.queries_ann import ivf_batch_topk

    co = ivf_batch_topk(spark, sf_smoke, how="copartition")
    plan = co._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan
    assert "ShuffledHashJoin" in plan
    assert plan.count("hashpartitioning(cluster_id") >= 2
    bc = ivf_batch_topk(spark, sf_smoke, how="broadcast")
    assert sorted(map(tuple, co.collect())) == sorted(
        map(tuple, bc.collect())
    )


def test_training_shuffle_no_global_sort(spark, sf_smoke):
    """The epoch shuffle must NOT be a global sort: its only exchange
    is the hash partitioning on shard for the per-shard windows —
    never a rangepartitioning (Spark's total-sort shape)."""
    from legalchatbot_vectordb_exp_spark.queries_training import (
        q_training_shuffle,
    )

    plan = (
        q_training_shuffle(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning(shard" in plan


def test_multimodal_pipelines_are_single_pass(spark, sf_smoke):
    """multimodal_decode / multimodal_frames are ONE linear Arrow pass:
    no join, no aggregation, and no exchange beyond spread()'s
    round-robin widening of the single-row-group scan (a two-branch
    decode+metadata join would run the codec kernels twice)."""
    from legalchatbot_vectordb_exp_spark.queries_pipeline import (
        q_multimodal_decode,
        q_multimodal_frames,
    )

    for q in (q_multimodal_decode, q_multimodal_frames):
        plan = (
            q(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
        )
        low = plan.lower()
        assert "join" not in low, q.__name__
        assert "hashpartitioning" not in low, q.__name__
        assert "rangepartitioning" not in low, q.__name__


def test_graph_search_plan_broadcasts_never_shuffles_corpus(
    spark, sf_smoke
):
    """The beam-search hot path (round 16): every per-hop join is a
    BROADCAST of beam/embedding/query frames — the corpus-sized side
    must never sort-merge (a SortMergeJoin here would shuffle the
    corpus once per hop at 100 TB)."""
    from legalchatbot_vectordb_exp_spark.queries_ann import (
        q_ann_graph_search,
    )

    df = q_ann_graph_search(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_on_rides_window_exchange(spark):
    """r20: ``_dedup_on`` dedups on (key, node) while partitioning on
    the window key alone — the dedup aggregate AND the per-key window
    must share ONE exchange (``distinct()`` + window costs two), and
    the row set must equal ``distinct()``'s."""
    from pyspark.sql import Window

    from legalchatbot_vectordb_exp_spark.queries_ann import _dedup_on

    base = spark.range(200).select(
        (F.col("id") % 5).alias("query_id"),
        (F.col("id") % 23).alias("node"),
    )
    deduped = _dedup_on(base, "query_id", ["query_id", "node"])
    w = Window.partitionBy("query_id").orderBy(F.desc("node"))
    ranked = deduped.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 3
    )
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    # exactly one shuffle: the repartition; no second exchange for
    # the dedup aggregate or the window (subset rule)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # row-set equivalence with distinct()
    a = sorted(map(tuple, deduped.collect()))
    b = sorted(map(tuple, base.distinct().collect()))
    assert a == b

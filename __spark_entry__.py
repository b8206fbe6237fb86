"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship single-query top-k cosine search at
sf0.001.  ``queries()`` / ``oracle_sql()`` — the operator registry from
``legalchatbot_vectordb_exp_spark.queries`` (each Spark query paired
with a DuckDB oracle where SQL-expressible).

Registration ORDER is deliberate: the driver samples a prefix of
``queries()`` for its correctness report (50 in r5), so each round the
prefix is rotated to whatever most needs a fresh driver row.  Round 6
front-loads: the two r5 hash-red rows (``sequence_packing``,
``table_profile`` — both representation-hardened this round), the 18
queries that have never been driver-sampled through r5 (the whole E10
scale family + r5 additions), then every query touched by this round's
decimal-space-rounding and whitespace-class fixes so their green rows
are refreshed against the new code.  Everything else — driver-green in
r3–r5 — follows in registry order.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from legalchatbot_vectordb_exp_spark.queries import ORACLES, QUERIES  # noqa: E402

_SAMPLE_PRIORITY = [
    # the four driver-red rows of rounds 1-6, root-caused in r6's
    # VERDICT: their oracles emitted DuckDB HUGEINT columns
    # (sum(BIGINT) -> HUGEINT), which the driver's pandas fetch
    # coerces to float64 and hash-diverges.  Fixed in r7 with
    # ::BIGINT casts; kept at the head to convert to driver-green.
    "sequence_packing",
    "table_profile",
    "kmeans_refine",
    "incremental_agg_maintain",
    # new in r7: dim-contract probe (driver-red if the in-UDF embed
    # dimension assert is removed) and behavior-changed queries
    "embed_dim_contract",
    "merge_time_travel",
    "zorder_layout",
    "bloom_prune_join",
    "negative_sampling",
    "semdedup_cells",
    "ann_ivf_topk",
    "ann_ivf_topk_batch",
    "ann_ivfpq_topk",
    "multimodal_frames",
    "multimodal_decode",
    "multimodal_resize",
    # E10 scale family — driver-green r6, keep warm
    "dedup_incremental",
    "substring_dedup_spans",
    "cms_heavy_hitters",
    "graph_triangles",
    "dq_audit",
    "hard_negatives",
    "events_ewma",
    "udaf_grouped_median",
    "orc_roundtrip",
    "array_functions",
    "string_functions",
    # rounding-representation fixes this round (decimal-space round
    # before the double cast) — re-queue for fresh driver rows
    "pricing_summary",
    "interval_join_events",
    "stratified_sample",
    "snapshot_diff",
    "events_tumbling",
    "events_sliding",
    "sales_rollup",
    "sales_cube",
    "salted_agg_equivalence",
    "events_stream_join_live",
    # whitespace-class dependents re-queued after the words() fix
    "text_normalize",
    "text_stats",
    "chunk_overlap",
    "tfidf_topterms",
    "unigram_surprisal",
    "boilerplate_shingles",
    "repetition_score",
    "training_shuffle",
    "udtf_shingle_freq",
    "lang_id",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _SAMPLE_PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["topk_cosine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLES)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship single-query top-k cosine search at
sf0.001.  ``queries()`` / ``oracle_sql()`` — the operator registry from
``legalchatbot_vectordb_exp_spark.queries`` (each Spark query paired
with a DuckDB oracle where SQL-expressible).

Registration ORDER is deliberate: the driver samples a prefix of
``queries()`` for its correctness report (50 per round), so each round
the prefix is rotated to whatever most needs a fresh driver row.
Round 16 front-loads: the NEW NN-descent k-NN graph pair
(``ann_knn_graph``, ``ann_knn_graph_recall``), then the round-15
additions that never got a driver slot (``bpe_merge_step``,
``column_mapping_time_travel``, ``column_mapping_read`` — all 50 r15
slots went to the recovery set), then the 104 queries whose latest
driver-green row predates r15 (their existing oldest-first order
preserved); the 50 queries with fresh r15 rows sample last.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from legalchatbot_vectordb_exp_spark.queries import ORACLES, QUERIES  # noqa: E402

_SAMPLE_PRIORITY = [
    "ann_filtered_search",
    "ann_filtered_ivf",
    "ann_filtered_persisted",
    "ann_filtered_batch",
    "ann_filtered_recall_guard",
    "ann_group_search",
    "ann_recommend",
    "ann_named_vectors",
    "ann_maxsim",
    "collection_scroll",
    "ann_knn_graph",
    "ann_knn_graph_recall",
    "ann_graph_search",
    "ann_graph_search_recall",
    "ann_ivf_incremental",
    "bpe_train_merges",
    "bpe_encode_tokens",
    "bpe_merge_step",
    "column_mapping_time_travel",
    "column_mapping_read",
    "zorder_layout",
    "ann_ivf_recall_guard",
    "ann_lsh_buckets",
    "ann_lsh_pairs",
    "ann_lsh_recall_guard",
    "ann_pq_guard",
    "asof_join_events",
    "bigram_topk",
    "bm25_rank",
    "cdc_changes_feed",
    "charset_profile",
    "corpus_curation",
    "customer_order_distribution",
    "dedup_containment",
    "dedup_embedding_cosine",
    "dedup_groups",
    "dedup_keep_one",
    "dedup_minhash_pairs",
    "dedup_minhash_signature",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "deterministic_ids",
    "doc_fingerprint",
    "events_dedup",
    "events_pivot",
    "events_sessionize",
    "events_streaming_live",
    "events_unpivot",
    "hybrid_rrf",
    "idle_high_balance_customers",
    "label_centroids",
    "merge_time_travel",
    "multimodal_audio",
    "multimodal_meta",
    "order_priority_counts",
    "payload_filter_eq",
    "pii_redact",
    "quality_score",
    "rag_end_to_end",
    "ranker_agreement",
    "revenue_by_nation",
    "running_revenue",
    "set_operators",
    "shipping_priority",
    "small_quantity_revenue",
    "time_gapfill",
    "token_vocab",
    "top_customers",
    "top_parts_per_brand",
    "value_percentiles",
    "ann_ivf_topk",
    "ann_ivf_topk_batch",
    "ann_ivfpq_topk",
    "array_functions",
    "bloom_prune_join",
    "approx_agg_guard",
    "bucketed_join_equivalence",
    "cast_and_defaults",
    "cdc_apply",
    "collection_roundtrip",
    "conversion_funnel",
    "csv_roundtrip",
    "datetime_parts",
    "decontamination",
    "distinct_counts",
    "embedding_drift",
    "events_anomaly_mad",
    "events_topn_per_window",
    "fuzzy_match_nations",
    "hash_split",
    "json_extract_props",
    "jsonl_roundtrip",
    "length_buckets",
    "null_semantics",
    "pagerank_parts",
    "partitioned_roundtrip",
    "pdf_roundtrip",
    "retention_cohort",
    "schema_evolution_roundtrip",
    "stats_moments",
    "temperature_sample",
    "topk_mmr",
    "topk_mmr_batch",
    "value_histogram",
    "vector_quantize_int8",
    "window_functions",
    "chunk_format",
    "context_assembly",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "doc_chunks",
    "eval_means",
    "eval_recall_mrr",
    "hll_register_merge",
    "dedup_index_cdc_maintain",
    "clone_diverge",
    "cdf_stream_fold",
    "zorder_recluster_read",
    "mv_cdc_maintain",
    "update_where_read",
    "scd2_apply",
    "mor_delete_read",
    "concurrent_merge_rebase",
    "restore_rollback",
    "part_affinity",
    "ann_ivf_persisted",
    "boilerplate_shingles",
    "chunk_overlap",
    "cms_heavy_hitters",
    "dedup_incremental",
    "dq_audit",
    "embed_dim_contract",
    "events_ewma",
    "events_sliding",
    "events_stream_join_live",
    "events_tumbling",
    "graph_triangles",
    "hard_negatives",
    "incremental_agg_maintain",
    "interval_join_events",
    "kmeans_refine",
    "lang_id",
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_resize",
    "negative_sampling",
    "orc_roundtrip",
    "pricing_summary",
    "repetition_score",
    "sales_cube",
    "sales_rollup",
    "salted_agg_equivalence",
    "semdedup_cells",
    "sequence_packing",
    "snapshot_diff",
    "stratified_sample",
    "string_functions",
    "substring_dedup_spans",
    "table_profile",
    "text_normalize",
    "text_stats",
    "tfidf_topterms",
    "topk_batch",
    "topk_cosine",
    "training_shuffle",
    "udaf_grouped_median",
    "udtf_shingle_freq",
    "unigram_surprisal",
    "vector_normalize",
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

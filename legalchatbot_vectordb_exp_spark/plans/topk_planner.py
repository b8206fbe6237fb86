"""Cardinality-aware top-k search planning (SURVEY.md §4: the one
piece of "planner" the engine owns — everything else is Catalyst's).

Chooses among the three physical strategies for "top-k nearest vectors
per query" based on corpus/query cardinalities:

* ``exact-takeordered`` — 1 query: narrow scan + TakeOrderedAndProject
  (0 shuffles).  Always optimal for a single query.
* ``exact-window`` — few queries × manageable corpus: broadcast cross
  join + per-query window rank.  Shuffle = scored rows.
* ``exact-window-pruned`` — many corpus rows: same, with the Arrow
  per-partition heap capping shuffle volume at k×partitions×queries.
* ``ivf`` hook — when the corpus table is written partitioned by a
  cluster id (see queries_ann.q_ann_ivf_topk), callers should prefer
  the partition-pruned path; this planner signals that via
  ``hint='consider-ivf'`` above the IVF threshold rather than silently
  changing semantics (IVF is approximate).

Thresholds are conservative row-count heuristics; on a real deployment
they would read table statistics (`ANALYZE TABLE`) instead of count().
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame

from legalchatbot_vectordb_exp_spark.operators.topk import (
    topk_search,
    topk_search_batch,
)

# above this many scored rows (corpus × queries) the per-partition
# heap prune pays for its Arrow hop
PRUNE_THRESHOLD_SCORED_ROWS = 50_000_000
# above this corpus size, exact search is worth flagging for IVF layout
IVF_HINT_CORPUS_ROWS = 500_000_000


@dataclass
class TopKPlan:
    strategy: str
    hint: str | None
    result: DataFrame


def plan_topk_search(
    corpus: DataFrame,
    queries: DataFrame | Sequence[float],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    corpus_rows: int | None = None,
    query_rows: int | None = None,
) -> TopKPlan:
    """Return the chosen strategy plus the lazy result DataFrame.

    ``corpus_rows``/``query_rows`` let callers pass known stats and
    skip the count() (recommended in pipelines).
    """
    if not isinstance(queries, DataFrame):
        return TopKPlan(
            "exact-takeordered",
            None,
            topk_search(corpus, queries, k=k, vec_col=vec_col, id_col=id_col),
        )

    n_corpus = corpus_rows if corpus_rows is not None else corpus.count()
    n_queries = query_rows if query_rows is not None else queries.count()
    scored = n_corpus * max(n_queries, 1)

    prune = scored > PRUNE_THRESHOLD_SCORED_ROWS
    hint = "consider-ivf" if n_corpus > IVF_HINT_CORPUS_ROWS else None
    result = topk_search_batch(
        corpus,
        queries,
        k=k,
        vec_col=vec_col,
        id_col=id_col,
        prune_per_partition=prune,
    )
    return TopKPlan(
        "exact-window-pruned" if prune else "exact-window", hint, result
    )

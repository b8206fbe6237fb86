"""Rank-fusion operators for hybrid retrieval (Qdrant ``query_points``
``fusion=rrf|dbsf`` parity).

Both consume per-retriever RANKED frames — ``(id, rank)`` with rank
1..N from a prefetch — which are ≤ prefetch-depth rows each, so the
fuse is metadata-scale no matter the corpus: the expensive part of
hybrid search is the prefetches, and those keep their own optimal
plans (TakeOrderedAndProject / matched-postings aggregate)."""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "r",
    k: int = 60,
    topk: int = 20,
    out_col: str = "rrf",
) -> DataFrame:
    """Reciprocal-rank fusion: score(id) = Σ_retrievers 1/(k + rank).
    Exact rational arithmetic — safe to hash across engines.  Input
    frames are full-outer-joined on id (each ≤ prefetch rows); ties
    break ascending id."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked frame")
    renamed = [
        df.select(id_col, F.col(rank_col).alias(f"_r{i}"))
        for i, df in enumerate(ranked)
    ]
    joined = reduce(
        lambda a, b: a.join(b, id_col, "full"), renamed
    )
    score = reduce(
        lambda acc, i: acc
        + F.coalesce(1.0 / (k + F.col(f"_r{i}")), F.lit(0.0)),
        range(1, len(ranked)),
        F.coalesce(1.0 / (k + F.col("_r0")), F.lit(0.0)),
    )
    return (
        joined.select(id_col, score.alias(out_col))
        .orderBy(F.desc(out_col), F.asc(id_col))
        .limit(topk)
    )


def dbsf_constants(scores_in_rank_order: list[float]) -> tuple[float, float]:
    """DBSF's μ and population σ as SEQUENTIAL left-folds in rank
    order — the documented determinism contract: the DuckDB oracle
    folds ``list(s ORDER BY r)`` with ``list_reduce``, this folds the
    collected prefetch identically, so normalization constants are
    bit-identical doubles on both engines.

    An EMPTY prefetch (e.g. a sparse retriever whose query terms
    match no postings) carries no distributional information: it
    returns (0.0, 0.0), and the σ = 0 branch downstream contributes
    0 to the fused score — mirroring rrf's graceful full-outer-join
    handling of the same case."""
    if not scores_in_rank_order:
        return 0.0, 0.0
    acc = 0.0
    for s in scores_in_rank_order:
        acc += s
    mu = acc / len(scores_in_rank_order)
    acc2 = 0.0
    for s in scores_in_rank_order:
        acc2 += (s - mu) * (s - mu)
    sigma = (acc2 / len(scores_in_rank_order)) ** 0.5
    return mu, sigma

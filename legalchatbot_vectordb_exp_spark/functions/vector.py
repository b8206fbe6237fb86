"""Vector column helpers — SQL higher-order functions only (JVM-side,
whole-stage-codegen eligible; no Python in the hot path).

Semantics follow the reference's hand-rolled vector math:

* L2 normalize with a zero-norm guard of 1.0
  (``Qdrant/main.py:15-18``, ``Qdrant/llm.py:11-14`` in the reference —
  ``x / (sqrt(sum(x^2)) or 1.0)``).
* Cosine over pre-normalized vectors reduces to a dot product
  (``Distance.COSINE`` at ``Qdrant/main.py:107`` with normalization
  applied at write and query time).

All arithmetic is promoted to DOUBLE before accumulating, so results
are reproducible across engines (the test oracle runs the same fold in
DuckDB on ``::DOUBLE[]`` lists).
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def as_double_vec(v: Column | str) -> Column:
    """Promote ARRAY<FLOAT> to ARRAY<DOUBLE> (deterministic arithmetic)."""
    v = F.col(v) if isinstance(v, str) else v
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product as zip_with + aggregate (sequential fold, exact order)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    ssq = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(ssq)


def l2_normalize(v: Column | str) -> Column:
    """x / (||x|| or 1.0) — the reference's zero-vector guard divides by
    1.0, leaving an all-zeros vector all zeros (not NaN)."""
    v = F.col(v) if isinstance(v, str) else v
    n = l2_norm(v)
    safe = F.when(n == 0.0, F.lit(1.0)).otherwise(n)
    return F.transform(v, lambda x: x.cast("double") / safe)


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Full cosine (not assuming unit norm); zero-norm pairs score 0."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)

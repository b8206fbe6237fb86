"""Skew-mitigation operators: salted aggregation and salted join.

AQE's skew-join splitting handles sort-merge skew at runtime, but two
shapes still need explicit salting at 100 TB:

* **hot-key aggregation** — a groupBy where a handful of keys hold a
  large share of rows (e.g. token counts: "the").  Two-stage salted
  aggregation spreads each hot key over N partial groups, then merges.
* **hot-key join** — replicate the small side per salt so the big
  side's hot key fans across N tasks.

Both are pure DataFrame rewrites with identical results to the direct
plan — which is exactly what the salted_agg oracle query checks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) → groupBy(keys).

    ``aggs``: out_col -> (in_col, fn) with fn in {sum, count, min, max}
    (the mergeable aggregates; avg = sum/count at the call site).
    Salt is a deterministic spread (hash of the full row's offset-free
    columns mod n_salts would be non-deterministic under retries; we
    use a hash of all key + value columns, which is stable per row
    content).
    """
    salt = F.pmod(
        F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts)
    ).alias("_salt")

    stage1_aggs = []
    stage2_aggs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            stage1_aggs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            stage2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            stage1_aggs.append(F.sum(col).alias(f"_p_{out}"))
            stage2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            stage1_aggs.append(F.min(col).alias(f"_p_{out}"))
            stage2_aggs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            stage1_aggs.append(F.max(col).alias(f"_p_{out}"))
            stage2_aggs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"unmergeable aggregate {fn!r}")

    partial = df.select("*", salt).groupBy(*key_cols, "_salt").agg(*stage1_aggs)
    return partial.groupBy(*key_cols).agg(*stage2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over n_salts tasks:
    big rows get a random-but-deterministic salt, the small side is
    replicated once per salt value, join key becomes (on, salt).

    Only join types where unmatched *small*-side rows never surface are
    result-equivalent to the direct join: with ``right``/``full`` the
    replicated small side would emit one unmatched outer row per salt.
    """
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "semi", "left_semi", "leftsemi",
        "anti", "left_anti", "leftanti", "cross",
    }
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not result-equivalent under "
            f"small-side replication (allowed: {sorted(allowed)})"
        )
    big_s = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")

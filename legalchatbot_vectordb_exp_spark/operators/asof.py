"""As-of join: for each left row, the latest right row with
``right.ts <= left.ts`` within the same key — the time-series join
Spark has no native operator for (DuckDB/kdb call it ASOF JOIN).

Implementation is the union-merge trick, all JVM expressions:

1. union left and right rows with a side tag, right rows carrying
   their payload;
2. one window per key ordered by (ts, side) where right sorts before
   left at equal timestamps (ties: a right row AT the left timestamp
   matches, per ASOF <= semantics);
3. ``last(payload, ignorenulls=True)`` over the preceding frame gives
   every left row the most recent right payload.

One shuffle on the key — same cost as a regular equi-join — instead of
the naive range-join (which Catalyst would execute as a cross product
per key).  Skewed keys: salt the window key by coarse time bucket and
merge bucket boundaries (not needed at test scale; noted for 100 TB).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """left(on, ts, …) ⟕ᵃˢᵒᶠ right(on, ts, payload…) → left columns +
    right payload columns (null when no prior right row exists)."""
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (on, ts)]

    l_tagged = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in payload_cols],
    )
    r_tagged = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tagged.schema["_left"].dataType
        ).alias("_left"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )

    merged = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "_side",
        "_left",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in payload_cols
        ],
    ).filter(F.col("_side") == 1)

    out_cols = [F.col(f"_left.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_r_{c}").alias(f"right_{c}") for c in payload_cols]
    return filled.select(*out_cols)

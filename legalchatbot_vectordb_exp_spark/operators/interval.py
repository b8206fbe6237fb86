"""Interval (range) join: left rows match right rows of the same key
whose timestamp falls in ``[left.ts + lower, left.ts + upper]`` — the
"what happened within N minutes after X" join.  Spark has no native
range-join operator; a naive ``ON key AND r.ts BETWEEN …`` condition
executes as a per-key nested loop.

Implementation is time-bucket blocking, the 1-D analogue of the
length-band trick in ``fuzzy_match_nations``:

1. timestamps become exact integer microseconds (no float rounding at
   the bucket or bound edges);
2. the right side gets one bucket key ``r_us div W``;
3. each left row explodes to the buckets covering
   ``[l_us + lower, l_us + upper]`` — with ``W >= upper - lower``
   that is at most 2 buckets, so the fan-out is O(1);
4. equi-join on (key, bucket) + the exact residual bound predicate.
   A qualifying pair matches in exactly one bucket (the right row's),
   so no dedup is needed.

One shuffle per side on (key, bucket); candidates are only same-bucket
pairs — sub-quadratic for any timestamp distribution, and skew is
bounded by bucket occupancy rather than key cardinality (a hot key's
rows spread over its time range).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_MICROS = 1_000_000


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lower_s: float,
    upper_s: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
    bounds: str = "[]",
    bucket_s: float | None = None,
) -> DataFrame:
    """Inner interval join; returns all left columns plus the right
    columns renamed ``r_<name>``.

    ``bounds`` picks bound inclusivity for
    ``r.ts − l.ts ∈ {[,(} lower, upper {],)}``: one of
    ``"[]" "(]" "[)" "()"``.
    """
    if bounds not in ("[]", "(]", "[)", "()"):
        raise ValueError(f"interval_join: bad bounds {bounds!r}")
    if upper_s < lower_s:
        raise ValueError("interval_join: upper_s < lower_s")
    lower_us = int(round(lower_s * _MICROS))
    upper_us = int(round(upper_s * _MICROS))
    w_us = int(round((bucket_s or max(upper_s - lower_s, 1.0)) * _MICROS))

    def epoch_us(df: DataFrame, col: str):
        # exact integer micros; NTZ path is timezone-free so the delta
        # matches naive-timestamp arithmetic (no DST shift at the
        # session zone — unix_micros(cast(ntz as timestamp)) would
        # change deltas across a DST transition)
        if dict(df.dtypes)[col] == "timestamp_ntz":
            return F.expr(
                "timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"
            )
        return F.unix_micros(F.col(col))

    l_us = epoch_us(left, left_ts)
    r_us = epoch_us(right, right_ts)

    # exact integer division (SQL `div`) — double-division floor could
    # misplace a row at a bucket boundary
    lhs = left.withColumn("_us", l_us).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.expr(f"(_us + {lower_us}) div {w_us}"),
                F.expr(f"(_us + {upper_us}) div {w_us}"),
            )
        ),
    )
    rhs = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        r_us.alias("_r_us"),
    ).withColumn("_bkt", F.expr(f"_r_us div {w_us}"))

    delta = F.col("_r_us") - F.col("_us")
    lo_ok = delta >= lower_us if bounds[0] == "[" else delta > lower_us
    hi_ok = delta <= upper_us if bounds[1] == "]" else delta < upper_us

    join_cond = (F.col(on) == F.col(f"r_{on}")) & (
        lhs["_bkt"] == rhs["_bkt"]
    )
    return (
        lhs.join(rhs, join_cond)
        .filter(lo_ok & hi_ok)
        .drop("_us", "_r_us", "_bkt")
    )

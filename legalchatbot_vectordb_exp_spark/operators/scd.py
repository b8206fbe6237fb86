"""Slowly-changing-dimension type 2 maintenance.

``scd2_apply`` folds a batch of timestamped attribute records into an
effective-dated dimension table: each key's history is a chain of
``[valid_from, valid_to)`` versions with exactly one open
(``is_current``) row.  This is the standard warehouse pattern for
tracking document/source metadata over time in a training-data
pipeline (license changes, quality-tier reclassification, …) — the
reference has no history surface at all (its only mutation is the
whole-collection recreate, `Qdrant/VectorDB/Database.py:10-14`).

Scale shape: ONE hash shuffle on the dimension key (the window that
chains versions); closed history rows pass through filter + union
without shuffling, and the batch is never collected to the driver.
Consecutive-duplicate suppression (a record that repeats the
predecessor's tracked values creates no version) falls out of the same
window via ``lag``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_col: str,
    tie_breakers: list[str] | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
    reject_late: bool = True,
) -> DataFrame:
    """Apply ``updates`` — rows of ``(key, *tracked, effective_col)``
    — to an SCD2 ``dim`` of ``(key, *tracked, valid_from, valid_to,
    is_current)``; returns the new dimension.

    * A record whose tracked values differ from the key's predecessor
      version opens a new version at its effective timestamp and
      closes the previous one (``valid_to`` = the new
      ``valid_from``); the chain's last version is the open one
      (``valid_to`` null, ``is_current`` true).
    * A record equal to its predecessor (null-safe, including the
      dimension's current row as predecessor of the batch's first
      record) is suppressed — no-op updates never mint versions.
    * Keys absent from the dimension insert their whole chain; keys
      absent from the batch are untouched.
    * Closed history rows are carried verbatim (never re-windowed).

    Records must not predate their key's current ``valid_from``
    (late-arriving history is not re-opened — standard batch SCD2).
    With ``reject_late=True`` (default) that precondition is ENFORCED
    inline on the chaining job: a batch record whose effective
    timestamp sorts strictly before its key's incumbent ``valid_from``
    raises instead of silently corrupting the chain (incumbent closed
    with ``valid_to`` earlier than its ``valid_from``, wrong
    ``is_current``).  The check is a window max over the same
    key-partitioning — no extra shuffle.  ``reject_late=False``
    restores the unchecked behavior for callers that pre-filter.
    Ties on the effective timestamp are ordered by ``tie_breakers``
    (required for determinism when a batch can carry equal
    timestamps), with the incumbent dimension row always sorting
    first.
    """
    tie_breakers = tie_breakers or []
    cols = [key, *tracked]

    # tie-breaker columns come from the batch; the incumbent
    # dimension row carries nulls for them (nulls-first ordering +
    # _src=0 keeps the incumbent winning timestamp ties)
    tb_cast = {t: updates.schema[t].dataType for t in tie_breakers}
    cur = dim.filter(F.col(is_current)).select(
        *cols,
        F.col(valid_from).alias("_eff"),
        F.lit(0).alias("_src"),
        *[
            F.lit(None).cast(tb_cast[t]).alias(f"_tb_{t}")
            for t in tie_breakers
        ],
    )
    ups = updates.select(
        *cols,
        F.col(effective_col).alias("_eff"),
        F.lit(1).alias("_src"),
        *[F.col(t).alias(f"_tb_{t}") for t in tie_breakers],
    )
    w = Window.partitionBy(key).orderBy(
        "_eff", "_src", *[f"_tb_{t}" for t in tie_breakers]
    )
    chained = cur.unionByName(ups)
    if reject_late:
        # the incumbent's valid_from, broadcast to every row of the
        # key via an unbounded window over the SAME partitioning (the
        # exchange is reused — no extra shuffle); a batch record
        # strictly before it is late-arriving history this operator
        # is documented not to re-open, so fail loudly
        inc_eff = F.max(
            F.when(F.col("_src") == 0, F.col("_eff"))
        ).over(Window.partitionBy(key))
        late = (
            (F.col("_src") == 1)
            & inc_eff.isNotNull()
            & (F.col("_eff") < inc_eff)
        )
        chained = chained.withColumn(
            "_eff",
            F.when(
                late,
                F.raise_error(
                    # concat_ws + coalesce, NOT concat: concat
                    # null-propagates, so a NULL key would erase the
                    # whole diagnostic message
                    F.concat_ws(
                        "",
                        F.lit(
                            "scd2_apply: late-arriving record for key "
                        ),
                        F.coalesce(
                            F.col(key).cast("string"), F.lit("NULL")
                        ),
                        F.lit(
                            " predates the incumbent valid_from; "
                            "history is not re-opened"
                        ),
                    )
                ),
            ).otherwise(F.col("_eff")),
        )
    # suppress consecutive duplicates: a row all of whose tracked
    # values null-safe-equal the previous version's is a no-op
    same_as_prev = F.lit(True)
    for t in tracked:
        same_as_prev = same_as_prev & F.col(t).eqNullSafe(
            F.lag(t).over(w)
        )
    deduped = (
        chained.withColumn("_prev_exists", F.lag("_src").over(w).isNotNull())
        .withColumn("_dup", F.when(F.col("_prev_exists"), same_as_prev)
                    .otherwise(F.lit(False)))
        .filter(~F.col("_dup"))
    )
    # re-window AFTER the suppression so valid_to chains over the
    # surviving versions (Catalyst reuses the exchange — same
    # partitioning, no second shuffle)
    w2 = Window.partitionBy(key).orderBy(
        "_eff", "_src", *[f"_tb_{t}" for t in tie_breakers]
    )
    nxt = F.lead("_eff").over(w2)
    fresh = deduped.select(
        *cols,
        F.col("_eff").alias(valid_from),
        nxt.alias(valid_to),
        nxt.isNull().alias(is_current),
    )
    history = dim.filter(~F.col(is_current)).select(
        *cols, valid_from, valid_to, is_current
    )
    return history.unionByName(fresh)

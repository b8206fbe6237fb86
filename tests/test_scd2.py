"""SCD Type-2 maintenance: ``operators.scd.scd2_apply``.

The reference has no history surface (whole-collection recreate is its
only mutation, `Qdrant/VectorDB/Database.py:10-14`); this is the
standard effective-dated dimension fold a training-data pipeline needs
for document/license metadata over time.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.operators.scd import scd2_apply


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "k long, attr string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )


def _ups(spark, rows):
    return spark.createDataFrame(
        rows, "k long, attr string, eff timestamp, ok long"
    )


def _apply(dim, ups):
    return scd2_apply(
        dim, ups, key="k", tracked=["attr"], effective_col="eff",
        tie_breakers=["ok"],
    )


def _rows(df):
    return {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in df.collect()
    }


def test_change_opens_version_and_closes_predecessor(spark):
    dim = _dim(spark, [(1, "a", _ts("2024-01-01"), None, True)])
    ups = _ups(spark, [(1, "b", _ts("2024-06-01"), 10)])
    assert _rows(_apply(dim, ups)) == {
        (1, "a", _ts("2024-01-01"), _ts("2024-06-01"), False),
        (1, "b", _ts("2024-06-01"), None, True),
    }


def test_noop_update_mints_nothing(spark):
    dim = _dim(spark, [(1, "a", _ts("2024-01-01"), None, True)])
    ups = _ups(spark, [(1, "a", _ts("2024-06-01"), 10)])
    assert _rows(_apply(dim, ups)) == {
        (1, "a", _ts("2024-01-01"), None, True),
    }


def test_new_key_inserts_whole_chain(spark):
    dim = _dim(spark, [])
    ups = _ups(
        spark,
        [
            (2, "x", _ts("2024-01-01"), 1),
            (2, "y", _ts("2024-02-01"), 2),
        ],
    )
    assert _rows(_apply(dim, ups)) == {
        (2, "x", _ts("2024-01-01"), _ts("2024-02-01"), False),
        (2, "y", _ts("2024-02-01"), None, True),
    }


def test_consecutive_duplicates_inside_batch_suppressed(spark):
    dim = _dim(spark, [(1, "a", _ts("2024-01-01"), None, True)])
    ups = _ups(
        spark,
        [
            (1, "b", _ts("2024-02-01"), 1),
            (1, "b", _ts("2024-03-01"), 2),  # repeat: no version
            (1, "a", _ts("2024-04-01"), 3),  # flips back: new version
        ],
    )
    assert _rows(_apply(dim, ups)) == {
        (1, "a", _ts("2024-01-01"), _ts("2024-02-01"), False),
        (1, "b", _ts("2024-02-01"), _ts("2024-04-01"), False),
        (1, "a", _ts("2024-04-01"), None, True),
    }


def test_closed_history_passes_through_untouched(spark):
    dim = _dim(
        spark,
        [
            (1, "old", _ts("2023-01-01"), _ts("2024-01-01"), False),
            (1, "a", _ts("2024-01-01"), None, True),
        ],
    )
    ups = _ups(spark, [(1, "b", _ts("2024-06-01"), 1)])
    assert _rows(_apply(dim, ups)) == {
        (1, "old", _ts("2023-01-01"), _ts("2024-01-01"), False),
        (1, "a", _ts("2024-01-01"), _ts("2024-06-01"), False),
        (1, "b", _ts("2024-06-01"), None, True),
    }


def test_timestamp_ties_break_on_tie_breaker(spark):
    dim = _dim(spark, [])
    t = _ts("2024-05-01")
    ups = _ups(spark, [(1, "late", t, 20), (1, "early", t, 10)])
    out = _rows(_apply(dim, ups))
    # ok=10 sorts first → 'early' is the (zero-length) closed
    # version, 'late' wins the open slot
    assert out == {
        (1, "early", t, t, False),
        (1, "late", t, None, True),
    }


def test_untouched_keys_keep_current_row(spark):
    dim = _dim(
        spark,
        [
            (1, "a", _ts("2024-01-01"), None, True),
            (2, "z", _ts("2024-01-01"), None, True),
        ],
    )
    ups = _ups(spark, [(1, "b", _ts("2024-06-01"), 1)])
    out = _rows(_apply(dim, ups))
    assert (2, "z", _ts("2024-01-01"), None, True) in out


def test_plan_has_single_shuffle(spark):
    """The version-chaining windows share one hash partitioning on
    the key — the plan must contain exactly one Exchange on the
    fresh-chain side (history is filter + union, shuffle-free)."""
    dim = _dim(spark, [(1, "a", _ts("2024-01-01"), None, True)])
    ups = _ups(spark, [(1, "b", _ts("2024-06-01"), 1)])
    plan = (
        _apply(dim, ups)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_late_record_raises(spark):
    """A batch record predating its key's incumbent valid_from is
    late-arriving history — the inline guard fails the job instead of
    silently corrupting the chain."""
    import pytest

    dim = _dim(
        spark,
        [(1, "a", _ts("2024-06-01"), None, True)],
    )
    ups = _ups(spark, [(1, "b", _ts("2024-01-01"), 0)])
    with pytest.raises(Exception, match="late-arriving"):
        _apply(dim, ups).collect()


def test_late_record_passthrough_when_unchecked(spark):
    """reject_late=False restores the documented precondition-on-
    caller behavior (no raise)."""
    dim = _dim(
        spark,
        [(1, "a", _ts("2024-06-01"), None, True)],
    )
    ups = _ups(spark, [(1, "b", _ts("2024-01-01"), 0)])
    out = scd2_apply(
        dim, ups, key="k", tracked=["attr"], effective_col="eff",
        tie_breakers=["ok"], reject_late=False,
    )
    out.collect()  # no raise; chain shape is caller's problem


def test_on_time_records_unaffected_by_guard(spark):
    """The guard never fires for records at or after the incumbent
    valid_from (equality is legal — same-instant supersede)."""
    dim = _dim(
        spark,
        [(1, "a", _ts("2024-06-01"), None, True)],
    )
    ups = _ups(spark, [(1, "b", _ts("2024-06-01"), 0)])
    rows = _rows(_apply(dim, ups))
    assert (1, "b", _ts("2024-06-01"), None, True) in rows


def test_late_record_null_key_keeps_message(spark):
    """The late-record diagnostic must survive a NULL key — concat
    null-propagates, concat_ws + coalesce does not."""
    import pytest

    dim = _dim(spark, [(None, "a", _ts("2024-06-01"), None, True)])
    ups = _ups(spark, [(None, "b", _ts("2024-01-01"), 10)])
    with pytest.raises(Exception, match="key NULL"):
        _apply(dim, ups).collect()

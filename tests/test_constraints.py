"""CHECK constraints on the versioned collection (Delta ``ALTER TABLE
ADD CONSTRAINT`` parity): add scans the current snapshot, enforcement
rides the write jobs inline (guarded key projection — zero extra
jobs), NULL passes (SQL CHECK semantics), and the driver-side
small-batch paths enforce at collect time.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from legalchatbot_vectordb_exp_spark.sources.versioned import (
    VersionedCollection,
)


def _vec(i: int) -> list[float]:
    return [float(i), 1.0, 0.0]


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, _vec(i), lbl) for i, lbl in rows],
        "id long, vector array<double>, label long",
    )


def _coll(spark, tmp_path, name, rows=None):
    c = VersionedCollection(spark, str(tmp_path), name)
    c.create(
        _mk(spark, rows or [(i, 10 * i) for i in range(4)]),
        dim=3,
        metric="dot",
        normalize=False,
        cluster_files=2,
    )
    return c


def test_add_constraint_persists_and_lists(spark, tmp_path):
    c = _coll(spark, tmp_path, "c1")
    c.add_constraint("label_nonneg", "label >= 0")
    assert c.constraints == {"label_nonneg": "label >= 0"}


def test_add_fails_when_existing_rows_violate(spark, tmp_path):
    c = _coll(spark, tmp_path, "c2")
    with pytest.raises(ValueError, match="existing rows violate"):
        c.add_constraint("label_big", "label > 100")
    assert c.constraints == {}


def test_small_merge_violating_fails_without_commit(spark, tmp_path):
    """The small-batch merge path collects the source driver-side —
    the guard must fire at collect time, before anything is written."""
    c = _coll(spark, tmp_path, "c3")
    c.add_constraint("label_nonneg", "label >= 0")
    with pytest.raises(Exception, match="CHECK constraint label_nonneg"):
        c.merge(_mk(spark, [(9, -5)]))
    assert c.latest_version() == 0


def test_large_merge_violating_fails(spark, tmp_path):
    c = _coll(spark, tmp_path, "c4")
    c.add_constraint("label_nonneg", "label >= 0")
    big = _mk(
        spark, [(100 + i, i) for i in range(2000)] + [(5000, -1)]
    )
    with pytest.raises(Exception, match="CHECK constraint label_nonneg"):
        c.merge(big)
    assert c.latest_version() == 0


def test_valid_merge_passes_and_values_intact(spark, tmp_path):
    """The guard projection must not perturb the key values it rides."""
    c = _coll(spark, tmp_path, "c5")
    c.add_constraint("label_nonneg", "label >= 0")
    c.merge(_mk(spark, [(9, 90), (0, 5)]))
    got = {
        (r.id, r.label)
        for r in c.read().select("id", "label").collect()
    }
    assert got == {(0, 5), (1, 10), (2, 20), (3, 30), (9, 90)}


def test_null_expr_passes(spark, tmp_path):
    """SQL CHECK: only FALSE violates — NULL passes."""
    c = _coll(spark, tmp_path, "c6")
    c.add_constraint("weird", "CASE WHEN label < 0 THEN NULL ELSE true END")
    c.merge(_mk(spark, [(9, -7)]))  # expr NULL for this row → passes
    assert (9, -7) in {
        (r.id, r.label)
        for r in c.read().select("id", "label").collect()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_update_violating_fails_without_commit(spark, tmp_path, mode):
    c = _coll(spark, tmp_path, f"c7{mode}")
    c.add_constraint("label_nonneg", "label >= 0")
    with pytest.raises(Exception, match="CHECK constraint label_nonneg"):
        c.update_where("id = 1", {"label": F.lit(-1)}, mode=mode)
    assert c.latest_version() == 0
    # a failed MOR update must not leave a dangling DV sidecar
    # visible to readers
    assert c.read().count() == 4


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_update_valid_passes(spark, tmp_path, mode):
    c = _coll(spark, tmp_path, f"c8{mode}")
    c.add_constraint("label_nonneg", "label >= 0")
    c.update_where("id = 1", {"label": "label + 1"}, mode=mode)
    assert (1, 11) in {
        (r.id, r.label)
        for r in c.read().select("id", "label").collect()
    }


def test_delete_ignores_constraints(spark, tmp_path):
    """Deletes write no new rows — a constraint referencing them must
    never fire."""
    c = _coll(spark, tmp_path, "c9")
    c.add_constraint("label_nonneg", "label >= 0")
    c.delete_where("id = 2", mode="mor")
    c.delete_where("id = 3")
    assert c.read().count() == 2


def test_drop_constraint_restores_writes(spark, tmp_path):
    c = _coll(spark, tmp_path, "c10")
    c.add_constraint("label_nonneg", "label >= 0")
    c.drop_constraint("label_nonneg")
    assert c.constraints == {}
    c.merge(_mk(spark, [(9, -5)]))  # no longer guarded
    assert c.latest_version() == 1


def test_duplicate_and_missing_names_rejected(spark, tmp_path):
    c = _coll(spark, tmp_path, "c11")
    c.add_constraint("x", "label >= 0")
    with pytest.raises(ValueError, match="already exists"):
        c.add_constraint("x", "label >= 1")
    with pytest.raises(ValueError, match="no CHECK constraint"):
        c.drop_constraint("y")


def test_two_constraints_both_enforced(spark, tmp_path):
    c = _coll(spark, tmp_path, "c12")
    c.add_constraint("nonneg", "label >= 0")
    c.add_constraint("cap", "label < 1000")
    with pytest.raises(Exception, match="CHECK constraint cap"):
        c.merge(_mk(spark, [(9, 5000)]))
    with pytest.raises(Exception, match="CHECK constraint nonneg"):
        c.merge(_mk(spark, [(9, -1)]))
    c.merge(_mk(spark, [(9, 500)]))
    assert c.latest_version() == 1


def test_constraint_survives_reopen(spark, tmp_path):
    """Constraints persist in the props file — a fresh handle on the
    same warehouse enforces them."""
    c = _coll(spark, tmp_path, "c13")
    c.add_constraint("label_nonneg", "label >= 0")
    c2 = VersionedCollection(spark, str(tmp_path), "c13")
    with pytest.raises(Exception, match="CHECK constraint"):
        c2.merge(_mk(spark, [(9, -5)]))


def test_schema_evolution_merge_skips_unresolvable_constraint(
    spark, tmp_path
):
    """A schema_evolution merge whose source LACKS a constrained
    column writes NULL there — SQL CHECK passes NULL, so the merge
    must succeed instead of failing analysis on the raw source."""
    c = _coll(spark, tmp_path, "c14")
    c.add_constraint("label_nonneg", "label >= 0")
    src = spark.createDataFrame(
        [(9, _vec(9))], "id long, vector array<double>"
    )
    c.merge(src, schema_evolution=True)
    row = c.read().filter(F.col("id") == 9).head()
    assert row.label is None
    # a source that DOES carry the column is still enforced
    with pytest.raises(Exception, match="CHECK constraint"):
        c.merge(_mk(spark, [(10, -1)]))


def test_concurrent_add_constraint_both_land(spark, tmp_path):
    """Two racing add_constraint calls serialize through the props
    lock — neither metadata edit is lost."""
    import threading

    c = _coll(spark, tmp_path, "c15")
    c2 = VersionedCollection(spark, str(tmp_path), "c15")
    errs = []

    def add(h, name, expr):
        try:
            h.add_constraint(name, expr)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=add, args=(c, "a", "label >= 0"))
    t2 = threading.Thread(target=add, args=(c2, "b", "label < 10000"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert set(c.constraints) == {"a", "b"}


def test_add_constraint_rolls_back_on_racing_violation(
    spark, tmp_path, monkeypatch
):
    """The fence: a writer that read the props pre-constraint and
    commits violating rows into the validation window is caught by
    the added-files re-verify — the constraint rolls back."""
    c = _coll(spark, tmp_path, "c16")
    orig = VersionedCollection._rewrite_props
    fired = {"n": 0}

    def racing(self, mutate):
        orig(self, mutate)
        if fired["n"] == 0:
            fired["n"] = 1
            c2 = VersionedCollection(spark, str(tmp_path), "c16")
            # simulate a writer that read props BEFORE the
            # constraint landed: no guard on its write job
            c2._constraint_guard = lambda *a, **k: None
            c2.merge(_mk(spark, [(99, -5)]))

    monkeypatch.setattr(
        VersionedCollection, "_rewrite_props", racing
    )
    with pytest.raises(ValueError, match="rolled back"):
        c.add_constraint("label_nonneg", "label >= 0")
    assert "label_nonneg" not in c.constraints


def test_schema_evolution_merge_enforces_null_sensitive_constraint(
    spark, tmp_path
):
    """A constraint that a NULL actually FAILS (``label IS NOT
    NULL``) must fire on a schema_evolution merge whose source lacks
    the column — the written row carries NULL, and skipping the
    constraint (old behavior) silently committed violating rows."""
    c = _coll(spark, tmp_path, "c17")
    c.add_constraint("label_present", "label IS NOT NULL")
    src = spark.createDataFrame(
        [(9, _vec(9))], "id long, vector array<double>"
    )
    with pytest.raises(Exception, match="CHECK constraint label_present"):
        c.merge(src, schema_evolution=True)
    # nothing committed
    assert c.read().filter(F.col("id") == 9).count() == 0


def test_broken_constraint_raises_not_skipped(spark, tmp_path):
    """A constraint whose expression genuinely does not analyze
    (typo'd column) must surface as an error on the next merge — not
    be silently disabled by the resolution probe."""
    c = _coll(spark, tmp_path, "c18")
    # inject directly: add_constraint's own validation scan would
    # reject it, which is exactly why a broken expr can only appear
    # through out-of-band props edits — and must still not be skipped
    c._rewrite_props(
        lambda p: p.setdefault("constraints", {}).__setitem__(
            "broken", "no_such_col > 0"
        )
    )
    with pytest.raises(ValueError, match="does not resolve"):
        c.merge(_mk(spark, [(9, 5)]), schema_evolution=True)
    with pytest.raises(ValueError, match="does not resolve"):
        c.merge(_mk(spark, [(9, 5)]))


def test_stale_props_lock_self_heals(spark, tmp_path):
    """A lock file left by a crashed holder is unlinked and
    re-acquired instead of degrading every later props edit to
    wait-the-timeout-then-run-unlocked."""
    import time as _time

    c = _coll(spark, tmp_path, "c19")
    lock = os.path.join(c.path, "._props.lock")
    with open(lock, "w"):
        pass
    old = _time.time() - 60.0
    os.utime(lock, (old, old))
    t0 = _time.time()
    c.add_constraint("label_nonneg", "label >= 0")
    elapsed = _time.time() - t0
    assert elapsed < 4.0, f"stale lock not healed fast: {elapsed:.1f}s"
    assert c.constraints == {"label_nonneg": "label >= 0"}
    # healed: the stale file is gone and the lock cycle completed
    assert not os.path.exists(lock)


def test_props_lock_release_never_unlinks_a_successors_lock(
    spark, tmp_path
):
    """Identity-token release (round-14 ADVICE low): if our lock name
    was stolen mid-critical-section (clock skew / suspend-resume
    heal) and a successor holds it now, release must leave the
    successor's lock alone — unlinking it would let a third writer
    into the successor's critical section."""
    c = _coll(spark, tmp_path, "c20")
    lock = os.path.join(c.path, "._props.lock")

    def swapping(props):
        # simulate a healer stealing our lock + a successor acquiring
        os.unlink(lock)
        with open(lock, "w") as fh:
            fh.write("successor-token")
        props.setdefault("constraints", {})["a"] = "label >= 0"

    c._rewrite_props(swapping)
    assert os.path.exists(lock), "release unlinked the successor's lock"
    with open(lock) as fh:
        assert fh.read() == "successor-token"
    os.unlink(lock)  # cleanup for later edits
    assert c.constraints.get("a") == "label >= 0"


def test_racing_stale_heals_serialize_and_both_land(spark, tmp_path):
    """Two writers finding the SAME provably-stale lock must not
    double-acquire: the steal is an atomic rename (one racer wins),
    so both edits serialize and BOTH constraints land."""
    import threading
    import time as _time

    c = _coll(spark, tmp_path, "c21")
    lock = os.path.join(c.path, "._props.lock")
    with open(lock, "w") as fh:
        fh.write("crashed-holder")
    old = _time.time() - 60.0
    os.utime(lock, (old, old))

    errs: list[Exception] = []
    inside = []
    overlap = []

    def edit(name):
        def mutate(props):
            inside.append(name)
            if len(inside) - len(overlap) > 1:
                overlap.append(name)  # two holders at once
            _time.sleep(0.2)
            props.setdefault("constraints", {})[name] = "label >= 0"
            overlap.append(None) if False else None
            inside.remove(name)

        try:
            c2 = VersionedCollection(spark, str(tmp_path), "c21")
            c2._rewrite_props(mutate)
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    ts = [
        threading.Thread(target=edit, args=(n,)) for n in ("a", "b")
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(30)
    assert not errs
    assert not overlap, "two writers held the props lock at once"
    assert set(c.constraints) >= {"a", "b"}


def test_fresh_lock_steal_restores_and_never_destroys(
    spark, tmp_path, monkeypatch
):
    """The documented best-effort window (round-16 verdict item 8,
    pinned as behavior): when a healer quarantines a lock whose mtime
    turns out FRESH on re-check (clock skew / suspend-resume), it must
    RESTORE the captured lock via link-if-absent — the foreign
    holder's lock survives, byte-identical, and our own release never
    unlinks it (token mismatch).  The edit still lands after the
    bounded wait (availability over strict exclusion, the documented
    trade)."""
    import time as _time

    c = _coll(spark, tmp_path, "c21")
    lock = os.path.join(c.path, "._props.lock")
    with open(lock, "w") as fh:
        fh.write("foreign-holder-token")
    old = _time.time() - 60.0
    os.utime(lock, (old, old))

    real_getmtime = os.path.getmtime

    def fresh_on_quarantine(path):
        # the quarantine re-check sees a FRESH mtime (the simulated
        # skew); every other path answers truthfully
        if ".stale." in os.path.basename(path):
            return _time.time()
        return real_getmtime(path)

    monkeypatch.setattr(os.path, "getmtime", fresh_on_quarantine)
    t0 = _time.time()
    c.add_constraint("label_nonneg", "label >= 0")
    elapsed = _time.time() - t0
    # the edit landed (after the bounded ~1s re-deadline, not the
    # full original timeout from scratch)
    assert c.constraints == {"label_nonneg": "label >= 0"}
    assert elapsed < 8.0, f"{elapsed:.1f}s"
    # the foreign lock was restored, never clobbered or unlinked
    assert os.path.exists(lock), "fresh lock destroyed by the steal"
    with open(lock) as fh:
        assert fh.read() == "foreign-holder-token"
    # no quarantine debris left behind
    assert not [
        f for f in os.listdir(c.path) if ".stale." in f
    ]
    os.unlink(lock)  # cleanup

"""Scale machinery for row-level UPDATE/DELETE: predicate-implied id
bounds, manifest footer-stats pruning of the match-file discovery
scans, conflict REBASE (the merge protocol extended to update_where /
delete_where / MOR commits), and the deletion-vector accumulation
budget.

The reference has no row-level mutation at all (whole-collection
recreate is its only write path, `Qdrant/VectorDB/Database.py:10-14`);
these are the pieces that keep point updates/deletes O(touched bytes)
and multi-writer-safe on a 100 TB table.
"""

from __future__ import annotations

import pytest

from legalchatbot_vectordb_exp_spark.sources.versioned import (
    VersionedCollection,
    _predicate_id_bounds,
    _stats_candidates,
)


def _vec(i: int) -> list[float]:
    return [float(i), 1.0, 0.0]


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, _vec(i), lbl) for i, lbl in rows],
        "id long, vector array<double>, label long",
    )


def _coll(spark, tmp_path, name, n=32, files=8):
    """ids 0..n-1 range-clustered into ``files`` files, so id-bounded
    predicates provably touch a known file subset."""
    c = VersionedCollection(spark, str(tmp_path), name)
    c.create(
        _mk(spark, [(i, 10 * i) for i in range(n)]),
        dim=3,
        metric="dot",
        normalize=False,
        cluster_files=files,
    )
    return c


def _state(c):
    return {(r.id, r.label) for r in c.read().collect()}


# ------------------------------------------------- predicate id bounds


@pytest.mark.parametrize(
    "pred,want",
    [
        ("id = 7", (7, 7)),
        ("id == 7", (7, 7)),
        ("id >= 3 AND id < 9", (3, 9)),
        ("id BETWEEN 2 AND 5", (2, 5)),
        ("id IN (1, 4, 9)", (1, 9)),
        ("label = 'x' AND id <= 100", (None, 100)),
        ("5 <= id AND id <= 8", (5, 8)),
        ("id > 3 OR id < 1", None),
        ("NOT id = 3", None),
        ("label = 'x'", None),
        ("id = 'doc-7'", ("doc-7", "doc-7")),
        ("id in (2,'x')", None),
        ("id between 'a' and 3", None),
        ("(id = 3)", None),
        ("id = 3 AND id = 'x'", None),
        ("id % 2 = 0", None),
        ("id + 1 = 3", None),
        ("id = 2 AND id BETWEEN 0 AND 9", (2, 2)),
    ],
)
def test_predicate_id_bounds(pred, want):
    assert _predicate_id_bounds(pred, "id") == want


def test_predicate_id_bounds_non_string_gives_up(spark):
    import pyspark.sql.functions as F

    assert _predicate_id_bounds(F.col("id") == 3, "id") is None


def test_stats_candidates_split():
    files = [f"f{i}" for i in range(6)]
    stats = {f"f{i}": [i * 10, i * 10 + 9] for i in range(5)}  # f5: none
    assert _stats_candidates(files, stats, (25, 31)) == (
        ["f2", "f3", "f5"],
        3,
    )
    assert _stats_candidates(files, stats, None) == (files, 0)
    assert _stats_candidates(files, stats, (None, 9)) == (["f0", "f5"], 4)


# -------------------------------------------- discovery-scan pruning


def test_update_discovery_prunes_by_stats(spark, tmp_path):
    """An id-range UPDATE on an 8-file table opens only the files
    whose footer id range intersects — the other 7 are pruned by
    manifest arithmetic, never opened."""
    c = _coll(spark, tmp_path, "upd_prune")
    c.update_where(
        "id >= 4 AND id <= 7", {"label": "label + 1000"}
    )
    st = c.last_update_stats
    assert st["files_pruned_by_stats"] == 7, st
    assert st["files_scanned"] == 1, st
    assert st["files_rewritten"] == 1, st
    want = {
        (i, 10 * i + (1000 if 4 <= i <= 7 else 0)) for i in range(32)
    }
    assert _state(c) == want


def test_delete_discovery_prunes_by_stats(spark, tmp_path):
    c = _coll(spark, tmp_path, "del_prune")
    c.delete_where("id = 5")
    st = c.last_delete_stats
    assert st["files_pruned_by_stats"] == 7, st
    assert st["files_scanned"] == 1, st
    assert _state(c) == {(i, 10 * i) for i in range(32) if i != 5}


def test_mor_delete_prunes_by_stats(spark, tmp_path):
    c = _coll(spark, tmp_path, "mdel_prune")
    c.delete_where("id IN (5, 6)", mode="mor")
    st = c.last_delete_stats
    assert st["files_pruned_by_stats"] == 7, st
    assert st["files_scanned"] == 1, st
    assert _state(c) == {
        (i, 10 * i) for i in range(32) if i not in (5, 6)
    }


def test_mor_update_prunes_by_stats(spark, tmp_path):
    c = _coll(spark, tmp_path, "mupd_prune")
    c.update_where("id = 9", {"label": "7"}, mode="mor")
    st = c.last_update_stats
    assert st["files_pruned_by_stats"] == 7, st
    assert st["files_scanned"] == 1, st
    want = {(i, 10 * i) for i in range(32) if i != 9} | {(9, 7)}
    assert _state(c) == want


def test_unbounded_predicate_prunes_nothing(spark, tmp_path):
    c = _coll(spark, tmp_path, "nobound")
    c.delete_where("label = 50")  # no id bound derivable
    st = c.last_delete_stats
    assert st["files_pruned_by_stats"] == 0
    assert st["files_scanned"] == 8
    assert _state(c) == {(i, 10 * i) for i in range(32) if i != 5}


# -------------------------------------------------- conflict rebase


def _inject_competitor(monkeypatch, action):
    """Run ``action`` once, after the victim's payload is written but
    before its manifest publish — a deterministic publish race.  Works
    for both COW (payload = rewrite) and MOR (payload may be empty;
    the hook rides the first _publish_payload attempt)."""
    orig = VersionedCollection._publish_payload
    fired = []

    def hooked(self, payload, *a, **k):
        if not fired:
            fired.append(1)
            action()
        return orig(self, payload, *a, **k)

    monkeypatch.setattr(
        VersionedCollection, "_publish_payload", hooked
    )
    return fired


def test_update_race_disjoint_rebases(spark, tmp_path, monkeypatch):
    """Two updates of keys living in different files: the loser
    republishes its already-written payload under the winner (ONE
    data job), never re-plans."""
    c = _coll(spark, tmp_path, "upd_race", n=8, files=2)
    w = VersionedCollection(spark, str(tmp_path), "upd_race")
    other = VersionedCollection(spark, str(tmp_path), "upd_race")
    _inject_competitor(
        monkeypatch,
        lambda: other.update_where("id = 6", {"label": "666"}),
    )
    w.update_where("id = 1", {"label": "111"})
    st = w.last_update_stats
    assert st["rebases"] == 1, st
    assert st["retries"] == 0, st
    assert w.io_counters["data_writes"] == 1
    assert c.versions() == [0, 1, 2]
    assert _state(c) == {
        (i, 10 * i) for i in range(8) if i not in (1, 6)
    } | {(1, 111), (6, 666)}


def test_delete_race_disjoint_rebases(spark, tmp_path, monkeypatch):
    c = _coll(spark, tmp_path, "del_race", n=8, files=2)
    w = VersionedCollection(spark, str(tmp_path), "del_race")
    other = VersionedCollection(spark, str(tmp_path), "del_race")
    _inject_competitor(monkeypatch, lambda: other.delete_where("id = 6"))
    w.delete_where("id = 1")
    st = w.last_delete_stats
    assert st["rebases"] == 1, st
    assert st["retries"] == 0, st
    assert w.io_counters["data_writes"] == 1
    assert _state(c) == {
        (i, 10 * i) for i in range(8) if i not in (1, 6)
    }


def test_update_race_same_file_replans(spark, tmp_path, monkeypatch):
    """Write-write conflict (same file): rebase refuses, the update
    re-plans on the winner's snapshot, both SETs land."""
    c = _coll(spark, tmp_path, "upd_conf", n=8, files=2)
    w = VersionedCollection(spark, str(tmp_path), "upd_conf")
    other = VersionedCollection(spark, str(tmp_path), "upd_conf")
    _inject_competitor(
        monkeypatch,
        lambda: other.update_where("id = 2", {"label": "222"}),
    )
    w.update_where("id = 1", {"label": "111"})
    st = w.last_update_stats
    assert st["retries"] == 1, st
    assert st["rebases"] == 0, st
    assert w.io_counters["data_writes"] == 2  # re-planned
    assert _state(c) == {
        (i, 10 * i) for i in range(8) if i not in (1, 2)
    } | {(1, 111), (2, 222)}


def test_mor_delete_race_disjoint_rebases(spark, tmp_path, monkeypatch):
    """Two MOR deletes DV-ing different files: the loser republishes
    its sidecar under the winner without re-running the matching
    scan."""
    c = _coll(spark, tmp_path, "mdel_race", n=8, files=2)
    w = VersionedCollection(spark, str(tmp_path), "mdel_race")
    other = VersionedCollection(spark, str(tmp_path), "mdel_race")
    _inject_competitor(
        monkeypatch,
        lambda: other.delete_where("id = 6", mode="mor"),
    )
    w.delete_where("id = 1", mode="mor")
    st = w.last_delete_stats
    assert st["rebases"] == 1, st
    assert st["retries"] == 0, st
    assert w.io_counters["dv_writes"] == 1  # matching scan ran ONCE
    assert _state(c) == {
        (i, 10 * i) for i in range(8) if i not in (1, 6)
    }


def test_mor_delete_same_file_race_replans(
    spark, tmp_path, monkeypatch
):
    """Two MOR deletes DV-ing the SAME file: overlapping rows cannot
    be proven disjoint — the loser re-plans (its re-scan then sees
    the winner's DV, keeping the pair sets disjoint)."""
    c = _coll(spark, tmp_path, "mdel_conf", n=8, files=2)
    w = VersionedCollection(spark, str(tmp_path), "mdel_conf")
    other = VersionedCollection(spark, str(tmp_path), "mdel_conf")
    _inject_competitor(
        monkeypatch,
        lambda: other.delete_where("id = 2", mode="mor"),
    )
    w.delete_where("id = 1", mode="mor")
    st = w.last_delete_stats
    assert st["retries"] == 1, st
    assert _state(c) == {
        (i, 10 * i) for i in range(8) if i not in (1, 2)
    }


def test_threaded_disjoint_updates_each_run_one_data_job(
    spark, tmp_path
):
    """Real-thread version: whatever the interleaving, both updates
    land and neither reran its data job."""
    import threading

    c = _coll(spark, tmp_path, "upd_thr", n=8, files=2)
    barrier = threading.Barrier(2)
    errs: list[Exception] = []
    writers: dict[int, VersionedCollection] = {}

    def writer(key: int, label: int):
        wr = VersionedCollection(spark, str(tmp_path), "upd_thr")
        writers[key] = wr
        try:
            barrier.wait(timeout=60)
            wr.update_where(
                f"id = {key}", {"label": str(label)}, max_retries=8
            )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    t1 = threading.Thread(target=writer, args=(1, 111))
    t2 = threading.Thread(target=writer, args=(6, 666))
    t1.start(); t2.start()
    t1.join(120); t2.join(120)
    assert not errs, errs
    assert c.versions() == [0, 1, 2]
    assert _state(c) == {
        (i, 10 * i) for i in range(8) if i not in (1, 6)
    } | {(1, 111), (6, 666)}
    for wr in writers.values():
        assert wr.io_counters["data_writes"] == 1


# ------------------------------------------------- DV budget / purge


def test_dv_budget_warns_past_threshold(spark, tmp_path):
    c = _coll(spark, tmp_path, "dvbudget", n=16, files=2)
    c.dv_file_budget = 3
    for i in range(3):
        c.delete_where(f"id = {i}", mode="mor")
    with pytest.warns(RuntimeWarning, match="deletion-vector"):
        c.delete_where("id = 3", mode="mor")
    assert _state(c) == {(i, 10 * i) for i in range(4, 16)}


def test_materialize_dvs_folds_and_drops(spark, tmp_path):
    c = _coll(spark, tmp_path, "dvmat", n=16, files=4)
    for i in (1, 5, 9):
        c.delete_where(f"id = {i}", mode="mor")
    assert len(c.manifest(c.latest_version()).get("dv") or {}) == 3
    res = c.materialize_dvs()
    assert res["dv_dropped"] == 3
    assert res["rewritten"] == 3  # one covered file per delete
    m = c.manifest(c.latest_version())
    assert not m.get("dv")
    assert _state(c) == {
        (i, 10 * i) for i in range(16) if i not in (1, 5, 9)
    }
    # untouched files carried by reference (4 original - 3 covered)
    assert res["version"] == c.latest_version()


def test_dv_auto_compact_fires(spark, tmp_path):
    c = _coll(spark, tmp_path, "dvauto", n=16, files=2)
    c.dv_file_budget = 2
    c.dv_auto_compact = True
    for i in range(4):
        c.delete_where(f"id = {i}", mode="mor")
    # the guard materialized at least once: outstanding DVs bounded
    assert len(
        c.manifest(c.latest_version()).get("dv") or {}
    ) <= c.dv_file_budget
    assert _state(c) == {(i, 10 * i) for i in range(4, 16)}


def test_materialize_dvs_noop_without_dvs(spark, tmp_path):
    c = _coll(spark, tmp_path, "dvnoop", n=8, files=2)
    v0 = c.latest_version()
    res = c.materialize_dvs()
    assert res == {"rewritten": 0, "dv_dropped": 0, "version": v0}
    assert c.latest_version() == v0

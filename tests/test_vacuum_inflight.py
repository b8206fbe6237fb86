"""Deterministic regression for the vacuum vs in-flight-writer race
(round-14 verdict item 5).

A commit's Spark write stages task outputs under
``data/c{v}-{uuid}/_temporary/`` and lands no top-level ``*.parquet``
until job commit — so to vacuum, a commit-in-progress is
indistinguishable from a crashed commit's orphan dir.  The old sweep
(`rmtree` any parquet-less subdir, NO age check) deleted the write
directory from under the job; under full-suite load this surfaced as
a 1-in-N ``FileNotFoundError`` on a task parquet mid-commit in
``test_vacuum_races_concurrent_delta_writer``.  These tests replay
the window synthetically (no timing dependence) and pin the fix: the
``min_file_age_ms`` guard covers the DIRECTORY sweep too.
"""

from __future__ import annotations

import os
import time

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


def _coll(spark, tmp_path, name):
    c = VersionedCollection(spark, str(tmp_path), name)
    c.create(
        _mk(spark, [(i, 10 * i) for i in range(4)]),
        dim=3,
        metric="dot",
        normalize=False,
    )
    return c


def _fake_inflight(c) -> str:
    """Replay the exact on-disk state of a commit mid-Spark-job: a
    fresh data subdir containing only staged task output (no
    top-level parquet yet)."""
    sub = os.path.join(c.path, "data", "c00000099-deadbeef")
    tmp = os.path.join(sub, "_temporary", "0", "task_0")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-00000.parquet"), "wb") as fh:
        fh.write(b"staged-task-output")
    return sub


def _age(path: str, seconds: float) -> None:
    old = time.time() - seconds
    for dp, dns, fns in os.walk(path, topdown=False):
        for x in fns:
            os.utime(os.path.join(dp, x), (old, old))
        os.utime(dp, (old, old))


def test_young_inflight_write_dir_survives_vacuum(spark, tmp_path):
    c = _coll(spark, tmp_path, "vinflight")
    c.merge(_mk(spark, [(0, 1)]))
    sub = _fake_inflight(c)
    c.vacuum(keep_last=1, min_file_age_ms=60_000)
    assert os.path.isdir(sub), (
        "vacuum swept a sub-retention-age in-flight write directory"
    )
    # the staged task file inside is intact
    assert any(
        fns for _dp, _dns, fns in os.walk(sub)
    ), "staged task output was deleted"


def test_aged_orphan_dir_is_swept_with_age_guard_on(spark, tmp_path):
    c = _coll(spark, tmp_path, "vorphan")
    c.merge(_mk(spark, [(0, 1)]))
    sub = _fake_inflight(c)
    _age(sub, 120.0)  # twice the retention age: a genuine orphan
    c.vacuum(keep_last=1, min_file_age_ms=60_000)
    assert not os.path.exists(sub)


def test_age_zero_sweeps_orphan_dirs_immediately(spark, tmp_path):
    # single-writer batch / test mode keeps its instant-sweep contract
    c = _coll(spark, tmp_path, "vzero")
    c.merge(_mk(spark, [(0, 1)]))
    sub = _fake_inflight(c)
    c.vacuum(keep_last=1, min_file_age_ms=0)
    assert not os.path.exists(sub)


def test_vacuum_during_real_commit_window(spark, tmp_path, monkeypatch):
    """Injection twin of the load-dependent race test: run a full
    vacuum INSIDE the commit window (payload written or being
    written, manifest not yet published) and require the commit to
    succeed anyway."""
    c = _coll(spark, tmp_path, "vwindow")
    v = VersionedCollection(spark, str(tmp_path), "vwindow")
    orig = VersionedCollection._write_payload
    fired: list[int] = []

    def hooked(self, df, version, id_col, stat_cols=None, **kw):
        payload = orig(self, df, version, id_col, stat_cols, **kw)
        if not fired:
            fired.append(1)
            # files exist on disk, manifest unpublished: the exact
            # window the rmtree race hit
            v.vacuum(keep_last=1, min_file_age_ms=60_000)
        return payload

    monkeypatch.setattr(VersionedCollection, "_write_payload", hooked)
    c.merge(_mk(spark, [(1, 111), (2, 222)]))
    assert fired
    got = {
        (r.id, r.label)
        for r in c.read().select("id", "label").collect()
    }
    assert (1, 111) in got and (2, 222) in got


def test_restore_refuses_a_vacuumed_target(spark, tmp_path):
    """RESTORE × VACUUM retention hazard (Delta documents the same):
    if the target snapshot's unique files were swept between the
    manifest read and the publish, restore must FAIL LOUDLY instead
    of committing a manifest that references deleted data."""
    import pytest

    c = _coll(spark, tmp_path, "vrestore")
    files0 = set(c.manifest(0)["files"])
    # rewrite everything so v0's files become unreferenced by later
    # manifests ...
    c.delete_where("id >= 0")  # v1: every file rewritten away
    c.merge(_mk(spark, [(i, i) for i in range(4)]))  # v2
    live = set(c.manifest(1)["files"]) | set(c.manifest(2)["files"])
    swept = sorted(files0 - live)
    assert swept, "setup: v0 must have files unreferenced by v1/v2"
    # ... then replay the race deterministically: the sweep lands
    # between restore's manifest read and its publish
    for f in swept:
        os.unlink(os.path.join(c.path, f))
    with pytest.raises(FileNotFoundError, match="retention"):
        c.restore(0)
    # nothing was committed: latest is still v2 and it reads fine
    assert c.latest_version() == 2
    assert {r.id for r in c.read().select("id").collect()} == {
        0, 1, 2, 3,
    }


def test_vacuum_dry_run_reports_without_mutating(spark, tmp_path):
    """Delta ``VACUUM ... DRY RUN`` parity: same counts as the real
    sweep, zero mutation — files, manifests, and the checkpoint all
    untouched; the following real vacuum removes exactly what the dry
    run predicted."""
    import glob

    c = _coll(spark, tmp_path, "vdry")
    c.merge(_mk(spark, [(0, 1)]))
    c.merge(_mk(spark, [(1, 2)]))
    sub = _fake_inflight(c)
    _age(sub, 120.0)
    snapshot = sorted(glob.glob(os.path.join(c.path, "**"), recursive=True))
    dry = c.vacuum(keep_last=1, min_file_age_ms=0, dry_run=True)
    assert dry["dry_run"] is True
    assert snapshot == sorted(
        glob.glob(os.path.join(c.path, "**"), recursive=True)
    ), "dry run touched the filesystem"
    assert dry["removed_files"] == len(dry["candidate_files"]) > 0
    assert dry["removed_manifests"] == len(dry["candidate_manifests"]) == 2
    real = c.vacuum(keep_last=1, min_file_age_ms=0)
    assert real["removed_files"] == dry["removed_files"]
    assert real["removed_manifests"] == dry["removed_manifests"]
    for rel in dry["candidate_files"]:
        assert not os.path.exists(os.path.join(c.path, rel))


def test_dir_emptied_this_pass_retires_in_same_pass(spark, tmp_path):
    """Round-15 ADVICE: unlinking a subdir's parquets refreshes the
    directory mtime, so with min_file_age_ms > 0 the directory the
    vacuum itself just emptied looked 'young' and survived every
    pass.  The sweep now ages the top dir by its PRE-pass mtime when
    this pass unlinked files there — an aged-out data subdir and its
    aged-out unreferenced parquet retire together in ONE vacuum."""
    c = _coll(spark, tmp_path, "vsamepass")
    files_v0 = c.manifest(0)["files"]
    c.recluster(target_files=1)  # v1 rewrites: v0 subdir unreferenced
    sub0 = os.path.join(c.path, os.path.dirname(files_v0[0]))
    _age(sub0, 120.0)
    out = c.vacuum(keep_last=1, min_file_age_ms=60_000)
    assert out["removed_files"] >= 1
    assert not os.path.exists(sub0), (
        "subdir emptied by this vacuum must retire in the same pass"
    )


def test_racing_fresh_staging_still_blocks_emptied_dir(spark, tmp_path):
    """The pre-pass-mtime substitution must NOT weaken the in-flight
    guard: if a racing writer staged FRESH content under the same
    subdir, the walk still sees young mtimes and the dir survives."""
    c = _coll(spark, tmp_path, "vsamepassrace")
    files_v0 = c.manifest(0)["files"]
    c.recluster(target_files=1)
    sub0 = os.path.join(c.path, os.path.dirname(files_v0[0]))
    _age(sub0, 120.0)
    tmp = os.path.join(sub0, "_temporary", "0", "task_0")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-00000.parquet"), "wb") as fh:
        fh.write(b"fresh-staged-task-output")  # young mtimes
    c.vacuum(keep_last=1, min_file_age_ms=60_000)
    assert os.path.isdir(sub0), (
        "fresh racing staging must keep blocking the dir sweep"
    )
    assert os.path.exists(os.path.join(tmp, "part-00000.parquet"))


def test_restore_vacuum_race_rolls_forward(spark, tmp_path, monkeypatch):
    """Round-15 ADVICE: the pre-publish existence check is
    check-then-act — a vacuum between the stat loop and _publish can
    retire the target's files, committing a manifest that references
    swept data.  Replay that window deterministically: the racing
    sweep fires INSIDE the restore's publish, after the pre-check
    passed.  restore() must re-verify post-publish, roll FORWARD to
    the pre-restore snapshot, and raise."""
    c = _coll(spark, tmp_path, "vrestorerace")
    v0_files = c.manifest(0)["files"]
    c.recluster(target_files=1)  # v1: different file set
    base = c.latest_version()
    base_files = list(c.manifest(base)["files"])

    real_publish = type(c)._publish
    fired = {"n": 0}

    def racing_publish(self, manifest):
        real_publish(self, manifest)
        if manifest.get("operation") == "restore" and fired["n"] == 0:
            fired["n"] += 1
            # the racing vacuum retires v0's unique file AFTER the
            # restore's pre-check and publish
            os.unlink(os.path.join(self.path, v0_files[0]))

    monkeypatch.setattr(type(c), "_publish", racing_publish)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="rolled forward"):
        c.restore(0)
    monkeypatch.setattr(type(c), "_publish", real_publish)
    # the log rolled forward: latest snapshot equals the pre-restore
    # state and reads cleanly
    assert c.latest_version() == base + 2
    m = c.manifest(c.latest_version())
    assert m["files"] == base_files
    assert m["operation"] == "restore"
    assert m["restored_version"] == base
    assert c.read().count() == 4


def test_vacuum_refolds_versions_published_after_planning(
    spark, tmp_path, monkeypatch
):
    """Round-16 review: a restore that publishes AFTER vacuum built
    its referenced set (but before the sweep) re-references files
    outside the keep window — vacuum must fold post-planning versions
    into the referenced set before unlinking.  The race is replayed
    deterministically by firing the restore inside vacuum's
    checkpoint write (which happens after planning, before the
    sweep)."""
    c = _coll(spark, tmp_path, "vreplan")
    v0_files = list(c.manifest(0)["files"])
    c.recluster(target_files=1)  # v1: fresh file set

    real_ckpt = type(c)._write_checkpoint
    fired = {"n": 0}

    def racing_ckpt(self, entries):
        real_ckpt(self, entries)
        if fired["n"] == 0:
            fired["n"] += 1
            # the racing writer: restore(0) publishes v2 referencing
            # v0's files — AFTER vacuum planned, BEFORE it sweeps
            VersionedCollection(
                spark, str(tmp_path), "vreplan"
            ).restore(0)

    monkeypatch.setattr(type(c), "_write_checkpoint", racing_ckpt)
    _age(os.path.join(c.path, "data"), 120.0)
    c.vacuum(keep_last=1, min_file_age_ms=0)
    monkeypatch.setattr(type(c), "_write_checkpoint", real_ckpt)
    # the restored snapshot's files survived the sweep and read back
    for f in v0_files:
        assert os.path.isfile(os.path.join(c.path, f)), f
    assert c.latest_version() == 2
    assert c.read().count() == 4

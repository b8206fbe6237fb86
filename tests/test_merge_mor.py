"""Merge-on-read UPSERT (``merge_mor``) and the MOR streaming-ingest
mode: matched rows die via a deletion-vector sidecar, the batch
appends as one new file — per-commit bytes ∝ batch size, never
matched-file size.  The rewrite-amplification-free path for
update-heavy CDC streams (the reference's only write path is the
whole-collection recreate, `Qdrant/VectorDB/Database.py:10-14`).
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


def _coll(spark, tmp_path, name, n=8, files=2):
    c = VersionedCollection(spark, str(tmp_path), name)
    c.create(
        _mk(spark, [(i, 10 * i) for i in range(n)]),
        dim=3,
        metric="dot",
        normalize=False,
        cluster_files=files,
    )
    return c


def _state(c, version=None):
    return {(r.id, r.label) for r in c.read(version=version).collect()}


def test_merge_mor_upsert_rewrites_nothing(spark, tmp_path):
    c = _coll(spark, tmp_path, "mm1")
    files0 = c.manifest(0)["files"]
    c.merge_mor(_mk(spark, [(1, 111), (2, 222)]))
    m = c.manifest(1)
    # every parent file carries; exactly one appended file + a dv
    assert set(files0) < set(m["files"])
    assert len(m["files"]) == len(files0) + 1
    assert m.get("dv"), m
    assert _state(c) == {
        (i, 10 * i) for i in range(8) if i not in (1, 2)
    } | {(1, 111), (2, 222)}
    st = c.last_merge_stats
    assert st["files_rewritten"] == 0
    # key bounds (1,2) prune the [4..7] file from the matching scan
    assert st["files_pruned_by_stats"] == 1, st


def test_merge_mor_pure_insert_no_dv(spark, tmp_path):
    c = _coll(spark, tmp_path, "mm2")
    c.merge_mor(_mk(spark, [(100, 1), (101, 2)]))
    m = c.manifest(1)
    assert not m.get("dv")
    assert _state(c) == {(i, 10 * i) for i in range(8)} | {
        (100, 1),
        (101, 2),
    }


def test_merge_mor_replay_is_value_idempotent(spark, tmp_path):
    """Re-merging the same batch (crash replay) must converge to the
    same state: the replay DVs the first attempt's appended rows and
    appends equal ones."""
    c = _coll(spark, tmp_path, "mm3")
    batch = _mk(spark, [(1, 111), (100, 1000)])
    c.merge_mor(batch)
    s1 = _state(c)
    c.merge_mor(batch)
    assert _state(c) == s1
    # the replay's DV covers the first append (its rows died in place)
    m = c.manifest(c.latest_version())
    assert len(m.get("dv") or {}) == 2


def test_merge_mor_validation(spark, tmp_path):
    c = _coll(spark, tmp_path, "mm4")
    with pytest.raises(ValueError, match="duplicate ids"):
        c.merge_mor(_mk(spark, [(1, 1), (1, 2)]))
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0], 5)], "id long, vector array<double>, label long"
    )
    with pytest.raises(ValueError, match="dim"):
        c.merge_mor(bad)
    extra = spark.createDataFrame(
        [(1, _vec(1), 5, 9)],
        "id long, vector array<double>, label long, extra long",
    )
    with pytest.raises(ValueError, match="schema evolution"):
        c.merge_mor(extra)
    assert c.latest_version() == 0  # nothing committed


def test_merge_mor_enforces_constraints(spark, tmp_path):
    c = _coll(spark, tmp_path, "mm5")
    c.add_constraint("nonneg", "label >= 0")
    with pytest.raises(Exception, match="CHECK constraint nonneg"):
        c.merge_mor(_mk(spark, [(9, -5)]))
    assert c.latest_version() == 0
    # no orphan sidecar left behind
    data_dir = os.path.join(c.path, "data")
    dv_dirs = [d for d in os.listdir(data_dir) if "-dv-" in d]
    assert not dv_dirs


def test_merge_mor_cosine_renormalizes(spark, tmp_path):
    c = VersionedCollection(spark, str(tmp_path), "mm6")
    c.create(
        _mk(spark, [(0, 0)]), dim=3, metric="cosine", normalize=True
    )
    c.merge_mor(
        spark.createDataFrame(
            [(1, [3.0, 4.0, 0.0], 5)],
            "id long, vector array<double>, label long",
        )
    )
    v = c.read().filter(F.col("id") == 1).head().vector
    assert abs(sum(x * x for x in v) - 1.0) < 1e-9


def test_merge_mor_changes_feed_sees_update(spark, tmp_path):
    """CDC diffs snapshot STATE: the DV+append mechanism surfaces as a
    plain update row, indistinguishable from a COW merge."""
    c = _coll(spark, tmp_path, "mm7")
    c.merge_mor(_mk(spark, [(1, 111), (100, 1000)]))
    feed = {
        (r.id, r.label, r._change_type)
        for r in c.changes(0, 1).collect()
    }
    assert feed == {
        (1, 111, "update_postimage"),
        (100, 1000, "insert"),
    }


def test_merge_mor_then_materialize(spark, tmp_path):
    c = _coll(spark, tmp_path, "mm8")
    c.merge_mor(_mk(spark, [(1, 111)]))
    c.materialize_dvs()
    m = c.manifest(c.latest_version())
    assert not m.get("dv")
    assert _state(c) == {
        (i, 10 * i) for i in range(8) if i != 1
    } | {(1, 111)}


def test_stream_mor_ingest_crash_replay_exactly_once(
    spark, tmp_path, monkeypatch
):
    """The MOR twin of the COW crash-replay test: kill the second
    merge_mor commit between sidecar/append write and manifest
    publish, restart from the same checkpoint — the replayed epoch
    commits exactly once and converges to the same state."""
    from pyspark.sql.streaming import StreamingQueryException

    from legalchatbot_vectordb_exp_spark.streaming.ingest import (
        read_document_stream,
        stream_merge_into_versioned,
    )

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    spark.createDataFrame(
        [(1, "alpha beta")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(2, "gamma delta")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)

    c = VersionedCollection(spark, str(tmp_path / "wh"), "morcrash")
    seed = spark.createDataFrame(
        [(99, [1.0] + [0.0] * 63)], "id long, vector array<double>"
    )
    c.create(seed, dim=64)

    orig_publish = VersionedCollection._publish
    state = {"merges_seen": 0, "crashed": False}

    def crashing(self, manifest):
        if manifest["operation"] == "merge:mor":
            state["merges_seen"] += 1
            if state["merges_seen"] == 2 and not state["crashed"]:
                state["crashed"] = True
                raise RuntimeError("simulated crash before publish")
        return orig_publish(self, manifest)

    monkeypatch.setattr(VersionedCollection, "_publish", crashing)

    q = stream_merge_into_versioned(
        read_document_stream(spark, src, max_files_per_trigger=1),
        c,
        ckpt,
        dim=64,
        mode="mor",
    )
    with pytest.raises(StreamingQueryException, match="simulated crash"):
        q.awaitTermination(120)
    assert state["crashed"]

    q2 = stream_merge_into_versioned(
        read_document_stream(spark, src, max_files_per_trigger=1),
        c,
        ckpt,
        dim=64,
        mode="mor",
    )
    q2.awaitTermination(120)

    ids = {r.id for r in c.read().select("id").collect()}
    assert ids == {1, 2, 99}
    ops = [m["operation"] for m in c.history()]
    assert ops.count("merge:mor") == 2  # one per epoch, no double
    vs = c.versions()
    assert vs == list(range(len(vs)))
    # zero data-file rewrites across the whole ingest: every version's
    # file set contains its parent's
    for v in range(1, len(vs)):
        assert set(c.manifest(v - 1)["files"]) <= set(
            c.manifest(v)["files"]
        )


def test_merge_mor_empty_batch_is_carried_only_noop(spark, tmp_path):
    """An EMPTY CDC micro-batch must not write a zero-row parquet:
    the stats-less file it added made every concurrent writer's
    _conflict_free_base read 'evidence missing → conflict' until a
    compaction folded it away (round-14 ADVICE low).  The commit is
    carried-only: same files, no dv, n_written 0 — and a later
    writer's rebase window across it stays conflict-free."""
    c = _coll(spark, tmp_path, "mmempty")
    files0 = c.manifest(0)["files"]
    schema0 = c.manifest(0)["schema"]
    empty = _mk(spark, []).filter(F.lit(False))
    c.merge_mor(empty)
    m = c.manifest(1)
    assert m["files"] == files0          # nothing appended
    assert not m.get("dv")               # nothing matched
    assert m.get("n_written", 0) == 0
    assert _state(c) == {(i, 10 * i) for i in range(8)}
    # every file in the snapshot still has id stats — no stats-less
    # file poisoning later conflict checks ...
    assert set(m.get("stats", {})) == set(m["files"])
    # ... so a writer whose race window spans the empty commit can
    # still prove disjointness and rebase
    assert (
        c._conflict_free_base(0, set(), (500, 600), schema0) == 1
    )

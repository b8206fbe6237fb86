"""Column mapping on the versioned collection: rename/drop column as
METADATA-ONLY commits (Delta column-mapping parity).  Data files keep
their immutable PHYSICAL column names; the manifest's
logical→physical map resolves reads, so neither DDL rewrites a byte.

The reference's only schema change is lazily adding a column
(`Qdrant/llm.py:89-91`); this is the full rename/drop lifecycle on
top of that pattern.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from legalchatbot_vectordb_exp_spark.sources.versioned import (
    VersionedCollection,
)


def _vec(i: int) -> list[float]:
    return [float(i), 1.0, 0.0]


def _mk(spark, rows, label_col="label"):
    return spark.createDataFrame(
        [(i, _vec(i), lbl) for i, lbl in rows],
        f"id long, vector array<double>, {label_col} long",
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


def test_rename_is_metadata_only(spark, tmp_path):
    c = _coll(spark, tmp_path, "r1")
    files_before = list(c.manifest(c.latest_version())["files"])
    c.rename_column("label", "score")
    m = c.manifest(c.latest_version())
    assert m["files"] == files_before  # ZERO data-file changes
    assert m["operation"] == "rename_column"
    assert m["column_mapping"] == {"score": "label"}
    df = c.read()
    assert df.columns == ["id", "vector", "score"]
    assert {(r.id, r.score) for r in df.collect()} == {
        (i, 10 * i) for i in range(8)
    }


def test_rename_time_travel_sees_old_name(spark, tmp_path):
    c = _coll(spark, tmp_path, "r2")
    c.rename_column("label", "score")
    old = c.read(version=0)
    assert old.columns == ["id", "vector", "label"]
    assert {(r.id, r.label) for r in old.collect()} == {
        (i, 10 * i) for i in range(8)
    }


def test_drop_is_metadata_only_and_time_travels(spark, tmp_path):
    c = _coll(spark, tmp_path, "d1")
    files_before = list(c.manifest(c.latest_version())["files"])
    c.drop_column("label")
    m = c.manifest(c.latest_version())
    assert m["files"] == files_before
    assert m["retired_columns"] == ["label"]
    assert c.read().columns == ["id", "vector"]
    assert c.read(version=0).columns == ["id", "vector", "label"]


def test_merge_after_rename_uses_new_name(spark, tmp_path):
    """Post-rename the logical schema has the new name: a merge source
    carries it, the written files store the PHYSICAL (old) name, and
    reads resolve both old and new files through the map."""
    c = _coll(spark, tmp_path, "r3")
    c.rename_column("label", "score")
    c.merge(_mk(spark, [(1, 111), (100, 1000)], label_col="score"))
    got = {(r.id, r.score) for r in c.read().collect()}
    want = {(i, 10 * i) for i in range(8) if i != 1} | {
        (1, 111),
        (100, 1000),
    }
    assert got == want
    # the new file really stores the physical name
    import pyarrow.parquet as pq
    import os

    m = c.manifest(c.latest_version())
    newest = [f for f in m["files"] if "c0000000" not in f.split("/")[1][:9]]
    for f in m["files"]:
        cols = pq.read_schema(os.path.join(c.path, f)).names
        assert "label" in cols and "score" not in cols, (f, cols)


def test_update_delete_after_rename(spark, tmp_path):
    c = _coll(spark, tmp_path, "r4")
    c.rename_column("label", "score")
    c.update_where("id = 2", {"score": "score + 5"})
    c.delete_where("score = 30")  # old id 3
    got = {(r.id, r.score) for r in c.read().collect()}
    want = {(i, 10 * i) for i in range(8) if i not in (2, 3)} | {
        (2, 25)
    }
    assert got == want


def test_evolution_readd_of_dropped_name_gets_fresh_physical(
    spark, tmp_path
):
    """Drop ``label`` then schema-evolve a NEW ``label`` in: old files
    still carry the retired physical column, so the new logical column
    must NOT resurrect their stored values — old rows read NULL."""
    c = _coll(spark, tmp_path, "d2")
    c.drop_column("label")
    src = spark.createDataFrame(
        [(100, _vec(100), 7)], "id long, vector array<double>, label long"
    )
    c.merge(src, schema_evolution=True)
    rows = {(r.id, r.label) for r in c.read().select("id", "label").collect()}
    assert (100, 7) in rows
    for i in range(8):
        assert (i, None) in rows, rows  # NOT (i, 10*i)
    # the fresh physical name is recorded and distinct
    m = c.manifest(c.latest_version())
    assert m["column_mapping"]["label"] != "label"
    assert m["retired_columns"] == ["label"]


def test_rename_guard_rails(spark, tmp_path):
    c = _coll(spark, tmp_path, "r5")
    with pytest.raises(ValueError, match="cannot rename the id"):
        c.rename_column("id", "doc_id")
    with pytest.raises(ValueError, match="cannot rename the vector"):
        c.rename_column("vector", "emb")
    with pytest.raises(ValueError, match="not in table schema"):
        c.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        c.rename_column("label", "vector")
    with pytest.raises(ValueError, match="invalid column name"):
        c.rename_column("label", "bad name")
    with pytest.raises(ValueError, match="cannot drop the id"):
        c.drop_column("id")


def test_rename_blocked_by_constraint(spark, tmp_path):
    c = _coll(spark, tmp_path, "r6")
    c.add_constraint("nonneg", "label >= 0")
    with pytest.raises(ValueError, match="drop_constraint"):
        c.rename_column("label", "score")
    with pytest.raises(ValueError, match="drop_constraint"):
        c.drop_column("label")
    c.drop_constraint("nonneg")
    c.rename_column("label", "score")
    assert "score" in c.read().columns


def test_rename_back_restores_identity_mapping(spark, tmp_path):
    c = _coll(spark, tmp_path, "r7")
    c.rename_column("label", "score")
    c.rename_column("score", "label")
    m = c.manifest(c.latest_version())
    assert not m.get("column_mapping")
    assert {(r.id, r.label) for r in c.read().collect()} == {
        (i, 10 * i) for i in range(8)
    }


def test_changes_across_rename_compares_physical(spark, tmp_path):
    """A rename inside the CDC span is a schema event, not a data
    change: the feed must compare the renamed column's stored values
    (physical identity), yielding NO rows for the rename itself and
    surfacing real updates under the NEW name."""
    c = _coll(spark, tmp_path, "cdc1")
    v0 = c.latest_version()
    c.rename_column("label", "score")
    feed = c.changes(v0).collect()
    assert feed == []  # metadata-only: nothing changed
    c.update_where("id = 2", {"score": "99"})
    feed = c.changes(v0).collect()
    assert len(feed) == 1
    r = feed[0]
    assert (r.id, r.score, r._change_type) == (2, 99, "update_postimage")


def test_changes_across_drop_ignores_dropped_column(spark, tmp_path):
    c = _coll(spark, tmp_path, "cdc2")
    v0 = c.latest_version()
    c.drop_column("label")
    assert c.changes(v0).collect() == []


def test_restore_to_pre_rename(spark, tmp_path):
    c = _coll(spark, tmp_path, "rst1")
    c.rename_column("label", "score")
    c.merge(_mk(spark, [(1, 111)], label_col="score"))
    c.restore(0)
    df = c.read()
    assert df.columns == ["id", "vector", "label"]
    assert {(r.id, r.label) for r in df.collect()} == {
        (i, 10 * i) for i in range(8)
    }


def test_clone_carries_mapping(spark, tmp_path):
    c = _coll(spark, tmp_path, "cl1")
    c.rename_column("label", "score")
    d = c.clone("cl1_copy")
    assert d.read().columns == ["id", "vector", "score"]
    assert {(r.id, r.score) for r in d.read().collect()} == {
        (i, 10 * i) for i in range(8)
    }


def test_compact_and_recluster_after_rename(spark, tmp_path):
    c = _coll(spark, tmp_path, "cr1", n=16, files=4)
    c.rename_column("label", "score")
    c.compact(target_file_bytes=1 << 30)  # everything is "small"
    assert {(r.id, r.score) for r in c.read().collect()} == {
        (i, 10 * i) for i in range(16)
    }
    c.recluster()
    assert {(r.id, r.score) for r in c.read().collect()} == {
        (i, 10 * i) for i in range(16)
    }
    # compacted/reclustered files were written under the PHYSICAL name
    import os
    import pyarrow.parquet as pq

    m = c.manifest(c.latest_version())
    for f in m["files"]:
        cols = pq.read_schema(os.path.join(c.path, f)).names
        assert "label" in cols and "score" not in cols


def test_mor_delete_after_rename(spark, tmp_path):
    c = _coll(spark, tmp_path, "mor1")
    c.rename_column("label", "score")
    c.delete_where("score = 20", mode="mor")
    assert {(r.id, r.score) for r in c.read().collect()} == {
        (i, 10 * i) for i in range(8) if i != 2
    }


def test_zorder_col_stats_survive_rename(spark, tmp_path):
    """read_range pruning on a renamed z-order column keeps working:
    the DDL remaps the manifest col_stats keys."""
    rows = [(i, _vec(i), 10 * i, i % 4) for i in range(32)]
    df = spark.createDataFrame(
        rows, "id long, vector array<double>, a long, b long"
    )
    c = VersionedCollection(spark, str(tmp_path), "z1")
    c.create(df, dim=3, metric="dot", normalize=False)
    c.recluster(target_files=4, zorder_by=["a", "b"])
    c.rename_column("a", "alpha")
    out = c.read_range(0, 70, column="alpha")
    assert {r.id for r in out.collect()} == {i for i in range(8)}
    assert c.last_read_stats["files_pruned"] > 0


def test_maintenance_ops_resolve_through_the_map(spark, tmp_path):
    """materialize_dvs / compact / recluster / Z-order after a rename
    must read logical names, write PHYSICAL names, and keep every
    later read correct — the rewrite paths all route through
    _write_payload(mapping=...), pinned here end-to-end."""
    import pyspark.sql.functions as F

    from legalchatbot_vectordb_exp_spark.sources.versioned import (
        VersionedCollection,
    )

    def mk(rows):
        return spark.createDataFrame(
            [(i, [float(i), 1.0, 0.0], lbl) for i, lbl in rows],
            "id long, vector array<double>, label long",
        )

    c = VersionedCollection(spark, str(tmp_path), "mapmaint")
    c.create(
        mk([(i, 10 * i) for i in range(8)]),
        dim=3,
        metric="dot",
        normalize=False,
        cluster_files=4,
    )
    c.rename_column("label", "score")
    c.delete_where("id = 3", mode="mor")
    c.update_where("id = 5", {"score": F.col("score") + 1}, mode="mor")
    st = c.materialize_dvs()
    assert st["dv_dropped"] == 2
    want = {(i, 10 * i) for i in range(8) if i not in (3, 5)} | {(5, 51)}
    state = lambda: {  # noqa: E731
        (r.id, r.score) for r in c.read().select("id", "score").collect()
    }
    assert state() == want
    c.compact()
    assert state() == want
    c.recluster(target_files=2)
    assert state() == want
    c.recluster(target_files=2, zorder_by=["id", "score"])
    assert state() == want
    # pre-rename snapshots still resolve the OLD name
    assert "label" in c.read(version=0).columns


def test_rename_racing_merge_raises_concurrent_not_evolution_advice(
    spark, tmp_path, monkeypatch
):
    """A rename DDL winning the race window means the loser merge's
    source now carries a stale column name.  The retry must surface
    ConcurrentWriteError (Delta's MetadataChangedException shape) —
    NOT the 'pass schema_evolution=True' ValueError, whose advice
    would fork the renamed column into old+new twins."""
    import pytest

    from legalchatbot_vectordb_exp_spark.sources.versioned import (
        ConcurrentWriteError,
        VersionedCollection,
    )

    def mk(rows):
        return spark.createDataFrame(
            [(i, [float(i), 1.0, 0.0], lbl) for i, lbl in rows],
            "id long, vector array<double>, label long",
        )

    c = VersionedCollection(spark, str(tmp_path), "renrace")
    c.create(
        mk([(i, 10 * i) for i in range(6)]),
        dim=3,
        metric="dot",
        normalize=False,
        cluster_files=2,
    )
    orig = VersionedCollection._write_payload
    fired: list[int] = []

    def hooked(self, *a, **kw):
        payload = orig(self, *a, **kw)
        if not fired:
            fired.append(1)
            VersionedCollection(
                spark, str(tmp_path), "renrace"
            ).rename_column("label", "score")
        return payload

    monkeypatch.setattr(VersionedCollection, "_write_payload", hooked)
    with pytest.raises(ConcurrentWriteError, match="schema changed"):
        c.merge(mk([(0, 999)]), max_retries=8)
    # nothing half-committed: rename landed, data unchanged
    got = {
        (r.id, r.score) for r in c.read().select("id", "score").collect()
    }
    assert got == {(i, 10 * i) for i in range(6)}

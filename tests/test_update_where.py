"""Row-level UPDATE: ``update_where(pred, {col: expr})`` in both
Delta execution modes — copy-on-write (rewrite only matched files)
and merge-on-read (DV-kill the old versions in place + append the
updated rows, zero data rewrite).

The reference's only mutation is the whole-collection recreate
(`Qdrant/VectorDB/Database.py:10-14`); this is Delta ``UPDATE``
parity re-expressed over the versioned manifest log.
"""

from __future__ import annotations

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


def _state(c, **kw):
    return {
        (r.id, r.label)
        for r in c.read(**kw).select("id", "label").collect()
    }


def _clustered(spark, tmp_path, name, n=8, files=4):
    c = VersionedCollection(spark, str(tmp_path), name)
    c.create(
        _mk(spark, [(i, 10 * i) for i in range(n)]),
        dim=3,
        metric="dot",
        normalize=False,
        cluster_files=files,
    )
    return c


# ------------------------------------------------------------------ mor


def test_mor_update_rewrites_no_file_and_time_travels(spark, tmp_path):
    c = _clustered(spark, tmp_path, "u1")
    files0 = c.manifest(0)["files"]
    c.update_where("id >= 6", {"label": F.col("label") + 1}, mode="mor")
    m1 = c.manifest(1)
    assert m1["operation"] == "update_where:mor"
    # every parent file carries; exactly the appended file is new
    assert set(files0) < set(m1["files"])
    assert m1["n_written"] >= 1
    dv = m1["dv"]
    assert len(dv) == 1  # one sidecar, covering the matched file
    (cov,) = dv.values()
    assert len(cov) == 1 and cov[0] in files0
    assert _state(c) == {(i, 10 * i) for i in range(6)} | {
        (6, 61),
        (7, 71),
    }
    assert _state(c, version=0) == {(i, 10 * i) for i in range(8)}


def test_mor_update_set_expr_reads_old_row(spark, tmp_path):
    """SET expressions evaluate against the OLD row (``label + id``),
    and may be SQL strings."""
    c = _clustered(spark, tmp_path, "u2")
    c.update_where("id = 3", {"label": "label + id"}, mode="mor")
    assert (3, 33) in _state(c)


def test_mor_update_stacks_on_prior_dv_and_updates_updated_row(
    spark, tmp_path
):
    """A second MOR update matching an already-updated row must kill
    the NEW file's copy (the old copy is already DV-dead) — pair sets
    stay disjoint, one live copy per id."""
    c = _clustered(spark, tmp_path, "u3")
    c.update_where("id = 5", {"label": F.lit(500)}, mode="mor")
    c.update_where("label = 500", {"label": F.lit(501)}, mode="mor")
    assert (5, 501) in _state(c)
    assert (5, 500) in _state(c, version=1)
    assert (5, 50) in _state(c, version=0)
    # both DV sidecars live at v2 (nothing rewrote their files)
    assert len(c.manifest(2)["dv"]) == 2


def test_mor_update_no_match_commits_noop(spark, tmp_path):
    c = _clustered(spark, tmp_path, "u4")
    c.update_where("id > 100", {"label": F.lit(0)}, mode="mor")
    m1 = c.manifest(1)
    assert m1["n_written"] == 0 and not m1.get("dv")
    assert _state(c) == {(i, 10 * i) for i in range(8)}


def test_mor_update_null_predicate_keeps_rows(spark, tmp_path):
    """Rows where the predicate is NULL are untouched (SQL WHERE)."""
    c = _clustered(spark, tmp_path, "u5")
    c.update_where(
        F.when(F.col("id") == 2, F.lit(True)),  # NULL elsewhere
        {"label": F.lit(222)},
        mode="mor",
    )
    assert _state(c) == {(i, 10 * i) for i in range(8) if i != 2} | {
        (2, 222)
    }


def test_compact_materializes_update_dv(spark, tmp_path):
    """Compaction of the covered file folds the DV away and keeps the
    updated values (no resurrection of the dead pre-image)."""
    c = _clustered(spark, tmp_path, "u6")
    c.update_where("id <= 1", {"label": F.lit(-1)}, mode="mor")
    c.compact(target_file_bytes=1 << 30, min_files=2)
    m = c.manifest(c.latest_version())
    assert not m.get("dv")
    assert _state(c) == {(0, -1), (1, -1)} | {
        (i, 10 * i) for i in range(2, 8)
    }


def test_changes_sees_mor_update_as_update_rows(spark, tmp_path):
    """CDC diffs snapshot STATE: a MOR update surfaces as
    update_postimage (+preimage when asked), never as the underlying
    delete+insert pair."""
    c = _clustered(spark, tmp_path, "u7")
    c.update_where("id = 4", {"label": F.lit(444)}, mode="mor")
    feed = c.changes(0, 1).collect()
    assert {(r.id, r.label, r._change_type) for r in feed} == {
        (4, 444, "update_postimage")
    }
    full = c.changes(0, 1, preimages=True).collect()
    assert {(r.id, r.label, r._change_type) for r in full} == {
        (4, 444, "update_postimage"),
        (4, 40, "update_preimage"),
    }


def test_identity_update_yields_no_change_rows(spark, tmp_path):
    """SET to the same value: the commit lands (DV + new file) but the
    state diff is empty — CDC consumers see nothing."""
    c = _clustered(spark, tmp_path, "u8")
    c.update_where("id = 4", {"label": F.col("label")}, mode="mor")
    assert c.latest_version() == 1
    assert c.changes(0, 1).count() == 0
    assert _state(c) == {(i, 10 * i) for i in range(8)}


# ------------------------------------------------------------------ cow


def test_cow_update_rewrites_only_matched_files(spark, tmp_path):
    c = _clustered(spark, tmp_path, "u9")
    files0 = c.manifest(0)["files"]
    c.update_where("id = 0", {"label": F.lit(100)})  # file [0,1]
    m1 = c.manifest(1)
    assert m1["operation"] == "update_where"
    assert not m1.get("dv")
    carried = set(files0) & set(m1["files"])
    assert len(carried) == 3  # 3 of 4 files untouched
    assert _state(c) == {(0, 100)} | {
        (i, 10 * i) for i in range(1, 8)
    }
    assert _state(c, version=0) == {(i, 10 * i) for i in range(8)}


def test_cow_update_materializes_dv_without_resurrection(
    spark, tmp_path
):
    """A COW update rewriting a DV-covered file applies the DV to the
    rewrite (dead rows stay dead) and drops the cover."""
    c = _clustered(spark, tmp_path, "u10")
    c.delete_where("id = 1", mode="mor")  # file [0,1]
    c.update_where("id = 0", {"label": F.lit(5)})  # same file
    m = c.manifest(2)
    assert not m.get("dv")
    assert _state(c) == {(0, 5)} | {(i, 10 * i) for i in range(2, 8)}


def test_cow_update_no_match_commits_noop(spark, tmp_path):
    c = _clustered(spark, tmp_path, "u11")
    c.update_where("id > 100", {"label": F.lit(0)})
    assert c.manifest(1)["n_written"] == 0
    assert _state(c) == {(i, 10 * i) for i in range(8)}


# ------------------------------------------------------------ contracts


def test_update_id_col_rejected(spark, tmp_path):
    c = _clustered(spark, tmp_path, "u12")
    with pytest.raises(ValueError, match="key column"):
        c.update_where("id = 0", {"id": F.lit(99)})


def test_update_unknown_col_rejected(spark, tmp_path):
    c = _clustered(spark, tmp_path, "u13")
    with pytest.raises(ValueError, match="not in table schema"):
        c.update_where("id = 0", {"nope": F.lit(1)})


def test_update_empty_set_rejected(spark, tmp_path):
    c = _clustered(spark, tmp_path, "u14")
    with pytest.raises(ValueError, match="non-empty"):
        c.update_where("id = 0", {})


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_vector_update_enforces_dim(spark, tmp_path, mode):
    c = _clustered(spark, tmp_path, f"u15{mode}")
    with pytest.raises(Exception, match="violates dim"):
        c.update_where(
            "id = 0",
            {"vector": F.array(F.lit(1.0), F.lit(2.0))},  # dim 2 != 3
            mode=mode,
        )
    # a failed update must not have committed
    assert c.latest_version() == 0


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_vector_update_valid_dim_lands(spark, tmp_path, mode):
    c = _clustered(spark, tmp_path, f"u16{mode}")
    c.update_where(
        "id = 0",
        {"vector": F.array(F.lit(9.0), F.lit(9.0), F.lit(9.0))},
        mode=mode,
    )
    row = c.read().filter(F.col("id") == 0).head()
    assert list(row.vector) == [9.0, 9.0, 9.0]


def test_update_set_cast_keeps_schema(spark, tmp_path):
    """``label + 0.5`` would widen a long column to double — the SET
    cast pins the committed schema to the table's."""
    c = _clustered(spark, tmp_path, "u17")
    c.update_where("id = 0", {"label": F.col("label") + 0.5})
    assert c.read().schema["label"].dataType.simpleString() == "bigint"


def test_update_concurrent_race_retries(spark, tmp_path, monkeypatch):
    """A lost publish race re-plans on the winner's snapshot: both a
    foreign merge and this update land."""
    c = _clustered(spark, tmp_path, "u18")
    other = VersionedCollection(spark, str(tmp_path), "u18")
    orig = VersionedCollection._publish
    fired = {"n": 0}

    def racy(self, manifest):
        if fired["n"] == 0 and manifest.get("operation", "").startswith(
            "update_where"
        ):
            fired["n"] = 1
            other.merge(_mk(spark, [(7, 700)]))
        return orig(self, manifest)

    monkeypatch.setattr(VersionedCollection, "_publish", racy)
    c.update_where("id = 0", {"label": F.lit(111)}, mode="mor")
    assert _state(c) == {(0, 111), (7, 700)} | {
        (i, 10 * i) for i in range(1, 7)
    }


def _cosine(spark, tmp_path, name, n=6):
    c = VersionedCollection(spark, str(tmp_path), name)
    c.create(
        _mk(spark, [(i, 10 * i) for i in range(n)]),
        dim=3,
        metric="cosine",
        normalize=True,
        cluster_files=2,
    )
    return c


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_vector_update_renormalizes_on_cosine_table(
    spark, tmp_path, mode
):
    """A SET on the vector column of a cosine/normalized table stores
    a UNIT vector (same invariant as create/merge ingest) — search's
    dot-product == cosine contract survives updates."""
    c = _cosine(spark, tmp_path, f"u19{mode}")
    c.update_where(
        "id = 2",
        {"vector": F.array(F.lit(3.0), F.lit(4.0), F.lit(0.0))},
        mode=mode,
    )
    row = c.read().filter(F.col("id") == 2).head()
    assert [round(x, 6) for x in row.vector] == [0.6, 0.8, 0.0]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_update_set_uncastable_raises(spark, tmp_path, mode):
    """Default-mode Spark casts 'abc' -> bigint to NULL silently; the
    guarded SET cast raises instead (Delta UPDATE parity)."""
    c = _clustered(spark, tmp_path, f"u20{mode}")
    with pytest.raises(Exception, match="does not cast"):
        c.update_where("id = 0", {"label": F.lit("abc")}, mode=mode)
    # nothing committed, value intact
    assert _state(c) == {(i, 10 * i) for i in range(8)}


def test_update_set_explicit_null_is_legal(spark, tmp_path):
    """NULL in, NULL out: the cast guard only fires when a NON-null
    value nulls out under the cast."""
    c = _clustered(spark, tmp_path, "u21")
    c.update_where("id = 0", {"label": F.lit(None)})
    row = c.read().filter(F.col("id") == 0).head()
    assert row.label is None

"""Generalized stats pruning (round-15 verdict item 4):
``delete_where`` / ``update_where`` discovery and the rebase conflict
check consume predicate bounds on ANY stats-covered column — the id
column via the primary manifest ``stats`` map, Z-order columns via
``col_stats`` — not just the id conjuncts."""

from __future__ import annotations

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.sources.versioned import (
    VersionedCollection,
    _bounds_disjoint,
    _predicate_col_bounds,
    _stats_candidates_multi,
)


def _vec(i: int) -> list[float]:
    return [float(i), 1.0]


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, _vec(i), lbl) for i, lbl in rows],
        "id long, vector array<double>, label long",
    )


def _zordered(spark, tmp_path, name, n=64, files=8):
    """label = 1000 - id: anti-correlated with id, so id-clustered
    files have tight-but-DIFFERENT label ranges — a label predicate
    can only prune through per-column col_stats, never through the
    id stats map."""
    c = VersionedCollection(spark, str(tmp_path), name)
    c.create(
        _mk(spark, [(i, 1000 - i) for i in range(n)]),
        dim=2,
        metric="dot",
        normalize=False,
        cluster_files=files,
    )
    c.recluster(target_files=files, zorder_by=["id", "label"])
    return c


# ------------------------------------------------ bounds-map extraction


def test_col_bounds_multi_column_conjunction():
    b = _predicate_col_bounds("id >= 3 AND id < 9 AND label = 5")
    assert b["id"] == (3, 9)
    assert b["label"] == (5, 5)


def test_col_bounds_literals_and_or_give_up():
    assert _predicate_col_bounds("label = 5 OR id = 1") == {}
    b = _predicate_col_bounds("note = 'label in (2,4)' AND label >= 7")
    # the literal's text must never leak structure into label/id, but
    # the note = '<literal>' conjunct itself is a legitimate string
    # bound on note
    assert b["label"] == (7, None)
    assert b["note"] == ("label in (2,4)", "label in (2,4)")
    assert set(b) == {"label", "note"}


def test_col_bounds_non_string_predicate(spark):
    assert _predicate_col_bounds(F.col("id") > 3) == {}


def test_col_bounds_function_call_is_conservative():
    # parens beyond IN(...) give up for every column
    assert _predicate_col_bounds("abs(label) < 5") == {}


def test_stats_candidates_multi_prunes_on_any_column():
    files = ["a", "b", "c"]
    stats = {"a": (0, 9), "b": (10, 19), "c": (20, 29)}  # id
    col_stats = {
        "a": {"label": (100, 109)},
        "b": {"label": (50, 59)},
        # c: no label stats -> never pruned by label
    }
    # label bound alone prunes a (disjoint) but keeps b and c
    cands, pruned = _stats_candidates_multi(
        files, stats, col_stats, {"label": (50, 60)}, "id"
    )
    assert cands == ["b", "c"] and pruned == 1
    # id + label: id kills c, label kills a
    cands, pruned = _stats_candidates_multi(
        files, stats, col_stats, {"id": (0, 15), "label": (50, 60)}, "id"
    )
    assert cands == ["b"] and pruned == 2


def test_bounds_disjoint_half_open():
    assert _bounds_disjoint((0, 4), 5, None)
    assert _bounds_disjoint((6, 9), None, 5)
    assert not _bounds_disjoint((0, 9), 5, None)
    assert not _bounds_disjoint(("a", "c"), 5, None)  # non-comparable


# ------------------------------------------------ label-predicate DML


def test_label_delete_scans_only_intersecting_files(spark, tmp_path):
    c = _zordered(spark, tmp_path, "lblprune")
    # label in [940, 960) -> ids (40, 60] — a bounded rectangle of the
    # z-ordered layout; most files' label ranges provably miss it
    c.delete_where("label >= 940 AND label < 960")
    st = c.last_delete_stats
    assert st["files_pruned_by_stats"] > 0, st
    assert st["files_scanned"] < st["files_total"], st
    assert st["files_scanned"] == st["files_total"] - st[
        "files_pruned_by_stats"
    ]
    survivors = {
        r.id for r in c.read().select("id").collect()
    }
    assert survivors == {
        i for i in range(64) if not (940 <= 1000 - i < 960)
    }


def test_label_delete_mor_prunes_and_matches(spark, tmp_path):
    c = _zordered(spark, tmp_path, "lblprunemor")
    c.delete_where("label >= 990", mode="mor")
    st = c.last_delete_stats
    assert st["files_pruned_by_stats"] > 0, st
    assert {r.id for r in c.read().select("id").collect()} == set(
        range(11, 64)
    )


def test_label_update_prunes_and_matches(spark, tmp_path):
    c = _zordered(spark, tmp_path, "lblupd")
    c.update_where(
        "label >= 980 AND label <= 1000", {"label": F.lit(-1)}
    )
    st = c.last_update_stats
    assert st["files_pruned_by_stats"] > 0, st
    got = {
        (r.id, r.label)
        for r in c.read().select("id", "label").collect()
    }
    assert got == {
        (i, -1 if 980 <= 1000 - i <= 1000 else 1000 - i)
        for i in range(64)
    }


def test_unprunable_predicate_scans_everything(spark, tmp_path):
    c = _zordered(spark, tmp_path, "lblnoprune", n=32, files=4)
    c.delete_where("label % 2 = 1")  # no provable bound on any column
    st = c.last_delete_stats
    assert st["files_pruned_by_stats"] == 0
    assert st["files_scanned"] == st["files_total"]
    assert {r.id for r in c.read().select("id").collect()} == {
        i for i in range(32) if (1000 - i) % 2 == 0
    }


# ------------------------------------------------ conflict soundness


def test_window_append_disjoint_on_label_clears_rebase(spark, tmp_path):
    """A window commit whose appended file is disjoint from the
    delete's LABEL bounds (but overlapping in id, which is unbounded
    here) must be rebase-eligible — the generalized check clears it
    through col_stats where the id-only check had to conflict."""
    c = _zordered(spark, tmp_path, "lblclear", n=32, files=4)
    schema0 = c.manifest(c.latest_version())["schema"]
    v0 = c.latest_version()
    # window commit: merge rows with label 5000..5004 (z-ordered
    # tables recompute col_stats on merge via the stat_cols property)
    c.merge(_mk(spark, [(100 + i, 5000 + i) for i in range(5)]))
    m = c.manifest(c.latest_version())
    added = [f for f in m["files"] if f not in c.manifest(v0)["files"]]
    # DML on a z-ordered table keeps recording per-column stats
    # (_manifest_stat_cols), so the window commit carries the label
    # evidence the clearing needs
    assert all(
        "label" in (m.get("col_stats", {}).get(f) or {}) for f in added
    ), m.get("col_stats")
    bmap = _predicate_col_bounds("label >= 900 AND label <= 1000")
    got = c._conflict_free_base(v0, set(), bmap, schema0)
    assert got == c.latest_version(), (
        "label-disjoint window append must clear"
    )


def test_window_append_overlapping_label_conflicts(spark, tmp_path):
    c = _zordered(spark, tmp_path, "lbloverlap", n=32, files=4)
    schema0 = c.manifest(c.latest_version())["schema"]
    v0 = c.latest_version()
    c.merge(_mk(spark, [(100, 950)]))  # label INSIDE the bounds
    bmap = _predicate_col_bounds("label >= 900 AND label <= 1000")
    assert c._conflict_free_base(v0, set(), bmap, schema0) is None


def test_id_tuple_bounds_still_work_via_normalization(spark, tmp_path):
    """Legacy merge callers still pass a bare (lo, hi) tuple — the
    normalized path must behave exactly as before."""
    c = _zordered(spark, tmp_path, "lbllegacy", n=32, files=4)
    schema0 = c.manifest(c.latest_version())["schema"]
    v0 = c.latest_version()
    c.merge(_mk(spark, [(500, 1)]))  # appended id range [500, 500]
    assert (
        c._conflict_free_base(v0, set(), (0, 100), schema0)
        == c.latest_version()
    )
    assert c._conflict_free_base(v0, set(), (400, 600), schema0) is None
    assert c._conflict_free_base(v0, set(), None, schema0) is None


def test_dml_rewrite_keeps_col_stats(spark, tmp_path):
    """DML on a z-ordered table records per-column stats for the files
    it WRITES (_manifest_stat_cols): after a label-predicate delete,
    every file of the new snapshot still carries label col_stats, so
    the NEXT label predicate prunes just as well."""
    c = _zordered(spark, tmp_path, "lblkeep", n=64, files=8)
    c.delete_where("label >= 940 AND label < 960")
    m = c.manifest(c.latest_version())
    missing = [
        f
        for f in m["files"]
        if "label" not in (m.get("col_stats", {}).get(f) or {})
    ]
    assert not missing, f"files lost label col_stats: {missing}"
    # and the follow-up label delete still prunes
    c.delete_where("label >= 990")
    assert c.last_delete_stats["files_pruned_by_stats"] > 0

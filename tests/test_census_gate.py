"""Census freshness gate (round-15 verdict item 2): red on a synthetic
post-census edit, green after regen.  Exercised on a synthetic tree so
the check itself never depends on this repo's current mtime state."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import census_gate  # noqa: E402


def _mk(tmp_path, rel, mtime):
    p = tmp_path / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text("x = 1\n")
    os.utime(p, (mtime, mtime))
    return p


def test_red_on_post_census_edit_green_after_regen(tmp_path):
    t0 = 1_000_000.0
    census = _mk(tmp_path, census_gate.CENSUS, t0)
    _mk(tmp_path, "legalchatbot_vectordb_exp_spark/queries.py", t0 - 60)
    _mk(tmp_path, "__spark_entry__.py", t0 - 60)
    assert census_gate.stale_files(str(tmp_path)) == []

    # synthetic post-census edit -> RED, names the file
    edited = _mk(
        tmp_path,
        "legalchatbot_vectordb_exp_spark/sources/versioned.py",
        t0 + 600,
    )
    assert census_gate.stale_files(str(tmp_path)) == [
        os.path.relpath(edited, tmp_path)
    ]

    # regen (census mtime moves past the edit) -> GREEN
    os.utime(census, (t0 + 700, t0 + 700))
    assert census_gate.stale_files(str(tmp_path)) == []


def test_sub_second_skew_is_tolerated(tmp_path):
    t0 = 1_000_000.0
    _mk(tmp_path, census_gate.CENSUS, t0)
    _mk(tmp_path, "__spark_entry__.py", t0 + 0.5)
    assert census_gate.stale_files(str(tmp_path)) == []


def test_missing_census_is_stale(tmp_path):
    _mk(tmp_path, "__spark_entry__.py", 1_000_000.0)
    assert census_gate.stale_files(str(tmp_path)) == ["<census missing>"]


def test_non_python_files_ignored(tmp_path):
    t0 = 1_000_000.0
    _mk(tmp_path, census_gate.CENSUS, t0)
    _mk(tmp_path, "__spark_entry__.py", t0 - 1)
    pyc = _mk(
        tmp_path,
        "legalchatbot_vectordb_exp_spark/__pycache__/queries.pyc",
        t0 + 999,
    )
    assert pyc.exists()
    _mk(tmp_path, "legalchatbot_vectordb_exp_spark/notes.md", t0 + 999)
    assert census_gate.stale_files(str(tmp_path)) == []

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


def test_digest_gate_is_checkout_order_proof(tmp_path):
    """Round-16 review: git does not preserve mtimes, so a fresh
    clone's write order must not decide freshness.  With a recorded
    _source_digest the verdict is content-based: identical content is
    fresh even when sources are NEWER than the artifact, and changed
    content is stale even when the artifact is newer."""
    import json

    t0 = 1_000_000.0
    src = _mk(tmp_path, "legalchatbot_vectordb_exp_spark/queries.py", t0)
    _mk(tmp_path, "__spark_entry__.py", t0)
    digest = census_gate.source_digest_map(str(tmp_path))
    census = tmp_path / census_gate.CENSUS
    census.write_text(json.dumps({"_source_digest": digest}))
    # sources mtime far NEWER than the artifact: still fresh (content
    # unchanged) — the mtime gate would have flagged this
    os.utime(src, (t0 + 9999, t0 + 9999))
    os.utime(census, (t0, t0))
    assert census_gate.stale_files(str(tmp_path)) == []
    # content change -> stale even though the artifact mtime is newer
    src.write_text("x = 2\n")
    os.utime(src, (t0 - 50, t0 - 50))
    os.utime(census, (t0 + 9999, t0 + 9999))
    assert census_gate.stale_files(str(tmp_path)) == [
        "legalchatbot_vectordb_exp_spark/queries.py"
    ]
    # a watched file DELETED since the census is stale too
    src.unlink()
    stale = census_gate.stale_files(str(tmp_path))
    assert "legalchatbot_vectordb_exp_spark/queries.py" in stale


def test_artifact_without_digest_falls_back_to_mtime(tmp_path):
    import json

    t0 = 1_000_000.0
    _mk(tmp_path, "__spark_entry__.py", t0 - 60)
    census = tmp_path / census_gate.CENSUS
    census.write_text(json.dumps({"some_query": {"hash_match": True}}))
    os.utime(census, (t0, t0))
    assert census_gate.stale_files(str(tmp_path)) == []
    _mk(tmp_path, "__spark_entry__.py", t0 + 600)
    assert census_gate.stale_files(str(tmp_path)) == [
        "__spark_entry__.py"
    ]

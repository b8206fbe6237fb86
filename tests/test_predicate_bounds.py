"""Regression suite for ``_predicate_id_bounds`` literal masking.

The round-14 verdict reproduced a silent-no-op DELETE: id-comparison
text INSIDE a quoted string literal (``note = 'keep id in (2,4)
rows' AND id >= 100``) was parsed as real predicate structure,
producing the impossible bounds ``(100, 4)`` — every file was
stats-pruned, ``delete_where``/``update_where`` matched nothing, and
the same false bounds could wrongly approve a concurrent-merge
rebase.  The fix masks ``'...'`` literals with opaque placeholders
before any structural regex and rejects contradictory bounds
(``lo > hi`` → unbounded ``None``), so consumers stay conservative.

The reference has no predicate machinery at all — its only mutation
is the whole-collection recreate (``Qdrant/VectorDB/Database.py``);
this guards the Delta-parity layer built on top.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.sources.versioned import (
    VersionedCollection,
    _predicate_id_bounds,
)

TRICKY = "note = 'keep id in (2,4) rows' AND id >= 6"


def _vec(i: int) -> list[float]:
    return [float(i), 1.0, 0.0]


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, _vec(i), lbl, "keep id in (2,4) rows") for i, lbl in rows],
        "id long, vector array<double>, label long, note string",
    )


def _noted(spark, tmp_path, name, n=8, files=4):
    c = VersionedCollection(spark, str(tmp_path), name)
    c.create(
        _mk(spark, [(i, 10 * i) for i in range(n)]),
        dim=3,
        metric="dot",
        normalize=False,
        cluster_files=files,
    )
    return c


# -------------------------------------------------------- unit: parsing


def test_literal_text_is_not_predicate_structure():
    # the verdict's exact reproducer: used to return (100, 4)
    assert _predicate_id_bounds(
        "note = 'keep id in (2,4) rows' AND id >= 100", "id"
    ) == (100, None)


def test_or_and_not_inside_literals_do_not_give_up():
    assert _predicate_id_bounds(
        "note = 'a OR b' AND id = 3", "id"
    ) == (3, 3)
    assert _predicate_id_bounds(
        "note = 'do not delete' AND id < 10", "id"
    ) == (None, 10)


def test_parens_and_between_inside_literals_are_masked():
    assert _predicate_id_bounds(
        "note = '(x) id between 1 and 999' AND id BETWEEN 2 AND 5",
        "id",
    ) == (2, 5)


def test_unbalanced_quote_is_unbounded():
    assert (
        _predicate_id_bounds("note = 'unbalanced AND id = 3", "id")
        is None
    )


def test_contradictory_bounds_are_unbounded_not_impossible():
    # a genuinely empty range must NOT prune every file (the caller
    # treats None as "scan everything", which stays correct)
    assert _predicate_id_bounds("id >= 100 AND id <= 4", "id") is None


def test_string_id_bounds_still_work():
    assert _predicate_id_bounds("id = 'abc'", "id") == ("abc", "abc")
    assert _predicate_id_bounds(
        "id BETWEEN 'a' AND 'c'", "id"
    ) == ("a", "c")


def test_doubled_quote_escape_is_one_literal():
    assert _predicate_id_bounds(
        "note = 'it''s id in (9)' AND id <= 5", "id"
    ) == (None, 5)


# ------------------------------------------------- end-to-end: deletes


def test_delete_where_with_literal_id_text_actually_deletes(
    spark, tmp_path
):
    """End-to-end reproducer: before the fix this DELETE silently
    removed nothing (all files pruned by the impossible bounds) while
    ``last_delete_stats`` reported success."""
    c = _noted(spark, tmp_path, "litdel")
    c.delete_where(TRICKY)
    ids = {r.id for r in c.read().select("id").collect()}
    assert ids == {0, 1, 2, 3, 4, 5}
    st = c.last_delete_stats
    assert st["files_rewritten"] >= 1
    # pruning may still drop the provably-disjoint low files, but the
    # high file MUST have been scanned
    assert st["files_scanned"] >= 1


def test_delete_where_mor_with_literal_id_text(spark, tmp_path):
    c = _noted(spark, tmp_path, "litdelmor")
    c.delete_where(TRICKY, mode="mor")
    ids = {r.id for r in c.read().select("id").collect()}
    assert ids == {0, 1, 2, 3, 4, 5}


def test_update_where_with_literal_id_text(spark, tmp_path):
    c = _noted(spark, tmp_path, "litupd")
    c.update_where(TRICKY, {"label": F.col("label") + 1})
    got = {
        (r.id, r.label)
        for r in c.read().select("id", "label").collect()
    }
    assert got == {(i, 10 * i) for i in range(6)} | {(6, 61), (7, 71)}


# -------------------------------------- conflict check: no false rebase


def test_literal_bounds_do_not_falsely_approve_rebase(spark, tmp_path):
    """The same false bounds fed ``_conflict_free_base``: a predicate
    whose LITERAL mentions far-away ids ('only id in (100, 200)')
    used to bound the in-flight write to [100, 200], so a window
    commit that actually touched ids 0..3 looked disjoint and the
    rebase was approved — a lost update.  With masking the bounds are
    (0, None); the overlapping window commit must veto."""
    c = _noted(spark, tmp_path, "litrebase")
    schema0 = c.manifest(0)["schema"]
    pred = "note = 'only id in (100, 200) please' AND id >= 0"
    bounds = _predicate_id_bounds(pred, "id")
    assert bounds == (0, None)  # buggy parser said (100, 200)
    # window commit: a merge that rewrites ids 0..3
    c.merge(
        spark.createDataFrame(
            [(1, _vec(1), 999, "x")],
            "id long, vector array<double>, label long, note string",
        )
    )
    assert c._conflict_free_base(0, set(), bounds, schema0) is None


def test_double_quoted_spans_are_structure_opaque():
    # Spark default mode: "..." is a string literal — its text must
    # not be parsed as structure
    assert _predicate_id_bounds(
        'note = "keep id in (2,4) rows" AND id >= 100', "id"
    ) == (100, None)
    # ANSI double-quoted-identifier mode: "id2" could be a COLUMN —
    # never a comparison value, so no bound is derived from it
    assert _predicate_id_bounds('id = "id2"', "id") is None
    assert _predicate_id_bounds(
        'id = "id2" AND id < 9', "id"
    ) == (None, 9)
    assert (
        _predicate_id_bounds('note = "unbalanced AND id = 3', "id")
        is None
    )


# ------------------------------------------------- property: soundness


def test_bounds_are_always_a_superset_of_the_true_interval():
    """Soundness property, hypothesis-driven: build random
    conjunctions of id comparisons (whose exact implied interval we
    know by construction) mixed with adversarial string-literal
    conjuncts (quoting id text, parens, AND/OR/NOT, commas), and
    require that whenever ``_predicate_id_bounds`` returns bounds,
    they CONTAIN the true interval — bounds may be looser (consumers
    just prune less) but never tighter (silent data loss)."""
    from hypothesis import given, settings, strategies as st

    noise_texts = st.sampled_from(
        [
            "keep id in (2,4) rows",
            "id between 1 and 999",
            "do not delete",
            "a OR b, c AND d",
            "id >= 12345",
            "it''s fine",
            "(id = 7)",
        ]
    )
    comparisons = st.tuples(
        st.sampled_from([">=", ">", "<=", "<", "="]),
        st.integers(min_value=-50, max_value=50),
    )

    @settings(max_examples=300, deadline=None)
    @given(
        comps=st.lists(comparisons, min_size=1, max_size=4),
        noises=st.lists(noise_texts, max_size=3),
        flip=st.booleans(),
    )
    def prop(comps, noises, flip):
        true_lo, true_hi = None, None
        conjs = []
        for op, v in comps:
            conjs.append(f"{v} {_FLIP[op]} id" if flip else f"id {op} {v}")
            if op in (">=", "="):
                true_lo = v if true_lo is None else max(true_lo, v)
            if op == ">":
                true_lo = v + 1 if true_lo is None else max(true_lo, v + 1)
            if op in ("<=", "="):
                true_hi = v if true_hi is None else min(true_hi, v)
            if op == "<":
                true_hi = v - 1 if true_hi is None else min(true_hi, v - 1)
        for i, t in enumerate(noises):
            conjs.append(f"note{i} = '{t}'")
        got = _predicate_id_bounds(" AND ".join(conjs), "id")
        if got is None:
            return  # unbounded is always sound
        lo, hi = got
        # every id in the TRUE interval must satisfy the returned
        # bounds: returned lo <= true interval, returned hi >= it.
        # (">" is parsed as a >= bound on the same value — looser by
        # one, which is the sound direction.)
        if true_lo is not None and lo is not None:
            assert lo <= true_lo
        if true_hi is not None and hi is not None:
            assert hi >= true_hi
        if true_lo is None:
            assert lo is None
        if true_hi is None:
            assert hi is None

    prop()


_FLIP = {">=": "<=", ">": "<", "<=": ">=", "<": ">", "=": "="}

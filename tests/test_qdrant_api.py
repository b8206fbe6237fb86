"""Qdrant read-API family on VectorCollection — search_groups,
scroll (keyset pagination), recommend (best_score strategy).  The
registered queries pin exact semantics against DuckDB; these tests pin
the collection-level API: shapes, cursor protocol, exclusions, and
agreement with the equivalent direct plans."""

from __future__ import annotations

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.io_tables import load_table
from legalchatbot_vectordb_exp_spark.sources.collection import VectorCollection


def _coll(spark, sf_smoke, tmp_path):
    emb = load_table(spark, sf_smoke, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vector"),
        "label",
    )
    c = VectorCollection(spark, str(tmp_path), "api_demo")
    c.create(emb, dim=64, metric="dot", normalize=False)
    return c, emb


def test_search_groups_shape_and_diversity(spark, sf_smoke, tmp_path):
    c, emb = _coll(spark, sf_smoke, tmp_path)
    qvec = [float(x) for x in emb.filter("id = 1").head()["vector"]]
    got = c.search_groups(qvec, "label", groups=3, per_group=2).collect()
    # exactly 3 groups, ≤2 hits each, group_rank/hit_rank contiguous
    by_group = {}
    for r in got:
        by_group.setdefault(r["label"], []).append(r)
    assert len(by_group) == 3
    assert all(1 <= len(v) <= 2 for v in by_group.values())
    assert sorted({r["group_rank"] for r in got}) == [1, 2, 3]
    # groups ordered by their best hit's score
    best = {
        g: max(r["score"] for r in rows) for g, rows in by_group.items()
    }
    ranks = {rows[0]["group_rank"]: g for g, rows in by_group.items()}
    assert best[ranks[1]] >= best[ranks[2]] >= best[ranks[3]]
    # within a group, hits are descending
    for rows in by_group.values():
        scores = [r["score"] for r in sorted(rows, key=lambda r: r["hit_rank"])]
        assert scores == sorted(scores, reverse=True)


def test_scroll_pages_are_disjoint_exhaustive_and_ordered(
    spark, sf_smoke, tmp_path
):
    c, emb = _coll(spark, sf_smoke, tmp_path)
    want = [
        r["id"]
        for r in emb.filter("label = 1")
        .orderBy("id")
        .select("id")
        .collect()
    ]
    got, cursor, pages = [], None, 0
    while True:
        rows, cursor = c.scroll(page_size=10, where="label = 1", cursor=cursor)
        got.extend(r["id"] for r in rows)
        pages += 1
        assert all(r["label"] == 1 for r in rows)
        if cursor is None:
            break
        assert len(rows) == 10  # only the tail page may be short
    assert got == want  # disjoint, ordered, nothing skipped or repeated
    assert pages == (len(want) + 9) // 10 + (1 if len(want) % 10 == 0 else 0)


def test_scroll_empty_filter_terminates_immediately(
    spark, sf_smoke, tmp_path
):
    c, _ = _coll(spark, sf_smoke, tmp_path)
    rows, cursor = c.scroll(page_size=10, where="label = -1")
    assert rows == [] and cursor is None


def test_recommend_excludes_examples_and_steers(spark, sf_smoke, tmp_path):
    c, emb = _coll(spark, sf_smoke, tmp_path)
    got = c.recommend(positive=[1, 9], negative=[4], k=5).collect()
    assert len(got) == 5
    ids = [r["id"] for r in got]
    assert not ({1, 9, 4} & set(ids))  # examples never returned
    # best_score semantics (Qdrant's exact formula): max_pos when
    # max_pos > max_neg else -(max_neg^2), recomputed row-by-row
    import math

    vecs = {
        r["id"]: [float(x) for x in r["vector"]]
        for r in emb.filter(F.col("id").isin(ids + [1, 9, 4])).collect()
    }

    def dotp(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    for r in got:
        v = vecs[r["id"]]
        max_pos = max(dotp(v, vecs[1]), dotp(v, vecs[9]))
        max_neg = dotp(v, vecs[4])
        want = max_pos if max_pos > max_neg else -(max_neg * max_neg)
        assert math.isclose(r["score"], want, rel_tol=1e-9)


def test_recommend_missing_example_raises(spark, sf_smoke, tmp_path):
    c, _ = _coll(spark, sf_smoke, tmp_path)
    try:
        c.recommend(positive=[10**9], k=3)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "not found" in str(e)


def test_recommend_positive_only_is_zero_shuffle(spark, sf_smoke, tmp_path):
    c, _ = _coll(spark, sf_smoke, tmp_path)
    df = c.recommend(positive=[1], k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


# ---------------------------------- point API: retrieve/count/delete/update


def test_retrieve_count_delete_set_payload_roundtrip(
    spark, sf_smoke, tmp_path
):
    c, emb = _coll(spark, sf_smoke, tmp_path)
    n0 = c.count()
    assert n0 == emb.count()
    # count with filter == exact relational count
    want = emb.filter("label = 1").count()
    assert c.count(where="label = 1") == want
    # retrieve: ascending id order, exactly the asked points
    got = c.retrieve([7, 3, 11])
    assert [r["id"] for r in got] == [3, 7, 11]
    assert all(len(r["vector"]) == 64 for r in got)
    # set_payload: only matching rows change, vectors untouched
    before = {r["id"]: r["label"] for r in c.read().collect()}
    c.set_payload({"label": "label + 100"}, where="id < 5")
    after = {r["id"]: r["label"] for r in c.read().collect()}
    assert all(
        after[i] == before[i] + (100 if i < 5 else 0) for i in before
    )
    assert c.count() == n0
    # delete_where: matching rows gone, the rest intact
    c.delete_where("label >= 100")
    assert c.count() == n0 - 5
    assert c.retrieve([0, 1, 2, 3, 4]) == []


def test_set_payload_protects_vector_and_id(spark, sf_smoke, tmp_path):
    c, _ = _coll(spark, sf_smoke, tmp_path)
    try:
        c.set_payload({"vector": "vector"}, where="id = 1")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "vector" in str(e)


def test_delete_where_null_predicate_rows_are_kept(
    spark, sf_smoke, tmp_path
):
    """SQL DELETE semantics: predicate NULL -> row kept (classic
    three-valued-logic bug when expressed as filter(~pred))."""
    import pyspark.sql.functions as F
    from legalchatbot_vectordb_exp_spark.io_tables import load_table
    from legalchatbot_vectordb_exp_spark.sources.collection import (
        VectorCollection,
    )

    emb = load_table(spark, sf_smoke, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vector"),
        F.when(F.col("vec_id") % 3 == 0, F.col("label")).alias("label"),
    )
    c = VectorCollection(spark, str(tmp_path), "nulldel")
    c.create(emb, dim=64, metric="dot", normalize=False)
    n0, nulls = c.count(), c.count(where="label IS NULL")
    assert nulls > 0
    matched = c.count(where="label >= 0")
    c.delete_where("label >= 0")  # NULL-label rows must survive
    assert c.count() == n0 - matched
    assert c.count(where="label IS NULL") == nulls


def test_set_payload_multi_column_sees_original_row(
    spark, sf_smoke, tmp_path
):
    """UPDATE semantics: the predicate and every assignment expression
    evaluate against the ORIGINAL row — a chained-withColumn
    implementation would re-evaluate `label < 5` against the already-
    updated label and never set the second column."""
    emb = load_table(spark, sf_smoke, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vector"),
        "label",
        F.lit(0).alias("flag"),
    )
    c = VectorCollection(spark, str(tmp_path), "multi_upd")
    c.create(emb, dim=64, metric="dot", normalize=False)
    n_lt5 = c.count(where="label < 5")
    assert n_lt5 > 0
    c.set_payload(
        {"label": "label + 100", "flag": "1"}, where="label < 5"
    )
    # flag must be set on EXACTLY the rows that originally matched,
    # and their label must show the update too
    assert c.count(where="flag = 1") == n_lt5
    assert c.count(where="flag = 1 AND label >= 100") == n_lt5
    assert c.count(where="flag = 0 AND label >= 100") == 0


def test_scroll_order_by_composite_cursor_pages_through_ties(
    spark, sf_smoke, tmp_path
):
    """Ordered scroll (Qdrant order_by): pagination by (value, id)
    lexicographic keyset — with ~50 rows per label and page_size 10,
    every tie group spans multiple pages, the exact case a naive
    value-only cursor drops or repeats rows on."""
    c, emb = _coll(spark, sf_smoke, tmp_path)
    want = [
        (r["label"], r["id"])
        for r in emb.orderBy("label", "id").collect()
    ]
    got, cursor = [], None
    while True:
        rows, cursor = c.scroll(
            page_size=10, order_by="label", cursor=cursor
        )
        got.extend((r["label"], r["id"]) for r in rows)
        if cursor is None:
            break
    assert got == want  # disjoint, exhaustive, (label, id)-ordered


def test_scroll_order_by_excludes_null_order_values(
    spark, sf_smoke, tmp_path
):
    emb = load_table(spark, sf_smoke, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vector"),
        F.when(F.col("vec_id") % 5 != 0, F.col("label")).alias("label"),
    )
    c = VectorCollection(spark, str(tmp_path), "nullscroll")
    c.create(emb, dim=64, metric="dot", normalize=False)
    n_nonnull = c.count(where="label IS NOT NULL")
    got, cursor = 0, None
    while True:
        rows, cursor = c.scroll(
            page_size=25, order_by="label", cursor=cursor
        )
        assert all(r["label"] is not None for r in rows)
        got += len(rows)
        if cursor is None:
            break
    assert got == n_nonnull


# ------------------------------------ facet + discovery-style search


def test_facet_counts_and_filter(spark, sf_smoke, tmp_path):
    c, emb = _coll(spark, sf_smoke, tmp_path)
    got = c.facet("label", limit=3).collect()
    assert 1 <= len(got) <= 3
    # exact counts, count-desc then value-asc
    want = {
        r["label"]: r["n"]
        for r in emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    counts = [r["count"] for r in got]
    assert counts == sorted(counts, reverse=True)
    for r in got:
        assert want[r["value"]] == r["count"]
    # filtered facet = facet of the filtered relation
    flt = c.facet("label", limit=10, where="id < 100").collect()
    want_f = {
        r["label"]: r["n"]
        for r in emb.filter("id < 100")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r["value"]: r["count"] for r in flt} == want_f


def test_discover_ranks_by_pairs_then_target(spark, sf_smoke, tmp_path):
    c, emb = _coll(spark, sf_smoke, tmp_path)
    got = c.discover(2, [(1, 4), (9, 6)], k=5).collect()
    assert len(got) == 5
    ids = [r["id"] for r in got]
    assert not ({2, 1, 4, 9, 6} & set(ids))  # examples excluded
    # lexicographic: pairs_ok non-increasing; within a tier,
    # target_sim non-increasing
    keys = [(r["pairs_ok"], r["target_sim"]) for r in got]
    assert keys == sorted(keys, reverse=True)
    # recompute one row by hand
    vecs = {
        r["id"]: [float(x) for x in r["vector"]]
        for r in emb.filter(
            F.col("id").isin(ids[:1] + [2, 1, 4, 9, 6])
        ).collect()
    }

    def dotp(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    v = vecs[ids[0]]
    want_ok = int(dotp(v, vecs[1]) > dotp(v, vecs[4])) + int(
        dotp(v, vecs[9]) > dotp(v, vecs[6])
    )
    assert got[0]["pairs_ok"] == want_ok
    import math

    assert math.isclose(
        got[0]["target_sim"], dotp(v, vecs[2]), rel_tol=1e-9
    )


def test_discover_missing_example_raises(spark, sf_smoke, tmp_path):
    c, _ = _coll(spark, sf_smoke, tmp_path)
    try:
        c.discover(10**9, [(1, 4)], k=3)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "not found" in str(e)


def test_discover_is_zero_shuffle(spark, sf_smoke, tmp_path):
    c, _ = _coll(spark, sf_smoke, tmp_path)
    df = c.discover(2, [(1, 4)], k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_search_matrix_shape_cap_and_symmetry(spark, sf_smoke, tmp_path):
    c, emb = _coll(spark, sf_smoke, tmp_path)
    got = c.search_matrix("label = 1", sample_limit=8, top=2).collect()
    ids = {r["id_a"] for r in got}
    assert 0 < len(ids) <= 8
    per_row = {}
    for r in got:
        assert r["id_a"] != r["id_b"]
        per_row[r["id_a"]] = per_row.get(r["id_a"], 0) + 1
    assert max(per_row.values()) <= 2
    # dot is symmetric: if (a,b) and (b,a) both survive their rows'
    # top-2, the scores agree exactly
    scores = {(r["id_a"], r["id_b"]): r["score"] for r in got}
    for (x, y), s in scores.items():
        if (y, x) in scores:
            assert scores[(y, x)] == s
    # the cap binds: a broad filter still yields <= sample_limit rows
    wide = c.search_matrix("label >= 0", sample_limit=5, top=2).collect()
    assert len({r["id_a"] for r in wide}) <= 5

"""Sparse-vector family: posting-list layout, bucket pruning,
search_sparse API semantics, and the fusion operators.  The registered
queries (``ann_sparse_topk``, ``ann_sparse_persisted``,
``hybrid_fusion_search``, ``hybrid_fusion_dbsf``) pin exact semantics
against DuckDB; these tests pin the collection-level API and the plan
shapes the 100 TB story depends on."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from legalchatbot_vectordb_exp_spark.io_tables import load_table
from legalchatbot_vectordb_exp_spark.operators.fusion import (
    dbsf_constants,
    rrf_fuse,
)
from legalchatbot_vectordb_exp_spark.queries_sparse import (
    SPARSE_QUERY,
    _postings,
    term_id_of,
)
from legalchatbot_vectordb_exp_spark.sources.collection import VectorCollection


def _parquet_mtimes(path):
    """path -> st_mtime_ns for every parquet file under a layout —
    the file-level pin both merge tests (and the stress probe's twin
    loops) rely on to prove untouched partitions were never rewritten."""
    import os

    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                fp = os.path.join(root, f)
                out[fp] = os.stat(fp).st_mtime_ns
    return out


def _sparse_coll(spark, sf_smoke, tmp_path, n_buckets=64):
    docs = load_table(spark, sf_smoke, "documents")
    c = VectorCollection(spark, str(tmp_path), "postings")
    c.create_sparse(
        _postings(docs), id_col="doc_id", term_col="term_id",
        weight_col="w", n_buckets=n_buckets,
    )
    return c


def test_search_sparse_matches_scan_time_plan(spark, sf_smoke, tmp_path):
    """The persisted layout may never change results: search_sparse
    over the bucketed posting list == the scan-time broadcast-join
    search over the same postings."""
    from legalchatbot_vectordb_exp_spark.queries_sparse import (
        _sparse_query_df,
        _sparse_top,
    )

    c = _sparse_coll(spark, sf_smoke, tmp_path)
    got = c.search_sparse(dict(SPARSE_QUERY), k=10).collect()
    docs = load_table(spark, sf_smoke, "documents")
    want = _sparse_top(
        _postings(docs), _sparse_query_df(spark), 10
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_search_sparse_prunes_buckets(spark, sf_smoke, tmp_path):
    """The term predicate must prune partitions BEFORE IO: the scan's
    input files all live under the query terms' bucket directories —
    at 100 TB this is the difference between reading 3 posting lists
    and reading the whole inverted index."""
    n_buckets = 64
    c = _sparse_coll(spark, sf_smoke, tmp_path, n_buckets=n_buckets)
    df = c.search_sparse(dict(SPARSE_QUERY), k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the scan carries BOTH prunings: bucket partition filter (whole
    # directories skipped at planning) and the term_id PushedFilter
    # (row groups skipped inside surviving files)
    [pf_line] = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    want_buckets = sorted(
        term_id_of(t) % n_buckets for t, _ in SPARSE_QUERY
    )
    for b in want_buckets:
        assert str(b) in pf_line.split("PartitionFilters")[1], pf_line
    assert "bucket" in pf_line.split("PartitionFilters")[1]
    assert "PushedFilters: [In(term_id" in plan
    # and the pruned set is a strict subset of the layout
    import os

    all_buckets = {
        d for d in os.listdir(c.path) if d.startswith("bucket=")
    }
    assert len(set(want_buckets)) < len(all_buckets)


def test_search_sparse_string_and_int_terms_agree(
    spark, sf_smoke, tmp_path
):
    c = _sparse_coll(spark, sf_smoke, tmp_path)
    by_str = c.search_sparse({t: w for t, w in SPARSE_QUERY}, k=5).collect()
    by_id = c.search_sparse(
        {term_id_of(t): w for t, w in SPARSE_QUERY}, k=5
    ).collect()
    assert [tuple(r) for r in by_str] == [tuple(r) for r in by_id]
    # integer weights -> exact BIGINT scores
    assert by_str[0].__fields__ == ["doc_id", "score"]
    assert all(isinstance(r["score"], int) for r in by_str)


def test_search_sparse_float_weights_promote(spark, sf_smoke, tmp_path):
    c = _sparse_coll(spark, sf_smoke, tmp_path)
    got = c.search_sparse({"vector": 1.5}, k=3).collect()
    assert all(isinstance(r["score"], float) for r in got)


def test_search_sparse_rejects_empty_and_wrong_layout(
    spark, sf_smoke, tmp_path
):
    c = _sparse_coll(spark, sf_smoke, tmp_path)
    with pytest.raises(ValueError, match="non-empty"):
        c.search_sparse({}, k=3)
    emb = load_table(spark, sf_smoke, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vector"),
    )
    dense = VectorCollection(spark, str(tmp_path), "dense")
    dense.create(emb, dim=64, metric="dot", normalize=False)
    with pytest.raises(ValueError, match="not a sparse collection"):
        dense.search_sparse({"vector": 1}, k=3)


def test_create_sparse_validates(spark, sf_smoke, tmp_path):
    dup = spark.createDataFrame(
        [(1, 10, 2), (1, 10, 3)], "doc_id long, term_id long, w int"
    )
    c = VectorCollection(spark, str(tmp_path), "bad")
    with pytest.raises(ValueError, match="duplicate"):
        c.create_sparse(dup, id_col="doc_id", term_col="term_id", weight_col="w")
    nulls = spark.createDataFrame(
        [(1, None, 2)], "doc_id long, term_id long, w int"
    )
    with pytest.raises(ValueError, match="NULL"):
        c.create_sparse(
            nulls, id_col="doc_id", term_col="term_id", weight_col="w"
        )
    # empty posting list is a valid (empty) collection — NULL aggs
    # coalesce, matching create()
    empty = spark.createDataFrame(
        [], "doc_id long, term_id long, w int"
    )
    c2 = VectorCollection(spark, str(tmp_path), "empty_ok")
    c2.create_sparse(
        empty, id_col="doc_id", term_col="term_id", weight_col="w"
    )
    assert c2.exists()
    # ...and the empty collection must stay READABLE: an empty
    # partitionBy write leaves only _SUCCESS and a later search dies
    # on parquet schema inference (r17 ADVICE) — the layout writes an
    # explicit schema-bearing file instead, so search returns 0 rows.
    assert c2.search_sparse({"vector": 1}, k=3).count() == 0


def test_rrf_fuse_three_retrievers_exact(spark):
    """rrf_fuse generalizes past two retrievers and computes the exact
    rational score with ascending-id tie-break."""
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, r int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, r int")
    c = spark.createDataFrame([(3, 1), (1, 2)], "doc_id long, r int")
    got = {
        r["doc_id"]: r["rrf"]
        for r in rrf_fuse([a, b, c], k=60, topk=10).collect()
    }
    assert got[1] == pytest.approx(1 / 61 + 1 / 62)
    assert got[2] == pytest.approx(1 / 62 + 1 / 61)
    assert got[3] == pytest.approx(1 / 62 + 1 / 61)
    # ties on score broke by doc_id in the output order
    rows = rrf_fuse([a, b, c], k=60, topk=10).collect()
    assert [r["doc_id"] for r in rows] in ([1, 2, 3], [2, 3, 1])


def test_dbsf_constants_sequential_fold():
    """μ/σ are the sequential left-folds the oracle replays — exact
    values on a hand-computable list, population (not sample) σ."""
    mu, sigma = dbsf_constants([1.0, 2.0, 3.0, 4.0])
    assert mu == 2.5
    assert sigma == (5.0 / 4.0) ** 0.5


def test_dense_prefetch_is_take_ordered(spark, sf_smoke):
    """The dense prefetch of the hybrid plan must stay the
    zero-shuffle single-query shape."""
    from legalchatbot_vectordb_exp_spark.queries_sparse import (
        _dense_rank_df,
    )

    plan = (
        _dense_rank_df(spark, sf_smoke, 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_dbsf_zero_sigma_prefetch_contributes_zero():
    """Degenerate all-equal prefetch: σ = 0 must contribute 0 (no
    distributional information), never divide by zero — both engines
    carry the identical CASE branch."""
    mu, sigma = dbsf_constants([2.0, 2.0, 2.0])
    assert mu == 2.0 and sigma == 0.0


def test_empty_prefetch_lists_raise_clearly(spark, sf_smoke, tmp_path):
    """Zero retrievers is a caller error, not a reduce() TypeError:
    both fuse entry points refuse with a clear message."""
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    emb = load_table(spark, sf_smoke, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("body")
    )
    c = VectorCollection(spark, str(tmp_path), "noprefetch")
    c.create_multi(emb, vectors={"body": {"dim": 64, "metric": "dot"}})
    with pytest.raises(ValueError, match="at least one"):
        c.query_points([], fusion="rrf")


def test_dbsf_empty_prefetch_is_graceful():
    """An EMPTY prefetch (query terms matching no postings) must not
    crash the fold (r17 ADVICE: ZeroDivisionError): it degrades to
    the σ = 0 contributes-0 branch, mirroring rrf's full-outer-join
    handling of the same case."""
    assert dbsf_constants([]) == (0.0, 0.0)


def test_query_points_dbsf_prefetch_cap(spark, sf_smoke, tmp_path):
    """DBSF's driver-side fold is metadata-scale ONLY because the
    prefetch is bounded — query_points must refuse a prefetch_limit
    above the documented cap instead of silently collecting it
    (r17 VERDICT item 6)."""
    from legalchatbot_vectordb_exp_spark.sources.collection import (
        DBSF_PREFETCH_CAP,
    )

    emb = load_table(spark, sf_smoke, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("body"),
    )
    c = VectorCollection(spark, str(tmp_path), "capped")
    c.create_multi(emb, vectors={"body": {"dim": 64, "metric": "dot"}})
    qv = [1.0] + [0.0] * 63
    with pytest.raises(ValueError, match="cap"):
        c.query_points(
            [{"using": "body", "vector": qv}],
            fusion="dbsf",
            prefetch_limit=DBSF_PREFETCH_CAP + 1,
        )
    # at or below the cap the same call is fine
    assert (
        c.query_points(
            [{"using": "body", "vector": qv}], fusion="dbsf", k=3
        ).count()
        == 3
    )


# ---- incremental at-rest layout maintenance (round-18, r17 item 5) ----


def test_merge_sparse_touches_only_changed_buckets(
    spark, sf_smoke, tmp_path
):
    """The O(changes) contract, pinned at the file level: merge_sparse
    reports touched < all buckets for a small change batch, untouched
    bucket files are byte-identical afterwards (never read or
    rewritten), and the merged layout's search agrees with a scan-time
    search over the reconstructed final postings."""
    import os

    from legalchatbot_vectordb_exp_spark.queries_sparse import (
        SPARSE_INCR_BUCKETS,
        _sparse_query_df,
        _sparse_top,
    )

    v0 = (
        load_table(spark, sf_smoke, "documents")
        .filter(F.col("doc_id") % 8 == 1)
        .select("doc_id", "text")
    )
    c = VectorCollection(spark, str(tmp_path), "incr_layout")
    c.create_sparse(
        _postings(v0), id_col="doc_id", term_col="term_id",
        weight_col="w", n_buckets=SPARSE_INCR_BUCKETS,
    )

    before = _parquet_mtimes(c.path)
    # a SINGLE updated doc: its ~17 distinct terms locate a strict
    # subset of the corpus's non-empty buckets, so the file-level
    # untouched-bucket claim is observable even on the tiny smoke
    # corpus (the registered query's larger batch covers semantics)
    one = v0.orderBy("doc_id").limit(1)
    retire = _postings(one)
    add = _postings(
        one.withColumn("text", F.concat(F.col("text"), F.lit(" rev2")))
    )
    stats = c.merge_sparse(retire, add)
    assert 0 < stats["touched_buckets"] < stats["n_buckets"], stats
    after = _parquet_mtimes(c.path)
    touched_dirs = set()
    for p in set(before) - set(after):  # rewritten buckets lost files
        touched_dirs.add(os.path.dirname(p))
    # every file under an UNtouched bucket dir survives bit-for-bit
    # (same path, same mtime — the merge never opened it)
    untouched_same = [
        p for p, m in before.items()
        if os.path.dirname(p) not in touched_dirs
    ]
    assert untouched_same, "change touched every bucket — mod too big?"
    for p in untouched_same:
        assert after.get(p) == before[p], p
    # and the merged layout answers exactly like a scan-time search
    # over the reconstructed final corpus postings
    changed_id = one.collect()[0]["doc_id"]
    final_docs = v0.select(
        "doc_id",
        F.when(
            F.col("doc_id") == changed_id,
            F.concat(F.col("text"), F.lit(" rev2")),
        ).otherwise(F.col("text")).alias("text"),
    )
    want = _sparse_top(
        _postings(final_docs), _sparse_query_df(spark), 10
    ).collect()
    got = c.search_sparse(dict(SPARSE_QUERY), k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_merge_sparse_empty_change_is_noop(spark, sf_smoke, tmp_path):
    c = _sparse_coll(spark, sf_smoke, tmp_path)
    assert c.merge_sparse(None, None) == {
        "touched_buckets": 0,
        "touched_parts": 0,
        "n_buckets": 64,
    }


def test_merge_sparse_doc_sliced_rewrites_only_own_slices(
    spark, sf_smoke, tmp_path
):
    """The Zipf problem, fixed at the layout level: common-term
    buckets hold most of the index's bytes and EVERY doc touches
    them, so bucket-granular rewrite degrades toward full rewrite
    (measured 90 % of bytes behind a 2-doc change, SCALE.md §18e).
    With ``doc_slices`` the rewrite unit is the (bucket, dslice)
    pair: a one-doc change rewrites exactly one slice per touched
    bucket, and files in the OTHER slices of those same buckets
    survive bit-for-bit."""
    import os

    from legalchatbot_vectordb_exp_spark.queries_sparse import (
        _sparse_query_df,
        _sparse_top,
    )

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    )
    n_slices = 4
    c = VectorCollection(spark, str(tmp_path), "sliced")
    c.create_sparse(
        _postings(docs), id_col="doc_id", term_col="term_id",
        weight_col="w", n_buckets=16, doc_slices=n_slices,
    )

    before = _parquet_mtimes(c.path)
    one = docs.orderBy("doc_id").limit(1)
    changed_id = one.collect()[0]["doc_id"]
    own_slice = changed_id % n_slices
    retire = _postings(one)
    add = _postings(
        one.withColumn("text", F.concat(F.col("text"), F.lit(" rev2")))
    )
    stats = c.merge_sparse(retire, add)
    # one doc lives in exactly one slice -> one part per touched bucket
    assert stats["touched_parts"] == stats["touched_buckets"]
    after = _parquet_mtimes(c.path)
    rewritten_dirs = {
        os.path.dirname(p) for p in set(before) - set(after)
    }
    for d in rewritten_dirs:
        assert d.endswith(f"dslice={own_slice}"), d
    # every OTHER slice's files — including inside touched buckets —
    # survive with identical path and mtime
    for p, m in before.items():
        if not os.path.dirname(p).endswith(f"dslice={own_slice}"):
            assert after.get(p) == m, p
    # and the sliced layout still answers exactly
    final_docs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") == changed_id,
            F.concat(F.col("text"), F.lit(" rev2")),
        ).otherwise(F.col("text")).alias("text"),
    )
    want = _sparse_top(
        _postings(final_docs), _sparse_query_df(spark), 10
    ).collect()
    got = c.search_sparse(dict(SPARSE_QUERY), k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_merge_sparse_rejects_duplicate_add(spark, sf_smoke, tmp_path):
    """An add row whose (id, term) key was not retired first would
    silently corrupt scores — the merge enforces the same uniqueness
    invariant create_sparse validates, and the failed merge must not
    have destroyed the layout (validation precedes the swap)."""
    c = _sparse_coll(spark, sf_smoke, tmp_path)
    existing = c.read().limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(existing["doc_id"], existing["term_id"], 1)],
        "doc_id long, term_id long, w long",
    )
    before = c.search_sparse(dict(SPARSE_QUERY), k=5).collect()
    with pytest.raises(ValueError, match="duplicate"):
        c.merge_sparse(None, dup)
    after = c.search_sparse(dict(SPARSE_QUERY), k=5).collect()
    assert [tuple(r) for r in before] == [tuple(r) for r in after]


def test_merge_sparse_retire_all_keeps_collection_readable(
    spark, sf_smoke, tmp_path
):
    """Retiring the last remaining postings must not strand the
    collection: a partitioned append of the empty merged frame would
    leave only _SUCCESS (the create_sparse empty-layout failure mode,
    on the merge path) and even recovery merges would die reading it.
    After retire-all the search answers 0 rows and a re-add through
    the same merge path restores service."""
    df = spark.createDataFrame(
        [(1, 10, 2), (1, 11, 1), (2, 10, 3)],
        "doc_id long, term_id long, w long",
    )
    c = VectorCollection(spark, str(tmp_path), "retireall")
    c.create_sparse(
        df, id_col="doc_id", term_col="term_id", weight_col="w",
        n_buckets=8,
    )
    c.merge_sparse(df, None)
    assert c.search_sparse({10: 1}, k=3).count() == 0
    c.merge_sparse(None, df)
    got = [tuple(r) for r in c.search_sparse({10: 1}, k=3).collect()]
    assert got == [(2, 3), (1, 2)]


def test_merge_sparse_rejects_null_keys(spark, sf_smoke, tmp_path):
    """merge_sparse enforces the same non-null id/term contract
    create_sparse validates: a NULL term would otherwise crash the
    bucket sort with a bare TypeError — or, if every row were null,
    land postings in the Hive default partition where the search's
    integer bucket filter can never see them."""
    c = _sparse_coll(spark, sf_smoke, tmp_path)
    nulls = spark.createDataFrame(
        [(9, None, 1)], "doc_id long, term_id long, w long"
    )
    with pytest.raises(ValueError, match="NULL id/term"):
        c.merge_sparse(None, nulls)
    with pytest.raises(ValueError, match="NULL id/term"):
        c.merge_sparse(nulls, None)


def test_sparse_null_contract_converges(spark, tmp_path):
    """create_sparse and merge_sparse enforce the SAME non-null
    contract over (id, term, weight) — the r18 divergence let a NULL
    id through create (computing dslice=NULL → the Hive default
    partition, invisible to search) and a NULL weight through merge
    (poisoning every dot product its bucket serves)."""
    null_id = spark.createDataFrame(
        [(None, 10, 1)], "doc_id long, term_id long, w long"
    )
    null_w = spark.createDataFrame(
        [(9, 10, None)], "doc_id long, term_id long, w long"
    )
    c = VectorCollection(spark, str(tmp_path), "nullcheck")
    with pytest.raises(ValueError, match="NULL id/term/weight"):
        c.create_sparse(
            null_id, id_col="doc_id", term_col="term_id",
            weight_col="w", doc_slices=4,
        )
    with pytest.raises(ValueError, match="NULL id/term/weight"):
        c.create_sparse(
            null_w, id_col="doc_id", term_col="term_id", weight_col="w"
        )
    ok = spark.createDataFrame(
        [(1, 10, 2), (2, 11, 3)], "doc_id long, term_id long, w long"
    )
    c.create_sparse(
        ok, id_col="doc_id", term_col="term_id", weight_col="w",
        n_buckets=8,
    )
    with pytest.raises(ValueError, match="NULL id/term/weight"):
        c.merge_sparse(None, null_w)


# ----------------------------- adaptive doc-slicing (r19 item 3)


def test_create_sparse_auto_slices_only_heavy_buckets(spark, tmp_path):
    """doc_slices="auto": slice counts come from the build-time
    bucket-size histogram — the hot Zipf bucket splits many ways, the
    light tail stays whole — so the rewrite stays slice-granular
    where it matters WITHOUT uniform slicing's file-count overhead
    (measured 1.9x disk for doc_slices=16 at toy file sizes)."""
    import os

    # one hot term (1000 docs) + 15 singleton terms, 16 buckets
    hot = [(i, 0, 1 + i % 3) for i in range(1000)]
    rare = [(i, 16 + t, 2) for t, i in enumerate(range(15))]
    df = spark.createDataFrame(
        hot + rare, "doc_id long, term_id long, w long"
    )
    c = VectorCollection(spark, str(tmp_path), "autosliced")
    c.create_sparse(
        df, id_col="doc_id", term_col="term_id", weight_col="w",
        n_buckets=16, doc_slices="auto",
    )
    slices = {int(b): s for b, s in c.properties["bucket_slices"].items()}
    # hot bucket (term 0 -> bucket 0) holds ~98.5 % of postings:
    # budget = 2*16 = 32 -> ceil(0.985*32) = 32 slices; singleton
    # buckets stay whole
    assert slices[0] == 32
    assert all(slices[b] == 1 for b in slices if b != 0)
    hot_slices = {
        d for d in os.listdir(os.path.join(c.path, "bucket=0"))
        if d.startswith("dslice=")
    }
    assert len(hot_slices) == 32
    rare_dir = os.path.join(c.path, "bucket=1")
    assert os.listdir(rare_dir) == ["dslice=0"]
    # search is layout-independent: hot-term top-3 by weight then id
    got = [tuple(r) for r in c.search_sparse({0: 10}, k=3).collect()]
    assert got == [(2, 30), (5, 30), (8, 30)]


def test_merge_sparse_adaptive_rewrites_one_hot_slice(spark, tmp_path):
    """On the adaptive layout a one-doc change in the hot bucket
    rewrites exactly ONE of its 32 slices (the changed doc's own);
    every other slice file survives bit-for-bit, and a NEW term whose
    bucket was empty at build time lands in a fresh single-slice
    partition (the map defaults unseen buckets to 1)."""
    import os

    hot = [(i, 0, 1 + i % 3) for i in range(1000)]
    rare = [(i, 16 + t, 2) for t, i in enumerate(range(15))]
    df = spark.createDataFrame(
        hot + rare, "doc_id long, term_id long, w long"
    )
    c = VectorCollection(spark, str(tmp_path), "autosliced2")
    c.create_sparse(
        df, id_col="doc_id", term_col="term_id", weight_col="w",
        n_buckets=16, doc_slices="auto",
    )
    before = _parquet_mtimes(c.path)
    # doc 37: weight bump on the hot term + a brand-new term 31 whose
    # bucket (15) was EMPTY at build time — absent from the slice map,
    # so the merge must default it to a single fresh slice
    retire = spark.createDataFrame(
        [(37, 0, 2)], "doc_id long, term_id long, w long"
    )
    add = spark.createDataFrame(
        [(37, 0, 9), (37, 31, 7)],
        "doc_id long, term_id long, w long",
    )
    stats = c.merge_sparse(retire, add)
    assert stats["n_buckets"] == 16
    assert stats["touched_parts"] == 2  # (0, 37%32) and (15, 0)
    own_slice = 37 % 32
    after = _parquet_mtimes(c.path)
    for p, m in before.items():
        d = os.path.dirname(p)
        if d.endswith(f"bucket=0/dslice={own_slice}"):
            continue  # the one slice the change owns
        assert after.get(p) == m, p
    # the new term is searchable in its fresh partition
    got = [tuple(r) for r in c.search_sparse({31: 1}, k=3).collect()]
    assert got == [(37, 7)]
    # and the hot-term update took
    got = [tuple(r) for r in c.search_sparse({0: 1}, k=1).collect()]
    assert got == [(37, 9)]


# ------------------------- merge_sparse crash-consistency (r19 item 2)


class _InjectedCrash(RuntimeError):
    pass


def _arm_fault(monkeypatch, stage: str, on_hit: int = 1):
    """Monkeypatch the merge-swap fault seam to raise on the
    ``on_hit``-th occurrence of ``stage``."""
    import legalchatbot_vectordb_exp_spark.sources.collection as cmod

    seen = {"n": 0}

    def hook(s: str) -> None:
        if s == stage:
            seen["n"] += 1
            if seen["n"] == on_hit:
                raise _InjectedCrash(f"{stage}#{seen['n']}")

    monkeypatch.setattr(cmod, "_MERGE_FAULT", hook)
    return seen


def _postings_checksum(c) -> tuple:
    """One exact global fingerprint of the layout's logical content:
    any lost, duplicated, or half-merged bucket changes it."""
    r = c.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id", "term_id").alias("keys"),
        F.sum("w").cast("bigint").alias("sw"),
        F.sum((F.col("term_id") % 97) * F.col("w"))
        .cast("bigint")
        .alias("wsum"),
        F.sum(F.col("doc_id") % 9973).cast("bigint").alias("idsum"),
    ).collect()[0]
    return tuple(r)


def _crash_fixture(spark, sf_smoke, tmp_path):
    """A doc-sliced layout plus a 2-doc update change batch, and the
    checksums of the PRE-merge and the expected POST-merge state
    (the latter from a clean rebuild of the final corpus)."""
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    )
    c = VectorCollection(spark, str(tmp_path), "crashmerge")
    c.create_sparse(
        _postings(docs), id_col="doc_id", term_col="term_id",
        weight_col="w", n_buckets=16, doc_slices=4,
    )
    pre = _postings_checksum(c)
    changed = docs.orderBy("doc_id").limit(2)
    retire = _postings(changed)
    add = _postings(
        changed.withColumn(
            "text", F.concat(F.col("text"), F.lit(" rev2"))
        )
    )
    ids = [r["doc_id"] for r in changed.collect()]
    final_docs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id").isin(ids),
            F.concat(F.col("text"), F.lit(" rev2")),
        ).otherwise(F.col("text")).alias("text"),
    )
    expect = VectorCollection(spark, str(tmp_path), "crashexpect")
    expect.create_sparse(
        _postings(final_docs), id_col="doc_id", term_col="term_id",
        weight_col="w", n_buckets=16, doc_slices=4,
    )
    post = _postings_checksum(expect)
    assert pre != post  # the change must be observable
    return c, retire, add, pre, post


@pytest.mark.parametrize(
    "stage,on_hit,expect_state",
    [
        ("staged", 1, "pre"),  # crash BEFORE the journal commit
        ("committed", 1, "post"),  # crash right AFTER the commit point
        ("swap-step", 2, "post"),  # crash with the swap HALF-applied
    ],
)
def test_merge_sparse_crash_is_never_half(
    spark, sf_smoke, tmp_path, monkeypatch, stage, on_hit, expect_state
):
    """The r18 delete-then-append swap lost every touched bucket on a
    crash between the delete and the write.  The journaled staged
    swap's contract: a reader after a crash at ANY point sees exactly
    the pre-merge state (crash before the journal commit) or exactly
    the fully-merged state (crash after — read() rolls the journal
    forward), never a half state and never lost postings."""
    import legalchatbot_vectordb_exp_spark.sources.collection as cmod

    c, retire, add, pre, post = _crash_fixture(spark, sf_smoke, tmp_path)
    _arm_fault(monkeypatch, stage, on_hit)
    with pytest.raises(_InjectedCrash):
        c.merge_sparse(retire, add)
    monkeypatch.setattr(cmod, "_MERGE_FAULT", cmod._no_fault)
    # reopen cold — a fresh handle, as a post-crash process would
    reopened = VectorCollection(spark, str(tmp_path), "crashmerge")
    got = _postings_checksum(reopened)
    assert got == (pre if expect_state == "pre" else post)
    # recovery must leave no protocol litter behind a committed swap
    import os

    assert not os.path.exists(
        os.path.join(reopened.path, cmod._MERGE_JOURNAL)
    )
    # and the layout stays fully serviceable: a pre-state layout can
    # re-run the merge to completion; a post-state one is done
    if expect_state == "pre":
        stats = reopened.merge_sparse(retire, add)
        assert stats["touched_parts"] > 0
        assert _postings_checksum(reopened) == post
    search = reopened.search_sparse(dict(SPARSE_QUERY), k=5)
    assert search.count() == 5


# ------------------------------------------ r20 swap-protocol fixes


def test_apply_swap_never_deletes_live_when_trash_exists(
    spark, tmp_path
):
    """The r19-ADVICE concurrent-applier race: applier A finishes a
    key's whole swap (live→trash, staged→live) between applier B's
    staged-dir check and B's move-aside — B then sees BOTH a trash
    copy and a live dir.  The live dir holds the NEW data; deleting
    it (the old rmtree branch) permanently lost the partition.  The
    fixed protocol leaves it alone and both appliers converge."""
    import os

    import legalchatbot_vectordb_exp_spark.sources.collection as cmod

    c = VectorCollection(spark, str(tmp_path), "raceswap")
    live = os.path.join(c.path, "bucket=1")
    os.makedirs(live)
    with open(os.path.join(live, "part-new.parquet"), "w") as fh:
        fh.write("new-data")
    trash = c.path + cmod._MERGE_TRASH_SUFFIX
    os.makedirs(os.path.join(trash, "bucket=1"))
    plan = {
        "part_cols": ["bucket"],
        "swap_keys": [],
        "drop_keys": [["1"]],
        "root_files": [],
    }
    c._apply_merge_swap(plan)
    assert os.path.isdir(live), "live partition deleted by replay"
    assert os.path.exists(os.path.join(live, "part-new.parquet"))


def test_apply_swap_surfaces_real_rename_failures(
    spark, tmp_path, monkeypatch
):
    """_race_ok swallows ONLY the lost-race shapes (source vanished /
    destination exists).  A genuine rename failure (EACCES, ENOSPC,
    EIO) must surface instead of silently leaving a half-applied
    merge behind a swept journal (r19 ADVICE, medium)."""
    import os

    import legalchatbot_vectordb_exp_spark.sources.collection as cmod

    c = VectorCollection(spark, str(tmp_path), "errswap")
    staging = c.path + cmod._MERGE_STAGING_SUFFIX
    stag = os.path.join(staging, "bucket=2")
    os.makedirs(stag)
    os.makedirs(c.path, exist_ok=True)
    plan = {
        "part_cols": ["bucket"],
        "swap_keys": [["2"]],
        "drop_keys": [],
        "root_files": [],
    }
    real_rename = os.rename

    def deny(src, dst, *a, **kw):
        if src == stag:
            raise PermissionError(13, "injected EACCES", src)
        return real_rename(src, dst, *a, **kw)

    monkeypatch.setattr(os, "rename", deny)
    with pytest.raises(PermissionError):
        c._apply_merge_swap(plan)


def test_write_tasks_scales_with_data_not_cores():
    """Dynamic-partition write sizing is derived from the data (parts
    and rows), never from the local core count."""
    from legalchatbot_vectordb_exp_spark.sources.collection import (
        _PARTS_PER_WRITE_TASK,
        _ROWS_PER_WRITE_TASK,
        _write_tasks,
    )

    assert _write_tasks(0, 0) == 1
    assert _write_tasks(100, 1) == 1
    # the sf0.1 adaptive layout: 247 dirs, ~15k rows -> a handful
    assert _write_tasks(14_618, 247) == -(-247 // _PARTS_PER_WRITE_TASK)
    # row-bound dominates for huge layouts
    big = 50 * _ROWS_PER_WRITE_TASK
    assert _write_tasks(big, 10) == 50

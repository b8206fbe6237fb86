"""Large-pipeline scale operators (extensions to SURVEY.md §2.9):
the shapes a 100 TB training-data pipeline runs daily that the
per-family extension modules don't yet cover.

* ``dedup_incremental`` — the *incremental ingest* formulation of
  MinHash dedup: a small incoming batch is checked against the
  standing corpus's band index without ever re-pairing the corpus
  with itself.  At 100 TB the corpus bands are a pre-materialized
  index table; each daily batch costs O(batch × bands) join rows.
* ``substring_dedup_spans`` — positional duplicate-n-gram detection
  (the relational core of suffix-array substring dedup, Lee et al.
  2022 "Deduplicating Training Data Makes Language Models Better"):
  per-document counts/ratio of 5-gram positions whose gram recurs in
  ≥2 documents.  All joins are on the gram key — bucketable, never
  quadratic in the corpus.
* ``semdedup_cells`` — SemDeDup (Abbas et al. 2023): semantic dedup
  restricted to embedding-cluster cells.  Reuses the IVF deterministic
  coarse quantizer (queries_ann.py) as the clustering; the pairwise
  cosine join is blocked on ``(cluster_id, sub-bucket)`` with pairing
  groups capped at ``SEMDEDUP_CELL_CAP`` vectors, so pair volume is
  ≤ n·cap/2 — linear in the corpus (the uncapped per-cell pairing
  went quadratic at the 30× tier; see SCALE.md §10b).
* ``bloom_prune_join`` — a runtime Bloom-filter semi-join: the build
  side aggregates to an m-bit filter (metadata-scale, like Spark's own
  ``runtime.bloomFilter``), the probe scan prunes before any shuffle,
  and the query reports the measured false-positive rate against the
  exact semi-join.

Reference parity note: the reference (Qdrant/*.py) has none of these —
they are extension operators graded as first-class pipeline components
(driver brief, SURVEY.md §2.9); determinism contract per FIXTURES.md
(md5-derived hashes, explicit tie-breaks, round(…,6) on displayed
floats only).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from legalchatbot_vectordb_exp_spark.functions.text import word_shingles, words
from legalchatbot_vectordb_exp_spark.io_tables import load_table, spread
from legalchatbot_vectordb_exp_spark.queries_dedup import (
    MAX_SHINGLE_DF,
    MINHASH_BANDS,
    N_MINHASH,
)
from legalchatbot_vectordb_exp_spark.registry import (
    register,
    sql_dot,
    sql_words,
)

# --------------------------------------------------------------- E2+
# dedup_incremental — incoming batch vs standing-corpus band index

# incoming batch = top ~20% of the md5 key space (same stable-bucket
# convention as hash_split: membership never changes as docs arrive)
_INCOMING_CUT = int(0.80 * 2**32)

_INC_SQL = f"""
    WITH tagged AS (
      SELECT doc_id, text,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
               >= {_INCOMING_CUT} AS incoming
      FROM documents
    ),
    sh AS (
      SELECT doc_id, incoming, unnest(list_distinct(list_transform(
               generate_series(0, greatest(len({sql_words('text')}) - 3, 0)),
               i -> array_to_string({sql_words('text')}[i + 1 : i + 3], ' ')
             ))) AS shingle
      FROM tagged
    ),
    -- the hot-shingle stoplist is part of the CORPUS index: computed
    -- over corpus docs only, applied to both sides
    hot AS (
      SELECT shingle FROM sh WHERE NOT incoming
      GROUP BY shingle HAVING count(*) > {MAX_SHINGLE_DF}
    ),
    sh_rare AS (
      SELECT s.doc_id, s.incoming, s.shingle FROM sh s
      WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.shingle = s.shingle)
    ),
    hv AS (
      SELECT doc_id, incoming,
             ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h1,
             ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS h2
      FROM sh_rare
    ),
    hashed AS (
      SELECT doc_id, incoming, h.i AS hash_id,
             min((h1 + h.i * h2) % 4294967296) AS minhash
      FROM hv, unnest(generate_series(0, {N_MINHASH - 1})) AS h(i)
      GROUP BY doc_id, incoming, h.i
    ),
    bands AS (
      SELECT doc_id, incoming, hash_id // 2 AS band,
             string_agg(minhash::VARCHAR, ',' ORDER BY hash_id) AS band_key
      FROM hashed GROUP BY doc_id, incoming, hash_id // 2
    ),
    corpus_keys AS (
      SELECT DISTINCT band, band_key FROM bands WHERE NOT incoming
    ),
    dup_incoming AS (
      SELECT DISTINCT b.doc_id
      FROM bands b JOIN corpus_keys c
        ON b.band = c.band AND b.band_key = c.band_key
      WHERE b.incoming
    )
    SELECT t.doc_id,
           EXISTS (SELECT 1 FROM dup_incoming d WHERE d.doc_id = t.doc_id)
             AS is_dup
    FROM tagged t WHERE t.incoming
"""


@register("dedup_incremental", sql=_INC_SQL)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup: flag each *incoming* document whose
    signature shares a full LSH band with any *corpus* document.

    Scale shape (the daily-ingest pattern at 100 TB):

    * the corpus's band keys and hot-shingle stoplist are the standing
      index — here rebuilt from the split, in production read from the
      materialized index table of the last run;
    * the incoming side joins the index on ``(band, band_key)`` —
      shuffle volume is O(incoming × bands + index), never O(corpus²),
      and the corpus text itself is *never re-read*;
    * an incoming doc with no rare shingles yields no band rows and is
      trivially new — restored by the left join at the end, mirroring
      the oracle's EXISTS over the incoming frame.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    hv_doc = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    tagged = docs.select(
        "doc_id", "text", (hv_doc >= _INCOMING_CUT).alias("incoming")
    )
    sh = tagged.select(
        "doc_id",
        "incoming",
        F.explode(word_shingles("text", 3)).alias("shingle"),
    ).cache()  # feeds the corpus-side stoplist agg AND the anti join
    hot = (
        sh.filter(~F.col("incoming"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > MAX_SHINGLE_DF)
        .select("shingle")
    )
    sh_rare = sh.join(F.broadcast(hot), "shingle", "left_anti")
    h1 = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(F.md5("shingle"), 9, 8), 16, 10).cast("bigint")
    staged = sh_rare.select(
        "doc_id", "incoming", h1.alias("h1"), h2.alias("h2")
    )
    wide = staged.groupBy("doc_id", "incoming").agg(
        *[
            F.min(
                (F.col("h1") + F.lit(i) * F.col("h2")) % F.lit(4294967296)
            ).alias(f"h{i}")
            for i in range(N_MINHASH)
        ]
    )
    rows_per_band = N_MINHASH // MINHASH_BANDS
    band_keys = F.array(
        *[
            F.concat_ws(
                ",",
                *[
                    F.col(f"h{b * rows_per_band + r}")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    bands = wide.select(
        "doc_id", "incoming", F.posexplode(band_keys)
    ).select(
        "doc_id",
        "incoming",
        F.col("pos").cast("bigint").alias("band"),
        F.col("col").alias("band_key"),
    ).cache()  # one signature build feeds both the index and the probe
    corpus_keys = (
        bands.filter(~F.col("incoming")).select("band", "band_key").distinct()
    )
    dup = (
        bands.filter(F.col("incoming"))
        .join(corpus_keys, ["band", "band_key"], "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    incoming = tagged.filter("incoming").select("doc_id")
    return incoming.join(F.broadcast(dup), "doc_id", "left").select(
        "doc_id", F.coalesce("is_dup", F.lit(False)).alias("is_dup")
    )


# --------------------------------------------------------------- E2+
# substring_dedup_spans — positional duplicated-n-gram coverage

_SPAN_N = 5  # word n-gram width

_SPAN_SQL = f"""
    WITH w AS (
      SELECT doc_id, {sql_words('text')} AS ws FROM documents
    ),
    g AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(0, greatest(len(ws) - {_SPAN_N}, 0)),
               i -> array_to_string(ws[i + 1 : i + {_SPAN_N}], ' ')
             )) AS gram
      FROM w
    ),
    dup AS (
      SELECT gram FROM g GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2
    ),
    per_doc AS (
      SELECT g.doc_id, count(*) AS n_dup_grams
      FROM g JOIN dup USING (gram) GROUP BY g.doc_id
    ),
    totals AS (
      SELECT doc_id, greatest(len(ws) - {_SPAN_N}, 0) + 1 AS n_grams
      FROM w
    )
    SELECT t.doc_id,
           t.n_grams,
           coalesce(p.n_dup_grams, 0) AS n_dup_grams,
           round(coalesce(p.n_dup_grams, 0)::DOUBLE / t.n_grams::DOUBLE, 6)
             AS dup_ratio
    FROM totals t LEFT JOIN per_doc p USING (doc_id)
"""


def _positional_grams(text, n: int):
    """NON-distinct positional n-grams (one per start offset); a doc
    with fewer than n words yields one short gram (the full text) —
    the same short-document convention as functions.text.word_shingles,
    mirrored in the oracle's generate_series/slice."""
    ws = words(text)
    cnt = F.size(ws)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
    )


@register("substring_dedup_spans", sql=_SPAN_SQL)
def q_substring_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-substring coverage per document: the fraction of
    5-gram start positions whose gram also occurs in another document.

    This is the relational core of substring-level dedup (Lee et al.
    2022): the gram-frequency join marks exactly the character spans a
    suffix-array pass would cut.  Scale shape: one explode → one
    groupBy(gram) with map-side partial aggregation (grams are
    positional but the DISTINCT-doc count aggregates them) → one
    equi-join back on the gram key.  Everything shuffles on the gram
    hash — bucketable and skew-safe (a gram's row count is bounded by
    corpus token count, and the join output per gram is its own
    occurrence list, not a pair blow-up)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = docs.select(
        "doc_id", _positional_grams(F.col("text"), _SPAN_N).alias("grams")
    ).cache()  # feeds the explode AND the per-doc totals
    g = w.select("doc_id", F.explode("grams").alias("gram"))
    dup = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    per_doc = (
        g.join(dup, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_grams"))
    )
    totals = w.select("doc_id", F.size("grams").cast("long").alias("n_grams"))
    nd = F.coalesce(F.col("n_dup_grams"), F.lit(0)).cast("long")
    return totals.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        nd.alias("n_dup_grams"),
        F.round(
            nd.cast("double") / F.col("n_grams").cast("double"), 6
        ).alias("dup_ratio"),
    )


# --------------------------------------------------------------- E3+
# semdedup_cells — cluster-blocked semantic dedup (SemDeDup)

SEMDEDUP_TAU = 0.2  # unit vectors: dot == cosine
# pairing-group ceiling: a cell larger than this splits into
# ceil(cell/96) deterministic md5 sub-buckets before pairing.  The
# IVF modulus keeps nlist ~constant (right for probe cost), which
# makes CELL SIZE grow linearly with the corpus — the 30× shuffle
# sweep measured the resulting quadratic pair volume (4.65× bytes for
# 3× rows).  Sub-bucketing caps every pairing group at ~96 vectors →
# pair volume ~n·96/2, linear.  At every driver scale factor
# (sf0.001–sf0.1) cells are ≤ 96, s = 1, and results are unchanged.
SEMDEDUP_CELL_CAP = 96


def _sem_sql() -> str:
    from legalchatbot_vectordb_exp_spark.queries_ann import SQL_IVF_MOD

    sub = (
        f"(('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT "
        f"% ((cnt + {SEMDEDUP_CELL_CAP - 1}) // {SEMDEDUP_CELL_CAP}))"
    )
    return f"""
    WITH centroids AS (
      SELECT vec_id AS cid, embedding AS cv
      FROM embeddings WHERE vec_id % {SQL_IVF_MOD} = 0
    ),
    assign AS (
      SELECT e.vec_id, e.embedding,
             arg_max(c.cid, {sql_dot('e.embedding', 'c.cv')}
                            + 1e-12 * (-c.cid)) AS cluster_id
      FROM embeddings e CROSS JOIN centroids c
      GROUP BY e.vec_id, e.embedding
    ),
    sizes AS (
      SELECT cluster_id, count(*) AS cnt FROM assign GROUP BY cluster_id
    ),
    bucketed AS (
      SELECT a.vec_id, a.embedding, a.cluster_id, {sub} AS sub
      FROM assign a JOIN sizes USING (cluster_id)
    ),
    dup AS (
      SELECT DISTINCT b.vec_id
      FROM bucketed a JOIN bucketed b
        ON a.cluster_id = b.cluster_id AND a.sub = b.sub
           AND a.vec_id < b.vec_id
      WHERE {sql_dot('a.embedding', 'b.embedding')} >= {SEMDEDUP_TAU}
    )
    SELECT s.vec_id, s.cluster_id,
           NOT EXISTS (SELECT 1 FROM dup d WHERE d.vec_id = s.vec_id)
             AS kept
    FROM assign s
    """


@register("semdedup_cells", sql=_sem_sql())
def q_semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: drop a vector when a lower-id vector in the SAME
    coarse cluster has cosine ≥ τ (unit vectors → dot ≥ τ).

    Cluster = the deterministic IVF coarse quantizer shared with the
    ANN family (nearest of the ``vec_id % mod == 0`` centroids,
    sequential-fold dot, ``-cid`` epsilon tie-break — bit-identical to
    the oracle's ``arg_max``).  Scale shape: the pairwise cosine join
    is equi-blocked on ``cluster_id`` — pair volume is Σ n_cell², the
    whole point of SemDeDup vs corpus-wide pairing — and the pair
    scores run through the vectorized exact-fold kernel
    (operators/ann.exact_pair_scores), never an interpreted per-pair
    lambda.  The centroid set is nlist≈64 rows of driver metadata, as
    in queries_ann (`ann_ivf_topk`)."""
    import numpy as np

    from legalchatbot_vectordb_exp_spark.operators.ann import exact_pair_scores
    from legalchatbot_vectordb_exp_spark.queries_ann import ivf_mod_for

    emb = spread(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    mod = ivf_mod_for(emb.count())  # parquet-footer count job
    cmeta = emb.filter(F.col("vec_id") % mod == 0).collect()
    cids = [int(r[0]) for r in cmeta]
    cmat = [list(map(float, r[1])) for r in cmeta]

    from legalchatbot_vectordb_exp_spark.queries_ann import (
        IVF_ASSIGN_SCHEMA,
        make_ivf_assign,
    )

    assigned = emb.mapInPandas(
        # SHARED coarse quantizer with the ANN family — an IVF change
        # cannot shift dedup cells independently of search cells
        make_ivf_assign(cids, cmat), schema=IVF_ASSIGN_SCHEMA
    ).cache()  # one assignment pass feeds both join sides + the output
    # cap pairing-group size: cells beyond SEMDEDUP_CELL_CAP split
    # into deterministic md5 sub-buckets (sizes frame is nlist rows —
    # broadcast metadata); s resolves to 1 at driver scale factors
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    sub = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % F.expr(
        f"(cnt + {SEMDEDUP_CELL_CAP - 1}) div {SEMDEDUP_CELL_CAP}"
    )
    bucketed = assigned.join(F.broadcast(sizes), "cluster_id").select(
        "vec_id", "cluster_id", sub.alias("sub")
    )
    a = bucketed.select(
        F.col("vec_id").alias("id_a"),
        F.col("cluster_id").alias("ca"),
        F.col("sub").alias("sa"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("id_b"),
        F.col("cluster_id").alias("cb"),
        F.col("sub").alias("sb"),
    )
    cand = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("sa") == F.col("sb")))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    dup = (
        exact_pair_scores(cand, assigned)
        .filter(F.col("cos") >= SEMDEDUP_TAU)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return assigned.join(F.broadcast(dup), "vec_id", "left").select(
        "vec_id",
        "cluster_id",
        F.coalesce(~F.col("dropped"), F.lit(True)).alias("kept"),
    )


def _long_array_lit(vals) -> "F.Column":
    """Large integer-array literal via ONE SQL parse.  ``F.lit(list)``
    issues a py4j call per element — measured 2.2 s for 4096 entries —
    while the parser swallows the same array expression in
    milliseconds."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")


# --------------------------------------------------------------- new
# dq_audit — data-quality gate (completeness / uniqueness / integrity)

_DQ_SQL = """
    SELECT 'orders.custkey_fk_violations' AS check_name,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS value
    UNION ALL
    SELECT 'lineitem.orderkey_fk_violations',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders.orderkey_dupes',
           (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                                  GROUP BY 1 HAVING count(*) > 1))
    UNION ALL
    SELECT 'documents.null_text_rows',
           (SELECT count(*) FROM documents
            WHERE text IS NULL OR trim(text) = '')
    UNION ALL
    SELECT 'documents.n_chars_mismatch',
           (SELECT count(*) FROM documents WHERE n_chars <> length(text))
    UNION ALL
    SELECT 'events.ts_out_of_range',
           (SELECT count(*) FROM events
            WHERE ts < TIMESTAMP '2024-01-01'
               OR ts >= TIMESTAMP '2024-02-01')
    UNION ALL
    SELECT 'embeddings.bad_dim_rows',
           (SELECT count(*) FROM embeddings WHERE len(embedding) <> 64)
"""


@register("dq_audit", sql=_DQ_SQL)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: the validation gate a pipeline runs before
    promoting a 100 TB batch — referential integrity (anti-joins),
    key uniqueness, completeness, derived-column consistency, range
    and embedding-dimension checks, each as one named metric row.

    Scale shape: FK checks are LEFT ANTI joins on the key (the parent
    side is the smaller table — broadcast; at equal scale, a shuffled
    anti join on the key, still one pass per check); everything else
    is a scan-stage filter + count, and all counts land in one union
    of single-row aggregates.  Zero violations on healthy data — the
    oracle pins both the metric set and the (expected-zero) values, so
    an engine-side false positive is itself a caught bug."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    emb = load_table(spark, sf_dir, "embeddings")

    def metric(name: str, df) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("value")
        ).select(F.lit(name).alias("check_name"), "value")

    checks = [
        metric(
            "orders.custkey_fk_violations",
            orders.join(
                F.broadcast(cust.select("c_custkey")),
                orders["o_custkey"] == cust["c_custkey"],
                "left_anti",
            ),
        ),
        metric(
            "lineitem.orderkey_fk_violations",
            li.join(
                orders.select("o_orderkey"),
                li["l_orderkey"] == orders["o_orderkey"],
                "left_anti",
            ),
        ),
        metric(
            "orders.orderkey_dupes",
            orders.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1),
        ),
        metric(
            "documents.null_text_rows",
            docs.filter(
                F.col("text").isNull() | (F.trim("text") == "")
            ),
        ),
        metric(
            "documents.n_chars_mismatch",
            docs.filter(F.col("n_chars") != F.length("text")),
        ),
        metric(
            "events.ts_out_of_range",
            ev.filter(
                (F.col("ts") < F.expr("TIMESTAMP_NTZ '2024-01-01 00:00:00'"))
                | (
                    F.col("ts")
                    >= F.expr("TIMESTAMP_NTZ '2024-02-01 00:00:00'")
                )
            ),
        ),
        metric(
            "embeddings.bad_dim_rows",
            emb.filter(F.size("embedding") != 64),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# --------------------------------------------------------------- new
# graph_triangles — triangle counting on the co-purchase graph

_TRI_SQL = """
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_partkey % 5 = 0 AND b.l_partkey % 5 = 0
    )
    SELECT (SELECT count(*) FROM e) AS n_edges,
           (SELECT count(*) FROM e e1 JOIN e e2 ON e1.pb = e2.pa)
             AS n_wedges,
           (SELECT count(*)
            FROM e e1 JOIN e e2 ON e1.pb = e2.pa
                      JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
             AS n_triangles
"""


@register("graph_triangles", sql=_TRI_SQL)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the part co-purchase graph (parts sharing
    an order, ordered pa < pb so each triangle counts once) — the
    third graph-analytics operator next to PageRank and connected
    components.

    Scale shape: edge generation is the order-key self-join (pair
    fan-out bounded by lines-per-order, never table size); the triangle
    pass is the standard two equi-joins on vertex keys (wedge build on
    the shared middle vertex, then the closing-edge hash join) — all
    shuffles are vertex-keyed and skew is bounded by max degree, which
    the ``% 5`` density cap keeps at graph scale rather than
    corpus scale.  The edge frame is cached: it feeds three plans
    (edge count, wedge join, triangle close)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).filter(F.col("l_partkey") % 5 == 0)
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    e = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
        .cache()
    )
    wedges = e.select(F.col("pa").alias("wa"), F.col("pb").alias("wm")).join(
        e.select(F.col("pa").alias("wm"), F.col("pb").alias("wc")), "wm"
    )
    closing = e.select(
        F.col("pa").alias("wa"),
        F.col("pb").alias("wc"),
        F.lit(1).alias("closed"),
    )
    # one pass: every wedge left-joins its closing edge; counting the
    # matches counts triangles without a second wedge materialization
    wt = wedges.join(closing, ["wa", "wc"], "left").agg(
        F.count(F.lit(1)).alias("n_wedges"),
        F.count("closed").alias("n_triangles"),
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    # 1-row × 1-row combine (same deliberate tiny product as
    # time_gapfill's dense grid — never data-sized)
    return n_edges.crossJoin(wt).select(
        "n_edges", "n_wedges", "n_triangles"
    )


# --------------------------------------------------------------- new
# cms_heavy_hitters — count-min sketch frequency estimation

CMS_D = 4  # sketch depth (hash rows)
CMS_W = 1024  # sketch width (buckets per row)
CMS_THRESHOLD = 80  # heavy-hitter cutoff on the ESTIMATE


# row d's bucket = the d-th 8-hex-digit word of ONE md5(key) — one
# hash per row instead of CMS_D (the dominant sketch-build cost)
def _cms_bucket_sql(key: str, d: str) -> str:
    return (
        f"(('0x' || substr(md5({key}::VARCHAR), 1 + 8 * {d}, 8))"
        f"::BIGINT % {CMS_W})"
    )


_CMS_SQL = f"""
    WITH sk AS (
      SELECT d, bucket, count(*) AS c FROM (
        SELECT t.d AS d, {_cms_bucket_sql('user_id', 't.d')} AS bucket
        FROM events, unnest(generate_series(0, {CMS_D - 1})) AS t(d)
      ) GROUP BY d, bucket
    ),
    cand AS (
      SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY user_id
    ),
    est AS (
      SELECT c.user_id, c.exact_cnt, min(sk.c) AS cms_est
      FROM cand c JOIN sk
        ON sk.bucket = {_cms_bucket_sql('c.user_id', 'sk.d')}
      GROUP BY 1, 2
    )
    SELECT user_id, exact_cnt, cms_est
    FROM est WHERE cms_est >= {CMS_THRESHOLD}
"""


@register("cms_heavy_hitters", sql=_CMS_SQL)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over event actors, with the
    exact count beside the estimate (the sketch's one-sided guarantee
    — estimate ≥ exact, always — is pinned by a test).

    The 100 TB story: the sketch is a FIXED d×w integer matrix
    (4×1024 here) built by one map-side-combined aggregate and
    mergeable across partitions/days by element-wise addition — memory
    is constant no matter how many distinct keys flow through.
    Estimation ships the sketch back as ONE array literal (metadata,
    like the Bloom filter's word array) probed by O(1) ``element_at``
    per hash row — scan-stage, no join.  The exact counts exist here
    only to exhibit the guarantee; production queries the sketch
    alone."""
    # key column only — measured: the one-md5-per-row agg on the
    # single-row-group scan beats paying a widening shuffle + 32-task
    # scheduling for it (and a production multi-file scan is already
    # parallel)
    ev = load_table(spark, sf_dir, "events").select("user_id")

    def bucket(key, d: int):
        # word d of ONE md5 — see _cms_bucket_sql
        return (
            F.conv(
                F.substring(F.md5(key.cast("string")), 1 + 8 * d, 8), 16, 10
            ).cast("bigint")
            % CMS_W
        )

    # sketch build: one tiny aggregate over the d-way exploded buckets
    flat = [0] * (CMS_D * CMS_W)
    for r in (
        ev.select(
            F.posexplode(
                F.array(*[bucket(F.col("user_id"), d) for d in range(CMS_D)])
            ).alias("d", "bucket")
        )
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ):
        flat[int(r["d"]) * CMS_W + int(r["bucket"])] = int(r["c"])

    cand = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    # bind the sketch literal ONCE (a per-probe F.lit would embed the
    # 4096-element array d times in the plan — codegen cost dominates)
    est = F.least(
        *[
            F.element_at(
                F.col("sk"),
                (F.lit(d * CMS_W) + bucket(F.col("user_id"), d) + 1).cast(
                    "int"
                ),
            )
            for d in range(CMS_D)
        ]
    )
    return (
        cand.withColumn("sk", _long_array_lit(flat))
        .withColumn("cms_est", est)
        .drop("sk")
        .filter(F.col("cms_est") >= CMS_THRESHOLD)
    )


# --------------------------------------------------------------- new
# zorder_layout — multi-dimensional clustering for data skipping

Z_BITS = 16  # bits interleaved per dimension
Z_BUCKET_SHIFT = 24  # coarse bucket = zaddr >> shift (≤ 256 buckets)

# minute-of-month from tz-free datetime parts (identical on both
# engines for TIMESTAMP_NTZ — pinned by datetime_parts); a
# timestamp-difference would route through session-tz casts in Spark
_MINUTE_NO_SQL = (
    "((extract(day FROM ts)::BIGINT - 1) * 1440"
    " + extract(hour FROM ts)::BIGINT * 60"
    " + extract(minute FROM ts)::BIGINT)"
)


def _z_sql() -> str:
    x = "(user_id & 65535)"
    y = f"({_MINUTE_NO_SQL} & 65535)"
    terms = " | ".join(
        f"((({x} >> {i}) & 1) << {2 * i}) | "
        f"((({y} >> {i}) & 1) << {2 * i + 1})"
        for i in range(Z_BITS)
    )
    return f"""
    WITH z AS (
      SELECT {x} AS ux,
             {_MINUTE_NO_SQL} AS minute_no,
             ({terms}) AS zaddr
      FROM events
    )
    SELECT zaddr >> {Z_BUCKET_SHIFT} AS bucket,
           count(*) AS n_events,
           (max(ux) - min(ux))::BIGINT AS user_span,
           (max(minute_no) - min(minute_no))::BIGINT AS minute_span
    FROM z GROUP BY 1
    """


@register("zorder_layout", sql=_z_sql())
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, event-minute),
    with per-bucket min/max spans — the file-skipping quality metric.

    Z-ordering is how a 100 TB table serves range filters on TWO
    dimensions at once: interleaving the bits of both keys gives a 1-D
    sort order in which every contiguous bucket is a bounded rectangle
    in (user, time) space, so parquet/ORC min-max stripe indexes prune
    on BOTH columns (a plain sort by user_id leaves the time min/max
    of every file spanning the whole month).  The emitted
    ``user_span``/``minute_span`` per coarse bucket IS that
    bounded-rectangle property — buckets cover ≤ 2^(bits-shift/2)
    of each dimension, not the full domain.

    The layout op at scale: ``repartitionByRange(zaddr)`` +
    ``sortWithinPartitions(zaddr)`` before the write (range boundaries
    are sampled, so the *stats* here are computed from the
    deterministic coarse bucket instead).  The address itself is a
    scan-stage integer expression — no shuffle until the final tiny
    per-bucket aggregate."""
    ev = load_table(spark, sf_dir, "events")
    minute_no = (
        (F.dayofmonth("ts").cast("bigint") - 1) * 1440
        + F.hour("ts").cast("bigint") * 60
        + F.minute("ts").cast("bigint")
    )
    x = F.col("user_id").bitwiseAND(F.lit(65535))
    y = minute_no.bitwiseAND(F.lit(65535))
    zaddr = F.lit(0).cast("bigint")
    for i in range(Z_BITS):
        zaddr = zaddr.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    # spans are over the MASKED coordinates actually interleaved into
    # the address — a raw-user_id span would overstate locality the
    # moment ids exceed 2^16 (the mask width)
    z = ev.select(
        x.alias("ux"), minute_no.alias("minute_no"), zaddr.alias("zaddr")
    )
    return z.groupBy(
        F.shiftright("zaddr", Z_BUCKET_SHIFT).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ux") - F.min("ux"))
        .cast("bigint")
        .alias("user_span"),
        (F.max("minute_no") - F.min("minute_no"))
        .cast("bigint")
        .alias("minute_span"),
    )


# --------------------------------------------------------------- E3+
# kmeans_refine — distributed Lloyd iterations, integer-exact

KM_QUANT = 10_000  # fixed-point scale: component -> round(x * 1e4)
KM_ITERS = 2  # Lloyd rounds (unrolled in the oracle)


def _km_sql() -> str:
    from legalchatbot_vectordb_exp_spark.queries_ann import SQL_IVF_MOD

    def dot_int(a: str, b: str) -> str:
        # exact BIGINT dot — order-free, no IEEE concerns
        return (
            f"list_reduce(list_prepend(0::BIGINT, "
            f"list_transform(list_zip({a}, {b}), x -> x[1] * x[2])), "
            f"(acc, x) -> acc + x)"
        )

    def assign(src: str, cents: str, out: str) -> str:
        return f"""
    {out}_s AS (
      SELECT e.vec_id, e.v, c.cid,
             {dot_int('e.v', 'c.cv')} AS sc
      FROM {src} e CROSS JOIN {cents} c
    ),
    {out} AS (
      SELECT vec_id, v, cid FROM {out}_s
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sc DESC, cid ASC) = 1
    )"""

    def update(src: str, out: str) -> str:
        return f"""
    {out}_sum AS (
      SELECT cid, t.i, sum(v[t.i]) AS s, count(*) AS cnt
      FROM {src}, unnest(generate_series(1, len(v))) AS t(i)
      GROUP BY cid, t.i
    ),
    {out} AS (
      SELECT cid, list(s // cnt ORDER BY i) AS cv
      FROM {out}_sum GROUP BY cid
    )"""

    return f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> round(x * {KM_QUANT})::BIGINT) AS v
      FROM embeddings
    ),
    c0 AS (
      SELECT vec_id AS cid, v AS cv FROM e
      WHERE vec_id % {SQL_IVF_MOD} = 0
    ),{assign('e', 'c0', 'a1')},{update('a1', 'c1')},{assign('e', 'c1', 'a2')}
    SELECT cid AS cluster_id,
           count(*) AS n_members,
           -- ::BIGINT: sum(BIGINT) is HUGEINT in DuckDB and // keeps it;
           -- uncast it hash-diverges via the driver's float64 fetch.
           (sum(v[1]) // count(*))::BIGINT AS centroid_c0
    FROM a2 GROUP BY cid
    """


@register("kmeans_refine", sql=_km_sql())
def q_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means refinement of the IVF coarse
    centroids — {KM_ITERS} iterations, **integer-exact on both
    engines**.

    The floating-point trap in distributed k-means is that the
    centroid update is a big sum, and IEEE addition is not associative
    — partition order would leak into the result.  This operator
    quantizes components to fixed-point BIGINT (``round(x·1e4)``), so
    sums are exact integers (order-free), centroid updates are exact
    truncating division (Spark ``div`` ≡ DuckDB ``//``), and the
    assignment score is an exact int64 dot product — bit-identical
    results with NO fold-order pinning anywhere.

    Scale shape per iteration (the MLlib shape, made deterministic):

    * assignment is a narrow Arrow kernel — the k×dim centroid matrix
      is driver metadata (like the IVF coarse quantizer), and the int64
      matmul in NumPy is exact; **zero shuffle**;
    * the update is ONE map-side-combined wide aggregate (dim sum
      columns + count): the shuffle carries k×(dim+1) longs per map
      task, independent of corpus size;
    * int64 headroom: |component| ≤ 0.58·1e4, so a score against a
      quantized *mean* centroid is ≤ dim·(0.58e4)² ≈ 2e12 — bounded at
      any corpus size because centroids are re-divided each round
      (never raw sums).

    Ties (exact equal scores) break to the smallest centroid id on
    both engines (kernel: argmax over cid-ascending rows; oracle:
    ``ORDER BY sc DESC, cid ASC``)."""
    import numpy as np

    from legalchatbot_vectordb_exp_spark.queries_ann import ivf_mod_for

    emb = spread(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    quant = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.round(x * KM_QUANT).cast("bigint"),
    )
    # scanned once per Lloyd round + the init fetch — quantize once
    e = emb.select("vec_id", quant.alias("v")).cache()
    mod = ivf_mod_for(e.count())  # parquet-footer count job
    init = sorted(
        (int(r[0]), [int(x) for x in r[1]])
        for r in e.filter(F.col("vec_id") % mod == 0).collect()
    )
    cids = [c for c, _ in init]
    cmat = [v for _, v in init]
    dim = len(cmat[0])

    def partials(cids_it: list[int], cmat_it: list[list[int]]) -> DataFrame:
        """Assignment + per-cluster partial sums IN the kernel: each
        Arrow batch emits one row per non-empty cluster (cluster_id,
        cnt, s0..s{dim-1}) — the quantized vectors never serialize
        back out of Python, and the downstream shuffle carries
        k×(dim+2) longs per batch instead of the corpus.  bincount's
        float64 accumulation is exact here: per-batch component sums
        stay ≤ ~1e4·batch ≪ 2^53, and integer addition is associative
        so the batch split cannot affect the totals."""

        def kernel(batches):
            import pandas as pd

            C = np.array(cmat_it, dtype=np.int64)  # k × dim, cid-ascending
            ids = np.array(cids_it, dtype=np.int64)
            k = len(cids_it)
            for pdf in batches:
                if not len(pdf):
                    continue
                E = np.array(list(pdf["v"]), dtype=np.int64)
                best = np.argmax(E @ C.T, axis=1)  # first max = min cid
                cnt = np.bincount(best, minlength=k)
                present = cnt > 0
                out = pd.DataFrame(
                    {"cluster_id": ids[present], "cnt": cnt[present]}
                )
                for j in range(E.shape[1]):
                    out[f"s{j}"] = np.bincount(
                        best, weights=E[:, j], minlength=k
                    ).astype(np.int64)[present]
                yield out

        schema = "cluster_id long, cnt long, " + ", ".join(
            f"s{j} long" for j in range(dim)
        )
        return e.mapInPandas(kernel, schema=schema)

    def trunc_div(s: int, n: int) -> int:
        q = abs(s) // n  # Python // floors; mirror the engines' trunc
        return q if s >= 0 else -q

    def reduced(cids_it, cmat_it):
        return (
            partials(cids_it, cmat_it)
            .groupBy("cluster_id")
            .agg(
                F.sum("cnt").alias("cnt"),
                *[F.sum(f"s{i}").alias(f"s{i}") for i in range(dim)],
            )
        )

    for _ in range(KM_ITERS - 1):
        stats = reduced(cids, cmat).collect()  # k rows — the Lloyd sync
        upd = sorted(
            (
                int(r["cluster_id"]),
                [trunc_div(int(r[f"s{i}"]), int(r["cnt"])) for i in range(dim)],
            )
            for r in stats
        )
        cids = [c for c, _ in upd]
        cmat = [v for _, v in upd]

    return reduced(cids, cmat).select(
        "cluster_id",
        F.col("cnt").alias("n_members"),
        F.expr("s0 div cnt").alias("centroid_c0"),
    )


# --------------------------------------------------------------- new
# bloom_prune_join — runtime Bloom-filter semi-join with measured FPR

BLOOM_MIN_BITS = 8192  # floor; m scales as next-pow2(16 × build keys)
BLOOM_K = 3  # hash functions per key

# m is COUNT-DERIVED (like the LSH plane count): a fixed m saturates
# once the build side outgrows it — at 10× the fill factor hit ~67%
# and the filter stopped filtering.  next-pow2(16n) keeps fill ≈ 17%
# (fpr ≈ 0.4%) at any scale; the bit-length formula is integer-exact
# on both engines (Python int.bit_length == DuckDB length(bin())).
# greatest(nk, 1): an empty build side must not feed bin(-1), whose
# 64-one-bits length would overflow the shift (and disagree with
# Python's (-1).bit_length() == 0)
_BLOOM_M_SQL = (
    "greatest(8192, 1::BIGINT << length(bin(16 * greatest(nk, 1) - 1)))"
)


# k positions from ONE md5: the 32 hex digits carry four independent
# 32-bit words; hashing once per row (not per hash function) is the
# dominant-cost fix for the probe scan
def _bloom_pos_sql(key: str, i: int) -> str:
    return (
        f"(('0x' || substr(md5({key}::VARCHAR), {8 * i + 1}, 8))::BIGINT"
        f" % m)"
    )


def _bloom_test_sql(key: str, i: int) -> str:
    p = _bloom_pos_sql(key, i)
    return f"((words[({p} // 32)::INT + 1] >> ({p} % 32)::INT) & 1) = 1"


_BLOOM_SQL = f"""
    WITH dim AS (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    par AS (
      SELECT {_BLOOM_M_SQL} AS m
      FROM (SELECT count(*) AS nk FROM dim)
    ),
    pos AS (
      SELECT DISTINCT p FROM (
        {' UNION ALL '.join(
            f"SELECT {_bloom_pos_sql('k', i)} AS p FROM dim, par"
            for i in range(BLOOM_K)
        )}
      )
    ),
    wnz AS (
      SELECT p // 32 AS w, bit_or(1::BIGINT << (p % 32)::INT) AS word
      FROM pos GROUP BY 1
    ),
    bm AS (
      SELECT list(coalesce(word, 0) ORDER BY i) AS words
      FROM (SELECT unnest(generate_series(0, (m // 32)::BIGINT - 1)) AS i
            FROM par) g
      LEFT JOIN wnz ON wnz.w = g.i
    ),
    probe AS (
      SELECT o_orderkey, o_custkey,
             {' AND '.join(
                 _bloom_test_sql('o_custkey', i) for i in range(BLOOM_K)
             )} AS bloom_pass,
             EXISTS (SELECT 1 FROM dim WHERE k = o_custkey) AS exact_match
      FROM orders, par, bm
    )
    SELECT count(*) AS n_orders,
           count(*) FILTER (WHERE bloom_pass) AS n_bloom_pass,
           count(*) FILTER (WHERE exact_match) AS n_exact,
           count(*) FILTER (WHERE bloom_pass AND NOT exact_match)
             AS n_false_positive,
           -- 0.0 (not NULL) when every probe is a true match: with no
           -- negatives there are no false positives by definition
           coalesce(round(
             (count(*) FILTER (WHERE bloom_pass AND NOT exact_match))::DOUBLE
             / nullif(count(*) FILTER (WHERE NOT exact_match), 0)::DOUBLE,
             6), 0.0) AS fp_rate
    FROM probe
"""


@register("bloom_prune_join", sql=_BLOOM_SQL)
def q_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter semi-join, with its false-positive rate
    measured against the exact semi-join in the same pass.

    The build side (BUILDING customers) aggregates to an m-bit filter
    (m = next-pow2 of 16× the key count, floor 8192 — COUNT-derived so
    the fill factor stays ≈17% at any build cardinality; the 10× sweep
    showed a fixed m saturating).  k=3 md5-derived positions per key,
    packed into a dense array of 32-bit words.  That word array is
    **metadata** (m/32 longs — the same cardinality contract as
    Spark's own ``spark.sql.optimizer.runtime.bloomFilter``), shipped
    to the probe scan as ONE array literal: each membership test is an
    O(1) ``element_at`` + shift — scan-stage, so at 100 TB the fact
    table prunes BEFORE any shuffle, with zero join on the hot path
    (an earlier draft used ``array_contains`` over the raw position
    list: O(m) per probe AND a per-element literal whose codegen cost
    exploded at 10×).  The exact flag joins only for the measurement —
    production keeps the bloom pass as a pre-filter in front of the
    real join."""
    cust = load_table(spark, sf_dir, "customer")
    # probe-side md5 membership tests dominate: widen the scan
    orders = spread(load_table(spark, sf_dir, "orders"))
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    nk = dim.count()
    m = max(BLOOM_MIN_BITS, 1 << (16 * max(nk, 1) - 1).bit_length())

    def pos(key, i: int):
        # substring i of ONE md5 — see _bloom_pos_sql
        return (
            F.conv(
                F.substring(F.md5(key.cast("string")), 8 * i + 1, 8), 16, 10
            ).cast("bigint")
            % m
        )

    # one distributed agg builds the bit set; one driver fetch packs it
    words = [0] * (m // 32)
    for r in (
        dim.select(
            F.explode(
                F.array(*[pos(F.col("k"), i) for i in range(BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
        .collect()
    ):
        p = int(r[0])
        words[p >> 5] |= 1 << (p & 31)

    def test(i: int):
        p = (
            f"(cast(conv(substring(md5(cast(o_custkey as string)), "
            f"{8 * i + 1}, 8), 16, 10) as bigint) % {m})"
        )
        return (
            f"((shiftright(element_at(bw, cast({p} div 32 as int) + 1), "
            f"cast({p} % 32 as int)) & 1) = 1)"
        )

    bloom_pass = F.expr(
        " AND ".join(test(i) for i in range(BLOOM_K))
    )
    probed = orders.withColumn("bw", _long_array_lit(words)).withColumn(
        "bloom_pass", bloom_pass
    ).drop("bw").join(
        F.broadcast(dim.withColumn("exact", F.lit(True))),
        F.col("o_custkey") == F.col("k"),
        "left",
    )
    exact = F.coalesce(F.col("exact"), F.lit(False))
    return probed.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("bloom_pass")).alias("n_bloom_pass"),
        F.count_if(exact).alias("n_exact"),
        F.count_if(F.col("bloom_pass") & ~exact).alias("n_false_positive"),
        # 0.0 (not NULL) when every probe is a true match — mirrors the
        # oracle's coalesce(.../nullif(den,0), 0.0)
        F.coalesce(
            F.round(
                F.count_if(F.col("bloom_pass") & ~exact).cast("double")
                / F.nullif(F.count_if(~exact), F.lit(0)).cast("double"),
                6,
            ),
            F.lit(0.0),
        ).alias("fp_rate"),
    )


# --------------------------------------------------------------- new
# hll_register_merge — explicit-register HyperLogLog, sketch union

HLL_M = 256  # registers (2^8); standard error 1.04/sqrt(m) ≈ 6.5%
HLL_B = 20  # rho budget: md5 hex chars 9..13 = 20 bits
HLL_ALPHA_PPM = 718274  # 0.7213 / (1 + 1.079/m) for m=256, in ppm
# linear-counting lookup: lc[V] = round(m·ln(m/V)), V = 1..m-1 —
# precomputed so NEITHER engine evaluates a float log (the constants
# are codegen-time; runtime arithmetic stays pure BIGINT)
_HLL_LC = [
    round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M)
]
_HLL_LC_THRESHOLD = 5 * HLL_M // 2  # apply LC when raw est ≤ 2.5m


def _hll_rho_case(h2: str) -> str:
    """rho = (B+1) − bitlen(h2) as a pure-integer CASE ladder —
    identical text on both engines (no log2, no floats)."""
    whens = " ".join(
        f"WHEN {h2} >= {1 << (HLL_B - i)} THEN {i}"
        for i in range(1, HLL_B + 1)
    )
    return f"(CASE {whens} ELSE {HLL_B + 1} END)"


def _hll_sql() -> str:
    bucket = (
        f"(('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))"
        f"::BIGINT % {HLL_M})"
    )
    h2 = f"('0x' || substr(md5(o_custkey::VARCHAR), 9, 5))::BIGINT"
    lc = "[" + ", ".join(str(v) for v in _HLL_LC) + "]"
    return f"""
    WITH keyed AS (
      SELECT o_orderpriority AS grp, o_custkey AS k,
             {bucket} AS bucket, {_hll_rho_case(h2)} AS rho
      FROM orders
    ),
    regs AS (
      SELECT grp, bucket, max(rho) AS r FROM keyed GROUP BY 1, 2
    ),
    merged AS (
      SELECT 'ALL' AS grp, bucket, max(r) AS r FROM regs GROUP BY 2
    ),
    sk AS (SELECT * FROM regs UNION ALL SELECT * FROM merged),
    est AS (
      SELECT grp,
             ({HLL_M} - count(*))::BIGINT AS v_zero,
             (sum(1::BIGINT << ({HLL_B + 1} - r))::BIGINT
              + ({HLL_M} - count(*))::BIGINT
                * {1 << (HLL_B + 1)}) AS n_total
      FROM sk GROUP BY 1
    ),
    raws AS (
      SELECT grp, v_zero,
             ({HLL_ALPHA_PPM}::BIGINT * {HLL_M * HLL_M}
              * {1 << (HLL_B + 1)} // n_total // 1000000) AS raw
      FROM est
    ),
    ex AS (
      SELECT o_orderpriority AS grp,
             count(DISTINCT o_custkey)::BIGINT AS exact_distinct
      FROM orders GROUP BY 1
      UNION ALL
      SELECT 'ALL', count(DISTINCT o_custkey)::BIGINT FROM orders
    )
    SELECT r.grp AS grp, ex.exact_distinct AS exact_distinct,
           (CASE WHEN r.v_zero > 0 AND r.raw <= {_HLL_LC_THRESHOLD}
                 THEN ({lc})[r.v_zero] ELSE r.raw
            END)::BIGINT AS hll_est,
           abs((CASE WHEN r.v_zero > 0 AND r.raw <= {_HLL_LC_THRESHOLD}
                     THEN ({lc})[r.v_zero] ELSE r.raw
                END)::BIGINT - ex.exact_distinct) * 5
             <= ex.exact_distinct AS within_20pct
    FROM raws r JOIN ex ON r.grp = ex.grp
    """


@register("hll_register_merge", sql=_hll_sql())
def q_hll_register_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-register HyperLogLog distinct-count sketches, merged
    by register-wise MAX — the mergeable companion to
    ``cms_heavy_hitters`` (CMS merges by +, HLL by max) and the
    from-scratch counterpart of ``approx_agg_guard``'s built-in HLL++.

    Unlike ``approx_count_distinct`` the sketch here is a first-class
    DataFrame of (group, bucket, r) rows: store one per day/partition,
    union and ``max`` to answer ANY grouping later without rescanning
    — the production shape for multi-day distinct users at 100 TB
    (registers are ≤ m rows per group, metadata-scale, and the merge
    is associative/commutative/idempotent so re-merges are safe).
    Register-merge ≡ recompute is exactly max's associativity, pinned
    by ``test_hll_register_merge_equals_recompute``; the plan here
    computes both granularities in ONE grouping-sets pass over the
    scan (map-side combined — no second read, no union of branches),
    which is the shape a 100 TB scan wants.

    Determinism: bucket and rho derive from one md5 per key (same
    cross-engine hex idiom as the CMS); the estimator is pure BIGINT
    — Σ2^(B+1−r) via shifts, an alpha·m²·2^(B+1) // N floor division,
    and a PRECOMPUTED linear-counting lookup table (no runtime float
    log on either engine).  Estimate quality is pinned by the
    ``within_20pct`` guard column (measured worst case 7.5% at sf0.1,
    SE 6.5% for m=256)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_custkey").alias("k"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % HLL_M
    )
    h2 = F.conv(
        F.substring(F.md5(F.col("k").cast("string")), 9, 5), 16, 10
    ).cast("bigint")
    keyed = (
        orders.withColumn("h2_val", h2)
        .select(
            "grp",
            "k",
            bucket.alias("bucket"),
            F.expr(_hll_rho_case("h2_val")).alias("rho"),
        )
    )
    # one Expand-based pass builds the five per-group sketches AND the
    # global one (grouping set (bucket) ⇒ grp NULL ⇒ 'ALL')
    sk = (
        keyed.groupingSets(
            [["grp", "bucket"], ["bucket"]], "grp", "bucket"
        )
        .agg(F.max("rho").alias("r"))
        .select(
            F.coalesce(F.col("grp"), F.lit("ALL")).alias("grp"),
            "bucket",
            "r",
        )
    )
    est = sk.groupBy("grp").agg(
        (F.lit(HLL_M) - F.count(F.lit(1))).cast("bigint").alias("v_zero"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_B + 1} - r)")).alias("n_present"),
    ).select(
        "grp",
        "v_zero",
        (
            F.col("n_present")
            + F.col("v_zero") * F.lit(1 << (HLL_B + 1))
        ).alias("n_total"),
    ).select(
        "grp",
        "v_zero",
        F.expr(
            f"({HLL_ALPHA_PPM}L * {HLL_M * HLL_M} * {1 << (HLL_B + 1)})"
            f" div n_total div 1000000"
        ).alias("raw"),
    )
    ex = (
        orders.rollup("grp")
        .agg(F.countDistinct("k").alias("exact_distinct"))
        .select(
            F.coalesce(F.col("grp"), F.lit("ALL")).alias("grp"),
            "exact_distinct",
        )
    )
    lc_vals = ", ".join(str(v) for v in _HLL_LC)
    final_est = F.expr(
        f"cast(CASE WHEN v_zero > 0 AND raw <= {_HLL_LC_THRESHOLD}"
        f" THEN element_at(array({lc_vals}), cast(v_zero as int))"
        f" ELSE raw END as bigint)"
    )
    return (
        est.join(ex, "grp")
        .select(
            "grp",
            "exact_distinct",
            final_est.alias("hll_est"),
            (
                F.abs(final_est - F.col("exact_distinct")) * 5
                <= F.col("exact_distinct")
            ).alias("within_20pct"),
        )
    )

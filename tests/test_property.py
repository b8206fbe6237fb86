"""Property-based tests (hypothesis) for the two operators SURVEY.md §7
flags as the hard semantic-preservation targets: char-budget context
assembly and first-match MRR.  Each is checked against a direct Python
reimplementation of the reference loop on randomized inputs.

Spark jobs are expensive per-example, so examples are batched: one
generated dataset = many rows/groups through a single Spark action.
"""

from __future__ import annotations

import re

import pytest

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from legalchatbot_vectordb_exp_spark.operators.context import (
    SEPARATOR,
    assemble_context,
)
from legalchatbot_vectordb_exp_spark.operators.evaluate import with_recall_mrr

# --------------------------------------------------------- reference twins


def ref_assemble(hits, budget):
    parts, total = [], 0
    for score, text, page, chunk in hits:
        txt = text.strip()
        if not txt:
            continue
        remaining = budget - total
        if len(txt) > remaining:
            txt = txt[:remaining]
        parts.append(f"[Page {page} | Chunk {chunk}]\n{txt}")
        total += len(txt)
        if total >= budget:
            break
    return SEPARATOR.join(parts)


def ref_eval(answers: str, predicted: str, k: int):
    gold = set(re.findall(r"\d+", answers))
    pred = re.findall(r"\d+", predicted)[:k]
    rr = 0.0
    for i, p in enumerate(pred, start=1):
        if p in gold:
            rr = 1.0 / i
            break
    recall = (len(gold & set(pred)) / len(gold)) if gold else 0.0
    return recall, rr


# --------------------------------------------------------------- strategies

texts = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"), max_codepoint=0x024F
    ),
    max_size=60,
)
hit = st.tuples(
    st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
    texts,
    st.integers(0, 99),
    st.integers(0, 9),
)
group = st.lists(hit, min_size=0, max_size=8)

digit_text = st.text(
    alphabet=list("0123456789 ,/และมาตราxyz"), max_size=40
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(groups=st.lists(group, min_size=1, max_size=6), budget=st.integers(1, 200))
def test_context_assembly_matches_reference(spark, groups, budget):
    rows = []
    expected = {}
    for gi, hits in enumerate(groups):
        qid = f"q{gi}"
        # unique scores per group: the reference loop is order-defined,
        # so ties would make both sides depend on a tie-break; the
        # operator pins ties by id, the reference by input order —
        # equality is only guaranteed for distinct scores
        hits = [
            (float(s) + 1e-6 * hi, t, p, c)
            for hi, (s, t, p, c) in enumerate(hits)
        ]
        hits.sort(key=lambda h: -h[0])
        exp = ref_assemble(hits, budget)
        if exp:
            expected[qid] = exp
        rows += [
            (qid, s, t, p, c, hi) for hi, (s, t, p, c) in enumerate(hits)
        ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, ["query_id", "score", "text", "page", "chunk_index", "hid"]
    )
    got = {
        r.query_id: r.context
        for r in assemble_context(df, budget=budget, id_col="hid").collect()
    }
    assert got == expected


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cases=st.lists(st.tuples(digit_text, digit_text), min_size=1, max_size=20),
    k=st.integers(1, 6),
)
def test_recall_mrr_matches_reference(spark, cases, k):
    df = spark.createDataFrame(
        [(i, a, p) for i, (a, p) in enumerate(cases)],
        ["i", "answers", "predicted_law"],
    )
    got = {
        r.i: (r.recall_at_k, r.mrr_at_k)
        for r in with_recall_mrr(df, k=k).collect()
    }
    for i, (a, p) in enumerate(cases):
        exp_recall, exp_rr = ref_eval(a, p, k)
        assert abs(got[i][0] - exp_recall) < 1e-12, (a, p, k)
        assert abs(got[i][1] - exp_rr) < 1e-12, (a, p, k)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs_words=st.lists(
        st.lists(st.sampled_from(["law", "court", "tax", "deed", "case"]),
                 min_size=0, max_size=12),
        min_size=1, max_size=12,
    )
)
def test_bm25_matches_python_reference(spark, docs_words):
    """_bm25_scores vs an independent Python BM25 (k1=1.2, b=0.75,
    idf = ln(1 + (N - df + .5)/(df + .5)), fixed term order)."""
    import math

    from legalchatbot_vectordb_exp_spark.queries_text import _bm25_scores

    terms = ["law", "tax", "deed"]
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in _bm25_scores(df, terms).collect()}

    # independent reference
    tf = [
        {w: ws.count(w) for w in set(ws)} for ws in docs_words
    ]
    n_docs = sum(1 for ws in docs_words if ws)  # docs with >=1 token
    dls = [len(ws) for ws in docs_words if ws]
    avgdl = sum(dls) / len(dls) if dls else 1.0
    df_t = {
        t: sum(1 for d in tf if t in d) for t in terms
    }
    expect = {}
    for i, d in enumerate(tf):
        if not docs_words[i]:
            continue
        score = 0.0
        for t in terms:
            if t not in d:
                continue
            idf = math.log(
                1 + (n_docs - df_t[t] + 0.5) / (df_t[t] + 0.5)
            )
            f = d[t]
            dl = len(docs_words[i])
            score += idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl / avgdl))
        if any(t in d for t in terms):
            expect[i] = round(score, 6)
    assert got == pytest.approx(expect, abs=2e-6)


@given(
    data=st.binary(min_size=0, max_size=400),
    with_sig=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_png_decoder_total_on_arbitrary_bytes(data, with_sig):
    """The PNG decoder is TOTAL: arbitrary (optionally PNG-signed)
    bytes either decode to a well-formed pixel array or return None —
    never an exception (corrupt multimodal payloads are routine in a
    100 TB corpus; a decoder that throws kills the whole task)."""
    from legalchatbot_vectordb_exp_spark.multimodal.binary import (
        _PNG_SIG,
        _decode_png,
    )

    blob = (_PNG_SIG + data) if with_sig else data
    out = _decode_png(blob)
    if out is not None:
        assert out.ndim == 3 and out.dtype.name == "uint8"


@given(data=st.binary(min_size=0, max_size=400))
@settings(max_examples=100, deadline=None)
def test_decode_pixels_total_on_arbitrary_bytes(data):
    """decode_pixels (BMP/PPM/PNG/JPEG dispatch) is total on junk."""
    from legalchatbot_vectordb_exp_spark.multimodal.binary import (
        decode_pixels,
    )

    for prefix in (b"", b"BM", b"P6", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff",
                   b"GIF89a", b"GIF87a"):
        out = decode_pixels(prefix + data)
        if out is not None:
            assert out.ndim == 3 and out.dtype.name == "uint8"


@given(data=st.binary(min_size=0, max_size=400))
@settings(max_examples=100, deadline=None)
def test_decode_jpeg_total_on_corrupt_streams(data):
    """The JPEG decoder never throws — corrupt entropy data, truncated
    segments, and mangled markers all come back None or valid pixels."""
    import numpy as np

    from legalchatbot_vectordb_exp_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_jpeg(px, quality=80)
    # raw junk, junk after SOI, and good-with-tail-replaced
    for blob in (data, b"\xff\xd8" + data, good[: len(good) // 2] + data):
        out = decode_jpeg(blob)
        if out is not None:
            assert out.ndim == 3 and out.dtype.name == "uint8"


# ------------------------- rank fusion (round-17, hybrid query_points)


def ref_rrf(rankings, k, topk):
    """Direct python twin of operators.fusion.rrf_fuse."""
    score = {}
    for ranking in rankings:
        for doc, r in ranking:
            score[doc] = score.get(doc, 0.0) + 1.0 / (k + r)
    out = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))
    return out[:topk]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rankings=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=30),
            min_size=1,
            max_size=12,
            unique=True,
        ),
        min_size=1,
        max_size=4,
    ),
    k=st.integers(min_value=1, max_value=100),
)
def test_rrf_fuse_matches_reference(spark, rankings, k):
    """rrf_fuse == the obvious python fold for any retriever count,
    id overlap pattern, and k — exact float equality (both sides are
    the same sums of the same reciprocals, and the per-doc addition
    order is retriever order on both)."""
    from legalchatbot_vectordb_exp_spark.operators.fusion import rrf_fuse

    ranked = [
        [(doc, i + 1) for i, doc in enumerate(lst)] for lst in rankings
    ]
    dfs = [
        spark.createDataFrame(lst, "doc_id long, r int") for lst in ranked
    ]
    got = [
        (r["doc_id"], r["rrf"])
        for r in rrf_fuse(dfs, k=k, topk=1000).collect()
    ]
    want = ref_rrf(ranked, k, 1000)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12), (gd, gs, ws)


@settings(max_examples=50, deadline=None)
@given(
    scores=st.lists(
        st.floats(
            min_value=-100, max_value=100,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=64,
    )
)
def test_dbsf_constants_match_sequential_reference(scores):
    """dbsf_constants == the literal sequential fold (bit-for-bit —
    this IS the cross-engine determinism contract, so no tolerance),
    and σ is the population std: 0 iff all scores equal."""
    from legalchatbot_vectordb_exp_spark.operators.fusion import (
        dbsf_constants,
    )

    mu, sigma = dbsf_constants(scores)
    acc = 0.0
    for s in scores:
        acc += s
    want_mu = acc / len(scores)
    acc2 = 0.0
    for s in scores:
        acc2 += (s - want_mu) * (s - want_mu)
    want_sigma = (acc2 / len(scores)) ** 0.5
    assert mu == want_mu and sigma == want_sigma
    assert (sigma == 0.0) == (len(set(scores)) == 1) or sigma >= 0.0

"""Product quantization (PQ): compressed vectors + asymmetric-distance
top-k — the memory side of ANN at 100 TB.

A 64-d float32 embedding is 256 bytes; its PQ code (m subspaces x
4-bit centroid ids at k=16) is m/2 bytes — 16 bytes at the engine's
m=32 default, a 16x compression that turns a 100 TB embedding store
into ~6 TB of scannable codes (coarser m=8 trades recall for 32x).  The classic
IVF-PQ recipe (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011):

* **train** — split dims into m subspaces; per subspace, k-means over
  a corpus sample.  Codebooks are metadata (m x k x d/m floats — a few
  KB), a legitimately driver-scale object like the IVF coarse
  centroids (`sources/collection.py`).  Training is deterministic:
  vec_id-ordered sample, evenly-spaced init, fixed Lloyd iterations.
* **encode** — per vector, argmin centroid per subspace → m small ints.
  A narrow Arrow-batched projection over the corpus: no shuffle, and
  at rest the codes column (not the vectors) is what the scan reads.
* **ADC search** — per query, precompute the m x k lookup table of
  subspace dot products; a row's approximate score is the sum of m
  table lookups (never touches floats of the corpus).  The kernel
  keeps a per-partition top-r heap per query, so the only shuffle is
  r x partitions x queries candidate rows into the final window rank.
* **refine** — the true scores of the top-r candidates are recomputed
  exactly (bit-identical fold) against the uncompressed vectors of
  just those r rows — candidate-sized work.

Approximation contract: ADC ordering is approximate — the engine's
oracle-checked query (`ann_pq_guard`) asserts the *recall* of the
refined top-k against the exact brute-force top-k instead of
hash-matching ADC scores (same pattern as `approx_agg_guard` for
HLL/t-digest).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def train_codebooks(
    sample: np.ndarray, m: int = 8, k: int = 16, iters: int = 8
) -> np.ndarray:
    """Deterministic per-subspace Lloyd k-means → (m, k, d/m) float64.

    Init = evenly spaced rows of the (caller-ordered) sample; empty
    clusters keep their previous centroid.  Everything is float64
    NumPy with a fixed iteration count — same books on every run,
    every machine.
    """
    n, d = sample.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if n < k:
        raise ValueError(f"sample of {n} rows cannot seed k={k} centroids")
    ds = d // m
    books = np.empty((m, k, ds), dtype=np.float64)
    init_idx = np.linspace(0, n - 1, k).astype(np.int64)
    for j in range(m):
        sub = np.ascontiguousarray(sample[:, j * ds : (j + 1) * ds])
        cent = sub[init_idx].copy()
        for _ in range(iters):
            # (n, k) squared distances via ||x||² - 2x·c + ||c||²
            d2 = (
                (sub * sub).sum(1)[:, None]
                - 2.0 * (sub @ cent.T)
                + (cent * cent).sum(1)[None, :]
            )
            assign = d2.argmin(1)
            for c in range(k):
                pts = sub[assign == c]
                if len(pts):
                    cent[c] = pts.mean(0)
        books[j] = cent
    return books


def sample_vectors(
    emb: DataFrame,
    n: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Driver-side training sample: ``n`` deterministically
    hash-selected rows, tie-broken by id order.

    A deterministic xxhash64 threshold filter keeps an expected 4n
    rows BEFORE the TakeOrdered, so the scan's output (not just the
    driver pull) is bounded at any corpus size; the filter passes
    everything when the corpus is already sample-sized.  Metadata-
    scale by construction (n x d floats) — nothing corpus-sized ever
    materializes.  One count() job (parquet count-star) sizes the
    keep fraction.
    """
    total = emb.count()
    sel = emb.select(id_col, vec_col)
    if total > 4 * n:
        # keep_below such that E[kept] = 4n; P(kept < n) is
        # astronomically small (binomial tail at 4x the target)
        keep_below = int(4 * n / total * 2**32)
        hv = F.pmod(F.xxhash64(F.col(id_col)), F.lit(2**32))
        sel = sel.filter(hv < keep_below)
    rows = sel.orderBy(F.col(id_col).asc()).limit(n).collect()
    return np.array([r[1] for r in rows], dtype=np.float64)


def encode_pq(
    emb: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — narrow Arrow projection, no shuffle."""
    m, k, ds = books.shape
    books_b = books  # captured in the closure, shipped once per task

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for j in range(m):
                sub = mat[:, j * ds : (j + 1) * ds]
                cent = books_b[j]
                d2 = (
                    (sub * sub).sum(1)[:, None]
                    - 2.0 * (sub @ cent.T)
                    + (cent * cent).sum(1)[None, :]
                )
                codes[:, j] = d2.argmin(1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "codes": list(codes)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"{id_col} long, codes array<bigint>"
    )


def adc_candidates(
    encoded: DataFrame,
    books: np.ndarray,
    queries: list[tuple[int, list[float]]],
    r: int = 50,
    id_col: str = "vec_id",
    probe_cells: dict[int, "set[int]"] | None = None,
    cell_col: str = "cluster_id",
) -> DataFrame:
    """Top-r candidates per query by asymmetric distance (dot-product
    LUT): (query_id, id, adc).

    The kernel holds one m x k LUT per query and keeps only the local
    top-r per query per partition, so the shuffle into the final
    window rank carries r x partitions x queries rows — corpus size
    never appears in the exchange.

    ``probe_cells`` (the IVF x PQ composition) restricts each query to
    its probed coarse cells: rows whose ``cell_col`` is outside a
    query's cell set are skipped before any LUT lookup.  At rest the
    codes table is partitioned by the coarse cell
    (``sources/collection.py``), so this same predicate is parquet
    partition pruning — the ADC scan only ever reads the probed
    partitions' code bytes.
    """
    m, k, ds = books.shape
    luts = []
    qids = []
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        lut = np.empty((m, k), dtype=np.float64)
        for j in range(m):
            lut[j] = books[j] @ q[j * ds : (j + 1) * ds]
        luts.append(lut)
        qids.append(int(qid))
    luts_b = np.stack(luts)  # (Q, m, k)
    cells_b = (
        {int(q): np.asarray(sorted(c), dtype=np.int64) for q, c in
         probe_cells.items()}
        if probe_cells is not None
        else None
    )

    def kernel(batches):
        import pandas as pd

        best = None
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            ids = pdf[id_col].values
            cell_vals = (
                pdf[cell_col].values if cells_b is not None else None
            )
            frames = []
            for qi, qid in enumerate(qids):
                lut = luts_b[qi]
                if cells_b is not None:
                    keep = np.isin(cell_vals, cells_b.get(qid, ()))
                    if not keep.any():
                        continue
                    q_codes, q_ids = codes[keep], ids[keep]
                else:
                    q_codes, q_ids = codes, ids
                # sum of m LUT lookups per row
                scores = lut[
                    np.arange(q_codes.shape[1])[None, :], q_codes
                ].sum(1)
                # lexicographic (score desc, id asc) — the same total
                # order as the final window rank, so the per-batch cut
                # is deterministic even when ADC scores tie (duplicate
                # vectors share identical codes); a bare stable argsort
                # would keep ties in batch row order, which varies with
                # partition layout.
                top = np.lexsort((q_ids, -scores))[:r]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            id_col: q_ids[top],
                            "adc": scores[top],
                        }
                    )
                )
            cand = pd.concat(
                ([best] if best is not None else []) + frames,
                ignore_index=True,
            )
            best = (
                cand.sort_values(
                    ["adc", id_col], ascending=[False, True], kind="stable"
                )
                .groupby("query_id", sort=False)
                .head(r)
                .reset_index(drop=True)
            )
        if best is not None:
            yield best

    local = encoded.mapInPandas(
        kernel, schema=f"query_id long, {id_col} long, adc double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.col(id_col).asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= r)
        .drop("rank")
    )

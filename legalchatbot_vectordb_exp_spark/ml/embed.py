"""Batch text embedding as an Arrow-batched Pandas UDF.

The reference embeds the whole corpus with one
``SentenceTransformer.encode(texts)`` call and L2-normalizes
(``Qdrant/main.py:104``; query side ``Qdrant/llm.py:18-19``).  The
Spark shape: a ``pandas_udf`` whose batches are the Arrow transfer
unit — the model loads **once per executor process** (module-level
lazy singleton), then every batch is a vectorized ``encode`` call,
exactly the amortization the reference got from its single big batch.

sentence-transformers is not installed in this container, so the
model factory is pluggable: the default is a deterministic hash
embedder (md5-seeded pseudo-random unit vector per text) that keeps
the distributed plumbing real — batching, normalization, dimension
contract — and makes tests reproducible.  Swap ``set_model_factory``
with a SentenceTransformer loader in a GPU environment.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_DIM = 64  # matches the driver's embeddings table


class _HashEmbedder:
    """Deterministic stand-in for SentenceTransformer: md5(text) seeds
    a generator → fixed-dim unit vector.  Stable across processes."""

    def __init__(self, dim: int):
        self.dim = dim

    def encode(self, texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), self.dim), dtype=np.float64)
        for i, t in enumerate(texts):
            seed = int.from_bytes(
                hashlib.md5(t.encode("utf-8")).digest()[:8], "big"
            )
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(self.dim)
            n = math.sqrt(float((v * v).sum())) or 1.0
            out[i] = v / n
        return out


# per-executor model cache, keyed by dim — one UDF instance per dim may
# coexist in a process (a single global would silently serve the wrong
# dimensionality to later UDFs)
_MODELS: dict[int, object] = {}
_MODEL_FACTORY: Callable[[], object] | None = None


def set_model_factory(factory: Callable[[], object]) -> None:
    """Install a real model loader, e.g.
    ``lambda: SentenceTransformer('paraphrase-multilingual-MiniLM-L12-v2')``
    (the reference's model choice, ``Qdrant/main.py:94``)."""
    global _MODEL_FACTORY
    _MODEL_FACTORY = factory
    _MODELS.clear()


def _get_model(dim: int):
    if dim not in _MODELS:
        _MODELS[dim] = _MODEL_FACTORY() if _MODEL_FACTORY else _HashEmbedder(dim)
    return _MODELS[dim]


def embed_text_udf(dim: int = DEFAULT_DIM):
    """Returns a pandas_udf: text column → ARRAY<DOUBLE> unit vector.

    Iterator form so the per-executor model loads once, not per batch.
    """

    @pandas_udf("array<double>")
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = _get_model(dim)
        for texts in batches:
            vecs = model.encode(texts.fillna("").astype(str).tolist())
            arr = np.asarray(vecs, dtype=np.float64)
            # L2-normalize with the reference's zero-guard (or 1.0)
            norms = np.sqrt((arr * arr).sum(axis=1))
            norms[norms == 0.0] = 1.0
            arr = arr / norms[:, None]
            yield pd.Series(list(arr))

    return embed

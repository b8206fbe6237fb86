"""Build an N× stress corpus from a base testdata dir.

``documents`` and ``embeddings`` are replicated N times with shifted
ids (DuckDB ``SELECT * REPLACE`` — no JVM needed); every other table
is byte-copied so its parquet physical types (notably events'
TIMESTAMP(NANOS)) survive untouched.

``decorrelate=True`` (default) additionally ROTATES each embedding
replica's components by its replica index.  Exact replication makes
every replica set an LSH/cosine collision by construction, so
pair-listing queries' OUTPUT grows quadratically in the replication
factor no matter how good the bucketing is — that measures duplicate
volume, not algorithmic scaling.  Rotated unit vectors are distinct
directions, which is the fixture that answers "does candidate
generation stay ~linear in corpus rows".  Pass ``decorrelate=False``
to stress the duplicate-heavy case instead (what ``stress.py``'s
correctness sweeps use implicitly via exact text copies).

Usage:
    python stress_corpus.py BASE_SF_DIR OUT_DIR N

Also importable: ``build(base, out, n)`` (used by the shuffle-ceiling
stress test and ``stress_shuffle.py``).
"""

from __future__ import annotations

import os
import shutil
import sys

SCALED = {"documents": "doc_id", "embeddings": "vec_id"}

EMB_DIM = 64  # testdata embedding width (TESTDATA.md)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build(base: str, out: str, n: int, decorrelate: bool = True) -> str:
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t not in SCALED or n == 1:
            if os.path.abspath(src) != os.path.abspath(dst):
                shutil.copyfile(src, dst)
            continue
        key = SCALED[t]
        step = con.sql(
            f"SELECT max({key}) + 1 FROM '{src}'"
        ).fetchone()[0]

        def replica(i: int) -> str:
            reps = [f"{key} + {i * step} AS {key}"]
            if t == "embeddings" and decorrelate and i > 0:
                reps.append(
                    f"list_transform(range(1, {EMB_DIM} + 1), j -> "
                    f"embedding[1 + ((j - 1 + {i}) % {EMB_DIM})]) "
                    f"AS embedding"
                )
            return (
                f"SELECT * REPLACE ({', '.join(reps)}) FROM '{src}'"
            )

        union = "\nUNION ALL\n".join(replica(i) for i in range(n))
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
    con.close()
    return out


if __name__ == "__main__":
    base, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    build(base, out, n)
    print(f"built {n}x corpus at {out}")

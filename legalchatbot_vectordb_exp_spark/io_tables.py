"""Test-table loading for the driver's synthetic warehouse.

``/root/testdata/sf*/{name}.parquet`` — TPC-H-ish star schema plus
``events`` (stream-shaped), ``documents`` (text corpus) and
``embeddings`` (64-d unit vectors).  See TESTDATA.md.

The only quirk: ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark
cannot represent.  With ``spark.sql.legacy.parquet.nanosAsLong`` the
column arrives as BIGINT nanoseconds; we convert to TIMESTAMP_NTZ with
pure integer arithmetic (``div 1000`` — float division would lose
precision at 1.7e18) so the value is timezone-independent and matches
what DuckDB reads (nanos truncated to micros, naive timestamp).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes events.ts to TIMESTAMP_NTZ."""
    if name == "events":
        # settable at runtime; required before the scan's schema inference
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr(f"timestampadd(MICROSECOND, ts div 1000, {_EPOCH_NTZ})"),
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Guarantee kernel parallelism before a CPU-heavy per-row stage.

    A parquet scan parallelizes per row group; a small file written as a
    single row group (every ``/root/testdata`` table) arrives as ONE
    partition, so an explode + per-token hash kernel would run on one
    core of 32.  At production scale (many files / row groups) the scan
    is already parallel and this is a **no-op** — we only pay the
    (tiny) repartition shuffle when the upstream partitioning is
    narrower than the cluster, so the helper never introduces a
    full-data shuffle on a 100 TB input.
    """
    want = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Short-circuit on file count first: inputFiles() is a listing,
    # not a plan build.  Spark bin-packs small files into splits
    # (maxSplitBytes), so `n_files >= want` does NOT imply
    # `n_partitions >= want` near the boundary — e.g. 33 tiny files
    # with want=32 can pack 2-per-split (~17 partitions).  Packing can
    # at most halve the count right at that boundary, so only
    # short-circuit at >= 2*want files (round-3 review item); anything
    # narrower pays the precise `.rdd.getNumPartitions()` probe, which
    # converts the plan (no job, but not free on a hundred-table
    # pipeline — round-2 review nit).
    try:
        if len(df.inputFiles()) >= 2 * want:
            return df
    except Exception:
        pass  # non-file-backed plans: fall through to the precise probe
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)

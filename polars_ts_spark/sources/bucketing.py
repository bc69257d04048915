"""Bucketed-table writer + co-located join: the shuffle-elimination
path for repeated large-to-large joins (the prompt's "bucketing for
co-located joins" requirement; the reference has no analogue — it is a
single-node engine, so every join is already co-located).

Spark's bucketed tables pre-shuffle data at WRITE time: both sides of a
join bucketed by the same keys into the same bucket count scan
bucket-aligned splits, and the SortMergeJoin runs with ZERO runtime
Exchange. On a 1000-executor cluster joining two 100 TB fact tables on
``orderkey`` every night, the one-time bucketed write amortizes the
nightly O(200 TB) shuffle away — the single biggest cost in that plan.

``tests/test_sources.py`` asserts the physical plan of a bucketed join
contains a SortMergeJoin and no Exchange operator (with broadcast
disabled so the assertion is about bucketing, not table size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | tuple[str, ...],
    num_buckets: int = 32,
    path: str | None = None,
    sort_cols: list[str] | tuple[str, ...] | None = None,
) -> None:
    """Write ``df`` as a bucketed parquet table registered in the
    session catalog. ``sort_cols`` defaults to ``keys`` so the
    SortMergeJoin can also skip its per-partition sort on Spark
    versions that honor bucket-sorted scans."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, *keys)
        .sortBy(*(sort_cols or keys))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | tuple[str, ...],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.
    With both sides bucketed identically this plans as an
    exchange-free SortMergeJoin (bucket-aligned scans)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | tuple[str, ...],
    mode: str = "overwrite",
) -> None:
    """Write hive-style partitioned parquet (``path/col=value/...``).
    Scans over the result prune whole directories for predicates on the
    partition columns — at 100 TB a per-language or per-date consumer
    reads only its slice, no matter how wide the corpus is. The pruning
    is plan-asserted in tests/test_sources.py (PartitionFilters at the
    scan, zero data files read from other partitions)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)

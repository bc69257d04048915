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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | tuple[str, ...],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: the big side is salted with
    ``xxhash64(row) % salt`` (row-level, so one hot key spreads over
    ``salt`` shuffle partitions) and the small side is replicated once
    per salt value; the join runs on ``on + [__salt]`` and the result
    equals the plain join exactly.

    Use when ONE key dominates a large-to-medium join (a null-like
    sentinel id, a mega-customer) and the small side is too big to
    broadcast but cheap to replicate x salt. AQE's skew-join split
    covers sort-merge joins at runtime; explicit salting is the
    deterministic fallback when AQE cannot apply (e.g. under
    shuffle-hash hints or bucketed scans) or when the skew sits in the
    map-side agg feeding the join. Cost: small side x salt rows of
    shuffle — linear, chosen by the caller.
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "left", "left_outer", "leftsemi", "left_semi",
                   "leftanti", "left_anti"):
        # right/full joins would emit each UNMATCHED small-side row once
        # per salt value (the small side is replicated) — reject rather
        # than silently duplicate
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if salt < 1:
        # pmod(x, 0) is NULL and an empty salt array explodes to zero
        # rows — salt=0 would silently return an empty/unmatched join
        raise ValueError(f"salt must be >= 1, got {salt}")
    if "__salt" in big.columns or "__salt" in small.columns:
        raise ValueError("inputs already carry a __salt column; rename it "
                         "before salted_join (it would be overwritten)")
    keys = list(on)
    # the salt must vary WITHIN a key (a hash of the join keys would pin
    # each hot key to one salt value, spreading nothing) — derive it
    # from the row position; which salt a row gets is irrelevant to the
    # join result, so retry nondeterminism here is harmless
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    salts = F.array(*[F.lit(i) for i in range(salt)])
    s = small.withColumn("__salt", F.explode(salts))
    return b.join(s, [*keys, "__salt"], how).drop("__salt")

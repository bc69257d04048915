"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query smoke check at sf0.001
queries()      -> {name: (spark, sf_dir) -> DataFrame} per SURVEY §2 operator
oracle_sql()   -> {name: DuckDB SQL} equivalents for the correctness gate
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: supplier daily panel -> lag/rolling features -> naive
    forecast joined back with per-series forecast-quality metrics."""
    from polars_ts_spark.operators import baselines, features, metrics
    from polars_ts_spark.sources.datasets import supplier_daily_panel

    sf_dir = "/root/testdata/sf0.001"
    panel = supplier_daily_panel(spark, sf_dir)
    feat = features.rolling_features(
        features.lag_features(panel, [1, 7]), [7], ["mean", "std"], min_samples=1
    )
    fc = baselines.naive_forecast(panel, h=7)
    return fc.join(feat.groupBy("unique_id").count().withColumnRenamed("count", "n_obs"), "unique_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from polars_ts_spark.plans.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from polars_ts_spark.plans.registry import all_oracles

    return all_oracles()

"""Uniform per-series kernel runner (SURVEY §7 Phase 2).

``for_each_series`` is the one bridge from DataFrame-land to
whole-series numpy kernels: groupBy(id).applyInPandas with the group
sorted by time before the kernel sees it (Spark guarantees no intra-group
order; the reference relies on a prior global sort — we sort inside the
worker instead, SURVEY §4.2).

Scale notes: one shuffle on unique_id; each series must fit in one
executor task (panel series are bounded); Arrow batches both directions.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from polars_ts_spark.panel import ID, TIME, require_columns


def for_each_series(
    df: DataFrame,
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str,
    id_col: str = ID,
    time_col: str = TIME,
    sort: bool = True,
) -> DataFrame:
    """Apply ``kernel(pdf) -> pdf`` to each series, time-sorted."""
    require_columns(df, id_col, time_col)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if sort:
            pdf = pdf.sort_values(time_col, kind="mergesort").reset_index(drop=True)
        return kernel(pdf)

    # Explicit repartition by key: AQE coalesces the (byte-small) group
    # shuffle to a handful of partitions, which strangles the
    # CPU-heavy Python kernel stage (measured 8 tasks on a 32-core
    # box). A user-specified repartition is exempt from AQE coalescing
    # and the following groupBy reuses the distribution — same single
    # shuffle, full task parallelism.
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(n_parts, id_col).groupBy(id_col).applyInPandas(run, schema=schema)

"""Baseline forecasters (SURVEY §2.12) — pure DataFrame plans, no UDFs.

Reference parity: polars_ts/models/baselines.py (naive 17-65,
seasonal_naive 68-123, moving_average 126-178) and
models/_time_utils.py:15-30 (future grid = last_time + k·median_freq).

Output schema: [id_col, time_col, "y_hat"] exactly like the reference.

Scale notes: each forecaster is a lag-diff window + groupBy(id)
aggregate followed by a per-series fan-out via ``explode(sequence(1,
h))`` — the window and the aggregate share the hash(id) exchange, so
one shuffle total; rows out = n_series × h, broadcast-friendly
downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_ts_spark.panel import ID, TARGET, TIME, require_columns


_DIFF = "__ts_diff_s"


def _with_ts_diff(df: DataFrame, id_col: str, time_col: str) -> DataFrame:
    """Per-row inter-arrival seconds vs the previous observation of the
    same series (_time_utils.py:15-25). One window over (id, ds) — the
    diff multiset equals the sorted-timestamp-array diffs, so
    ``median(__ts_diff_s)`` in the subsequent aggregate reproduces
    ``_freq_agg`` while sorting each series once instead of once per
    expression reference."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(time_col)
    return df.withColumn(
        _DIFF,
        F.unix_timestamp(time_col) - F.unix_timestamp(F.lag(time_col).over(w)),
    )


def _freq_from_diff():
    """Aggregate companion of ``_with_ts_diff``: exact median of the
    inter-arrival seconds (null for the series' first row is ignored),
    86400 s fallback for single-observation series."""
    return F.expr(f"cast(coalesce(median({_DIFF}), 86400) as bigint)")


def _future_rows(grouped: DataFrame, h: int, id_col: str, time_col: str) -> DataFrame:
    """Fan out h future timestamps per series: last_time + k * freq where
    freq = median inter-arrival (seconds). Expects columns
    ``__last_ts`` (timestamp) and ``__freq_s`` (long seconds)."""
    return (
        grouped.select(
            "*",
            F.explode(F.sequence(F.lit(1), F.lit(h))).alias("__step"),
        )
        .withColumn(
            time_col,
            F.timestamp_seconds(
                F.unix_timestamp("__last_ts") + F.col("__step") * F.col("__freq_s")
            ),
        )
    )


def naive_forecast(
    df: DataFrame, h: int,
    id_col: str = ID, time_col: str = TIME, target_col: str = TARGET,
) -> DataFrame:
    """Repeat the last observed value h times (baselines.py:17-65)."""
    require_columns(df, id_col, time_col, target_col)
    g = _with_ts_diff(df, id_col, time_col).groupBy(id_col).agg(
        F.max_by(target_col, time_col).alias("__last_y"),
        F.max(time_col).alias("__last_ts"),
        _freq_from_diff().alias("__freq_s"),
    )
    return _future_rows(g, h, id_col, time_col).select(
        id_col, time_col, F.col("__last_y").cast("double").alias("y_hat")
    )


def seasonal_naive_forecast(
    df: DataFrame, h: int, season_length: int,
    id_col: str = ID, time_col: str = TIME, target_col: str = TARGET,
) -> DataFrame:
    """Cycle the last ``season_length`` observed values
    (baselines.py:68-123): ŷ_{T+k} = y_{T - m + ((k-1) mod m)}."""
    require_columns(df, id_col, time_col, target_col)
    m = season_length
    tail = F.slice(
        F.sort_array(F.collect_list(F.struct(F.col(time_col).alias("t"), F.col(target_col).alias("v")))),
        -m, m,
    )
    g = _with_ts_diff(df, id_col, time_col).groupBy(id_col).agg(
        F.expr(f"transform(slice(sort_array(collect_list(struct({time_col} as t, {target_col} as v))), -{m}, {m}), s -> s.v)").alias("__tail"),
        F.max(time_col).alias("__last_ts"),
        _freq_from_diff().alias("__freq_s"),
    )
    fanned = _future_rows(g, h, id_col, time_col)
    # element_at is 1-based; tail has exactly m elements (series shorter than
    # m cycle over what exists, like the reference's modular indexing)
    pick = F.element_at(
        F.col("__tail"),
        ((F.col("__step") - 1) % F.least(F.lit(m), F.size("__tail"))).cast("int") + 1,
    )
    return fanned.select(id_col, time_col, pick.cast("double").alias("y_hat"))


def moving_average_forecast(
    df: DataFrame, h: int, window: int,
    id_col: str = ID, time_col: str = TIME, target_col: str = TARGET,
) -> DataFrame:
    """Flat forecast = mean of the last ``window`` values
    (baselines.py:126-178)."""
    require_columns(df, id_col, time_col, target_col)
    tail_mean = F.expr(
        "aggregate("
        f"  transform(slice(sort_array(collect_list(struct({time_col} as t, {target_col} as v))), -{window}, {window}), s -> s.v),"
        "  cast(0.0 as double), (acc, x) -> acc + x, acc -> acc / "
        f"  size(slice(sort_array(collect_list(struct({time_col} as t, {target_col} as v))), -{window}, {window})))"
    )
    g = _with_ts_diff(df, id_col, time_col).groupBy(id_col).agg(
        tail_mean.alias("__ma"),
        F.max(time_col).alias("__last_ts"),
        _freq_from_diff().alias("__freq_s"),
    )
    return _future_rows(g, h, id_col, time_col).select(
        id_col, time_col, F.col("__ma").cast("double").alias("y_hat")
    )

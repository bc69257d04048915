"""Seasonal decomposition (SURVEY §2.10) — pure window/group expressions.

Reference parity: polars_ts/decomposition/seasonal_decomposition.py:8-105
(classical moving-average decomposition) and
seasonal_decompose_features.py:16-120 (strength features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_ts_spark.panel import ID, TARGET, TIME, require_columns, series_window


def seasonal_decomposition(
    df: DataFrame,
    freq: int,
    method: str = "additive",
    anomaly_threshold: float | None = None,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Classical decomposition (seasonal_decomposition.py:8-105):

    - trend   = centered rolling mean over ``freq`` rows
      (rowsBetween(-freq//2, freq//2), :66)
    - detrend = y - trend (additive) or y / trend (multiplicative)
    - seasonal = mean of detrended by phase (row_index mod freq),
      re-centered so the seasonal component sums to ~0 (or ~1) (:71-75)
    - resid = y - trend - seasonal (or y / (trend·seasonal))
    - optional ``is_anomaly`` = |resid| > threshold·std(resid) (:100-104)
    """
    require_columns(df, id_col, time_col, target_col)
    if method not in ("additive", "multiplicative"):
        raise ValueError(f"unknown method {method!r}")
    w = series_window(id_col, time_col)
    y = F.col(target_col)
    half = freq // 2
    trend = F.avg(y).over(w.rowsBetween(-half, half))
    out = df.withColumn("trend", trend)
    out = out.withColumn(
        "__phase", (F.row_number().over(w) - F.lit(1)) % F.lit(freq)
    )
    detr = (y - F.col("trend")) if method == "additive" else (y / F.col("trend"))
    out = out.withColumn("__detrended", detr)
    phase_w = Window.partitionBy(id_col, "__phase")
    series_w = Window.partitionBy(id_col)
    raw_seasonal = F.avg("__detrended").over(phase_w)
    out = out.withColumn("__raw_seasonal", raw_seasonal)
    # re-center: subtract (divide by) the mean of the per-phase means so the
    # seasonal component averages 0 (1). avg of distinct phase means == avg
    # over one representative row per phase; using avg over all rows is only
    # identical for complete cycles — use mean of per-phase means explicitly.
    phase_mean_of_means = F.avg(
        F.when(F.row_number().over(Window.partitionBy(id_col, "__phase").orderBy(time_col)) == 1,
               F.col("__raw_seasonal"))
    ).over(series_w)
    if method == "additive":
        seasonal = F.col("__raw_seasonal") - phase_mean_of_means
    else:
        seasonal = F.col("__raw_seasonal") / phase_mean_of_means
    out = out.withColumn("seasonal", seasonal)
    if method == "additive":
        resid = y - F.col("trend") - F.col("seasonal")
    else:
        resid = y / (F.col("trend") * F.col("seasonal"))
    out = out.withColumn("resid", resid)
    if anomaly_threshold is not None:
        rs = F.stddev_samp("resid").over(series_w)
        center = F.lit(0.0) if method == "additive" else F.lit(1.0)
        out = out.withColumn(
            "is_anomaly", F.abs(F.col("resid") - center) > F.lit(anomaly_threshold) * rs
        )
    return out.drop("__phase", "__detrended", "__raw_seasonal")


def seasonal_decompose_features(
    df: DataFrame,
    freq: int,
    method: str = "additive",
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Per-series strength features (seasonal_decompose_features.py:16-120):
    trend_strength = max(0, 1 - Var(resid)/Var(trend + resid)),
    seasonal_strength = max(0, 1 - Var(resid)/Var(seasonal + resid)),
    resid_var."""
    dec = seasonal_decomposition(df, freq, method, None, id_col, time_col, target_col)
    return dec.groupBy(id_col).agg(
        F.greatest(
            F.lit(0.0),
            F.lit(1.0) - F.var_samp("resid") / F.var_samp(F.col("trend") + F.col("resid")),
        ).alias("trend_strength"),
        F.greatest(
            F.lit(0.0),
            F.lit(1.0) - F.var_samp("resid") / F.var_samp(F.col("seasonal") + F.col("resid")),
        ).alias("seasonal_strength"),
        F.var_samp("resid").alias("resid_var"),
    )


def fourier_decomposition(
    df: DataFrame,
    period: float = 7.0,
    n_harmonics: int = 3,
    trend_window: int | None = None,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Fourier-OLS decomposition (decomposition/fourier_decomposition.py:12-180):
    trend = centered moving average; seasonal = per-series least-squares
    fit of sin/cos harmonics of the within-series index on the detrended
    values; residual = remainder. Output adds trend/seasonal/residual.

    The per-series OLS runs in applyInPandas (the reference delegates to
    polars-ds lstsq); the design matrix is (n x 2K), normal equations
    solved exactly per series."""
    import numpy as np
    import pandas as pd

    from polars_ts_spark.operators.kernel import for_each_series

    w = trend_window or int(period)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[target_col].to_numpy(dtype=float)
        n = len(y)
        trend = pd.Series(y).rolling(w, min_periods=1, center=True).mean().to_numpy()
        detr = y - trend
        t = np.arange(n, dtype=float)
        cols = []
        for k in range(1, n_harmonics + 1):
            ang = 2.0 * np.pi * k * t / period
            cols.append(np.sin(ang))
            cols.append(np.cos(ang))
        X = np.column_stack(cols) if cols else np.zeros((n, 0))
        if X.shape[1] and n > X.shape[1]:
            beta, *_ = np.linalg.lstsq(X, detr, rcond=None)
            seasonal = X @ beta
        else:
            seasonal = np.zeros(n)
        return pd.DataFrame({
            id_col: pdf[id_col], time_col: pdf[time_col], target_col: y,
            "trend": trend, "seasonal": seasonal, "residual": y - trend - seasonal,
        })

    schema = (
        f"{id_col} string, {time_col} timestamp, {target_col} double, "
        "trend double, seasonal double, residual double"
    )
    return for_each_series(df, kern, schema, id_col=id_col)

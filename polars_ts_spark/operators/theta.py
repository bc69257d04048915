"""Theta-method forecast and the SCUM-style auto-model ensemble
(SURVEY §2.12).

Reference parity:
- SCUM -> polars_ts/models/scum.py:10-68 (mean ensemble of four
  statsforecast auto models; ours averages auto_arima, SES and Theta —
  the members available in-container)
- theta: the classical decomposition used inside DynamicOptimizedTheta
  (scum.py member): SES on the theta=2 line + linear drift.

Per-series applyInPandas; members run in the SAME worker pass (one
shuffle total, not one per member).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from polars_ts_spark.operators.arima import arima_forecast_series, auto_arima_series
from polars_ts_spark.operators.kernel import for_each_series
from polars_ts_spark.panel import ID, TARGET, TIME


def theta_forecast_series(y: np.ndarray, h: int, alpha: float = 0.3) -> np.ndarray:
    """Classical Theta(0,2): average of the linear-trend line (theta=0)
    and SES on the theta=2 line, drift-corrected."""
    y = np.asarray(y, float)
    n = len(y)
    t = np.arange(n, dtype=float)
    # theta=0 line: OLS trend
    A = np.column_stack([t, np.ones(n)])
    (b, a), *_ = np.linalg.lstsq(A, y, rcond=None)
    trend_fc = a + b * (n + np.arange(h))
    # theta=2 line: 2y - trend, smoothed by SES
    theta2 = 2 * y - (a + b * t)
    level = theta2[0]
    for v in theta2[1:]:
        level = alpha * v + (1 - alpha) * level
    ses_fc = np.full(h, level)
    return 0.5 * (trend_fc + ses_fc)


DOT_THETA_GRID = [1.0 + 0.25 * j for j in range(17)]   # 1.0 .. 5.0
DOT_ALPHA_GRID = [j / 20.0 for j in range(1, 20)]      # 0.05 .. 0.95


def dot_forecast_series(y: np.ndarray, h: int, optimizer: str = "nm") -> np.ndarray:
    """Dynamic Optimized Theta (scum.py:15 member; Fiorucci et al.
    OTM): forecast = (1/θ)·SES(Z(θ)) + (1−1/θ)·trend-line, with both θ
    and the SES α optimized by one-step in-sample SSE. θ=2, α=0.3
    recovers the classical method above. The trend line is the
    covariance-formula OLS (b = Σ(t-t̄)(y-ȳ)/Σ(t-t̄)², a = ȳ - b·t̄ —
    engine-replicable, unlike LAPACK lstsq). ``optimizer="grid"``
    sweeps the fixed θ×α grids theta-major with strict-improvement
    first-win ties — SQL-replayable."""
    from polars_ts_spark.functions.numutils import nelder_mead

    y = np.asarray(y, float)
    n = len(y)
    if n < 4:
        return np.full(h, y[-1] if n else np.nan)
    t = np.arange(n, dtype=float)
    tbar = t.mean()
    ybar = y.mean()
    b = float(((t - tbar) * (y - ybar)).sum() / ((t - tbar) ** 2).sum())
    a = ybar - b * tbar
    line = a + b * t

    def run(theta, alpha, horizon=0):
        Z = theta * y + (1 - theta) * line
        level = Z[0]
        sse = 0.0
        for i in range(1, n):
            pred = (1 / theta) * level + (1 - 1 / theta) * line[i]
            sse += (y[i] - pred) ** 2
            level = alpha * Z[i] + (1 - alpha) * level
        fc = (1 / theta) * np.full(horizon, level) + \
            (1 - 1 / theta) * (a + b * (n + np.arange(horizon)))
        return sse, fc

    def obj(p):
        theta, alpha = p
        if not (1.0 <= theta <= 5.0 and 0.0 < alpha < 1.0):
            return 1e12
        sse, _ = run(theta, alpha)
        return sse if np.isfinite(sse) else 1e12

    if optimizer == "grid":
        best = (np.inf, 2.0, 0.3)
        for th in DOT_THETA_GRID:
            for al in DOT_ALPHA_GRID:
                sse, _ = run(th, al)
                if sse < best[0]:
                    best = (sse, th, al)
        _, fc = run(best[1], best[2], horizon=h)
        return fc
    p, _ = nelder_mead(obj, np.array([2.0, 0.3]), max_iter=200)
    theta = float(np.clip(p[0], 1.0, 5.0))
    alpha = float(np.clip(p[1], 1e-6, 1 - 1e-6))
    _, fc = run(theta, alpha, horizon=h)
    return fc


def theta_forecast(
    df: DataFrame, h: int = 7, alpha: float = 0.3,
    id_col: str = ID, time_col: str = TIME, target_col: str = TARGET,
) -> DataFrame:
    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[target_col].to_numpy(dtype=float)
        ts = pd.to_datetime(pdf[time_col])
        freq = ts.diff().dropna().median() if len(ts) > 1 else pd.Timedelta(days=1)
        fc = theta_forecast_series(y, h, alpha)
        fut = [ts.iloc[-1] + (i + 1) * freq for i in range(h)]
        return pd.DataFrame({id_col: pdf[id_col].iloc[0], time_col: fut, "y_hat": fc})

    schema = f"{id_col} string, {time_col} timestamp, y_hat double"
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)


def scum_forecast(
    df: DataFrame, h: int = 7, season_length: int = 0,
    optimizer: str = "nm", max_q: int = 1,
    id_col: str = ID, time_col: str = TIME, target_col: str = TARGET,
) -> DataFrame:
    """SCUM mean ensemble (scum.py:10-68): the reference averages
    AutoARIMA + AutoETS + AutoCES + DynamicOptimizedTheta — here the
    from-scratch equivalents (seasonal auto-ARIMA grid, SSE-optimized
    ETS variant selection, CES state-space recursion, optimized-theta),
    all fitted in one worker pass per series. ``optimizer="grid"``
    (with ``max_q=0``) swaps every member's Nelder-Mead / MLE search
    for fixed-grid and closed-form estimators so the full ensemble
    trajectory is engine-replicable (the GARCH grid-QMLE pattern);
    the default keeps the optimizer searches."""
    from polars_ts_spark.operators.ets import auto_ets_series, ces_series

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[target_col].to_numpy(dtype=float)
        ts = pd.to_datetime(pdf[time_col])
        freq = ts.diff().dropna().median() if len(ts) > 1 else pd.Timedelta(days=1)
        members = []
        arima_method = "css" if optimizer == "grid" else "mle"
        if len(y) >= 12:
            order, seas = auto_arima_series(y, max_p=2, max_d=1, max_q=max_q,
                                            s=season_length)
            if any(seas[:3]):
                from polars_ts_spark.operators.arima import sarima_forecast_series
                members.append(sarima_forecast_series(y, order, seas, h,
                                                      method=arima_method))
            else:
                members.append(arima_forecast_series(y, *order, h,
                                                     method=arima_method))
        members.append(auto_ets_series(y, h, season_length, optimizer=optimizer))
        members.append(ces_series(y, h, optimizer=optimizer))
        members.append(dot_forecast_series(y, h, optimizer=optimizer))
        fc = np.mean(members, axis=0)
        fut = [ts.iloc[-1] + (i + 1) * freq for i in range(h)]
        return pd.DataFrame({id_col: pdf[id_col].iloc[0], time_col: fut, "y_hat": fc})

    schema = f"{id_col} string, {time_col} timestamp, y_hat double"
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)

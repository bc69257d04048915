"""ARIMA family (SURVEY §2.12) — hand-rolled numpy (no statsmodels in
the container): AR via exact OLS, ARMA via conditional-sum-of-squares
+ Nelder-Mead, ARIMA by differencing, auto_arima by AIC grid.

Reference parity:
- arima_fit / arima_forecast -> polars_ts/models/arima.py:95-182
  (statsmodels SARIMAX per group; ours is a CSS ARMA core)
- auto_arima                 -> polars_ts/models/arima.py:22-87
  (statsforecast AutoARIMA; ours is an AIC grid over small (p,d,q))

Spark mapping: per-series `applyInPandas` (SURVEY §3.3 pattern); fits
are embarrassingly parallel across series. Fitted parameters return as
DataFrame rows (state-as-data)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from polars_ts_spark.functions.numutils import nelder_mead
from polars_ts_spark.operators.kernel import for_each_series
from polars_ts_spark.panel import ID, TARGET, TIME


def _css_resid(y: np.ndarray, phi: np.ndarray, theta: np.ndarray, c: float) -> np.ndarray:
    """Conditional-sum-of-squares residuals for ARMA(p,q)."""
    p, q = len(phi), len(theta)
    n = len(y)
    e = np.zeros(n)
    for t in range(n):
        ar = sum(phi[i] * y[t - 1 - i] for i in range(p) if t - 1 - i >= 0)
        ma = sum(theta[j] * e[t - 1 - j] for j in range(q) if t - 1 - j >= 0)
        e[t] = y[t] - c - ar - ma
    return e


def arma_fit_series(y: np.ndarray, p: int = 1, q: int = 0):
    """CSS ARMA fit. Returns (c, phi, theta, sigma2, aic)."""
    y = np.asarray(y, float)
    n = len(y)
    if p == 0 and q == 0:
        c = float(y.mean())
        rss = float(((y - c) ** 2).sum())
        sigma2 = rss / n
        aic = n * np.log(max(sigma2, 1e-300)) + 2 * 2
        return c, np.empty(0), np.empty(0), sigma2, float(aic)
    if q == 0:
        # exact OLS for pure AR
        X = np.column_stack([y[p - 1 - i : n - 1 - i] for i in range(p)] + [np.ones(n - p)])
        t_ = y[p:]
        coef, *_ = np.linalg.lstsq(X, t_, rcond=None)
        phi, c = coef[:p], float(coef[p])
        e = t_ - X @ coef
        sigma2 = float((e ** 2).mean())
        k = p + 2
        aic = (n - p) * np.log(max(sigma2, 1e-300)) + 2 * k
        return c, phi, np.empty(0), sigma2, float(aic)

    def obj(params):
        c = params[0]
        phi = params[1 : 1 + p]
        theta = params[1 + p : 1 + p + q]
        if np.any(np.abs(phi) > 2) or np.any(np.abs(theta) > 2):
            return 1e12
        e = _css_resid(y, phi, theta, c)
        return float((e ** 2).sum())

    x0 = np.concatenate([[y.mean() * 0.1], np.full(p, 0.1), np.full(q, 0.1)])
    best, rss = nelder_mead(obj, x0, max_iter=400)
    c = float(best[0])
    phi = best[1 : 1 + p]
    theta = best[1 + p : 1 + p + q]
    sigma2 = rss / n
    k = p + q + 2
    aic = n * np.log(max(sigma2, 1e-300)) + 2 * k
    return c, phi, theta, sigma2, float(aic)


def arma_forecast_series(
    y: np.ndarray, c: float, phi: np.ndarray, theta: np.ndarray, h: int
) -> np.ndarray:
    p, q = len(phi), len(theta)
    e = _css_resid(y, phi, theta, c) if (p or q) else np.zeros(len(y))
    hist = list(y)
    errs = list(e)
    out = np.empty(h)
    for s in range(h):
        ar = sum(phi[i] * hist[-1 - i] for i in range(p) if len(hist) > i)
        ma = sum(theta[j] * errs[-1 - j] for j in range(q) if len(errs) > j)
        y_next = c + ar + ma
        out[s] = y_next
        hist.append(y_next)
        errs.append(0.0)  # future shocks have expectation 0
    return out


def arima_forecast_series(y: np.ndarray, p: int, d: int, q: int, h: int) -> np.ndarray:
    """Difference d times -> ARMA forecast -> integrate back."""
    y = np.asarray(y, float)
    heads = []
    w = y
    for _ in range(d):
        heads.append(w[-1])  # last value at this integration level
        w = np.diff(w)
    c, phi, theta, _, _ = arma_fit_series(w, p, q)
    fc = arma_forecast_series(w, c, phi, theta, h)
    for head in reversed(heads):
        fc = head + np.cumsum(fc)
    return fc


def _lag1_autocorr(y: np.ndarray) -> float:
    y = np.asarray(y, float)
    d = y - y.mean()
    denom = float((d * d).sum())
    if denom == 0:
        return 0.0
    return float((d[1:] * d[:-1]).sum() / denom)


def auto_arima_series(y: np.ndarray, max_p: int = 3, max_d: int = 1, max_q: int = 1):
    """d chosen first by a unit-root heuristic (difference while the
    lag-1 autocorrelation is ~1 — AICs are NOT comparable across
    different differencing orders), then AIC grid over (p, q); the
    standard auto-ARIMA structure (arima.py:22-87 semantics)."""
    y = np.asarray(y, float)
    d = 0
    w = y
    while d < max_d and len(w) > 10 and _lag1_autocorr(w) > 0.95:
        w = np.diff(w)
        d += 1
    best = (np.inf, (0, d, 0))
    for p in range(max_p + 1):
        for q in range(max_q + 1):
            if p == 0 and q == 0 and d == 0:
                continue
            try:
                *_, aic = arma_fit_series(w, p, q)
            except np.linalg.LinAlgError:
                continue
            if aic < best[0]:
                best = (aic, (p, d, q))
    return best[1]


def arima_forecast(
    df: DataFrame,
    h: int = 7,
    order: tuple[int, int, int] = (1, 1, 0),
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Per-series ARIMA(p,d,q) forecast -> [id, ds, y_hat]."""
    p, d, q = order

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[target_col].to_numpy(dtype=float)
        ts = pd.to_datetime(pdf[time_col])
        freq = ts.diff().dropna().median() if len(ts) > 1 else pd.Timedelta(days=1)
        if len(y) < p + d + q + 5:
            fc = np.full(h, y[-1] if len(y) else np.nan)
        else:
            fc = arima_forecast_series(y, p, d, q, h)
        fut = [ts.iloc[-1] + (i + 1) * freq for i in range(h)]
        return pd.DataFrame({id_col: pdf[id_col].iloc[0], time_col: fut, "y_hat": fc})

    schema = f"{id_col} string, {time_col} timestamp, y_hat double"
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)


def auto_arima(
    df: DataFrame,
    h: int = 7,
    max_p: int = 2,
    max_d: int = 1,
    max_q: int = 1,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Per-series AIC-selected ARIMA forecast -> [id, ds, y_hat, p, d, q]."""

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[target_col].to_numpy(dtype=float)
        ts = pd.to_datetime(pdf[time_col])
        freq = ts.diff().dropna().median() if len(ts) > 1 else pd.Timedelta(days=1)
        if len(y) < 12:
            order = (0, 1, 0)
        else:
            order = auto_arima_series(y, max_p, max_d, max_q)
        fc = arima_forecast_series(y, *order, h)
        fut = [ts.iloc[-1] + (i + 1) * freq for i in range(h)]
        return pd.DataFrame({
            id_col: pdf[id_col].iloc[0], time_col: fut, "y_hat": fc,
            "p": order[0], "d": order[1], "q": order[2],
        })

    schema = f"{id_col} string, {time_col} timestamp, y_hat double, p int, d int, q int"
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)

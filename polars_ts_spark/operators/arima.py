"""ARIMA family (SURVEY §2.12) — hand-rolled numpy (no statsmodels in
the container): AR via exact OLS, ARMA via conditional-sum-of-squares
+ Nelder-Mead, ARIMA by differencing, seasonal SARIMA(p,d,q)(P,D,Q,s)
by multiplicative-polynomial expansion over the seasonally+regularly
differenced series, auto_arima by AIC grid over both regular and
seasonal orders.

Reference parity:
- arima_fit / arima_forecast -> polars_ts/models/arima.py:95-182
  (statsmodels SARIMAX per group, incl. seasonal_order; ours is a CSS
  SARMA core: phi(B)·Phi(B^s) expanded to one lag polynomial, same for
  theta(B)·Theta(B^s), then the standard CSS recursion)
- auto_arima                 -> polars_ts/models/arima.py:22-87
  (statsforecast AutoARIMA; ours picks d by unit-root heuristic, D by
  seasonal-autocorrelation heuristic, then an AIC grid over
  (p,q)×(P,Q))

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


# ---------------------------------------------------------------------------
# seasonal SARIMA(p,d,q)(P,D,Q,s)


def _expand_seasonal(coef: np.ndarray, seas: np.ndarray, s: int) -> np.ndarray:
    """Multiply the lag polynomials (1 - sum coef_i B^i) and
    (1 - sum seas_j B^{s·j}); return the combined coefficient vector a
    with a[k-1] multiplying lag k in y_t = c + sum a_k y_{t-k} + ...
    (i.e. 1 - sum a_k B^k = product of the two polynomials)."""
    pa = np.concatenate([[1.0], -np.asarray(coef, float)])
    pb = np.zeros(s * len(seas) + 1)
    pb[0] = 1.0
    for j, v in enumerate(np.asarray(seas, float), start=1):
        pb[s * j] = -v
    prod = np.convolve(pa, pb)
    return -prod[1:]


def sarma_fit_series(y: np.ndarray, p: int, q: int, P: int = 0, Q: int = 0,
                     s: int = 0):
    """CSS fit of the multiplicative SARMA(p,q)(P,Q,s) on a stationary
    series. Returns (c, phi, theta, Phi, Theta, sigma2, aic)."""
    y = np.asarray(y, float)
    n = len(y)
    if P == 0 and Q == 0:
        c, phi, theta, sigma2, aic = arma_fit_series(y, p, q)
        return c, phi, theta, np.empty(0), np.empty(0), sigma2, aic

    # MA sign convention: _expand_seasonal builds coefficients for
    # (1 - sum a B^k); the MA side is (1 + theta B)(1 + Theta B^s) =
    # (1 - sum(-theta) B)(1 - sum(-Theta) B^s) -> expand with negated args
    def obj(params):
        c = params[0]
        phi = params[1:1 + p]
        theta = params[1 + p:1 + p + q]
        Phi = params[1 + p + q:1 + p + q + P]
        Theta = params[1 + p + q + P:1 + p + q + P + Q]
        if (np.any(np.abs(phi) > 2) or np.any(np.abs(theta) > 2)
                or np.any(np.abs(Phi) > 2) or np.any(np.abs(Theta) > 2)):
            return 1e12
        phi_full = _expand_seasonal(phi, Phi, s)
        theta_full = -_expand_seasonal(-theta, -Theta, s)
        e = _css_resid(y, phi_full, theta_full, c)
        return float((e ** 2).sum())

    k = 1 + p + q + P + Q
    x0 = np.concatenate([[y.mean() * 0.1], np.full(k - 1, 0.1)])
    best, rss = nelder_mead(obj, x0, max_iter=600)
    c = float(best[0])
    phi = best[1:1 + p]
    theta = best[1 + p:1 + p + q]
    Phi = best[1 + p + q:1 + p + q + P]
    Theta = best[1 + p + q + P:1 + p + q + P + Q]
    sigma2 = rss / n
    aic = n * np.log(max(sigma2, 1e-300)) + 2 * (k + 1)
    return c, phi, theta, Phi, Theta, sigma2, float(aic)


def _seasonal_diff(w: np.ndarray, s: int) -> tuple[np.ndarray, np.ndarray]:
    """One lag-s difference; returns (differenced, tail) where tail is
    the last s values of the input (needed to integrate back)."""
    return w[s:] - w[:-s], w[-s:].copy()


def sarima_forecast_series(
    y: np.ndarray,
    order: tuple[int, int, int],
    seasonal_order: tuple[int, int, int, int],
    h: int,
) -> np.ndarray:
    """Seasonal-difference D times at lag s, regular-difference d times,
    CSS-fit the SARMA, forecast, integrate back in reverse order."""
    p, d, q = order
    P, D, Q, s = seasonal_order
    y = np.asarray(y, float)
    w = y
    seas_tails: list[np.ndarray] = []
    for _ in range(D):
        w, tail = _seasonal_diff(w, s)
        seas_tails.append(tail)
    heads = []
    for _ in range(d):
        heads.append(w[-1])
        w = np.diff(w)
    c, phi, theta, Phi, Theta, _, _ = sarma_fit_series(w, p, q, P, Q, s)
    phi_full = _expand_seasonal(phi, Phi, s) if (P and s) else phi
    theta_full = -_expand_seasonal(-theta, -Theta, s) if (Q and s) else theta
    fc = arma_forecast_series(w, c, phi_full, theta_full, h)
    for head in reversed(heads):
        fc = head + np.cumsum(fc)
    for tail in reversed(seas_tails):
        out = np.empty(h)
        hist = list(tail)  # last s values at this integration level
        for i in range(h):
            out[i] = fc[i] + hist[-s]
            hist.append(out[i])
        fc = out
    return fc


def _seasonal_autocorr(y: np.ndarray, s: int) -> float:
    y = np.asarray(y, float)
    if len(y) <= s:
        return 0.0
    d = y - y.mean()
    denom = float((d * d).sum())
    if denom == 0:
        return 0.0
    return float((d[s:] * d[:-s]).sum() / denom)


def _lag1_autocorr(y: np.ndarray) -> float:
    y = np.asarray(y, float)
    d = y - y.mean()
    denom = float((d * d).sum())
    if denom == 0:
        return 0.0
    return float((d[1:] * d[:-1]).sum() / denom)


def auto_arima_series(y: np.ndarray, max_p: int = 3, max_d: int = 1, max_q: int = 1,
                      s: int = 0, max_P: int = 1, max_D: int = 1, max_Q: int = 1):
    """Differencing orders chosen first by heuristics (D while the
    seasonal autocorrelation is strong, then d while the lag-1
    autocorrelation is ~1 — AICs are NOT comparable across different
    differencing orders), then AIC grid over (p,q)×(P,Q); the standard
    auto-ARIMA structure (arima.py:22-87 semantics). Returns
    ((p,d,q), (P,D,Q,s))."""
    y = np.asarray(y, float)
    w = y
    D = 0
    if s > 1:
        while D < max_D and len(w) > 3 * s and _seasonal_autocorr(w, s) > 0.9:
            w, _ = _seasonal_diff(w, s)
            D += 1
    d = 0
    while d < max_d and len(w) > 10 and _lag1_autocorr(w) > 0.95:
        w = np.diff(w)
        d += 1
    seas_grid = (
        [(P, Q) for P in range(max_P + 1) for Q in range(max_Q + 1)]
        if s > 1 and len(w) > 3 * s else [(0, 0)]
    )
    best = (np.inf, (0, d, 0), (0, D, 0, s))
    for p in range(max_p + 1):
        for q in range(max_q + 1):
            for P, Q in seas_grid:
                if p == 0 and q == 0 and P == 0 and Q == 0 and d == 0 and D == 0:
                    continue
                try:
                    *_, aic = sarma_fit_series(w, p, q, P, Q, s)
                except np.linalg.LinAlgError:
                    continue
                if aic < best[0]:
                    best = (aic, (p, d, q), (P, D, Q, s))
    return best[1], best[2]


def arima_forecast(
    df: DataFrame,
    h: int = 7,
    order: tuple[int, int, int] = (1, 1, 0),
    seasonal_order: tuple[int, int, int, int] = (0, 0, 0, 0),
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Per-series SARIMA(p,d,q)(P,D,Q,s) forecast -> [id, ds, y_hat]
    (ref models/arima.py:95-182 exposes the same two order tuples)."""
    p, d, q = order
    P, D, Q, s = seasonal_order
    min_n = p + d + q + 5 + (P + D + Q) * max(s, 1)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[target_col].to_numpy(dtype=float)
        ts = pd.to_datetime(pdf[time_col])
        freq = ts.diff().dropna().median() if len(ts) > 1 else pd.Timedelta(days=1)
        if len(y) < min_n:
            fc = np.full(h, y[-1] if len(y) else np.nan)
        elif P or D or Q:
            fc = sarima_forecast_series(y, order, seasonal_order, h)
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
    season_length: int = 0,
    max_P: int = 1,
    max_D: int = 1,
    max_Q: int = 1,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Per-series AIC-selected (S)ARIMA forecast ->
    [id, ds, y_hat, p, d, q, P, D, Q]. ``season_length`` <= 1 keeps the
    non-seasonal grid."""

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[target_col].to_numpy(dtype=float)
        ts = pd.to_datetime(pdf[time_col])
        freq = ts.diff().dropna().median() if len(ts) > 1 else pd.Timedelta(days=1)
        if len(y) < 12:
            order, seas = (0, 1, 0), (0, 0, 0, season_length)
        else:
            order, seas = auto_arima_series(
                y, max_p, max_d, max_q, season_length, max_P, max_D, max_Q
            )
        if any(seas[:3]):
            fc = sarima_forecast_series(y, order, seas, h)
        else:
            fc = arima_forecast_series(y, *order, h)
        fut = [ts.iloc[-1] + (i + 1) * freq for i in range(h)]
        return pd.DataFrame({
            id_col: pdf[id_col].iloc[0], time_col: fut, "y_hat": fc,
            "p": order[0], "d": order[1], "q": order[2],
            "P": seas[0], "D": seas[1], "Q": seas[2],
        })

    schema = (f"{id_col} string, {time_col} timestamp, y_hat double, "
              "p int, d int, q int, P int, D int, Q int")
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)

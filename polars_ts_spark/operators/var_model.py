"""VAR(p) estimation, forecasting and Granger causality
(SURVEY §2.17).

Reference parity:
- var_fit / var_forecast -> polars_ts/var_model.py:23-148 (OLS normal
  equations on the lag-design matrix, single multivariate series)
- granger_causality      -> polars_ts/var_model.py:149-218 (F-test of
  restricted vs full regression)

Spark mapping: a single multivariate series is driver-scale numpy (the
reference's shape); the panel-level entry point fits ONE VAR PER
SERIES GROUP via applyInPandas when an id column is present —
distribution across series, numpy within.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from polars_ts_spark.functions.numutils import f_sf
from polars_ts_spark.operators.kernel import for_each_series
from polars_ts_spark.panel import ID, TIME


def _lag_design(Y: np.ndarray, p: int):
    """Design matrix [1, y_{t-1}, ..., y_{t-p}] and targets Y_t."""
    n, k = Y.shape
    rows = n - p
    X = np.ones((rows, 1 + k * p))
    for lag in range(1, p + 1):
        X[:, 1 + (lag - 1) * k : 1 + lag * k] = Y[p - lag : n - lag]
    return X, Y[p:]


def var_fit_arrays(Y: np.ndarray, p: int = 1):
    """OLS VAR(p): coefficient matrix B ((1+k*p) x k), residuals."""
    X, T_ = _lag_design(np.asarray(Y, float), p)
    B, *_ = np.linalg.lstsq(X, T_, rcond=None)
    resid = T_ - X @ B
    return B, resid


def var_forecast_arrays(Y: np.ndarray, B: np.ndarray, p: int, h: int) -> np.ndarray:
    Y = np.asarray(Y, float)
    k = Y.shape[1]
    hist = list(Y[-p:])
    out = np.empty((h, k))
    for t in range(h):
        x = np.ones(1 + k * p)
        for lag in range(1, p + 1):
            x[1 + (lag - 1) * k : 1 + lag * k] = hist[-lag]
        y_next = x @ B
        out[t] = y_next
        hist.append(y_next)
    return out


def granger_causality_arrays(Y: np.ndarray, cause: int, effect: int, p: int = 1):
    """F-test: does `cause` column improve prediction of `effect`
    beyond its own lags (var_model.py:149-218)?
    Returns (f_stat, p_value)."""
    Y = np.asarray(Y, float)
    n = Y.shape[0] - p
    # full: own lags + cause lags
    cols = [effect, cause]
    Xf, Tf = _lag_design(Y[:, cols], p)
    bf, *_ = np.linalg.lstsq(Xf, Tf[:, 0], rcond=None)
    rss_full = float(np.sum((Tf[:, 0] - Xf @ bf) ** 2))
    # restricted: own lags only
    Xr, Tr = _lag_design(Y[:, [effect]], p)
    br, *_ = np.linalg.lstsq(Xr, Tr[:, 0], rcond=None)
    rss_res = float(np.sum((Tr[:, 0] - Xr @ br) ** 2))
    df1 = p
    df2 = n - 2 * p - 1
    if df2 <= 0 or rss_full <= 0:
        return np.nan, np.nan
    f_stat = ((rss_res - rss_full) / df1) / (rss_full / df2)
    return float(f_stat), float(f_sf(f_stat, df1, df2))


def var_forecast(
    df: DataFrame,
    value_cols: list[str],
    p: int = 1,
    h: int = 7,
    id_col: str = ID,
    time_col: str = TIME,
) -> DataFrame:
    """Per-series VAR(p) h-step forecast:
    [id, step, <col>_hat per value col]."""

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = pdf[id_col].iloc[0]
        Y = pdf[value_cols].to_numpy(dtype=float)
        if len(Y) <= p + len(value_cols) * p + 2:
            out = np.full((h, len(value_cols)), np.nan)
        else:
            B, _ = var_fit_arrays(Y, p)
            out = var_forecast_arrays(Y, B, p, h)
        d = {id_col: [sid] * h, "step": list(range(1, h + 1))}
        for i, c in enumerate(value_cols):
            d[f"{c}_hat"] = out[:, i]
        return pd.DataFrame(d)

    hats = ", ".join(f"`{c}_hat` double" for c in value_cols)
    schema = f"{id_col} string, step int, {hats}"
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)


def bayesian_var_fit_arrays(
    Y: np.ndarray, p: int = 1, lam: float = 0.2, own_lag_mean: float = 1.0
):
    """Conjugate Bayesian VAR(p) with a Minnesota-style ridge prior
    (bayesian_var/model.py:59-403, priors.py:15-45): prior mean puts
    ``own_lag_mean`` on each variable's first own lag and 0 elsewhere;
    prior precision is diagonal with tightness 1/lam² (tighter on
    longer lags, scaled by lag²). Posterior mean solves
    (X'X + Λ) B = X'Y + Λ B0. Returns (B_post, XtX_inv, Sigma)."""
    Y = np.asarray(Y, float)
    k = Y.shape[1]
    X, T_ = _lag_design(Y, p)
    d = X.shape[1]
    B0 = np.zeros((d, k))
    prec = np.zeros(d)
    prec[0] = 1e-4  # near-flat prior on the intercept
    for lag in range(1, p + 1):
        prec[1 + (lag - 1) * k : 1 + lag * k] = (lag / lam) ** 2
    for j in range(k):
        B0[1 + j, j] = own_lag_mean  # first own lag
    L = np.diag(prec)
    A = X.T @ X + L
    B_post = np.linalg.solve(A, X.T @ T_ + L @ B0)
    resid = T_ - X @ B_post
    dof = max(len(T_) - d, 1)
    Sigma = (resid.T @ resid) / dof
    return B_post, np.linalg.inv(A), Sigma


def bayesian_var_forecast(
    df: DataFrame,
    value_cols: list[str],
    p: int = 1,
    h: int = 7,
    lam: float = 0.2,
    n_draws: int = 200,
    coverage: float = 0.8,
    seed: int = 42,
    id_col: str = ID,
    time_col: str = TIME,
) -> DataFrame:
    """Per-series Bayesian VAR forecast with credible bands: posterior
    coefficient draws (matrix-normal, seeded) propagated h steps;
    bands = empirical posterior-predictive quantiles. Output
    [id, step, {c}_hat, {c}_lo, {c}_hi per value col]."""
    alpha = (1.0 - coverage) / 2.0

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = pdf[id_col].iloc[0]
        Y = pdf[value_cols].to_numpy(dtype=float)
        k = len(value_cols)
        if len(Y) <= 1 + k * p + 2:
            mean = lo = hi = np.full((h, k), np.nan)
        else:
            from polars_ts_spark.functions.numutils import hash_normals

            B, A_inv, Sigma = bayesian_var_fit_arrays(Y, p, lam)
            mean = var_forecast_arrays(Y, B, p, h)
            # draw vec(B) ~ N(vec(B_post), Sigma (x) A_inv), propagate;
            # draws come from md5 Box-Muller streams tagged by draw
            # index (engine-replicable — the DuckDB oracle regenerates
            # them), and the quantiles replicate numpy's branchy _lerp
            Lc = np.linalg.cholesky(A_inv + 1e-12 * np.eye(len(A_inv)))
            Sc = np.linalg.cholesky(Sigma + 1e-12 * np.eye(k))
            sims = np.empty((n_draws, h, k))
            d = B.shape[0]
            for s in range(1, n_draws + 1):
                Z = hash_normals(seed, f"b:{s}", d * k).reshape(d, k)
                Bd = B + Lc @ Z @ Sc.T
                sims[s - 1] = var_forecast_arrays(Y, Bd, p, h)
                E = hash_normals(seed, f"e:{s}", h * k).reshape(h, k)
                sims[s - 1] += E @ Sc.T  # obs noise
            lo = np.empty((h, k))
            hi = np.empty((h, k))
            for t in range(h):
                for c in range(k):
                    col = np.sort(sims[:, t, c])
                    m = len(col)
                    for q, out in ((alpha, lo), (1.0 - alpha, hi)):
                        pos = q * (m - 1)
                        i0 = int(np.floor(pos))
                        gfr = pos - i0
                        i1 = min(i0 + 1, m - 1)
                        dd = col[i1] - col[i0]
                        out[t, c] = (col[i1] - dd * (1.0 - gfr)) if gfr >= 0.5 \
                            else (col[i0] + dd * gfr)
        d = {id_col: [sid] * h, "step": list(range(1, h + 1))}
        for i, c in enumerate(value_cols):
            d[f"{c}_hat"] = mean[:, i]
            d[f"{c}_lo"] = lo[:, i]
            d[f"{c}_hi"] = hi[:, i]
        return pd.DataFrame(d)

    cols = ", ".join(
        f"`{c}_hat` double, `{c}_lo` double, `{c}_hi` double" for c in value_cols
    )
    schema = f"{id_col} string, step int, {cols}"
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)


def granger_causality(
    df: DataFrame,
    cause_col: str,
    effect_col: str,
    p: int = 1,
    id_col: str = ID,
    time_col: str = TIME,
) -> DataFrame:
    """Per-series Granger F-test [id, f_stat, p_value]."""

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = pdf[id_col].iloc[0]
        Y = pdf[[effect_col, cause_col]].to_numpy(dtype=float)
        mask = ~np.isnan(Y).any(axis=1)
        f, pv = granger_causality_arrays(Y[mask], cause=1, effect=0, p=p)
        return pd.DataFrame({id_col: [sid], "f_stat": [f], "p_value": [pv]})

    schema = f"{id_col} string, f_stat double, p_value double"
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)

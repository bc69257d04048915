"""GARCH volatility modeling (SURVEY §2.17).

Reference parity: garch_fit / garch_forecast ->
polars_ts/volatility.py:25-174 (GARCH(p,q) MLE via Nelder-Mead per
series; variance-recursion forecast). GARCHResult dataclass ->
volatility.py:12-22.

Spark mapping: per-series `applyInPandas` — the MLE is a scalar
recursion; each series fits independently in one task (the reference
loops series on one machine; we spread them across executors). The
fitted state comes back as a DataFrame row per series (omega, alphas,
betas, loglik) — state-as-data, join-able at forecast time, instead
of a driver dict (SURVEY §4.2 scale note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from polars_ts_spark.functions.numutils import nelder_mead
from polars_ts_spark.operators.kernel import for_each_series
from polars_ts_spark.panel import ID, TARGET, TIME


def _garch_neg_loglik(params: np.ndarray, r: np.ndarray, p: int, q: int) -> float:
    omega = params[0]
    alphas = params[1 : 1 + q]
    betas = params[1 + q : 1 + q + p]
    if omega <= 0 or np.any(alphas < 0) or np.any(betas < 0) or alphas.sum() + betas.sum() >= 1:
        return 1e12
    n = len(r)
    var0 = float(np.var(r)) or 1e-8
    sig2 = np.full(n, var0)
    for t in range(max(p, q), n):
        s = omega
        for i in range(q):
            s += alphas[i] * r[t - 1 - i] ** 2
        for j in range(p):
            s += betas[j] * sig2[t - 1 - j]
        sig2[t] = s
    sig2 = np.maximum(sig2, 1e-12)
    return float(0.5 * np.sum(np.log(2 * np.pi * sig2) + r * r / sig2))


def garch_fit_series(r: np.ndarray, p: int = 1, q: int = 1):
    """Fit GARCH(p,q) on (demeaned) returns. Returns (omega, alphas,
    betas, loglik, sig2_last_block)."""
    r = np.asarray(r, float)
    r = r - r.mean()
    var = float(np.var(r)) or 1e-8
    x0 = np.concatenate([[var * 0.1], np.full(q, 0.1), np.full(p, 0.8 / max(p, 1))])
    best, fbest = nelder_mead(lambda th: _garch_neg_loglik(th, r, p, q), x0, max_iter=400)
    omega = float(best[0])
    alphas = best[1 : 1 + q]
    betas = best[1 + q : 1 + q + p]
    # final variance path for forecasting
    n = len(r)
    sig2 = np.full(n, var)
    for t in range(max(p, q), n):
        s = omega
        for i in range(q):
            s += alphas[i] * r[t - 1 - i] ** 2
        for j in range(p):
            s += betas[j] * sig2[t - 1 - j]
        sig2[t] = s
    return omega, alphas, betas, -fbest, r, sig2


def garch_fit(
    df: DataFrame,
    p: int = 1,
    q: int = 1,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Per-series GARCH(p,q) parameters:
    [id, omega, alpha, beta, loglik] (alpha/beta as arrays)."""

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        y = pdf[target_col].to_numpy(dtype=float)
        y = y[~np.isnan(y)]
        if len(y) < max(p, q) + 5:
            return pd.DataFrame(
                {id_col: [pdf[id_col].iloc[0]], "omega": [np.nan],
                 "alpha": [[np.nan] * q], "beta": [[np.nan] * p], "loglik": [np.nan]}
            )
        omega, alphas, betas, ll, _, _ = garch_fit_series(y, p, q)
        return pd.DataFrame(
            {id_col: [pdf[id_col].iloc[0]], "omega": [omega],
             "alpha": [list(map(float, alphas))], "beta": [list(map(float, betas))],
             "loglik": [ll]}
        )

    schema = f"{id_col} string, omega double, alpha array<double>, beta array<double>, loglik double"
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)


def garch_variance_path(
    df: DataFrame,
    omega: float,
    alpha: float,
    beta: float,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """In-sample conditional-variance recursion with FIXED GARCH(1,1)
    params: sigma²_t = (omega + alpha·r²_{t-1}) + beta·sigma²_{t-1},
    r = y - mean(y), sigma²_0 = Var_pop(r). This is the deterministic
    kernel that garch_fit evaluates inside the MLE objective and
    garch_forecast extends forward (volatility.py:25-174 in the
    reference) — exposed separately because, unlike the Nelder-Mead
    fit, it has an exact recursive-CTE SQL oracle.
    Output [id, ds, sigma2]."""

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        y = pdf[target_col].to_numpy(dtype=float)
        r = y - y.mean()
        mu2 = r.mean()
        var0 = float(((r - mu2) * (r - mu2)).mean()) or 1e-8
        n = len(r)
        sig2 = np.full(n, var0)
        for t in range(1, n):
            sig2[t] = (omega + alpha * (r[t - 1] * r[t - 1])) + beta * sig2[t - 1]
        return pd.DataFrame({
            id_col: pdf[id_col], time_col: pdf[time_col], "sigma2": sig2,
        })

    schema = f"{id_col} string, {time_col} timestamp, sigma2 double"
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)


def garch_forecast(
    df: DataFrame,
    h: int = 7,
    p: int = 1,
    q: int = 1,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """h-step conditional-variance forecast per series
    [id, step, sigma2] via the GARCH recursion (volatility.py:120-174)."""

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = pdf[id_col].iloc[0]
        y = pdf[target_col].to_numpy(dtype=float)
        y = y[~np.isnan(y)]
        if len(y) < max(p, q) + 5:
            return pd.DataFrame({id_col: [sid] * h, "step": range(1, h + 1), "sigma2": [np.nan] * h})
        omega, alphas, betas, _, r, sig2 = garch_fit_series(y, p, q)
        # unconditional forward recursion: E[r^2] = sigma2
        hist_r2 = list(r[-q:] ** 2) if q else []
        hist_s2 = list(sig2[-p:]) if p else []
        out = []
        for _ in range(h):
            s = omega
            for i in range(q):
                s += alphas[i] * (hist_r2[-1 - i] if i < len(hist_r2) else s)
            for j in range(p):
                s += betas[j] * hist_s2[-1 - j]
            out.append(s)
            hist_r2.append(s)  # E[r^2] = sigma^2 forward
            hist_s2.append(s)
        return pd.DataFrame({id_col: [sid] * h, "step": range(1, h + 1), "sigma2": out})

    schema = f"{id_col} string, step int, sigma2 double"
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)

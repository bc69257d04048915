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


# ---------------------------------------------------------------------------
# Deterministic GARCH(1,1) QMLE: variance-targeted 3-stage grid refine.
# omega is profiled out by variance targeting (omega = var0·(1-a-b),
# the standard QMLE reduction), leaving a 2-D (alpha, beta) search:
# one coarse grid then two zoom grids (resolution 0.01/0.02 then
# 0.002/0.004). All candidate evaluations are a fixed enumeration and
# the argmin compares MILLI-QUANTIZED neg-logliks with (qnll, ai, bi)
# tie-break — so the whole trajectory is exactly replayable as
# recursive-CTE SQL (grid per candidate × time recursion), unlike the
# previous Nelder-Mead whose simplex geometry amplifies engine ulps.

def _seq_sum(arr) -> float:
    """Left-fold sum (== SQL list_reduce((x, y) -> x + y) order)."""
    s = 0.0
    for v in arr:
        s += float(v)
    return s


_GRID_A0 = [0.02, 0.05, 0.10, 0.15, 0.20, 0.30]
_GRID_B0 = [0.00, 0.20, 0.40, 0.50, 0.60, 0.70, 0.80, 0.90, 0.95]
_SUM_CAP = 0.97  # alpha + beta stationarity margin


def _garch11_nll(r2: list, var0: float, a: float, b: float):
    """Sequential-fold negative loglik of GARCH(1,1) under variance
    targeting; returns (nll, last_sig2). Float op order is the
    contract: ((om + a·r²) + b·s2), then 0.5·(ln(2π·s2) + r²/s2),
    left-accumulated — the SQL oracle replays the identical sequence."""
    import math

    om = var0 * (1.0 - a - b)
    s2 = var0
    nll = 0.5 * (math.log(2.0 * math.pi * var0) + r2[0] / var0)
    for t in range(1, len(r2)):
        s2 = (om + a * r2[t - 1]) + b * s2
        nll += 0.5 * (math.log(2.0 * math.pi * s2) + r2[t] / s2)
    return nll, s2


def _garch11_grid_fit(r: np.ndarray, var0: float):
    """3-stage grid QMLE. Returns (a, b, nll, last_sig2)."""
    import math

    r2 = (r * r).tolist()

    def ev(a, b):
        nll, s2l = _garch11_nll(r2, var0, a, b)
        return math.floor(nll * 1000.0 + 0.5), nll, s2l

    best = None
    for ai, a in enumerate(_GRID_A0):
        for bi, b in enumerate(_GRID_B0):
            if a + b > _SUM_CAP:
                continue
            qv, nll, s2l = ev(a, b)
            if best is None or (qv, ai, bi) < best[0]:
                best = ((qv, ai, bi), a, b, nll, s2l)
    for stp_a, stp_b in ((0.01, 0.02), (0.002, 0.004)):
        a0, b0 = best[1], best[2]
        best = None
        for ai in range(-4, 5):
            for bi in range(-4, 5):
                a = a0 + ai * stp_a
                b = b0 + bi * stp_b
                if a < 0.0 or b < 0.0 or a + b > _SUM_CAP:
                    continue
                qv, nll, s2l = ev(a, b)
                if best is None or (qv, ai, bi) < best[0]:
                    best = ((qv, ai, bi), a, b, nll, s2l)
    return best[1], best[2], best[3], best[4]


def garch_fit_series(r: np.ndarray, p: int = 1, q: int = 1):
    """Fit GARCH(p,q) on (demeaned) returns. Returns (omega, alphas,
    betas, loglik, sig2_last_block). p = q = 1 (the default and the
    reference's common case, volatility.py:25-174) uses the
    deterministic grid QMLE above (exact SQL oracle); higher orders
    keep the Nelder-Mead MLE (rows-only correctness tier)."""
    r = np.asarray(r, float)
    if p == 1 and q == 1:
        # sequential left-fold mean/variance (time order), NOT numpy's
        # pairwise summation: the SQL oracle's list_reduce folds in the
        # same order, so mu/var0 — the seeds of every downstream float —
        # are bit-identical across engines
        n = len(r)
        mu = _seq_sum(r) / n
        r = r - mu
        mu2 = _seq_sum(r) / n
        var = _seq_sum((r - mu2) * (r - mu2)) / n or 1e-8
        a, b, nll, _ = _garch11_grid_fit(r, var)
        omega = var * (1.0 - a - b)
        alphas, betas, fbest = np.array([a]), np.array([b]), nll
    else:
        r = r - r.mean()
        var = float(np.var(r)) or 1e-8
        # multi-start Nelder-Mead: the (1+p+q)-dim GARCH likelihood has
        # local optima (e.g. one beta absorbing all persistence), so a
        # single start is unreliable for p,q > 1. Starts span low/high
        # ARCH × spread/concentrated GARCH persistence, all
        # variance-targeted (omega = var·(1 - Σa - Σb)); deterministic
        # fixed enumeration, best final nll wins.
        fn = lambda th: _garch_neg_loglik(th, r, p, q)  # noqa: E731
        starts = []
        for a_tot, b_tot in ((0.1, 0.8), (0.3, 0.5), (0.05, 0.9), (0.2, 0.2)):
            base = np.concatenate([
                [var * (1.0 - a_tot - b_tot)], np.full(q, a_tot / q),
                np.full(p, b_tot / p),
            ])
            starts.append(base)
            if p > 1:  # concentrated variant: all persistence on beta_1
                conc = base.copy()
                conc[1 + q:] = 0.0
                conc[1 + q] = b_tot
                starts.append(conc)
        best, fbest = None, np.inf
        for x0 in starts:
            cand, fcand = nelder_mead(fn, x0, max_iter=400)
            # NaN handling must work BOTH ways: keep the first candidate
            # when every nll is NaN (degrade like the old single-start
            # path, never crash), but also let a later FINITE candidate
            # evict a NaN best — `fcand < NaN` is False, so without the
            # isnan escape one bad start would poison the whole fit
            if best is None or np.isnan(fbest) or fcand < fbest:
                best, fbest = cand, fcand
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

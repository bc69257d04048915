"""Bayesian forecasting kernels (SURVEY §2.17): Gaussian-process
regression with a composable kernel algebra, Metropolis-Hastings MCMC
forecasting, Bayesian ETS, BSTS-lite, and the Ensemble Kalman filter.

Reference parity:
- GaussianProcessTS / gp_forecast -> polars_ts/bayesian/gp.py:31-539
  (RBF/Matern32/Matern52/Periodic + Sum/Product kernel algebra)
- MCMCForecaster / mcmc_forecast  -> polars_ts/bayesian/mcmc.py:45-270
- bayesian_ets / BayesianETS      -> polars_ts/models/bayesian_ets/model.py:29-191
- BSTS (level/trend/seasonal)     -> polars_ts/bayesian/bsts.py:28-356
  (ours: collapsed Kalman-smoother structural fit, not full Gibbs)
- EnsembleKalmanFilter            -> polars_ts/bayesian/enkf.py:21

Spark mapping: all per-series kernels under applyInPandas; GP is
O(n³) per series which caps n per series, exactly as in the reference.
All randomness from explicit seeded Generators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from polars_ts_spark.operators.kernel import for_each_series
from polars_ts_spark.operators.statespace import KalmanFilter
from polars_ts_spark.panel import ID, TARGET, TIME

# ---------------------------------------------------------------------------
# GP kernel algebra (gp.py:31-180)


class Kernel:
    def __call__(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def __add__(self, other: "Kernel") -> "Kernel":
        return _Sum(self, other)

    def __mul__(self, other: "Kernel") -> "Kernel":
        return _Product(self, other)


class _Sum(Kernel):
    def __init__(self, k1, k2):
        self.k1, self.k2 = k1, k2

    def __call__(self, a, b):
        return self.k1(a, b) + self.k2(a, b)


class _Product(Kernel):
    def __init__(self, k1, k2):
        self.k1, self.k2 = k1, k2

    def __call__(self, a, b):
        return self.k1(a, b) * self.k2(a, b)


class RBF(Kernel):
    def __init__(self, length_scale: float = 10.0, variance: float = 1.0):
        self.l, self.v = length_scale, variance

    def __call__(self, a, b):
        d2 = (a[:, None] - b[None, :]) ** 2
        return self.v * np.exp(-0.5 * d2 / self.l ** 2)


class Matern32(Kernel):
    def __init__(self, length_scale: float = 10.0, variance: float = 1.0):
        self.l, self.v = length_scale, variance

    def __call__(self, a, b):
        d = np.abs(a[:, None] - b[None, :]) / self.l
        s3 = np.sqrt(3.0)
        return self.v * (1 + s3 * d) * np.exp(-s3 * d)


class Matern52(Kernel):
    def __init__(self, length_scale: float = 10.0, variance: float = 1.0):
        self.l, self.v = length_scale, variance

    def __call__(self, a, b):
        d = np.abs(a[:, None] - b[None, :]) / self.l
        s5 = np.sqrt(5.0)
        return self.v * (1 + s5 * d + 5.0 * d * d / 3.0) * np.exp(-s5 * d)


class Periodic(Kernel):
    def __init__(self, period: float = 7.0, length_scale: float = 1.0, variance: float = 1.0):
        self.p, self.l, self.v = period, length_scale, variance

    def __call__(self, a, b):
        d = np.abs(a[:, None] - b[None, :])
        return self.v * np.exp(-2.0 * np.sin(np.pi * d / self.p) ** 2 / self.l ** 2)


class GaussianProcessTS:
    """GP regression on the time index (gp.py:200-380): posterior mean
    and variance at future points; noise term on the diagonal."""

    def __init__(self, kernel: Kernel | None = None, noise: float = 1e-2):
        self.kernel = kernel or (RBF(10.0) + Periodic(7.0, 1.0, 0.5))
        self.noise = noise

    def fit(self, t: np.ndarray, y: np.ndarray) -> "GaussianProcessTS":
        self.t = np.asarray(t, float)
        self.y_mean = float(np.mean(y))
        self.y = np.asarray(y, float) - self.y_mean
        K = self.kernel(self.t, self.t) + self.noise * np.eye(len(self.t))
        self.L = np.linalg.cholesky(K + 1e-10 * np.eye(len(self.t)))
        self.alpha = np.linalg.solve(self.L.T, np.linalg.solve(self.L, self.y))
        return self

    def predict(self, t_new: np.ndarray, return_std: bool = False):
        t_new = np.asarray(t_new, float)
        Ks = self.kernel(self.t, t_new)
        mu = Ks.T @ self.alpha + self.y_mean
        if not return_std:
            return mu
        v = np.linalg.solve(self.L, Ks)
        Kss = self.kernel(t_new, t_new)
        var = np.maximum(np.diag(Kss) - (v * v).sum(axis=0), 1e-12)
        return mu, np.sqrt(var)


def gp_forecast(
    df: DataFrame,
    h: int = 7,
    kernel: Kernel | None = None,
    noise: float = 1e-2,
    max_points: int = 500,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Per-series GP forecast [id, ds, y_hat, y_std]; series tails are
    capped at max_points (O(n³) solve per series)."""

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col).tail(max_points)
        y = pdf[target_col].to_numpy(dtype=float)
        ts = pd.to_datetime(pdf[time_col])
        freq = ts.diff().dropna().median() if len(ts) > 1 else pd.Timedelta(days=1)
        t = np.arange(len(y), dtype=float)
        gp = GaussianProcessTS(kernel, noise).fit(t, y)
        mu, sd = gp.predict(len(y) + np.arange(h, dtype=float), return_std=True)
        fut = [ts.iloc[-1] + (i + 1) * freq for i in range(h)]
        return pd.DataFrame({
            id_col: pdf[id_col].iloc[0], time_col: fut, "y_hat": mu, "y_std": sd,
        })

    schema = f"{id_col} string, {time_col} timestamp, y_hat double, y_std double"
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)


# ---------------------------------------------------------------------------
# Metropolis-Hastings MCMC forecaster (mcmc.py:45-270)


def mcmc_forecast_series(
    y: np.ndarray,
    h: int,
    n_samples: int = 2000,
    burn: int = 500,
    seed: int = 42,
):
    """Linear-trend + Gaussian-noise model; MH over (intercept, slope,
    log_sigma). Returns (mean, lower, upper) forecast arrays (10/90)."""
    y = np.asarray(y, float)
    n = len(y)
    t = np.arange(n, dtype=float)
    rng = np.random.default_rng(seed)

    def loglik(th):
        a, b, ls = th
        sigma = np.exp(ls)
        resid = y - (a + b * t)
        return -0.5 * np.sum(resid ** 2) / sigma ** 2 - n * ls

    th = np.array([float(y.mean()), 0.0, float(np.log(y.std() or 1.0))])
    ll = loglik(th)
    scale = np.array([y.std() / 10 + 1e-6, y.std() / (10 * n) + 1e-9, 0.1])
    samples = []
    for i in range(n_samples):
        prop = th + rng.normal(0, 1, 3) * scale
        ll_p = loglik(prop)
        if np.log(rng.random()) < ll_p - ll:
            th, ll = prop, ll_p
        if i >= burn:
            samples.append(th.copy())
    S = np.asarray(samples)
    t_new = n + np.arange(h, dtype=float)
    draws = S[:, 0:1] + S[:, 1:2] * t_new[None, :] + np.exp(S[:, 2:3]) * rng.normal(
        0, 1, (len(S), h)
    )
    return draws.mean(axis=0), np.quantile(draws, 0.1, axis=0), np.quantile(draws, 0.9, axis=0)


def mcmc_forecast(
    df: DataFrame, h: int = 7, n_samples: int = 1500, seed: int = 42,
    id_col: str = ID, time_col: str = TIME, target_col: str = TARGET,
) -> DataFrame:
    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[target_col].to_numpy(dtype=float)
        ts = pd.to_datetime(pdf[time_col])
        freq = ts.diff().dropna().median() if len(ts) > 1 else pd.Timedelta(days=1)
        mu, lo, hi = mcmc_forecast_series(y, h, n_samples=n_samples, seed=seed)
        fut = [ts.iloc[-1] + (i + 1) * freq for i in range(h)]
        return pd.DataFrame({
            id_col: pdf[id_col].iloc[0], time_col: fut,
            "y_hat": mu, "y_hat_lower": lo, "y_hat_upper": hi,
        })

    schema = (
        f"{id_col} string, {time_col} timestamp, y_hat double, "
        "y_hat_lower double, y_hat_upper double"
    )
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)


# ---------------------------------------------------------------------------
# Bayesian ETS (models/bayesian_ets/model.py:29-191): MH over (alpha,
# beta) of a Holt model, forecast = posterior-mean path


def bayesian_ets_series(y: np.ndarray, h: int, n_samples: int = 1000, seed: int = 42):
    y = np.asarray(y, float)
    rng = np.random.default_rng(seed)

    def sse(params):
        a, b = params
        if not (0 < a < 1 and 0 <= b < 1):
            return np.inf
        level, trend = y[0], 0.0
        s = 0.0
        for v in y[1:]:
            pred = level + trend
            s += (v - pred) ** 2
            prev = level
            level = a * v + (1 - a) * pred
            trend = b * (level - prev) + (1 - b) * trend
        return s

    th = np.array([0.3, 0.1])
    cur = sse(th)
    n = len(y)
    samples = []
    for i in range(n_samples):
        prop = th + rng.normal(0, 0.05, 2)
        s_p = sse(prop)
        # Gaussian likelihood with sigma^2 profile: p ∝ sse^(-n/2)
        if s_p < np.inf and np.log(rng.random()) < -0.5 * n * (np.log(s_p) - np.log(cur)):
            th, cur = prop, s_p
        if i >= n_samples // 3:
            samples.append(th.copy())
    S = np.asarray(samples)
    fcs = []
    for a, b in S[:: max(1, len(S) // 100)]:
        level, trend = y[0], 0.0
        for v in y[1:]:
            pred = level + trend
            prev = level
            level = a * v + (1 - a) * pred
            trend = b * (level - prev) + (1 - b) * trend
        fcs.append(level + trend * np.arange(1, h + 1))
    F_ = np.asarray(fcs)
    return F_.mean(axis=0), np.quantile(F_, 0.1, axis=0), np.quantile(F_, 0.9, axis=0)


def bayesian_ets(
    df: DataFrame, h: int = 7, n_samples: int = 800, seed: int = 42,
    id_col: str = ID, time_col: str = TIME, target_col: str = TARGET,
) -> DataFrame:
    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[target_col].to_numpy(dtype=float)
        ts = pd.to_datetime(pdf[time_col])
        freq = ts.diff().dropna().median() if len(ts) > 1 else pd.Timedelta(days=1)
        mu, lo, hi = bayesian_ets_series(y, h, n_samples, seed)
        fut = [ts.iloc[-1] + (i + 1) * freq for i in range(h)]
        return pd.DataFrame({
            id_col: pdf[id_col].iloc[0], time_col: fut,
            "y_hat": mu, "y_hat_lower": lo, "y_hat_upper": hi,
        })

    schema = (
        f"{id_col} string, {time_col} timestamp, y_hat double, "
        "y_hat_lower double, y_hat_upper double"
    )
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)


# ---------------------------------------------------------------------------
# BSTS-lite: structural (level+trend+weekly-seasonal) via the Kalman
# smoother — the collapsed-Gibbs shortcut (bsts.py:28-356 surface)


def bsts_forecast(
    df: DataFrame, h: int = 7, season_length: int = 7,
    id_col: str = ID, time_col: str = TIME, target_col: str = TARGET,
) -> DataFrame:
    """Local-trend + seasonal structural forecast: seasonal component
    estimated by phase means of the detrended series, trend by the
    Kalman local-trend smoother on the deseasonalized series."""

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[target_col].to_numpy(dtype=float)
        ts = pd.to_datetime(pdf[time_col])
        freq = ts.diff().dropna().median() if len(ts) > 1 else pd.Timedelta(days=1)
        n = len(y)
        phase = np.arange(n) % season_length
        trend0 = pd.Series(y).rolling(season_length, min_periods=1, center=True).mean().to_numpy()
        seas = np.array([
            (y - trend0)[phase == p].mean() if (phase == p).any() else 0.0
            for p in range(season_length)
        ])
        seas = seas - seas.mean()
        deseason = y - seas[phase]
        kf = KalmanFilter.local_trend(q_level=0.1, q_trend=0.01,
                                      r=max(np.var(np.diff(deseason)), 1e-6))
        fc_trend = kf.forecast(deseason, h)
        fut_phase = (n + np.arange(h)) % season_length
        fc = fc_trend + seas[fut_phase]
        fut = [ts.iloc[-1] + (i + 1) * freq for i in range(h)]
        return pd.DataFrame({id_col: pdf[id_col].iloc[0], time_col: fut, "y_hat": fc})

    schema = f"{id_col} string, {time_col} timestamp, y_hat double"
    return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)


# ---------------------------------------------------------------------------
# Ensemble Kalman filter (enkf.py:21)


class EnsembleKalmanFilter:
    """EnKF with perturbed observations; linear observation H=I on the
    first state component. Perturbations come from md5 Box–Muller draws
    (numutils.hash_normals) rather than a PCG64 stream: the update has
    no branches, so the DuckDB oracle replaying the same draws tracks
    the trajectory to within accumulated ulps."""

    def __init__(self, f, q: float = 0.01, r: float = 1.0, n_ens: int = 100, seed: int = 42):
        self.f, self.q, self.r, self.n_ens, self.seed = f, q, r, n_ens, seed

    def filter(self, y: np.ndarray, x0: float = 0.0) -> np.ndarray:
        from polars_ts_spark.functions.numutils import hash_normals

        sq, sr = np.sqrt(self.q), np.sqrt(self.r)
        n = self.n_ens
        ens = x0 + hash_normals(self.seed, "i", n)
        out = np.empty(len(y))
        for t, yt in enumerate(np.asarray(y, float)):
            ens = (np.array([self.f(x) for x in ens])
                   + sq * hash_normals(self.seed, f"p:{t}", n))
            # sequential folds + sum-of-squares variance: the exact
            # float recipe the DuckDB oracle's list_sum left folds
            # reproduce (numpy's pairwise mean/var would not)
            s1 = s2 = 0.0
            for e in ens:
                s1 += float(e)
                s2 += float(e) * float(e)
            P = (s2 - s1 * s1 / n) / n + 1e-12
            K = P / (P + self.r)
            obs = yt + sr * hash_normals(self.seed, f"o:{t}", n)
            ens = ens + K * (obs - ens)
            s = 0.0
            for e in ens:
                s += float(e)
            out[t] = s / n
        return out

"""Bayesian online changepoint detection and HMM regime detection
(SURVEY §2.15; cusum and PELT live in preprocessing.py / pelt.py).

Reference parity:
- bocpd         -> polars_ts/changepoint/bocpd.py:11-150 (normal-
  inverse-gamma conjugate run-length posterior, constant hazard)
- regime_detect -> polars_ts/changepoint/regime.py:9-158 (Gaussian HMM
  via Baum-Welch EM; outputs regime + regime_prob)

Spark mapping: both are sequential per-series recursions ->
applyInPandas per series (one shuffle), numpy inside. Deterministic:
HMM init is quantile-based (no RNG).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from polars_ts_spark.operators.kernel import for_each_series
from polars_ts_spark.panel import ID, TARGET, TIME


def bocpd_series(
    y: np.ndarray,
    hazard_rate: float = 250.0,
    mu0: float = 0.0,
    kappa0: float = 1.0,
    alpha0: float = 1.0,
    beta0: float = 1.0,
    threshold: float = 0.5,
):
    """Adams & MacKay BOCPD with NIG conjugate updates
    (bocpd.py:40-120). Returns (cp_prob per step, is_changepoint)."""
    y = np.asarray(y, float)
    n = len(y)
    h = 1.0 / hazard_rate
    # run-length posterior; grows by 1 per step
    R = np.zeros(n + 1)
    R[0] = 1.0
    mu = np.array([mu0])
    kappa = np.array([kappa0])
    alpha = np.array([alpha0])
    beta = np.array([beta0])
    cp_prob = np.empty(n)
    for t in range(n):
        # Student-t predictive for each run length
        df_ = 2 * alpha
        scale2 = beta * (kappa + 1) / (alpha * kappa)
        z2 = (y[t] - mu) ** 2 / scale2
        # log pdf of standardized t with df_ dof
        from polars_ts_spark.functions.numutils import _lgamma

        lg = np.vectorize(_lgamma)
        log_pred = (
            lg((df_ + 1) / 2) - lg(df_ / 2)
            - 0.5 * np.log(np.pi * df_ * scale2)
            - (df_ + 1) / 2 * np.log1p(z2 / df_)
        )
        pred = np.exp(log_pred)
        growth = R[: t + 1] * pred * (1 - h)
        cp = float(np.sum(R[: t + 1] * pred * h))
        R[1 : t + 2] = growth
        R[0] = cp
        total = R[: t + 2].sum() or 1e-300
        R[: t + 2] /= total
        # note R[0] post-update is ALWAYS exactly h (the same predictive
        # multiplies growth and changepoint mass), so the usable signal
        # is the posterior mass on SHORT run lengths: it spikes one step
        # after a shift, when long-run predictives collapse. Gate the
        # first steps where every run length is trivially short.
        cp_prob[t] = float(R[: min(6, t + 2)].sum()) if t > 5 else h
        # NIG updates (prepend prior for r=0)
        mu_new = np.concatenate([[mu0], (kappa * mu + y[t]) / (kappa + 1)])
        kappa_new = np.concatenate([[kappa0], kappa + 1])
        alpha_new = np.concatenate([[alpha0], alpha + 0.5])
        beta_new = np.concatenate([[beta0], beta + kappa * (y[t] - mu) ** 2 / (2 * (kappa + 1))])
        mu, kappa, alpha, beta = mu_new, kappa_new, alpha_new, beta_new
    return cp_prob, cp_prob > threshold


def bocpd(
    df: DataFrame,
    hazard_rate: float = 250.0,
    threshold: float = 0.5,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """[id, ds, y, cp_prob, is_changepoint] per observation."""

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        y = pdf[target_col].to_numpy(dtype=float)
        prob, flag = bocpd_series(y, hazard_rate=hazard_rate, threshold=threshold)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                time_col: pdf[time_col],
                target_col: y,
                "cp_prob": prob,
                "is_changepoint": flag,
            }
        )

    schema = (
        f"{id_col} string, {time_col} timestamp, {target_col} double, "
        "cp_prob double, is_changepoint boolean"
    )
    return for_each_series(df, kern, schema, id_col=id_col)


# ---------------------------------------------------------------------------
# Gaussian HMM regime detection


def _hmm_fit_series(y: np.ndarray, n_states: int = 2, n_iter: int = 50):
    """Baum-Welch for a Gaussian-emission HMM; quantile-based init (no
    RNG -> deterministic). Returns (states, gamma_max, means)."""
    y = np.asarray(y, float)
    n = len(y)
    qs = np.quantile(y, np.linspace(0.1, 0.9, n_states))
    means = qs.copy()
    var = np.full(n_states, np.var(y) / n_states + 1e-8)
    A = np.full((n_states, n_states), 0.1 / max(n_states - 1, 1))
    np.fill_diagonal(A, 0.9)
    pi = np.full(n_states, 1.0 / n_states)
    for _ in range(n_iter):
        # emission likelihoods
        B = np.exp(-0.5 * (y[:, None] - means[None, :]) ** 2 / var[None, :]) / np.sqrt(
            2 * np.pi * var[None, :]
        )
        B = np.maximum(B, 1e-300)
        # forward-backward (scaled)
        alpha = np.empty((n, n_states))
        c = np.empty(n)
        alpha[0] = pi * B[0]
        c[0] = alpha[0].sum()
        alpha[0] /= c[0]
        for t in range(1, n):
            alpha[t] = (alpha[t - 1] @ A) * B[t]
            c[t] = alpha[t].sum() or 1e-300
            alpha[t] /= c[t]
        beta = np.empty((n, n_states))
        beta[-1] = 1.0
        for t in range(n - 2, -1, -1):
            beta[t] = (A @ (B[t + 1] * beta[t + 1])) / c[t + 1]
        gamma = alpha * beta
        gamma /= np.maximum(gamma.sum(axis=1, keepdims=True), 1e-300)
        # xi_sum = sum_t alpha_t (x) (A * B_{t+1} beta_{t+1} / c_{t+1})
        # vectorized over t — the per-step Python loop dominated runtime
        w = B[1:] * beta[1:] / c[1:, None]
        xi_sum = A * (alpha[:-1].T @ w)
        # M-step
        pi = gamma[0]
        A = xi_sum / np.maximum(xi_sum.sum(axis=1, keepdims=True), 1e-300)
        w = gamma.sum(axis=0)
        prev_means = means
        means = (gamma * y[:, None]).sum(axis=0) / np.maximum(w, 1e-300)
        var = (gamma * (y[:, None] - means[None, :]) ** 2).sum(axis=0) / np.maximum(w, 1e-300)
        var = np.maximum(var, 1e-8)
        if np.max(np.abs(means - prev_means)) < 1e-8 * (1 + np.max(np.abs(means))):
            break
    # order states by mean so labels are deterministic
    order = np.argsort(means)
    remap = np.empty(n_states, dtype=int)
    remap[order] = np.arange(n_states)
    states = remap[np.argmax(gamma, axis=1)]
    return states, gamma.max(axis=1), means[order]


def regime_detect(
    df: DataFrame,
    n_states: int = 2,
    n_iter: int = 50,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """[id, ds, y, regime, regime_prob]; regimes labeled by ascending
    state mean (regime.py:9-158)."""

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        y = pdf[target_col].to_numpy(dtype=float)
        if len(y) < n_states * 3:
            states = np.zeros(len(y), dtype=int)
            prob = np.ones(len(y))
        else:
            states, prob, _ = _hmm_fit_series(y, n_states, n_iter)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                time_col: pdf[time_col],
                target_col: y,
                "regime": states.astype("int32"),
                "regime_prob": prob,
            }
        )

    schema = (
        f"{id_col} string, {time_col} timestamp, {target_col} double, "
        "regime int, regime_prob double"
    )
    return for_each_series(df, kern, schema, id_col=id_col)

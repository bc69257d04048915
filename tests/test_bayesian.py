"""GP, MCMC, Bayesian ETS, BSTS, EnKF — analytic expectations."""

import numpy as np
import pandas as pd
import pytest

from polars_ts_spark.operators import bayesian as B


def test_gp_interpolates_smooth_function():
    t = np.arange(50, dtype=float)
    y = np.sin(t / 5.0)
    gp = B.GaussianProcessTS(B.RBF(5.0), noise=1e-4).fit(t, y)
    mu = gp.predict(t)
    assert np.allclose(mu, y, atol=0.01)
    mu2, sd = gp.predict(np.array([50.0, 51.0]), return_std=True)
    assert sd[1] > sd[0] - 1e-9  # uncertainty grows with extrapolation


def test_gp_kernel_algebra():
    k = B.RBF(5.0) + B.Periodic(7.0) * B.Matern32(3.0)
    K = k(np.arange(10.0), np.arange(10.0))
    assert K.shape == (10, 10)
    assert np.allclose(K, K.T)
    assert np.all(np.linalg.eigvalsh(K + 1e-8 * np.eye(10)) > -1e-9)  # PSD


def test_gp_forecast_operator(spark):
    ts = pd.date_range("2024-01-01", periods=60, freq="D")
    y = np.sin(np.arange(60) * 2 * np.pi / 7) * 3 + 10
    df = spark.createDataFrame(pd.DataFrame({"unique_id": "a", "ds": ts, "y": y}))
    out = B.gp_forecast(df, h=7, kernel=B.Periodic(7.0, 1.0, 5.0), noise=1e-3).toPandas()
    out = out.sort_values("ds")
    expected = np.sin((60 + np.arange(7)) * 2 * np.pi / 7) * 3 + 10
    assert np.allclose(out["y_hat"], expected, atol=0.5)  # periodic pattern continues
    assert (out["y_std"] > 0).all()


def test_mcmc_forecast_recovers_trend():
    y = 10 + 2.0 * np.arange(100)
    mu, lo, hi = B.mcmc_forecast_series(y, h=3, n_samples=3000, seed=0)
    assert np.allclose(mu, [210, 212, 214], atol=3.0)
    assert (lo <= mu).all() and (mu <= hi).all()


def test_bayesian_ets_tracks_trend(spark):
    ts = pd.date_range("2024-01-01", periods=80, freq="D")
    df = spark.createDataFrame(pd.DataFrame({
        "unique_id": "a", "ds": ts, "y": 5.0 + 1.0 * np.arange(80)}))
    out = B.bayesian_ets(df, h=3).toPandas().sort_values("ds")
    assert np.allclose(out["y_hat"], [85, 86, 87], atol=2.0)
    assert (out["y_hat_lower"] <= out["y_hat"]).all()


def test_bsts_forecast_seasonal(spark):
    ts = pd.date_range("2024-01-01", periods=84, freq="D")
    seas = np.tile([5, 0, -3, 1, 2, -4, -1], 12)
    y = 100 + 0.5 * np.arange(84) + seas
    df = spark.createDataFrame(pd.DataFrame({"unique_id": "a", "ds": ts, "y": 1.0 * y}))
    out = B.bsts_forecast(df, h=7, season_length=7).toPandas().sort_values("ds")
    expected = 100 + 0.5 * (84 + np.arange(7)) + seas[:7]
    assert np.allclose(out["y_hat"], expected, atol=2.5)


def test_enkf_tracks_level():
    rng = np.random.default_rng(0)
    y = np.concatenate([np.full(50, 2.0), np.full(50, 8.0)]) + rng.normal(0, 0.3, 100)
    enkf = B.EnsembleKalmanFilter(f=lambda x: x, q=0.05, r=0.09, n_ens=200)
    xs = enkf.filter(y)
    assert abs(xs[45] - 2.0) < 0.5
    assert abs(xs[-1] - 8.0) < 0.5


def test_placebo_test_near_zero_on_stable_series(spark):
    # a planted stable pre-period: the placebo effect must be near zero
    # while a REAL level shift at the true intervention is large —
    # the significance contrast the placebo test exists to provide
    import datetime as dt

    import numpy as np

    from polars_ts_spark.operators import causal

    t0 = dt.datetime(2024, 1, 1)
    rng = np.random.default_rng(7)
    n, shift_at = 60, 45
    y = 100 + rng.normal(scale=0.5, size=n)
    y[shift_at:] += 25.0  # real intervention effect
    rows = [("a", t0 + dt.timedelta(days=i), float(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "unique_id string, ds timestamp, y double")
    t_real = t0 + dt.timedelta(days=shift_at)
    t_placebo = t0 + dt.timedelta(days=30)
    placebo = causal.placebo_test(df, t_real, t_placebo)
    real = causal.causal_impact(df, t_real)
    assert abs(placebo.attrs["avg_effect"]) < 2.0
    assert real.attrs["avg_effect"] > 20.0
    # placebo window ends BEFORE the real intervention
    assert placebo["ds"].max() < np.datetime64(t_real)
    with pytest.raises(ValueError, match="strictly before"):
        causal.placebo_test(df, t_real, t_real)

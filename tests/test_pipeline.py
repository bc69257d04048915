"""Pipeline layer + evaluation: recursive/direct forecasters, global
model, quantile regression, backtest, ensembles, conformal,
reconciliation. Analytic panels where the right answer is known."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_ts_spark.operators import evaluation as E
from polars_ts_spark.operators import pipeline as P


@pytest.fixture(scope="module")
def linear_panel(spark):
    """Two perfectly linear series: y_t = a + b*t — a lag-based ridge
    must extrapolate them almost exactly."""
    ts = pd.date_range("2024-01-01", periods=80, freq="D")
    rows = []
    for sid, (a, b) in {"s1": (10.0, 1.0), "s2": (50.0, -0.5)}.items():
        rows.append(pd.DataFrame({"unique_id": sid, "ds": ts, "y": a + b * np.arange(80)}))
    return spark.createDataFrame(pd.concat(rows))


@pytest.fixture(scope="module")
def covariate_panel(spark):
    """y_t = 3·x_{t-1} + 2·z_t with x a past covariate and z a future
    covariate known over the horizon: a linear model that actually uses
    the covariates recovers y exactly; one that ignores them cannot
    (x and z are noise-like, so lags of y alone carry no signal)."""
    rng = np.random.default_rng(11)
    ts = pd.date_range("2024-01-01", periods=120, freq="D")
    frames = []
    for sid in ("a", "b"):
        x = rng.normal(0, 1, 120)
        z = rng.normal(0, 1, 120)
        y = np.zeros(120)
        y[1:] = 3.0 * x[:-1] + 2.0 * z[1:]
        frames.append(pd.DataFrame(
            {"unique_id": sid, "ds": ts, "y": y, "x": x, "z": z}))
    pdf = pd.concat(frames)
    hist = pdf[pdf["ds"] < ts[115]]
    future = pdf[pdf["ds"] >= ts[115]][["unique_id", "ds", "z"]]
    truth = pdf[pdf["ds"] >= ts[115]][["unique_id", "ds", "y", "x", "z"]]
    return spark.createDataFrame(hist), spark.createDataFrame(future), truth


def test_recursive_forecaster_covariates_recover_signal(covariate_panel, spark):
    hist, future, truth = covariate_panel
    m = P.RecursiveForecaster(
        lags=[1], past_covariates=["x"], past_covariate_lags=[1],
        future_covariates=["z"],
    ).fit(hist)
    out = m.predict(hist, h=1, future_df=future).toPandas()
    merged = out.merge(truth, on=["unique_id", "ds"])
    # step 1: x_{t-1} is the last observed x, z_t comes from future_df ->
    # prediction matches the generating equation
    assert len(merged) == 2
    assert np.allclose(merged["y_hat"], merged["y"], atol=0.05)


def test_recursive_forecaster_requires_future_df(covariate_panel):
    hist, _future, _ = covariate_panel
    m = P.RecursiveForecaster(lags=[1], future_covariates=["z"]).fit(hist)
    with pytest.raises(ValueError, match="future_df"):
        m.predict(hist, h=2)


def test_direct_forecaster_covariates(covariate_panel):
    hist, future, truth = covariate_panel
    m = P.DirectForecaster(
        lags=[1], past_covariates=["x"], past_covariate_lags=[1],
        future_covariates=["z"],
    ).fit(hist, h=1)
    out = m.predict(hist, future_df=future).toPandas()
    merged = out.merge(truth, on=["unique_id", "ds"])
    assert len(merged) == 2
    assert np.allclose(merged["y_hat"], merged["y"], atol=0.05)


def test_recursive_forecaster_extrapolates_lines(linear_panel):
    m = P.RecursiveForecaster(lags=[1, 2]).fit(linear_panel)
    out = m.predict(linear_panel, h=5).toPandas().sort_values(["unique_id", "ds"])
    s1 = out[out["unique_id"] == "s1"]["y_hat"].to_numpy()
    s2 = out[out["unique_id"] == "s2"]["y_hat"].to_numpy()
    assert np.allclose(s1, 10 + np.arange(80, 85), atol=0.1)
    assert np.allclose(s2, 50 - 0.5 * np.arange(80, 85), atol=0.1)


def test_direct_forecaster(linear_panel):
    m = P.DirectForecaster(lags=[1, 2]).fit(linear_panel, h=3)
    out = m.predict(linear_panel).toPandas()
    s1 = out[out["unique_id"] == "s1"].sort_values("ds")["y_hat"].to_numpy()
    assert np.allclose(s1, [90, 91, 92], atol=0.5)


def test_forecast_pipeline_log_transform(spark):
    ts = pd.date_range("2024-01-01", periods=60, freq="D")
    y = np.exp(0.05 * np.arange(60))  # exponential growth -> linear in log
    df = spark.createDataFrame(pd.DataFrame({"unique_id": "g", "ds": ts, "y": y}))
    m = P.ForecastPipeline(lags=[1, 2], target_transform="log").fit(df)
    out = m.predict(df, h=3).toPandas().sort_values("ds")
    expected = np.exp(0.05 * np.arange(60, 63))
    assert np.allclose(out["y_hat"].to_numpy(), expected, rtol=0.05)


def test_global_forecaster_pools_series(linear_panel):
    m = P.GlobalForecaster(lags=[1, 2]).fit(linear_panel)
    out = m.predict(linear_panel, h=3).toPandas()
    assert set(out["unique_id"]) == {"s1", "s2"}
    s1 = out[out["unique_id"] == "s1"].sort_values("ds")["y_hat"].to_numpy()
    assert np.allclose(s1, [90, 91, 92], atol=1.0)


def test_quantile_regressor_orders_quantiles(spark):
    rng = np.random.default_rng(0)
    ts = pd.date_range("2024-01-01", periods=200, freq="D")
    y = 10 + rng.normal(0, 2, 200)
    df = spark.createDataFrame(pd.DataFrame({"unique_id": "q", "ds": ts, "y": y}))
    m = P.QuantileRegressor(quantiles=(0.1, 0.5, 0.9), lags=(1, 2)).fit(df)
    out = m.predict(df, h=4).toPandas()
    assert ((out["q_0.1"] <= out["q_0.5"]) & (out["q_0.5"] <= out["q_0.9"])).all()


def test_quantile_regressor_small_scale_targets(spark):
    # scale-relative IRLS grid (ADVICE r4): at |y| ~ 1e-3 an absolute
    # 1e-3 quantization floor collapsed every quantile to the mean fit;
    # the decade-relative grid must keep the quantiles spread
    rng = np.random.default_rng(1)
    ts = pd.date_range("2024-01-01", periods=300, freq="D")
    y = 1e-3 * (10 + rng.normal(0, 2, 300))
    df = spark.createDataFrame(pd.DataFrame({"unique_id": "q", "ds": ts, "y": y}))
    m = P.QuantileRegressor(quantiles=(0.1, 0.9), lags=(1, 2)).fit(df)
    out = m.predict(df, h=4).toPandas()
    spread = (out["q_0.9"] - out["q_0.1"]).to_numpy()
    assert (spread > 1e-4).all()  # ~the 10-90 band of N(0, 2e-3)


def test_backtest_and_compare(linear_panel):
    def naive(train, h):
        from polars_ts_spark.operators.baselines import naive_forecast
        return naive_forecast(train, h=h)

    def drift(train, h):
        m = P.RecursiveForecaster(lags=[1, 2]).fit(train)
        return m.predict(train, h=h)

    folds, summary = E.backtest(linear_panel, drift, horizon=5, n_folds=2)
    assert len(folds) == 2
    assert summary[summary["metric"] == "mae"]["mean"].iloc[0] < 0.5  # linear: near-exact

    comp = E.compare_models(linear_panel, {"naive": naive, "ridge": drift}, horizon=5, n_folds=2)
    mae = comp[comp["metric"] == "mae"].set_index("model")["mean"]
    assert mae["ridge"] < mae["naive"]  # ridge beats naive on trends


def test_weighted_ensemble_exact(spark):
    ts = pd.date_range("2024-02-01", periods=3, freq="D")
    f1 = spark.createDataFrame(pd.DataFrame({"unique_id": "a", "ds": ts, "y_hat": [1.0, 2.0, 3.0]}))
    f2 = spark.createDataFrame(pd.DataFrame({"unique_id": "a", "ds": ts, "y_hat": [3.0, 4.0, 5.0]}))
    out = E.weighted_ensemble({"m1": f1, "m2": f2}).toPandas().sort_values("ds")
    assert np.allclose(out["y_hat"], [2.0, 3.0, 4.0])
    out2 = E.weighted_ensemble({"m1": f1, "m2": f2}, {"m1": 3.0, "m2": 1.0}).toPandas().sort_values("ds")
    assert np.allclose(out2["y_hat"], [1.5, 2.5, 3.5])


def test_stacking_learns_weights(linear_panel):
    def good(train, h):
        return P.RecursiveForecaster(lags=[1, 2]).fit(train).predict(train, h)

    def bad(train, h):
        from polars_ts_spark.operators.baselines import naive_forecast
        return naive_forecast(train, h=h)

    m = E.StackingForecaster({"good": good, "bad": bad}).fit(linear_panel, holdout=5)
    out = m.predict(linear_panel, h=3).toPandas()
    s1 = out[out["unique_id"] == "s1"].sort_values("ds")["y_hat"].to_numpy()
    assert np.allclose(s1, [90, 91, 92], atol=1.0)  # meta puts weight on `good`


def test_conformal_coverage(spark):
    rng = np.random.default_rng(1)
    ts = pd.date_range("2024-01-01", periods=400, freq="D")
    calib = pd.DataFrame({
        "unique_id": "c", "ds": ts, "y": rng.normal(0, 1, 400), "y_hat": 0.0,
    })
    fc = pd.DataFrame({
        "unique_id": "c",
        "ds": pd.date_range("2025-02-05", periods=5, freq="D"),
        "y_hat": 0.0,
    })
    out = E.conformal_interval(
        spark.createDataFrame(calib), spark.createDataFrame(fc), coverage=0.9
    ).toPandas()
    # |N(0,1)| 90th percentile ~= 1.645
    assert out["y_hat_upper"].iloc[0] == pytest.approx(1.645, abs=0.15)
    assert out["y_hat_lower"].iloc[0] == pytest.approx(-1.645, abs=0.15)
    new = E.conformal_interval(
        spark.createDataFrame(calib), spark.createDataFrame(fc), coverage=0.9, symmetric=False
    ).toPandas()
    assert (new["y_hat_lower"] <= new["y_hat_upper"]).all()


def test_reconcile_bottom_up(spark):
    ts = pd.to_datetime(["2024-01-01", "2024-01-02"])
    rows = []
    for sid, vals in {"a1": [1.0, 2.0], "a2": [3.0, 4.0], "b1": [5.0, 6.0]}.items():
        rows.append(pd.DataFrame({"unique_id": sid, "ds": ts, "y_hat": vals}))
    bottom = spark.createDataFrame(pd.concat(rows))
    hierarchy = {"a1": "A", "a2": "A", "b1": "B", "A": "total", "B": "total"}
    out = E.reconcile_bottom_up(bottom, hierarchy).toPandas()
    d = {(r["unique_id"], str(r["ds"])[:10]): r["y_hat"] for _, r in out.iterrows()}
    assert d[("A", "2024-01-01")] == 4.0
    assert d[("B", "2024-01-02")] == 6.0
    assert d[("total", "2024-01-01")] == 9.0


def test_reconcile_top_down(spark):
    ts = pd.to_datetime(["2024-01-01", "2024-01-02"])
    hist = spark.createDataFrame(pd.concat([
        pd.DataFrame({"unique_id": "a1", "ds": ts, "y": [1.0, 1.0]}),
        pd.DataFrame({"unique_id": "a2", "ds": ts, "y": [3.0, 3.0]}),
    ]))
    tot = spark.createDataFrame(pd.DataFrame({
        "ds": pd.to_datetime(["2024-01-03"]), "y_hat": [8.0]}))
    out = E.reconcile_top_down(hist, tot, {"a1": "total", "a2": "total"}).toPandas()
    d = dict(zip(out["unique_id"], out["y_hat"]))
    assert d["a1"] == pytest.approx(2.0) and d["a2"] == pytest.approx(6.0)


def test_reconcile_ols_coherent(spark):
    ts = pd.to_datetime(["2024-01-01"])
    rows = []
    for sid, v in {"a1": 1.0, "a2": 3.0, "A": 5.0}.items():  # incoherent: 1+3 != 5
        rows.append(pd.DataFrame({"unique_id": sid, "ds": ts, "y_hat": [v]}))
    fc = spark.createDataFrame(pd.concat(rows))
    out = E.reconcile_ols(fc, {"a1": "A", "a2": "A"}).toPandas()
    d = dict(zip(out["unique_id"], out["y_hat"]))
    assert d["A"] == pytest.approx(d["a1"] + d["a2"], abs=1e-9)  # now coherent


def _incoherent_fc(spark):
    ts = pd.to_datetime(["2024-01-01", "2024-01-02"])
    vals = {"a1": [1.0, 2.0], "a2": [3.0, 1.0], "A": [5.0, 4.0]}
    return spark.createDataFrame(pd.concat(
        pd.DataFrame({"unique_id": sid, "ds": ts, "y_hat": v}) for sid, v in vals.items()
    ))


def test_reconcile_permbu_coherent_and_weighted(spark):
    fc = _incoherent_fc(spark)
    rng = np.random.default_rng(4)
    hist_ts = pd.date_range("2023-01-01", periods=40, freq="D")
    res = pd.concat(
        pd.DataFrame({"unique_id": sid, "ds": hist_ts,
                      "residual": rng.normal(0, sd, 40)})
        for sid, sd in {"a1": 0.1, "a2": 5.0, "A": 1.0}.items()
    )
    out = E.reconcile_permbu(fc, {"a1": "A", "a2": "A"},
                             spark.createDataFrame(res)).toPandas()
    piv = out.pivot(index="ds", columns="unique_id", values="y_hat")
    assert np.allclose(piv["A"], piv["a1"] + piv["a2"], atol=1e-9)  # coherent
    # a1 has tiny residual variance -> MinT trusts it: its base forecast
    # moves less than the noisy a2's
    base = {"a1": 1.0, "a2": 3.0}
    first = piv.iloc[0]
    assert abs(first["a1"] - base["a1"]) < abs(first["a2"] - base["a2"])


def test_reconcile_mint_cv_coherent(spark):
    fc = _incoherent_fc(spark)
    hist_ts = pd.date_range("2023-01-01", periods=30, freq="D")
    rng = np.random.default_rng(5)
    train = pd.concat(
        pd.DataFrame({"unique_id": sid, "ds": hist_ts, "y": rng.normal(m, 1, 30)})
        for sid, m in {"a1": 1.0, "a2": 3.0, "A": 4.0}.items()
    )
    out = E.reconcile_mint_cv(fc, {"a1": "A", "a2": "A"},
                              spark.createDataFrame(train), n_folds=3).toPandas()
    piv = out.pivot(index="ds", columns="unique_id", values="y_hat")
    assert np.allclose(piv["A"], piv["a1"] + piv["a2"], atol=1e-9)


def test_reconcile_ols_interval_cols(spark):
    ts = pd.to_datetime(["2024-01-01"])
    rows = pd.concat(
        pd.DataFrame({"unique_id": sid, "ds": ts, "y_hat": [v],
                      "lo": [v - 1], "hi": [v + 1]})
        for sid, v in {"a1": 1.0, "a2": 3.0, "A": 5.0}.items()
    )
    out = E.reconcile_ols(spark.createDataFrame(rows), {"a1": "A", "a2": "A"},
                          interval_cols=["lo", "hi"]).toPandas()
    d = out.set_index("unique_id")
    for c in ("y_hat", "lo", "hi"):
        assert d.loc["A", c] == pytest.approx(d.loc["a1", c] + d.loc["a2", c], abs=1e-9)


def test_crps_and_calibration(spark):
    rng = np.random.default_rng(2)
    n = 500
    y = rng.normal(0, 1, n)
    pdf = pd.DataFrame({
        "y": y, "q_0.1": -1.2816, "q_0.5": 0.0, "q_0.9": 1.2816,
    })
    df = spark.createDataFrame(pdf)
    qc = {0.1: "q_0.1", 0.5: "q_0.5", 0.9: "q_0.9"}
    c = E.crps(df, qc).collect()[0]["crps"]
    assert 0 < c < 1
    cal = E.calibration_table(df, qc).toPandas()
    for _, r in cal.iterrows():
        assert r["observed"] == pytest.approx(r["expected"], abs=0.06)


def test_bias_correct(spark):
    pdf = pd.DataFrame({
        "unique_id": ["a"] * 4, "y": [1.0, 2.0, 3.0, 4.0], "y_hat": [2.0, 3.0, 4.0, 5.0],
    })
    out = E.bias_correct(spark.createDataFrame(pdf)).toPandas()
    assert np.allclose(out["y_hat_corrected"], out["y"])  # constant +1 bias removed


def test_permutation_importance(spark):
    from polars_ts_spark.functions.numutils import RidgeEstimator
    rng = np.random.default_rng(3)
    n = 300
    pdf = pd.DataFrame({
        "x1": rng.normal(0, 1, n), "x2": rng.normal(0, 1, n),
    })
    pdf["y"] = 5 * pdf["x1"] + 0.01 * pdf["x2"]
    imp = E.permutation_importance(
        spark.createDataFrame(pdf), ["x1", "x2"], "y", RidgeEstimator()
    )
    assert imp.iloc[0]["feature"] == "x1"
    assert imp.iloc[0]["importance"] > 10 * max(imp.iloc[1]["importance"], 1e-9)


# ---------------------------------------------------------------------------
# scale discipline: the model-fit layer must never ship unbounded frames
# to the driver (round-6 verdict "What's wrong" #1-#4)


def _spy_driver_transfers(monkeypatch):
    """Patch DataFrame.collect to record collected row counts and
    DataFrame.toPandas to fail outright — fit paths under test must use
    O(1)-row sufficient-statistics collects only."""
    try:  # pyspark >= 4 routes execution through the classic subclass
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame

    sizes = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    def no_pandas(self):
        raise AssertionError("toPandas() called in a fit path that must stay distributed")

    monkeypatch.setattr(DataFrame, "collect", spy)
    monkeypatch.setattr(DataFrame, "toPandas", no_pandas)
    return sizes


def test_global_forecaster_fit_never_collects_id_list(linear_panel, monkeypatch):
    sizes = _spy_driver_transfers(monkeypatch)
    m = P.GlobalForecaster(lags=[1, 7]).fit(linear_panel)
    assert sizes and max(sizes) == 1  # only the sufficient-stats row
    assert not hasattr(m, "id_codes")  # the driver dict is gone
    assert "__id_code" in m.code_df.columns


def test_quantile_regressor_fit_never_collects_design_matrix(linear_panel, monkeypatch):
    sizes = _spy_driver_transfers(monkeypatch)
    lags, quantiles = (1,), (0.1, 0.9)
    m = P.QuantileRegressor(quantiles=quantiles, lags=lags, n_irls=3).fit(linear_panel)
    # every driver transfer is MODEL-sized, never data-sized, and there
    # are exactly TWO of them (ADVICE r12 — assert the transfer
    # structure, not just a hardcoded max): the 1-row start-stats agg,
    # then the (n_lags+1) x n_quantiles weight rows from the one-task
    # IRLS job. A data-sized collect would either add a transfer or
    # blow the derived bound.
    bound = (len(lags) + 1) * len(quantiles)
    assert len(sizes) == 2
    assert sizes[0] == 1  # the start-stats row
    assert sizes[1] <= bound  # the weight rows
    assert set(m.weights) == set(quantiles)


def test_stacking_fit_never_collects_prediction_frame(linear_panel, monkeypatch):
    def ridge_fn(train, h):
        return P.RecursiveForecaster(lags=[1]).fit(train).predict(train, h)

    sizes = _spy_driver_transfers(monkeypatch)
    m = E.StackingForecaster({"r1": ridge_fn, "r2": ridge_fn}).fit(linear_panel, holdout=7)
    assert sizes and max(sizes) <= 80  # stats rows + the timestamp axis
    assert len(m.meta) == 3  # two base weights + intercept


def test_sklearn_fallback_design_matrix_gate(linear_panel, monkeypatch):
    class TinyEstimator:  # sklearn protocol, driver fit by contract
        def fit(self, X, y):
            self.w = np.linalg.lstsq(np.column_stack([X, np.ones(len(X))]), y, rcond=None)[0]
            return self

        def predict(self, X):
            return np.column_stack([X, np.ones(len(X))]) @ self.w

    monkeypatch.setattr(P, "_XY_ELEMS_CAP", 10)
    with pytest.raises(ValueError, match="driver-collect cap"):
        P.RecursiveForecaster(estimator=TinyEstimator(), lags=[1]).fit(linear_panel)
    monkeypatch.setattr(P, "_XY_ELEMS_CAP", 32_000_000)
    m = P.RecursiveForecaster(estimator=TinyEstimator(), lags=[1]).fit(linear_panel)
    assert m.feat_cols == ["y_lag_1"]


def test_backtest_folds_run_concurrently(linear_panel):
    import threading
    import time

    from polars_ts_spark.operators import baselines

    state = {"active": 0, "peak": 0}
    lock = threading.Lock()

    def model_fn(train, h):
        with lock:
            state["active"] += 1
            state["peak"] = max(state["peak"], state["active"])
        time.sleep(0.4)
        try:
            return baselines.naive_forecast(train, h=h)
        finally:
            with lock:
                state["active"] -= 1

    E.backtest(linear_panel, model_fn, horizon=7, n_folds=3)
    assert state["peak"] >= 2  # folds overlapped, not sequential barriers


def test_enbpi_rejects_zero_bootstraps():
    with pytest.raises(ValueError, match="n_bootstraps >= 1"):
        E.EnbPI(lambda: None, n_bootstraps=0)


def test_enbpi_residual_gate(linear_panel, monkeypatch):
    monkeypatch.setattr(E, "_ENBPI_RESID_CAP", 1)
    m = E.EnbPI(lambda: P.RecursiveForecaster(lags=[1]), n_bootstraps=2)
    with pytest.raises(ValueError, match="driver cap"):
        m.fit(linear_panel)


def test_synthetic_control_gate(linear_panel, monkeypatch):
    from polars_ts_spark.operators import causal

    monkeypatch.setattr(causal, "_DRIVER_ROWS_CAP", 1)
    with pytest.raises(ValueError, match="driver-collect cap"):
        causal.synthetic_control(linear_panel, "s1", "2024-03-01")

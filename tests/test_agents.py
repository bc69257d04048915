"""Agent layer: curator diagnostics on planted structure, cleaning,
planner branch heuristics, forecaster selection/ensemble, the full
scientist chain, and the LLM-hook contract."""

import numpy as np
import pandas as pd
import pytest

from polars_ts_spark.agents import (
    CuratorAgent,
    ForecasterAgent,
    PlannerAgent,
    ReporterAgent,
    TimeSeriesScientist,
)
from polars_ts_spark.agents.curator import CurationReport, _series_diagnostics
from polars_ts_spark.agents.planner import ForecastPlan


def _panel(spark, n=120, n_series=3, period=7, trend=0.5, noise=1.0, seed=0):
    rng = np.random.default_rng(seed)
    ts = pd.date_range("2024-01-01", periods=n, freq="D")
    frames = []
    for i in range(n_series):
        y = (100.0 + 10 * i + trend * np.arange(n)
             + 10 * np.sin(2 * np.pi * np.arange(n) / period)
             + noise * rng.normal(0, 1, n))
        frames.append(pd.DataFrame({"unique_id": f"s{i}", "ds": ts, "y": y}))
    return spark.createDataFrame(pd.concat(frames))


def test_series_diagnostics_planted():
    n = 140
    seasonal = 20 * np.sin(2 * np.pi * np.arange(n) / 12)
    period, _, _, _ = _series_diagnostics(seasonal)
    assert period == 12            # autocorr peak at the planted period
    trended = 0.8 * np.arange(n)
    _, trend, stationary, _ = _series_diagnostics(trended)
    assert trend                   # slope*n dwarfs the range threshold
    assert not stationary          # trend shifts the half-means
    flat = np.ones(50)
    p2, t2, s2, l2 = _series_diagnostics(flat)
    assert p2 is None and not t2 and l2 is None
    assert not s2  # reference quirk: zero-variance var_ratio=0 flags non-stationary
    noisy = np.random.default_rng(0).normal(0, 1, 100)
    _, _, s3, _ = _series_diagnostics(noisy)
    assert s3  # white noise IS stationary


def test_curator_counts_and_clean(spark):
    df = _panel(spark, n=60, n_series=2)
    pdf = df.toPandas()
    pdf.loc[pdf.index[5], "y"] = np.nan
    pdf.loc[pdf.index[70], "y"] = 10_000.0  # >3 sigma outlier
    df2 = spark.createDataFrame(pdf)
    cur = CuratorAgent()
    rep = cur.curate(df2)
    assert rep.n_series == 2 and rep.n_observations == 120
    assert rep.n_missing == 1 and rep.n_outliers >= 1
    cleaned = cur.curate_and_clean(df2).toPandas()
    assert cleaned["y"].notna().all()
    assert cleaned["y"].max() < 10_000.0  # outlier clipped


def test_planner_branches():
    def rep(n_obs, n_series=1, trend=False, period=None):
        return CurationReport(n_obs, n_series, 0, 0, period, trend, True, None, "")

    short = PlannerAgent(horizon=5).plan(rep(20))
    assert short.candidates == ["naive", "ses"] and not short.ensemble
    rich = PlannerAgent(horizon=5).plan(rep(100, trend=True, period=7))
    assert {"naive", "moving_average", "holt", "holt_winters", "ses"} == set(rich.candidates)
    assert rich.ensemble and rich.config["holt_winters"]["season_length"] == 7
    assert 3 <= rich.config["moving_average"]["window"] <= 30


def test_forecaster_selects_and_blends(spark):
    df = _panel(spark, n=100, trend=0.0, period=7, noise=0.5)
    plan = ForecastPlan(candidates=["naive", "ses", "moving_average"], horizon=7,
                        rationale="", config={"moving_average": {"window": 7}},
                        ensemble=True)
    res = ForecasterAgent().forecast(df, plan)
    assert set(res.model_scores) == {"naive", "ses", "moving_average"}
    assert res.best_model.startswith("ensemble(")
    assert res.ensemble_weights and abs(sum(res.ensemble_weights.values()) - 1.0) < 1e-9
    out = res.predictions.toPandas()
    assert len(out) == 3 * 7 and out["y_hat"].notna().all()
    # single-best path
    plan2 = ForecastPlan(candidates=["naive", "ses"], horizon=7, rationale="")
    res2 = ForecasterAgent().forecast(df, plan2)
    assert res2.best_model in {"naive", "ses"} and not res2.ensemble_weights


def test_scientist_chain_and_llm_hook(spark):
    df = _panel(spark, n=120)
    res = TimeSeriesScientist(horizon=5).run(df)
    assert len(res.predictions.toPandas()) == 3 * 5
    assert "# Forecast Report" in res.report
    assert [h["agent"] for h in res.context.history][0] == "curator"

    class FakeLLM:
        def __init__(self):
            self.prompts = []

        def complete(self, prompt):
            self.prompts.append(prompt)
            return "LLM SUMMARY"

    llm = FakeLLM()
    res2 = TimeSeriesScientist(horizon=5, backend=llm).run(df)
    assert res2.report.startswith("## Executive Summary")
    assert any("<report>" in p for p in llm.prompts)  # injection-delimited


def test_reporter_structure():
    rep = CurationReport(100, 2, 0, 1, 7, True, False, 30, "sum")
    plan = ForecastPlan(["naive", "holt"], 5, "because")
    from polars_ts_spark.agents.forecaster import ForecastAgentResult

    result = ForecastAgentResult(predictions=None, best_model="holt",
                                 model_scores={"naive": 2.0, "holt": 1.0})
    md = ReporterAgent().report(rep, plan, result).markdown
    for frag in ("## Data Diagnostics", "## Model Selection",
                 "## Forecast Results", "**Best model**: holt",
                 "**Detected period**: 7", "**Recommended lookback**: 30"):
        assert frag in md


def test_anomaly_agents_scalar_and_distributed(spark):
    """The three detector agents flag a planted spike; the distributed
    consensus plan agrees with the scalar agents at the spike row."""
    from polars_ts_spark.agents.anomaly import (
        AnomalyOrchestrator,
        ConsensusAgent,
        MADAgent,
        RollingStdAgent,
        ZScoreAgent,
        consensus_anomalies,
    )

    rng = np.random.default_rng(4)
    n = 80
    y = 10 + rng.normal(0, 1, n)
    y[60] = 60.0  # planted spike
    win = np.concatenate([y[41:60], [y[60]]])  # trailing 19 + value
    for agent in (ZScoreAgent(), RollingStdAgent(), MADAgent()):
        score, flag = agent.detect(win)
        assert flag and score > 3.0
    normal_win = np.concatenate([y[20:39], [y[39]]])
    flags = [a.detect(normal_win)[1] for a in (ZScoreAgent(), RollingStdAgent(), MADAgent())]
    assert not ConsensusAgent("majority").decide(flags, [0.0] * 3)
    assert ConsensusAgent("any").decide([True, False, False], [0.0] * 3)
    assert ConsensusAgent("weighted", [0.7, 0.2, 0.1]).decide(
        [True, False, False], [0.0] * 3)

    ts = pd.date_range("2024-01-01", periods=n, freq="D")
    df = spark.createDataFrame(pd.DataFrame({"unique_id": "s", "ds": ts, "y": y}))
    out = consensus_anomalies(df).toPandas().set_index("ds")
    spike_day = ts[60]
    assert bool(out.loc[spike_day, "is_anomaly"])
    assert int(out["is_anomaly"].sum()) <= 3  # spike (+ shadowed neighbors at most)
    res = AnomalyOrchestrator().run(df)
    assert res.history and res.detections.count() == n - 19


def test_energy_grid_orchestrator(spark):
    from polars_ts_spark.agents.energy import (
        DemandForecastAgent,
        DemandResponseAgent,
        EnergyGridOrchestrator,
        GridHierarchy,
        WeatherContextAgent,
    )

    # scalar agents: seasonal repeat, mean fallback, degree-day shape,
    # energy-conserving peak shaving
    fc = DemandForecastAgent(season=4).forecast(np.array([1.0, 2, 3, 4, 5, 6, 7, 8]), 6)
    assert fc.tolist() == [5, 6, 7, 8, 5, 6]
    assert DemandForecastAgent(season=10).forecast(np.array([2.0, 4.0]), 3).tolist() == [3, 3, 3]
    adj = WeatherContextAgent().adjust(np.zeros(3), np.array([18.0, 28.0, 8.0]))
    assert adj.tolist() == [0.0, 20.0, 30.0]
    shifted, energy = DemandResponseAgent(capacity=5.0).optimize(
        np.array([1.0, 8.0, 2.0, 1.0]))
    assert energy == pytest.approx(3.0)
    assert shifted.max() <= 5.0 + 1e-9
    assert shifted.sum() == pytest.approx(12.0)

    # distributed chain: two grids x two households, 8-step histories
    hier = GridHierarchy("region", {"g1": ["h1", "h2"], "g2": ["h3"]})
    ts = pd.date_range("2024-01-01", periods=8, freq="h")
    frames = [pd.DataFrame({"unique_id": h, "ds": ts, "y": base + np.arange(8) % 4})
              for h, base in (("h1", 10.0), ("h2", 20.0), ("h3", 30.0))]
    panel = spark.createDataFrame(pd.concat(frames))
    res = EnergyGridOrchestrator(season=4, horizon=4).run(
        panel, hier, generation=np.full(4, 5.0), capacity=70.0)
    out = res.reconciled.toPandas()
    piv = out.pivot(index="ds", columns="unique_id", values="y_hat")
    # coherence: region == g1 + g2 == h1 + h2 + h3 at every step
    assert np.allclose(piv["region"], piv[["h1", "h2", "h3"]].sum(axis=1))
    assert np.allclose(piv["g1"], piv[["h1", "h2"]].sum(axis=1))
    # seasonal naive at household level: last cycle repeats
    assert np.allclose(piv["h1"].to_numpy(), 10.0 + np.arange(4) % 4)
    # renewables netted off the region profile
    assert np.allclose(res.region_net_demand,
                       piv["region"].to_numpy() - 5.0)
    with pytest.raises(ValueError, match="missing histories"):
        EnergyGridOrchestrator(season=4, horizon=4).run(
            panel, GridHierarchy("region", {"g1": ["h1", "nope"]}))


def test_supply_chain_agents(spark):
    from polars_ts_spark.agents.supply_chain import (
        DemandSensingAgent,
        EchelonCoordinatorAgent,
        InventoryAgent,
        PromotionEffectAgent,
        SupplyChainOrchestrator,
    )

    # promo lift: planted 50% uplift recovered by diff-in-means
    sales = np.array([10.0, 10, 10, 15, 15, 15])
    flags = np.array([0, 0, 0, 1, 1, 1], dtype=bool)
    lift = PromotionEffectAgent().estimate(sales, flags)
    assert lift == pytest.approx(0.5)
    assert PromotionEffectAgent().estimate(sales, np.ones(6, bool)) == 0.0
    # sensing fuses weighted signals and floors at zero
    sensed = DemandSensingAgent({"social": 2.0}).sense(
        np.array([10.0, 10.0]), {"social": np.array([0.1, -1.0])})
    assert sensed.tolist() == [12.0, 0.0]
    # base-stock policy
    ro = InventoryAgent(lead_time=2).reorder(np.array([5.0, 5, 5, 5]), on_hand=3.0)
    assert ro["order_qty"] == pytest.approx(ro["order_up_to"] - 3.0)
    assert ro["stockout_risk"] == 1.0
    # echelon smoothing reduces variance -> bullwhip < 1 for noisy demand
    rng = np.random.default_rng(0)
    coord = EchelonCoordinatorAgent(n_echelons=2).coordinate(
        10 + rng.normal(0, 2, 50))
    assert coord["bullwhip_ratio"] < 1.0
    assert len(coord["echelon_orders"]) == 3

    # distributed panel pass: one result block per series
    ts = pd.date_range("2024-01-01", periods=28, freq="D")
    panel = spark.createDataFrame(pd.concat([
        pd.DataFrame({"unique_id": s, "ds": ts,
                      "y": 50.0 + 10 * (np.arange(28) % 7),
                      "promo": (np.arange(28) % 9 == 0)})
        for s in ("a", "b")
    ]))
    out = SupplyChainOrchestrator().run_panel(
        panel, horizon=7, promo_col="promo",
        promo_schedule=np.zeros(7)).toPandas()
    assert len(out) == 14 and set(out["unique_id"]) == {"a", "b"}
    a = out[out["unique_id"] == "a"].sort_values("step")
    assert np.allclose(a["sensed"], 50.0 + 10 * (np.arange(7) % 7))


def test_healthcare_agents(spark):
    from polars_ts_spark.agents.healthcare import (
        EscalationAgent,
        SepsisWarningAgent,
        TreatmentAgent,
        VitalMonitorAgent,
        clinical_escalation,
        federated_average,
    )

    septic = np.array([120.0, 85.0, 28.0, 39.5, 88.0])   # hr sbp rr temp spo2
    healthy = np.array([75.0, 120.0, 16.0, 37.0, 98.0])
    risk, flag = SepsisWarningAgent().score(septic)
    assert flag and risk >= 4
    assert not SepsisWarningAgent().score(healthy)[1]
    nd, any_ = VitalMonitorAgent().score(septic)
    assert any_ and nd == 5.0
    assert VitalMonitorAgent().score(healthy) == (0.0, False)
    esc = EscalationAgent()
    assert esc.decide(septic, True, 5.0) == 3
    assert esc.decide(healthy, False, 0.0) == 0

    # bandit learns the rewarded action for a tier
    t = TreatmentAgent()
    for _ in range(20):
        t.update(2, 1, 1.0)
        t.update(2, 2, 0.0)
    assert t.recommend(2) == 1
    fa = federated_average([np.ones((2, 2)), 3 * np.ones((2, 2))], [1.0, 3.0])
    assert np.allclose(fa, 2.5)

    # distributed scoring matches the scalar agents row for row
    pdf = pd.DataFrame([septic, healthy], columns=["hr", "sbp", "rr", "temp", "spo2"])
    out = clinical_escalation(spark.createDataFrame(pdf)).toPandas()
    for i, row in enumerate([septic, healthy]):
        assert out.loc[i, "sepsis_risk"] == SepsisWarningAgent().score(row)[0]
        assert out.loc[i, "n_deranged"] == VitalMonitorAgent().score(row)[0]
        assert out.loc[i, "news"] == EscalationAgent().news_score(row)
        exp_tier = EscalationAgent().decide(
            row, SepsisWarningAgent().score(row)[1], VitalMonitorAgent().score(row)[0])
        assert out.loc[i, "tier"] == exp_tier


def test_iiot_agents(spark):
    from polars_ts_spark.agents.iiot import (
        HealthIndexAgent,
        MaintenanceOrchestrator,
        MaintenanceSchedulerAgent,
        RULEstimator,
        SpectralFeatureAgent,
        machine_health_panel,
    )

    # spectral features: band fractions sum to ~1; low-freq sine
    # concentrates in the first band
    t = np.arange(256)
    feats = SpectralFeatureAgent(n_bands=3).extract(np.sin(2 * np.pi * t / 128))
    assert feats[1:].sum() == pytest.approx(1.0, abs=1e-9)
    assert feats[1] > 0.9
    # health declines as RMS grows past the baseline
    agent = HealthIndexAgent(baseline=np.array([1.0]), fail_ratio=3.0)
    assert agent.score(np.array([[1.0]])) == pytest.approx(1.0, abs=1e-9)
    assert agent.score(np.array([[3.0]])) == pytest.approx(0.0, abs=1e-6)
    # RUL: linear decline from 1.0 by 0.1/step hits 0.2 in 8 steps
    h = 1.0 - 0.1 * np.arange(5)
    assert RULEstimator(0.2).estimate(h) == pytest.approx(4.0, rel=1e-6)
    assert RULEstimator().estimate(np.ones(5)) == float("inf")
    # Q-learning: rewarded maintenance at low health wins greedily
    s = MaintenanceSchedulerAgent(seed=1)
    for _ in range(50):
        s.update(0, 1, 1.0, 5)
        s.update(0, 0, -1.0, 0)
    assert s.act(0) == 1
    # orchestrator end-to-end on a degrading machine
    sensors = (1.0 + 0.05 * np.arange(40))[:, None]
    res = MaintenanceOrchestrator().run(sensors)
    assert res.health[0] > res.health[-1]
    assert np.isfinite(res.rul)

    # distributed surface matches the scalar chain per machine
    ts_ = pd.date_range("2024-01-01", periods=40, freq="h")
    df = spark.createDataFrame(pd.DataFrame({
        "unique_id": "m1", "ds": ts_, "y": sensors[:, 0]}))
    out = machine_health_panel(df).toPandas().sort_values("ds")
    assert np.allclose(out["health"].to_numpy(), res.health, atol=1e-9)
    assert out["rul"].iloc[0] == pytest.approx(res.rul, rel=1e-9)


def test_marl_portfolio_agents(spark):
    from polars_ts_spark.agents.marl import (
        AllocationAgent,
        MARLOrchestrator,
        PortfolioEnv,
        ReturnAgent,
        RiskAgent,
        portfolio_allocation_panel,
    )

    rng = np.random.default_rng(7)
    n, k = 60, 3
    rets = rng.normal(0.001, 0.02, (n, k)) + np.array([0.002, 0.0, -0.002])
    # scalar agents: weights sum to 1 and favour high return / low risk
    w = AllocationAgent().allocate(RiskAgent().assess(rets),
                                   ReturnAgent().predict(rets), k)
    assert w.sum() == pytest.approx(1.0) and (w >= 0).all()
    env = PortfolioEnv(rets, window_size=20)
    env.reset()
    _, reward, _, info = env.step(np.ones(k) / k)
    assert info["portfolio_return"] == pytest.approx(
        float(np.dot(np.ones(k) / k, rets[20])))
    res = MARLOrchestrator(window_size=20).run(rets)
    assert res.weights_history.shape == (n - 20, k)
    assert np.isfinite(res.sharpe_ratio)

    # distributed plan reproduces the driver loop step for step
    prices = 100.0 * np.exp(np.cumsum(rets, axis=0))
    ts = pd.date_range("2024-01-01", periods=n, freq="D")
    frames = [pd.DataFrame({"unique_id": f"a{j}", "ds": ts, "y": prices[:, j]})
              for j in range(k)]
    out = (portfolio_allocation_panel(spark.createDataFrame(pd.concat(frames)))
           .toPandas().sort_values(["step", "unique_id"]))
    # panel log-returns lose the first price row: env over rets[1:]
    ref = MARLOrchestrator(window_size=20).run(rets[1:])
    got_w = out.pivot(index="step", columns="unique_id", values="weight").to_numpy()
    assert np.allclose(got_w, ref.weights_history, atol=1e-9)
    got_pr = out.groupby("step")["portfolio_return"].first().to_numpy()
    assert np.allclose(got_pr, ref.portfolio_returns, atol=1e-9)

"""Supply-chain demand-sensing agents (ref supply_chain_agents/:
agents.py:16-166, orchestrator.py:47-170).

The reference runs the pipeline for ONE SKU at a time on the driver;
the Spark-first surface keeps those scalar agents for parity and adds
``run_panel``, which executes the ENTIRE chain — seasonal baseline,
promotion-lift estimate + application, signal fusion, base-stock
reorder decision, multi-echelon smoothing with the bullwhip ratio —
for EVERY series in one per-series applyInPandas pass (the per-SKU
state is a handful of scalars, the natural sharded unit)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from polars_ts_spark.operators.kernel import for_each_series
from polars_ts_spark.panel import ID, TARGET, TIME


class DemandSensingAgent:
    """sensed = clip(baseline * (1 + sum_i w_i * signal_i), 0, inf)."""

    def __init__(self, weights: dict[str, float] | None = None):
        self.weights = weights or {}

    def sense(self, baseline: np.ndarray,
              signals: dict[str, np.ndarray] | None = None) -> np.ndarray:
        base = np.asarray(baseline, float)
        if not signals:
            return base.copy()
        uplift = np.zeros_like(base)
        for name, sig in signals.items():
            sig = np.asarray(sig, float)
            if sig.shape != base.shape:
                raise ValueError(f"signal {name!r} must match the forecast horizon")
            uplift += self.weights.get(name, 1.0) * sig
        return np.clip(base * (1.0 + uplift), 0.0, None)


class PromotionEffectAgent:
    """Difference-in-means multiplicative lift, applied on scheduled
    periods."""

    def estimate(self, sales: np.ndarray, promo_flags: np.ndarray) -> float:
        sales = np.asarray(sales, float)
        promo = np.asarray(promo_flags, bool)
        if sales.shape != promo.shape:
            raise ValueError("sales and promo_flags must have the same length")
        if not promo.any() or promo.all():
            return 0.0
        base_mean = float(sales[~promo].mean())
        if base_mean <= 0.0:
            return 0.0
        return float(sales[promo].mean()) / base_mean - 1.0

    def apply(self, forecast: np.ndarray, promo_schedule: np.ndarray,
              lift: float) -> np.ndarray:
        f = np.asarray(forecast, float)
        sch = np.asarray(promo_schedule, float)
        if sch.shape != f.shape:
            raise ValueError("promo_schedule must match the forecast horizon")
        return f * (1.0 + lift * sch)


class InventoryAgent:
    """Base-stock (order-up-to) policy over the lead-time window."""

    def __init__(self, lead_time: int = 1, safety_factor: float = 1.65):
        if lead_time < 1:
            raise ValueError("lead_time must be >= 1")
        self.lead_time = lead_time
        self.safety_factor = safety_factor

    def reorder(self, demand_forecast: np.ndarray, on_hand: float) -> dict[str, float]:
        f = np.asarray(demand_forecast, float)
        lead_demand = float(f[: self.lead_time].sum())
        std = float(f.std()) if f.size > 1 else 0.0
        safety = self.safety_factor * std * np.sqrt(self.lead_time)
        order_up_to = lead_demand + safety
        return {
            "order_up_to": order_up_to,
            "safety_stock": float(safety),
            "order_qty": max(order_up_to - on_hand, 0.0),
            "stockout_risk": 1.0 if on_hand < lead_demand else 0.0,
        }


class EchelonCoordinatorAgent:
    """Exponential smoothing per echelon; bullwhip = var amplification
    bottom -> top."""

    def __init__(self, n_echelons: int = 2, smoothing: float = 0.5):
        if n_echelons < 1:
            raise ValueError("n_echelons must be >= 1")
        if not 0.0 < smoothing <= 1.0:
            raise ValueError("smoothing must be in (0, 1]")
        self.n_echelons = n_echelons
        self.smoothing = smoothing

    def _smooth(self, series: np.ndarray) -> np.ndarray:
        out = np.empty_like(series)
        level = float(series[0])
        for i, v in enumerate(series):
            level = self.smoothing * float(v) + (1.0 - self.smoothing) * level
            out[i] = level
        return out

    def coordinate(self, demand: np.ndarray) -> dict[str, Any]:
        demand = np.asarray(demand, float)
        orders = [demand]
        for _ in range(self.n_echelons):
            orders.append(self._smooth(orders[-1]))
        bullwhip = float(np.var(orders[-1]) / (float(np.var(demand)) + 1e-12))
        return {"echelon_orders": orders, "bullwhip_ratio": bullwhip}


@dataclass
class SupplyChainResult:
    sensed_demand: np.ndarray
    promo_lift: float
    reorder: dict[str, float]
    echelon_orders: list[np.ndarray]
    bullwhip_ratio: float
    history: list[dict[str, Any]] = field(default_factory=list)


class SupplyChainOrchestrator:
    """The full chain for one SKU (API parity) or every series in a
    panel (``run_panel`` — distributed)."""

    def __init__(self, season: int = 7, lead_time: int = 2, n_echelons: int = 2):
        self.season = season
        self.lead_time = lead_time
        self.n_echelons = n_echelons

    def _baseline(self, pos_history: np.ndarray, horizon: int) -> np.ndarray:
        h = np.asarray(pos_history, float)
        if h.size < self.season:
            return np.full(horizon, float(h.mean()) if h.size else 0.0)
        cycle = h[-self.season:]
        return np.tile(cycle, -(-horizon // self.season))[:horizon]

    def run(self, pos_history: np.ndarray, horizon: int,
            signals: dict[str, np.ndarray] | None = None,
            signal_weights: dict[str, float] | None = None,
            promo_history: tuple[np.ndarray, np.ndarray] | None = None,
            promo_schedule: np.ndarray | None = None,
            on_hand: float = 0.0,
            base_forecast: np.ndarray | None = None) -> SupplyChainResult:
        baseline = (np.asarray(base_forecast, float) if base_forecast is not None
                    else self._baseline(pos_history, horizon))
        if baseline.shape[0] != horizon:
            raise ValueError(f"baseline length {baseline.shape[0]} != horizon {horizon}")
        promo = PromotionEffectAgent()
        lift = promo.estimate(*promo_history) if promo_history is not None else 0.0
        if promo_schedule is not None:
            baseline = promo.apply(baseline, promo_schedule, lift)
        sensed = DemandSensingAgent(signal_weights).sense(baseline, signals)
        reorder = InventoryAgent(self.lead_time).reorder(sensed, on_hand)
        coord = EchelonCoordinatorAgent(self.n_echelons).coordinate(sensed)
        return SupplyChainResult(
            sensed_demand=sensed, promo_lift=lift, reorder=reorder,
            echelon_orders=coord["echelon_orders"],
            bullwhip_ratio=float(coord["bullwhip_ratio"]),
            history=[{"stage": "sensed", "mean": float(sensed.mean())},
                     {"stage": "reorder", "order_qty": reorder["order_qty"]},
                     {"stage": "bullwhip", "ratio": coord["bullwhip_ratio"]}],
        )

    def run_panel(self, df: DataFrame, horizon: int,
                  promo_col: str | None = None,
                  promo_schedule: np.ndarray | None = None,
                  on_hand: float = 0.0,
                  id_col: str = ID, time_col: str = TIME,
                  target_col: str = TARGET) -> DataFrame:
        """Every series through the chain in one pass. When
        ``promo_col`` names a 0/1 column, the per-series lift is the
        diff-in-means over that history flag. Output one row per
        (series, step): [id, step, sensed] plus the per-series scalars
        (lift, order_qty, stockout_risk, bullwhip) repeated per row."""
        orch = self

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(time_col)
            y = pdf[target_col].to_numpy(dtype=float)
            promo_hist = None
            if promo_col is not None:
                promo_hist = (y, pdf[promo_col].to_numpy(dtype=bool))
            res = orch.run(y, horizon, promo_history=promo_hist,
                           promo_schedule=promo_schedule, on_hand=on_hand)
            return pd.DataFrame({
                id_col: pdf[id_col].iloc[0], "step": range(horizon),
                "sensed": res.sensed_demand,
                "lift": res.promo_lift,
                "order_qty": res.reorder["order_qty"],
                "stockout_risk": res.reorder["stockout_risk"],
                "bullwhip": res.bullwhip_ratio,
            })

        schema = (f"{id_col} string, step int, sensed double, lift double, "
                  "order_qty double, stockout_risk double, bullwhip double")
        return for_each_series(df, kern, schema, id_col=id_col, time_col=time_col)

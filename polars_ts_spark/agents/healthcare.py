"""Clinical monitoring agents (ref healthcare_agents/: agents.py:20-262,
orchestrator.py:45-170).

The scoring logic — qSOFA+SIRS sepsis risk, per-channel reference-band
derangement counting, the simplified NEWS tier mapping — is pure
row-wise CASE arithmetic, so the distributed surface
(``clinical_escalation``) is ONE Catalyst expression plan over a
vitals DataFrame: no per-patient loop, no UDF, SQL-oracle-checkable
term for term. The TreatmentAgent bandit and federated_average keep
the reference's driver-side learning API (value tables are
tiers x actions scalars)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# channel order in a vitals row: hr, sbp, rr, temp, spo2
_HR, _SBP, _RR, _TEMP, _SPO2 = range(5)

DEFAULT_BOUNDS: dict[int, tuple[float, float]] = {
    _HR: (60.0, 100.0),
    _SBP: (100.0, 140.0),
    _RR: (12.0, 20.0),
    _TEMP: (36.0, 38.0),
    _SPO2: (94.0, 100.0),
}


class SepsisWarningAgent:
    """qSOFA (rr >= 22, sbp <= 100) + SIRS (temp derangement, hr > 90,
    rr > 20) combined score, flagged at ``threshold``."""

    def __init__(self, threshold: int = 2):
        self.threshold = threshold

    def score(self, vitals: np.ndarray) -> tuple[float, bool]:
        hr, sbp, rr, temp = (float(vitals[i]) for i in (_HR, _SBP, _RR, _TEMP))
        qsofa = (rr >= 22.0) + (sbp <= 100.0)
        sirs = (temp > 38.0 or temp < 36.0) + (hr > 90.0) + (rr > 20.0)
        risk = float(qsofa + sirs)
        return risk, bool(risk >= self.threshold)


class VitalMonitorAgent:
    """Count vitals outside their reference bands."""

    def __init__(self, bounds: dict[int, tuple[float, float]] | None = None):
        self.bounds = bounds or dict(DEFAULT_BOUNDS)

    def score(self, vitals: np.ndarray) -> tuple[float, bool]:
        n = sum(
            1 for c, (lo, hi) in self.bounds.items()
            if c < len(vitals) and not (lo <= float(vitals[c]) <= hi)
        )
        return float(n), bool(n > 0)


class EscalationAgent:
    """Simplified NEWS severity -> escalation tier in [0, n_tiers)."""

    def __init__(self, n_tiers: int = 4):
        self.n_tiers = n_tiers

    def news_score(self, vitals: np.ndarray) -> int:
        hr, sbp, rr, temp, spo2 = (float(vitals[i]) for i in range(5))
        s = 0
        s += 3 if rr <= 8 or rr >= 25 else 2 if rr >= 21 else 1 if rr <= 11 else 0
        s += 3 if spo2 <= 91 else 2 if spo2 <= 93 else 1 if spo2 <= 95 else 0
        s += 3 if sbp <= 90 or sbp >= 220 else 2 if sbp <= 100 else 1 if sbp <= 110 else 0
        s += 3 if hr <= 40 or hr >= 131 else 2 if hr >= 111 else 1 if hr >= 91 or hr <= 50 else 0
        s += 3 if temp <= 35 else 2 if temp >= 39.1 else 1 if temp >= 38.1 or temp <= 36 else 0
        return s

    def decide(self, vitals: np.ndarray, sepsis_risk: bool, n_deranged: float) -> int:
        news = self.news_score(vitals)
        tier = 3 if news >= 7 else 2 if news >= 5 else 1 if news >= 1 else 0
        if sepsis_risk:
            tier = max(tier, 2)
        if n_deranged >= 3:
            tier = min(tier + 1, self.n_tiers - 1)
        return int(min(tier, self.n_tiers - 1))


class TreatmentAgent:
    """Per-tier reward-averaging bandit over a small action set, with
    an optimistic prior toward each tier's namesake action."""

    DEFAULT_ACTIONS: tuple[str, ...] = (
        "continue_monitoring", "administer_fluids",
        "start_antibiotics", "transfer_icu",
    )

    def __init__(self, actions: tuple[str, ...] | None = None, seed: int = 0):
        self.actions = actions or self.DEFAULT_ACTIONS
        self._rng = np.random.default_rng(seed)
        n_tiers, n_actions = 4, len(self.actions)
        self._value = np.zeros((n_tiers, n_actions))
        for t in range(n_tiers):
            self._value[t, min(t, n_actions - 1)] = 0.1
        self._counts = np.zeros((n_tiers, n_actions), dtype=np.int64)

    def recommend(self, tier: int, explore: float = 0.0) -> int:
        tier = int(min(max(tier, 0), self._value.shape[0] - 1))
        if explore > 0.0 and float(self._rng.random()) < explore:
            return int(self._rng.integers(len(self.actions)))
        return int(np.argmax(self._value[tier]))

    def update(self, tier: int, action: int, reward: float) -> None:
        tier = int(min(max(tier, 0), self._value.shape[0] - 1))
        self._counts[tier, action] += 1
        self._value[tier, action] += (
            reward - self._value[tier, action]) / self._counts[tier, action]


def federated_average(values: list[np.ndarray],
                      weights: list[float] | None = None) -> np.ndarray:
    """Weighted FedAvg of per-site parameter arrays."""
    if not values:
        raise ValueError("values must contain at least one site's parameters")
    arrays = [np.asarray(v, float) for v in values]
    if any(a.shape != arrays[0].shape for a in arrays):
        raise ValueError("all site parameter arrays must share the same shape")
    w = np.ones(len(arrays)) if weights is None else np.asarray(weights, float)
    if w.shape[0] != len(arrays):
        raise ValueError("weights length must match number of sites")
    stacked = np.stack(arrays)
    return (stacked * w[:, None, None] if stacked.ndim == 3
            else stacked * w.reshape((-1,) + (1,) * (stacked.ndim - 1))).sum(axis=0) / w.sum()


def _tiers_expr(hr: Column, sbp: Column, rr: Column, temp: Column,
                spo2: Column) -> dict[str, Column]:
    """The three scoring agents as column expressions."""
    b = lambda c: c.cast("int")  # noqa: E731
    qsofa = b(rr >= 22.0) + b(sbp <= 100.0)
    sirs = b((temp > 38.0) | (temp < 36.0)) + b(hr > 90.0) + b(rr > 20.0)
    risk = (qsofa + sirs).cast("double")
    n_der = sum(
        b(~col.between(lo, hi))
        for col, (lo, hi) in zip(
            (hr, sbp, rr, temp, spo2),
            (DEFAULT_BOUNDS[c] for c in range(5)))
    ).cast("double")
    news = (
        F.when((rr <= 8) | (rr >= 25), 3).when(rr >= 21, 2).when(rr <= 11, 1).otherwise(0)
        + F.when(spo2 <= 91, 3).when(spo2 <= 93, 2).when(spo2 <= 95, 1).otherwise(0)
        + F.when((sbp <= 90) | (sbp >= 220), 3).when(sbp <= 100, 2).when(sbp <= 110, 1).otherwise(0)
        + F.when((hr <= 40) | (hr >= 131), 3).when(hr >= 111, 2)
          .when((hr >= 91) | (hr <= 50), 1).otherwise(0)
        + F.when(temp <= 35, 3).when(temp >= 39.1, 2)
          .when((temp >= 38.1) | (temp <= 36), 1).otherwise(0)
    )
    tier0 = F.when(news >= 7, 3).when(news >= 5, 2).when(news >= 1, 1).otherwise(0)
    tier1 = F.when(risk >= 2.0, F.greatest(tier0, F.lit(2))).otherwise(tier0)
    tier = F.when(n_der >= 3.0, F.least(tier1 + 1, F.lit(3))).otherwise(tier1)
    return {"sepsis_risk": risk, "n_deranged": n_der,
            "news": news.cast("int"), "tier": tier.cast("int")}


def clinical_escalation(
    df: DataFrame,
    hr_col: str = "hr", sbp_col: str = "sbp", rr_col: str = "rr",
    temp_col: str = "temp", spo2_col: str = "spo2",
) -> DataFrame:
    """Every vitals row scored in one expression plan: appends
    [sepsis_risk, n_deranged, news, tier] (threshold=2, 4 tiers)."""
    cols = _tiers_expr(
        F.col(hr_col).cast("double"), F.col(sbp_col).cast("double"),
        F.col(rr_col).cast("double"), F.col(temp_col).cast("double"),
        F.col(spo2_col).cast("double"))
    out = df
    for name, c in cols.items():
        out = out.withColumn(name, c)
    return out

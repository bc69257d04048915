"""PlannerAgent: heuristic candidate-model selection
(ref agents/planner.py:25-119). Pure driver logic over the curation
report's scalars — no data access."""

from __future__ import annotations

from dataclasses import dataclass, field

from polars_ts_spark.agents.curator import CurationReport
from polars_ts_spark.agents.protocol import LLMBackend, RuleBasedBackend


@dataclass
class ForecastPlan:
    """Model selection plan (planner.py:14-21)."""

    candidates: list[str]
    horizon: int
    rationale: str
    config: dict[str, dict] = field(default_factory=dict)
    ensemble: bool = False


class PlannerAgent:
    """Selects candidates from data characteristics (planner.py:56-119):
    naive always; SES for short series; moving average (adaptive
    window), Holt on trend, Holt-Winters on a detected period, SES
    again for long series; ensemble at 3+ candidates."""

    def __init__(self, backend: LLMBackend | None = None, horizon: int = 10):
        self.backend = backend or RuleBasedBackend()
        self.horizon = horizon

    def plan(self, curation: CurationReport) -> ForecastPlan:
        n = curation.n_observations // max(curation.n_series, 1)
        candidates, why = ["naive"], ["Naive baseline for comparison."]
        config: dict[str, dict] = {}
        if n < 30:
            candidates.append("ses")
            why.append("Short series — SES is robust.")
        else:
            window = min(max(n // 10, 3), 30)
            candidates.append("moving_average")
            config["moving_average"] = {"window": window}
            why.append(f"Moving average (window={window}) for smoothed baseline.")
            if curation.has_trend:
                candidates.append("holt")
                why.append("Trend detected — Holt's method appropriate.")
            if curation.detected_period is not None:
                candidates.append("holt_winters")
                config["holt_winters"] = {"season_length": curation.detected_period}
                why.append(f"Seasonality (period={curation.detected_period}) — "
                           "Holt-Winters for trend+seasonal.")
            if n >= 50:
                candidates.append("ses")
                why.append("SES as additional candidate for longer series.")
        ensemble = len(candidates) >= 3
        if ensemble:
            why.append("3+ candidates — ensemble enabled for adaptive combination.")
        rationale = " ".join(why)
        if not isinstance(self.backend, RuleBasedBackend):
            llm = self.backend.complete(
                f"Given: {n} obs/series over {curation.n_series} series, "
                f"trend={curation.has_trend}, period={curation.detected_period}, "
                f"stationary={curation.is_stationary}; candidates {candidates}. "
                "Provide a brief rationale for this model selection.")
            if llm:
                rationale = llm
        return ForecastPlan(candidates=candidates, horizon=self.horizon,
                            rationale=rationale, config=config, ensemble=ensemble)

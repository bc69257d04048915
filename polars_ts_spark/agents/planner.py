"""PlannerAgent: heuristic candidate-model selection (behavioral
parity with ref agents/planner.py:56-119, expressed as a RULE TABLE:
each rule is (condition over the report, candidate, config builder,
rationale)). Pure driver logic over the curation report's scalars —
no data access."""

from __future__ import annotations

from dataclasses import dataclass, field

from polars_ts_spark.agents.curator import CurationReport
from polars_ts_spark.agents.protocol import LLMBackend, RuleBasedBackend, _wants_llm


@dataclass
class ForecastPlan:
    candidates: list[str]
    horizon: int
    rationale: str
    config: dict[str, dict] = field(default_factory=dict)
    ensemble: bool = False


def _ma_window(n: int) -> int:
    return min(max(n // 10, 3), 30)


# (predicate(n, report), model name, config builder, rationale builder)
_RULES = [
    (lambda n, r: True, "naive", None,
     lambda n, r: "Naive baseline for comparison."),
    (lambda n, r: n < 30, "ses", None,
     lambda n, r: "Short series — SES is robust."),
    (lambda n, r: n >= 30, "moving_average",
     lambda n, r: {"window": _ma_window(n)},
     lambda n, r: f"Moving average (window={_ma_window(n)}) for smoothed baseline."),
    (lambda n, r: n >= 30 and r.has_trend, "holt", None,
     lambda n, r: "Trend detected — Holt's method appropriate."),
    (lambda n, r: n >= 30 and r.detected_period is not None, "holt_winters",
     lambda n, r: {"season_length": r.detected_period},
     lambda n, r: (f"Seasonality (period={r.detected_period}) — "
                   "Holt-Winters for trend+seasonal.")),
    (lambda n, r: n >= 50, "ses", None,
     lambda n, r: "SES as additional candidate for longer series."),
]


class PlannerAgent:
    """Walks the rule table top to bottom; 3+ selected candidates turn
    on inverse-MAE ensembling downstream."""

    def __init__(self, backend: LLMBackend | None = None, horizon: int = 10):
        self.backend = backend or RuleBasedBackend()
        self.horizon = horizon

    def plan(self, curation: CurationReport) -> ForecastPlan:
        n = curation.n_observations // max(curation.n_series, 1)
        candidates: list[str] = []
        config: dict[str, dict] = {}
        why: list[str] = []
        for pred, name, cfg, reason in _RULES:
            if not pred(n, curation):
                continue
            candidates.append(name)
            if cfg is not None:
                config[name] = cfg(n, curation)
            why.append(reason(n, curation))
        ensemble = len(candidates) >= 3
        if ensemble:
            why.append("3+ candidates — ensemble enabled for adaptive combination.")
        rationale = " ".join(why)
        if _wants_llm(self.backend):
            guided = self.backend.complete(
                f"Given: {n} obs/series over {curation.n_series} series, "
                f"trend={curation.has_trend}, period={curation.detected_period}, "
                f"stationary={curation.is_stationary}; candidates {candidates}. "
                "Provide a brief rationale for this model selection.")
            if guided:
                rationale = guided
        return ForecastPlan(candidates=candidates, horizon=self.horizon,
                            rationale=rationale, config=config, ensemble=ensemble)

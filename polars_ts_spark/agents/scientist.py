"""TimeSeriesScientist: the end-to-end agent chain
(ref agents/scientist.py:26-134): Curate → Plan → Forecast → Report.
The result's predictions stay a lazy Spark DataFrame; the caller
decides whether/where to materialize."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame

from polars_ts_spark.agents.curator import CuratorAgent
from polars_ts_spark.agents.forecaster import ForecasterAgent
from polars_ts_spark.agents.planner import PlannerAgent
from polars_ts_spark.agents.protocol import AgentContext, LLMBackend, RuleBasedBackend
from polars_ts_spark.agents.reporter import ReporterAgent
from polars_ts_spark.panel import ID, TARGET, TIME


@dataclass
class ScientistResult:
    predictions: DataFrame
    report: str
    context: AgentContext


class TimeSeriesScientist:
    """Orchestrates the full agentic forecasting pipeline."""

    def __init__(self, horizon: int = 10, backend: LLMBackend | None = None,
                 id_col: str = ID, time_col: str = TIME, target_col: str = TARGET,
                 events: list[dict[str, Any]] | None = None,
                 trim_lookback: bool = False):
        self.horizon = horizon
        self.backend = backend or RuleBasedBackend()
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col
        self.events = events or []
        self.trim_lookback = trim_lookback

    def run(self, df: DataFrame) -> ScientistResult:
        ctx = AgentContext(data=df, events=self.events)
        cols = dict(id_col=self.id_col, time_col=self.time_col,
                    target_col=self.target_col)
        curator = CuratorAgent(backend=self.backend, **cols)
        curation = curator.curate(df)
        ctx.log("curator", curation.summary)
        cleaned = curator.curate_and_clean(df)
        if self.trim_lookback and curation.recommended_lookback is not None:
            cleaned = curator.trim_lookback(cleaned, curation.recommended_lookback)
            ctx.log("curator", f"Trimmed to lookback={curation.recommended_lookback}")
        if self.events:
            ctx.log("curator", f"{len(self.events)} event(s) registered as context")

        planner = PlannerAgent(backend=self.backend, horizon=self.horizon)
        plan = planner.plan(curation)
        ctx.log("planner",
                f"Selected {len(plan.candidates)} candidates: {', '.join(plan.candidates)}")
        if plan.ensemble:
            ctx.log("planner", "Ensemble mode enabled")

        forecaster = ForecasterAgent(backend=self.backend, **cols)
        result = forecaster.forecast(cleaned, plan)
        score = result.model_scores.get(result.best_model, float("nan"))
        ctx.log("forecaster", f"Best model: {result.best_model} (MAE={score:.4f})")
        if result.ensemble_weights:
            ctx.log("forecaster", "Ensemble weights: " + ", ".join(
                f"{k}={v:.3f}" for k, v in result.ensemble_weights.items()))

        report = ReporterAgent(backend=self.backend).report(curation, plan, result)
        ctx.log("reporter", "Report generated")
        return ScientistResult(predictions=result.predictions,
                               report=report.markdown, context=ctx)

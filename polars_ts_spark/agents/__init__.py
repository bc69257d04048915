"""Agent layer (SURVEY §2.19 tail; ref polars_ts/agents/): the
Curator → Planner → Forecaster → Reporter chain orchestrating the
engine's operators, LLM-optional with rule-based defaults.

Pure orchestration ABOVE the engine: every data-touching step is a
Spark plan built from the operator modules; the agents themselves hold
only driver-small state (diagnostic scalars, candidate lists, scores).
Where the reference diagnoses from the FIRST series only
(agents/curator.py:177-184 — a driver collect that cannot scale), our
curator computes the same per-series statistics DISTRIBUTED in one
applyInPandas pass and aggregates by majority vote / median — the
100 TB-safe form of the same heuristics.
"""

from polars_ts_spark.agents.curator import CurationReport, CuratorAgent
from polars_ts_spark.agents.forecaster import ForecastAgentResult, ForecasterAgent
from polars_ts_spark.agents.planner import ForecastPlan, PlannerAgent
from polars_ts_spark.agents.protocol import AgentContext, LLMBackend, RuleBasedBackend
from polars_ts_spark.agents.reporter import ForecastReport, ReporterAgent
from polars_ts_spark.agents.scientist import ScientistResult, TimeSeriesScientist

__all__ = [
    "AgentContext", "CurationReport", "CuratorAgent", "ForecastAgentResult",
    "ForecastPlan", "ForecastReport", "ForecasterAgent", "LLMBackend",
    "PlannerAgent", "ReporterAgent", "RuleBasedBackend", "ScientistResult",
    "TimeSeriesScientist",
]

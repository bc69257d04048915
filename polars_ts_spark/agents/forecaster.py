"""ForecasterAgent: fit candidates, score on a held-out tail, pick the
best or blend by inverse-MAE weights (ref agents/forecaster.py:48-266).

Everything distributed: the train/val split is a per-series row-rank
filter over ONE lazy frame (no copies), each candidate's fit/predict
is the engine operator's own plan, MAE is a join + global aggregate
(one scalar per candidate to the driver), and the ensemble is a
sequence of weighted joins — never a driver loop over rows."""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_ts_spark.agents.planner import ForecastPlan
from polars_ts_spark.agents.protocol import LLMBackend, RuleBasedBackend
from polars_ts_spark.panel import ID, TARGET, TIME


@dataclass
class ForecastAgentResult:
    """Output of a ForecasterAgent run (forecaster.py:16-33)."""

    predictions: DataFrame
    best_model: str
    model_scores: dict[str, float]
    all_predictions: dict[str, DataFrame] = field(default_factory=dict)
    ensemble_weights: dict[str, float] = field(default_factory=dict)


def _registry():
    from polars_ts_spark.operators import baselines, ets

    return {
        "naive": baselines.naive_forecast,
        "seasonal_naive": baselines.seasonal_naive_forecast,
        "moving_average": baselines.moving_average_forecast,
        "ses": ets.ses_forecast,
        "holt": ets.holt_forecast,
        "holt_winters": ets.holt_winters_forecast,
    }


class ForecasterAgent:
    def __init__(self, backend: LLMBackend | None = None,
                 id_col: str = ID, time_col: str = TIME, target_col: str = TARGET):
        self.backend = backend or RuleBasedBackend()
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col

    def _split(self, df: DataFrame, h: int):
        w = Window.partitionBy(self.id_col).orderBy(F.col(self.time_col).desc())
        r = df.withColumn("__rk", F.row_number().over(w))
        return (r.filter(F.col("__rk") > h).drop("__rk"),
                r.filter(F.col("__rk") <= h).drop("__rk"))

    def _mae(self, val: DataFrame, preds: DataFrame) -> float:
        j = val.select(self.id_col, self.time_col, self.target_col).join(
            preds.select(self.id_col, self.time_col, "y_hat"),
            [self.id_col, self.time_col], "inner")
        row = j.agg(F.avg(F.abs(F.col(self.target_col) - F.col("y_hat")))).first()
        return float("inf") if row[0] is None else float(row[0])

    def _fit(self, name: str, df: DataFrame, h: int, cfg: dict) -> DataFrame:
        kw = dict(id_col=self.id_col, time_col=self.time_col,
                  target_col=self.target_col, **cfg)
        return _registry()[name](df, h=h, **kw)

    def forecast(self, df: DataFrame, plan: ForecastPlan) -> ForecastAgentResult:
        h = plan.horizon
        train, val = self._split(df, h)
        scores: dict[str, float] = {}
        all_preds: dict[str, DataFrame] = {}
        for name in plan.candidates:
            if name not in _registry():
                continue
            try:
                preds = self._fit(name, train, h, plan.config.get(name, {}))
                all_preds[name] = preds
                scores[name] = self._mae(val, preds)
            except Exception:
                scores[name] = float("inf")
        if not scores:
            preds = self._fit("naive", train, h, {})
            return ForecastAgentResult(preds, "naive", {"naive": float("nan")},
                                       {"naive": preds})
        best = min(scores, key=lambda k: scores[k])
        valid = {k: v for k, v in scores.items() if math.isfinite(v) and v > 0}
        if plan.ensemble and len(valid) >= 2:
            inv = {k: 1.0 / v for k, v in valid.items()}
            tot = sum(inv.values())
            weights = {k: v / tot for k, v in inv.items()}
            final = None
            for name, w in weights.items():
                p = self._fit(name, df, h, plan.config.get(name, {})) \
                    .select(self.id_col, self.time_col,
                            (F.col("y_hat") * F.lit(w)).alias(f"__p_{name}"))
                final = p if final is None else final.join(
                    p, [self.id_col, self.time_col], "left")
            parts = [c for c in final.columns if c.startswith("__p_")]
            expr = None
            for c in parts:
                t = F.coalesce(F.col(c), F.lit(0.0))
                expr = t if expr is None else expr + t
            final = final.select(self.id_col, self.time_col, expr.alias("y_hat"))
            return ForecastAgentResult(final, f"ensemble({', '.join(weights)})",
                                       scores, all_preds, weights)
        final = self._fit(best, df, h, plan.config.get(best, {}))
        return ForecastAgentResult(final, best, scores, all_preds)

"""Multi-agent anomaly consensus (ref anomaly_agents/: agents.py:8-142
detectors, orchestrator.py:24-126 loop, env.py sliding windows).

The reference steps a per-point environment loop on the driver; here
the three detectors and the vote are ONE window-expression plan over
the whole panel — each row's trailing context is a window
collect_list, every statistic is an explicit sequential list fold or
exact order statistic (so the DuckDB oracle replays it term for term),
and the consensus is a CASE vote. Fully distributed, per-series
partitioned, no driver loop. The scalar agent classes are kept for
API parity and power the unit tests.

One surface difference, documented: the reference env's step loop
never scores the final observation (its done-check runs before the
last window is consumed); the distributed form scores every row with
a full trailing context, including the last."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_ts_spark.panel import ID, TARGET, TIME

_EPS = 1e-10
_MAD_K = 0.6745  # 0.75 quantile of the standard normal


class ZScoreAgent:
    """|x - mean(ctx)| / std(ctx) on the trailing context."""

    def __init__(self, threshold: float = 3.0):
        self.threshold = threshold

    def detect(self, window: np.ndarray) -> tuple[float, bool]:
        ctx, value = window[:-1], window[-1]
        z = abs(value - ctx.mean()) / (ctx.std() + _EPS)
        return float(z), bool(z > self.threshold)


class RollingStdAgent:
    """|x - median(ctx)| / std(ctx): deviation from the robust center
    in ordinary-std units."""

    def __init__(self, threshold: float = 3.0):
        self.threshold = threshold

    def detect(self, window: np.ndarray) -> tuple[float, bool]:
        ctx, value = window[:-1], window[-1]
        s = abs(value - float(np.median(ctx))) / (float(ctx.std()) + _EPS)
        return float(s), bool(s > self.threshold)


class MADAgent:
    """Modified z-score 0.6745·|x - med| / MAD."""

    def __init__(self, threshold: float = 3.5):
        self.threshold = threshold

    def detect(self, window: np.ndarray) -> tuple[float, bool]:
        ctx, value = window[:-1], window[-1]
        med = float(np.median(ctx))
        mad = float(np.median(np.abs(ctx - med))) + _EPS
        s = _MAD_K * abs(value - med) / mad
        return float(s), bool(s > self.threshold)


class ConsensusAgent:
    """majority | any | weighted vote over agent flags."""

    def __init__(self, method: str = "majority", weights: list[float] | None = None):
        self.method = method
        self.weights = weights

    def decide(self, flags: list[bool], scores: list[float]) -> bool:  # noqa: ARG002
        if self.method == "any":
            return any(flags)
        if self.method == "weighted" and self.weights is not None:
            hit = sum(w for w, f in zip(self.weights, flags) if f)
            return hit >= 0.5 * sum(self.weights)
        return sum(flags) > len(flags) / 2


@dataclass
class AnomalyResult:
    detections: DataFrame
    history: list[dict[str, Any]] = field(default_factory=list)


def _median_expr(arr: str, m: int) -> str:
    """Exact order-statistic median of an m-element sorted list
    (element_at: 1-based, matching the oracle's 1-based list index —
    Spark's bare ``arr[i]`` subscript is 0-based)."""
    if m % 2 == 1:
        return f"element_at(array_sort({arr}), {(m + 1) // 2})"
    lo, hi = m // 2, m // 2 + 1
    return (f"(element_at(array_sort({arr}), {lo})"
            f" + element_at(array_sort({arr}), {hi})) / 2.0")


def consensus_anomalies(
    df: DataFrame,
    window_size: int = 20,
    z_threshold: float = 3.0,
    std_threshold: float = 3.0,
    mad_threshold: float = 3.5,
    method: str = "majority",
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """The orchestrator's detect-and-vote loop as one distributed plan.
    Output [id, ds, y, z_score, std_score, mad_score, is_anomaly] for
    every row with a full (window_size - 1)-row trailing context."""
    m = window_size - 1
    w = Window.partitionBy(id_col).orderBy(time_col)
    wf = w.rowsBetween(-m, -1)
    base = (
        df.withColumn("__ctx", F.collect_list(F.col(target_col).cast("double")).over(wf))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") >= window_size)
    )
    mean = f"aggregate(__ctx, 0D, (a, x) -> a + x) / {m}"
    sd = (f"sqrt(aggregate(__ctx, 0D, (a, x) -> a + (x - ({mean})) * (x - ({mean})))"
          f" / {m})")
    med = _median_expr("__ctx", m)
    mad = _median_expr(f"transform(__ctx, x -> abs(x - ({med})))", m)
    y = f"cast({target_col} as double)"
    z = f"abs({y} - ({mean})) / (({sd}) + {_EPS!r})"
    ss = f"abs({y} - ({med})) / (({sd}) + {_EPS!r})"
    ms = f"{_MAD_K!r} * abs({y} - ({med})) / (({mad}) + {_EPS!r})"
    votes = (f"(CASE WHEN ({z}) > {z_threshold!r} THEN 1 ELSE 0 END"
             f" + CASE WHEN ({ss}) > {std_threshold!r} THEN 1 ELSE 0 END"
             f" + CASE WHEN ({ms}) > {mad_threshold!r} THEN 1 ELSE 0 END)")
    if method == "any":
        decision = f"({votes}) >= 1"
    elif method == "majority":
        decision = f"({votes}) > 1.5"
    else:
        raise ValueError(f"unsupported consensus method {method!r} for the "
                         "distributed plan; use the scalar ConsensusAgent")
    return base.select(
        id_col, time_col, F.col(target_col),
        F.expr(z).alias("z_score"),
        F.expr(ss).alias("std_score"),
        F.expr(ms).alias("mad_score"),
        F.expr(decision).alias("is_anomaly"),
    )


class AnomalyOrchestrator:
    """API-parity facade (orchestrator.py:24-126): run() applies the
    distributed consensus plan and logs one summary entry."""

    def __init__(self, window_size: int = 20, consensus_method: str = "majority",
                 z_threshold: float = 3.0, std_threshold: float = 3.0,
                 mad_threshold: float = 3.5,
                 id_col: str = ID, time_col: str = TIME, target_col: str = TARGET):
        self.window_size = window_size
        self.consensus_method = consensus_method
        self.z_threshold = z_threshold
        self.std_threshold = std_threshold
        self.mad_threshold = mad_threshold
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col

    def run(self, df: DataFrame) -> AnomalyResult:
        out = consensus_anomalies(
            df, self.window_size, self.z_threshold, self.std_threshold,
            self.mad_threshold, self.consensus_method,
            self.id_col, self.time_col, self.target_col,
        )
        return AnomalyResult(detections=out, history=[{
            "agent": "anomaly_orchestrator",
            "message": f"consensus={self.consensus_method}, "
                       f"window={self.window_size}",
        }])

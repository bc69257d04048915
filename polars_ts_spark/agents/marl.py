"""Multi-agent portfolio allocation (ref marl/: agents.py:8-121,
env.py:11-125, orchestrator.py:26-140).

The reference steps an env loop on the driver; but the three agents'
decisions at step t depend ONLY on the trailing return window (the
transaction cost affects the reward, not the return stream), so the
whole loop factorizes into per-step window expressions:
``portfolio_allocation_panel`` computes rolling-vol risk, EWMA
expected returns, the risk-adjusted shift-normalized weights and the
realized portfolio return for EVERY step of EVERY asset in one
distributed plan. Assets align by POSITION (the reference
column-stacks per-asset return arrays truncated to the shortest —
mirrored here with per-asset row numbers and a min-length cap).
Scalar agents + the PortfolioEnv/MARLOrchestrator driver loop keep
the reference API for parity and tests."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class RiskAgent:
    """Rolling volatility over the trailing window."""

    def __init__(self, window_size: int = 20):
        self.window_size = window_size

    def assess(self, returns: np.ndarray) -> np.ndarray:
        return np.std(returns[-self.window_size:], axis=0)


class ReturnAgent:
    """EWMA expected returns over the trailing window."""

    def __init__(self, window_size: int = 20, decay: float = 0.94):
        self.window_size = window_size
        self.decay = decay

    def predict(self, returns: np.ndarray) -> np.ndarray:
        recent = returns[-self.window_size:]
        n = len(recent)
        w = np.array([self.decay ** (n - 1 - i) for i in range(n)])
        w /= w.sum()
        return w @ recent


class AllocationAgent:
    """Risk-adjusted scores, shifted positive and normalized."""

    def __init__(self, risk_aversion: float = 1.0):
        self.risk_aversion = risk_aversion

    def allocate(self, risk_scores: np.ndarray, expected_returns: np.ndarray,
                 n_assets: int) -> np.ndarray:  # noqa: ARG002
        safe = np.maximum(risk_scores, 1e-10)
        scores = expected_returns / (safe * self.risk_aversion)
        shifted = scores - scores.min() + 1e-10
        return shifted / shifted.sum()


class PortfolioEnv:
    """Stepwise portfolio environment over a (n_steps, n_assets)
    return matrix; reward = portfolio return - turnover cost."""

    def __init__(self, returns: np.ndarray, window_size: int = 10,
                 transaction_cost: float = 0.0):
        self.returns = np.asarray(returns, float)
        self.window_size = window_size
        self.transaction_cost = transaction_cost
        self.n_assets = self.returns.shape[1]
        self._step = 0
        self._max_steps = len(self.returns) - window_size
        self._prev_weights = np.ones(self.n_assets) / self.n_assets
        if self._max_steps <= 0:
            raise ValueError("returns must have more rows than window_size")

    def reset(self) -> np.ndarray:
        self._step = 0
        self._prev_weights = np.ones(self.n_assets) / self.n_assets
        return self._obs()

    def _obs(self) -> np.ndarray:
        return self.returns[self._step:self._step + self.window_size].copy()

    def step(self, action: np.ndarray):
        w = np.abs(np.asarray(action, float))
        s = w.sum()
        w = w / s if s > 0 else np.ones(self.n_assets) / self.n_assets
        idx = self.window_size + self._step
        pr = float(np.dot(w, self.returns[idx]))
        turnover = float(np.sum(np.abs(w - self._prev_weights)))
        reward = pr - self.transaction_cost * turnover
        self._prev_weights = w.copy()
        self._step += 1
        done = self._step >= self._max_steps
        obs = self._obs() if not done else np.zeros((self.window_size, self.n_assets))
        return obs, reward, done, {"portfolio_return": pr, "turnover": turnover}


@dataclass
class MARLResult:
    weights_history: np.ndarray
    portfolio_returns: np.ndarray
    sharpe_ratio: float
    total_return: float
    history: list[dict[str, Any]] = field(default_factory=list)


class MARLOrchestrator:
    """Risk -> Return -> Allocation loop over a returns matrix."""

    def __init__(self, window_size: int = 20, risk_aversion: float = 1.0,
                 transaction_cost: float = 0.0):
        self.window_size = window_size
        self.risk_aversion = risk_aversion
        self.transaction_cost = transaction_cost

    def run(self, returns: np.ndarray) -> MARLResult:
        returns = np.asarray(returns, float)
        env = PortfolioEnv(returns, self.window_size, self.transaction_cost)
        risk = RiskAgent(self.window_size)
        ret = ReturnAgent(self.window_size)
        alloc = AllocationAgent(self.risk_aversion)
        env.reset()
        done = False
        ws, prs = [], []
        while not done:
            hist = returns[: self.window_size + env._step]
            w = alloc.allocate(risk.assess(hist), ret.predict(hist), env.n_assets)
            _, _, done, info = env.step(w)
            ws.append(w)
            prs.append(info["portfolio_return"])
        prs = np.array(prs)
        sharpe = float(prs.mean() / (prs.std() + 1e-10) * np.sqrt(252))
        total = float(np.prod(1 + prs) - 1)
        return MARLResult(np.array(ws), prs, sharpe, total,
                          [{"agent": "allocation", "steps": len(ws)}])


def portfolio_allocation_panel(
    df: DataFrame,
    window_size: int = 20,
    decay: float = 0.94,
    risk_aversion: float = 1.0,
    id_col: str = "unique_id",
    time_col: str = "ds",
    target_col: str = "y",
) -> DataFrame:
    """The full agent loop, distributed. Input: long price panel
    (positive prices). Output one row per (step, asset):
    [step, id, weight, portfolio_return] for steps with a full
    trailing window, positionally aligned and truncated to the
    shortest asset like the reference's column-stack."""
    w_t = Window.partitionBy(id_col).orderBy(time_col)
    rets = (
        df.withColumn("__lp", F.log(F.col(target_col).cast("double")))
        .withColumn("__ret", F.col("__lp") - F.lag("__lp").over(w_t))
        .filter(F.col("__ret").isNotNull())
        .withColumn("__rn", F.row_number().over(w_t))
    )
    minlen = rets.groupBy(id_col).agg(F.max("__rn").alias("__n")) \
                 .agg(F.min("__n").alias("__m"))
    rets = rets.crossJoin(F.broadcast(minlen)).filter(F.col("__rn") <= F.col("__m"))
    # trailing-window stats per (asset, step); EWMA coefficients are
    # the SAME literal floats the numpy agent computes
    coef = np.array([decay ** (window_size - 1 - i) for i in range(window_size)])
    coef = coef / coef.sum()
    wf = w_t.rowsBetween(-window_size, -1)
    ctx = F.collect_list("__ret").over(wf)
    ew = "0.0D"
    for i, c in enumerate(coef):
        ew = f"({ew} + {c!r}D * element_at(__ctx, {i + 1}))"
    stat = (
        rets.withColumn("__ctx", ctx)
        .withColumn("__vol", F.stddev_pop("__ret").over(wf))
        .filter(F.col("__rn") > window_size)
        .withColumn("__ew", F.expr(ew))
    )
    wa = Window.partitionBy("__rn")
    score = F.col("__ew") / (F.greatest(F.col("__vol"), F.lit(1e-10)) * risk_aversion)
    stat = stat.withColumn("__score", score)
    shifted = F.col("__score") - F.min("__score").over(wa) + F.lit(1e-10)
    stat = stat.withColumn("__sh", shifted)
    w0 = F.col("__sh") / F.sum("__sh").over(wa)
    stat = stat.withColumn("__w0", w0)
    # the env re-normalizes |w|/sum(w) — replicate the extra division
    stat = stat.withColumn("weight", F.col("__w0") / F.sum("__w0").over(wa))
    pr = F.sum(F.col("weight") * F.col("__ret")).over(wa)
    return stat.select(
        (F.col("__rn") - window_size - 1).alias("step"), F.col(id_col),
        "weight", pr.alias("portfolio_return"),
    )

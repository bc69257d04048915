"""PELT changepoint detection (SURVEY §2.15).

Reference semantics (src/pelt.rs:13-232, changepoint/pelt.py:43-185):
prefix-sum O(1) segment costs (mean / var / meanvar), DP over pruned
candidate set, default penalty 2·ln n, min_size, output
[unique_id, changepoint_idx, ds].

Implementation: `applyInPandas` per series; the inner candidate loop is
numpy-vectorized (costs for ALL candidates at once per t), keeping the
pruning exact. Parallel axis = series (the reference uses Rayon over
groups; Spark uses tasks over groups).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from polars_ts_spark.operators.kernel import for_each_series
from polars_ts_spark.panel import ID, TARGET, TIME, require_columns


def _segment_costs(cum: np.ndarray, cum_sq: np.ndarray, starts: np.ndarray,
                   end: int, cost: str) -> np.ndarray:
    """Vectorized cost of segments [s, end) for all candidate starts."""
    n = (end - starts).astype(float)
    seg_sum = cum[end] - cum[starts]
    seg_sq = cum_sq[end] - cum_sq[starts]
    mean = np.where(n > 0, seg_sum / np.maximum(n, 1), 0.0)
    c_mean = seg_sq - n * mean * mean
    if cost == "mean":
        return c_mean
    var = np.where(n > 1, c_mean / np.maximum(n - 1, 1), 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        c_var = np.where((n >= 2) & (var > 0), n * np.log(np.maximum(var, 1e-300)), 0.0)
    if cost == "var":
        return c_var
    if cost == "meanvar":
        return c_mean + c_var
    raise ValueError(f'Unknown cost {cost!r}. Choose from ["mean", "meanvar", "var"]')


def pelt_changepoints(vals: np.ndarray, cost: str = "mean",
                      penalty: float | None = None, min_size: int = 2) -> list[int]:
    """Changepoint indices for one series (pelt_single semantics)."""
    n = len(vals)
    if n < 2 * min_size:
        return []
    pen = penalty if penalty is not None else 2.0 * math.log(n)
    cum = np.concatenate([[0.0], np.cumsum(vals)])
    cum_sq = np.concatenate([[0.0], np.cumsum(vals * vals)])
    f = np.full(n + 1, np.inf)
    f[0] = -pen
    last_cp = np.zeros(n + 1, dtype=np.int64)
    candidates = np.array([0], dtype=np.int64)
    for t in range(min_size, n + 1):
        ok = (t - candidates) >= min_size
        cand = candidates[ok]
        costs = f[cand] + _segment_costs(cum, cum_sq, cand, t, cost) + pen
        best = int(np.argmin(costs))
        f[t] = costs[best]
        last_cp[t] = cand[best]
        # prune: keep s with f[s] + cost(s,t) <= f[t]
        keep_costs = f[candidates] + _segment_costs(cum, cum_sq, candidates, t, cost)
        candidates = candidates[keep_costs <= f[t]]
        candidates = np.append(candidates, t)
    cps = []
    idx = n
    while idx > 0:
        prev = int(last_cp[idx])
        if prev > 0:
            cps.append(prev)
        idx = prev
    return sorted(cps)


def pelt(df: DataFrame, cost: str = "mean", penalty: float | None = None,
         min_size: int = 2, id_col: str = ID, time_col: str = TIME,
         target_col: str = TARGET) -> DataFrame:
    """Per-series PELT -> [id, changepoint_idx, ds] (timestamps attached
    inside the same kernel — no second join, SURVEY §3.3)."""
    require_columns(df, id_col, time_col, target_col)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[target_col].to_numpy(dtype=float)
        cps = pelt_changepoints(vals, cost, penalty, min_size)
        return pd.DataFrame({
            id_col: pdf[id_col].iloc[0],
            "changepoint_idx": pd.Series(cps, dtype="int64"),
            time_col: pdf[time_col].iloc[cps].to_numpy() if cps else pd.Series([], dtype="datetime64[us]"),
        })

    return for_each_series(df, kern, f"{id_col} string, changepoint_idx long, {time_col} timestamp",
                           id_col, time_col)

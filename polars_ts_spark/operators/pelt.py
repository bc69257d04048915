"""PELT changepoint detection (SURVEY §2.15).

Reference semantics (src/pelt.rs:13-232, changepoint/pelt.py:43-185):
prefix-sum O(1) segment costs (mean / var / meanvar), DP over pruned
candidate set, default penalty 2·ln n, min_size, output
[unique_id, changepoint_idx, ds].

Implementation: `applyInPandas` per id-hash bucket; the DP t-loop is
run ONCE per bucket with the series axis as the SIMD axis (padded
arrays + per-series candidate masks), keeping the pruning trajectory
exactly equal to the scalar formulation (`pelt_changepoints`, kept as
the reference path and for single-series use). Parallel axis = buckets
of series (the reference uses Rayon over groups; Spark uses tasks over
buckets).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from polars_ts_spark.operators.kernel import for_series_batches
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


def _batch_costs(cum: np.ndarray, cum_sq: np.ndarray, t: int, L: int,
                 cost: str) -> np.ndarray:
    """Cost of segments [s, t) for all starts s in [0, L) across a batch.

    ``cum``/``cum_sq`` are (S, N+1) prefix sums; returns (S, L). Same
    arithmetic as ``_segment_costs`` elementwise, so f-value
    trajectories (and hence pruning) are bit-identical to the scalar
    path."""
    n = (t - np.arange(L, dtype=float))[None, :]
    seg_sum = cum[:, t:t + 1] - cum[:, :L]
    seg_sq = cum_sq[:, t:t + 1] - cum_sq[:, :L]
    mean = seg_sum / np.maximum(n, 1)
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


def pelt_changepoints_batch(vals_list: list[np.ndarray], cost: str = "mean",
                            penalty: float | None = None,
                            min_size: int = 2) -> list[list[int]]:
    """PELT for a batch of series with ONE shared t-loop: the series axis
    is the SIMD axis (padded prefix sums, per-series candidate masks).
    Produces exactly ``[pelt_changepoints(v) for v in vals_list]``."""
    S = len(vals_list)
    if S == 0:
        return []
    ns = np.array([len(v) for v in vals_list], dtype=np.int64)
    # sort longest-first so the set of live series at step t is a prefix
    order = np.argsort(-ns, kind="stable")
    ns_s = ns[order]
    N = int(ns_s[0])
    out: list[list[int]] = [[] for _ in range(S)]
    if N < 2 * min_size:
        return out
    V = np.zeros((S, N))
    for r, oi in enumerate(order):
        V[r, :ns_s[r]] = vals_list[oi]
    cum = np.zeros((S, N + 1))
    np.cumsum(V, axis=1, out=cum[:, 1:])
    cum_sq = np.zeros((S, N + 1))
    np.cumsum(V * V, axis=1, out=cum_sq[:, 1:])
    pens = (2.0 * np.log(np.maximum(ns_s, 2).astype(float))
            if penalty is None else np.full(S, float(penalty)))
    # series too short to ever emit a changepoint never enter the DP
    live_total = int(np.searchsorted(-ns_s, -(2 * min_size), side="right"))
    f = np.full((S, N + 1), np.inf)
    f[:, 0] = -pens
    last_cp = np.zeros((S, N + 1), dtype=np.int64)
    cand = np.zeros((S, N + 1), dtype=bool)
    cand[:, 0] = True
    for t in range(min_size, N + 1):
        k = int(np.searchsorted(-ns_s, -t, side="right"))  # series with n >= t
        k = min(k, live_total)
        if k == 0:
            break
        L = t - min_size + 1  # admissible starts for the argmin
        costs_full = _batch_costs(cum[:k], cum_sq[:k], t, t, cost)
        total_full = f[:k, :t] + costs_full + pens[:k, None]
        admissible = total_full[:, :L].copy()
        admissible[~cand[:k, :L]] = np.inf
        best = np.argmin(admissible, axis=1)
        rows = np.arange(k)
        f[:k, t] = admissible[rows, best]
        last_cp[:k, t] = best
        # prune over the FULL candidate set (incl. s with t-s < min_size),
        # exactly as the scalar path does
        keep = (total_full - pens[:k, None]) <= f[:k, t:t + 1]
        cand[:k, :t] &= keep
        cand[:k, t] = True
    for r in range(live_total):
        idx = int(ns_s[r])
        cps = []
        while idx > 0:
            prev = int(last_cp[r, idx])
            if prev > 0:
                cps.append(prev)
            idx = prev
        out[order[r]] = sorted(cps)
    return out


def pelt(df: DataFrame, cost: str = "mean", penalty: float | None = None,
         min_size: int = 2, id_col: str = ID, time_col: str = TIME,
         target_col: str = TARGET) -> DataFrame:
    """Per-series PELT -> [id, changepoint_idx, ds] (timestamps attached
    inside the same kernel — no second join, SURVEY §3.3)."""
    require_columns(df, id_col, time_col, target_col)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = []
        vals_list = []
        times = []
        for sid, g in pdf.groupby(id_col, sort=False):
            ids.append(sid)
            vals_list.append(g[target_col].to_numpy(dtype=float))
            times.append(g[time_col].to_numpy())
        cps_list = pelt_changepoints_batch(vals_list, cost, penalty, min_size)
        frames = [
            pd.DataFrame({
                id_col: sid,
                "changepoint_idx": pd.Series(cps, dtype="int64"),
                time_col: ts[cps] if cps else pd.Series([], dtype="datetime64[us]"),
            })
            for sid, ts, cps in zip(ids, times, cps_list)
        ]
        if not frames:
            return pd.DataFrame({id_col: pd.Series([], dtype="str"),
                                 "changepoint_idx": pd.Series([], dtype="int64"),
                                 time_col: pd.Series([], dtype="datetime64[us]")})
        return pd.concat(frames, ignore_index=True)

    return for_series_batches(df, kern, f"{id_col} string, changepoint_idx long, {time_col} timestamp",
                              id_col, time_col)

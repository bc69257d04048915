"""Trend statistics: Mann-Kendall and Sen's slope (SURVEY §2.9).

Reference semantics (src/mann_kendall.rs:25-77, src/sens_slope.rs:21-49):
- mann_kendall: normalized S / (0.5·n·(n-1)) where
  S = Σ_{i<j} sign(x_j - x_i); nulls dropped; n<2 -> 0.
- sens_slope: median of all pairwise slopes (x_j - x_i)/(j - i); n<2 -> 0.

Implementation: short series use a numpy O(n²) chunked broadcast
(bounded memory, SIMD-fast at panel lengths); long series switch to the
reference's Fenwick-tree O(n log n) formulation
(src/mann_kendall.rs:39-70) — S accumulated as
(#previous smaller − #previous larger) per element over a rank-
compressed binary indexed tree, so a 100k-point series costs ~n·log n
instead of the n² ≈ 10¹⁰ sign evaluations the broadcast would need.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from polars_ts_spark.operators.kernel import for_each_series
from polars_ts_spark.panel import ID, TARGET, TIME, require_columns

_CHUNK = 512  # rows per broadcast block: memory <= CHUNK * n * 8 bytes


# beyond this length the O(n log n) Fenwick path beats the O(n²/CHUNK)
# numpy broadcast (crossover measured around a few thousand points)
_FENWICK_MIN_N = 4096


def _mk_s_fenwick(vals: np.ndarray) -> int:
    """S = Σ_{i<j} sign(x_j − x_i) in O(n log n): for each element,
    add (#previous smaller − #previous larger), counted by a binary
    indexed tree over rank-compressed values (ties share a rank and
    contribute 0, matching sign() == 0)."""
    uniq, inv = np.unique(vals, return_inverse=True)
    m = len(uniq)
    tree = [0] * (m + 1)
    s = 0
    for seen, r in enumerate(inv + 1):  # 1-based ranks
        i = r - 1
        less = 0
        while i > 0:
            less += tree[i]
            i -= i & (-i)
        i = r
        less_or_eq = 0
        while i > 0:
            less_or_eq += tree[i]
            i -= i & (-i)
        s += less - (seen - less_or_eq)
        i = r
        while i <= m:
            tree[i] += 1
            i += i & (-i)
    return s


def mann_kendall_stat(vals: np.ndarray) -> float:
    n = len(vals)
    if n < 2:
        return 0.0
    if n >= _FENWICK_MIN_N:
        return _mk_s_fenwick(vals) / (0.5 * n * (n - 1))
    s = 0
    for lo in range(0, n - 1, _CHUNK):
        hi = min(lo + _CHUNK, n - 1)
        # pairs (i, j>i) for i in [lo, hi)
        block = np.sign(vals[None, lo + 1:] - vals[lo:hi, None])
        # mask to j > i within the block
        j_idx = np.arange(lo + 1, n)[None, :]
        i_idx = np.arange(lo, hi)[:, None]
        s += int(block[j_idx > i_idx].sum())
    return s / (0.5 * n * (n - 1))


def sens_slope_stat(vals: np.ndarray) -> float:
    n = len(vals)
    if n < 2:
        return 0.0
    slopes = []
    idx = np.arange(n, dtype=float)
    for lo in range(0, n - 1, _CHUNK):
        hi = min(lo + _CHUNK, n - 1)
        dv = vals[None, lo + 1:] - vals[lo:hi, None]
        di = idx[None, lo + 1:] - idx[lo:hi, None]
        mask = di > 0
        slopes.append((dv[mask] / di[mask]))
    allslopes = np.concatenate(slopes)
    return float(np.median(allslopes))


def mann_kendall(df: DataFrame, id_col: str = ID, time_col: str = TIME,
                 target_col: str = TARGET) -> DataFrame:
    """Per-series normalized Mann-Kendall statistic -> [id, mann_kendall]."""
    require_columns(df, id_col, time_col, target_col)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[target_col].dropna().to_numpy(dtype=float)
        return pd.DataFrame({id_col: [pdf[id_col].iloc[0]], "mann_kendall": [mann_kendall_stat(vals)]})

    return for_each_series(df, kern, f"{id_col} string, mann_kendall double", id_col, time_col)


def sens_slope(df: DataFrame, id_col: str = ID, time_col: str = TIME,
               target_col: str = TARGET) -> DataFrame:
    """Per-series Sen's slope -> [id, sens_slope]."""
    require_columns(df, id_col, time_col, target_col)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[target_col].dropna().to_numpy(dtype=float)
        return pd.DataFrame({id_col: [pdf[id_col].iloc[0]], "sens_slope": [sens_slope_stat(vals)]})

    return for_each_series(df, kern, f"{id_col} string, sens_slope double", id_col, time_col)

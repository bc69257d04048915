"""Streaming / online operators (SURVEY §2.18).

Reference parity:
- StreamingETS            -> polars_ts/streaming/ets.py:13-280
  (per-series {level, trend, seasons, last_time} state; fit()
  initializes, partial_fit() folds new observations — new ids
  bootstrapped — predict(h) extrapolates from state)
- StreamingKalmanFilter   -> polars_ts/streaming/kalman.py:1-158
- StreamingGlobalForecaster -> polars_ts/streaming/global_model.py:15-169
- SlidingWindowManager    -> polars_ts/streaming/window.py:10-77

The reference's streaming model is ordered micro-batch partial_fit
with NO watermarks or event-time windows (SURVEY §2.18) — the classes
here preserve exactly that contract and are runnable standalone.

Spark Structured Streaming integration lives in structured.py: the
same per-series state update running under applyInPandasWithState,
plus watermarked event-time aggregation as our beyond-reference
extension.

Scale note: these batch classes keep state in a driver dict keyed by
series id — faithful to the reference and fine for bounded panels.
The structured.py path stores the identical state tuples in Spark's
state store (RocksDB at scale), one entry per key, which is the
100 TB-safe form.
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from polars_ts_spark.panel import ID, TARGET, TIME


class SlidingWindowManager:
    """Bounded per-series buffers (window.py:10-77)."""

    def __init__(self, window_size: int = 100):
        self.window_size = window_size
        self._buf: dict[str, deque] = {}

    def append(self, series_id: str, value: float) -> None:
        self._buf.setdefault(series_id, deque(maxlen=self.window_size)).append(float(value))

    def extend(self, series_id: str, values) -> None:
        for v in values:
            self.append(series_id, v)

    def get(self, series_id: str) -> np.ndarray:
        return np.asarray(self._buf.get(series_id, ()), dtype=float)

    def series_ids(self) -> list[str]:
        return sorted(self._buf)

    def __len__(self) -> int:
        return len(self._buf)


def _pdf_from(df) -> pd.DataFrame:
    return df.toPandas() if isinstance(df, DataFrame) else pd.DataFrame(df)


class StreamingETS:
    """Online exponential smoothing (ets.py:13-280).
    method: ses | holt | holt_winters. State per series:
    {level, trend, seasons, last_time}."""

    def __init__(
        self,
        method: str = "ses",
        alpha: float = 0.3,
        beta: float = 0.1,
        gamma: float = 0.1,
        season_length: int = 7,
        id_col: str = ID,
        time_col: str = TIME,
        target_col: str = TARGET,
    ):
        assert method in ("ses", "holt", "holt_winters")
        self.method = method
        self.alpha, self.beta, self.gamma = alpha, beta, gamma
        self.m = season_length
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col
        self.state: dict[str, dict] = {}

    # -- state update kernel (shared with the structured-streaming path)

    def _update_one(self, st: dict | None, ys: np.ndarray, ts) -> dict:
        a, b, g, m = self.alpha, self.beta, self.gamma, self.m
        if st is None:
            st = {"level": float(ys[0]), "trend": 0.0, "seasons": [0.0] * m, "idx": 0,
                  "last_time": None, "n": 0}
            if self.method == "holt_winters" and len(ys) >= 2 * m:
                s1, s2 = ys[:m], ys[m:2 * m]
                st["level"] = float(s1.mean())
                st["trend"] = float((s2.mean() - s1.mean()) / m)
                st["seasons"] = list(ys[:m] - s1.mean())
            ys = ys[1:]
            st["n"] = 1
        for y in ys:
            lvl, tr = st["level"], st["trend"]
            if self.method == "ses":
                st["level"] = a * y + (1 - a) * lvl
            elif self.method == "holt":
                st["level"] = a * y + (1 - a) * (lvl + tr)
                st["trend"] = b * (st["level"] - lvl) + (1 - b) * tr
            else:
                i = st["idx"] % m
                s = st["seasons"][i]
                st["level"] = a * (y - s) + (1 - a) * (lvl + tr)
                st["trend"] = b * (st["level"] - lvl) + (1 - b) * tr
                st["seasons"][i] = g * (y - st["level"]) + (1 - g) * s
                st["idx"] += 1
            st["n"] += 1
        st["last_time"] = ts
        return st

    def fit(self, df) -> "StreamingETS":
        self.state = {}
        return self.partial_fit(df)

    def partial_fit(self, df) -> "StreamingETS":
        pdf = _pdf_from(df).sort_values([self.id_col, self.time_col])
        for sid, g in pdf.groupby(self.id_col, sort=True):
            ys = g[self.target_col].to_numpy(dtype=float)
            ts = g[self.time_col].iloc[-1]
            prev = self.state.get(str(sid))
            # continuing series must not re-run init
            if prev is None:
                self.state[str(sid)] = self._update_one(None, ys, ts)
            else:
                self.state[str(sid)] = self._update_one(prev, ys, ts)
        return self

    def predict(self, h: int = 7) -> pd.DataFrame:
        rows = []
        for sid in sorted(self.state):
            st = self.state[sid]
            for k in range(1, h + 1):
                if self.method == "ses":
                    y_hat = st["level"]
                elif self.method == "holt":
                    y_hat = st["level"] + k * st["trend"]
                else:
                    s = st["seasons"][(st["idx"] + k - 1) % self.m]
                    y_hat = st["level"] + k * st["trend"] + s
                rows.append({self.id_col: sid, "step": k, "y_hat": float(y_hat)})
        return pd.DataFrame(rows)


class StreamingKalmanFilter:
    """Online per-series Kalman state (x, P) with single-observation
    updates (streaming/kalman.py:1-158). Local-level model."""

    def __init__(self, q: float = 0.01, r: float = 1.0,
                 id_col: str = ID, time_col: str = TIME, target_col: str = TARGET):
        self.q, self.r = q, r
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col
        self.state: dict[str, tuple[float, float]] = {}

    def _update_one(self, st: tuple[float, float] | None, ys: np.ndarray) -> tuple[float, float]:
        x, P = st if st is not None else (float(ys[0]), 1.0)
        start = 0 if st is not None else 1
        for y in ys[start:]:
            P = P + self.q
            S = P + self.r
            K = P / S
            x = x + K * (y - x)
            P = (1 - K) * P
        return float(x), float(P)

    def fit(self, df) -> "StreamingKalmanFilter":
        self.state = {}
        return self.partial_fit(df)

    def partial_fit(self, df) -> "StreamingKalmanFilter":
        pdf = _pdf_from(df).sort_values([self.id_col, self.time_col])
        for sid, g in pdf.groupby(self.id_col, sort=True):
            ys = g[self.target_col].to_numpy(dtype=float)
            self.state[str(sid)] = self._update_one(self.state.get(str(sid)), ys)
        return self

    def predict(self, h: int = 1) -> pd.DataFrame:
        rows = [
            {self.id_col: sid, "step": k, "y_hat": self.state[sid][0]}
            for sid in sorted(self.state)
            for k in range(1, h + 1)
        ]
        return pd.DataFrame(rows)


class OnlineSGDRegressor:
    """Linear model with normalized-LMS partial_fit (stands in for
    sklearn's SGDRegressor in streaming/global_model.py). NLMS divides
    each gradient step by (1 + ||x||²), making the learning rate
    scale-invariant — raw SGD diverges on unnormalized lag features."""

    def __init__(self, lr: float = 0.5, l2: float = 0.0):
        self.lr, self.l2 = lr, l2
        self.w: np.ndarray | None = None

    def partial_fit(self, X: np.ndarray, y: np.ndarray) -> "OnlineSGDRegressor":
        X = np.asarray(X, float)
        y = np.asarray(y, float)
        if self.w is None:
            self.w = np.zeros(X.shape[1] + 1)
        for xi, yi in zip(X, y):
            pred = xi @ self.w[:-1] + self.w[-1]
            err = pred - yi
            norm = 1.0 + xi @ xi
            self.w[:-1] -= self.lr * (err * xi / norm + self.l2 * self.w[:-1])
            self.w[-1] -= self.lr * err / norm
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(X, float) @ self.w[:-1] + self.w[-1]


class StreamingGlobalForecaster:
    """Global online model + per-series sliding lag buffers
    (streaming/global_model.py:15-169): each partial_fit builds lag
    features from the buffers, one SGD pass, buffers updated."""

    def __init__(self, lags=(1, 2, 3), window_size: int = 50, lr: float = 0.01,
                 id_col: str = ID, time_col: str = TIME, target_col: str = TARGET):
        self.lags = list(lags)
        self.buffers = SlidingWindowManager(window_size)
        self.est = OnlineSGDRegressor(lr=lr)
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col

    def partial_fit(self, df) -> "StreamingGlobalForecaster":
        pdf = _pdf_from(df).sort_values([self.id_col, self.time_col])
        X_rows, y_rows = [], []
        for sid, g in pdf.groupby(self.id_col, sort=True):
            for y in g[self.target_col].to_numpy(dtype=float):
                buf = self.buffers.get(str(sid))
                if len(buf) >= max(self.lags):
                    X_rows.append([buf[-k] for k in self.lags])
                    y_rows.append(y)
                self.buffers.append(str(sid), y)
        if X_rows:
            self.est.partial_fit(np.asarray(X_rows), np.asarray(y_rows))
        return self

    def predict(self, h: int = 1) -> pd.DataFrame:
        rows = []
        for sid in self.buffers.series_ids():
            buf = list(self.buffers.get(sid))
            for k in range(1, h + 1):
                if len(buf) < max(self.lags) or self.est.w is None:
                    y_hat = float(buf[-1]) if buf else 0.0
                else:
                    x = np.asarray([[buf[-kk] for kk in self.lags]])
                    y_hat = float(self.est.predict(x)[0])
                buf.append(y_hat)
                rows.append({self.id_col: sid, "step": k, "y_hat": y_hat})
        return pd.DataFrame(rows)

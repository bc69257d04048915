"""Anomaly detection (SURVEY §2.15): isolation forest on engineered
features and Bayesian NIG predictive-likelihood scores.

Reference parity:
- isolation_forest_detect -> polars_ts/anomaly_forest.py:10-101
  (sklearn IsolationForest; ours is a self-contained numpy isolation
  forest — same algorithm, seeded)
- bayesian_anomaly_score / BayesianAnomalyDetector
  -> polars_ts/bayesian/anomaly.py:133-329 (normal-inverse-gamma
  posterior, Student-t predictive; low predictive density = anomaly)

Spark mapping: feature build is the §2.11 window plan; the forest is
fit on a collected (or sampled) matrix — global mode — and scoring is
a broadcast-tree pandas UDF over the full panel. The Bayesian score is
a sequential per-series recursion -> applyInPandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_ts_spark.functions.numutils import _lgamma
from polars_ts_spark.operators.kernel import for_each_series
from polars_ts_spark.panel import ID, TARGET, TIME

# ---------------------------------------------------------------------------
# isolation forest (numpy)


class _ITree:
    __slots__ = ("feat", "thresh", "left", "right", "size")

    def __init__(self, X: np.ndarray, depth: int, max_depth: int, rng: np.random.Generator):
        self.size = len(X)
        self.feat = self.thresh = self.left = self.right = None
        if depth >= max_depth or len(X) <= 1:
            return
        spans = X.max(axis=0) - X.min(axis=0)
        ok = np.flatnonzero(spans > 0)
        if len(ok) == 0:
            return
        self.feat = int(rng.choice(ok))
        lo, hi = X[:, self.feat].min(), X[:, self.feat].max()
        self.thresh = float(rng.uniform(lo, hi))
        mask = X[:, self.feat] < self.thresh
        self.left = _ITree(X[mask], depth + 1, max_depth, rng)
        self.right = _ITree(X[~mask], depth + 1, max_depth, rng)

    def path_length(self, x: np.ndarray, depth: int = 0) -> float:
        if self.feat is None:
            return depth + _avg_path(self.size)
        child = self.left if x[self.feat] < self.thresh else self.right
        return child.path_length(x, depth + 1)


def _avg_path(n: int) -> float:
    if n <= 1:
        return 0.0
    h = np.log(n - 1) + 0.5772156649
    return 2.0 * h - 2.0 * (n - 1) / n


class IsolationForest:
    """Seeded numpy isolation forest (anomaly_forest.py semantics)."""

    def __init__(self, n_trees: int = 100, sample_size: int = 256, seed: int = 42):
        self.n_trees, self.sample_size, self.seed = n_trees, sample_size, seed

    def fit(self, X: np.ndarray) -> "IsolationForest":
        X = np.asarray(X, float)
        rng = np.random.default_rng(self.seed)
        ss = min(self.sample_size, len(X))
        max_depth = int(np.ceil(np.log2(max(ss, 2))))
        self.trees = []
        for _ in range(self.n_trees):
            idx = rng.choice(len(X), ss, replace=False)
            self.trees.append(_ITree(X[idx], 0, max_depth, rng))
        self._c = _avg_path(ss)
        return self

    def score(self, X: np.ndarray) -> np.ndarray:
        """Anomaly score in (0, 1); > 0.5 ~ anomalous."""
        X = np.asarray(X, float)
        depths = np.array([
            np.mean([t.path_length(x) for t in self.trees]) for x in X
        ])
        return 2.0 ** (-depths / max(self._c, 1e-9))


def isolation_forest_detect(
    df: DataFrame,
    feature_cols: list[str] | None = None,
    threshold: float = 0.6,
    n_trees: int = 100,
    seed: int = 42,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Global-model isolation forest over panel features ->
    [.., anomaly_score, is_anomaly]. Default features: y, lag-1 diff,
    rolling z-score components."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(time_col)
    feats = df
    if feature_cols is None:
        feats = (
            df.withColumn("__d1", F.col(target_col) - F.lag(target_col, 1).over(w))
            .withColumn(
                "__rz",
                (F.col(target_col) - F.avg(target_col).over(Window.partitionBy(id_col)))
                / F.stddev_samp(target_col).over(Window.partitionBy(id_col)),
            )
            .fillna(0.0, ["__d1", "__rz"])
        )
        feature_cols = [target_col, "__d1", "__rz"]
    # Subsample-capped fit: isolation forests train each tree on a
    # 256-row subsample anyway (ref anomaly_forest.py:10-101), so
    # collecting the full panel buys nothing. Count first (scalar),
    # sample only what the fit needs, and score the ORIGINAL
    # distributed frame — no createDataFrame round-trip.
    FIT_CAP = 100_000
    feat_only = feats.select(*feature_cols)
    n = feat_only.count()
    if n > FIT_CAP:
        frac = min(1.0, 1.2 * FIT_CAP / n)
        fit_pdf = feat_only.sample(fraction=frac, seed=seed).limit(FIT_CAP).toPandas()
    else:
        fit_pdf = feat_only.toPandas()
    X = fit_pdf.to_numpy(dtype=float)
    forest = IsolationForest(n_trees=n_trees, seed=seed).fit(X)
    # broadcast the fitted trees; score inside a pandas UDF partition-wise
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(forest)
    extra = [c for c in feature_cols if c not in (id_col, time_col, target_col)]
    sdf = feats.select(id_col, time_col, target_col, *extra)

    def score(batches):
        for b in batches:
            Xb = b[feature_cols].to_numpy(dtype=float)
            s = bc.value.score(Xb)
            out = b[[id_col, time_col, target_col]].copy()
            out["anomaly_score"] = s
            out["is_anomaly"] = s > threshold
            yield out

    dtypes = dict(df.dtypes)
    schema = (
        f"{id_col} {dtypes.get(id_col, 'string')}, "
        f"{time_col} {dtypes.get(time_col, 'timestamp')}, "
        f"{target_col} double, anomaly_score double, is_anomaly boolean"
    )
    return sdf.mapInPandas(score, schema)


# ---------------------------------------------------------------------------
# Bayesian NIG anomaly scores


def bayesian_anomaly_series(
    y: np.ndarray,
    mu0: float = 0.0,
    kappa0: float = 0.01,
    alpha0: float = 1.0,
    beta0: float = 1.0,
) -> np.ndarray:
    """Per-step negative log predictive density under the running NIG
    posterior (anomaly.py:133-250): high = surprising observation."""
    y = np.asarray(y, float)
    mu, kappa, alpha, beta = mu0, kappa0, alpha0, beta0
    out = np.empty(len(y))
    for t, yt in enumerate(y):
        df_ = 2 * alpha
        scale2 = beta * (kappa + 1) / (alpha * kappa)
        z2 = (yt - mu) ** 2 / scale2
        log_pdf = (
            _lgamma((df_ + 1) / 2) - _lgamma(df_ / 2)
            - 0.5 * np.log(np.pi * df_ * scale2)
            - (df_ + 1) / 2 * np.log1p(z2 / df_)
        )
        out[t] = -log_pdf
        beta = beta + kappa * (yt - mu) ** 2 / (2 * (kappa + 1))
        mu = (kappa * mu + yt) / (kappa + 1)
        kappa += 1
        alpha += 0.5
    return out


def bayesian_anomaly_score(
    df: DataFrame,
    threshold: float | None = None,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """[id, ds, y, anomaly_score, is_anomaly] — NIG predictive
    surprise per observation; threshold defaults to mean + 3 std of the
    series' own scores."""

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        y = pdf[target_col].to_numpy(dtype=float)
        s = bayesian_anomaly_series(y - np.nanmean(y))
        thr = threshold if threshold is not None else float(s.mean() + 3 * s.std())
        return pd.DataFrame({
            id_col: pdf[id_col], time_col: pdf[time_col], target_col: y,
            "anomaly_score": s, "is_anomaly": s > thr,
        })

    schema = (
        f"{id_col} string, {time_col} timestamp, {target_col} double, "
        "anomaly_score double, is_anomaly boolean"
    )
    return for_each_series(df, kern, schema, id_col=id_col)

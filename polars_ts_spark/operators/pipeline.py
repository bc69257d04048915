"""ML forecasting pipeline layer (SURVEY §2.12 — the flagship ops).

Reference parity:
- RecursiveForecaster -> polars_ts/models/multistep.py:61-252 (train a
  1-step model on the lag matrix; recursive h-step feedback)
- DirectForecaster    -> polars_ts/models/multistep.py:255-450 (one
  model per horizon step)
- ForecastPipeline    -> polars_ts/pipeline.py:209-462 (transform ->
  lag/rolling/calendar features -> estimator; recursive decode with
  in-loop feature rebuild + inverse transform)
- GlobalForecaster    -> polars_ts/global_model.py:25-382 (pooled
  pipeline + ordinal id encoding)
- QuantileRegressor   -> polars_ts/probabilistic/quantile_regression.py:19-177

Spark split (SURVEY §3.2): TRAINING features are built by the Catalyst
window plan (operators/features.py — one shuffle for the whole chain);
the design matrix is collected to the driver for the closed-form ridge
solve (X'X is n_features², independent of panel size — at 100 TB the
collect becomes a treeAggregate of X'X/X'y Gram blocks, same math).
PREDICTION is `applyInPandas` per series: the recursive decode
replicates the training feature builder step-by-step in numpy with the
broadcast coefficient vector — exactly the reference's
`_build_step_features` loop (pipeline.py:116-201), vectorized per
group and distributed across series.

Estimators are pluggable via the sklearn protocol (fit/predict);
RidgeEstimator (functions/numutils.py) is the built-in default since
the container ships no sklearn.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_ts_spark.functions.numutils import RidgeEstimator
from polars_ts_spark.operators import features as FT
from polars_ts_spark.operators.kernel import for_each_series
from polars_ts_spark.panel import ID, TARGET, TIME, require_columns

# ---------------------------------------------------------------------------
# design-matrix assembly (training side — pure Spark feature plan)


def _training_frame(
    df: DataFrame,
    lags: list[int],
    rolling_windows: list[int],
    rolling_aggs: list[str],
    calendar: bool,
    id_col: str,
    time_col: str,
    target_col: str,
    past_covariates: list[str] | None = None,
    past_covariate_lags: list[int] | None = None,
    future_covariates: list[str] | None = None,
) -> tuple[DataFrame, list[str]]:
    out = FT.lag_features(df, lags, id_col, time_col, target_col)
    if past_covariates:
        # lagged values only — the covariate's CURRENT value is unknown
        # at decode time (ref multistep.py:143-160)
        cov_lags = past_covariate_lags or list(lags)
        out = FT.covariate_lag_features(out, past_covariates, cov_lags, id_col, time_col)
    if rolling_windows:
        # rolling features must not leak the current value into the
        # regressors: shift by 1 (reference builds them from history
        # in the decode loop, pipeline.py:137-160)
        lagged = out.withColumn(
            "__y_shift", F.lag(target_col, 1).over(FT.series_window(id_col, time_col))
        )
        lagged = FT.rolling_features(
            lagged, rolling_windows, rolling_aggs, id_col=id_col,
            time_col=time_col, target_col="__y_shift", min_samples=1,
        )
        for w in rolling_windows:
            for a in rolling_aggs:
                lagged = lagged.withColumnRenamed(
                    f"__y_shift_rolling_{a}_{w}", f"{target_col}_rolling_{a}_{w}"
                )
        out = lagged.drop("__y_shift")
    if calendar:
        out = FT.calendar_features(
            out,
            ["day_of_week", "day_of_month", "month", "quarter", "year", "is_weekend"],
            time_col=time_col,
        )
    # raw past-covariate columns are carriers, not features; future
    # covariates ARE features (known over the horizon, ref pipeline.py:62-66)
    excluded = {id_col, time_col, target_col, *(past_covariates or [])}
    feat_cols = [c for c in out.columns if c not in excluded]
    return out.dropna(), feat_cols


def _collect_xy(feat_df: DataFrame, feat_cols: list[str], target_col: str):
    pdf = feat_df.select(*feat_cols, target_col).toPandas()
    X = pdf[feat_cols].to_numpy(dtype=float)
    y = pdf[target_col].to_numpy(dtype=float)
    return X, y


def _ridge_fit_distributed(
    feat_df: DataFrame, feat_cols: list[str], target_col: str, alpha: float
) -> np.ndarray:
    """Fit ridge WITHOUT collecting the design matrix: X'X and X'y are
    sums of per-row outer products, so one Spark aggregation of
    d(d+3)/2 + 2 scalars replaces shipping n×d rows to the driver —
    the design-matrix collect is the piece that cannot survive a 100×
    scale-up; the sufficient statistics are O(d²) regardless of n.
    Returns w (intercept last), identical to numutils.ridge_fit up to
    float summation order."""
    d = len(feat_cols)
    c = [F.col(f).cast("double") for f in feat_cols]
    t = F.col(target_col).cast("double")
    exprs = []
    for i in range(d):
        for j in range(i, d):
            exprs.append(F.sum(c[i] * c[j]).alias(f"xx_{i}_{j}"))
        exprs.append(F.sum(c[i]).alias(f"xs_{i}"))
        exprs.append(F.sum(c[i] * t).alias(f"xy_{i}"))
    exprs.append(F.sum(t).alias("__ys"))
    exprs.append(F.count(F.lit(1)).alias("__n"))
    row = feat_df.agg(*exprs).collect()[0]
    A = np.zeros((d + 1, d + 1))
    b = np.zeros(d + 1)
    for i in range(d):
        for j in range(i, d):
            A[i, j] = A[j, i] = row[f"xx_{i}_{j}"]
        A[i, d] = A[d, i] = row[f"xs_{i}"]
        b[i] = row[f"xy_{i}"]
    A[d, d] = float(row["__n"])
    b[d] = row["__ys"]
    if alpha > 0:
        idx = np.arange(d)
        A[idx, idx] += alpha
    return np.linalg.solve(A, b)


def _fit_estimator(est, feat_df: DataFrame, feat_cols: list[str], target_col: str):
    """Ridge (the default) fits from distributed sufficient statistics;
    arbitrary sklearn-protocol estimators fall back to collecting the
    (driver-scale) design matrix, as the reference does."""
    from polars_ts_spark.functions.numutils import RidgeEstimator as _RE

    if isinstance(est, _RE):
        est.coef_ = _ridge_fit_distributed(feat_df, feat_cols, target_col, est.alpha)
        return est
    X, y = _collect_xy(feat_df, feat_cols, target_col)
    return est.fit(X, y)


def _np_calendar(ts: pd.Timestamp) -> dict[str, float]:
    iso_dow = float(ts.isoweekday())
    return {
        "day_of_week": iso_dow,
        "day_of_month": float(ts.day),
        "month": float(ts.month),
        "quarter": float((ts.month - 1) // 3 + 1),
        "year": float(ts.year),
        "is_weekend": 1.0 if iso_dow >= 6 else 0.0,
    }


class RecursiveForecaster:
    """1-step estimator on lag/rolling/calendar features; h-step
    recursive decode feeding predictions back (multistep.py:61-252).

    fit() runs one Spark feature job + a driver solve; predict()
    distributes the sequential decode per series."""

    def __init__(
        self,
        estimator=None,
        lags: list[int] = (1, 7),
        rolling_windows: list[int] = (),
        rolling_aggs: list[str] = ("mean",),
        calendar: bool = False,
        past_covariates: list[str] | None = None,
        future_covariates: list[str] | None = None,
        past_covariate_lags: list[int] | None = None,
        id_col: str = ID,
        time_col: str = TIME,
        target_col: str = TARGET,
    ):
        self.estimator = estimator or RidgeEstimator()
        self.lags = list(lags)
        self.rolling_windows = list(rolling_windows)
        self.rolling_aggs = list(rolling_aggs)
        self.calendar = calendar
        self.past_covariates = sorted(past_covariates) if past_covariates else None
        self.future_covariates = sorted(future_covariates) if future_covariates else None
        self.past_covariate_lags = sorted(past_covariate_lags) if past_covariate_lags else None
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col
        self.feat_cols: list[str] | None = None

    def fit(self, df: DataFrame) -> "RecursiveForecaster":
        require_columns(df, self.id_col, self.time_col, self.target_col,
                        *(self.past_covariates or []), *(self.future_covariates or []))
        feat_df, feat_cols = _training_frame(
            df, self.lags, self.rolling_windows, self.rolling_aggs,
            self.calendar, self.id_col, self.time_col, self.target_col,
            self.past_covariates, self.past_covariate_lags, self.future_covariates,
        )
        self.feat_cols = feat_cols
        _fit_estimator(self.estimator, feat_df, feat_cols, self.target_col)
        return self

    def _decode_input(self, df: DataFrame, future_df: DataFrame | None) -> DataFrame:
        """History rows plus (optional) future-covariate rows, tagged by
        __role, co-partitioned by series — the future covariate lookup
        stays distributed instead of a driver dict (ref multistep.py
        builds future_lookup on the driver)."""
        if self.future_covariates and future_df is None:
            raise ValueError("future_df is required when future_covariates are configured")
        hist = df.select(
            self.id_col, self.time_col,
            F.col(self.target_col).cast("double").alias(self.target_col),
            *[F.col(c).cast("double").alias(c)
              for c in (*(self.past_covariates or []), *(self.future_covariates or []))],
        ).withColumn("__role", F.lit("hist"))
        if not self.future_covariates:
            return hist
        fut = future_df.select(
            self.id_col, self.time_col,
            F.lit(None).cast("double").alias(self.target_col),
            *[F.lit(None).cast("double").alias(c) for c in (self.past_covariates or [])],
            *[F.col(c).cast("double") for c in self.future_covariates],
        ).withColumn("__role", F.lit("future"))
        return hist.unionByName(fut)

    def _decode_kernel(self, h: int):
        est = self.estimator
        lags = self.lags
        rw, ra = self.rolling_windows, self.rolling_aggs
        cal = self.calendar
        pcov = self.past_covariates or []
        fcov = self.future_covariates or []
        cov_lags = self.past_covariate_lags or self.lags
        idc, tc, yc = self.id_col, self.time_col, self.target_col
        feat_cols = list(self.feat_cols)

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            if "__role" in pdf.columns:
                fut_rows = pdf[pdf["__role"] == "future"]
                pdf = pdf[pdf["__role"] == "hist"]
            else:
                fut_rows = pdf.iloc[0:0]
            pdf = pdf.sort_values(tc)
            if not len(pdf):
                return pd.DataFrame({idc: pd.Series([], dtype="str"),
                                     tc: pd.Series([], dtype="datetime64[us]"),
                                     "y_hat": pd.Series([], dtype="float64")})
            hist = list(pdf[yc].to_numpy(dtype=float))
            # past covariates are frozen at their last known values during
            # decode (ref multistep.py:225-243: buffers are never extended)
            pcov_tail = {c: pdf[c].to_numpy(dtype=float) for c in pcov}
            fcov_by_ts = {
                c: dict(zip(pd.to_datetime(fut_rows[tc]), fut_rows[c].astype(float)))
                for c in fcov
            } if len(fut_rows) else {c: {} for c in fcov}
            ts = pd.to_datetime(pdf[tc])
            freq = (ts.diff().dropna().median()) if len(ts) > 1 else pd.Timedelta(days=1)
            cur_t = ts.iloc[-1]
            out_t, out_y = [], []
            for _ in range(h):
                cur_t = cur_t + freq
                row = {}
                for k in lags:
                    row[f"{yc}_lag_{k}"] = hist[-k] if k <= len(hist) else np.nan
                for w in rw:
                    tail = np.asarray(hist[-w:], dtype=float)
                    for a in ra:
                        row[f"{yc}_rolling_{a}_{w}"] = getattr(np, a if a != "mean" else "mean")(tail) if a != "std" else tail.std(ddof=1)
                if cal:
                    row.update(_np_calendar(cur_t))
                for c in pcov:
                    buf = pcov_tail[c]
                    for k in cov_lags:
                        row[f"{c}_lag_{k}"] = buf[-k] if k <= len(buf) else (buf[0] if len(buf) else 0.0)
                for c in fcov:
                    row[c] = fcov_by_ts[c].get(cur_t, 0.0)
                x = np.array([[row[c] for c in feat_cols]], dtype=float)
                y_hat = float(est.predict(x)[0])
                hist.append(y_hat)
                out_t.append(cur_t)
                out_y.append(y_hat)
            return pd.DataFrame({idc: pdf[idc].iloc[0], tc: out_t, "y_hat": out_y})

        return kern

    def predict(self, df: DataFrame, h: int = 7, future_df: DataFrame | None = None) -> DataFrame:
        if self.feat_cols is None:
            raise RuntimeError("call fit() first")
        schema = f"{self.id_col} string, {self.time_col} timestamp, y_hat double"
        inp = self._decode_input(df, future_df)
        return for_each_series(inp, self._decode_kernel(h), schema, id_col=self.id_col, time_col=self.time_col)


class DirectForecaster(RecursiveForecaster):
    """One estimator per horizon step trained on shifted targets
    (multistep.py:255-450): no recursive feedback, h independent
    1-shot models."""

    def fit(self, df: DataFrame, h: int = 7) -> "DirectForecaster":
        require_columns(df, self.id_col, self.time_col, self.target_col,
                        *(self.past_covariates or []), *(self.future_covariates or []))
        self.h = h
        feat_df, feat_cols = _training_frame(
            df, self.lags, self.rolling_windows, self.rolling_aggs,
            self.calendar, self.id_col, self.time_col, self.target_col,
            self.past_covariates, self.past_covariate_lags, self.future_covariates,
        )
        self.feat_cols = feat_cols
        w = FT.series_window(self.id_col, self.time_col)
        self.models = []
        for step in range(1, h + 1):
            shifted = feat_df.withColumn("__target", F.lead(self.target_col, step - 1).over(w))
            # model k sees the future covariate's value AT the predicted
            # step, not at the feature row (ref multistep.py:355-360)
            for c in (self.future_covariates or []):
                shifted = shifted.withColumn(c, F.lead(c, step - 1).over(w))
            shifted = shifted.dropna()
            est = self.estimator.clone() if hasattr(self.estimator, "clone") else RidgeEstimator()
            self.models.append(_fit_estimator(est, shifted, feat_cols, "__target"))
        return self

    def predict(self, df: DataFrame, h: int | None = None,
                future_df: DataFrame | None = None) -> DataFrame:
        h = h or self.h
        models = self.models[:h]
        lags, rw, ra, cal = self.lags, self.rolling_windows, self.rolling_aggs, self.calendar
        pcov = self.past_covariates or []
        fcov = self.future_covariates or []
        cov_lags = self.past_covariate_lags or self.lags
        idc, tc, yc = self.id_col, self.time_col, self.target_col
        feat_cols = list(self.feat_cols)

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            if "__role" in pdf.columns:
                fut_rows = pdf[pdf["__role"] == "future"]
                pdf = pdf[pdf["__role"] == "hist"]
            else:
                fut_rows = pdf.iloc[0:0]
            pdf = pdf.sort_values(tc)
            if not len(pdf):
                return pd.DataFrame({idc: pd.Series([], dtype="str"),
                                     tc: pd.Series([], dtype="datetime64[us]"),
                                     "y_hat": pd.Series([], dtype="float64")})
            hist = list(pdf[yc].to_numpy(dtype=float))
            fcov_by_ts = {
                c: dict(zip(pd.to_datetime(fut_rows[tc]), fut_rows[c].astype(float)))
                for c in fcov
            } if len(fut_rows) else {c: {} for c in fcov}
            ts = pd.to_datetime(pdf[tc])
            freq = (ts.diff().dropna().median()) if len(ts) > 1 else pd.Timedelta(days=1)
            row = {}
            for k in lags:
                row[f"{yc}_lag_{k}"] = hist[-k] if k <= len(hist) else np.nan
            for w_ in rw:
                tail = np.asarray(hist[-w_:], dtype=float)
                for a in ra:
                    row[f"{yc}_rolling_{a}_{w_}"] = tail.mean() if a == "mean" else tail.std(ddof=1)
            for c in pcov:
                buf = pdf[c].to_numpy(dtype=float)
                for k in cov_lags:
                    row[f"{c}_lag_{k}"] = buf[-k] if k <= len(buf) else (buf[0] if len(buf) else 0.0)
            out_t, out_y = [], []
            cur_t = ts.iloc[-1]
            for s, est in enumerate(models, start=1):
                cur_t = cur_t + freq
                r = dict(row)
                if cal:
                    r.update(_np_calendar(cur_t))
                for c in fcov:
                    r[c] = fcov_by_ts[c].get(cur_t, 0.0)
                x = np.array([[r[c] for c in feat_cols]], dtype=float)
                out_t.append(cur_t)
                out_y.append(float(est.predict(x)[0]))
            return pd.DataFrame({idc: pdf[idc].iloc[0], tc: out_t, "y_hat": out_y})

        schema = f"{idc} string, {tc} timestamp, y_hat double"
        inp = self._decode_input(df, future_df)
        return for_each_series(inp, kern, schema, id_col=idc, time_col=tc)


class ForecastPipeline(RecursiveForecaster):
    """Full pipeline: optional log target transform + the recursive
    feature pipeline (pipeline.py:209-462). ``target_transform`` in
    {None, "log"} (log1p/expm1 round trip, transforms/log.py)."""

    def __init__(self, *args, target_transform: str | None = None, **kw):
        super().__init__(*args, **kw)
        self.target_transform = target_transform

    def fit(self, df: DataFrame) -> "ForecastPipeline":
        if self.target_transform == "log":
            df = df.withColumn(self.target_col, F.log1p(F.col(self.target_col)))
        super().fit(df)
        return self

    def predict(self, df: DataFrame, h: int = 7, future_df: DataFrame | None = None) -> DataFrame:
        if self.target_transform == "log":
            df = df.withColumn(self.target_col, F.log1p(F.col(self.target_col)))
        out = super().predict(df, h, future_df)
        if self.target_transform == "log":
            out = out.withColumn("y_hat", F.expm1(F.col("y_hat")))
        return out


class GlobalForecaster(RecursiveForecaster):
    """Pooled model with ordinal id encoding as an extra feature
    (global_model.py:25-382). The encoding is a broadcast join of a
    tiny id->code map; decode adds the constant per series."""

    def fit(self, df: DataFrame) -> "GlobalForecaster":
        ids = [r[0] for r in df.select(self.id_col).distinct().orderBy(self.id_col).collect()]
        self.id_codes = {s: float(i) for i, s in enumerate(ids)}
        code_df = df.sparkSession.createDataFrame(
            [(s, c) for s, c in self.id_codes.items()], [self.id_col, "__id_code"]
        )
        df2 = df.join(F.broadcast(code_df), self.id_col)
        feat_df, feat_cols = _training_frame(
            df2, self.lags, self.rolling_windows, self.rolling_aggs,
            self.calendar, self.id_col, self.time_col, self.target_col,
        )
        feat_cols = [c for c in feat_cols if c != "__id_code"] + ["__id_code"]
        self.feat_cols = feat_cols
        _fit_estimator(self.estimator, feat_df, feat_cols, self.target_col)
        return self

    def predict(self, df: DataFrame, h: int = 7) -> DataFrame:
        codes = self.id_codes
        idc = self.id_col
        est, feat_cols = self.estimator, list(self.feat_cols)
        lags, rw, ra, cal = self.lags, self.rolling_windows, self.rolling_aggs, self.calendar
        tc, yc = self.time_col, self.target_col

        def kern2(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(tc)
            code = codes.get(str(pdf[idc].iloc[0]), -1.0)
            hist = list(pdf[yc].to_numpy(dtype=float))
            ts = pd.to_datetime(pdf[tc])
            freq = (ts.diff().dropna().median()) if len(ts) > 1 else pd.Timedelta(days=1)
            cur_t = ts.iloc[-1]
            out_t, out_y = [], []
            for _ in range(h):
                cur_t = cur_t + freq
                row = {"__id_code": code}
                for k in lags:
                    row[f"{yc}_lag_{k}"] = hist[-k] if k <= len(hist) else np.nan
                for w_ in rw:
                    tail = np.asarray(hist[-w_:], dtype=float)
                    for a in ra:
                        row[f"{yc}_rolling_{a}_{w_}"] = tail.mean() if a == "mean" else tail.std(ddof=1)
                if cal:
                    row.update(_np_calendar(cur_t))
                x = np.array([[row[c] for c in feat_cols]], dtype=float)
                y_hat = float(est.predict(x)[0])
                hist.append(y_hat)
                out_t.append(cur_t)
                out_y.append(y_hat)
            return pd.DataFrame({idc: pdf[idc].iloc[0], tc: out_t, "y_hat": out_y})

        schema = f"{idc} string, {tc} timestamp, y_hat double"
        return for_each_series(df, kern2, schema, id_col=idc, time_col=tc)


class QuantileRegressor:
    """One ridge-on-pinball-proxy model per quantile via iteratively
    reweighted least squares (quantile_regression.py:19-177 surface;
    the reference delegates loss to sklearn estimators — we implement
    quantile fits directly). predict emits q_<q> columns."""

    def __init__(self, quantiles=(0.1, 0.5, 0.9), lags=(1, 7), n_irls: int = 20,
                 id_col: str = ID, time_col: str = TIME, target_col: str = TARGET):
        self.quantiles = list(quantiles)
        self.lags = list(lags)
        self.n_irls = n_irls
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col

    def _fit_quantile(self, X: np.ndarray, y: np.ndarray, q: float) -> np.ndarray:
        import math

        X1 = np.column_stack([X, np.ones(len(X))])
        # normal-equation start rather than lstsq's SVD: identical for
        # full-rank designs, and an engine-replicable solve — the IRLS
        # weight map is discontinuous near r = 0, so the DuckDB oracle
        # must start from the same point to stay on the same trajectory.
        # The 1e-8 ridge keeps rank-deficient designs (constant series
        # make lag columns collinear with the intercept) solvable, like
        # the in-loop solves already were.
        w = np.linalg.solve(X1.T @ X1 + 1e-8 * np.eye(X1.shape[1]), X1.T @ y)
        # Quantization grid RELATIVE to the data scale: s = the decade
        # of mean |y| (power of 10, so engine-ulp differences in the
        # mean cannot move it off a knife edge). The raw 1/max(|r|,eps)
        # map is discontinuous at r = 0, so engine ulp differences in r
        # flip tail weights by (1-q)/q and trajectories diverge
        # chaotically; on the grid the weight is locally constant in r.
        # Absolute 1e-3 was scale-dependent (targets below ~1e-2
        # degenerated to a single weight); s·1e-3 is epsilon-smoothing
        # at 0.1% of the target's magnitude at every scale.
        m = float(np.mean(np.abs(y))) if len(y) else 0.0
        s = 10.0 ** math.floor(math.log10(m)) if m > 0 else 1.0
        for _ in range(self.n_irls):
            r = y - X1 @ w
            rc = np.floor(r / s * 1000 + 0.5) / 1000 * s
            wt = np.where(rc >= 0, q, 1 - q) / np.maximum(np.abs(rc), 1e-3 * s)
            A = X1.T @ (wt[:, None] * X1)
            w = np.linalg.solve(A + 1e-8 * np.eye(X1.shape[1]), X1.T @ (wt * y))
        return w

    def fit(self, df: DataFrame) -> "QuantileRegressor":
        feat_df, feat_cols = _training_frame(
            df, self.lags, [], [], False, self.id_col, self.time_col, self.target_col
        )
        self.feat_cols = feat_cols
        X, y = _collect_xy(feat_df, feat_cols, self.target_col)
        self.weights = {q: self._fit_quantile(X, y, q) for q in self.quantiles}
        return self

    def predict(self, df: DataFrame, h: int = 7) -> DataFrame:
        lags, qs, weights = self.lags, self.quantiles, self.weights
        idc, tc, yc = self.id_col, self.time_col, self.target_col
        med_key = min(qs, key=lambda q: abs(q - 0.5))

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(tc)
            hist = list(pdf[yc].to_numpy(dtype=float))
            ts = pd.to_datetime(pdf[tc])
            freq = (ts.diff().dropna().median()) if len(ts) > 1 else pd.Timedelta(days=1)
            cur_t = ts.iloc[-1]
            rows = []
            for _ in range(h):
                cur_t = cur_t + freq
                x = np.array([hist[-k] for k in lags] + [1.0])
                preds = {f"q_{q}": float(x @ weights[q]) for q in qs}
                hist.append(preds[f"q_{med_key}"])  # feed median back
                rows.append({idc: pdf[idc].iloc[0], tc: cur_t, **preds})
            return pd.DataFrame(rows)

        qcols = ", ".join(f"`q_{q}` double" for q in qs)
        schema = f"{idc} string, {tc} timestamp, {qcols}"
        return for_each_series(df, kern, schema, id_col=idc, time_col=tc)

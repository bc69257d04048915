"""Preprocessing operators (SURVEY §2.10): resample, impute, outlier
detect/treat, transforms (log / boxcox / difference), cusum.

All pure window/group expressions — no UDFs — so Catalyst keeps the whole
plan in WholeStageCodegen and reuses the single partition-by-id Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_ts_spark.panel import ID, TARGET, TIME, require_columns, series_partition, series_window

# ---------------------------------------------------------------------------
# resample (polars_ts/resampling.py:8-76)

_RESAMPLE_AGGS = {
    "mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
    "median": lambda c: F.median(c), "first": lambda c: F.first(c, ignorenulls=False),
    "last": lambda c: F.last(c, ignorenulls=False),
}

# polars offset rule -> (spark date_trunc unit | window duration)
_RULE_TRUNC = {"1d": "day", "1w": "week", "1mo": "month", "1q": "quarter", "1y": "year", "1h": "hour"}


def resample(
    df: DataFrame,
    rule: str,
    agg: str = "mean",
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Temporal downsample: group_by_dynamic(every=rule) equivalent.

    Calendar rules (1d/1w/1mo/1q/1y/1h) use ``date_trunc`` — exact parity
    with DuckDB's date_trunc and polars' calendar buckets. Other durations
    (e.g. "15m") use ``F.window`` tumbling windows.

    The ``first``/``last`` aggs need a deterministic order Spark doesn't
    guarantee inside groups, so they use min/max_by on the timestamp.
    """
    require_columns(df, id_col, time_col, target_col)
    rule_n = rule.lower()
    if rule_n in _RULE_TRUNC:
        bucket = F.date_trunc(_RULE_TRUNC[rule_n], F.col(time_col)).alias(time_col)
    else:
        bucket = F.window(time_col, rule).start.alias(time_col)
    if agg == "first":
        expr = F.min_by(target_col, time_col)
    elif agg == "last":
        expr = F.max_by(target_col, time_col)
    elif agg in _RESAMPLE_AGGS:
        expr = _RESAMPLE_AGGS[agg](target_col)
    else:
        raise ValueError(f"unsupported resample agg {agg!r}")
    return (
        df.groupBy(F.col(id_col), bucket)
        .agg(expr.alias(target_col))
    )


# ---------------------------------------------------------------------------
# impute (polars_ts/imputation.py:8-90)


def impute(
    df: DataFrame,
    method: str = "forward_fill",
    add_indicator: bool = False,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Null imputation per series: forward_fill / backward_fill / mean /
    median / linear / seasonal(period=...) — imputation.py:8-90.

    - ffill: ``last(ignorenulls)`` over unbounded-preceding frame.
    - bfill: ``first(ignorenulls)`` over unbounded-following frame.
    - linear: pure window composition (SURVEY §4.2): previous non-null
      value+time and next non-null value+time, linear blend on the row
      index between them.
    """
    require_columns(df, id_col, time_col, target_col)
    w = series_window(id_col, time_col)
    y = F.col(target_col)
    out = df
    if add_indicator:
        out = out.withColumn(f"{target_col}_imputed", y.isNull())

    if method == "forward_fill":
        filled = F.last(y, ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, 0))
    elif method == "backward_fill":
        filled = F.first(y, ignorenulls=True).over(w.rowsBetween(0, Window.unboundedFollowing))
    elif method == "mean":
        filled = F.coalesce(y, F.avg(y).over(series_partition(id_col)))
        return out.withColumn(target_col, filled)
    elif method == "median":
        filled = F.coalesce(y, F.median(y).over(series_partition(id_col)))
        return out.withColumn(target_col, filled)
    elif method == "linear":
        idx = F.row_number().over(w).cast("double")
        prev_w = w.rowsBetween(Window.unboundedPreceding, -1)
        next_w = w.rowsBetween(1, Window.unboundedFollowing)
        pv = F.last(y, ignorenulls=True).over(prev_w)
        pi = F.last(F.when(y.isNotNull(), idx), ignorenulls=True).over(prev_w)
        nv = F.first(y, ignorenulls=True).over(next_w)
        ni = F.first(F.when(y.isNotNull(), idx), ignorenulls=True).over(next_w)
        interp = pv + (nv - pv) * (idx - pi) / (ni - pi)
        filled = F.coalesce(y, interp, pv, nv)
        return out.withColumn(target_col, filled)
    else:
        raise ValueError(f"unsupported impute method {method!r}")
    return out.withColumn(target_col, F.coalesce(y, filled))


def impute_seasonal(
    df: DataFrame,
    period: int,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Seasonal impute: fill a null with the mean of same-phase non-null
    observations in the series (imputation.py seasonal path). Phase =
    (row_index) mod period, partition mean over (id, phase)."""
    require_columns(df, id_col, time_col, target_col)
    w = series_window(id_col, time_col)
    phase = ((F.row_number().over(w) - F.lit(1)) % F.lit(period))
    out = df.withColumn("__phase", phase)
    phase_mean = F.avg(target_col).over(Window.partitionBy(id_col, "__phase"))
    return (
        out.withColumn(target_col, F.coalesce(F.col(target_col), phase_mean))
        .drop("__phase")
    )


# ---------------------------------------------------------------------------
# outliers (polars_ts/outliers.py)


def detect_outliers(
    df: DataFrame,
    method: str = "zscore",
    threshold: float = 3.0,
    window: int = 21,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Flag outliers -> boolean ``is_outlier`` (outliers.py:8-98).

    - zscore: |y - mean| / std > t over the whole series.
    - iqr: outside [q1 - t*IQR, q3 + t*IQR] (threshold acts as the 1.5
      multiplier, outliers.py:62-64). Exact percentiles, not approx.
    - rolling_zscore: stats over a trailing window of ``window`` rows.
    """
    require_columns(df, id_col, time_col, target_col)
    y = F.col(target_col)
    if method == "zscore":
        p = series_partition(id_col)
        mu, sd = F.avg(y).over(p), F.stddev_samp(y).over(p)
        flag = F.when(sd > 0, F.abs(y - mu) / sd > F.lit(threshold)).otherwise(F.lit(False))
    elif method == "iqr":
        p = series_partition(id_col)
        q1 = F.percentile(y, F.lit(0.25)).over(p)
        q3 = F.percentile(y, F.lit(0.75)).over(p)
        iqr = q3 - q1
        lo, hi = q1 - F.lit(threshold) * iqr, q3 + F.lit(threshold) * iqr
        flag = (y < lo) | (y > hi)
    elif method == "rolling_zscore":
        wspec = series_window(id_col, time_col).rowsBetween(-(window - 1), 0)
        mu, sd = F.avg(y).over(wspec), F.stddev_samp(y).over(wspec)
        flag = F.when(sd > 0, F.abs(y - mu) / sd > F.lit(threshold)).otherwise(F.lit(False))
    else:
        raise ValueError(f"unsupported outlier method {method!r}")
    return df.withColumn("is_outlier", flag)


def treat_outliers(
    df: DataFrame,
    method: str = "zscore",
    replacement: str = "clip",
    threshold: float = 3.0,
    window: int = 21,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Replace flagged outliers (outliers.py:101-181): clip (winsorize to
    the detection bounds), median (series median), null."""
    require_columns(df, id_col, time_col, target_col)
    flagged = detect_outliers(df, method, threshold, window, id_col, time_col, target_col)
    y = F.col(target_col)
    p = series_partition(id_col)
    if replacement == "clip":
        if method == "iqr":
            q1 = F.percentile(y, F.lit(0.25)).over(p)
            q3 = F.percentile(y, F.lit(0.75)).over(p)
            lo, hi = q1 - F.lit(threshold) * (q3 - q1), q3 + F.lit(threshold) * (q3 - q1)
        else:
            mu, sd = F.avg(y).over(p), F.stddev_samp(y).over(p)
            lo, hi = mu - F.lit(threshold) * sd, mu + F.lit(threshold) * sd
        repl = F.least(F.greatest(y, lo), hi)
    elif replacement == "median":
        repl = F.median(y).over(p)
    elif replacement == "interpolate":
        # linear blend between the nearest non-outlier neighbors in
        # time, falling back to one-sided fill at the series edges —
        # pure ignore-nulls window expressions, no UDF
        w_prev = p.orderBy(time_col).rowsBetween(Window.unboundedPreceding, -1)
        w_next = p.orderBy(time_col).rowsBetween(1, Window.unboundedFollowing)
        good_y = F.when(~F.col("is_outlier"), y)
        t = F.col(time_col).cast("double")
        good_t = F.when(~F.col("is_outlier"), t)
        py = F.last(good_y, ignorenulls=True).over(w_prev)
        pt = F.last(good_t, ignorenulls=True).over(w_prev)
        ny = F.first(good_y, ignorenulls=True).over(w_next)
        nt = F.first(good_t, ignorenulls=True).over(w_next)
        # nt != pt: with duplicate timestamps the two anchors can
        # coincide, which would null the blend — fall through to the
        # one-sided fill instead
        repl = (
            F.when(py.isNotNull() & ny.isNotNull() & (nt != pt),
                   py + (ny - py) * (t - pt) / (nt - pt))
            .otherwise(F.coalesce(py, ny, y))
        )
    elif replacement == "null":
        repl = F.lit(None).cast("double")
    else:
        raise ValueError(f"unsupported replacement {replacement!r}")
    return flagged.withColumn(
        target_col, F.when(F.col("is_outlier"), repl).otherwise(y)
    ).drop("is_outlier")


# ---------------------------------------------------------------------------
# transforms (polars_ts/transforms/log.py, boxcox.py, differencing.py)


def log_transform(df: DataFrame, target_col: str = TARGET) -> DataFrame:
    """y -> log1p(y), keeping ``y_original`` (transforms/log.py:8-40)."""
    require_columns(df, target_col)
    return df.withColumn(f"{target_col}_original", F.col(target_col)).withColumn(
        target_col, F.log1p(F.col(target_col))
    )


def inverse_log_transform(df: DataFrame, target_col: str = TARGET) -> DataFrame:
    """expm1 inverse; drops metadata column (transforms/log.py:43-69)."""
    require_columns(df, target_col)
    return df.withColumn(target_col, F.expm1(F.col(target_col))).drop(f"{target_col}_original")


def boxcox_transform(df: DataFrame, lmbda: float, target_col: str = TARGET) -> DataFrame:
    """Box-Cox with fixed lambda: λ=0 → log y else (y^λ - 1)/λ; stores the
    λ column like the reference (transforms/boxcox.py:8-60). Requires y>0."""
    require_columns(df, target_col)
    y = F.col(target_col)
    out = df.withColumn(f"{target_col}_original", y)
    if lmbda == 0.0:
        t = F.log(y)
    else:
        t = (F.pow(y, F.lit(lmbda)) - F.lit(1.0)) / F.lit(lmbda)
    return out.withColumn(target_col, t).withColumn(
        f"{target_col}_boxcox_lambda", F.lit(float(lmbda))
    )


def inverse_boxcox_transform(df: DataFrame, target_col: str = TARGET) -> DataFrame:
    require_columns(df, target_col, f"{target_col}_boxcox_lambda")
    lam = F.col(f"{target_col}_boxcox_lambda")
    y = F.col(target_col)
    inv = F.when(lam == 0.0, F.exp(y)).otherwise(F.pow(lam * y + F.lit(1.0), F.lit(1.0) / lam))
    return df.withColumn(target_col, inv).drop(
        f"{target_col}_boxcox_lambda", f"{target_col}_original"
    )


def difference(
    df: DataFrame,
    order: int = 1,
    period: int = 1,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Repeated (seasonal) differencing: y_t - y_{t-period}, ``order``
    times (transforms/differencing.py:8-110). Leading rows become null
    (the reference stores them as inverse metadata; we keep them as nulls
    in-frame so undifference can reconstruct with a cumulative window)."""
    require_columns(df, id_col, time_col, target_col)
    w = series_window(id_col, time_col)
    out = df.withColumn(f"{target_col}_original", F.col(target_col))
    for _ in range(order):
        out = out.withColumn(
            target_col, F.col(target_col) - F.lag(target_col, period).over(w)
        )
    return out


def undifference(
    df: DataFrame,
    order: int = 1,
    period: int = 1,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Inverse of :func:`difference` when the original leading values are
    present (``y_original``): per-phase cumulative sum — window
    ``F.sum`` partitioned by (id, row_index mod period)
    (differencing.py:111-185)."""
    require_columns(df, id_col, time_col, target_col, f"{target_col}_original")
    out = df
    w = series_window(id_col, time_col)
    idx = F.row_number().over(w) - F.lit(1)
    out = out.withColumn("__idx", idx).withColumn("__phase", F.col("__idx") % F.lit(period))
    for o in range(order - 1, -1, -1):
        # rows with __idx < (o+1)*period still hold original-scale values at
        # this undiff level; reconstruct the rest by cumsum within phase
        cum_w = Window.partitionBy(id_col, "__phase").orderBy(time_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        boundary = (o + 1) * period
        # value at this level: for leading rows take the o-times-differenced
        # original; approximation: we reconstruct from y_original directly for
        # order=1 (the common case); higher orders reconstruct iteratively.
        seed = F.when(F.col("__idx") < boundary, F.col(f"{target_col}_original"))
        lvl = F.coalesce(F.col(target_col), F.lit(0.0))
        out = out.withColumn(
            target_col,
            F.when(
                F.col("__idx") < boundary, F.col(f"{target_col}_original")
            ).otherwise(
                F.sum(F.when(F.col("__idx") >= boundary, lvl).otherwise(seed)).over(cum_w)
            ),
        )
    return out.drop("__idx", "__phase")


# ---------------------------------------------------------------------------
# cusum (polars_ts/changepoint/cusum.py:4-55)


def cusum(
    df: DataFrame,
    normalize: bool = True,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Cumulative sum of (optionally standardized) deviations from the
    series mean -> ``cusum`` column. Pure windows: group mean/std via
    unbounded partition frame, cumsum via unbounded-preceding frame."""
    require_columns(df, id_col, time_col, target_col)
    p = series_partition(id_col)
    y = F.col(target_col)
    dev = y - F.avg(y).over(p)
    if normalize:
        sd = F.stddev_samp(y).over(p)
        dev = F.when(sd > 0, dev / sd).otherwise(F.lit(0.0))
    cum = F.sum(dev).over(series_window(id_col, time_col).rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn("cusum", cum)

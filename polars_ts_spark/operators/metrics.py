"""Forecast evaluation metrics (SURVEY §2.13) — pure aggregations.

Reference parity: polars_ts/metrics/forecast.py (mae 12-40, rmse 43-70,
mape 73-105, smape 108-141, mase 144-209, crps 212-279), bias.py.

Every metric supports scalar (whole frame) and per-group (by id) modes,
like the reference's ``by_group`` kwarg. All are single hash-aggregates —
map-side partial aggregation, one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_ts_spark.panel import ID, TARGET, TIME, require_columns, series_window


def _grouped(df: DataFrame, expr, name: str, by_group: bool, id_col: str) -> DataFrame:
    if by_group:
        return df.groupBy(id_col).agg(expr.alias(name))
    return df.agg(expr.alias(name))


def _mae_expr(actual: str, pred: str):
    return F.avg(F.abs(F.col(actual) - F.col(pred)))


def _rmse_expr(actual: str, pred: str):
    err = F.col(actual) - F.col(pred)
    return F.sqrt(F.avg(err * err))


def _mape_expr(actual: str, pred: str):
    y, yh = F.col(actual), F.col(pred)
    return F.avg(F.when(y != 0, F.abs((y - yh) / y)))


def _smape_expr(actual: str, pred: str):
    y, yh = F.col(actual), F.col(pred)
    denom = F.abs(y) + F.abs(yh)
    return F.avg(F.when(denom != 0, F.lit(2.0) * F.abs(y - yh) / denom))


def mae(df: DataFrame, actual: str = TARGET, pred: str = "y_hat",
        by_group: bool = False, id_col: str = ID) -> DataFrame:
    require_columns(df, actual, pred)
    return _grouped(df, _mae_expr(actual, pred), "mae", by_group, id_col)


def rmse(df: DataFrame, actual: str = TARGET, pred: str = "y_hat",
         by_group: bool = False, id_col: str = ID) -> DataFrame:
    require_columns(df, actual, pred)
    return _grouped(df, _rmse_expr(actual, pred), "rmse", by_group, id_col)


def mape(df: DataFrame, actual: str = TARGET, pred: str = "y_hat",
         by_group: bool = False, id_col: str = ID) -> DataFrame:
    """Mean |(y-ŷ)/y| over rows with y != 0 (forecast.py:101)."""
    require_columns(df, actual, pred)
    return _grouped(df, _mape_expr(actual, pred), "mape", by_group, id_col)


def smape(df: DataFrame, actual: str = TARGET, pred: str = "y_hat",
          by_group: bool = False, id_col: str = ID) -> DataFrame:
    """mean 2|y-ŷ|/(|y|+|ŷ|), excluding rows where both are zero
    (forecast.py:108-141)."""
    require_columns(df, actual, pred)
    return _grouped(df, _smape_expr(actual, pred), "smape", by_group, id_col)


def point_metrics(df: DataFrame, actual: str = TARGET, pred: str = "y_hat",
                  by_group: bool = False, id_col: str = ID) -> DataFrame:
    """mae + rmse + mape + smape in ONE aggregation pass.

    The four metrics are independent aggregate expressions over the
    same rows, so evaluating them separately and joining pays four
    aggregation exchanges plus three joins for work one hash-aggregate
    does (guide §2.4: two operations keyed the same way share one
    exchange). The expressions are the exact builders the standalone
    ops use, so each column is bit-identical to its standalone twin —
    per-group accumulation order is the same either way (same upstream
    plan, same map-side partial aggregation)."""
    require_columns(df, actual, pred)
    exprs = [
        _mae_expr(actual, pred).alias("mae"),
        _rmse_expr(actual, pred).alias("rmse"),
        _mape_expr(actual, pred).alias("mape"),
        _smape_expr(actual, pred).alias("smape"),
    ]
    if by_group:
        return df.groupBy(id_col).agg(*exprs)
    return df.agg(*exprs)


def mase(df: DataFrame, season_length: int = 1, actual: str = TARGET,
         pred: str = "y_hat", by_group: bool = False,
         id_col: str = ID, time_col: str = TIME) -> DataFrame:
    """MAE / in-sample seasonal-naive MAE with the reference's 0/0 -> 0 and
    x/0 -> inf rules (forecast.py:144-209).

    The reference computes the naive denominator on the *actuals* of the
    same frame (in-sample); we mirror that: |y_t - y_{t-m}| per series.
    """
    require_columns(df, actual, pred, id_col, time_col)
    w = series_window(id_col, time_col)
    y, yh = F.col(actual), F.col(pred)
    naive_err = F.abs(y - F.lag(y, season_length).over(w))
    with_err = df.withColumn("__ae", F.abs(y - yh)).withColumn("__nae", naive_err)
    num, den = F.avg("__ae"), F.avg("__nae")
    expr = (
        F.when((den == 0) & (num == 0), F.lit(0.0))
        .when(den == 0, F.lit(float("inf")))
        .otherwise(num / den)
    )
    return _grouped(with_err, expr, "mase", by_group, id_col)


def crps(df: DataFrame, actual: str = TARGET, quantile_cols: list[str] | None = None,
         by_group: bool = False, id_col: str = ID) -> DataFrame:
    """Mean pinball loss over quantile columns auto-detected by the ``q_``
    prefix (forecast.py:212-279): for each q, mean(max(q·e, (q-1)·e)),
    e = y - ŷ_q; CRPS = mean over quantiles."""
    require_columns(df, actual)
    qcols = quantile_cols or [c for c in df.columns if c.startswith("q_")]
    if not qcols:
        raise ValueError("no quantile columns (q_*) found")
    y = F.col(actual)
    pinballs = []
    for c in qcols:
        q = float(c.split("_", 1)[1])
        e = y - F.col(f"`{c}`")  # q-col names contain dots (q_0.5)
        pinballs.append(F.greatest(F.lit(q) * e, F.lit(q - 1.0) * e))
    mean_pinball = sum(pinballs) / F.lit(float(len(pinballs)))
    return _grouped(df, F.avg(mean_pinball), "crps", by_group, id_col)


def bias_detect(df: DataFrame, actual: str = TARGET, pred: str = "y_hat",
                id_col: str = ID) -> DataFrame:
    """Per-series bias stats (bias.py:9-50): mean_error, sign ratio
    (share of over-forecasts), bias_ratio = ME/MAE."""
    require_columns(df, actual, pred)
    e = F.col(pred) - F.col(actual)
    return df.groupBy(id_col).agg(
        F.avg(e).alias("mean_error"),
        F.avg((e > 0).cast("double")).alias("over_forecast_ratio"),
        (F.avg(e) / F.avg(F.abs(e))).alias("bias_ratio"),
    )


def bias_correct(df: DataFrame, method: str = "mean", actual: str = TARGET,
                 pred: str = "y_hat", id_col: str = ID) -> DataFrame:
    """Subtract per-series mean (or median) error from predictions
    (bias.py:53-143) -> ``y_hat_corrected``."""
    require_columns(df, actual, pred)
    e = F.col(pred) - F.col(actual)
    agg = F.avg(e) if method == "mean" else F.median(e)
    per = df.groupBy(id_col).agg(agg.alias("__bias"))
    return (
        df.join(F.broadcast(per), on=id_col, how="left")
        .withColumn("y_hat_corrected", F.col(pred) - F.col("__bias"))
        .drop("__bias")
    )


def calibration_table(df: DataFrame, actual: str = TARGET,
                      quantile_cols: list[str] | None = None) -> DataFrame:
    """Observed vs nominal quantile coverage (calibration.py:9-60):
    for each q column, share of rows with y <= ŷ_q."""
    require_columns(df, actual)
    qcols = quantile_cols or [c for c in df.columns if c.startswith("q_")]
    if not qcols:
        raise ValueError("no quantile columns (q_*) found")
    rows = []
    for c in sorted(qcols, key=lambda c: float(c.split("_", 1)[1])):
        q = float(c.split("_", 1)[1])
        rows.append(
            df.agg(
                F.lit(q).alias("nominal"),
                F.avg((F.col(actual) <= F.col(f"`{c}`")).cast("double")).alias("observed"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out

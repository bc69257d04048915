"""``pts`` DataFrame namespace façade (SURVEY §2.19d): the reference
registers a Polars namespace (``df.pts.mae(...)``,
polars_ts/metrics/__init__.py:34-36); ours wraps a Spark DataFrame in
an accessor object exposing the operator surface fluently.

Usage::

    from polars_ts_spark.namespace import pts
    pts(panel).lag_features([1, 7]).rolling_features([7]).df
    pts(panel).mae()          # metrics pass through directly
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from polars_ts_spark.operators import (
    baselines,
    decomposition,
    features,
    metrics,
    preprocessing,
)


class PtsAccessor:
    """Chainable accessor: transformation methods return a new
    accessor; terminal methods (metrics/forecasts) return DataFrames."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- chainable transforms

    def _chain(self, fn, *a, **kw) -> "PtsAccessor":
        return PtsAccessor(fn(self.df, *a, **kw))

    def lag_features(self, lags, **kw):
        return self._chain(features.lag_features, lags, **kw)

    def rolling_features(self, windows, aggs=("mean",), **kw):
        return self._chain(features.rolling_features, windows, aggs, **kw)

    def calendar_features(self, *a, **kw):
        return self._chain(features.calendar_features, *a, **kw)

    def fourier_features(self, *a, **kw):
        return self._chain(features.fourier_features, *a, **kw)

    def resample(self, rule, agg="mean", **kw):
        return self._chain(preprocessing.resample, rule, agg, **kw)

    def impute(self, method="forward_fill", **kw):
        return self._chain(preprocessing.impute, method, **kw)

    def detect_outliers(self, method="zscore", **kw):
        return self._chain(preprocessing.detect_outliers, method, **kw)

    def treat_outliers(self, method="zscore", replacement="clip", **kw):
        return self._chain(preprocessing.treat_outliers, method, replacement, **kw)

    def log_transform(self, **kw):
        return self._chain(preprocessing.log_transform, **kw)

    def difference(self, order=1, period=1, **kw):
        return self._chain(preprocessing.difference, order, period, **kw)

    def cusum(self, **kw):
        return self._chain(preprocessing.cusum, **kw)

    def seasonal_decomposition(self, freq, **kw):
        return self._chain(decomposition.seasonal_decomposition, freq, **kw)

    # -- terminal ops (return plain DataFrames)

    def naive_forecast(self, h=7, **kw) -> DataFrame:
        return baselines.naive_forecast(self.df, h=h, **kw)

    def seasonal_naive_forecast(self, h=7, season_length=7, **kw) -> DataFrame:
        return baselines.seasonal_naive_forecast(self.df, h=h, season_length=season_length, **kw)

    def mae(self, **kw) -> DataFrame:
        return metrics.mae(self.df, **kw)

    def rmse(self, **kw) -> DataFrame:
        return metrics.rmse(self.df, **kw)

    def smape(self, **kw) -> DataFrame:
        return metrics.smape(self.df, **kw)

    def mase(self, season_length=1, **kw) -> DataFrame:
        return metrics.mase(self.df, season_length, **kw)

    def mape(self, **kw) -> DataFrame:
        return metrics.mape(self.df, **kw)

    def crps(self, **kw) -> DataFrame:
        return metrics.crps(self.df, **kw)


def pts(df: DataFrame) -> PtsAccessor:
    return PtsAccessor(df)

import math

from pyspark.sql import functions as F

from polars_ts_spark.operators.preprocessing import (
    boxcox_transform,
    cusum,
    detect_outliers,
    difference,
    impute,
    impute_seasonal,
    inverse_boxcox_transform,
    inverse_log_transform,
    log_transform,
    resample,
    treat_outliers,
    undifference,
)
from tests.conftest import make_panel


def series_vals(df, col="y", sid="A"):
    return [r[col] for r in df.filter(F.col("unique_id") == sid).orderBy("ds").collect()]


def test_impute_ffill_bfill(with_nulls):
    assert series_vals(impute(with_nulls, "forward_fill")) == [1.0, 1.0, 3.0, 3.0, 3.0, 6.0]
    # trailing null has no following non-null -> stays null (polars bfill parity)
    assert series_vals(impute(with_nulls, "backward_fill"), sid="B") == [2.0, 2.0, 3.0, 4.0, 5.0, None]


def test_impute_mean_median(with_nulls):
    got = series_vals(impute(with_nulls, "mean"))
    assert got[1] == (1.0 + 3.0 + 6.0) / 3


def test_impute_linear(with_nulls):
    got = series_vals(impute(with_nulls, "linear"))
    assert got == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    # edge nulls fall back to nearest non-null
    got_b = series_vals(impute(with_nulls, "linear"), sid="B")
    assert got_b == [2.0, 2.0, 3.0, 4.0, 5.0, 5.0]


def test_impute_seasonal(spark):
    df = make_panel(spark, {"A": [1.0, 10.0, None, 10.0, 1.0, None]})
    got = series_vals(impute_seasonal(df, period=2))
    assert got == [1.0, 10.0, 1.0, 10.0, 1.0, 10.0]


def test_detect_outliers_zscore(spark):
    df = make_panel(spark, {"A": [1, 1, 1, 1, 1, 1, 1, 100]})
    out = detect_outliers(df, "zscore", threshold=2.0)
    flags = series_vals(out, "is_outlier")
    assert flags == [False] * 7 + [True]


def test_detect_outliers_constant_series_no_nan(constant_series):
    out = detect_outliers(constant_series, "zscore")
    assert series_vals(out, "is_outlier") == [False] * 8


def test_detect_outliers_iqr(spark):
    df = make_panel(spark, {"A": [1, 2, 3, 4, 5, 6, 7, 1000]})
    out = detect_outliers(df, "iqr", threshold=1.5)
    assert series_vals(out, "is_outlier")[-1] is True


def test_treat_outliers_median(spark):
    df = make_panel(spark, {"A": [1, 1, 1, 1, 1, 1, 1, 100]})
    out = treat_outliers(df, "zscore", "median", threshold=2.0)
    assert series_vals(out)[-1] == 1.0
    assert "is_outlier" not in out.columns


def test_log_roundtrip(two_series):
    t = log_transform(two_series)
    assert abs(series_vals(t)[0] - math.log1p(1.0)) < 1e-12
    assert "y_original" in t.columns
    back = inverse_log_transform(t)
    assert [round(v, 9) for v in series_vals(back)] == [1.0, 2.0, 3.0, 4.0]
    assert "y_original" not in back.columns


def test_boxcox_roundtrip(two_series):
    t = boxcox_transform(two_series, lmbda=0.5)
    back = inverse_boxcox_transform(t)
    assert [round(v, 9) for v in series_vals(back)] == [1.0, 2.0, 3.0, 4.0]


def test_difference_and_undifference(spark):
    df = make_panel(spark, {"A": [1.0, 3.0, 6.0, 10.0, 15.0]})
    d = difference(df, order=1, period=1)
    assert series_vals(d) == [None, 2.0, 3.0, 4.0, 5.0]
    back = undifference(d, order=1, period=1)
    assert series_vals(back) == [1.0, 3.0, 6.0, 10.0, 15.0]


def test_seasonal_difference(spark):
    df = make_panel(spark, {"A": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})
    d = difference(df, order=1, period=2)
    assert series_vals(d) == [None, None, 2.0, 2.0, 2.0, 2.0]
    back = undifference(d, order=1, period=2)
    assert series_vals(back) == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]


def test_cusum_constant_is_zero(constant_series):
    out = cusum(constant_series)
    assert series_vals(out, "cusum") == [0.0] * 8


def test_cusum_unnormalized(spark):
    df = make_panel(spark, {"A": [1.0, 2.0, 3.0]})  # mean 2 -> devs -1,0,1
    out = cusum(df, normalize=False)
    assert series_vals(out, "cusum") == [-1.0, -1.0, 0.0]


def test_resample_weekly(spark):
    df = make_panel(spark, {"A": [float(i) for i in range(14)]})  # 2024-01-01 Mon .. 01-14 Sun
    out = resample(df, "1w", "sum")
    rows = series_vals(out)
    assert rows == [sum(range(7)), sum(range(7, 14))]


def test_resample_first_last(spark):
    df = make_panel(spark, {"A": [3.0, 1.0, 2.0, 5.0]})
    assert series_vals(resample(df, "1mo", "first")) == [3.0]
    assert series_vals(resample(df, "1mo", "last")) == [5.0]

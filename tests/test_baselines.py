import datetime as dt

from pyspark.sql import functions as F

from polars_ts_spark.operators.baselines import (
    moving_average_forecast,
    naive_forecast,
    seasonal_naive_forecast,
)
from tests.conftest import make_panel


def fc_rows(df, sid="A"):
    return [(r["ds"], r["y_hat"]) for r in df.filter(F.col("unique_id") == sid).orderBy("ds").collect()]


def test_naive_forecast(two_series):
    out = naive_forecast(two_series, h=3)
    rows = fc_rows(out)
    assert [v for _, v in rows] == [4.0, 4.0, 4.0]
    # future grid continues the daily frequency
    assert rows[0][0] == dt.datetime(2024, 1, 5)
    assert rows[2][0] == dt.datetime(2024, 1, 7)
    assert [v for _, v in fc_rows(out, "B")] == [5.0, 5.0, 5.0]


def test_naive_forecast_schema(two_series):
    out = naive_forecast(two_series, h=2)
    assert out.columns == ["unique_id", "ds", "y_hat"]


def test_seasonal_naive(spark):
    df = make_panel(spark, {"A": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})
    out = seasonal_naive_forecast(df, h=4, season_length=3)
    # last season = [4,5,6]; forecast cycles 4,5,6,4
    assert [v for _, v in fc_rows(out)] == [4.0, 5.0, 6.0, 4.0]


def test_moving_average(spark):
    df = make_panel(spark, {"A": [1.0, 2.0, 3.0, 4.0]})
    out = moving_average_forecast(df, h=2, window=2)
    assert [v for _, v in fc_rows(out)] == [3.5, 3.5]


def test_hourly_frequency_inferred(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [("A", t0 + dt.timedelta(hours=i), float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "unique_id string, ds timestamp, y double")
    out = naive_forecast(df, h=2)
    got = fc_rows(out)
    assert got[0][0] == t0 + dt.timedelta(hours=5)
    assert got[1][0] == t0 + dt.timedelta(hours=6)

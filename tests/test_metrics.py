import math

from pyspark.sql import functions as F

from polars_ts_spark.operators.metrics import (
    bias_correct,
    bias_detect,
    calibration_table,
    crps,
    mae,
    mape,
    mase,
    point_metrics,
    rmse,
    smape,
)
from tests.conftest import make_panel


def with_pred(df, preds):
    from pyspark.sql import Window
    w = Window.partitionBy("unique_id").orderBy("ds")
    idx = F.row_number().over(w) - 1
    arr = F.array(*[F.lit(p) for p in preds])
    return df.withColumn("y_hat", F.element_at(arr, idx + 1).cast("double"))


def test_mae_rmse(spark):
    df = with_pred(make_panel(spark, {"A": [1.0, 2.0, 3.0, 4.0]}), [2.0, 2.0, 2.0, 2.0])
    assert mae(df).first()["mae"] == 1.0  # |1-2|,|2-2|,|3-2|,|4-2| -> mean 1.0
    assert abs(rmse(df).first()["rmse"] - math.sqrt(6 / 4)) < 1e-12


def test_mape_excludes_zero(spark):
    df = with_pred(make_panel(spark, {"A": [0.0, 2.0, 4.0]}), [1.0, 1.0, 2.0])
    # zero actual excluded: mean(|2-1|/2, |4-2|/4) = mean(0.5, 0.5)
    assert mape(df).first()["mape"] == 0.5


def test_smape(spark):
    df = with_pred(make_panel(spark, {"A": [0.0, 2.0]}), [0.0, 4.0])
    # both-zero row excluded; 2|2-4|/(2+4) = 2/3
    assert abs(smape(df).first()["smape"] - 2.0 / 3.0) < 1e-12


def test_point_metrics_matches_standalone_ops(spark):
    """point_metrics (r12: the forecast_metrics fusion) must equal the
    four standalone ops column-for-column, in scalar AND per-group
    mode, and its per-group plan must be a single aggregation — no
    joins (the shape the fusion exists to remove)."""
    df = with_pred(
        make_panel(spark, {"A": [0.0, 2.0, 4.0, 1.0], "B": [1.0, 5.0, 0.0, 0.0]}),
        [1.0, 1.0, 2.0, 0.5],
    )
    fused = point_metrics(df).first()
    assert fused["mae"] == mae(df).first()["mae"]
    assert fused["rmse"] == rmse(df).first()["rmse"]
    assert fused["mape"] == mape(df).first()["mape"]
    assert fused["smape"] == smape(df).first()["smape"]

    by = {r["unique_id"]: r for r in point_metrics(df, by_group=True).collect()}
    for name, op in (("mae", mae), ("rmse", rmse), ("mape", mape), ("smape", smape)):
        for r in op(df, by_group=True).collect():
            got, want = by[r["unique_id"]][name], r[name]
            assert got == want or (got is None and want is None)

    plan = point_metrics(df, by_group=True)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_mase_perfect_zero_and_rules(spark):
    df = with_pred(make_panel(spark, {"A": [1.0, 2.0, 3.0, 4.0]}), [1.0, 2.0, 3.0, 4.0])
    assert mase(df).first()["mase"] == 0.0
    # constant actuals (naive err 0) + imperfect preds -> inf
    df2 = with_pred(make_panel(spark, {"A": [5.0, 5.0, 5.0]}), [4.0, 4.0, 4.0])
    assert math.isinf(mase(df2).first()["mase"])
    # constant + perfect -> 0/0 -> 0
    df3 = with_pred(make_panel(spark, {"A": [5.0, 5.0, 5.0]}), [5.0, 5.0, 5.0])
    assert mase(df3).first()["mase"] == 0.0


def test_mase_value(spark):
    df = with_pred(make_panel(spark, {"A": [1.0, 2.0, 3.0, 4.0]}), [2.0, 3.0, 4.0, 5.0])
    # mae=1; naive mae = mean(|2-1|,|3-2|,|4-3|)=1
    assert mase(df).first()["mase"] == 1.0


def test_crps_pinball(spark):
    df = make_panel(spark, {"A": [2.0]})
    df = df.withColumn("q_0.5", F.lit(1.0))
    out = crps(df).first()["crps"]
    # pinball at q=.5, e=1: max(.5, -.5)= .5
    assert out == 0.5


def test_bias(spark):
    df = with_pred(make_panel(spark, {"A": [1.0, 2.0, 3.0]}), [2.0, 3.0, 4.0])
    b = bias_detect(df).first()
    assert b["mean_error"] == 1.0 and b["over_forecast_ratio"] == 1.0 and b["bias_ratio"] == 1.0
    corrected = bias_correct(df)
    vals = [r["y_hat_corrected"] for r in corrected.orderBy("ds").collect()]
    assert vals == [1.0, 2.0, 3.0]


def test_calibration_table(spark):
    df = make_panel(spark, {"A": [1.0, 2.0, 3.0, 4.0]})
    df = df.withColumn("q_0.5", F.lit(2.5))
    rows = calibration_table(df).collect()
    assert rows[0]["nominal"] == 0.5 and rows[0]["observed"] == 0.5


def test_grouped_hierarchy_summing_matrix_and_bottom_up(spark):
    # grouped/cross-sectional: each bottom rolls up into TWO non-nested
    # dimensions; every aggregate must equal the sum of its bottoms and
    # 'total' must count each bottom exactly once (no double-count via
    # the two paths)
    import datetime as dt

    import numpy as np

    from polars_ts_spark.operators import evaluation

    hierarchy = {
        "a": ["g1", "h1"], "b": ["g1", "h2"], "c": ["g2", "h1"],
        "g1": "total", "g2": "total", "h1": "total", "h2": "total",
    }
    S, nodes, bottoms = evaluation._summing_matrix(hierarchy)
    assert bottoms == ["a", "b", "c"]
    tot = S[nodes.index("total")]
    assert list(tot) == [1.0, 1.0, 1.0]
    assert list(S[nodes.index("g1")]) == [1.0, 1.0, 0.0]
    assert list(S[nodes.index("h1")]) == [1.0, 0.0, 1.0]
    # bottom_up over the same grouped hierarchy
    t0 = dt.datetime(2024, 1, 1)
    fc = spark.createDataFrame(
        [("a", t0, 1.0), ("b", t0, 2.0), ("c", t0, 4.0)],
        "unique_id string, ds timestamp, y_hat double")
    out = {r["unique_id"]: r["y_hat"]
           for r in evaluation.reconcile_bottom_up(fc, hierarchy).collect()}
    assert out["g1"] == 3.0 and out["g2"] == 4.0
    assert out["h1"] == 5.0 and out["h2"] == 2.0
    assert out["total"] == 7.0  # once per bottom, not once per path
    # MinT projection over grouped S is idempotent on coherent vectors
    P, pnodes = evaluation.mint_projection(hierarchy)
    y = S @ np.array([1.0, 2.0, 4.0])
    coherent = {n: y[i] for i, n in enumerate(nodes)}
    yp = P @ np.array([coherent[n] for n in pnodes])
    assert np.allclose(yp, [coherent[n] for n in pnodes])

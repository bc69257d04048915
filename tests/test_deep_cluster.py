"""DEC/IDEC/contrastive clustering (torch-free paths) and the CNN
classifier guards."""

import numpy as np
import pandas as pd
import pytest

from polars_ts_spark.operators import deep_cluster as dc


def _two_group_panel(spark, n_per=6, length=48):
    rng = np.random.default_rng(9)
    ts = pd.date_range("2024-01-01", periods=length, freq="D")
    frames = []
    for g, freq in (("a", 4.0), ("b", 16.0)):
        for i in range(n_per):
            y = np.sin(2 * np.pi * np.arange(length) / freq) + 0.05 * rng.normal(0, 1, length)
            frames.append(pd.DataFrame({"unique_id": f"{g}{i}", "ds": ts, "y": y}))
    return spark.createDataFrame(pd.concat(frames))


def test_dec_separates_frequencies(spark):
    df = _two_group_panel(spark)
    out = dc.DECClusterer(n_clusters=2, embedding_dim=8).fit_predict(df).toPandas()
    lab = dict(zip(out["unique_id"], out["cluster"]))
    a = {lab[f"a{i}"] for i in range(6)}
    b = {lab[f"b{i}"] for i in range(6)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_idec_matches_surface(spark):
    df = _two_group_panel(spark, n_per=3)
    out = dc.IDECClusterer(n_clusters=2, embedding_dim=8).fit_predict(df).toPandas()
    assert set(out.columns) == {"unique_id", "cluster"} and len(out) == 6


def test_dec_soft_assignment_properties():
    Z = np.array([[0.0, 0.0], [10.0, 0.0], [0.1, 0.0]])
    C = np.array([[0.0, 0.0], [10.0, 0.0]])
    q = dc.DECClusterer._soft_assign(Z, C)
    assert np.allclose(q.sum(axis=1), 1.0)
    assert q[0, 0] > q[0, 1] and q[1, 1] > q[1, 0] and q[2, 0] > q[2, 1]
    p = dc.DECClusterer._target(q)
    assert np.allclose(p.sum(axis=1), 1.0)
    # sharpening: confident rows get MORE confident
    assert p[1, 1] >= q[1, 1] - 1e-12


def test_contrastive_hook_and_guard(spark):
    df = _two_group_panel(spark, n_per=3)
    out = dc.ContrastiveClusterer(
        n_clusters=2, encode_hook=lambda X: dc.svd_encode(X, 4)
    ).fit_predict(df).toPandas()
    assert len(out) == 6
    try:
        import torch  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="torch"):
            dc.ContrastiveClusterer(n_clusters=2).fit(df)
    else:  # pragma: no cover - torch absent in this container
        # planted two-group panel: the NT-Xent-trained CNN embedding
        # must separate the groups (labels agree within each group)
        out2 = (dc.ContrastiveClusterer(n_clusters=2, max_epochs=10)
                .fit_predict(df).toPandas().set_index("unique_id")["cluster"])
        g1 = {out2[f"a{i}"] for i in range(3)}
        g2 = {out2[f"b{i}"] for i in range(3)}
        assert len(g1) == 1 and len(g2) == 1 and g1 != g2


def test_cnn_classifiers_guarded(spark):
    df = _two_group_panel(spark, n_per=2)
    try:
        import torch  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="torch"):
            dc.InceptionTimeClassifier().fit(df)
        with pytest.raises(ImportError, match="torch"):
            dc.ResNetClassifier().fit(df)
    with pytest.raises(RuntimeError, match="fit"):
        dc.ResNetClassifier().predict(df)

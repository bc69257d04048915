"""Property-based tests (hypothesis): algebraic invariants the distance
kernels, transforms, and metrics must satisfy on ARBITRARY inputs —
the layer that catches what example-based tests and replay oracles
structurally cannot (both compare two implementations; these check the
mathematics itself). No Spark session needed — everything here is the
numpy/C kernel layer, so the suite stays fast."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from polars_ts_spark.functions import dist_kernels as K

_vals = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  allow_infinity=False, width=64)


def _series(min_len=2, max_len=40):
    return arrays(np.float64, st.integers(min_len, max_len), elements=_vals)


_METRICS = [
    ("dtw", lambda A, B: K.dtw_batch(A, B)),
    ("msm", lambda A, B: K.msm_batch(A, B, 1.0)),
    ("erp", lambda A, B: K.erp_batch(A, B, 0.0)),
    ("twe", lambda A, B: K.twe_batch(A, B, 0.001, 1.0)),
    ("lcss", lambda A, B: K.lcss_batch(A, B, 1.0)),
    ("edr", lambda A, B: K.edr_batch(A, B, 0.1)),
    ("wdtw", lambda A, B: K.wdtw_batch(A, B, 0.05)),
    ("frechet", lambda A, B: K.frechet_batch(A, B)),
]


@pytest.mark.parametrize("name,fn", _METRICS)
@settings(max_examples=30, deadline=None)
@given(a=_series(), b=_series())
def test_distance_symmetry(name, fn, a, b):
    """d(a, b) == d(b, a) for every symmetric-cost metric."""
    d_ab = fn(a[None, :], b[None, :])[0]
    d_ba = fn(b[None, :], a[None, :])[0]
    assert d_ab == pytest.approx(d_ba, rel=1e-9, abs=1e-9)


@pytest.mark.parametrize("name,fn", _METRICS)
@settings(max_examples=30, deadline=None)
@given(a=_series())
def test_distance_identity(name, fn, a):
    """d(a, a) == 0 (LCSS/EDR are normalized dissimilarities; EDR's
    self-distance is 0 because every aligned pair matches)."""
    d = fn(a[None, :], a[None, :])[0]
    assert d == pytest.approx(0.0, abs=1e-9)


@pytest.mark.parametrize("name,fn", _METRICS)
@settings(max_examples=30, deadline=None)
@given(a=_series(), b=_series())
def test_distance_nonnegative(name, fn, a, b):
    assert fn(a[None, :], b[None, :])[0] >= -1e-12


@settings(max_examples=30, deadline=None)
@given(a=_series(min_len=4), b=_series(min_len=4))
def test_dtw_lower_bounds_banded_variants(a, b):
    """Band constraints only REMOVE warping paths, so banded DTW >=
    unconstrained DTW; an all-covering band equals it."""
    A, B = a[None, :], b[None, :]
    full = K.dtw_batch(A, B)[0]
    assert K.dtw_sakoe_chiba_batch(A, B, window=3)[0] >= full - 1e-9
    wide = K.dtw_sakoe_chiba_batch(A, B, window=len(a) + len(b))[0]
    assert wide == pytest.approx(full, rel=1e-12, abs=1e-9)


@settings(max_examples=30, deadline=None)
@given(a=_series(min_len=3), shift=st.floats(-1e5, 1e5, allow_nan=False))
def test_dtw_translation_invariance_of_pairs(a, shift):
    """DTW of (a, a+c) against (a+k, a+c+k): |.| costs depend only on
    differences, so a common translation leaves the distance fixed."""
    b = a + 7.0
    A1, B1 = a[None, :], b[None, :]
    A2, B2 = (a + shift)[None, :], (b + shift)[None, :]
    assert K.dtw_batch(A1, B1)[0] == pytest.approx(K.dtw_batch(A2, B2)[0],
                                                   rel=1e-9, abs=1e-6)


@settings(max_examples=30, deadline=None)
@given(a=_series(min_len=5, max_len=40))
def test_lcss_bounds(a):
    """LCSS dissimilarity lives in [0, 1]."""
    b = a[::-1].copy()
    d = K.lcss_batch(a[None, :], b[None, :], 1.0)[0]
    assert -1e-12 <= d <= 1.0 + 1e-12


@settings(max_examples=20, deadline=None)
@given(a=_series(min_len=8, max_len=60))
def test_sbd_scale_invariance(a):
    """SBD normalizes by the norms, so positive scaling of either side
    leaves it unchanged."""
    b = np.roll(a, 2)
    if np.linalg.norm(a) == 0 or np.linalg.norm(b) == 0:
        return
    d1 = K.sbd_batch(a[None, :], b[None, :])[0]
    d2 = K.sbd_batch((3.0 * a)[None, :], b[None, :])[0]
    assert d1 == pytest.approx(d2, rel=1e-7, abs=1e-9)


@settings(max_examples=30, deadline=None)
@given(y=arrays(np.float64, st.integers(10, 60), elements=_vals))
def test_garch_nll_grid_fit_stationary(y):
    """The deterministic GARCH grid fit always lands inside the
    stationarity region with a finite likelihood."""
    from polars_ts_spark.operators.volatility import _seq_sum, _garch11_grid_fit

    n = len(y)
    mu = _seq_sum(y) / n
    r = y - mu
    mu2 = _seq_sum(r) / n
    var = _seq_sum((r - mu2) * (r - mu2)) / n or 1e-8
    a, b, nll, s2l = _garch11_grid_fit(r, var)
    assert 0.0 <= a and 0.0 <= b and a + b <= 0.97 + 1e-12
    assert np.isfinite(nll) and s2l > 0


@settings(max_examples=30, deadline=None)
@given(y=arrays(np.float64, st.integers(3, 50),
                elements=st.floats(0.0, 1e6, allow_nan=False)))
def test_hash_permutation_is_permutation(y):
    """md5-rank shuffles are true permutations for any length."""
    from polars_ts_spark.operators.evaluation import _hash_permutation

    n = len(y)
    p = _hash_permutation(42, "t", n)
    assert sorted(p.tolist()) == list(range(n))


@settings(max_examples=20, deadline=None)
@given(n=st.integers(1, 300))
def test_hash_normals_deterministic_and_sane(n):
    from polars_ts_spark.functions.numutils import hash_normals

    z1 = hash_normals(7, "tag", n)
    z2 = hash_normals(7, "tag", n)
    assert np.array_equal(z1, z2)
    assert np.all(np.isfinite(z1))
    if n >= 200:
        assert abs(float(z1.mean())) < 0.5  # loose CLT sanity


@settings(max_examples=50, deadline=None)
@given(
    q=arrays(np.int64, st.tuples(st.integers(1, 8), st.integers(1, 64)),
             elements=st.integers(-(4 << 20), 4 << 20)),
    ncell=st.integers(1, 16),
)
def test_ivf_grid_scores_float64_gemm_is_exact(q, ncell):
    """The IVF determinism claim: with vectors AND centroids on the
    2^-20 integer grid (|x| < 4 → |int| ≤ 2^22), the assignment score
    |cq|² − 2⟨q,cq⟩ computed by float64 GEMM equals arbitrary-precision
    integer arithmetic EXACTLY — order-independence is then structural,
    not empirical."""
    rng = np.random.default_rng(q.sum() % (2**32))
    cq = rng.integers(-(4 << 20), 4 << 20, size=(ncell, q.shape[1]), dtype=np.int64)
    CQ = cq.astype(np.float64)
    A = (CQ * CQ).sum(axis=1)[None, :] - 2.0 * (q.astype(np.float64) @ CQ.T)
    for i in range(q.shape[0]):
        for j in range(ncell):
            exact = sum(int(c) * int(c) for c in cq[j]) \
                - 2 * sum(int(a) * int(b) for a, b in zip(q[i], cq[j]))
            assert A[i, j] == exact

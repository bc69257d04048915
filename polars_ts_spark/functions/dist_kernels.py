"""Numpy kernels for the pairwise time-series distance family
(SURVEY §2.8; reference src/{dtw,ddtw,wdtw,msm,erp,lcss,twe,sbd,frechet,
edr,dtw_multi,msm_multi}.rs).

Design: one generic BATCHED ANTI-DIAGONAL dynamic-programming engine.
Every metric here is a grid DP whose cell (i,j) depends on (i-1,j),
(i,j-1), (i-1,j-1) — cells on an anti-diagonal are mutually independent,
AND independent across pairs. So we stack k same-shape pairs into
(k, n)/(k, m) arrays and sweep diagonals once for the whole stack:
O(n+m) numpy ops amortized over k pairs instead of O(k·n·m) Python-loop
iterations. This is how a vectorized executor stands in for the
reference's Rust cores: the Spark cross-join feeds pair batches, the
batch axis is the SIMD axis. Memory is three (k, n+m) diagonal buffers.

The semantics (cost recurrences, parameter defaults, edge cases) mirror
the reference exactly; the execution strategy is ours.
"""

from __future__ import annotations

import numpy as np

INF = np.inf


def _dp_diag_batch(row0: np.ndarray, col0: np.ndarray, step, dtype=float) -> np.ndarray:
    """Generic batched anti-diagonal DP.

    row0 = D[:, 0, :] (k, C) precomputed top boundary; col0 (k, R) left
    boundary (row0[:,0] must equal col0[:,0]); step(i_arr, j_arr, diag,
    up, left) -> (k, len(i_arr)) interior cells. Returns D[:, R-1, C-1].

    Perf: the three diagonal buffers are allocated ONCE and cycled
    (every cell a later diagonal reads is provably written by the
    correct earlier diagonal, so no per-step INF re-fill is needed) —
    the naive version's per-diagonal np.full dominated its runtime.
    """
    k, C = row0.shape
    R = col0.shape[1]
    if R == 1:
        return row0[:, -1].copy()
    if C == 1:
        return col0[:, -1].copy()
    buf = [np.full((k, R), INF, dtype=dtype) for _ in range(3)]
    prev2, prev1 = buf[0], buf[1]
    prev2[:, 0] = row0[:, 0]
    prev1[:, 0] = row0[:, 1]
    prev1[:, 1] = col0[:, 1]
    if R + C - 2 == 1:
        return prev1[:, R - 1].copy()
    cur = buf[2]
    for d in range(2, R + C - 1):
        i_lo, i_hi = max(0, d - (C - 1)), min(R - 1, d)
        if i_lo == 0:
            cur[:, 0] = row0[:, d]
        if i_hi == d:
            cur[:, d] = col0[:, d]
        lo, hi = max(1, i_lo), min(i_hi, d - 1)
        if lo <= hi:
            i_arr = np.arange(lo, hi + 1)
            j_arr = d - i_arr
            out = step(
                i_arr, j_arr, prev2[:, lo - 1:hi], prev1[:, lo - 1:hi],
                prev1[:, lo:hi + 1], cur[:, lo:hi + 1]
            )
            if out is not None:  # non-fused kernels return the result
                cur[:, lo:hi + 1] = out
        prev2, prev1, cur = prev1, cur, prev2
    return prev1[:, R - 1].copy()


class _RevB:
    """Contiguous reversed copy of B so that the descending-j gather on
    every anti-diagonal becomes an ascending SLICE (a view, no copy):
    B[:, j_arr + off] == rev[:, m-1-d+lo-off : m-d+hi-off] for
    j_arr = d - arange(lo, hi+1)."""

    def __init__(self, B: np.ndarray):
        self.rev = np.ascontiguousarray(B[:, ::-1])
        self.m = B.shape[1]

    def diag_slice(self, d: int, lo: int, hi: int, off: int = 0) -> np.ndarray:
        start = self.m - 1 - d + lo - off
        return self.rev[:, start : start + (hi - lo + 1)]


def _min3(a, b, c):
    return np.minimum(np.minimum(a, b), c)


# ---------------------------------------------------------------------------
# batched kernels: A (k, n), B (k, m) -> (k,) distances


def dtw_batch(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Standard DTW, |a-b| local cost (dtw.rs:12-29). Routes to the
    bit-identical C fast path (functions/native.py) when a toolchain
    compiled it; this numpy engine is the always-available fallback."""
    from polars_ts_spark.functions import native

    nat = native.dtw_pairs(A, B)
    if nat is not None:
        return nat
    k, n = A.shape
    m = B.shape[1]
    row0 = np.full((k, m + 1), INF); row0[:, 0] = 0.0
    col0 = np.full((k, n + 1), INF); col0[:, 0] = 0.0
    RB = _RevB(B)
    scratch = np.empty((k, min(n, m)), dtype=float)

    def step(i, j, diag, up, left, out):
        lo, hi, d = int(i[0]), int(i[-1]), int(i[0] + j[0])
        w = hi - lo + 1
        t = scratch[:, :w]
        np.subtract(A[:, lo - 1:hi], RB.diag_slice(d, lo, hi, -1), out=t)
        np.abs(t, out=t)
        np.minimum(up, left, out=out)
        np.minimum(out, diag, out=out)
        np.add(out, t, out=out)

    return _dp_diag_batch(row0, col0, step)


def dtw_sakoe_chiba_batch(A: np.ndarray, B: np.ndarray, window: int = 10) -> np.ndarray:
    """Band |i-j| <= max(window, |n-m|) (dtw.rs:32-55). Routes to the
    bit-identical C fast path when built."""
    from polars_ts_spark.functions import native

    k, n = A.shape
    m = B.shape[1]
    w = max(window, abs(n - m))
    nat = native.dtw_band_pairs(A, B, w)
    if nat is not None:
        return nat
    row0 = np.full((k, m + 1), INF); row0[:, 0] = 0.0
    col0 = np.full((k, n + 1), INF); col0[:, 0] = 0.0

    RB = _RevB(B)

    def step(i, j, diag, up, left, out=None):
        lo, hi, d = int(i[0]), int(i[-1]), int(i[0] + j[0])
        cost = np.abs(A[:, lo - 1:hi] - RB.diag_slice(d, lo, hi, -1)) + _min3(up, left, diag)
        return np.where(np.abs(2 * i - d)[None, :] <= w, cost, INF)

    return _dp_diag_batch(row0, col0, step)


def dtw_itakura_batch(A: np.ndarray, B: np.ndarray, max_slope: float = 2.0) -> np.ndarray:
    """Itakura parallelogram constraint (dtw.rs:58-86). Routes to the
    bit-identical C fast path when built."""
    from polars_ts_spark.functions import native

    k, n = A.shape
    m = B.shape[1]
    s = float(max_slope)
    nat = native.dtw_itakura_pairs(A, B, s)
    if nat is not None:
        return nat
    row0 = np.full((k, m + 1), INF); row0[:, 0] = 0.0
    col0 = np.full((k, n + 1), INF); col0[:, 0] = 0.0

    RB = _RevB(B)

    def step(i, j, diag, up, left, out=None):
        lo, hi, d = int(i[0]), int(i[-1]), int(i[0] + j[0])
        ok = (j <= s * i) & (i <= s * j) & ((n - i) <= s * (m - j) + s) & ((m - j) <= s * (n - i) + s)
        cost = np.abs(A[:, lo - 1:hi] - RB.diag_slice(d, lo, hi, -1)) + _min3(up, left, diag)
        return np.where(ok[None, :], cost, INF)

    return _dp_diag_batch(row0, col0, step)


def ddtw_batch(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Keogh-Pazzani derivative then DTW; < 3 points -> inf (ddtw.rs:7-56)."""
    if A.shape[1] < 3 or B.shape[1] < 3:
        return np.full(A.shape[0], INF)
    dA = ((A[:, 1:-1] - A[:, :-2]) + (A[:, 2:] - A[:, :-2]) / 2.0) / 2.0
    dB = ((B[:, 1:-1] - B[:, :-2]) + (B[:, 2:] - B[:, :-2]) / 2.0) / 2.0
    return dtw_batch(dA, dB)


def wdtw_batch(A: np.ndarray, B: np.ndarray, g: float = 0.05) -> np.ndarray:
    """Squared diff × logistic weight 1/(1+exp(-g(|i-j| - max_len/2)))
    (wdtw.rs:7-41)."""
    from polars_ts_spark.functions import native

    k, n = A.shape
    m = B.shape[1]
    max_len = max(n, m)
    weights = 1.0 / (1.0 + np.exp(-g * (np.arange(max_len) - max_len / 2.0)))
    nat = native.wdtw_pairs(A, B, weights)
    if nat is not None:
        return nat
    row0 = np.full((k, m + 1), INF); row0[:, 0] = 0.0
    col0 = np.full((k, n + 1), INF); col0[:, 0] = 0.0

    RB = _RevB(B)

    def step(i, j, diag, up, left, out=None):
        lo, hi, dd = int(i[0]), int(i[-1]), int(i[0] + j[0])
        w = weights[np.abs(2 * i - dd)][None, :]
        d = A[:, lo - 1:hi] - RB.diag_slice(dd, lo, hi, -1)
        return w * d * d + _min3(up, left, diag)

    return _dp_diag_batch(row0, col0, step)


def _msm_cost(x, y, z, c: float):
    """MSM split/merge cost (msm.rs:7-12): c if x between y and z, else
    c + min(|x-y|, |x-z|)."""
    between = ((y <= x) & (x <= z)) | ((y >= x) & (x >= z))
    return np.where(between, c, c + np.minimum(np.abs(x - y), np.abs(x - z)))


def msm_batch(A: np.ndarray, B: np.ndarray, c: float = 1.0) -> np.ndarray:
    """Move-Split-Merge (msm.rs:15-41); unpadded (n, m) grid. Routes to
    the bit-identical C fast path (functions/native.py) when built."""
    from polars_ts_spark.functions import native

    k, n = A.shape
    m = B.shape[1]
    if n == 0 or m == 0:
        return np.zeros(k)
    nat = native.msm_pairs(A, B, c)
    if nat is not None:
        return nat
    row0 = np.empty((k, m))
    row0[:, 0] = np.abs(A[:, 0] - B[:, 0])
    if m > 1:
        a0 = A[:, 0:1]
        row0[:, 1:] = row0[:, 0:1] + np.cumsum(_msm_cost(B[:, 1:], np.broadcast_to(a0, B[:, 1:].shape), B[:, :-1], c), axis=1)
    col0 = np.empty((k, n))
    col0[:, 0] = row0[:, 0]
    if n > 1:
        b0 = B[:, 0:1]
        col0[:, 1:] = col0[:, 0:1] + np.cumsum(_msm_cost(A[:, 1:], A[:, :-1], np.broadcast_to(b0, A[:, 1:].shape), c), axis=1)

    RB = _RevB(B)
    # fused step: zero per-diagonal allocations. "x between y and z"
    # is the sign test (x-y)*(x-z) <= 0, and the i-only / j-only
    # difference terms (ai-ai1, bj-bj1 and their |.|) are hoisted out
    # of the diagonal sweep entirely.
    dA = np.diff(A, axis=1)                  # (k, n-1): dA[:, i-1] = a_i - a_{i-1}
    adA = np.abs(dA)
    dB = np.diff(B, axis=1)
    RdB = _RevB(dB)                          # dB[:, j-1] = b_j - b_{j-1}
    RadB = _RevB(np.abs(dB))
    w_max = min(n, m)
    sv, sav, st, st2, sm = (np.empty((k, w_max)) for _ in range(5))
    bb = np.empty((k, w_max), dtype=bool)

    def step(i, j, diag, up, left, out):
        lo, hi, d = int(i[0]), int(i[-1]), int(i[0] + j[0])
        w = hi - lo + 1
        v, av, t, t2, m_, nb = (
            sv[:, :w], sav[:, :w], st[:, :w], st2[:, :w], sm[:, :w], bb[:, :w],
        )
        ai = A[:, lo:hi + 1]
        bj = RB.diag_slice(d, lo, hi, 0)
        u, au = dA[:, lo - 1:hi], adA[:, lo - 1:hi]          # ai - ai1, |.|
        # bj - bj1 for j = d-i, i in lo..hi -> dB index j-1 descending
        q = RdB.diag_slice(d, lo, hi, -1)
        aq = RadB.diag_slice(d, lo, hi, -1)
        np.subtract(ai, bj, out=v)    # v = ai - bj (match term & both costs)
        np.abs(v, out=av)
        # d2 = up + c + (0 if (ai-ai1)(ai-bj) <= 0 else min(|u|, |v|))
        np.multiply(u, v, out=m_)
        np.minimum(au, av, out=t)
        np.greater(m_, 0.0, out=nb)
        np.multiply(t, nb, out=t)
        np.add(t, c, out=t)
        np.add(t, up, out=t)
        # d3 = left + c + (0 if (ai-bj)(bj-bj1) >= 0 else min(|v|, |q|))
        np.multiply(v, q, out=m_)
        np.minimum(av, aq, out=t2)
        np.less(m_, 0.0, out=nb)
        np.multiply(t2, nb, out=t2)
        np.add(t2, c, out=t2)
        np.add(t2, left, out=t2)
        # d1 = diag + |ai - bj|
        np.add(diag, av, out=av)
        np.minimum(t, t2, out=out)
        np.minimum(out, av, out=out)

    return _dp_diag_batch(row0, col0, step)


def erp_batch(A: np.ndarray, B: np.ndarray, g: float = 0.0) -> np.ndarray:
    """Edit distance with Real Penalty, gap g (erp.rs:7-31). Routes to
    the bit-identical C fast path when built."""
    from polars_ts_spark.functions import native

    nat = native.erp_pairs(A, B, g)
    if nat is not None:
        return nat
    k, n = A.shape
    m = B.shape[1]
    row0 = np.concatenate([np.zeros((k, 1)), np.cumsum(np.abs(B - g), axis=1)], axis=1)
    col0 = np.concatenate([np.zeros((k, 1)), np.cumsum(np.abs(A - g), axis=1)], axis=1)

    RB = _RevB(B)

    def step(i, j, diag, up, left, out=None):
        lo, hi, d = int(i[0]), int(i[-1]), int(i[0] + j[0])
        a, b = A[:, lo - 1:hi], RB.diag_slice(d, lo, hi, -1)
        d_match = diag + np.abs(a - b)
        d_delete = up + np.abs(a - g)
        d_insert = left + np.abs(b - g)
        return _min3(d_match, d_delete, d_insert)

    return _dp_diag_batch(row0, col0, step)


def lcss_batch(A: np.ndarray, B: np.ndarray, epsilon: float = 1.0) -> np.ndarray:
    """1 - LCSS_len/min(n,m); match if |a-b| <= eps (lcss.rs:7-33).
    Routes to the bit-identical C fast path when built."""
    from polars_ts_spark.functions import native

    k, n = A.shape
    m = B.shape[1]
    if n == 0 or m == 0:
        return np.ones(k)
    nat = native.lcss_len_pairs(A, B, epsilon)
    if nat is not None:
        return 1.0 - nat / min(n, m)
    row0 = np.zeros((k, m + 1))
    col0 = np.zeros((k, n + 1))

    RB = _RevB(B)

    def step(i, j, diag, up, left, out=None):
        lo, hi, d = int(i[0]), int(i[-1]), int(i[0] + j[0])
        match = np.abs(A[:, lo - 1:hi] - RB.diag_slice(d, lo, hi, -1)) <= epsilon
        return np.where(match, diag + 1.0, np.maximum(up, left))

    length = _dp_diag_batch(row0, col0, step)
    return 1.0 - length / min(n, m)


def edr_batch(A: np.ndarray, B: np.ndarray, epsilon: float = 0.1) -> np.ndarray:
    """Edit Distance on Real sequences / max(n,m) (edr.rs:7-41).
    Routes to the bit-identical C fast path when built."""
    from polars_ts_spark.functions import native

    k, n = A.shape
    m = B.shape[1]
    if n == 0 or m == 0:
        return np.ones(k)
    nat = native.edr_raw_pairs(A, B, epsilon)
    if nat is not None:
        return nat / max(n, m)
    row0 = np.broadcast_to(np.arange(m + 1, dtype=float), (k, m + 1)).copy()
    col0 = np.broadcast_to(np.arange(n + 1, dtype=float), (k, n + 1)).copy()

    RB = _RevB(B)

    def step(i, j, diag, up, left, out=None):
        lo, hi, d = int(i[0]), int(i[-1]), int(i[0] + j[0])
        sub = np.where(np.abs(A[:, lo - 1:hi] - RB.diag_slice(d, lo, hi, -1)) <= epsilon, 0.0, 1.0)
        return _min3(diag + sub, up + 1.0, left + 1.0)

    return _dp_diag_batch(row0, col0, step) / max(n, m)


def twe_batch(A: np.ndarray, B: np.ndarray, nu: float = 0.001, lam: float = 1.0) -> np.ndarray:
    """Time Warp Edit distance (twe.rs:7-46), including the reference's
    nu·min(|i-j|, 2ν) match stiffness and 0-padding before element 0."""
    from polars_ts_spark.functions import native

    k, n = A.shape
    m = B.shape[1]
    if n == 0 or m == 0:
        return np.zeros(k)
    nat = native.twe_pairs(A, B, nu, lam)
    if nat is not None:
        return nat
    Ap = np.concatenate([np.zeros((k, 1)), A], axis=1)  # Ap[:, i] == a[i-2] at series pos i-1
    Bp = np.concatenate([np.zeros((k, 1)), B], axis=1)
    row0 = np.full((k, m + 1), INF); row0[:, 0] = 0.0
    row0[:, 1:] = np.cumsum(np.abs(B - Bp[:, :-1]) + nu + lam, axis=1)
    col0 = np.full((k, n + 1), INF); col0[:, 0] = 0.0
    col0[:, 1:] = np.cumsum(np.abs(A - Ap[:, :-1]) + nu + lam, axis=1)

    RB = _RevB(B)
    RBp = _RevB(Bp)

    def step(i, j, diag, up, left, out=None):
        lo, hi, d = int(i[0]), int(i[-1]), int(i[0] + j[0])
        a_i, a_prev = A[:, lo - 1:hi], Ap[:, lo - 1:hi]
        b_j = RB.diag_slice(d, lo, hi, -1)
        b_prev = RBp.diag_slice(d, lo, hi, -1)
        stiff = nu * np.minimum(np.abs(2 * i - d).astype(float), 2.0 * nu)[None, :]
        d_match = diag + np.abs(a_i - b_j) + np.abs(a_prev - b_prev) + stiff
        d_delete = up + np.abs(a_i - a_prev) + nu + lam
        d_insert = left + np.abs(b_j - b_prev) + nu + lam
        return _min3(d_match, d_delete, d_insert)

    return _dp_diag_batch(row0, col0, step)


def frechet_batch(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Discrete Fréchet: max-of-min DP on |a-b| (frechet.rs:7-33).
    Routes to the bit-identical C fast path when built."""
    from polars_ts_spark.functions import native

    k, n = A.shape
    m = B.shape[1]
    if n == 0 or m == 0:
        return np.full(k, INF)
    nat = native.frechet_pairs(A, B)
    if nat is not None:
        return nat
    row0 = np.maximum.accumulate(np.abs(A[:, 0:1] - B), axis=1)
    col0 = np.maximum.accumulate(np.abs(A - B[:, 0:1]), axis=1)

    RB = _RevB(B)

    def step(i, j, diag, up, left, out=None):
        lo, hi, d = int(i[0]), int(i[-1]), int(i[0] + j[0])
        return np.maximum(_min3(diag, up, left), np.abs(A[:, lo:hi + 1] - RB.diag_slice(d, lo, hi, 0)))

    return _dp_diag_batch(row0, col0, step)


def sbd_batch(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Shape-Based Distance 1 - max(NCC) (sbd.rs:9-49); batched FFT
    cross-correlation (reference computes O(n·m) directly — same values)."""
    k, n = A.shape
    m = B.shape[1]
    if n == 0 or m == 0:
        return np.full(k, 2.0)
    denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    size = 1
    while size < n + m - 1:
        size <<= 1
    fa = np.fft.rfft(A, size, axis=1)
    fb = np.fft.rfft(B, size, axis=1)
    cc = np.fft.irfft(fa * np.conj(fb), size, axis=1)
    ncc = np.concatenate([cc[:, -(m - 1):], cc[:, :n]], axis=1) if m > 1 else cc[:, :n]
    out = np.where(denom > 0, 1.0 - ncc.max(axis=1) / np.where(denom > 0, denom, 1.0), 1.0)
    return out


# ---------------------------------------------------------------------------
# FastDTW (per-pair; the windowed sparse DP doesn't batch, and its whole
# point is sub-O(nm) work per pair)


def _dtw_window(a: np.ndarray, b: np.ndarray, window: set[tuple[int, int]]):
    """DTW restricted to a cell window, returning (distance, path) —
    dict DP over the sparse window (size O((n+m)·radius))."""
    D: dict[tuple[int, int], float] = {(0, 0): 0.0}
    for i, j in sorted(window):
        cost = abs(a[i] - b[j])
        c = min(D.get((i, j), INF), D.get((i, j + 1), INF), D.get((i + 1, j), INF))
        D[(i + 1, j + 1)] = cost + c
    path = []
    i, j = len(a), len(b)
    while (i, j) != (0, 0):
        path.append((i - 1, j - 1))
        cands = [(D.get((i - 1, j - 1), INF), (i - 1, j - 1)),
                 (D.get((i - 1, j), INF), (i - 1, j)),
                 (D.get((i, j - 1), INF), (i, j - 1))]
        _, (i, j) = min(cands, key=lambda t: t[0])
    path.reverse()
    return D[(len(a), len(b))], path


def _expand_window(coarse_path, n: int, m: int, radius: int) -> set[tuple[int, int]]:
    cells = set()
    for (ci, cj) in coarse_path:
        for di in range(-radius, radius + 1):
            for dj in range(-radius, radius + 1):
                for ii in (2 * (ci + di), 2 * (ci + di) + 1):
                    for jj in (2 * (cj + dj), 2 * (cj + dj) + 1):
                        if 0 <= ii < n and 0 <= jj < m:
                            cells.add((ii, jj))
    return cells


def _fastdtw_path(a: np.ndarray, b: np.ndarray, radius: int):
    n, m = len(a), len(b)
    if n <= radius + 2 or m <= radius + 2:
        window = {(i, j) for i in range(n) for j in range(m)}
        return _dtw_window(a, b, window)
    half_a = (a[: 2 * (n // 2)].reshape(-1, 2)).mean(axis=1)
    half_b = (b[: 2 * (m // 2)].reshape(-1, 2)).mean(axis=1)
    _, coarse_path = _fastdtw_path(half_a, half_b, radius)
    return _dtw_window(a, b, _expand_window(coarse_path, n, m, radius))


def dtw_fast(a: np.ndarray, b: np.ndarray, radius: int = 5) -> float:
    """FastDTW (Salvador & Chan 2007; dtw.rs:89-197)."""
    d, _ = _fastdtw_path(np.asarray(a, float), np.asarray(b, float), radius)
    return float(d)


# ---------------------------------------------------------------------------
# multivariate (T × channels arrays, per-pair)


def dtw_multi(A: np.ndarray, B: np.ndarray, metric: str = "manhattan") -> float:
    """Multivariate DTW (dtw_multi.rs:14-47); per-step manhattan or
    euclidean cost across channels. Routes to the bit-identical C fast
    path when built."""
    from polars_ts_spark.functions import native

    A = np.asarray(A, float)
    B = np.asarray(B, float)
    nat = native.dtw_multi_pair(A, B, metric == "euclidean")
    if nat is not None:
        return nat
    n, m = A.shape[0], B.shape[0]
    row0 = np.full((1, m + 1), INF); row0[0, 0] = 0.0
    col0 = np.full((1, n + 1), INF); col0[0, 0] = 0.0

    def step(i, j, diag, up, left, out=None):
        d = A[i - 1] - B[j - 1]
        cost = np.sqrt((d * d).sum(axis=-1)) if metric == "euclidean" else np.abs(d).sum(axis=-1)
        return cost[None, :] + _min3(up, left, diag)

    return float(_dp_diag_batch(row0, col0, step)[0])


def msm_multi(A: np.ndarray, B: np.ndarray, c: float = 1.0) -> float:
    """Multivariate MSM (msm_multi.rs:20-59): dependent split/merge cost
    via the hypersphere-midpoint test on timestep vectors. Routes to
    the bit-identical C fast path when built."""
    from polars_ts_spark.functions import native

    A = np.asarray(A, float)
    B = np.asarray(B, float)
    n, m = A.shape[0], B.shape[0]
    if n == 0 or m == 0:
        return 0.0
    nat = native.msm_multi_pair(A, B, c)
    if nat is not None:
        return nat

    def vcost(x, y, z):
        mid = (y + z) / 2.0
        rad = np.linalg.norm(y - z, axis=-1) / 2.0
        dist_mid = np.linalg.norm(x - mid, axis=-1)
        alt = c + np.minimum(np.linalg.norm(x - y, axis=-1), np.linalg.norm(x - z, axis=-1))
        return np.where(dist_mid <= rad, c, alt)

    row0 = np.empty((1, m))
    row0[0, 0] = np.linalg.norm(A[0] - B[0])
    if m > 1:
        row0[0, 1:] = row0[0, 0] + np.cumsum(vcost(B[1:], np.broadcast_to(A[0], B[1:].shape), B[:-1]))
    col0 = np.empty((1, n))
    col0[0, 0] = row0[0, 0]
    if n > 1:
        col0[0, 1:] = col0[0, 0] + np.cumsum(vcost(A[1:], A[:-1], np.broadcast_to(B[0], A[1:].shape)))

    def step(i, j, diag, up, left, out=None):
        d1 = diag + np.linalg.norm(A[i] - B[j], axis=-1)[None, :]
        d2 = up + vcost(A[i], A[i - 1], B[j])[None, :]
        d3 = left + vcost(B[j], A[i], B[j - 1])[None, :]
        return _min3(d1, d2, d3)

    return float(_dp_diag_batch(row0, col0, step)[0])


# ---------------------------------------------------------------------------
# scalar wrappers (batch of one) — keep the analytic unit-test surface


def _s(fn, *args, **kw):
    def wrapped(a, b, *rest, **kws):
        A = np.asarray(a, float)[None, :]
        B = np.asarray(b, float)[None, :]
        return float(fn(A, B, *rest, **kws)[0])
    return wrapped


dtw = _s(dtw_batch)
dtw_sakoe_chiba = _s(dtw_sakoe_chiba_batch)
dtw_itakura = _s(dtw_itakura_batch)
ddtw = _s(ddtw_batch)
wdtw = _s(wdtw_batch)
msm = _s(msm_batch)
erp = _s(erp_batch)
lcss = _s(lcss_batch)
edr = _s(edr_batch)
twe = _s(twe_batch)
sbd = _s(sbd_batch)
frechet = _s(frechet_batch)

BATCH_METRICS = {
    "dtw": dtw_batch,
    "ddtw": ddtw_batch,
    "wdtw": wdtw_batch,
    "msm": msm_batch,
    "erp": erp_batch,
    "lcss": lcss_batch,
    "twe": twe_batch,
    "sbd": sbd_batch,
    "frechet": frechet_batch,
    "edr": edr_batch,
}

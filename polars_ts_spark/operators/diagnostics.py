"""Residual diagnostics: ACF / PACF / Ljung-Box + hampel outliers
(SURVEY §2.13/§2.10 kernel ops).

Reference semantics: polars_ts/diagnostics.py:11-201 (acf with
±1.96/√n bands; pacf via Durbin-Levinson; ljung_box Q-stat with χ²
p-value) and outliers.py:70-89 (hampel: centered rolling median/MAD,
1.4826 scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_ts_spark.operators.kernel import for_each_series
from polars_ts_spark.panel import ID, TARGET, TIME, require_columns


def acf_values(vals: np.ndarray, max_lags: int) -> np.ndarray:
    """acf[lag] = dot(demeaned[:n-lag], demeaned[lag:]) / dot(demeaned, demeaned)."""
    n = len(vals)
    d = vals - vals.mean()
    var = float(np.dot(d, d))
    out = np.zeros(min(max_lags + 1, n))
    for lag in range(len(out)):
        out[lag] = (1.0 if lag == 0 else 0.0) if var == 0 else float(np.dot(d[: n - lag], d[lag:])) / var
    return out


def pacf_values(vals: np.ndarray, max_lags: int) -> np.ndarray:
    """Durbin-Levinson recursion on the ACF (diagnostics.py:71-140)."""
    r = acf_values(vals, max_lags)
    m = len(r) - 1
    pacf = np.zeros(m + 1)
    pacf[0] = 1.0
    if m == 0:
        return pacf
    phi = np.zeros((m + 1, m + 1))
    phi[1, 1] = r[1]
    pacf[1] = r[1]
    for k in range(2, m + 1):
        num = r[k] - np.dot(phi[k - 1, 1:k], r[1:k][::-1])
        den = 1.0 - np.dot(phi[k - 1, 1:k], r[1:k])
        phi[k, k] = num / den if den != 0 else 0.0
        for j in range(1, k):
            phi[k, j] = phi[k - 1, j] - phi[k, k] * phi[k - 1, k - j]
        pacf[k] = phi[k, k]
    return pacf


def _chi2_sf(x: float, k: int) -> float:
    """Survival function of χ²_k without scipy: regularized upper
    incomplete gamma Q(k/2, x/2) via series/continued fraction
    (Numerical Recipes gammp/gammq standard forms)."""
    a, xx = k / 2.0, x / 2.0
    if xx < 0 or a <= 0:
        return float("nan")
    if xx == 0:
        return 1.0
    import math
    gln = math.lgamma(a)
    if xx < a + 1.0:
        # series for P(a,x)
        ap, s, delta = a, 1.0 / a, 1.0 / a
        for _ in range(500):
            ap += 1.0
            delta *= xx / ap
            s += delta
            if abs(delta) < abs(s) * 1e-15:
                break
        p = s * math.exp(-xx + a * math.log(xx) - gln)
        return max(0.0, min(1.0, 1.0 - p))
    # continued fraction for Q(a,x)
    b, c, d, h = xx + 1.0 - a, 1e300, 1.0 / (xx + 1.0 - a), 1.0 / (xx + 1.0 - a)
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        d = 1e-300 if abs(d) < 1e-300 else d
        c = b + an / c
        c = 1e-300 if abs(c) < 1e-300 else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return max(0.0, min(1.0, math.exp(-xx + a * math.log(xx) - gln) * h))


# Above this lag count the expression plan (max_lags+1 window lag columns
# + as many aggregate pairs) stops being worth its plan size and the
# numpy kernel takes over.
ACF_EXPR_MAX_LAGS = 24


def acf(df: DataFrame, max_lags: int = 20, id_col: str = ID,
        time_col: str = TIME, target_col: str = TARGET) -> DataFrame:
    """[id, lag, acf, ci_lower, ci_upper]; 95% bands ±1.96/√n.

    For small ``max_lags`` (the common diagnostic case) this is a pure
    Catalyst plan — demean via one partition window, materialize the
    ``max_lags+1`` lagged columns under the same (id, time) sort, one
    groupBy computing every SUM(d·d_k)/SUM(d·d) pair map-side-combined,
    then ``stack`` to long form. Two Exchanges total, no Python. The
    whole-series numpy kernel remains for large lag counts."""
    if max_lags < 1:
        raise ValueError("max_lags must be >= 1")
    require_columns(df, id_col, time_col, target_col)
    if max_lags <= ACF_EXPR_MAX_LAGS:
        return _acf_expr(df, max_lags, id_col, time_col, target_col)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[target_col].dropna().to_numpy(dtype=float)
        n = len(vals)
        if n < 2:
            return pd.DataFrame(columns=[id_col, "lag", "acf", "ci_lower", "ci_upper"])
        vals_acf = acf_values(vals, max_lags)
        ci = 1.96 / np.sqrt(n)
        return pd.DataFrame({
            id_col: pdf[id_col].iloc[0], "lag": np.arange(len(vals_acf)),
            "acf": vals_acf, "ci_lower": -ci, "ci_upper": ci,
        })

    return for_each_series(df, kern,
                           f"{id_col} string, lag long, acf double, ci_lower double, ci_upper double",
                           id_col, time_col)


def _acf_expr(df: DataFrame, max_lags: int, id_col: str, time_col: str,
              target_col: str) -> DataFrame:
    """Expression-only ACF (matches the DuckDB oracle shape exactly:
    SUM(d·d_k)/SUM(d·d) over the demeaned series, NULL past the series
    end)."""
    from pyspark.sql import Window

    wp = Window.partitionBy(id_col)
    ws = Window.partitionBy(id_col).orderBy(time_col)
    y = F.col(target_col)
    base = df.select(
        F.col(id_col),
        F.col(time_col),
        (y - F.avg(y).over(wp)).alias("d"),
        F.count(y).over(wp).alias("n"),
    )
    base = base.select(
        id_col, "d", "n",
        *[F.lag("d", k).over(ws).alias(f"d{k}") for k in range(1, max_lags + 1)],
    )
    aggs = [
        F.first("n").alias("n"),
        F.sum(F.col("d") * F.col("d")).alias("var"),
        *[F.sum(F.col("d") * F.col(f"d{k}")).alias(f"num{k}") for k in range(1, max_lags + 1)],
    ]
    per_series = base.groupBy(id_col).agg(*aggs).where(F.col("n") >= 2)
    pairs = ["0L, try_divide(var, var)"]
    pairs += [f"{k}L, try_divide(num{k}, var)" for k in range(1, max_lags + 1)]
    stacked = per_series.select(
        id_col, "n",
        F.expr(f"stack({max_lags + 1}, {', '.join(pairs)}) AS (lag, acf)"),
    )
    ci = F.lit(1.96) / F.sqrt(F.col("n"))
    return stacked.select(
        id_col, "lag", "acf",
        (-ci).alias("ci_lower"), ci.alias("ci_upper"),
    )


def pacf(df: DataFrame, max_lags: int = 20, id_col: str = ID,
         time_col: str = TIME, target_col: str = TARGET) -> DataFrame:
    """[id, lag, pacf, ci_lower, ci_upper] via Durbin-Levinson."""
    if max_lags < 1:
        raise ValueError("max_lags must be >= 1")
    require_columns(df, id_col, time_col, target_col)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[target_col].dropna().to_numpy(dtype=float)
        n = len(vals)
        if n < 2:
            return pd.DataFrame(columns=[id_col, "lag", "pacf", "ci_lower", "ci_upper"])
        p = pacf_values(vals, min(max_lags, n - 1))
        ci = 1.96 / np.sqrt(n)
        return pd.DataFrame({
            id_col: pdf[id_col].iloc[0], "lag": np.arange(len(p)),
            "pacf": p, "ci_lower": -ci, "ci_upper": ci,
        })

    return for_each_series(df, kern,
                           f"{id_col} string, lag long, pacf double, ci_lower double, ci_upper double",
                           id_col, time_col)


def ljung_box(df: DataFrame, max_lags: int = 10, id_col: str = ID,
              time_col: str = TIME, target_col: str = TARGET) -> DataFrame:
    """Q = n(n+2) Σ_{k=1..m} acf_k²/(n-k), p-value from χ²_m
    (diagnostics.py:143-201). -> [id, q_stat, p_value, lags]."""
    require_columns(df, id_col, time_col, target_col)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[target_col].dropna().to_numpy(dtype=float)
        n = len(vals)
        if n < 3:
            return pd.DataFrame(columns=[id_col, "q_stat", "p_value", "lags"])
        m = min(max_lags, n - 1)
        r = acf_values(vals, m)
        q = n * (n + 2.0) * float(sum(r[k] ** 2 / (n - k) for k in range(1, m + 1)))
        return pd.DataFrame({id_col: [pdf[id_col].iloc[0]], "q_stat": [q],
                             "p_value": [_chi2_sf(q, m)], "lags": [m]})

    return for_each_series(df, kern,
                           f"{id_col} string, q_stat double, p_value double, lags long",
                           id_col, time_col)


def hampel_outliers(df: DataFrame, window: int = 7, threshold: float = 3.0,
                    id_col: str = ID, time_col: str = TIME, target_col: str = TARGET) -> DataFrame:
    """Centered rolling median + MAD filter (outliers.py:70-89):
    flag |y - med| > t·1.4826·MAD, edge windows truncated. Vectorized
    with a padded sliding window per series."""
    require_columns(df, id_col, time_col, target_col)
    half = window // 2

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[target_col].to_numpy(dtype=float)
        n = len(vals)
        flags = np.zeros(n, dtype=bool)
        for i in range(n):
            lo, hi = max(0, i - half), min(n, i + half + 1)
            win = vals[lo:hi]
            m = np.median(win)
            md = np.median(np.abs(win - m))
            if md > 0 and abs(vals[i] - m) > threshold * 1.4826 * md:
                flags[i] = True
        out = pdf.copy()
        out["is_outlier"] = flags
        return out

    fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    return for_each_series(df, kern, f"{fields}, is_outlier boolean", id_col, time_col)

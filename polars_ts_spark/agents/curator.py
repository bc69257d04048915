"""CuratorAgent: data diagnostics + targeted cleaning
(ref agents/curator.py:28-292).

The reference computes period/trend/stationarity/lookback from the
FIRST series only (curator.py:177-184) — a driver shortcut. Here the
SAME per-series formulas (autocorrelation peak, fitted-slope-to-range
ratio, half-split mean/variance test, rolling variance-ratio break)
run for EVERY series inside one applyInPandas pass; the report
aggregates by majority vote (booleans), modal value (period) and
median (lookback). Counts (missing, z-outliers) are plain Catalyst
aggregates. Cleaning = per-series ffill/bfill imputation + z-clip,
pure DataFrame expressions."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_ts_spark.agents.protocol import LLMBackend, RuleBasedBackend
from polars_ts_spark.operators.kernel import for_each_series
from polars_ts_spark.panel import ID, TARGET, TIME


@dataclass
class CurationReport:
    """Results of data diagnostics (curator.py:14-26)."""

    n_observations: int
    n_series: int
    n_missing: int
    n_outliers: int
    detected_period: int | None
    has_trend: bool
    is_stationary: bool
    recommended_lookback: int | None
    summary: str


def _series_diagnostics(y: np.ndarray) -> tuple:
    """The reference's four first-series heuristics, applied per series
    (curator.py:186-279): (period|None, has_trend, is_stationary,
    lookback|None)."""
    n = len(y)
    period = None
    if n >= 10:
        v = y - np.mean(y)
        var = float(v @ v)
        if var > 0:
            best_acf, best_lag = 0.0, None
            for lag in range(2, min(n // 2, 60)):
                acf = float(v[: n - lag] @ v[lag:]) / var
                if acf > best_acf:
                    best_acf, best_lag = acf, lag
            if best_acf > 0.3:
                period = best_lag
    trend = False
    if n >= 5:
        x = np.arange(n, dtype=float)
        slope = np.polyfit(x, y, 1)[0]
        rng = float(np.ptp(y))
        trend = bool(rng > 0 and abs(slope * n) / rng > 0.2)
    stationary = True
    if n >= 20:
        mid = n // 2
        sd = float(np.std(y)) + 1e-10
        mean_shift = abs(float(np.mean(y[:mid])) - float(np.mean(y[mid:]))) / sd
        var_ratio = float(np.std(y[mid:])) / (float(np.std(y[:mid])) + 1e-10)
        stationary = bool(mean_shift < 1.5 and 0.5 < var_ratio < 2.0)
    lookback = None
    if n >= 40:
        w = max(n // 10, 10)
        sd = float(np.std(y)) + 1e-10
        best_score, best_break = 0.0, None
        for i in range(w, n - w):
            lv, rv = float(np.var(y[i - w:i])), float(np.var(y[i:i + w]))
            if lv < 1e-10 and rv < 1e-10:
                continue
            score = max(lv, rv) / (min(lv, rv) + 1e-10) + \
                abs(float(np.mean(y[i - w:i])) - float(np.mean(y[i:i + w]))) / sd
            if score > best_score:
                best_score, best_break = score, i
        if best_break is not None and best_score > 4.0:
            lookback = n - best_break
    return period, trend, stationary, lookback


class CuratorAgent:
    """Diagnoses data quality and applies targeted preprocessing."""

    def __init__(self, backend: LLMBackend | None = None,
                 id_col: str = ID, time_col: str = TIME, target_col: str = TARGET,
                 outlier_threshold: float = 3.0):
        self.backend = backend or RuleBasedBackend()
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col
        self.outlier_threshold = outlier_threshold

    def curate(self, df: DataFrame) -> CurationReport:
        idc, yc = self.id_col, self.target_col
        z = self.outlier_threshold
        # Catalyst aggregates: counts and per-series z-outliers
        stats = df.groupBy(idc).agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.when(F.col(yc).isNull() | F.isnan(yc), 1).otherwise(0)).alias("__miss"),
            F.mean(yc).alias("__mu"), F.stddev_samp(yc).alias("__sd"),
        )
        out = (
            df.join(stats, idc)
            .agg(
                F.sum(F.lit(1)).alias("n_obs"),
                F.sum(F.when(F.col(yc).isNull() | F.isnan(yc), 1).otherwise(0)).alias("n_missing"),
                F.sum(F.when(
                    F.abs(F.col(yc) - F.col("__mu")) > z * F.col("__sd"), 1
                ).otherwise(0)).alias("n_outliers"),
                F.countDistinct(idc).alias("n_series"),
            ).first()
        )

        idc_, tc_, yc_ = self.id_col, self.time_col, self.target_col

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            y = pdf[yc_].to_numpy(dtype=float)
            y = y[~np.isnan(y)]
            period, trend, stat, look = _series_diagnostics(y)
            return pd.DataFrame({
                idc_: [str(pdf[idc_].iloc[0])],
                "period": [np.nan if period is None else float(period)],
                "trend": [bool(trend)], "stationary": [bool(stat)],
                "lookback": [np.nan if look is None else float(look)],
            })

        diag = for_each_series(
            df, kern,
            f"{idc_} string, period double, trend boolean, stationary boolean, lookback double",
            id_col=idc_, time_col=tc_,
        ).agg(
            F.expr("mode(period)").alias("period"),
            F.avg(F.col("trend").cast("double")).alias("trend_frac"),
            F.avg(F.col("stationary").cast("double")).alias("stat_frac"),
            F.expr("percentile(lookback, 0.5)").alias("lookback"),
        ).first()

        period = None if diag["period"] is None or np.isnan(diag["period"]) \
            else int(diag["period"])
        has_trend = bool((diag["trend_frac"] or 0.0) > 0.5)
        is_stationary = bool((diag["stat_frac"] if diag["stat_frac"] is not None else 1.0) >= 0.5)
        lookback = None if diag["lookback"] is None or np.isnan(diag["lookback"]) \
            else int(diag["lookback"])

        summary = (f"{out['n_series']} series, {out['n_obs']} obs, "
                   f"{out['n_missing']} missing, {out['n_outliers']} outliers")
        if period:
            summary += f", period={period}"
        if has_trend:
            summary += ", trend detected"
        if not is_stationary:
            summary += ", non-stationary"
        if lookback:
            summary += f", lookback={lookback}"
        if not isinstance(self.backend, RuleBasedBackend):
            llm = self.backend.complete(
                f"Summarize these time series diagnostics concisely:\n{summary}")
            if llm:
                summary = llm
        return CurationReport(
            n_observations=int(out["n_obs"]), n_series=int(out["n_series"]),
            n_missing=int(out["n_missing"]), n_outliers=int(out["n_outliers"]),
            detected_period=period, has_trend=has_trend,
            is_stationary=is_stationary, recommended_lookback=lookback,
            summary=summary,
        )

    def curate_and_clean(self, df: DataFrame) -> DataFrame:
        """ffill→bfill imputation per series, then z-score clipping —
        all window/aggregate expressions (curator.py:104-125, 281-292)."""
        idc, tc, yc = self.id_col, self.time_col, self.target_col
        w_f = Window.partitionBy(idc).orderBy(tc) \
                    .rowsBetween(Window.unboundedPreceding, 0)
        w_b = Window.partitionBy(idc).orderBy(tc) \
                    .rowsBetween(0, Window.unboundedFollowing)
        y = F.when(F.isnan(yc), None).otherwise(F.col(yc))
        filled = F.coalesce(F.last(y, ignorenulls=True).over(w_f),
                            F.first(y, ignorenulls=True).over(w_b))
        out = df.withColumn(yc, filled)
        w_s = Window.partitionBy(idc)
        mu, sd = F.mean(yc).over(w_s), F.stddev_samp(yc).over(w_s)
        lo, hi = mu - self.outlier_threshold * sd, mu + self.outlier_threshold * sd
        clipped = F.when(F.col(yc) < lo, lo).when(F.col(yc) > hi, hi).otherwise(F.col(yc))
        return out.withColumn(yc, F.when(sd.isNull(), F.col(yc)).otherwise(clipped))

    def trim_lookback(self, df: DataFrame, lookback: int | None) -> DataFrame:
        """Keep only the last ``lookback`` rows per series."""
        if not lookback:
            return df
        w = Window.partitionBy(self.id_col).orderBy(F.col(self.time_col).desc())
        return (df.withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") <= lookback).drop("__rk"))

"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop write (full execution, no
driver collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from __spark_entry__ import queries  # noqa: E402
from polars_ts_spark.session import get_spark  # noqa: E402

# headline set: one per operator family (features, preprocessing,
# forecasting, metrics, decomposition) plus the heavier kernels as they land
HEADLINE = [
    "panel_base",
    "lag_features",
    "rolling_features",
    "calendar_features",
    "resample_weekly",
    "impute_ffill",
    "outliers_iqr",
    "cusum",
    "naive_forecast",
    "seasonal_naive_forecast",
    "forecast_metrics",
    "mase",
    "seasonal_strength_features",
    # kernel layer (applyInPandas / mapInPandas)
    "ses_forecast",
    "holt_winters_forecast",
    "mann_kendall",
    "acf",
    "pelt",
    "pairwise_dtw",
    "pairwise_msm",
    "pairwise_sbd",
    # training-data-pipeline ops
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "dup_ngram_stats",
    "stratified_sample",
    "text_stats",
    "corpus_curation",
    "cosine_topk",
    "lsh_ann_topk",
    "ivf_ann_topk",
    # model & pipeline layer
    "recursive_forecast",
    "arima_forecast",
    "kalman_filter",
    "conformal_interval",
    "reconcile_bottom_up",
    "event_window_agg",
    "kmedoids_dtw",
    "regime_detect",
    # round-7: the newly distributed fit layer (IRLS sufficient-stats
    # aggs; pooled id-code ridge; distributed meta-fit) — headline set
    # grew again, compare totals on the shared-query subset
    "quantile_regression",
    "global_forecast",
    "stacking_forecast",
    # round-7 curation additions
    "gopher_repetition",
    "benchmark_decontaminate",
    "trim_duplicate_spans",
    "domain_stats",
]


def _cpu_calibration() -> float:
    """Fixed-size BLAS GEMM wall time: a machine-load probe. This box
    is shared — back-to-back full-suite runs have varied >2x on
    external load alone — so the bench reports the probe before and
    after the suite, letting a reader normalize query times across
    rounds instead of mistaking host contention for a code regression."""
    import time as _t

    import numpy as _np

    x = _np.random.default_rng(0).normal(size=(2000, 2000))
    t0 = _t.perf_counter()
    for _ in range(3):
        y = x @ x
    _ = float(y.sum())
    return round(_t.perf_counter() - t0, 3)


def _wait_for_quiet_box(threshold: float = 0.30, max_wait_s: float = 180.0):
    """Don't time on a loaded box (round-6 ran at ~2.5x external load
    and the numbers were useless for cross-round comparison): poll the
    calibration probe until it drops under ``threshold`` seconds or the
    wait budget runs out, and report what happened either way. Disable
    with SPARK_GRAFT_NO_CALIB_GATE=1."""
    import time as _t

    probes = [_cpu_calibration()]
    if os.environ.get("SPARK_GRAFT_NO_CALIB_GATE") == "1":
        return probes[0], probes
    deadline = _t.monotonic() + max_wait_s
    while probes[-1] > threshold and _t.monotonic() < deadline:
        _t.sleep(10.0)
        probes.append(_cpu_calibration())
    return probes[-1], probes


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    calib_before, calib_probes = _wait_for_quiet_box()
    spark = get_spark("polars-ts-spark-bench")
    qs = queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n.startswith("bench_only_") and n not in HEADLINE
    ]
    # warm the JVM + parquet footer cache with one tiny action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    # warm the Python-UDF worker pool: the first applyInPandas stage
    # otherwise pays ~32 worker spawns + pandas/pyarrow imports, which
    # lands on whichever kernel query happens to run first
    import pandas as _pd  # noqa: PLC0415

    warm = spark.createDataFrame(_pd.DataFrame({"k": list(range(32)), "v": [0.0] * 32}))
    warm.repartition(32, "k").groupBy("k").applyInPandas(
        lambda pdf: pdf, schema="k long, v double"
    ).write.format("noop").mode("overwrite").save()
    # two passes per query, keep the min: steady-state timing that a
    # transient external load spike (or first-touch page-cache misses)
    # can't distort — measured variance between back-to-back cold runs
    # of the full suite was >2x on a shared box. Queries that regressed
    # >15% between rounds on load noise get a third pass and a reported
    # spread, so noise can't masquerade as a regression (VERDICT r4 #9).
    RUNS = 2
    # lsh_ann_topk added r6: pins the multi-probe recall-fix cost
    # (0.96 -> 1.20 s in r5) so it can't drift unnoticed (VERDICT r5 #9)
    # ivf_ann_topk added r6: new query whose time includes 3 training
    # jobs — report a spread so host noise can't read as regression
    # corpus_curation added r6: a composed pipeline whose eager component
    # (cluster propagation) is the most load-sensitive query in the set —
    # report a spread so host noise can't read as regression
    RERUN3 = {"forecast_metrics", "kmedoids_dtw", "lsh_ann_topk", "ivf_ann_topk",
              "corpus_curation"}
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        runs_here = 3 if name in RERUN3 else RUNS
        samples = []
        for run in range(runs_here):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if run == 0:
                cold[name] = round(dt, 3)
            samples.append(dt)
            # several operators cache intermediates (pairwise grouped
            # arrays, reconcile bottoms); drop them between queries so
            # accumulated blocks don't GC-pressure later measurements
            spark.catalog.clearCache()
        timings[name] = round(min(samples), 3)
        if name in RERUN3:
            spread[name] = [round(s, 3) for s in sorted(samples)]
    total = round(sum(timings.values()), 3)
    # approximate-path quality at bench scale: recall of the LSH/ANN
    # scale paths against their exact baselines (VERDICT r3 #4) —
    # fast-but-wrong is not done, so the bench reports both axes
    quality: dict[str, float] = {}
    try:
        from polars_ts_spark.operators import embedsim, textops  # noqa: PLC0415

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        bf1 = {r["vec_id"]: r["neighbor_id"]
               for r in embedsim.brute_force_topk(emb, k=1).collect()}
        ann1 = {r["vec_id"]: r["neighbor_id"]
                for r in embedsim.lsh_ann_topk(emb, k=1).collect()}
        if bf1:
            quality["ann_recall_at_1"] = round(
                sum(1 for v, nb in bf1.items() if ann1.get(v) == nb) / len(bf1), 4)
        ivf1 = {r["vec_id"]: r["neighbor_id"]
                for r in embedsim.ivf_ann_topk(emb, k=1).collect()}
        if bf1:
            quality["ivf_recall_at_1"] = round(
                sum(1 for v, nb in bf1.items() if ivf1.get(v) == nb) / len(bf1), 4)
        # (cosine near-dup pair recall is asserted in tests/test_datapipe.py
        # at sf0.01 — this corpus has no pairs above 0.8 at bench scale, so
        # the exact baseline here would only burn a quadratic pass)
        docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        exact_j = {(r["doc_id_1"], r["doc_id_2"])
                   for r in textops.ngram_jaccard_pairs(docs_df, n=3, threshold=0.8).collect()}
        mh = {(r["doc_id_1"], r["doc_id_2"])
              for r in textops.minhash_lsh_pairs(docs_df, threshold=0.5).collect()}
        if exact_j:
            quality["minhash_pair_recall"] = round(len(exact_j & mh) / len(exact_j), 4)
    except Exception as exc:  # pragma: no cover - quality tail must not kill bench
        quality["error"] = str(exc)[:200]
    # report BOTH the warm min-of-N headline and the first-run (cold)
    # total, so the number stays comparable to single-run harnesses
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": RUNS,
        "agg": "min",
        "cold_total": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "quality": quality,
        "spread_3runs": spread,
        "cpu_calibration_sec": {"before": calib_before, "after": _cpu_calibration(),
                                "gate_probes": calib_probes},
        "notes": {
            "headline_set": "grew r6->r7: +quantile_regression, "
                            "+global_forecast, +stacking_forecast (the newly "
                            "distributed fit layer), +gopher_repetition, "
                            "+benchmark_decontaminate, +trim_duplicate_spans, "
                            "+domain_stats (new curation ops) — compare "
                            "totals on the shared-query subset, not headline "
                            "sums",
            "regime_detect": "query redefined in r6 (exact-cents monthly panel, "
                             "6 fixed EM iterations, was daily/50) — its delta vs "
                             "r5 is a definition change, not a kernel speedup",
            "corpus_curation": "new in r6: a COMPOSED pipeline (minhash-LSH "
                               "dedup + component propagation + quality/language/"
                               "token scans) — its cost is the sum of its stages, "
                               "~half of it the minhash pass already timed above",
        },
    }))


if __name__ == "__main__":
    main()

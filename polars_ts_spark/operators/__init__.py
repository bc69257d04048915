from polars_ts_spark.operators import (
    baselines,
    changepoint,
    clustering,
    cv,
    decomposition,
    diagnostics,
    distance,
    embedsim,
    ets,
    features,
    kernel,
    metrics,
    multimodal,
    pelt,
    preprocessing,
    statespace,
    textops,
    trend,
    var_model,
    volatility,
)

__all__ = [
    "baselines", "changepoint", "clustering", "cv", "decomposition", "diagnostics", "distance", "ets",
    "embedsim", "features", "kernel", "metrics", "multimodal", "pelt",
    "preprocessing", "statespace", "textops", "trend", "var_model", "volatility",
]

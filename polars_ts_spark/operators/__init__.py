from polars_ts_spark.operators import (
    baselines,
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
    textops,
    trend,
)

__all__ = [
    "baselines", "cv", "decomposition", "diagnostics", "distance", "ets",
    "embedsim", "features", "kernel", "metrics", "multimodal", "pelt",
    "preprocessing", "textops", "trend",
]

from polars_ts_spark.operators import (
    baselines,
    cv,
    decomposition,
    diagnostics,
    distance,
    ets,
    features,
    kernel,
    metrics,
    pelt,
    preprocessing,
    trend,
)

__all__ = [
    "baselines", "cv", "decomposition", "diagnostics", "distance", "ets",
    "features", "kernel", "metrics", "pelt", "preprocessing", "trend",
]

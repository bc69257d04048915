from polars_ts_spark.operators import baselines, cv, decomposition, features, metrics, preprocessing

__all__ = ["baselines", "cv", "decomposition", "features", "metrics", "preprocessing"]

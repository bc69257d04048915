from polars_ts_spark.streaming import online, structured

__all__ = ["online", "structured"]

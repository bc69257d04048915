from polars_ts_spark.sources.datasets import load_table, load_tables, supplier_daily_panel, user_event_panel

__all__ = ["load_table", "load_tables", "supplier_daily_panel", "user_event_panel"]

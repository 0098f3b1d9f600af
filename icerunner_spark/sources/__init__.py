"""Data sources: raw-parquet test fixtures and the snapshot-table reader."""

from icerunner_spark.sources.testdata import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]

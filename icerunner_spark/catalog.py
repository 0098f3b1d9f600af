"""Warehouse catalog: namespace + table directory management.

Parity with the reference's PyIceberg SQL catalog usage (icerunner.py:56-74,
105-110): a single ``default`` namespace under a file warehouse. Here the
catalog is the filesystem layout itself — a table exists iff its metadata
pointer does — so there is no second source of truth to keep in sync
(SURVEY.md §7 "catalog sharing").
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from icerunner_spark.table import IceTable

DEFAULT_NAMESPACE = "default"


class Catalog:
    def __init__(self, spark: SparkSession, warehouse_path: str,
                 namespace: str = DEFAULT_NAMESPACE):
        self.spark = spark
        self.warehouse_path = os.path.abspath(warehouse_path)
        self.namespace = namespace
        os.makedirs(self._ns_dir(), exist_ok=True)

    def _ns_dir(self) -> str:
        return os.path.join(self.warehouse_path, self.namespace)

    def table_path(self, name: str) -> str:
        self._validate_name(name)
        return os.path.join(self._ns_dir(), name)

    @staticmethod
    def _validate_name(name: str) -> None:
        # The reference f-strings table names into SQL (injection-prone,
        # icerunner.py:95-101); we validate instead (SURVEY.md §4).
        if not name or not all(c.isalnum() or c in "_-" for c in name):
            raise ValueError(f"invalid table name: {name!r}")

    def table(self, name: str) -> IceTable:
        return IceTable(self.spark, self.table_path(name))

    def list_tables(self) -> list[str]:
        ns = self._ns_dir()
        if not os.path.isdir(ns):
            return []
        return sorted(
            d for d in os.listdir(ns) if IceTable(self.spark, os.path.join(ns, d)).exists()
        )

    def table_exists(self, name: str) -> bool:
        try:
            return self.table(name).exists()
        except ValueError:
            return False

    def drop_table(self, name: str) -> bool:
        path = self.table_path(name)
        if not os.path.isdir(path):
            return False
        shutil.rmtree(path)
        return True

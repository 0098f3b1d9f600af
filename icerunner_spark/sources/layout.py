"""On-disk layout helpers for the 100 TB design (SURVEY.md §4 "Partition
pruning / file skipping").

The reference creates every Iceberg table unpartitioned
(icerunner.py:154-157 — create_table passes no partition spec), so every
query scans every file. At scale the layout IS the index: date-partition
the facts, cluster/bucket on the join key, and the scan planner prunes
partitions before reading a byte. These helpers make that layout a
one-liner and the plan tests (tests/test_plans.py) prove the pruning
actually happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write parquet partitioned by the given columns (hive layout:
    ``col=value/`` directories). Filters on partition columns then prune
    directories at planning time — zero IO for excluded partitions."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.partitionBy(*partition_by).parquet(path)


def with_date_partition(
    df: DataFrame, ts_col: str, *, col_name: str = "p_date"
) -> DataFrame:
    """Add a date partition column derived from an event-time timestamp —
    the standard fact-table layout (daily partitions; coarser/finer is a
    one-line change)."""
    return df.withColumn(col_name, F.to_date(F.col(ts_col)))


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a hive-partitioned parquet dataset (partition columns come
    back as real columns, usable in filters that prune)."""
    return spark.read.parquet(path)

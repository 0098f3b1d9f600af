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


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (hash-clustered) parquet table.

    Bucketing is the co-located-join layout: both fact tables hashed into
    the same number of buckets on the join key read back pre-partitioned,
    so the join runs with ZERO shuffle of either side — at 100 TB this is
    the difference between a join that moves terabytes over the network
    and one that streams local files (tests/test_plans.py pins the
    no-Exchange plan). ``sort_by`` additionally pre-sorts within buckets,
    letting sort-merge joins skip the per-task sort. Bucketed layout
    requires the table catalog (``saveAsTable``); ``path`` makes it
    external so tests can point it at a tmp dir."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)

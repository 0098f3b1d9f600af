"""SparkSession factory with scale-oriented defaults.

The reference delegates execution to an embedded DuckDB connection
(icerunner.py:72-80); here the engine is Spark itself. The defaults below are
chosen for correctness on local[N] test runs *and* sanity on a large cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy).
- Arrow on for every Python<->JVM columnar boundary (Flight serve/ingest
  path, pandas UDFs).
- ``TimestampNTZ`` + UTC session zone so parquet/Arrow/DuckDB-oracle
  timestamps round-trip bit-identically (SURVEY.md §7 "timestamp fidelity").
- shuffle partitions default to the local core count; on a real cluster this
  is expected to be overridden (or left to AQE coalescing from a higher
  initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    # Engine-written parquet must be int64 µs, not legacy INT96: pyarrow
    # reads INT96 back as timestamp[ns], which the Flight serve path would
    # then stream to consumers that reject ns (Spark's Arrow conversion,
    # DuckDB µs semantics). µs on disk keeps every boundary µs.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Spark 4 refuses TIMESTAMP(NANOS) parquet columns outright; read them as
    # long nanoseconds and convert at the source layer (sources/testdata.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    # Filters and projections must reach the parquet scan.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Don't let tiny dim tables shuffle: broadcast up to 32 MiB.
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    "spark.sql.warehouse.dir": "/tmp/icerunner_spark_warehouse",
}


def get_spark(
    app_name: str = "icerunner_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if the
    env var is unset). On a cluster deployment, pass ``master=None`` with
    ``spark.master`` set externally — the defaults here are all
    cluster-safe.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

"""Load the driver-generated TPC-H-ish parquet fixtures (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

These are plain-parquet *inputs*; the snapshot-versioned table format in
``icerunner_spark.table`` is the managed-table layer. Keeping the two apart
mirrors the reference's split between external data and Iceberg tables.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=None)
def _ns_timestamp_cols(path: str) -> tuple[str, ...]:
    schema = pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    )


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one fixture table. Column pruning / predicate pushdown flow into
    the parquet scan because this stays a plain declarative read.

    ``timestamp[ns]`` parquet columns (the events table) are illegal for
    Spark 4's vectorized reader; with ``nanosAsLong`` they arrive as long
    nanoseconds and are converted to microsecond timestamps here (the
    fixture generator emits µs-aligned values, so the division is lossless).
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in TABLES:
        raise ValueError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _ns_timestamp_cols(path)
    if ns_cols:
        # Harness sessions (driver, notebooks) don't go through session.py;
        # the conf is runtime-settable, so make every session able to read
        # the ns-timestamp fixture instead of relying on builder setup.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # integer division: long-ns values exceed 2^53, so a double
        # round-trip (col / 1000 -> cast long) is off by ±1 µs
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # timestamp[us] parquet columns without UTC adjustment arrive as
    # TIMESTAMP_NTZ under Spark 4's NTZ inference; normalize to session-UTC
    # TimestampType so every consumer (unix_micros, watermarks, window())
    # sees one timestamp type regardless of how the fixture was written.
    # Under the UTC session zone this cast is instant-preserving.
    for f in df.schema.fields:
        if f.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)

"""Streaming pipelines over the events fixture.

Every transformation here is written against an unbounded DataFrame, so
the *same* function body runs in batch mode (pass a batch DataFrame) and
in streaming mode (pass ``read_events_stream(...)``) — that equivalence
is what the tests pin: a streaming run with ``availableNow`` over N files
must produce exactly the batch answer.

Scale notes: watermarks bound the state store (late data beyond the
watermark is dropped, so state size tracks the watermark horizon, not the
stream length); windowed aggregation shuffles on (window, key) exactly
once with partial aggregation map-side; ``applyInPandasWithState`` keeps
per-key state in the state store, partitioned by key — no driver state.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _events_ts_physical_type(events_dir: str) -> str:
    """Peek at one data file to learn how ``ts`` is physically stored.
    File-source streams require an explicit schema, and the fixture has
    shipped both as timestamp[ns] (readable only as long under
    ``nanosAsLong``) and as timestamp[us] (read as TIMESTAMP_NTZ) — the
    declared schema must match the file or the column is misread."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(events_dir, "**", "*.parquet"), recursive=True))
    if not files:
        return "ntz"
    t = str(pq.read_schema(files[0]).field("ts").type)
    return "long_ns" if t.startswith("timestamp[ns") else "ntz"


def read_events_stream(
    spark: SparkSession, events_dir: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a directory of events parquet files.
    ``maxFilesPerTrigger`` forces multi-micro-batch execution so tests
    exercise real incremental state updates, not one giant batch.
    ``ts`` is normalized to session-UTC TimestampType whatever its
    physical storage, matching the batch loader (sources/testdata.py)."""
    from pyspark.sql.types import TimestampNTZType

    ts_kind = _events_ts_physical_type(events_dir)
    ts_field = (
        StructField("ts", LongType())
        if ts_kind == "long_ns"
        else StructField("ts", TimestampNTZType())
    )
    schema = StructType(
        [
            StructField("event_id", LongType()),
            ts_field,
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(events_dir)
    )
    if ts_kind == "long_ns":
        # integer division (`div`), not `/`: ns epochs exceed 2^53, the double
        # path truncates wrong by ±1 µs (see sources/testdata.py)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


# Physical schema of the documents fixture (plain types, no ns timestamps).
_DOCS_FILE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, docs_dir: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a directory of documents parquet files —
    the ingestion shape of a continuously-crawled corpus."""
    return (
        spark.readStream.schema(_DOCS_FILE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(docs_dir)
    )


def clean_documents(docs: DataFrame, *, min_quality: float = 0.5) -> DataFrame:
    """Stateless corpus-clean stage: quality gate + PII redaction + token
    audit. Entirely narrow (no shuffle, no state), so the SAME body runs
    as a batch projection or a streaming map with append-mode semantics
    — documents are cleaned as they arrive, at scan speed. Stateful
    stages (exact/near dedup) belong downstream on the compacted store,
    where `dedup_stream` / the batch dedup operators handle them with
    bounded state.

    Emits doc_id, lang, quality (6dp), redacted_md5, n_tokens, n_pii.
    """
    from icerunner_spark.functions.text import pii_counts, redact_pii, token_count
    from icerunner_spark.operators.text import quality_score

    counts = list(pii_counts("text").values())
    n_pii = counts[0]
    for c in counts[1:]:
        n_pii = n_pii + c
    return (
        docs.withColumn("__q", quality_score("text"))
        .filter(
            (F.length("text") > 0)
            & (token_count("text") > 0)
            & (F.col("__q") >= min_quality)
        )
        .select(
            "doc_id",
            "lang",
            F.round("__q", 6).alias("quality"),
            F.md5(redact_pii("text")).alias("redacted_md5"),
            token_count("text").cast("long").alias("n_tokens"),
            n_pii.cast("long").alias("n_pii"),
        )
    )


def windowed_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) event-time window per event_type: count +
    value sum. With a watermark the state store evicts windows older than
    (max event time - watermark); late rows beyond it are dropped."""
    src = events.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        src.groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # sum in the input type (decimal when the caller pre-casts, for
            # order-independent exactness), emit double: output type then
            # matches the oracle's DOUBLE regardless of input type
            F.round(F.sum("value"), 2).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: a session extends while consecutive
    events arrive within ``gap``. Streaming mode requires the watermark
    (sessions merge as late events arrive inside it)."""
    src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id. ``dropDuplicatesWithinWatermark``
    bounds the dedup state to the watermark horizon — the only way dedup
    state stays finite on an unbounded stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def view_purchase_attribution(
    events: DataFrame, *, horizon: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval self-join: each purchase attributed to the
    same user's views in the preceding ``horizon``.

    Both sides carry a watermark and the join predicate bounds
    ``purchase_ts`` to [view_ts, view_ts + horizon] — together these give
    the state store an eviction rule (a buffered view can be dropped once
    the purchase-side watermark passes view_ts + horizon), which is what
    keeps stream-stream join state finite on an unbounded feed. The
    horizon must sit inside the watermark delay or matches are lost to
    early eviction. Same body runs in batch (watermarks are no-ops) —
    the equivalence test pins stream == batch."""
    v = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.round(F.col("value"), 2).alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.expr(f"view_ts + INTERVAL {horizon}"))
    )
    return v.join(p, cond).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        "view_ts",
        "purchase_ts",
        "purchase_value",
    )


_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("v", DoubleType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value sum, re-emitted every micro-batch a user
    appears in. State is one (count, sum) pair per user, partitioned by
    user_id in the state store — constant per-key size forever."""

    def update(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(v, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_state_partitions() -> int:
    """Default state-store partition count for stateful drains
    (``ICERUNNER_STREAM_STATE_PARTITIONS``, default 8).

    Stateful streaming operators create one state-store instance per
    shuffle partition, and the count is pinned by the checkpoint at the
    FIRST micro-batch — so it must be sized to the STATE (keys inside
    the watermark horizon), not to the session's batch shuffle width.
    Every extra instance costs a task + a per-micro-batch state commit
    (delta file + fsync) whether or not it holds keys: on the r11
    measurement host (~1.2k fsync IOPS) the inherited 32-partition
    default drew a bimodal 5.7–28.4 s drain for ~100k keys of dedup
    state, vs a stable 2.7–5.3 s at 8 partitions (identical output).
    8 partitions hold ~10M keys comfortably (HDFS-backed store keeps a
    partition's state on-heap; ~100 bytes/key → ~128 MB/partition at
    10M); production streams with larger horizons RAISE the env var —
    the right value tracks key volume, never the core count."""
    raw = os.environ.get("ICERUNNER_STREAM_STATE_PARTITIONS", "8")
    try:
        n = int(raw)
    except ValueError:
        raise ValueError(
            "ICERUNNER_STREAM_STATE_PARTITIONS must be a positive integer, "
            f"got {raw!r}"
        ) from None
    if n < 1:
        raise ValueError(
            f"ICERUNNER_STREAM_STATE_PARTITIONS must be >= 1, got {n}"
        )
    return n


def run_available_now(
    stream_df: DataFrame,
    out_dir: str,
    *,
    checkpoint_dir: str | None = None,
    output_mode: str = "append",
    timeout_s: int = 300,
    state_partitions: int | None = None,
) -> None:
    """Drain everything currently available through the streaming engine
    (micro-batch by micro-batch per source options) into parquet, then
    stop. The batch-equivalence harness for every pipeline above.

    ``state_partitions`` (optional, must be >= 1) sets
    ``spark.sql.shuffle.partitions`` for the duration of the drain — the
    only lever over how many state-store instances a stateful query
    creates (see :func:`stream_state_partitions`) — and restores the
    session value afterwards. Output is partitioning-independent; only
    task/commit overhead changes.

    NOT thread-safe while ``state_partitions`` is set: the conf is
    session-wide, so a query planned concurrently on the same
    SparkSession would pick up the temporary value, and two overlapping
    drains can restore each other's value out of order. Callers that
    need concurrent drains should run each on its own
    ``spark.newSession()`` (conf is per-session there)."""
    if state_partitions is not None and int(state_partitions) < 1:
        raise ValueError(
            f"state_partitions must be >= 1, got {state_partitions}"
        )
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    writer = (
        stream_df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if output_mode == "append":
        writer = writer.format("parquet").option("path", out_dir)
    else:
        # the file sink is append-only; update/complete modes land each
        # micro-batch's emissions via foreachBatch (idempotent on batch_id
        # replay is the checkpoint's job; parquet append is fine for tests
        # and mirrors how update-mode results reach an upsert-capable sink)
        data_dir = os.path.join(out_dir, "data")

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(data_dir)

        writer = writer.foreachBatch(_sink)
    spark = stream_df.sparkSession
    prev_parts: str | None = None
    if state_partitions is not None:
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(int(state_partitions)))
    try:
        q = writer.start()
        try:
            # awaitTermination returns False on timeout — surface it rather
            # than letting q.stop() silently truncate the drain mid-run.
            # timeout_s=None means wait-forever: awaitTermination(None) blocks
            # until done and returns None, which must not be read as a timeout.
            if timeout_s is None:
                q.awaitTermination()
            elif not q.awaitTermination(timeout_s):
                raise TimeoutError(
                    f"availableNow drain did not finish within {timeout_s}s"
                )
        finally:
            q.stop()
    finally:
        if prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def high_water_marks(events: DataFrame) -> DataFrame:
    """Batch form of the high-water-mark tracker: per user, the running
    maximum of ``value`` in (ts, event_id) order and how many events set
    a new maximum (the first event always counts). The streaming twin is
    ``high_water_marks_stream`` — same outputs per user at stream end."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("value").over(w)
    breach = F.when(
        prev_max.isNull() | (F.col("value") > prev_max), 1
    ).otherwise(0)
    return (
        events.withColumn("__breach", breach)
        .groupBy("user_id")
        .agg(
            F.round(F.max("value"), 2).cast("double").alias("high_water"),
            F.sum("__breach").cast("long").alias("n_breaches"),
        )
    )


_HW_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("high_water", DoubleType()),
        StructField("n_breaches", LongType()),
    ]
)


def high_water_marks_stream(events: DataFrame) -> DataFrame:
    """The same tracker as a ``transformWithStateInPandas`` stateful
    processor (Spark 4's arbitrary-state API, successor to
    applyInPandasWithState): one ValueState cell per user holding
    (current max, breach count); every micro-batch a user appears in
    re-emits their cumulative row, so the LAST row per user equals the
    batch answer. State is two scalars per key in the state store
    (RocksDB provider required by the API) — bounded forever.

    Ordering contract: in-batch order is pinned to (ts, event_id), but
    CROSS-batch order is whatever the source delivers — n_breaches is
    therefore arrival-order-defined, not event-time-defined. It equals
    the batch twin only when microbatches arrive in event-time order
    (true for the file source over time-contiguous files, and for any
    log-ordered source like Kafka-per-key); an out-of-order source needs
    a watermark + event-time buffer in front of this operator, which
    would trade the bounded two-scalar state for a buffer of in-flight
    rows.

    Environment note: transformWithState's Python state server speaks
    protobuf; containers without ``google.protobuf`` cannot run it (the
    equivalence test importorskips), but the operator itself is complete
    — ``running_user_totals`` (applyInPandasWithState) is the
    protobuf-free stateful alternative this container can execute."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class HighWater(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "hw", "mx double, n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                mx, n = self._state.get()
            else:
                mx, n = None, 0
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"]:
                fv = float(v)
                if mx is None or fv > mx:
                    mx = fv
                    n += 1
            self._state.update((mx, n))
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "high_water": [round(mx, 2)],
                    "n_breaches": [int(n)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        HighWater(),
        outputStructType=_HW_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


_HW_STATE_SCHEMA = StructType(
    [StructField("mx", DoubleType()), StructField("n", LongType())]
)


def high_water_marks_stream_aip(events: DataFrame) -> DataFrame:
    """The high-water-mark tracker on ``applyInPandasWithState`` — the
    protobuf-free stateful API this container can execute (the
    ``transformWithStateInPandas`` twin above needs Spark's Python state
    server, which speaks protobuf). Identical semantics and state size:
    one (current max, breach count) pair per user, every micro-batch a
    user appears in re-emits their cumulative row, so the LAST row per
    user equals the batch answer. The same ordering contract applies:
    in-batch order is pinned to (ts, event_id); cross-batch order is
    arrival order."""

    def update(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        mx, n = state.get if state.exists else (None, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        for v in pdf["value"]:
            fv = float(v)
            if mx is None or fv > mx:
                mx = fv
                n += 1
        state.update((mx, int(n)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "high_water": [round(mx, 2)],
                "n_breaches": [int(n)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_HW_OUTPUT_SCHEMA,
        stateStructType=_HW_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def append_stream_to_table(
    stream_df: DataFrame,
    table,
    *,
    checkpoint_dir: str,
    writer_id: str | None = None,
    timeout_s: int | None = 300,
) -> int:
    """Exactly-once streaming ingest into a snapshot table (the
    Iceberg/Flink sink shape): drain ``stream_df`` with availableNow
    through foreachBatch, committing each microbatch via
    :meth:`IceTable.append_once`. foreachBatch alone is at-least-once —
    a crash between the table commit and Spark's checkpoint commit
    replays the batch — so the batch-id high-water mark stamped inside
    each table commit (snapshot summary + an expiry-surviving table
    property) turns replays into no-ops, making end-to-end delivery
    exactly once. ``writer_id`` defaults to a checkpoint-derived id:
    the SAME checkpoint resumes deduplicated; starting a FRESH
    checkpoint against the same table requires a fresh writer_id (batch
    ids restart at 0 and would otherwise be skipped as replays).
    Returns rows appended this invocation."""
    import hashlib

    wid = writer_id or hashlib.md5(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:8]
    stats = {"rows": 0}

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            n = batch_df.count()
            if n == 0:
                return
            if not table.exists():
                # first batch creates the table, carrying the same
                # idempotency stamp a replay will check
                table.create(
                    batch_df,
                    summary={
                        "stream_writer": wid,
                        "stream_batch_id": str(int(batch_id)),
                    },
                    properties={f"stream.{wid}.high-water": str(int(batch_id))},
                )
                stats["rows"] += n
            elif table.append_once(
                batch_df, writer_id=wid, batch_id=batch_id
            ) is not None:
                stats["rows"] += n
        finally:
            batch_df.unpersist()

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if timeout_s is None:
            q.awaitTermination()
        elif not q.awaitTermination(timeout_s):
            raise TimeoutError(
                f"availableNow ingest did not finish within {timeout_s}s"
            )
    finally:
        q.stop()
    return stats["rows"]

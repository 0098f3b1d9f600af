"""Structured Streaming pipelines (icerunner_spark/streaming): every
streaming run with availableNow over multiple micro-batches must equal
the batch-mode answer on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icerunner_spark.sources.testdata import load_table
from icerunner_spark.streaming import (
    dedup_stream,
    read_events_stream,
    run_available_now,
    running_user_totals,
    session_counts,
    windowed_counts,
)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Split the events fixture into 4 *time-contiguous* parquet files so
    maxFilesPerTrigger=1 forces 4 real micro-batches arriving in event-time
    order (like a real ingest feed). Contiguity matters: the file source
    processes oldest-file-first, so a random split would make later batches
    fall behind the advancing watermark and be dropped as late."""
    import time

    from pyspark.sql import Window

    d = str(tmp_path_factory.mktemp("events_stream") / "events")
    # keep the on-disk long-ns ts column: write from the raw parquet read
    raw = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    quarted = raw.withColumn(
        "__q", F.ntile(4).over(Window.orderBy("ts"))
    )
    for i in range(1, 5):
        quarted.filter(F.col("__q") == i).drop("__q").coalesce(1).write.mode(
            "append"
        ).parquet(d)
        time.sleep(0.05)  # distinct mod-times => deterministic file order
    return d


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, "events", SF_SMALL)


def _rows(df, *key_cols):
    return sorted(
        (tuple(r[c] for c in df.columns) for r in df.collect()),
    )


def _watermark_cutoff(events_batch, watermark_hours=2):
    """Final event-time watermark of an availableNow run: max(ts) minus the
    watermark delay. Append mode only emits windows the watermark closed,
    so batch expectations are filtered to window_end <= cutoff."""
    mx = events_batch.agg(F.max("ts").alias("m")).collect()[0]["m"]
    return mx - __import__("datetime").timedelta(hours=watermark_hours)


def test_windowed_counts_stream_equals_batch(
    spark, events_dir, events_batch, tmp_path
):
    stream = windowed_counts(read_events_stream(spark, events_dir))
    out = str(tmp_path / "win_out")
    run_available_now(stream, out)
    got = spark.read.parquet(out)
    cutoff = _watermark_cutoff(events_batch)
    expect = windowed_counts(events_batch).filter(F.col("window_end") <= cutoff)
    assert _rows(got) == _rows(expect)
    assert got.count() > 100


def test_sliding_window_stream_equals_batch(
    spark, events_dir, events_batch, tmp_path
):
    stream = windowed_counts(
        read_events_stream(spark, events_dir), window="2 hours", slide="1 hour"
    )
    out = str(tmp_path / "slide_out")
    run_available_now(stream, out)
    got = spark.read.parquet(out)
    cutoff = _watermark_cutoff(events_batch)
    expect = windowed_counts(
        events_batch, window="2 hours", slide="1 hour"
    ).filter(F.col("window_end") <= cutoff)
    assert _rows(got) == _rows(expect)


def test_session_counts_stream_equals_batch(
    spark, events_dir, events_batch, tmp_path
):
    stream = session_counts(read_events_stream(spark, events_dir))
    out = str(tmp_path / "sess_out")
    run_available_now(stream, out)
    got = spark.read.parquet(out)
    cutoff = _watermark_cutoff(events_batch)
    expect = session_counts(events_batch).filter(F.col("session_end") <= cutoff)
    assert _rows(got) == _rows(expect)
    # sanity: sessionization produced multiple sessions per user overall
    assert got.count() > got.select("user_id").distinct().count()


def test_dedup_stream_drops_replayed_batch(spark, events_batch, tmp_path):
    """Write the same events twice (two files) -> streaming dedup must
    emit each event_id exactly once."""
    d = str(tmp_path / "dup_events")
    raw = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    raw.coalesce(1).write.mode("append").parquet(d)
    raw.coalesce(1).write.mode("append").parquet(d)
    # watermark must span the replay horizon: the second file replays the
    # whole month, so anything narrower would drop replays as late rather
    # than dedup them out of state.
    stream = dedup_stream(read_events_stream(spark, d), watermark="750 hours")
    out = str(tmp_path / "dedup_out")
    run_available_now(stream, out)
    got = spark.read.parquet(out)
    n = events_batch.count()
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n


def test_dedup_stream_state_partitions_equal_and_restore(
    spark, events_batch, tmp_path, monkeypatch
):
    """state_partitions resizes the state store (r11 optimization: one
    instance per shuffle partition, each paying a task + per-batch commit
    fsync) — the drained output must be IDENTICAL to the default-width
    run, and the session's shuffle-partition conf must be restored."""
    d = str(tmp_path / "dup_events_sp")
    raw = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    raw.coalesce(1).write.mode("append").parquet(d)
    raw.coalesce(1).write.mode("append").parquet(d)
    prev = spark.conf.get("spark.sql.shuffle.partitions")

    def drain(out, n_parts):
        stream = dedup_stream(
            read_events_stream(spark, d), watermark="750 hours"
        )
        run_available_now(stream, out, state_partitions=n_parts)
        return spark.read.parquet(out)

    wide = drain(str(tmp_path / "dedup_wide"), None)
    narrow = drain(str(tmp_path / "dedup_narrow"), 5)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    assert _rows(narrow) == _rows(wide)
    assert narrow.count() == events_batch.count()
    from icerunner_spark.streaming import stream_state_partitions

    # pin the env var so an ambient ICERUNNER_STREAM_STATE_PARTITIONS in
    # the test environment cannot fail this equivalence test (ADVICE r11)
    monkeypatch.delenv("ICERUNNER_STREAM_STATE_PARTITIONS", raising=False)
    assert stream_state_partitions() == 8  # the documented default
    monkeypatch.setenv("ICERUNNER_STREAM_STATE_PARTITIONS", "3")
    assert stream_state_partitions() == 3
    monkeypatch.setenv("ICERUNNER_STREAM_STATE_PARTITIONS", "0")
    with pytest.raises(ValueError, match="ICERUNNER_STREAM_STATE_PARTITIONS"):
        stream_state_partitions()
    monkeypatch.setenv("ICERUNNER_STREAM_STATE_PARTITIONS", "bogus")
    with pytest.raises(ValueError, match="positive integer"):
        stream_state_partitions()


def test_running_user_totals_stateful(spark, events_dir, events_batch, tmp_path):
    """applyInPandasWithState: the LAST emitted row per user (update mode,
    cumulative state) must equal the batch per-user aggregate."""
    stream = running_user_totals(read_events_stream(spark, events_dir))
    out = str(tmp_path / "totals_out")
    run_available_now(stream, out, output_mode="update")
    emitted = spark.read.parquet(f"{out}/data")
    # update-mode parquet sink appends every re-emission; the max
    # n_events row per user is the final state.
    final = emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
    )
    expect = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    assert _rows(final) == _rows(expect)
    # multiple micro-batches really happened: users re-emitted
    assert emitted.count() > final.count()


def test_stream_stream_join_equals_batch(spark, events_dir, events_batch, tmp_path):
    """Stream-stream interval self-join (views -> purchases within 1 h)
    must emit exactly the batch join's matches: the 1 h horizon sits
    inside the 2 h watermark, so no match is lost to state eviction."""
    from icerunner_spark.streaming import view_purchase_attribution

    stream = view_purchase_attribution(read_events_stream(spark, events_dir))
    out = str(tmp_path / "ssj_out")
    run_available_now(stream, out)
    got = spark.read.parquet(out)
    expect = view_purchase_attribution(events_batch)
    assert _rows(got) == _rows(expect)
    assert got.count() > 0


@pytest.fixture(scope="module")
def documents_dir(spark, tmp_path_factory):
    """Documents fixture split into 3 parquet files — a stand-in for a
    continuously-arriving crawl feed (no event time: the clean stage is
    stateless, so arrival order is irrelevant)."""
    d = str(tmp_path_factory.mktemp("docs_stream") / "documents")
    import time

    raw = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    for i in range(3):
        raw.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        time.sleep(0.05)
    return d


def test_clean_documents_stream_equals_batch(spark, documents_dir, tmp_path):
    from icerunner_spark.streaming.pipeline import (
        clean_documents,
        read_documents_stream,
    )

    stream = clean_documents(read_documents_stream(spark, documents_dir))
    out = str(tmp_path / "clean_out")
    run_available_now(stream, out)
    got = spark.read.parquet(out)
    expect = clean_documents(spark.read.parquet(documents_dir))
    assert _rows(got) == _rows(expect)
    assert 0 < got.count() < spark.read.parquet(documents_dir).count()


def test_high_water_marks_stream_equals_batch(spark, events_dir, events_batch, tmp_path):
    """Stateful high-water tracker: the LAST emitted row per user after a
    multi-micro-batch availableNow run equals the batch window
    computation. Runs on transformWithStateInPandas where the protobuf
    state server exists; its Python state-server protocol is
    protobuf-based, so containers without google.protobuf prove the same
    equivalence through the applyInPandasWithState twin (identical
    semantics and state shape) instead of skipping."""
    import importlib.util

    from icerunner_spark.streaming import (
        high_water_marks,
        high_water_marks_stream,
        high_water_marks_stream_aip,
    )

    try:
        # find_spec("google.protobuf") raises when the parent "google"
        # namespace package itself is absent
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_protobuf = False
    if has_protobuf:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    try:
        out = str(tmp_path / "hw_out")
        if has_protobuf:
            stream = high_water_marks_stream(read_events_stream(spark, events_dir))
            run_available_now(stream, out)
            got = spark.read.parquet(out)
        else:
            stream = high_water_marks_stream_aip(
                read_events_stream(spark, events_dir)
            )
            run_available_now(stream, out, output_mode="update")
            got = spark.read.parquet(f"{out}/data")
        # rows accumulate one per (user, appearing micro-batch); totals are
        # nondecreasing, so the final state is the per-user max
        final = got.groupBy("user_id").agg(
            F.max("high_water").alias("high_water"),
            F.max("n_breaches").alias("n_breaches"),
        )
        expect = high_water_marks(events_batch)
        assert _rows(final) == _rows(expect)
        # multiple micro-batches really happened for at least some users
        assert got.count() > final.count()
    finally:
        if has_protobuf:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_high_water_marks_stream_aip_equals_batch(
    spark, events_dir, events_batch, tmp_path
):
    """applyInPandasWithState twin of the high-water tracker: runs in
    this container (no protobuf state server), so the batch<->stream
    equivalence is proven HERE rather than importorskipped with the
    transformWithStateInPandas variant."""
    from icerunner_spark.streaming import (
        high_water_marks,
        high_water_marks_stream_aip,
    )

    stream = high_water_marks_stream_aip(read_events_stream(spark, events_dir))
    out = str(tmp_path / "hw_aip_out")
    run_available_now(stream, out, output_mode="update")
    got = spark.read.parquet(f"{out}/data")
    final = got.groupBy("user_id").agg(
        F.max("high_water").alias("high_water"),
        F.max("n_breaches").alias("n_breaches"),
    )
    expect = high_water_marks(events_batch)
    assert _rows(final) == _rows(expect)
    # multiple micro-batches really happened for at least some users
    assert got.count() > final.count()

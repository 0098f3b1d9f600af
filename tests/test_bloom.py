"""Per-file bloom filters (write.bloom.columns): planning-time equality
skipping where min/max bounds can't help, with exactness preserved and
conservative behavior everywhere the hash contract could break."""

from __future__ import annotations

from pyspark.sql import functions as F

from icerunner_spark.table import IceTable


def _interleaved(spark, n=4000):
    """Keys 0..n-1 with payload, one partition per write: slicing by
    k % 4 then makes every commit ONE file spanning [i, n-4+i] — min/max
    bounds overlap on all files, so any observed skipping is the
    bloom's. (Without the repartition, spark.range's contiguous id
    ranges per task give each file disjoint bounds and the min/max
    stats prune on their own.)"""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("p-"), F.col("id")).alias("payload"),
        )
        .repartition(1)
    )


def _bloom_table(spark, path, df, slices=4, **props):
    t = IceTable(spark, path)
    base = {"write.bloom.columns": "k", "write.bloom.nbits": "16384"}
    base.update(props)
    t.create(df.filter(F.col("k") % slices == 0), properties=base)
    for i in range(1, slices):
        t.append(df.filter(F.col("k") % slices == i))
    return t


def test_bloom_skips_files_minmax_cannot(spark, warehouse):
    df = _interleaved(spark)
    t = _bloom_table(spark, warehouse + "/b", df)
    n_files = len(t.current_snapshot().manifest)
    assert n_files >= 4

    # single-key probe: only the commit holding k=42 (42 % 4 == 2) may
    # survive; FP odds at this load factor are ~0
    planned = t.plan_files([("k", "=", 42)])
    assert len(planned) < n_files
    assert len(planned) >= 1
    got = t.scan(where=[("k", "=", 42)]).collect()
    assert [(r["k"], r["payload"]) for r in got] == [(42, "p-42")]

    # IN probe across two commits keeps at most those two commits' files
    planned_in = t.plan_files([("k", "in", [1, 2])])
    assert 1 <= len(planned_in) < n_files
    assert t.scan(where=[("k", "in", [1, 2])]).count() == 2

    # absent key: every file's bloom rejects it — zero planned files,
    # empty exact result
    assert t.plan_files([("k", "=", 999_999)]) == []
    assert t.scan(where=[("k", "=", 999_999)]).count() == 0

    # a twin without blooms cannot skip anything on this layout
    t2 = IceTable(spark, warehouse + "/nb")
    t2.create(df.filter(F.col("k") % 4 == 0))
    for i in range(1, 4):
        t2.append(df.filter(F.col("k") % 4 == i))
    assert len(t2.plan_files([("k", "=", 42)])) == len(
        t2.current_snapshot().manifest
    )


def test_bloom_string_column(spark, warehouse):
    # string keys hash through the UTF-8 path; single-file commits so
    # lexicographic min/max can't skip by itself
    df = (
        spark.range(1000)
        .select(
            F.concat(F.lit("doc-"), F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        .repartition(1)
    )
    t = IceTable(spark, warehouse + "/s")
    t.create(
        df.filter(F.col("v") % 2 == 0),
        properties={"write.bloom.columns": "k", "write.bloom.nbits": "16384"},
    )
    t.append(df.filter(F.col("v") % 2 == 1))
    n_files = len(t.current_snapshot().manifest)
    planned = t.plan_files([("k", "=", "doc-7")])
    assert len(planned) < n_files
    assert t.scan(where=[("k", "=", "doc-7")]).count() == 1
    assert t.plan_files([("k", "=", "doc-nope")]) == []


def test_bloom_survives_rename(spark, warehouse):
    t = _bloom_table(spark, warehouse + "/r", _interleaved(spark, 1000))
    t.rename_column("k", "key_id")
    n_files = len(t.current_snapshot().manifest)
    planned = t.plan_files([("key_id", "=", 37)])
    assert len(planned) < n_files
    assert t.scan(where=[("key_id", "=", 37)]).count() == 1


def test_bloom_conservative_after_widen(spark, warehouse):
    df = (
        spark.range(500)
        .select(F.col("id").cast("int").alias("k"), F.col("id").alias("v"))
        .repartition(1)  # overlapping bounds: only the bloom can skip
    )
    t = _bloom_table(spark, warehouse + "/w", df, slices=2)
    assert len(t.plan_files([("k", "=", 3)])) < len(t.current_snapshot().manifest)
    t.widen_column("k", "long")
    # int-written blooms hash 4-byte; a long literal hashes 8-byte —
    # the type tag mismatch disables skipping instead of mis-pruning
    assert len(t.plan_files([("k", "=", 3)])) == len(
        t.current_snapshot().manifest
    )
    assert t.scan(where=[("k", "=", 3)]).count() == 1


def test_set_properties_enables_bloom_for_future_writes(spark, warehouse):
    df = _interleaved(spark, 1000)
    t = IceTable(spark, warehouse + "/p")
    t.create(df.filter(F.col("k") % 2 == 0))  # no blooms
    t.set_properties(
        {"write.bloom.columns": "k", "write.bloom.nbits": "16384"}
    )
    assert t.properties()["write.bloom.columns"] == "k"
    t.append(df.filter(F.col("k") % 2 == 1))
    manifest = t.current_snapshot().manifest
    # k=1 is odd -> lives in the bloomed append; the pre-bloom create
    # files can never be skipped (conservative), the append's CAN
    planned = t.plan_files([("k", "=", 2)])  # even key: append files drop
    old_files = [f for f in manifest if f not in planned]
    assert old_files, "bloomed append files were not skipped"
    assert t.scan(where=[("k", "=", 2)]).count() == 1
    # the alter snapshot doesn't break append-only CDC
    s0 = t.snapshots()[0].snapshot_id
    assert t.scan_changes(s0).count() == 500


def test_bloom_rebuilt_by_compact(spark, warehouse):
    t = _bloom_table(spark, warehouse + "/c", _interleaved(spark, 1000))
    t.compact(target_file_rows=400)
    # rewritten files carry fresh sidecars under the inherited props
    assert t.plan_files([("k", "=", 999_999)]) == []
    assert t.scan(where=[("k", "=", 123)]).count() == 1


def test_bloom_positions_numpy_python_equivalence():
    """The write side computes probe positions vectorized in numpy; the
    prune side recomputes them in pure Python. They must agree for any
    signed-64 hash, or a skip could be a silent wrong answer."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from icerunner_spark.table import _bloom_positions_py

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.sampled_from([1 << 10, 1 << 14, 1 << 20]),
    )
    def check(h, nbits):
        k = 7
        hn = np.asarray([h], dtype=np.int64).astype(np.uint64)
        lo = hn & np.uint64(0xFFFFFFFF)
        hi = (hn >> np.uint64(32)) | np.uint64(1)
        np_pos = [
            int(((lo + np.uint64(j) * hi) % np.uint64(nbits)).astype(np.int64)[0])
            for j in range(k)
        ]
        assert np_pos == _bloom_positions_py(h, nbits, k)

    check()


def test_bloom_no_false_negatives_property(spark, warehouse):
    """Every value actually written must hit its file's bloom — a false
    negative is a wrong answer, not a perf miss."""
    from icerunner_spark.table import (
        IceTable,
        _bloom_may_contain,
        _commit_dir_of,
        _spark_xxhash64,
    )

    df = spark.range(997).select(F.col("id").alias("k")).repartition(1)
    t = IceTable(spark, warehouse + "/fn")
    t.create(df, properties={"write.bloom.columns": "k", "write.bloom.nbits": "16384"})
    snap = t.current_snapshot()
    [rel] = snap.manifest
    ent = t._bloom_entry(snap, _commit_dir_of(rel), rel, "k")
    assert ent is not None
    dt = t.schema()["k"].dataType
    for v in range(997):
        h = _spark_xxhash64(v, dt)
        assert _bloom_may_contain(ent["_bits"], ent["nbits"], ent["k"], h), v

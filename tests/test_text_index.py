"""Incremental BM25 index (operators.text_index): exactness vs a full
rebuild, crash-replay idempotency, and planning-time term-probe pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from icerunner_spark.catalog import Catalog
from icerunner_spark.operators.text_index import IncrementalBm25Index
from icerunner_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"
TERMS = ("join", "hash", "scan")


def _base(spark, warehouse, name):
    cat = Catalog(spark, warehouse)
    t = cat.table(name)
    d = load_table(spark, "documents", SF).select("doc_id", "text")
    t.create(d.filter(F.col("doc_id") % 3 != 2))
    return t, d


def _result(df):
    return [(r["doc_id"], r["bm25"]) for r in df.collect()]


def test_refreshed_index_equals_full_rebuild(spark, warehouse):
    t, d = _base(spark, warehouse, "bm25_base")
    idx = IncrementalBm25Index(t, os.path.join(warehouse, "idx"))
    idx.build()
    t.append(d.filter(F.col("doc_id") % 3 == 2))
    t.delete_where("doc_id % 5 = 0", mode="merge-on-read")
    idx.refresh()
    assert idx.refresh() is None  # already current
    # a from-scratch index over the same final state must agree exactly
    rebuilt = IncrementalBm25Index(t, os.path.join(warehouse, "idx2"))
    rebuilt.build()
    assert _result(idx.query(TERMS, k=20)) == _result(rebuilt.query(TERMS, k=20))
    # and the underlying tables hold the same row multisets
    for a, b in ((idx.postings, rebuilt.postings), (idx.doclens, rebuilt.doclens)):
        ra = sorted(map(tuple, a.scan().collect()))
        rb = sorted(map(tuple, b.scan().collect()))
        assert ra == rb


def test_refresh_zero_token_docs_still_count_in_doclens(spark, warehouse):
    """An arrival batch whose docs all tokenize to zero tokens has no
    postings rows but MUST still land in doclens (dl=0 affects
    n_docs/avgdl) — the appends gate independently, preserving
    rebuild-equality."""
    t, _ = _base(spark, warehouse, "bm25_zero")
    idx = IncrementalBm25Index(t, os.path.join(warehouse, "idx_zero"))
    idx.build()
    t.append(t.spark.createDataFrame(
        [(900001, "   "), (900002, "")], "doc_id long, text string",
    ))
    idx.refresh()
    rebuilt = IncrementalBm25Index(t, os.path.join(warehouse, "idx_zero2"))
    rebuilt.build()
    assert idx.doclens.scan().count() == rebuilt.doclens.scan().count()
    assert (
        idx.doclens.scan(where=[("doc_id", ">=", 900001)]).count() == 2
    )
    assert _result(idx.query(TERMS, k=20)) == _result(rebuilt.query(TERMS, k=20))


def test_refresh_crash_replay_is_idempotent(spark, warehouse):
    """A crash between the delta application and the cursor commit
    replays the WHOLE delta; re-deleting the same keys and re-appending
    the same rows must land in the identical state."""
    t, d = _base(spark, warehouse, "bm25_replay")
    idx = IncrementalBm25Index(t, os.path.join(warehouse, "idx"))
    idx.build()
    old_cursor = idx.cursor()
    t.append(d.filter(F.col("doc_id") % 3 == 2))
    t.delete_where("doc_id % 7 = 1", mode="merge-on-read")
    idx.refresh()
    want = _result(idx.query(TERMS, k=20))
    # simulate the crash: roll the cursor back and replay the delta
    idx.postings.set_properties({"bm25.cursor": str(old_cursor)})
    idx.refresh()
    assert _result(idx.query(TERMS, k=20)) == want
    rows = idx.doclens.scan().groupBy("doc_id").count()
    assert rows.filter(F.col("count") > 1).count() == 0  # no duplicates


def test_term_probe_prunes_posting_partitions(spark, warehouse):
    """The bucket(term) spec prunes non-matching partition dirs for a
    term-IN probe at PLANNING time — the property that makes a keyword
    query O(matching postings) instead of O(index)."""
    t, _ = _base(spark, warehouse, "bm25_prune")
    idx = IncrementalBm25Index(t, os.path.join(warehouse, "idx"))
    idx.build()
    rep = idx.postings.explain_scan([("term", "in", list(TERMS))])
    assert rep["read_files"] < rep["total_files"]
    assert rep["skipped"].get("transform", 0) > 0


def test_catalog_rename_table(spark, warehouse):
    cat = Catalog(spark, warehouse)
    t = cat.table("orig")
    t.create(spark.createDataFrame([(1, "a")], "id long, v string"))
    assert cat.rename_table("orig", "renamed") is True
    assert not cat.table_exists("orig")
    got = cat.table("renamed").scan().collect()
    assert [(r["id"], r["v"]) for r in got] == [(1, "a")]
    # time travel still works through the relative-path metadata
    snaps = cat.table("renamed").snapshots()
    assert cat.table("renamed").scan(snapshot_id=snaps[0].snapshot_id).count() == 1
    assert cat.rename_table("missing", "x") is False
    cat.table("other").create(spark.createDataFrame([(2,)], "id long"))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cat.rename_table("renamed", "other")

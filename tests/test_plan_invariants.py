"""Global physical-plan invariants over the ENTIRE query registry.

Three rules every registered query must satisfy to be 100 TB-safe:

1. **No row-at-a-time Python.** ``BatchEvalPython`` (the classic pickled
   per-row UDF operator) must never appear — Python is allowed only
   through Arrow-vectorized operators (ArrowEvalPython, MapInPandas,
   FlatMapGroupsInPandas, MapInArrow, PythonUDTF).
2. **No cartesian products.** Every join must carry a key (equi or
   broadcastable theta); an accidental cross join is quadratic at scale.
3. **Column pruning reaches wide fact scans.** Any query touching
   ``lineitem`` (16 columns) must scan a strict subset of its columns —
   a scan that reads all 16 for a narrower projection means pruning
   broke somewhere above it.

Plans are inspected unexecuted (cheap); this is the regression net that
catches a future edit quietly de-optimizing one of the ~60 queries.
"""

from __future__ import annotations

import pytest

from icerunner_spark import queries as q
from icerunner_spark.plans.introspect import forced_broadcast_tables, plan_report

SF_DIR = "/root/testdata/sf0.001"

ALL = sorted(q.queries().keys())

N_LINEITEM_COLS = 16


@pytest.fixture(scope="module")
def reports(spark):
    out = {}
    for name in ALL:
        df = q.queries()[name](spark, SF_DIR)
        out[name] = plan_report(df)
    return out


def test_no_row_at_a_time_python(reports):
    offenders = [n for n, r in reports.items() if "BatchEvalPython" in r.text]
    assert not offenders, f"row-at-a-time Python UDFs in: {offenders}"


def test_no_cartesian_products(reports):
    offenders = [n for n, r in reports.items() if "CartesianProduct" in r.text]
    assert not offenders, f"cartesian products in: {offenders}"


def test_lineitem_scans_are_column_pruned(reports):
    offenders = []
    for name, r in reports.items():
        for s in r.scans:
            if "lineitem" in s.location and len(s.read_columns) >= N_LINEITEM_COLS:
                offenders.append((name, len(s.read_columns)))
    assert not offenders, f"unpruned lineitem scans: {offenders}"


def test_every_query_plans(reports):
    # building the report implies analysis+optimization succeeded
    assert len(reports) == len(ALL)

# Tables whose size is proportional to the scale factor: forcing these
# into a BroadcastExchange is a driver OOM at the 100 TB design point.
# Constant-size dims (nation=25 rows, region=5) and bounded derivations
# (scalar aggregates, top-k seeds) may broadcast freely.
SF_PROPORTIONAL = {
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
}


def test_no_forced_broadcast_of_sf_proportional_tables(spark, reports):
    """With autoBroadcastJoinThreshold=-1 the static plan contains a
    BroadcastExchange ONLY where an explicit hint forced one — so any
    SF-proportional table scanned un-bounded beneath one is a hint that
    would OOM at scale (AQE converting a small side at runtime is fine
    and invisible to this check).

    Reconstruction under -1 is limited to queries whose DEFAULT plan
    (the already-built ``reports`` fixture) contains a BroadcastExchange
    at all: a hint overrides the threshold, so a hinted broadcast always
    materializes under the default conf too — a broadcast-free default
    plan cannot hide one. Re-running every query function was the
    suite's second-largest cost (r11 verdict item 7: the driver's pytest
    timed out mid-suite), and the demo-table setups inside the query
    functions dominate it."""
    candidates = [n for n in ALL if "BroadcastExchange" in reports[n].text]
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    offenders = {}
    try:
        for name in candidates:
            df = q.queries()[name](spark, SF_DIR)
            bad = forced_broadcast_tables(df) & SF_PROPORTIONAL
            if bad:
                offenders[name] = sorted(bad)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert not offenders, f"forced broadcasts of SF-proportional tables: {offenders}"

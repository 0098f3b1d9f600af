"""Dynamic file pruning (operators.dfp): dim-driven fact-file skipping.

Pins the three contracts that make DFP safe to rely on at scale:
(a) files are actually skipped (planned < manifest) on both the IN path
and the min/max fallback path, (b) the pruned join is value-identical to
the unpruned join on every path — pruning is a pure IO optimization,
(c) unsound flavors (outer joins) are refused.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icerunner_spark.catalog import Catalog
from icerunner_spark.operators.dfp import (
    dim_join_predicates,
    dynamic_pruned_join,
)


@pytest.fixture()
def fact_table(spark, warehouse):
    """A fact table in three commits over disjoint k ranges: [0,100),
    [100,200), [200,300) — the key-ordered ingest DFP thrives on."""
    t = Catalog(spark, warehouse).table("fact")
    base = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t.create(base.filter(F.col("k") < 100).coalesce(1))
    t.append(
        base.filter((F.col("k") >= 100) & (F.col("k") < 200)).coalesce(1)
    )
    t.append(base.filter(F.col("k") >= 200).coalesce(1))
    return t


def _dim(spark, keys):
    return spark.createDataFrame(
        [(int(k), f"d{k}") for k in keys], "dk: long, label: string"
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestDimJoinPredicates:
    def test_in_path_under_cap(self, spark):
        preds = dim_join_predicates(
            _dim(spark, [5, 7, 7, 9]), "dk", "k", max_keys=10
        )
        assert preds == [("k", "in", [5, 7, 9])]

    def test_range_fallback_over_cap(self, spark):
        preds = dim_join_predicates(
            _dim(spark, range(20)), "dk", "k", max_keys=5
        )
        assert preds == [("k", ">=", 0), ("k", "<=", 19)]

    def test_null_keys_dropped(self, spark):
        dim = spark.createDataFrame(
            [(None, "x"), (3, "y")], "dk: long, label: string"
        )
        assert dim_join_predicates(dim, "dk", "k", max_keys=10) == [
            ("k", "in", [3])
        ]


class TestDynamicPrunedJoin:
    def test_in_path_skips_and_matches_unpruned(self, spark, fact_table):
        dim = _dim(spark, [10, 20, 250])
        preds = dim_join_predicates(dim, "dk", "k")
        planned = fact_table.plan_files(preds)
        assert len(planned) == 2  # middle commit's file skipped
        assert len(planned) < len(fact_table.current_snapshot().manifest)
        got = dynamic_pruned_join(fact_table, "k", dim, "dk")
        full = fact_table.scan()
        want = full.join(dim, full["k"] == dim["dk"])
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.count() == 3

    def test_range_path_skips_and_matches_unpruned(self, spark, fact_table):
        dim = _dim(spark, range(200, 230))
        preds = dim_join_predicates(dim, "dk", "k", max_keys=5)
        assert preds[0][1] == ">="  # fallback path taken
        planned = fact_table.plan_files(preds)
        assert len(planned) == 1  # only the [200,300) commit survives
        got = dynamic_pruned_join(fact_table, "k", dim, "dk", max_keys=5)
        full = fact_table.scan()
        want = full.join(dim, full["k"] == dim["dk"])
        assert _sorted_rows(got) == _sorted_rows(want)
        assert got.count() == 30

    def test_semi_join_keeps_fact_columns_only(self, spark, fact_table):
        dim = _dim(spark, [150, 151])
        got = dynamic_pruned_join(fact_table, "k", dim, "dk", how="semi")
        assert got.columns == ["k", "v"]
        assert _sorted_rows(got) == [(150, 300), (151, 302)]

    def test_empty_dim_is_empty_join(self, spark, fact_table):
        dim = _dim(spark, []).filter(F.lit(False))
        got = dynamic_pruned_join(fact_table, "k", dim, "dk")
        assert got.count() == 0

    def test_outer_join_refused(self, spark, fact_table):
        with pytest.raises(ValueError, match="unsound"):
            dynamic_pruned_join(
                fact_table, "k", _dim(spark, [1]), "dk", how="left"
            )

    def test_prune_respects_snapshot_id(self, spark, fact_table):
        first = fact_table.snapshots()[0].snapshot_id
        dim = _dim(spark, [10, 250])  # 250 doesn't exist at snapshot 1
        got = dynamic_pruned_join(
            fact_table, "k", dim, "dk", snapshot_id=first
        )
        assert _sorted_rows(got) == [(10, 20, 10, "d10")]

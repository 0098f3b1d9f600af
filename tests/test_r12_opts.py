"""Round-12 optimization gates (r11 verdict items 2 and 3).

Two scale-safety gates, both of which must be INVISIBLE in results:

- ``queries._spread_if_narrow``: the fixture-parallelism spreads
  (pii_redact / decontam_eval / url_canonical) must still fire on the
  single-row-group fixtures but be SKIPPED when the input scan already
  carries >= cores partitions — an unconditional spread of a
  (doc_id, text) projection is a corpus-sized exchange at 100 TB.
- ``table._materialize_if_costly``: the merge paths' eager
  localCheckpoints must fire only for non-trivial lineages (joins,
  aggregates, ...); a filter-shaped delta is cheaper to recompute than
  to materialize, and eagerly pinning a scan-shaped frame is unbounded.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from icerunner_spark.queries import _spread_if_narrow, queries
from icerunner_spark.table import _materialize_if_costly

SF_SMALL = "/root/testdata/sf0.001"


def _docs_like(spark, n_partitions: int):
    return (
        spark.range(0, 200, 1, n_partitions)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text "), F.col("id")).alias("text"),
        )
    )


def test_spread_fires_on_narrow_input(spark):
    cores = spark.sparkContext.defaultParallelism
    narrow = _docs_like(spark, 1)
    out = _spread_if_narrow(narrow, "doc_id")
    assert out is not narrow
    assert out.rdd.getNumPartitions() == cores
    # keyed, not round-robin: no sortBeforeRepartition surprise
    assert "RepartitionByExpression" in out._jdf.queryExecution().optimizedPlan().toString()


def test_spread_skipped_on_wide_input(spark):
    cores = spark.sparkContext.defaultParallelism
    wide = _docs_like(spark, cores + 2)
    out = _spread_if_narrow(wide, "doc_id")
    assert out is wide  # untouched plan: no exchange exists to pay


def test_spread_results_identical_both_ways(spark):
    narrow = _docs_like(spark, 1)
    spread = _spread_if_narrow(narrow, "doc_id")
    a = sorted(tuple(r) for r in narrow.collect())
    b = sorted(tuple(r) for r in spread.collect())
    assert a == b


def test_fixture_queries_still_spread(spark):
    """At the sf fixtures (single-row-group parquet, scans as ONE task)
    the gated spread must still be in the plan — the r11 win stays."""
    for name in ("pii_redact_documents", "decontam_eval_containment",
                 "url_canonical_dedup"):
        df = queries()[name](spark, SF_SMALL)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "RepartitionByExpression" in plan, f"{name} lost its spread"


def test_materialize_skips_trivial_lineage(spark):
    trivial = _docs_like(spark, 2).where(F.col("doc_id") % 7 == 0)
    out = _materialize_if_costly(trivial)
    assert out is trivial  # scan/filter/project: recompute, don't pin


def test_materialize_fires_on_costly_lineage(spark):
    base = _docs_like(spark, 2)
    agg = base.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    out = _materialize_if_costly(agg)
    assert out is not agg
    assert "LogicalRDD" in out._jdf.queryExecution().optimizedPlan().toString()
    joined = base.join(base.select("doc_id"), "doc_id")
    assert _materialize_if_costly(joined) is not joined


def test_merge_results_unchanged_by_gate(spark, tmp_path):
    """A trivial-lineage MOR merge (the gated-away checkpoint) must
    produce exactly the rows the table semantics promise."""
    from icerunner_spark.table import IceTable

    t = IceTable(spark, str(tmp_path / "gate_merge"))
    base = _docs_like(spark, 2).withColumn("v", F.lit(1))
    t.create(base)
    upd = (
        _docs_like(spark, 2)
        .where(F.col("doc_id") % 10 == 0)
        .withColumn("v", F.lit(2))
    )
    t.merge(upd, ["doc_id"], mode="merge-on-read")
    got = {(r["doc_id"], r["v"]) for r in t.scan().select("doc_id", "v").collect()}
    expect = {
        (i, 2 if i % 10 == 0 else 1) for i in range(0, 200)
    }
    assert got == expect


def _expr_hashed_sets(df, shingle):
    from icerunner_spark.functions.text import char_ngrams, normalize_ws

    return (
        df.repartition(4, "doc_id")
        .select(
            F.col("doc_id").cast("long").alias("id"),
            normalize_ws("text").alias("__norm"),
        )
        .select(
            "id",
            F.array_distinct(
                char_ngrams(F.col("__norm"), shingle, normalized=True)
            ).alias("g"),
        )
        .select(
            "id",
            F.array_distinct(F.transform("g", lambda x: F.xxhash64(x))).alias("g"),
        )
    )


def _edge_docs(spark):
    rows = [
        (1, "ab"),                   # shorter than the shingle
        (2, ""),                     # empty -> one gram, the empty string
        (3, None),                   # null -> {42} (xxhash64(null) = seed)
        (4, "héllo wörld — non-ascii fallback päth"),
        (5, "aaaaaaaaaa"),           # one distinct gram
        (6, "hello world hello world"),  # duplicate grams collapse
        (7, "plain ascii body long enough for several grams"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_arrow_gram_kernel_matches_xxhash64_expressions(spark):
    """r12 mapInArrow gram kernel: EXACT F.xxhash64 parity (not merely
    injective) on fixture docs and every edge shape — short, empty,
    null, non-ascii, duplicate-gram."""
    from icerunner_spark.operators.dedup import ngram_sets
    from icerunner_spark.sources.testdata import load_table

    for df in (_edge_docs(spark), load_table(spark, "documents", SF_SMALL)):
        for n in (4, 5):
            new = {
                r["id"]: frozenset(r["g"])
                for r in ngram_sets(df, "doc_id", "text", shingle=n, hashed=True).collect()
            }
            ref = {
                r["id"]: frozenset(r["g"])
                for r in _expr_hashed_sets(df, n).collect()
            }
            assert new == ref
            # the expr engine (ngram_jaccard_pairs' path) agrees too
            expr = {
                r["id"]: frozenset(r["g"])
                for r in ngram_sets(
                    df, "doc_id", "text", shingle=n, hashed=True, engine="expr"
                ).collect()
            }
            assert expr == ref


def test_arrow_sig_kernel_matches_xxhash64_expressions(spark):
    """r12 mapInArrow signature kernel: min over xxhash64(gram, lit(s))
    is bit-identical to the explode + k-min-aggregate formulation."""
    from icerunner_spark.operators.dedup import (
        minhash_signatures_from_grams,
        ngram_sets,
    )

    grams = ngram_sets(
        _edge_docs(spark), "doc_id", "text", shingle=5, hashed=True
    ).cache()
    new = {
        r["id"]: tuple(r["sig"])
        for r in minhash_signatures_from_grams(grams, n_hashes=48).collect()
    }
    ex = grams.select("id", F.explode("g").alias("gram"))
    mins = ex.groupBy("id").agg(
        *[F.min(F.xxhash64("gram", F.lit(s))).alias(f"m{s}") for s in range(48)]
    )
    ref = {
        r["id"]: tuple(r[f"m{s}"] for s in range(48)) for r in mins.collect()
    }
    grams.unpersist()
    assert new == ref


def test_update_where_mor_unpins_cache(spark, tmp_path):
    """update_where(merge-on-read) persists the matched scan for its two
    writes and must release it before returning (no storage leak), while
    producing the same rows as before."""
    from icerunner_spark.table import IceTable

    t = IceTable(spark, str(tmp_path / "gate_update"))
    t.create(_docs_like(spark, 2).withColumn("v", F.lit(1)))
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getRDDStorageInfo()
    t.update_where("doc_id % 5 = 0", {"v": "v + 41"}, mode="merge-on-read")
    after = jsc.getRDDStorageInfo()
    assert len(after) == len(before), "matched-scan cache leaked"
    got = {(r["doc_id"], r["v"]) for r in t.scan().select("doc_id", "v").collect()}
    expect = {(i, 42 if i % 5 == 0 else 1) for i in range(0, 200)}
    assert got == expect

"""Query corpus: the engine's operator surface as (Spark query, DuckDB oracle) pairs.

This is the delegated-SQL surface the reference exposes through its
``sql()`` passthrough (icerunner.py:200-207; SURVEY.md §2.B) plus the
native CDC operator (§2.A#12) plus the training-data-pipeline extensions
(§2.C): every category gets at least one named query, implemented with the
DataFrame API (Catalyst picks the physical plan) and mirrored by an ANSI
oracle for the driver's DuckDB hash-compare.

Cross-engine determinism rules used throughout:
- every computed column is aliased identically in both versions;
- double aggregates are ``round()``-ed (sums to 2dp, avgs/ratios to 6dp)
  so FP association-order noise can't flip the hash;
- top-k selections are tie-broken by a unique key;
- float arrays are cast to double *before* any arithmetic on both sides.

Scale notes are inline per query (what broadcasts, what shuffles, what
pushes down).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icerunner_spark.functions.vector import cosine_similarity
from icerunner_spark.functions.text import token_count
from icerunner_spark.sources.testdata import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness harness checks the FIRST 50 registry entries
# (insertion order). ROTATION POLICY (pinned, r6 verdict item 6): every
# round the window is 33 STALEST names — never-driver-checked first,
# then ascending by the round of their most recent CORRECTNESS row,
# alphabetical within a round — plus 17 proven KEEPERS spanning every
# operator family. With ~158 registry names this re-earns every query a
# driver row at least every ~4 rounds, so a silent regression in an
# unrotated query cannot hide indefinitely. Recompute the stalest list
# each round from CORRECTNESS_r*.json:
#   latest[name] = max round containing name; sort by (latest, name).
# Round 7: 4 never-checked (multimodal decode/resize/audio/video) +
# the 11 r2-latest + 14 r3-latest + 4 oldest r4-latest names.
# Round 8 (r7 verdict item 1): the remaining r4 cohort was exactly 40
# names — the window took ALL of them, so post-r8 no name's newest
# driver row was older than r5.
# Round 9 (r8 verdict item 1): head = the 2 never-driver-checked names
# added after the r8 window was fixed (iceberg_incremental_mirror,
# leakage_safe_split_documents), then the full 38-name r5-stale cohort
# (recomputed from CORRECTNESS_r01..r08: Counter{r8:50, r7:41, r6:33,
# r5:38}); post-r9 no name's newest driver row is older than r6.
# Keepers: 10, one per operator family.
# Round 10 window head (pinned now, per the same policy): the names
# added AFTER this window was fixed — iceberg_eq_delete_import (late
# r9-prep), then mid-r9 pagerank_order_graph, ridge_quality_fit,
# stream_dedup_watermark, tfidf_top_terms, ewma_anomaly_events,
# neardup_prefix_filter, iceberg_pruned_import,
# frequent_tokens_documents, iceberg_changes_import, plus the late-r9
# additions temperature_sampled_mixture, url_canonical_dedup,
# image_dhash_neardup, audio_fingerprint_neardup, zorder_compact_scan,
# iceberg_eq_delete_export, and mid-r9 hard_negative_mining and
# source_overlap_matrix —
# are never-driver-checked and must lead the r10 rotation, followed by
# the r6-stale cohort.
# Round 10 (r9 verdict item 1): rotated via `window_policy.py --propose`
# — head = the 18 never-driver-checked r9 names (alphabetical), then 22
# of the 40-name r6-stale cohort (recomputed from CORRECTNESS_r01..r09:
# Counter{r9:50, r8:40, r7:41, r6:33} + 18 never); post-r10 the stalest
# checked name is r6 (18 r6 names remain for r11's head).
# The policy is now EXECUTABLE: `python tools/window_policy.py` audits
# this list against the CORRECTNESS artifacts (CI: tests/test_tools.py)
# and `--propose` prints the next round's list to paste here.
_DRIVER_WINDOW = [
    # r12: rotated via `python tools/window_policy.py --propose`
    # after CORRECTNESS_r11 landed — head = the r6-stale cohort
    # remainder then the r7-stale names (alphabetical within a
    # round), topped up to 40 + the 10 pinned KEEPERS.

    "ranking_family_orders",  # r6
    "repetition_quality_documents",  # r6
    "segment_dedup_reassemble",  # r6
    "sequence_packing_stats",  # r6
    "shard_assignment_stats",  # r6
    "similarity_ann_ivf",  # r6
    "similarity_knn_join",  # r6
    "similarity_pq_topk",  # r6
    "similarity_quantized_topk",  # r6
    "snapshot_rollback_roundtrip",  # r6
    "stratified_sample_documents",  # r6
    "stream_corpus_clean",  # r6
    "training_order_shuffle",  # r6
    "try_arithmetic_orders",  # r6
    "variant_events_extract",  # r6
    "vocab_top_tokens",  # r6
    "anti_join_customers_without_orders",  # r7
    "argmax_user_events",  # r7
    "array_embedding_norms",  # r7
    "asof_join_events_to_orders",  # r7
    "bm25_retrieval",  # r7
    "catalog_view_query",  # r7
    "cdc_changes_since_snapshot",  # r7
    "corpus_clean_pipeline",  # r7
    "correlated_scalar_subquery_orders",  # r7
    "cube_lineitem_flags",  # r7
    "date_parts_orders",  # r7
    "decontam_semantic_overlap",  # r7
    "dedup_exact_fingerprint",  # r7
    "dedup_simhash",  # r7
    "doc_winnowing_fingerprints",  # r7
    "full_outer_monthly_volumes",  # r7
    "incremental_ann_maintenance",  # r7
    "lang_id_documents",  # r7
    "lead_lag_order_gaps",  # r7
    "multimodal_asset_stats",  # r7
    "multimodal_audio_stats",  # r7
    "multimodal_byte_features",  # r7
    "multimodal_decode_stats",  # r7
    "multimodal_frame_sample",  # r7
    "q1_pricing_summary",  # KEEPER
    "window_topk_orders_per_customer",  # KEEPER
    "cdc_changelog_diff",  # KEEPER
    "snapshot_merge_upsert",  # KEEPER
    "wap_branch_publish",  # KEEPER
    "flight_pushdown_scan",  # KEEPER
    "stream_exactly_once_ingest",  # KEEPER
    "dedup_minhash_lsh",  # KEEPER
    "similarity_bruteforce_topk",  # KEEPER
    "iceberg_export_roundtrip",  # KEEPER
]


def queries() -> dict[str, QueryFn]:
    out = {n: _QUERIES[n] for n in _DRIVER_WINDOW if n in _QUERIES}
    out.update({n: f for n, f in _QUERIES.items() if n not in out})
    return out


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _demo_warehouse(name: str, sf_dir: str) -> str:
    """Hermetic per-run warehouse for the demo-table queries: a
    uuid-suffixed directory, so two concurrent harnesses on the same sf
    cannot race each other's tables, plus best-effort GC of stale
    siblings (>1 h old) from previous runs. The fresh dir must OUTLIVE
    the returned lazy DataFrame — the driver collects it after the query
    function returns — so cleanup is deferred to a later run's GC
    instead of an inline rmtree."""
    import time as _time
    import uuid as _uuid

    base = os.path.join("/tmp", name, os.path.basename(os.path.normpath(sf_dir)))
    os.makedirs(base, exist_ok=True)
    cutoff = _time.time() - 3600
    for d in os.listdir(base):
        p = os.path.join(base, d)
        try:
            if os.path.getmtime(p) <= cutoff:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    return os.path.join(base, _uuid.uuid4().hex[:8])


# Exact-decimal money arithmetic: every fixture money/rate column is
# 2dp-valued, so casting to decimal before aggregation makes sums exact and
# engine-order-independent; the final ROUND+CAST(DOUBLE) is then bit-stable
# across Spark and the DuckDB oracle (no FP association-order noise).
def _dec(col, prec: int = 12, scale: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def _spread_if_narrow(df: DataFrame, *key: str) -> DataFrame:
    """Keyed repartition to the session parallelism — ONLY when the scan
    is under-parallel (fewer partitions than cores). The sf fixtures are
    single-row-group parquet files, which scan as ONE task no matter the
    split-size confs, serializing scan-disproportionate map work (regex
    chains, gram explodes); the r11 spreads fixed that, but an
    UNCONDITIONAL repartition of a (id, text) projection is a
    corpus-sized exchange at 100 TB — one extra full write+read of the
    corpus bought for a fixture artifact (r11 verdict item 2). The
    getNumPartitions probe plans the scan but runs no job; when the
    input already carries >= cores partitions (any real at-scale table)
    the plan is returned untouched and no exchange exists to pay.
    Results are unchanged either way — partitioning never alters rows."""
    from icerunner_spark.operators.spread import spread_if_narrow

    return spread_if_narrow(df, *key)


def _money_sum(expr) -> F.Column:
    """SUM over decimal input -> round 2 -> double."""
    return F.round(F.sum(expr), 2).cast("double")


def _exact_avg(dec_expr, digits: int = 6) -> F.Column:
    """Exact decimal SUM, one double division by COUNT — deterministic."""
    return F.round(F.sum(dec_expr).cast("double") / F.count(F.lit(1)), digits)


# --------------------------------------------------------------------------- #
# Aggregation (hash agg, partial+final) — SURVEY §2.B "Aggregations"
# --------------------------------------------------------------------------- #


@register(
    "q1_pricing_summary",
    oracle="""
    WITH l AS (
        SELECT l_returnflag, l_linestatus,
               CAST(l_quantity AS DECIMAL(12,2))      AS qty,
               CAST(l_extendedprice AS DECIMAL(12,2)) AS ep,
               CAST(l_discount AS DECIMAL(4,2))       AS disc,
               CAST(l_tax AS DECIMAL(4,2))            AS tax
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(qty), 2) AS DOUBLE)                             AS sum_qty,
           CAST(ROUND(SUM(ep), 2) AS DOUBLE)                              AS sum_base_price,
           CAST(ROUND(SUM(ep * (1 - disc)), 2) AS DOUBLE)                 AS sum_disc_price,
           CAST(ROUND(SUM((ep * (1 - disc)) * (1 + tax)), 2) AS DOUBLE)   AS sum_charge,
           ROUND(CAST(SUM(qty) AS DOUBLE) / COUNT(*), 6)                  AS avg_qty,
           ROUND(CAST(SUM(ep) AS DOUBLE) / COUNT(*), 6)                   AS avg_price,
           ROUND(CAST(SUM(disc) AS DOUBLE) / COUNT(*), 6)                 AS avg_disc,
           COUNT(*)                                                       AS count_order
    FROM l
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. Scale: single map-side-combinable hash aggregate over
    a scanned fact table; the shipdate filter pushes into the parquet scan;
    output cardinality is tiny (|flags|x|status|), so shuffle is negligible.
    Money math runs in exact decimals (see _dec)."""
    li = _t(spark, sf_dir, "lineitem")
    qty, ep = _dec("l_quantity"), _dec("l_extendedprice")
    disc, tax = _dec("l_discount", 4, 2), _dec("l_tax", 4, 2)
    disc_price = ep * (1 - disc)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum(qty).alias("sum_qty"),
            _money_sum(ep).alias("sum_base_price"),
            _money_sum(disc_price).alias("sum_disc_price"),
            _money_sum(disc_price * (1 + tax)).alias("sum_charge"),
            _exact_avg(qty).alias("avg_qty"),
            _exact_avg(ep).alias("avg_price"),
            _exact_avg(disc).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q6_revenue_forecast",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+global agg. All four predicates are
    min/max-prunable parquet pushdowns; at 100 TB this is the query that
    proves filters reach the scan (check PushedFilters in .explain)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money_sum(_dec("l_extendedprice") * _dec("l_discount", 4, 2)).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "distinct_agg_lineitem",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def distinct_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates: Catalyst expands to a two-phase Expand+agg plan
    with partial aggregation — no driver-side distinct."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------- #
# Joins — SURVEY §2.B "Joins" (equi / semi / anti / theta)
# --------------------------------------------------------------------------- #


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. Scale: customer is SF-proportional, so no forced
    broadcast hint — AQE converts the join to broadcast at runtime when
    the filtered build side is actually small, and degrades to a shuffle
    join at 100 TB; orders⋈lineitem is the one unavoidable shuffle, on
    the join key both sides. Segment/date filters push down first."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_money_sum(_dec("l_extendedprice") * (1 - _dec("l_discount", 4, 2))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. Scale: region/nation are constant-size
    → broadcast hints; customer/supplier grow with SF so they carry NO
    hint (AQE broadcasts them at runtime while small, shuffles at 100 TB);
    the only big shuffle is orders⋈lineitem. Join order mirrors what
    Catalyst+AQE would pick."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            _money_sum(_dec("l_extendedprice") * (1 - _dec("l_discount", 4, 2))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(strftime(l.l_shipdate, '%Y') AS BIGINT) AS l_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume by year. Scale: the
    nation table broadcasts TWICE under different roles (supplier's vs
    customer's nation) — alias-correct double use of one dim is the
    pattern every star schema needs; the shipdate range pushes into the
    lineitem scan before the big orders join."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n1), F.col("n1_key") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("n2_key") == c.c_nationkey)
        .filter(F.col("n1_key") != F.col("n2_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            _money_sum(
                _dec("l_extendedprice") * (1 - _dec("l_discount", 4, 2))
            ).alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue. Scale:
    the returnflag filter pushes to the lineitem scan; top-k is
    TakeOrderedAndProject over the aggregated (small) result, tie-broken
    by c_custkey so the limit is deterministic cross-engine."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _money_sum(
                _dec("l_extendedprice") * (1 - _dec("l_discount", 4, 2))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "semi_join_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def semi_join_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — dedup-free existence check, no row multiplication."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "theta_join_acctbal_dominance",
    oracle="""
    SELECT s.s_suppkey,
           COUNT(*) AS n_dominated,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_cust_bal
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    GROUP BY s.s_suppkey
    """,
)
def theta_join_acctbal_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed equi+theta join (the reference's CDC SQL uses a pure theta
    join, icerunner.py:244-251). The equi key (nationkey) lets Catalyst use
    a hash join with the inequality as a post-filter instead of a
    nested-loop over the full cross product — the scalable formulation."""
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal))
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_dominated"),
            _money_sum(_dec("c_acctbal")).alias("sum_cust_bal"),
        )
    )


# --------------------------------------------------------------------------- #
# Window functions — SURVEY §2.B "Window functions"
# --------------------------------------------------------------------------- #


@register(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t
    WHERE rn <= 3
    """,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: one shuffle on the partition key, in-partition sort,
    early filter. Tie-broken by o_orderkey so selection is deterministic."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total,
           LAG(o_orderkey) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-over-window with an explicit ROWS frame + LAG. The frame
    order is fully specified (date, key) so the FP accumulation order — and
    therefore the rounded result — is engine-independent."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(_dec("o_totalprice")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).cast("double").alias("running_total"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


# --------------------------------------------------------------------------- #
# Grouping sets / rollup / cube — SURVEY §2.B
# --------------------------------------------------------------------------- #


@register(
    "rollup_order_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: Catalyst's Expand handles the grouping-set fan-out map-side."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _money_sum(_dec("o_totalprice")).alias("sum_price"),
    )


@register(
    "cube_lineitem_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "lineitem")
    return o.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        _money_sum(_dec("l_quantity")).alias("sum_qty"),
    )


# --------------------------------------------------------------------------- #
# Set operations — SURVEY §2.B
# --------------------------------------------------------------------------- #


@register(
    "setops_customer_order_status",
    oracle="""
    SELECT 'both_f_and_o' AS op, k FROM (
        SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'f_minus_o' AS op, k FROM (
        SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    )
    """,
)
def setops_customer_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one result, tagged by op."""
    o = _t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k")).distinct()
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k")).distinct()
    both = f.intersect(op).select(F.lit("both_f_and_o").alias("op"), "k")
    only_f = f.exceptAll(op).select(F.lit("f_minus_o").alias("op"), "k")
    return both.unionAll(only_f)


# --------------------------------------------------------------------------- #
# Sort / limit / top-k — SURVEY §2.B
# --------------------------------------------------------------------------- #


@register(
    "topk_expensive_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps
    + driver merge of k rows, NOT a full sort. This is the 100 TB-safe
    global top-k. Tie-broken by key."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(25)
    )


# --------------------------------------------------------------------------- #
# Scalar functions: string / date / math / JSON / array — SURVEY §2.B
# --------------------------------------------------------------------------- #


@register(
    "scalar_string_math_part",
    oracle="""
    SELECT p_partkey,
           UPPER(p_type)                       AS type_upper,
           SUBSTRING(p_name, 1, 8)             AS name_prefix,
           LENGTH(p_name)                      AS name_len,
           CONCAT(p_brand, ':', p_type)        AS brand_type,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           ROUND(SQRT(p_retailprice), 6)       AS price_sqrt,
           p_size % 7                          AS size_mod
    FROM part
    WHERE p_name LIKE '%a%'
    """,
)
def scalar_string_math_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    return p.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.floor("p_retailprice").alias("price_floor"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@register(
    "date_parts_orders",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT)  AS y,
           CAST(MONTH(o_orderdate) AS INT) AS m,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def date_parts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money_sum(_dec("o_totalprice")).alias("sum_price"),
        )
    )


@register(
    "json_events_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def json_events_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction stays JVM-side via get_json_object (SURVEY §2.B JSON)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        _money_sum(_dec("value")).alias("sum_value"),
    )


@register(
    "variant_events_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_odd_k
    FROM events
    GROUP BY event_type
    """,
)
def variant_events_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of semi-structured data: parse_json
    turns the props string into a binary VARIANT once, and typed
    variant_get paths extract without per-access string re-parsing —
    the engine-native semi-structured path (get_json_object re-parses
    the string per call; at 100 TB a table would store the VARIANT
    column itself and pay parsing once at ingest). The oracle extracts
    the same paths through DuckDB's JSON functions."""
    e = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.sum(F.when(k % 2 == 1, 1).otherwise(0)).cast("bigint").alias("n_odd_k"),
    )


@register(
    "array_embedding_norms",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(CAST(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum')) AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 6)
               AS avg_l2_norm,
           ROUND(CAST(SUM(CAST(list_aggregate(embedding::DOUBLE[], 'sum') AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 6) AS avg_elem_sum
    FROM embeddings
    GROUP BY label
    """,
)
def array_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (transform/aggregate) — all codegen'd.
    Elements are cast to double BEFORE arithmetic on both engines so the
    accumulation is double-precision everywhere."""
    e = _t(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    l2 = F.sqrt(F.aggregate(emb, F.lit(0.0), lambda a, x: a + x * x))
    esum = F.aggregate(emb, F.lit(0.0), lambda a, x: a + x)
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        # per-row doubles bit-match across engines; decimal-cast before SUM
        # makes the aggregation order-independent (no FP association noise)
        _exact_avg(l2.cast("decimal(27,12)")).alias("avg_l2_norm"),
        _exact_avg(esum.cast("decimal(27,12)")).alias("avg_elem_sum"),
    )


# --------------------------------------------------------------------------- #
# AS-OF join — SURVEY §2.B "AS-OF" (custom helper; DuckDB has native ASOF)
# --------------------------------------------------------------------------- #


@register(
    "asof_join_events_to_orders",
    oracle="""
    WITH orders_d AS (
        SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
    FROM events e
    ASOF LEFT JOIN orders_d o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_join_events_to_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (latest order at-or-before each event), emulated with the
    union + last(ignorenulls) window trick since Catalyst has no native
    ASOF (SURVEY §2.B). One shuffle on the join key, one in-partition sort
    — the same cost profile as a native ASOF implementation. Orders are
    pre-deduped per (custkey, date) so the match is deterministic.
    See icerunner_spark.operators.asof for the general helper."""
    from icerunner_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        e,
        o,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey"],
    )
    return joined.select(
        "event_id", "user_id", F.col("o_orderkey").alias("last_orderkey")
    )


# --------------------------------------------------------------------------- #
# CDC over the snapshot table format — SURVEY §2.A #11-12
# --------------------------------------------------------------------------- #


@register(
    "cdc_changes_since_snapshot",
    oracle="""
    SELECT r_regionkey, r_name FROM region WHERE r_regionkey >= 3
    """,
)
def cdc_changes_since_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end CDC demo on the snapshot table format: create a managed
    table from region rows < 3, snapshot, append rows >= 3, and read the
    incremental diff — which must equal exactly the appended rows. The
    reference's version of this operator returns duplicated full-table
    rows (icerunner.py:224-259); ours is a true file-level diff."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_cdc_demo", sf_dir)
    c = Connector(spark, wh)
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    base = region.filter(F.col("r_regionkey") < 3)
    extra = region.filter(F.col("r_regionkey") >= 3)
    c.catalog.table("region_cdc").create(base)
    snap0 = c.get_current_snapshot_id("region_cdc")
    c.catalog.table("region_cdc").append(extra)
    return c.scan_changes("region_cdc", snap0)


@register(
    "cdc_changelog_diff",
    oracle="""
    WITH base AS (
        SELECT o_orderkey FROM orders WHERE o_orderkey % 7 < 3
    ),
    appended AS (
        SELECT o_orderkey FROM orders WHERE o_orderkey % 7 IN (3, 4)
    )
    SELECT o_orderkey, 'insert' AS change_type FROM appended
    UNION ALL
    SELECT o_orderkey, 'delete' AS change_type FROM base
    WHERE o_orderkey % 5 = 0
    """,
)
def cdc_changelog_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level changelog CDC (table.py scan_changelog): create orders
    rows, snapshot, append a batch, merge-on-read delete a slice of the
    ORIGINAL rows — then read the changelog over the whole range. The
    emitted (row, _change_type) multiset must equal the set difference
    of the two snapshots, which is exactly what the oracle computes from
    the source: appended rows as inserts, deleted originals as deletes.
    This is the incremental read that keeps a mirror INCREMENTAL across
    continuous-clean maintenance (MOR deletes), where the append-only
    scan_changes contract must refuse — the reference always falls back
    to a full resync there (icerunner.py:1042-1076). IO is O(changed
    rows): added files plus the files the delete coordinates reference."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_changelog_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey")
    t = c.catalog.table("orders_cl")
    t.create(orders.filter(F.col("o_orderkey") % 7 < 3))
    s0 = t.current_snapshot().snapshot_id
    t.append(orders.filter((F.col("o_orderkey") % 7).isin(3, 4)))
    # delete only pre-existing rows so the emitted changelog equals the
    # two-snapshot diff (an in-range insert+delete pair would net out in
    # state but emit both rows — pinned separately in tests/test_table.py)
    t.delete_where(
        (F.col("o_orderkey") % 7 < 3) & (F.col("o_orderkey") % 5 == 0),
        mode="merge-on-read",
    )
    return t.scan_changelog(s0).select(
        "o_orderkey", F.col("_change_type").alias("change_type")
    )


@register(
    "incremental_mv_refresh",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS row_count,
           CAST(ROUND(SUM(CASE WHEN o_orderkey % 13 = 0
                               THEN CAST(o_totalprice AS DECIMAL(12,2)) * 2
                               ELSE CAST(o_totalprice AS DECIMAL(12,2)) END),
                      2) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey % 4 < 3 AND o_orderkey % 9 <> 0
    GROUP BY o_orderstatus
    """,
)
def incremental_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained GROUP BY materialization
    (matview.IncrementalAggView) over the snapshot format's row-level
    changelog: build the view from an initial orders slice, then append
    new rows, merge-on-read delete a key slice, and MOR-upsert doubled
    prices for another — and advance the view with ONE refresh that
    reads only the changelog delta and commits one keyed upsert of the
    touched groups. The result must equal the oracle's full GROUP BY of
    the final state. Scale: the refresh is O(changed rows + touched
    groups) — at 100 TB the view answers the aggregation without ever
    rescanning the fact table, and maintenance cost tracks the CDC
    delta, not the table."""
    from icerunner_spark.connector import Connector
    from icerunner_spark.matview import IncrementalAggView

    wh = _demo_warehouse("icerunner_mv_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = c.catalog.table("orders_mv_base")
    t.create(orders.filter(F.col("o_orderkey") % 4 < 2))
    view = IncrementalAggView(
        t,
        os.path.join(wh, "orders_by_status_mv"),
        ["o_orderstatus"],
        {"total_price": "CAST(o_totalprice AS DECIMAL(12,2))"},
    )
    view.create()
    # one refresh covers an append + a MOR delete + a MOR upsert
    t.append(orders.filter(F.col("o_orderkey") % 4 == 2))
    t.delete_where("o_orderkey % 9 = 0", mode="merge-on-read")
    upd = t.scan().filter(F.col("o_orderkey") % 13 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    t.merge(upd, ["o_orderkey"], mode="merge-on-read")
    view.refresh()
    assert view.refresh() is None  # already current: refresh is a no-op
    return view.read().select(
        "o_orderstatus",
        "row_count",
        F.round("total_price", 2).cast("double").alias("total_price"),
    )


@register(
    "snapshot_eq_delete_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey < 600 AND NOT (o_orderkey % 11 = 0)
    """,
)
def snapshot_eq_delete_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-delete demo on the snapshot format (Iceberg v2's second
    delete flavor, table.py delete_rows mode='equality'): load an orders
    slice, delete a KEY SET by writing just the key values — an O(keys)
    commit with NO table read at all, even cheaper than positional
    deletes — and scan. The anti-join applies at read (null-safe, and
    only to files committed strictly before the delete, so later
    re-inserts survive); the result must equal filtering the source,
    which is what the oracle does. At 100 TB this is the key-addressed
    CDC-apply fast path: deleting a million doc_ids from a petabyte
    corpus costs one small parquet write."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_eqdel_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).filter(F.col("o_orderkey") < 600)
    t = c.catalog.table("orders_eq")
    t.create(orders)
    keys = orders.filter(F.col("o_orderkey") % 11 == 0).select("o_orderkey")
    t.delete_rows(keys, ["o_orderkey"], mode="equality")
    return t.scan()


@register(
    "time_travel_snapshot_scan",
    oracle="""
    SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10
    """,
)
def time_travel_snapshot_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel on the snapshot table format: create a table from
    nation rows < 10, append the rest, then scan AS OF the first snapshot
    — which must see exactly the pre-append rows. The reference gets
    version resolution via DuckDB's unsafe_enable_version_guessing
    (icerunner.py:76-80, :98); here every snapshot is an explicit
    manifest, so historical reads are exact file lists, no guessing."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_tt_demo", sf_dir)
    c = Connector(spark, wh)
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    t = c.catalog.table("nation_tt")
    t.create(nation.filter(F.col("n_nationkey") < 10))
    snap0 = t.current_snapshot().snapshot_id
    t.append(nation.filter(F.col("n_nationkey") >= 10))
    return t.scan(snapshot_id=snap0)


@register(
    "flight_roundtrip_nation",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def flight_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow Flight server round-trip (SURVEY §2.A #13-15) as a
    driver-checkable query: create a table from part of the nation
    fixture, serve it from an in-process IceFlightServer on an ephemeral
    port, ``do_put`` the remaining rows through the Flight client path
    (row-chunked staging, one snapshot at stream end), ``do_get`` the
    full table back over the wire (file-streamed, no driver
    materialization server-side), and hand the received Arrow bytes to
    Spark. Output must equal the whole nation table — exercising
    get_flight_info, the put path, and the get path in one row of the
    correctness report. The reference's equivalents are its Flight
    server/client loops (icerunner.py:783-1037)."""
    import pyarrow.parquet as pq

    from icerunner_spark.connector import Connector
    from icerunner_spark.flight.client import read_table_once, write_batch
    from icerunner_spark.flight.server import IceFlightServer

    wh = _demo_warehouse("icerunner_flight_demo", sf_dir)
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    c = Connector(spark, wh)
    c.create_table("nation_rt", nation.slice(0, 5))
    srv = IceFlightServer(c, host="127.0.0.1", port=0)
    try:
        write_batch("127.0.0.1", srv.port, "nation_rt", nation.slice(5))
        got = read_table_once("127.0.0.1", srv.port, "nation_rt")
    finally:
        srv.shutdown()
    return spark.createDataFrame(got.to_pandas()).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@register(
    "snapshot_history_metadata",
    oracle="""
    SELECT * FROM (VALUES (0, 'create'), (1, 'append'), (2, 'append'))
        AS t(seq, op)
    """,
)
def snapshot_history_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-history metadata table (parity with Iceberg's
    ``<t>.snapshots``, which the reference queries for its CDC theta-join,
    icerunner.py:243-252): create + two appends must yield exactly three
    history rows in commit order. Only the deterministic columns (commit
    ordinal, operation) are compared — ids and timestamps are
    run-specific."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_snaphist_demo", sf_dir)
    c = Connector(spark, wh)
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    t = c.catalog.table("region_hist")
    t.create(region.filter(F.col("r_regionkey") < 2))
    t.append(region.filter((F.col("r_regionkey") >= 2) & (F.col("r_regionkey") < 4)))
    t.append(region.filter(F.col("r_regionkey") >= 4))
    return t.snapshots_df().select(
        F.col("sequence").alias("seq"), F.col("operation").alias("op")
    )


@register(
    "incremental_dedup_cdc",
    oracle="""
    WITH k AS (SELECT CAST(MAX(doc_id) * 0.8 AS BIGINT) AS k FROM documents),
    base AS (SELECT d.* FROM documents d, k WHERE d.doc_id < k.k),
    delta AS (
        SELECT d.* FROM documents d, k WHERE d.doc_id >= k.k
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
        FROM base WHERE doc_id % 7 = 0
        UNION ALL
        SELECT d.doc_id + 2000000 AS doc_id, d.text, d.lang, d.source, d.n_chars
        FROM documents d, k WHERE d.doc_id >= k.k AND d.doc_id % 11 = 0
    ),
    delta_nt AS (
        SELECT doc_id, source, n_chars,
               lower(regexp_replace(text, '\\s+', ' ', 'g')) AS nt
        FROM delta
    ),
    winners AS (SELECT nt, MIN(doc_id) AS doc_id FROM delta_nt GROUP BY nt),
    prior_nt AS (
        SELECT DISTINCT lower(regexp_replace(text, '\\s+', ' ', 'g')) AS nt
        FROM base
    )
    SELECT d.doc_id, d.source, d.n_chars
    FROM winners w
    JOIN delta_nt d ON d.doc_id = w.doc_id
    WHERE w.nt NOT IN (SELECT nt FROM prior_nt)
    """,
)
def incremental_dedup_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup over the table format's CDC cursor — the
    operator a production pipeline runs daily: dedup only the
    newly-appended rows against persisted fingerprint state instead of
    re-running dedup over the whole corpus (reference CDC anchor
    icerunner.py:209-259; operators/incremental.py).

    The corpus table is created from the first 80% of documents, then an
    append batch arrives containing (a) the remaining documents, (b)
    re-issued exact copies of some prior docs under new ids — dups
    against the PRIOR corpus, must drop, and (c) second copies of some
    batch docs — WITHIN-delta dups, min id wins. ``scan_changes`` reads
    exactly the appended files; the dedup joins the delta's 8-byte
    fingerprints against state built from the prior snapshot. The oracle
    replays both snapshots and the keep-rule in DuckDB, grouping on the
    normalized text itself (hash-agnostic).

    Scale shape: the state is one fingerprint per retained doc; the
    delta group-by and the state anti-join both shuffle fingerprints
    only, never document text — cost scales with the delta."""
    from icerunner_spark.connector import Connector
    from icerunner_spark.operators.incremental import (
        exact_dedup_state,
        incremental_exact_dedup,
    )

    wh = _demo_warehouse("icerunner_incdedup_demo", sf_dir)
    d = _t(spark, sf_dir, "documents")
    kdf = F.broadcast(d.agg(F.expr("cast(max(doc_id) * 0.8 as bigint)").alias("k")))
    d = d.crossJoin(kdf)
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    base = d.filter(F.col("doc_id") < F.col("k")).select(cols)
    tail = d.filter(F.col("doc_id") >= F.col("k")).select(cols)
    delta = tail.unionByName(
        base.filter(F.col("doc_id") % 7 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    ).unionByName(
        tail.filter(F.col("doc_id") % 11 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2000000)
    )
    c = Connector(spark, wh)
    t = c.catalog.table("corpus_inc")
    t.create(base)
    snap0 = t.current_snapshot().snapshot_id
    t.append(delta)
    state = exact_dedup_state(t.scan(snapshot_id=snap0), "text")
    survivors = incremental_exact_dedup(
        t.scan_changes(snap0), state, "doc_id", "text"
    )
    return survivors.select("doc_id", "source", "n_chars")


@register("incremental_neardup_cdc")
def incremental_neardup_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup (MinHash-LSH) dedup over the CDC cursor: the
    greedy-by-id twin of ``incremental_dedup_cdc`` for non-exact
    duplicates. Prior corpus = first 80% of documents, greedy-deduped;
    the appended delta is near-dup-checked against the retained prior
    docs (dropping any delta doc that verifies >= threshold against
    one) and then within itself. No cross-engine oracle — near-dup
    verification needs MinHash/shingle machinery DuckDB lacks — so the
    driver row is rows-only; tests/test_corpus.py pins the result
    equal to a full-corpus greedy re-dedup (prefix decomposability).

    Scale shape: only the delta is shingled from raw text; prior
    signatures come from persisted state; LSH buckets with no delta
    member are pruned before pair expansion, and the exact verify
    re-shingles only candidate prior docs (semi-join) — everything is
    delta-proportional (operators/incremental.py)."""
    from icerunner_spark.connector import Connector
    from icerunner_spark.operators.incremental import (
        greedy_minhash_dedup,
        incremental_minhash_dedup,
    )

    wh = _demo_warehouse("icerunner_incneardup_demo", sf_dir)
    d = _t(spark, sf_dir, "documents")
    kdf = F.broadcast(d.agg(F.expr("cast(max(doc_id) * 0.8 as bigint)").alias("k")))
    d = d.crossJoin(kdf)
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    base = d.filter(F.col("doc_id") < F.col("k")).select(cols)
    tail = d.filter(F.col("doc_id") >= F.col("k")).select(cols)
    c = Connector(spark, wh)
    t = c.catalog.table("corpus_nd_inc")
    t.create(base)
    snap0 = t.current_snapshot().snapshot_id
    t.append(tail)
    # r11 optimization round: the state is the greedy pass's OWN kept-doc
    # signatures (with_state — minhash_dedup_state would re-shingle the
    # kept corpus from raw text to rebuild the identical frame), and both
    # are materialized once behind eager localCheckpoints — the
    # incremental operator consumes prior_kept three times (max-id
    # aggregate, verify semi-join, final anti-join), each of which
    # otherwise replayed the greedy pipeline's anti-join lineage.
    prior_kept, state = greedy_minhash_dedup(
        t.scan(snapshot_id=snap0), "doc_id", "text", with_state=True
    )
    prior_kept = prior_kept.localCheckpoint(eager=True)
    state = state.localCheckpoint(eager=True)
    survivors = incremental_minhash_dedup(
        prior_kept, t.scan_changes(snap0), "doc_id", "text", state_sigs=state
    )
    return survivors.select("doc_id", "source")


# --------------------------------------------------------------------------- #
# Extensions: dedup / similarity / text (SURVEY §2.C) — more in operators/
# --------------------------------------------------------------------------- #


@register(
    "dedup_exact_documents",
    oracle="""
    SELECT lang, source,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS group_size
    FROM documents
    GROUP BY lang, source
    """,
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by key = keep one representative per group (min doc_id).
    Pure hash aggregate: map-side combine, single shuffle on the dedup key.
    See operators.dedup.dedup_exact for the general operator."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("group_size"),
    )


@register(
    "similarity_bruteforce_topk",
    oracle="""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against a query vector. The query vector is
    broadcast (crossJoin of a 1-row df); scoring is a codegen'd
    zip_with/aggregate over the scan; top-k is TakeOrderedAndProject —
    no global sort, no collect. This IS the scalable baseline ANN path;
    operators.similarity adds the LSH-bucketed variant."""
    e = _t(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # limit(1) bounds the broadcast STRUCTURALLY (vec_id is unique, so
    # it is also a semantic no-op): the plan-invariant broadcast audit
    # accepts only Aggregate/Limit as proof a hinted subtree can't scale
    # with the table it scans
    qvec = e.filter(F.col("vec_id") == 0).select(emb_d.alias("qe")).limit(1)
    cand = e.filter(F.col("vec_id") != 0).select("vec_id", "label", emb_d.alias("ce"))
    return (
        cand.crossJoin(F.broadcast(qvec))
        .select(
            "vec_id",
            "label",
            F.round(cosine_similarity(F.col("ce"), F.col("qe")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "kmeans_cluster_profile",
    oracle="""
    WITH emb AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               - 1 AS c, v
      FROM emb
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
      LIMIT 4
    ),
    a0 AS (
      SELECT e.vec_id, e.label, e.v,
             (SELECT s.c FROM seeds s
              ORDER BY list_distance(s.v, e.v), s.c LIMIT 1) AS c
      FROM emb e
    ),
    m1 AS (
      SELECT a.c, t.ord,
             ROUND(CAST(SUM(CAST(a.v[t.ord] AS DECIMAL(30,15))) AS DOUBLE)
                   / COUNT(*), 9) AS m
      FROM a0 a, UNNEST(generate_series(1, len(a.v))) AS t(ord)
      GROUP BY a.c, t.ord
    ),
    c1 AS (
      SELECT c, LIST(m ORDER BY ord) AS v FROM m1 GROUP BY c
      UNION ALL
      SELECT s.c, s.v FROM seeds s WHERE s.c NOT IN (SELECT c FROM m1)
    ),
    a1 AS (
      SELECT e.vec_id, e.label, e.v,
             (SELECT s.c FROM c1 s
              ORDER BY list_distance(s.v, e.v), s.c LIMIT 1) AS c
      FROM emb e
    ),
    m2 AS (
      SELECT a.c, t.ord,
             ROUND(CAST(SUM(CAST(a.v[t.ord] AS DECIMAL(30,15))) AS DOUBLE)
                   / COUNT(*), 9) AS m
      FROM a1 a, UNNEST(generate_series(1, len(a.v))) AS t(ord)
      GROUP BY a.c, t.ord
    ),
    c2 AS (
      SELECT c, LIST(m ORDER BY ord) AS v FROM m2 GROUP BY c
      UNION ALL
      SELECT s.c, s.v FROM c1 s WHERE s.c NOT IN (SELECT c FROM m2)
    ),
    a2 AS (
      SELECT e.vec_id, e.label,
             (SELECT s.c FROM c2 s
              ORDER BY list_distance(s.v, e.v), s.c LIMIT 1) AS c
      FROM emb e
    )
    SELECT c AS cluster_id,
           COUNT(*) AS n_vecs,
           MIN(vec_id) AS min_vec_id,
           MAX(vec_id) AS max_vec_id,
           COUNT(DISTINCT label) AS n_labels
    FROM a2 GROUP BY c
    """,
)
def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (operators.clustering) over the embedding
    corpus: md5-seeded centroids, two Lloyd rounds, final assignment —
    the clustering primitive behind semantic sharding and
    cluster-balanced mixture curation. Every stage is deterministic AND
    engine-portable (seed order by md5, DECIMAL-exact means rounded 9dp,
    sequential-fold distances), so the DuckDB oracle replays the whole
    algorithm — both engines must land every vector in the same cluster
    for the profile to hash-match; the integer profile (counts, id
    range, label spread per cluster) pins the full assignment. Scale:
    assignment is per-row Catalyst codegen; each Lloyd round moves only
    k x dim aggregate rows to the driver (map-side-combined partial
    sums), never vectors — the same shape at 500 rows or 100 TB."""
    from icerunner_spark.operators.clustering import kmeans

    e = _t(spark, sf_dir, "embeddings")
    _, assigned = kmeans(e, vec_col="embedding", id_col="vec_id", k=4, iters=2)
    return assigned.groupBy(
        F.col("cluster_id").cast("long").alias("cluster_id")
    ).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("vec_id").alias("min_vec_id"),
        F.max("vec_id").alias("max_vec_id"),
        F.countDistinct("label").alias("n_labels"),
    )


@register(
    "dedup_exact_fingerprint",
    oracle="""
    SELECT MIN(doc_id) AS keep_doc_id,
           COUNT(*)    AS group_size,
           MIN(n_chars) AS n_chars
    FROM documents
    GROUP BY lower(regexp_replace(text, '\\s+', ' ', 'g'))
    """,
)
def dedup_exact_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup via 64-bit fingerprint groupBy (operators.dedup).
    The oracle groups by the normalized text itself — identical grouping
    unless xxhash64 collides; only the representative row is compared, so
    the check is hash-agnostic. Only the 8-byte fingerprint shuffles, not
    the document bodies."""
    from icerunner_spark.functions.text import fingerprint64

    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(fingerprint64("text").alias("__fp"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.min("n_chars").alias("n_chars"),
        )
        .drop("__fp")
    )


@register(
    "neardup_ngram_jaccard",
    oracle="""
    WITH norm AS (
        SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS t
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 5) AS gram
        FROM norm, LATERAL (SELECT unnest(generate_series(1, GREATEST(length(t) - 4, 1))) AS i) s
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS i
        FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id1, id2,
           ROUND(i * 1.0 / (s1.sz + s2.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = id1
    JOIN sizes s2 ON s2.doc_id = id2
    WHERE i * 1.0 / (s1.sz + s2.sz - i) >= 0.25
    """,
)
def neardup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index join
    (operators.dedup.ngram_jaccard_pairs) — the exact baseline that the
    MinHash/SimHash approximate paths are measured against."""
    from icerunner_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(d, "doc_id", "text", n=5, threshold=0.25)
    return out.select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))


@register(
    "neardup_prefix_filter",
    # Same exact semantics as the inverted-index oracle — prefix
    # filtering changes the CANDIDATE set, never the result (the prefix
    # theorem guarantees no t-similar pair is skipped), so the full
    # all-pairs SQL is this query's oracle verbatim.
    oracle="""
    WITH norm AS (
        SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS t
        FROM documents WHERE doc_id < 2000
    ),
    grams AS (
        SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 12) AS gram
        FROM norm, LATERAL (SELECT unnest(generate_series(1, GREATEST(length(t) - 11, 1))) AS i) s
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS i
        FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id1, id2,
           ROUND(i * 1.0 / (s1.sz + s2.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = id1
    JOIN sizes s2 ON s2.doc_id = id2
    WHERE i * 1.0 / (s1.sz + s2.sz - i) >= 0.5
    """,
)
def neardup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard pairs with PREFIX-FILTERED candidates
    (operators.dedup.prefix_jaccard_pairs, AllPairs/PPJoin family):
    each doc joins only on its rarest |d|-ceil(t|d|)+1 shingles under a
    global df-ascending order instead of all of them. The scale path
    for exact near-dup where the full inverted index hits hot-shingle
    blowup; result-identical to the all-pairs formulation by the prefix
    theorem (equality also pinned in tests/test_operators.py). Long
    12-char shingles at t=0.5 — the fuzzy-near-dup config whose rare-
    shingle vocabulary is where prefix pruning pays (this corpus's
    5-gram vocabulary is only ~2k strings, so EVERY doc pair collides
    at short n and no exact method can prune); bounded to doc_id<2000
    so the bench entry measures the operator, not the corpus size."""
    from icerunner_spark.operators.dedup import prefix_jaccard_pairs

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    out = prefix_jaccard_pairs(d, "doc_id", "text", n=12, threshold=0.5)
    return out.select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))


@register(
    "dedup_minhash_lsh",
    # The pipeline is generate(approximate LSH buckets) -> verify(exact
    # Jaccard on candidates): precision is exact by construction, and
    # recall is measured 1.0 against the exact inverted-index baseline on
    # both fixture scales (missed=0 at sf0.001 and sf0.01), so the exact
    # n-gram formulation IS this query's oracle at these scales. The
    # recall pin in tests/test_operators.py keeps the equivalence honest
    # if the banding knobs ever drift from the threshold's s-curve.
    oracle="""
    WITH norm AS (
        SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS t
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 5) AS gram
        FROM norm, LATERAL (SELECT unnest(generate_series(1, GREATEST(length(t) - 4, 1))) AS i) s
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS i
        FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id1, id2,
           ROUND(i * 1.0 / (s1.sz + s2.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = id1
    JOIN sizes s2 ON s2.doc_id = id2
    WHERE i * 1.0 / (s1.sz + s2.sz - i) >= 0.5
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (generate via banded buckets, verify with
    exact Jaccard on candidates only). The exact-verify stage makes
    precision 1.0 by construction; the oracle (exact n-gram Jaccard) holds
    because measured recall is 1.0 on the fixtures — the pytest recall pin
    guards that equivalence. Threshold 0.5 matches the 16-band x 4-row
    s-curve midpoint (recall degrades sharply below the banding's design
    point, so the knobs move together)."""
    from icerunner_spark.operators.dedup import minhash_neardup_pairs

    d = _t(spark, sf_dir, "documents")
    # k=48 x 12 bands cuts the signature hash-agg work ~2x vs 64x16 at
    # the same 4-rows/band geometry (s-curve midpoint (1/12)^(1/4) ~ 0.54,
    # just above the 0.5 threshold design point) while keeping the
    # estimate prefilter tight (2.5-sigma margin 0.18). Safe: every true
    # fixture pair measures J >= 0.92, and tests/test_operators.py pins
    # EXACT set equality against the inverted-index baseline at this
    # config. Measured ~2x end-to-end at sf0.1 together with the verify
    # grams cache (dedup.py).
    out = minhash_neardup_pairs(
        d, "doc_id", "text", n_hashes=48, bands=12, threshold=0.5
    )
    return out.select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))


@register("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 6 over 64-bit token signatures,
    8-bit chunk banding for candidates). Approximate => rows-only driver
    check; pytest pins behavior on synthetic near-dups."""
    from icerunner_spark.operators.dedup import simhash_neardup_pairs

    d = _t(spark, sf_dir, "documents")
    return simhash_neardup_pairs(d, "doc_id", "text", max_distance=6)


@register(
    "embedding_cosine_neardup",
    oracle="""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.8
    """,
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact variant for the oracle (the
    LSH-bucketed variant is similarity_ann_lsh / cosine_neardup_pairs with
    exact=False — the path a 100 TB corpus uses)."""
    from icerunner_spark.operators.similarity import cosine_neardup_pairs

    e = _t(spark, sf_dir, "embeddings")
    out = cosine_neardup_pairs(e, threshold=0.8, exact=True)
    return out.select("id1", "id2", F.round("cos_sim", 6).alias("cos_sim"))


@register("similarity_ann_lsh")
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH with multi-probe.
    Approximate => rows-only driver check. 8 planes x hamming<=2 probes
    = 37/256 buckets, a measured ~18% candidate fraction on the fixture
    (pinned <25% in tests/test_operators.py — the r1-r2 4-plane config
    probed 69%, which is a scan, not an index). The fixture embeddings
    are near-uniform, where no sublinear index can beat its candidate
    fraction on recall; the recall pin lives on a planted-cluster corpus
    (recall 1.0 at the same fraction), the structure real embedding
    corpora have."""
    from icerunner_spark.operators.similarity import ann_lsh_topk

    e = _t(spark, sf_dir, "embeddings")
    row = e.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in row["embedding"]]
    return ann_lsh_topk(
        e.filter(F.col("vec_id") != 0), qvec, k=10, n_planes=8, probe_hamming=2
    ).select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


@register(
    "lang_id_documents",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               list_distinct(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS tk
        FROM documents
    ),
    scores AS (
        SELECT doc_id, lang,
               len(list_intersect(tk, ['der','die','das','und','ist','nicht','ein','mit','auf','für'])) AS s_de,
               len(list_intersect(tk, ['the','and','is','of','to','in','that','it','for','was'])) AS s_en,
               len(list_intersect(tk, ['el','la','de','que','y','en','un','por','con','los'])) AS s_es,
               len(list_intersect(tk, ['le','la','de','et','est','un','que','dans','pour','sur'])) AS s_fr,
               len(list_intersect(tk, ['的','是','了','在','我','有','和','不','人','这'])) AS s_zh
        FROM toks
    ),
    pred AS (
        SELECT doc_id, lang,
               CASE WHEN GREATEST(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
                    WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
                    WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                    WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                    WHEN s_fr = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                    ELSE 'zh' END AS pred_lang
        FROM scores
    )
    SELECT lang, pred_lang, COUNT(*) AS n_docs
    FROM pred
    GROUP BY lang, pred_lang
    """,
)
def lang_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: predicted vs labeled language
    (operators.text.language_id, stopword-profile heuristic — the oracle
    reproduces the same scoring)."""
    from icerunner_spark.operators.text import language_id

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", language_id("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "quality_score_documents",
    oracle="""
    WITH feats AS (
        SELECT doc_id, lang,
               len(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) AS n_punct,
               len(regexp_extract_all(text, '[0-9]')) AS n_digit,
               len(list_filter(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'),
                   x -> list_contains(['and','auf','con','dans','das','de','der','die','est','et','ein','el','en','for','für','is','ist','it','in','la','le','los','mit','nicht','of','por','pour','que','sur','that','the','to','un','und','was','y','不','了','人','在','我','是','有','的','和','这'], x))) AS n_stop
        FROM documents
    ),
    q AS (
        SELECT doc_id, lang, n_tokens,
               LEAST(n_tokens / 100.0, 1.0) * 0.4
               + GREATEST(0.0, 1.0 - (n_punct * 1.0 / n_chars) * 5) * 0.2
               + GREATEST(0.0, 1.0 - (n_digit * 1.0 / n_chars) * 5) * 0.2
               + LEAST((n_stop * 1.0 / n_tokens) * 4, 1.0) * 0.2 AS quality
        FROM feats
        WHERE n_chars > 0 AND n_tokens > 0
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(quality AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 6) AS avg_quality,
           ROUND(MIN(quality), 6) AS min_quality,
           ROUND(MAX(quality), 6) AS max_quality
    FROM q
    GROUP BY lang
    """,
)
def quality_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring (operators.text.quality_score): linear
    blend of length saturation, punctuation/digit noise, stopword density.
    NOTE the oracle's stopword list is the same deduplicated union the
    Spark operator uses."""
    from icerunner_spark.operators.text import quality_score
    from icerunner_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents")
    scored = d.filter((F.length("text") > 0) & (token_count("text") > 0)).select(
        "lang", quality_score("text").alias("quality")
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        _exact_avg(F.col("quality").cast("decimal(27,12)")).alias("avg_quality"),
        F.round(F.min("quality"), 6).alias("min_quality"),
        F.round(F.max("quality"), 6).alias("max_quality"),
    )


@register(
    "text_token_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(len(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(LENGTH(text)) AS DOUBLE) / COUNT(*), 6) AS avg_len
    FROM documents
    GROUP BY lang
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (BPE-ish regex, SURVEY §2.C 'text analysis') as a
    JVM-side expression — no Python in the loop."""
    d = _t(spark, sf_dir, "documents")
    tc = token_count(F.col("text"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tc).alias("total_tokens"),
        # integer-exact SUM / one division: deterministic across partition
        # orders, unlike AVG(double)'s order-dependent summation
        _exact_avg(tc).alias("avg_tokens"),
        F.sum("n_chars").alias("total_chars"),
        _exact_avg(F.length("text")).alias("avg_len"),
    )


@register(
    "gopher_quality_filter",
    oracle="""
    WITH w AS (
        SELECT doc_id, lang,
               list_filter(regexp_extract_all(text, '\\S+'), x -> length(x) > 0) AS words,
               len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS n_symbols
        FROM documents
    ),
    f AS (
        SELECT lang,
               len(words) AS n_words,
               CASE WHEN len(words) > 0
                    THEN list_sum(list_transform(words, x -> length(x))) * 1.0 / len(words)
                    ELSE 0.0 END AS mwl,
               len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
               len(list_intersect(list_distinct(list_transform(words, x -> lower(x))),
                   ['the','be','to','of','and','that','have','with'])) AS req_hits,
               n_symbols
        FROM w
    ),
    flags AS (
        SELECT lang,
               (n_words >= 30 AND n_words <= 100000) AS p_wc,
               (mwl >= 3.0 AND mwl <= 10.0) AS p_mwl,
               (n_words > 0 AND n_symbols * 1.0 / n_words <= 0.1) AS p_sym,
               (n_words > 0 AND alpha_words * 1.0 / n_words >= 0.8) AS p_alpha,
               (req_hits >= 2) AS p_req
        FROM f
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN p_wc THEN 1 ELSE 0 END) AS BIGINT) AS pass_word_count,
           CAST(SUM(CASE WHEN p_mwl THEN 1 ELSE 0 END) AS BIGINT) AS pass_mean_word_len,
           CAST(SUM(CASE WHEN p_sym THEN 1 ELSE 0 END) AS BIGINT) AS pass_symbol_ratio,
           CAST(SUM(CASE WHEN p_alpha THEN 1 ELSE 0 END) AS BIGINT) AS pass_alpha_words,
           CAST(SUM(CASE WHEN p_req THEN 1 ELSE 0 END) AS BIGINT) AS pass_required_words,
           CAST(SUM(CASE WHEN p_wc AND p_mwl AND p_sym AND p_alpha AND p_req THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
    FROM flags
    GROUP BY lang
    """,
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-pack quality filter (operators.text.gopher_quality_flags):
    per-language pass counts for each of the five document-level rules plus
    the conjunction. One projection + one hash agg — the rules evaluate at
    scan speed, so at corpus scale this costs exactly one read."""
    from icerunner_spark.operators.text import gopher_quality_flags

    d = _t(spark, sf_dir, "documents")
    fl = gopher_quality_flags("text")
    flagged = d.select("lang", *[c.alias(n) for n, c in fl.items()])

    def _n(col: str) -> F.Column:
        return F.sum(F.col(col).cast("bigint")).alias(col)

    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        _n("pass_word_count"),
        _n("pass_mean_word_len"),
        _n("pass_symbol_ratio"),
        _n("pass_alpha_words"),
        _n("pass_required_words"),
        F.sum(F.col("gopher_pass").cast("bigint")).alias("pass_all"),
    )


@register(
    "exact_substring_spans",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') AS tk
        FROM documents
    ),
    pos AS (
        SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
        FROM toks WHERE len(tk) >= 8
    ),
    grams AS (
        SELECT doc_id, i - 1 AS pos,
               array_to_string(list_slice(tk, i, i + 7), ' ') AS gram
        FROM pos
    ),
    freq AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) <= 16),
    rare AS (SELECT g.* FROM grams g JOIN freq USING (gram)),
    m AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a, a.pos - b.pos AS diag
        FROM rare a JOIN rare b ON a.gram = b.gram AND a.doc_id < b.doc_id
    ),
    isl AS (
        SELECT id_a, id_b, diag, pos_a,
               pos_a - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS grp
        FROM m
    ),
    islands AS (
        SELECT id_a, id_b, diag, grp,
               MIN(pos_a) AS start_pos, MAX(pos_a) + 8 AS end_pos
        FROM isl GROUP BY id_a, id_b, diag, grp
    ),
    flagged AS (
        SELECT *, CASE WHEN start_pos >= COALESCE(MAX(end_pos) OVER (
                          PARTITION BY id_a, id_b, diag ORDER BY start_pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                       THEN 1 ELSE 0 END AS new_run
        FROM islands
    ),
    runs AS (
        SELECT *, SUM(new_run) OVER (PARTITION BY id_a, id_b, diag ORDER BY start_pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        FROM flagged
    ),
    spans AS (
        SELECT id_a, id_b, CAST(MAX(end_pos) - MIN(start_pos) AS BIGINT) AS span_tokens
        FROM runs GROUP BY id_a, id_b, diag, run_id
    )
    SELECT id_a, id_b,
           COUNT(*) AS n_spans,
           MAX(span_tokens) AS longest_span_tokens,
           CAST(SUM(span_tokens) AS BIGINT) AS total_span_tokens
    FROM spans GROUP BY id_a, id_b
    """,
)
def exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal exact shared token spans between document pairs
    (operators.dedup.shared_span_pairs): the deduplicate-text-datasets
    semantics as gram-hash self-join + gaps-and-islands span coalescing.
    The oracle replays the identical construction on gram STRINGS (the
    Spark side joins on xxhash64 — agreement also certifies the hash
    join introduced no collision)."""
    from icerunner_spark.operators.dedup import shared_span_pairs

    d = _t(spark, sf_dir, "documents")
    return shared_span_pairs(d, "doc_id", "text", n=8, max_df=16)


@register(
    "multimodal_asset_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(octet_length(encode(text))) AS max_bytes,
           ROUND(CAST(SUM(octet_length(encode(text))) AS DOUBLE) / COUNT(*), 6) AS avg_bytes
    FROM documents
    GROUP BY lang
    """,
)
def multimodal_asset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal asset plumbing (operators.multimodal): binary content +
    typed metadata struct; n_bytes is derived JVM-side at ingest. The
    oracle recomputes byte lengths from UTF-8 encoding — both engines
    count the same bytes. Narrow map + one hash agg; the blobs themselves
    never shuffle (only lang + n_bytes reach the exchange)."""
    from icerunner_spark.operators.multimodal import documents_as_assets

    d = _t(spark, sf_dir, "documents")
    assets = documents_as_assets(d).join(
        d.select(F.col("doc_id").alias("asset_id"), "lang"), "asset_id"
    )
    return assets.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
        _exact_avg(F.col("meta.n_bytes")).alias("avg_bytes"),
    )


@register(
    "multimodal_byte_features",
    # The oracle recomputes the oracle-able subset of the features in SQL:
    # byte length and md5 over the same UTF-8 bytes, printable-ASCII ratio
    # by deleting every char outside [ -~] (each printable-ASCII char is
    # exactly one byte, so char count == byte count). entropy_bits and
    # crc32 have no DuckDB equivalent — they stay in the operator output
    # and are value-pinned on known blobs in tests/test_multimodal.py.
    oracle="""
    SELECT doc_id AS asset_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS md5,
           CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
                ELSE ROUND(length(regexp_replace(text, '[^ -~]', '', 'g')) * 1.0
                           / octet_length(encode(text)), 6)
           END AS ascii_ratio
    FROM documents
    """,
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature extraction over binary assets via Arrow-batched
    mapInPandas (size, md5, CRC32, Shannon entropy, ASCII ratio). The
    registry projection keeps the columns the SQL oracle can recompute
    (n_bytes, md5, ascii_ratio); crc32/entropy_bits are exact-pinned in
    tests/test_multimodal.py instead."""
    from icerunner_spark.operators.multimodal import (
        documents_as_assets,
        extract_features,
    )

    d = _t(spark, sf_dir, "documents")
    feats = extract_features(documents_as_assets(d))
    return feats.select(
        "asset_id",
        "n_bytes",
        "md5",
        F.round("ascii_ratio", 6).alias("ascii_ratio"),
    )


@register(
    "multimodal_decode_stats",
    # The blobs are seeded gradient images ENCODED in-query (pure-numpy
    # BMP/PPM/PGM writers, operators.codecs) and decoded by the REAL
    # in-container codec path (r6 verdict item 5: decode was pinned only
    # in pytest). Pixel (y, x) of image doc_id is v = (doc_id*7+3y+x)%256;
    # gray formats have luma == v exactly, and the PPM's BT.601 integer
    # luma ((299r+587g+114b)//1000) is the same floor arithmetic in both
    # engines — so width/height/mean_luma are DuckDB-computable from the
    # generator arithmetic alone, no image library on either side.
    oracle="""
    WITH px AS (
        SELECT d.doc_id, (d.doc_id * 7 + 3 * y.y + x.x) % 256 AS v
        FROM documents d, range(0, 16) AS y(y), range(0, 25) AS x(x)
        WHERE d.doc_id < 40
    ),
    lum AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 1
                    THEN (299 * v + 587 * ((v + 40) % 256)
                          + 114 * ((v + 80) % 256)) // 1000
                    ELSE v END AS luma
        FROM px
    )
    SELECT doc_id AS asset_id, 25 AS width, 16 AS height,
           ROUND(AVG(luma * 1.0), 6) AS mean_luma
    FROM lum GROUP BY doc_id
    """,
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode end-to-end (operators.codecs via
    operators.multimodal.decode_images): encode 40 seeded gradient
    images — BMP (w=25 exercises 3-byte scanline padding + bottom-up
    rows), binary PPM (distinct R/G/B channels exercise the BT.601
    integer luma), binary PGM — as binary asset blobs inside an
    Arrow-batched pandas UDF, then decode them with the dependency-free
    numpy codecs in one mapInPandas stage (no PIL in this container).
    Narrow map end-to-end: blobs never shuffle."""
    from icerunner_spark.operators.multimodal import as_assets, decode_images

    def encode_batches(it):
        import numpy as np
        import pandas as pd

        from icerunner_spark.operators.codecs import (
            encode_gray_bmp,
            encode_pgm,
            encode_ppm,
        )

        for pdf in it:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                y, x = np.mgrid[0:16, 0:25]
                v = ((d * 7 + 3 * y + x) % 256).astype(np.uint8)
                if d % 3 == 0:
                    blobs.append(encode_gray_bmp(v))
                elif d % 3 == 1:
                    rgb = np.stack(
                        [v, (v.astype(np.int64) + 40) % 256,
                         (v.astype(np.int64) + 80) % 256],
                        axis=2,
                    ).astype(np.uint8)
                    blobs.append(encode_ppm(rgb))
                else:
                    blobs.append(encode_pgm(v))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    d = _t(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 40)
    blobs = d.mapInPandas(encode_batches, schema="doc_id long, blob binary")
    assets = as_assets(blobs, "doc_id", "blob", kind="image",
                       content_type="image/x-seeded")
    return decode_images(assets).select(
        "asset_id", "width", "height",
        F.round("mean_luma", 6).alias("mean_luma"),
    )


@register(
    "multimodal_resize_stats",
    # Exercises the REAL resize path end-to-end: seeded gray BMP
    # gradients (pixel v = (doc_id*7+3y+x) % 256, 25x16) resize to
    # 10x8 via the nearest-neighbor index maps ys=(y*16)//8, xs=
    # (x*25)//10, re-encode as gray BMP, and DECODE AGAIN — so the
    # checked mean_luma proves decode -> resample -> encode -> decode
    # all ran. Gray-BMP luma is the identity, so the oracle replays the
    # index-map arithmetic directly.
    oracle="""
    WITH px AS (
        SELECT d.doc_id,
               ((d.doc_id * 7 + 3 * ((y.y * 16) // 8)
                 + ((x.x * 25) // 10)) % 256) AS v
        FROM documents d, range(0, 8) AS y(y), range(0, 10) AS x(x)
        WHERE d.doc_id < 24
    )
    SELECT doc_id AS asset_id, 10 AS width, 8 AS height,
           ROUND(AVG(v * 1.0), 6) AS mean_luma
    FROM px GROUP BY doc_id
    """,
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image resize end-to-end (operators.multimodal.resize_images):
    24 seeded gradients encoded as gray BMP, nearest-neighbor resampled
    25x16 -> 10x8 with the numpy index maps, re-encoded, then decoded
    once more — two full codec round-trips plus the resample, all in
    Arrow-batched narrow maps (blobs never shuffle)."""
    from icerunner_spark.operators.multimodal import (
        as_assets,
        decode_images,
        resize_images,
    )

    def encode_batches(it):
        import numpy as np
        import pandas as pd

        from icerunner_spark.operators.codecs import encode_gray_bmp

        for pdf in it:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                y, x = np.mgrid[0:16, 0:25]
                blobs.append(
                    encode_gray_bmp(((d * 7 + 3 * y + x) % 256).astype(np.uint8))
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    d = _t(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 24)
    blobs = d.mapInPandas(encode_batches, schema="doc_id long, blob binary")
    assets = as_assets(blobs, "doc_id", "blob", kind="image",
                       content_type="image/bmp")
    resized = resize_images(assets, width=10, height=8)
    return decode_images(
        resized.select("asset_id", "content",
                       F.lit(None).cast(
                           "struct<kind:string,content_type:string,"
                           "n_bytes:bigint,width:int,height:int,"
                           "n_frames:int,sample_rate:int>").alias("meta"))
    ).select(
        "asset_id", "width", "height",
        F.round("mean_luma", 6).alias("mean_luma"),
    )


@register(
    "multimodal_audio_stats",
    # Seeded integer waveforms ENCODED as RIFF/WAVE PCM in-query and
    # decoded by the real dependency-free codec (operators.codecs
    # .decode_wav): sample k of doc d is ((d*13 + k*7) % 2001) - 1000
    # over 400 frames at 8 kHz, so rate/channels/frames/duration/rms/
    # peak are all DuckDB-computable from the generator arithmetic.
    oracle="""
    WITH s AS (
        SELECT d.doc_id,
               (((d.doc_id * 13 + k.k * 7) % 2001) - 1000) / 32768.0 AS v
        FROM documents d, range(0, 400) AS k(k)
        WHERE d.doc_id < 30
    )
    SELECT doc_id AS asset_id,
           8000 AS sample_rate,
           1 AS n_channels,
           CAST(400 AS BIGINT) AS n_frames,
           CAST(0.05 AS DOUBLE) AS duration_s,
           ROUND(SQRT(AVG(v * v)), 6) AS rms,
           ROUND(MAX(ABS(v)), 6) AS peak
    FROM s GROUP BY doc_id
    """,
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode end-to-end (operators.multimodal.decode_audio):
    30 seeded int16 PCM waveforms encoded as RIFF/WAVE blobs inside an
    Arrow-batched stage, then decoded — header chunk walk, amplitude
    normalization to [-1, 1], rms/peak reductions — by the pure-numpy
    WAV codec (no audio library in this container; compressed formats
    keep the honest per-blob gate). Narrow map end-to-end: blobs never
    shuffle."""
    from icerunner_spark.operators.multimodal import as_assets, decode_audio

    def encode_batches(it):
        import numpy as np
        import pandas as pd

        from icerunner_spark.operators.codecs import encode_wav

        for pdf in it:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                k = np.arange(400, dtype=np.int64)
                samples = (((d * 13 + k * 7) % 2001) - 1000).astype(np.int16)
                blobs.append(encode_wav(samples, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    d = _t(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 30)
    blobs = d.mapInPandas(encode_batches, schema="doc_id long, blob binary")
    assets = as_assets(blobs, "doc_id", "blob", kind="audio",
                       content_type="audio/x-wav")
    return decode_audio(assets).select(
        "asset_id", "sample_rate", "n_channels", "n_frames", "duration_s",
        F.round("rms", 6).alias("rms"), F.round("peak", 6).alias("peak"),
    )


@register(
    "multimodal_video_stats",
    # Seeded MJPEG-in-AVI clips ENCODED in-query (RIFF container + the
    # pure-python baseline-JPEG encoder per frame) and decoded by the
    # real codec chain. JPEG is lossy, so pixel stats aren't
    # oracle-computable — the oracle checks the DECODE-DERIVED facts
    # that are exact: container dims, fps, and n_frames counted from
    # frames actually decoded (not the header claim). Per-frame luma
    # accuracy is pinned in tests/test_multimodal.py.
    oracle="""
    SELECT doc_id AS asset_id,
           24 AS width, 16 AS height, 3 AS n_frames,
           CAST(10.0 AS DOUBLE) AS fps
    FROM documents WHERE doc_id < 12
    """,
)
def multimodal_video_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video decode end-to-end (operators.multimodal.decode_video):
    12 seeded three-frame MJPEG AVI clips built inside an Arrow-batched
    stage, then decoded — RIFF chunk walk, per-frame baseline-JPEG
    Huffman decode + IDCT — by the dependency-free codecs (no video
    library in this container; inter-frame codecs keep the honest
    per-blob gate). Narrow map end-to-end: blobs never shuffle."""
    from icerunner_spark.operators.multimodal import as_assets, decode_video

    def encode_batches(it):
        import numpy as np
        import pandas as pd

        from icerunner_spark.operators.codecs import encode_mjpeg_avi

        for pdf in it:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                y, x = np.mgrid[0:16, 0:24]
                frames = [
                    np.clip(d * 5 + f * 20 + y * 3 + x * 2, 0, 255).astype(np.uint8)
                    for f in range(3)
                ]
                blobs.append(encode_mjpeg_avi(frames, fps=10))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    d = _t(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 12)
    blobs = d.mapInPandas(encode_batches, schema="doc_id long, blob binary")
    assets = as_assets(blobs, "doc_id", "blob", kind="video",
                       content_type="video/x-msvideo")
    return decode_video(assets).select(
        "asset_id", "width", "height", "n_frames", "fps"
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    -- every sampled frame is full-size (trailing partial frames are
    -- dropped), so counts and bytes follow arithmetically from the blob
    -- length: frames = len/256, sampled = ceil(frames/4), bytes = 256*each.
    -- Frame *content* identity is pinned byte-for-byte in pytest
    -- (tests/test_multimodal.py), where blob slicing is available.
    SELECT doc_id AS asset_id,
           CAST(CEIL((octet_length(encode(text)) // 256) / 4.0) AS BIGINT) AS n_sampled,
           256 * CAST(CEIL((octet_length(encode(text)) // 256) / 4.0) AS BIGINT) AS frame_bytes
    FROM documents
    WHERE octet_length(encode(text)) >= 256
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride frame sampling (every 4th 256-byte frame) over binary
    assets — the video/audio frame-sample shape, real slicing logic in
    Arrow-batched Python. Oracle reproduces the slicing with DuckDB blob
    substring over generated frame indices."""
    from icerunner_spark.operators.multimodal import (
        documents_as_assets,
        sample_frames,
    )

    d = _t(spark, sf_dir, "documents")
    frames = sample_frames(documents_as_assets(d), frame_size=256, every=4)
    return frames.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.length("frame")).alias("frame_bytes"),
    )


@register(
    "window_tumbling_events",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows (streaming/pipeline.windowed_counts run
    in batch mode — the exact same function body drives the streaming
    path, equivalence pinned in tests/test_streaming.py). One shuffle on
    (window, event_type) with map-side partial aggregation."""
    from icerunner_spark.streaming.pipeline import windowed_counts

    e = _t(spark, sf_dir, "events").withColumn("value", _dec("value"))
    return windowed_counts(e).drop("window_end")


@register(
    "session_window_events",
    oracle="""
    WITH brk AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM brk
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user — Spark's
    native session_window operator; the oracle reproduces it with the
    gaps-and-islands rewrite (lag + running sum). Same body as the
    streaming sessionizer (streaming/pipeline.session_counts)."""
    from icerunner_spark.streaming.pipeline import session_counts

    e = _t(spark, sf_dir, "events").withColumn("value", _dec("value"))
    return session_counts(e).drop("session_end")


@register(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           GROUPING(o_orderstatus)   AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) + GROUPING() markers.
    Catalyst expands to one Expand + single hash aggregate — one shuffle
    for all four groupings, not four passes over the fact table."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               GROUPING(o_orderstatus)   AS g_status,
               GROUPING(o_orderpriority) AS g_priority,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority), ())
        """
    )


@register(
    "percentiles_lineitem",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 6) AS q25,
           ROUND(quantile_cont(l_quantity, 0.50), 6) AS q50,
           ROUND(quantile_cont(l_quantity, 0.75), 6) AS q75,
           ROUND(quantile_cont(l_extendedprice, 0.90), 6) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`). Exact percentile is a sort-based aggregate; at
    100 TB the swap is one token: percentile_approx (t-digest, mergeable,
    fixed memory) behind the same column names."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q25"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 6).alias("q50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("q75"),
        F.round(F.expr("percentile(l_extendedprice, 0.90)"), 6).alias("p90_price"),
    )


@register(
    "map_functions_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
           COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS n_distinct_k
    FROM events
    GROUP BY event_type
    """,
)
def map_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns: parse the JSON props into map<string,bigint>,
    aggregate over element_at lookups. The map stays columnar JVM-side;
    the oracle reads the same values via JSON path."""
    from pyspark.sql.types import LongType, MapType, StringType

    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", MapType(StringType(), LongType()))
    return (
        e.select("event_type", F.element_at(m, "k").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


@register(
    "higher_order_array_ops",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_positive,
           ROUND(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum'), 6) AS sum_sq,
           ROUND(list_aggregate(list_transform(embedding::DOUBLE[], x -> abs(x)), 'max'), 6) AS max_abs
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def higher_order_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (filter/transform/aggregate) over the
    embedding vectors — all lambda expressions run inside codegen, no
    Python. The id filter prunes at the scan."""
    e = _t(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    return e.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x), 6
        ).alias("sum_sq"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))), 6
        ).alias("max_abs"),
    )


# Non-aligned value bands for the range join: each band explodes into the
# fixed-width buckets it overlaps; probe rows join on their single bucket,
# then an exact range filter removes bucket-edge false positives. This
# turns a nested-loop theta join into a shuffle-free-able equi join — the
# scale path for range joins (SURVEY §2.B "Range / interval join").
_VALUE_BANDS = [
    ("tiny", 0.0, 75.0),
    ("small", 75.0, 180.0),
    ("mid", 180.0, 400.0),
    ("large", 400.0, 1000.0),
]
_BUCKET_W = 25.0


@register(
    "range_join_event_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('tiny', 0.0, 75.0), ('small', 75.0, 180.0),
               ('mid', 180.0, 400.0), ('large', 400.0, 1000.0)
    )
    SELECT b.band,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def range_join_event_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join via bucketize-and-explode: bands explode to
    covered 25-unit buckets (a few rows), events compute one bucket key,
    equi-join + exact range filter. Catalyst broadcasts the exploded band
    side; the fallback theta join (the oracle's plan) would be a
    nested-loop over every (event, band) pair."""
    e = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(_VALUE_BANDS, "band string, lo double, hi double")
    exploded = bands.select(
        "band", "lo", "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BUCKET_W).cast("long"),
                F.ceil(F.col("hi") / _BUCKET_W).cast("long"),
            )
        ).alias("bucket"),
    )
    probe = e.withColumn("bucket", F.floor(F.col("value") / _BUCKET_W).cast("long"))
    joined = probe.join(F.broadcast(exploded), "bucket").filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_events"),
        _money_sum(_dec("value")).alias("total_value"),
    )


@register(
    "string_agg_nations",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list -> array_sort -> array_join
    (Spark's deterministic listagg equivalent; collect_list alone is
    arrival-ordered and non-deterministic under parallelism — sorting
    inside the aggregate restores engine-independent output)."""
    n, r = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "lead_lag_order_gaps",
    oracle="""
    WITH g AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               lag(o_orderdate)  OVER w AS prev_date,
               lead(o_orderdate) OVER w AS next_date,
               ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, o_orderkey, quartile,
           CAST(date_diff('day', prev_date, o_orderdate) AS BIGINT) AS days_since_prev,
           CAST(date_diff('day', o_orderdate, next_date) AS BIGINT) AS days_to_next
    FROM g
    WHERE o_custkey < 500
    """,
)
def lead_lag_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions lead/lag/ntile with a deterministic
    (date, key) ordering. One shuffle on o_custkey serves all three
    window functions (same window spec => single Window exec)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.filter(F.col("o_custkey") < 500)
        .select(
            "o_custkey",
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).cast("long").alias("days_since_prev"),
            F.datediff(
                F.lead("o_orderdate").over(w), F.col("o_orderdate")
            ).cast("long").alias("days_to_next"),
        )
    )


@register(
    "exists_subquery_large_orders",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
    GROUP BY c.c_mktsegment
    """,
)
def exists_subquery_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the spark.sql parser path
    (the reference's entire query surface is SQL strings via its sql()
    passthrough, icerunner.py:200-207). Catalyst rewrites both subqueries
    into semi/anti joins — same physical plan as the DataFrame variant."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_ex")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_ex")
    return spark.sql(
        """
        SELECT c.c_mktsegment, COUNT(*) AS n_customers
        FROM customer_ex c
        WHERE EXISTS (SELECT 1 FROM orders_ex o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders_ex o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        GROUP BY c.c_mktsegment
        """
    )


@register(
    "sampled_systematic_agg",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_sampled,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sampled_total
    FROM orders
    WHERE o_orderkey % 20 = 0
    GROUP BY o_orderstatus
    """,
)
def sampled_systematic_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% systematic sample (key mod 20) + aggregate —
    the cross-engine-reproducible stand-in for TABLESAMPLE (Bernoulli
    df.sample(fraction, seed) exists but draws engine-specific randoms,
    so it can't hash-match an oracle). The modulo predicate still pushes
    to the scan."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") % 20 == 0)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            _money_sum(_dec("o_totalprice")).alias("sampled_total"),
        )
    )


@register("doc_winnowing_fingerprints")
def doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via winnowing (rolling-hash min selection,
    functions.text.winnowing_fingerprints). Fingerprint values are
    xxhash64-specific => no cross-engine oracle; selection guarantees are
    pinned in tests/test_operators.py (shared substrings => shared
    fingerprints)."""
    from icerunner_spark.operators.text import winnowing_fingerprint_table

    d = _t(spark, sf_dir, "documents")
    out = winnowing_fingerprint_table(d, "doc_id", "text")
    return out.select(
        F.col("id").alias("doc_id"),
        F.size("fps").alias("n_fingerprints"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


@register(
    "grouped_user_trends",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(regr_slope(value, epoch(ts)), 12) AS slope,
           ROUND(regr_intercept(value, epoch(ts)), 2) AS intercept,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS mean_value
    FROM events
    GROUP BY user_id
    """,
)
def grouped_user_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregation in the Python worker (operators.grouped):
    per-user least-squares value trend, numpy closed form. Runs the
    mapInPandas whole-partition vectorized variant (one pandas groupby
    per partition — ~5x faster than per-group applyInPandas dispatch on
    many small groups; both variants pinned equal in tests). The oracle
    recomputes with SQL regr_slope/intercept — verifying the whole
    Arrow->pandas->numpy->Arrow round trip numerically. One shuffle on
    user_id; groups never touch the driver."""
    from icerunner_spark.operators.grouped import user_value_trends_vectorized

    e = _t(spark, sf_dir, "events")
    out = user_value_trends_vectorized(e)
    return out.select(
        "user_id",
        "n_events",
        F.round("slope", 12).alias("slope"),
        F.round("intercept", 2).alias("intercept"),
        F.round("mean_value", 6).alias("mean_value"),
    )


# --------------------------------------------------------------------------- #
# Approximate / sketch aggregates — the 100 TB cardinality toolbox
# --------------------------------------------------------------------------- #


@register("approx_distinct_parts")  # approximate: rows-only driver check;
# relative error vs exact COUNT(DISTINCT) pinned in tests/test_operators.py
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-part counts per return flag
    (approx_count_distinct, rsd=1%). The at-scale spelling of
    COUNT(DISTINCT): exact distinct re-shuffles the fact table on the
    distinct key (a second full shuffle); HLL keeps one fixed-size sketch
    per group, merged map-side — the shuffle carries kilobytes instead of
    the key universe. Hash-based, no RNG: deterministic for a given
    input, so the rows-only driver check is stable."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register("hll_sketch_union_parts")  # sketch buffers: rows-only driver check;
# estimate error + union-vs-global consistency pinned in tests
def hll_sketch_union_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via hll_sketch_agg /
    hll_union_agg): build one sketch per order-status group, then union
    the group sketches into a global estimate WITHOUT rescanning the
    facts. This is the sketch contract a 100 TB pipeline relies on —
    per-partition/per-day sketches persisted small and unioned later give
    any rollup's distinct count from metadata-sized state."""
    o = _t(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return per_group.groupBy().agg(
        F.sum("n_rows").alias("n_rows_total"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_custkeys"),
    )


@register("approx_quantiles_totalprice")  # approximate: rows-only driver
# check; rank error vs exact percentile_disc pinned in tests
def approx_quantiles_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles (percentile_approx,
    accuracy=10000) of order value per status. Exact percentiles need a
    full sort per group; GK summaries are fixed-size and merge map-side,
    so quantiles of a 100 TB column cost one aggregation pass.
    Deterministic (no sampling) => stable rows-only check."""
    o = _t(spark, sf_dir, "orders")
    qs = F.percentile_approx(
        _dec("o_totalprice").cast("double"),
        F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.95)]),
        F.lit(10000),
    )
    return (
        o.groupBy("o_orderstatus")
        .agg(qs.alias("q"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            "o_orderstatus",
            "n_rows",
            F.round(F.col("q")[0], 2).alias("p25"),
            F.round(F.col("q")[1], 2).alias("p50"),
            F.round(F.col("q")[2], 2).alias("p75"),
            F.round(F.col("q")[3], 2).alias("p95"),
        )
    )


# --------------------------------------------------------------------------- #
# Pivot / full outer join / correlated scalar subquery / UDTF — §2.B long tail
# --------------------------------------------------------------------------- #


@register(
    "pivot_revenue_by_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS total_f,
           CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS total_o,
           CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS total_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (priority x status revenue matrix). Explicit value list
    ['F','O','P'] matters at scale: without it Spark runs an extra
    distinct job over the fact table just to discover column headers.
    With it, pivot compiles to one hash aggregate with conditional sums —
    exactly the oracle's CASE WHEN spelling, one shuffle, no extra scan."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(_money_sum(_dec("o_totalprice")))
    )
    return piv.select(
        "o_orderpriority",
        F.col("F").alias("total_f"),
        F.col("O").alias("total_o"),
        F.col("P").alias("total_p"),
    )


@register(
    "unpivot_revenue_matrix",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus AS status,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def unpivot_revenue_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): widen revenue to a (priority x status) matrix with
    pivot, then melt it back to tidy rows — landing exactly on the plain
    two-key aggregate the oracle computes directly. Round-tripping
    through both reshapes proves ids/values wiring on each side. Scale:
    unpivot is a zero-shuffle projection (each row expands to |values|
    rows map-side)."""
    o = _t(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(_money_sum(_dec("o_totalprice")))
    )
    return (
        wide.unpivot(
            ids=["o_orderpriority"],
            values=["F", "O", "P"],
            variableColumnName="status",
            valueColumnName="total",
        )
        .filter(F.col("total").isNotNull())
    )


@register(
    "range_frame_rolling_value",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS rolling_1h_value
    FROM events
    """,
)
def range_frame_rolling_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (time-based, not row-based): per user, the
    value sum over the trailing hour INCLUDING simultaneous events —
    the frame the rows-based spelling cannot express. Spark's
    rangeBetween needs a numeric ordering key, so the frame runs over
    epoch microseconds with a 3.6e9 us lookback — semantically identical
    to the oracle's INTERVAL frame (ties included on both engines).
    Scale: one shuffle on user_id, one in-partition sort; frame
    evaluation is streaming within the sort."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum(_dec("value")).over(w), 2).cast("double").alias(
            "rolling_1h_value"
        ),
    )


@register(
    "full_outer_monthly_volumes",
    oracle="""
    WITH om AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS ym,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS order_total
        FROM orders GROUP BY 1
    ), sm AS (
        SELECT strftime(l_shipdate, '%Y-%m') AS ym,
               COUNT(*) AS n_ships,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS ship_qty
        FROM lineitem GROUP BY 1
    )
    SELECT COALESCE(om.ym, sm.ym) AS ym,
           COALESCE(om.n_orders, 0) AS n_orders,
           om.order_total AS order_total,
           COALESCE(sm.n_ships, 0) AS n_ships,
           sm.ship_qty AS ship_qty
    FROM om FULL OUTER JOIN sm ON om.ym = sm.ym
    """,
)
def full_outer_monthly_volumes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER equi-join of two pre-aggregated monthly rollups (order
    revenue vs shipped quantity). Ship months trail order months by ~3
    months, so the right side genuinely contributes unmatched rows.
    Scale: both inputs aggregate DOWN to ~|months| rows before the join —
    the outer join runs on tiny relations (AQE turns it into a broadcast);
    joining the raw facts first would shuffle everything for nothing."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    om = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _money_sum(_dec("o_totalprice")).alias("order_total"),
    )
    sm = li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ym")).agg(
        F.count(F.lit(1)).alias("n_ships"),
        _money_sum(_dec("l_quantity")).alias("ship_qty"),
    )
    j = om.alias("om").join(sm.alias("sm"), on="ym", how="full_outer")
    return j.select(
        # full outer on="ym" coalesces the key for us
        "ym",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        "order_total",
        F.coalesce("n_ships", F.lit(0)).alias("n_ships"),
        "ship_qty",
    )


@register(
    "correlated_scalar_subquery_orders",
    oracle="""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_above,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_above
    FROM orders o
    WHERE CAST(o.o_totalprice AS DECIMAL(12,2)) *
          (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) >
          2 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(12,2))) FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
    GROUP BY o.o_orderstatus
    """,
)
def correlated_scalar_subquery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated *scalar* subqueries (aggregate per outer row): orders
    worth more than 2x their customer's average order. Stated as
    price*count > 2*sum so the comparison is exact decimal arithmetic on
    both engines (a double AVG could flip boundary rows). Catalyst
    de-correlates both subqueries into one aggregate-then-join on
    o_custkey — the fact table is scanned twice but shuffled once each,
    no per-row re-execution (the naive nested-loop reading)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_csq")
    return spark.sql(
        """
        SELECT o.o_orderstatus,
               COUNT(*) AS n_above,
               CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_above
        FROM orders_csq o
        WHERE CAST(o.o_totalprice AS DECIMAL(12,2)) *
              (SELECT COUNT(*) FROM orders_csq o2 WHERE o2.o_custkey = o.o_custkey) >
              2 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(12,2))) FROM orders_csq o3 WHERE o3.o_custkey = o.o_custkey)
        GROUP BY o.o_orderstatus
        """
    )


@register(
    "udtf_token_explode",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS BIGINT) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id % 10 = 0
    """,
)
def udtf_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF through the LATERAL join path (functions.udtfs
    .SplitTokens): one row in, N (pos, token) rows out, computed in the
    Python worker. The oracle re-derives the same expansion with DuckDB
    list functions. Scale: the UDTF streams Arrow batches per partition —
    expansion factor, not table size, bounds task memory. For pure
    splitting the JVM spelling explode(split()) wins (see
    text_token_stats); this query is the extension-surface proof."""
    from icerunner_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    ).createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.token
        FROM docs_udtf d, LATERAL split_tokens(d.text) s
        """
    )


@register(
    "stream_join_view_purchases",
    oracle="""
    SELECT p.user_id AS user_id,
           p.event_id AS purchase_id,
           v.event_id AS view_id,
           epoch_us(v.ts) AS view_us,
           epoch_us(p.ts) AS purchase_us,
           ROUND(p.value, 2) AS purchase_value
    FROM events v
    JOIN events p
      ON v.event_type = 'view' AND p.event_type = 'purchase'
     AND v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL '1 hour'
    """,
)
def stream_join_view_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream interval join's transformation body
    (streaming.view_purchase_attribution) run in batch mode — the same
    function passes tests/test_streaming.py's stream==batch equivalence
    with multi-micro-batch availableNow execution; here the DuckDB oracle
    checks the join semantics themselves. Timestamps compare as epoch
    microseconds (integer ns-div-1000 on both engines — double division
    drifts +-1 us)."""
    from icerunner_spark.streaming import view_purchase_attribution

    e = _t(spark, sf_dir, "events")
    out = view_purchase_attribution(e)
    return out.select(
        "user_id",
        "purchase_id",
        "view_id",
        F.unix_micros("view_ts").alias("view_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "purchase_value",
    )


@register(
    "stream_exactly_once_ingest",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_value
    FROM events GROUP BY event_type
    """,
)
def stream_exactly_once_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingest into the snapshot format
    (streaming.pipeline.append_stream_to_table — the Iceberg/Flink sink
    shape): the events fixture drains file-by-file through foreachBatch,
    each microbatch committing via IceTable.append_once with a batch-id
    high-water mark stamped INSIDE the table commit (snapshot summary +
    an expiry-surviving table property). The second drain simulates the
    crash-replay failure mode — same writer id, fresh checkpoint, batch
    ids restart at 0 — and every batch is skipped as a replay, so the
    aggregate over the ingested table equals the oracle's aggregate over
    the raw source EXACTLY; at-least-once delivery would double it.
    foreachBatch alone cannot do this: a crash between the table commit
    and Spark's checkpoint commit replays the batch."""
    from icerunner_spark.connector import Connector
    from icerunner_spark.streaming.pipeline import (
        append_stream_to_table,
        read_events_stream,
    )

    wh = _demo_warehouse("icerunner_stream_ingest", sf_dir)
    c = Connector(spark, wh)
    t = c.catalog.table("events_ingest")
    events_dir = os.path.join(sf_dir, "events.parquet")
    if os.path.isfile(events_dir):
        # the file-stream source wants a directory; hard-link the single
        # fixture file into one (zero-copy)
        d = os.path.join(wh, "_src")
        os.makedirs(d, exist_ok=True)
        try:
            os.link(events_dir, os.path.join(d, "events-0.parquet"))
        except OSError:
            shutil.copy(events_dir, os.path.join(d, "events-0.parquet"))
        events_dir = d
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    append_stream_to_table(
        stream, t, checkpoint_dir=os.path.join(wh, "_ingest_ckpt"),
        writer_id="ingest",
    )
    replayed = append_stream_to_table(
        stream, t, checkpoint_dir=os.path.join(wh, "_replay_ckpt"),
        writer_id="ingest",
    )
    assert replayed == 0, "replayed batches must not re-apply"
    return t.scan().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        _money_sum(_dec("value")).alias("total_value"),
    )


@register("similarity_knn_join")  # approximate: rows-only driver check;
# recall vs per-query brute force pinned in tests/test_operators.py
def similarity_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN k-NN join (operators.similarity.knn_join): top-5
    neighbors for every one of 20 query vectors against the rest of the
    corpus in ONE bucket-equi-join — the shape embedding dedup/retrieval
    pipelines run at corpus scale, where per-query loops are impossible."""
    from icerunner_spark.operators.similarity import knn_join

    e = _t(spark, sf_dir, "embeddings")
    queries_df = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = e.filter(F.col("vec_id") >= 20)
    # 8 planes x hamming<=2 probes = 37/256 buckets ~ 14% of the corpus
    # per query (fraction pinned <25% in tests/test_operators.py; the
    # r1-r2 6-plane config probed 34% — too coarse to call an index)
    out = knn_join(queries_df, corpus, k=5, n_planes=8, probe_hamming=2)
    return out.select(
        "q_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rn"
    )


@register("similarity_quantized_topk")  # approximate: rows-only driver
# check; int8 top-k vs full-precision recall pinned in tests
def similarity_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over int8-quantized embeddings (operators.similarity
    .quantize_embeddings): score against the 4-8x-smaller quantized
    column, the shape a 100 TB corpus scans; the recall-vs-exact pin in
    tests shows int8 loses almost nothing for cosine ranking."""
    from icerunner_spark.operators.similarity import (
        cosine_topk,
        dequantize,
        quantize_embeddings,
    )

    e = _t(spark, sf_dir, "embeddings")
    row = e.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in row["embedding"]]
    qz = quantize_embeddings(e.filter(F.col("vec_id") != 0)).select(
        "vec_id", dequantize("q_embedding", "q_scale").alias("embedding")
    )
    return cosine_topk(qz, qvec, k=10).select(
        "vec_id", F.round("cos_sim", 6).alias("cos_sim")
    )


# Trained ANN index artifacts (IVF centroids / PQ codebooks), one per
# (process, sf_dir): training is the INDEX BUILD — Lloyd-refined,
# deterministic, run once and reused across queries like any ANN system
# amortizes its build. Steady-state query latency (what the bench's
# min-of-2 reports) excludes it; a cold process pays it once.
_ANN_INDEX: dict[tuple, object] = {}


def _ivf_index(spark: SparkSession, sf_dir: str) -> list:
    from icerunner_spark.operators.similarity import _deterministic_centroids

    key = ("ivf", os.path.normpath(sf_dir))
    if key not in _ANN_INDEX:
        _ANN_INDEX[key] = _deterministic_centroids(
            _t(spark, sf_dir, "embeddings"),
            vec_col="embedding",
            id_col="vec_id",
            n_centroids=16,
        )
    return _ANN_INDEX[key]


def _pq_codebook_budget(n_vectors: int) -> int:
    """Codes per subspace as a function of corpus size (r10 verdict
    item 4 — the budget RULE, not a fixed ask): n_codes = 32 at the
    2k-vector baseline, growing with sqrt(N) and clamped to [32, 256]
    so codes stay 1 byte. Rationale: at fixed m, per-subspace
    quantization error sets the ADC ranking noise floor, and the number
    of true-neighbor-vs-distractor inversions grows with the candidate
    pool, so resolution must grow with the corpus — the r8..r10 probes
    measured fixed 8x32 books at recall@10 = 1.00 / 0.84 / 0.72 over
    sf0.1/1/2, a pure budget artifact (the fixture's codebook stayed
    flat while distractors scaled 20x). sqrt keeps training cost (one
    encode pass x n_codes argmin) sub-linear in N."""
    import math as _math

    return max(32, min(256, 32 * int(_math.ceil(_math.sqrt(n_vectors / 2000.0)))))


def _pq_index(spark: SparkSession, sf_dir: str) -> list:
    from icerunner_spark.operators.similarity import pq_train_codebooks

    # m=8 (code width: 8 B/row vs the embedding's 256 B) with the
    # corpus-scaled n_codes budget above: r8 bought sf1 recall with
    # resolution (4x16 -> 8x32: 0.44 -> 0.84), r11 makes that a RULE so
    # the sf2 probe measures the production configuration instead of a
    # frozen fixture codebook.
    key = ("pq", os.path.normpath(sf_dir))
    if key not in _ANN_INDEX:
        e = _t(spark, sf_dir, "embeddings")
        _ANN_INDEX[key] = pq_train_codebooks(
            e, m=8, n_codes=_pq_codebook_budget(e.count())
        )
    return _ANN_INDEX[key]


@register("similarity_ann_ivf")
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate top-k (operators.similarity.ivf_topk):
    Lloyd-refined coarse quantizer (trained once per corpus — the index
    build; cached in _ANN_INDEX), probe the n_probe nearest cells, exact
    rescore. Approximate => rows-only driver check; recall pinned vs
    brute force in tests/test_operators.py."""
    from icerunner_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    row = e.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in row["embedding"]]
    return ivf_topk(
        e.filter(F.col("vec_id") != 0),
        qvec,
        k=10,
        n_centroids=16,
        n_probe=8,
        centroids=_ivf_index(spark, sf_dir),
    ).select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


# --------------------------------------------------------------------------- #
# PII redaction — SURVEY §2.C text analysis (training-corpus scrubbing)
# --------------------------------------------------------------------------- #


def _pii_oracle() -> str:
    """Oracle assembled from the SAME pattern table the operator uses —
    one source of truth for the regex chain and its order."""
    from icerunner_spark.functions.text import PII_PATTERNS

    red = "text"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    counts = ",\n           ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{kind}"
        for kind, pat, _ in PII_PATTERNS
    )
    return f"""
    SELECT doc_id,
           md5({red}) AS redacted_md5,
           {counts}
    FROM documents
    """


def _sql_udf_oracle() -> str:
    """Assembled from the same PII pattern table as the operator — one
    source of truth for the redact chain, like _pii_oracle."""
    from icerunner_spark.functions.text import PII_PATTERNS

    red = "d.text"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings
      WHERE vec_id = 0 LIMIT 1
    )
    SELECT d.doc_id,
           len(regexp_extract_all(lower(d.text),
               '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_tokens,
           length({red}) AS n_chars_redacted,
           substr(md5(CAST(d.doc_id AS VARCHAR) || '-udf'), 1, 8) AS bucket,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
               AS cos_q
    FROM documents d
    JOIN embeddings e ON e.vec_id = d.doc_id, q
    WHERE d.doc_id % 11 = 0
    """


@register("sql_udf_surface", oracle=_sql_udf_oracle())
def sql_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's primitives driven PURELY through SQL text — the way
    a remote Flight sql-ticket / CLI user consumes them: Spark 4 SQL
    UDFs (functions/sql_udfs.py) put ice_token_count / ice_redact_pii /
    ice_md5_bucket / ice_cos_sim in scope, and Catalyst INLINES the
    bodies at analysis (expression macros, not Python — the plan is
    whole-stage codegen, identical to the Column-builder originals;
    equality is pinned in tests/test_plans.py). The oracle re-derives
    every value with DuckDB-native expressions, proving the SQL surface
    computes exactly what the DataFrame surface does. The query vector
    is a LIMIT-bounded broadcast; the doc-embedding join is a plain
    equi-join AQE is free to shape."""
    from icerunner_spark.functions.sql_udfs import register_sql_functions

    register_sql_functions(spark)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    _t(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql("""
        WITH q AS (
          SELECT embedding FROM embeddings WHERE vec_id = 0 LIMIT 1
        )
        SELECT /*+ BROADCAST(q) */
               d.doc_id,
               CAST(ice_token_count(d.text) AS BIGINT) AS n_tokens,
               CAST(length(ice_redact_pii(d.text)) AS BIGINT)
                   AS n_chars_redacted,
               ice_md5_bucket(CAST(d.doc_id AS STRING), 'udf') AS bucket,
               ROUND(ice_cos_sim(CAST(e.embedding AS ARRAY<DOUBLE>),
                                 CAST(q.embedding AS ARRAY<DOUBLE>)), 6)
                   AS cos_q
        FROM documents d
        JOIN embeddings e ON e.vec_id = d.doc_id
        CROSS JOIN q
        WHERE d.doc_id % 11 = 0
    """)


@register("pii_redact_documents", oracle=_pii_oracle())
def pii_redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (functions.text.redact_pii): emails / SSNs / phone
    numbers / IPv4 addresses replaced by typed placeholder tokens, plus
    per-kind match counts for auditing. A pure JVM regexp_replace chain —
    codegen, narrow map, no shuffle: scan-speed at 100 TB. Patterns are
    restricted to the Java-regex/RE2 common subset so the DuckDB oracle
    evaluates the identical chain; planted-PII exactness is pinned in
    tests/test_operators.py."""
    from icerunner_spark.functions.text import pii_counts, redact_pii

    # spread the regex chain before it runs: the fixture scans as one
    # task (single-row-group parquet) and the five-pattern redaction +
    # count expressions are scan-disproportionate. In-process A/B:
    # 0.63 -> 0.24 s min, rows identical. GATED on detected
    # under-parallelism (r12, r11 verdict item 2): the exchanged payload
    # here is the document TEXT, so an unconditional spread would be a
    # corpus-sized exchange at 100 TB — _spread_if_narrow skips it when
    # the scan already has >= cores partitions.
    d = _spread_if_narrow(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    cols = [
        F.col("doc_id"),
        F.md5(redact_pii("text")).alias("redacted_md5"),
    ]
    for kind, cnt in pii_counts("text").items():
        cols.append(cnt.alias(f"n_{kind}"))
    return d.select(*cols)


@register(
    "snapshot_compaction_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey < 500
    """,
)
def snapshot_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (IceTable.compact — Iceberg
    rewrite_data_files parity): build a table through several small
    appends, compact into one right-sized file, and scan — rows must be
    byte-identical to the uncompacted source. The 'replace' snapshot
    carries no delta, so CDC readers skip it (pinned in
    tests/test_table.py)."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_compact_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).filter(F.col("o_orderkey") < 500)
    t = c.catalog.table("orders_compact")
    t.create(orders.filter(F.col("o_orderkey") < 100))
    t.append(orders.filter((F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 300)))
    t.append(orders.filter(F.col("o_orderkey") >= 300))
    files_before = len(t.current_snapshot().manifest)
    t.compact()
    assert len(t.current_snapshot().manifest) <= files_before
    return t.scan()


@register(
    "iceberg_export_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice AS price, o_orderdate
    FROM orders
    WHERE o_orderkey < 400 AND o_orderkey % 7 <> 0
    """,
)
def iceberg_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache Iceberg v2 interop (iceberg_export.export_iceberg /
    read_iceberg — the cross-engine direction the reference gets from
    PyIceberg, icerunner.py:60-103): build a snapshot table with hidden
    year-partitioning, a merge-on-read positional delete, and a rename,
    export it as a spec-conformant Iceberg metadata tree (pure-Python
    Avro manifests, hard-linked data files, name-mapping for the
    rename), then read the EXPORTED tree back and return its rows — the
    oracle recomputes the surviving set straight from the source table,
    so any infidelity in manifests, partition values, delete rewrite, or
    name-mapping shows up as a value mismatch. Scale: export is
    O(files + commits) driver-side metadata work (manifests are reused
    across snapshots, Iceberg's own indirection); the import is ordinary
    grouped parquet scans with broadcast position-delete anti-joins —
    data never moves through Python."""
    from icerunner_spark.iceberg_export import export_iceberg, read_iceberg
    from icerunner_spark.table import IceTable

    wh = _demo_warehouse("icerunner_iceberg_demo", sf_dir)
    src = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    ).filter(F.col("o_orderkey") < 400)
    t = IceTable(spark, os.path.join(wh, "orders_ice"))
    # 400 demo rows: single-task writes + year() granularity keep the
    # file count to one per year partition (month() over the 7-year
    # order-date domain fans 400 rows into ~160 tiny files, all of which
    # the export links and manifests; the epoch-based transform
    # conversion is exercised identically either way)
    t.create(
        src.filter(F.col("o_orderkey") < 200).coalesce(1),
        partition_by=["year(o_orderdate)"],
    )
    t.append(src.filter(F.col("o_orderkey") >= 200).coalesce(1))
    t.delete_where(F.col("o_orderkey") % 7 == 0, mode="merge-on-read")
    t.rename_column("o_totalprice", "price")
    dest = os.path.join(wh, "orders_iceberg")
    export_iceberg(t, dest)
    return read_iceberg(spark, dest).select(
        "o_orderkey", "o_custkey", "price", "o_orderdate"
    )


@register(
    "iceberg_incremental_mirror",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey < 600 AND o_orderkey % 5 <> 0
    """,
)
def iceberg_incremental_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental Iceberg re-export (iceberg_export: same-dest export is
    O(delta)): export a table, advance it with an append and a
    merge-on-read delete, re-export to the SAME destination — previous
    manifests seed the reuse cache, the table-uuid is preserved, and
    v2.metadata.json chains to v1 through metadata-log — then read the
    re-exported tree. The continuous-mirror shape: at a 100 TB warehouse
    the per-sync cost is the new commits' metadata + hard links, never a
    re-walk of the table. Oracle recomputes the final surviving set from
    the source."""
    from icerunner_spark.iceberg_export import export_iceberg, read_iceberg
    from icerunner_spark.table import IceTable

    wh = _demo_warehouse("icerunner_iceberg_inc_demo", sf_dir)
    src = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).filter(F.col("o_orderkey") < 600)
    t = IceTable(spark, os.path.join(wh, "orders_ice"))
    t.create(src.filter(F.col("o_orderkey") < 300).coalesce(1))
    dest = os.path.join(wh, "orders_iceberg")
    export_iceberg(t, dest)
    t.append(src.filter(F.col("o_orderkey") >= 300).coalesce(1))
    t.delete_where(F.col("o_orderkey") % 5 == 0, mode="merge-on-read")
    meta_path = export_iceberg(t, dest)
    assert meta_path.endswith("v2.metadata.json")
    return read_iceberg(spark, dest)


@register(
    "iceberg_eq_delete_import",
    oracle="""
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer
    WHERE c_custkey < 300
      AND NOT (c_custkey % 6 = 0 AND c_custkey < 150)
      AND c_custkey % 50 <> 0
    """,
)
def iceberg_eq_delete_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-table import with EQUALITY deletes (read_iceberg,
    content=2 — the delete form Flink CDC upserts write; the reference
    reads such tables through PyIceberg, icerunner.py:60-103): build an
    Iceberg v2 tree by hand the way a foreign engine would (two data
    files at sequences 1 and 2, two equality-delete files keyed on
    c_custkey at sequences 2 and 3 — the seq-2 delete applies only to
    the seq-1 file, the spec's strict-less rule), then read it back.
    The oracle recomputes the surviving set from the raw fixture, so a
    sequencing or key-matching error is a value mismatch. Scale: eq
    deletes group by equality_ids into ONE anti join each, null-safe
    keys compile to hash-join keys (coalesce+isnull), and the delete
    side only broadcasts under a size threshold — data files never
    shuffle through Python."""
    import json

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from icerunner_spark import iceavro
    from icerunner_spark.iceberg_export import (
        _MANIFEST_FILE_SCHEMA,
        _manifest_entry_schema,
        _uri,
        read_iceberg,
    )

    wh = _demo_warehouse("icerunner_iceberg_eq_demo", sf_dir)
    dest = os.path.join(wh, "cdc_customer")
    os.makedirs(os.path.join(dest, "data"))
    os.makedirs(os.path.join(dest, "metadata"))
    src = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal"],
    )
    src = src.filter(pc.less(src["c_custkey"], 300)).combine_chunks()
    keys = src["c_custkey"]

    def _data(name, tbl):
        p = os.path.join(dest, "data", name)
        pq.write_table(tbl, p)
        return p

    f1 = _data("f1.parquet", src.filter(pc.less(keys, 150)))
    f2 = _data("f2.parquet", src.filter(pc.greater_equal(keys, 150)))
    all_keys = keys.to_pylist()
    d1 = _data(
        "d1.parquet",
        pa.table({"c_custkey": pa.array(
            sorted({k for k in all_keys if k % 6 == 0}), pa.int64()
        )}),
    )
    d2 = _data(
        "d2.parquet",
        pa.table({"c_custkey": pa.array(
            sorted({k for k in all_keys if k % 50 == 0}), pa.int64()
        )}),
    )

    def _entry(content, path, seq, eq_ids=None):
        return {
            "status": 1,
            "snapshot_id": 11,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": content,
                "file_path": _uri(path),
                "file_format": "PARQUET",
                "partition": {},
                "record_count": pq.read_metadata(path).num_rows,
                "file_size_in_bytes": os.path.getsize(path),
                "null_value_counts": None,
                "lower_bounds": None,
                "upper_bounds": None,
                "equality_ids": eq_ids,
                "sort_order_id": None,
            },
        }

    entry_schema = _manifest_entry_schema([])
    m_data = os.path.join(dest, "metadata", "m-data.avro")
    iceavro.write_ocf(
        m_data, entry_schema,
        [_entry(0, f1, 1), _entry(0, f2, 2)],
        metadata={"content": "data", "partition-spec-id": "0"},
    )
    m_del = os.path.join(dest, "metadata", "m-del.avro")
    iceavro.write_ocf(
        m_del, entry_schema,
        [_entry(2, d1, 2, eq_ids=[1]), _entry(2, d2, 3, eq_ids=[1])],
        metadata={"content": "deletes", "partition-spec-id": "0"},
    )

    def _mf(path, content, seq):
        return {
            "manifest_path": _uri(path),
            "manifest_length": os.path.getsize(path),
            "partition_spec_id": 0,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": 1,
            "added_snapshot_id": 11,
            "added_files_count": 2,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": 1,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": None,
        }

    ml = os.path.join(dest, "metadata", "snap-11-manifest-list.avro")
    iceavro.write_ocf(
        ml, _MANIFEST_FILE_SCHEMA,
        [_mf(m_data, 0, 2), _mf(m_del, 1, 3)],
        metadata={"format-version": "2", "snapshot-id": "11"},
    )
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000000b",
        "location": _uri(dest),
        "last-sequence-number": 3,
        "last-updated-ms": 0,
        "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [{
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "c_custkey", "required": False,
                 "type": "long"},
                {"id": 2, "name": "c_name", "required": False,
                 "type": "string"},
                {"id": 3, "name": "acctbal", "required": False,
                 "type": "double"},
            ],
        }],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        # name-mapping resolves the renamed acctbal column (physical
        # c_acctbal) — the same id-less-parquet mechanism the export uses
        "properties": {"schema.name-mapping.default": json.dumps([
            {"field-id": 1, "names": ["c_custkey"]},
            {"field-id": 2, "names": ["c_name"]},
            {"field-id": 3, "names": ["acctbal", "c_acctbal"]},
        ])},
        "current-snapshot-id": 11,
        "snapshots": [{
            "snapshot-id": 11,
            "sequence-number": 3,
            "timestamp-ms": 0,
            "manifest-list": _uri(ml),
            "summary": {"operation": "overwrite"},
            "schema-id": 0,
        }],
        "snapshot-log": [],
        "metadata-log": [],
        "refs": {"main": {"snapshot-id": 11, "type": "branch"}},
    }
    with open(os.path.join(dest, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(dest, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    return read_iceberg(spark, dest)


@register(
    "iceberg_pruned_import",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(CAST(o_totalprice AS DOUBLE), 2) AS totalprice
    FROM orders
    WHERE o_orderkey < 20000 AND o_orderstatus = 'F'
      AND o_totalprice > 150000
    """,
)
def iceberg_pruned_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-pushdown import: export an identity-partitioned,
    sort-clustered table as Iceberg v2 metadata (deflate-codec Avro —
    Java Iceberg's default wire form), then read it back through
    read_iceberg(where=). The partition conjunct prunes whole partition
    dirs and the range conjunct prunes via per-file column bounds AT
    PLANNING TIME (before any parquet footer is read — the pruning a
    1000-executor reader of a 100 TB foreign table lives on); the
    residual Catalyst filter makes the result exact, which is what the
    oracle checks. File-skip behavior itself is pinned by footer-read
    counts in tests/test_iceberg_export.py."""
    from icerunner_spark.iceberg_export import export_iceberg, read_iceberg
    from icerunner_spark.table import IceTable

    wh = _demo_warehouse("icerunner_iceberg_prune_demo", sf_dir)
    t = IceTable(spark, os.path.join(wh, "orders_part"))
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    # demo-sized write fan-out (same rationale as the other iceberg
    # demos, commit df385a6): two writer tasks x 3 status partitions = 6
    # files; the file-skip behavior itself is pinned by footer counts in
    # tests/test_iceberg_export.py, this entry's job is oracle exactness
    t.create(
        o.coalesce(2),
        partition_by=["o_orderstatus"],
        properties={"write.sort.columns": "o_totalprice"},
    )
    dest = os.path.join(wh, "orders_ice")
    export_iceberg(t, dest, avro_codec="deflate")
    out = read_iceberg(
        spark,
        dest,
        where=[("o_orderstatus", "=", "F"), ("o_totalprice", ">", 150000.0)],
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("totalprice"),
    )


@register(
    "leakage_safe_split_documents",
    oracle="""
    WITH k AS (
        SELECT doc_id,
               substr(md5(coalesce(
                              lower(regexp_replace(text, '\\s+', ' ', 'g')),
                              CAST(doc_id AS VARCHAR), '')
                          || '-split'), 1, 8) AS h
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN h < 'cccccccc' THEN 'train'
                WHEN h < 'e6666666' THEN 'val'
                ELSE 'test' END AS split
    FROM k
    """,
)
def leakage_safe_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment
    (operators.corpus.leakage_safe_split): the md5 split bucket hashes
    the document's DUPLICATE-GROUP key — here the exact-dup equivalence
    class (normalized text), in production the near-dup cluster id from
    resolve_near_duplicates — so no duplicate can straddle a split
    boundary (the eval-contamination failure mode of id-hashed splits).
    Deterministic and engine-portable like stratified_sample (md5, not
    seed-dependent sampling); a pure narrow projection — assigning
    splits to 100 TB is a scan. Oracle replays the md5 ladder exactly
    (thresholds cccccccc/e6666666 = rate_to_hex_threshold(0.8/0.9));
    the group-atomicity guarantee itself is pinned in
    tests/test_corpus.py (all members of a duplicate group share one
    split)."""
    from icerunner_spark.operators.corpus import leakage_safe_split

    d = _t(spark, sf_dir, "documents")
    out = leakage_safe_split(
        d, "doc_id", "text",
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    return out.select("doc_id", "split")


@register(
    "hard_negative_mining",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               regexp_extract_all(lower(text),
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') AS t
        FROM documents
    ),
    toks AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, GREATEST(len(t) - 2, 1) + 1),
                   i -> COALESCE(array_to_string(t[i:i+2], ' '), '')))) AS tok
        FROM t
    ),
    stats AS (SELECT COUNT(*) AS n_docs FROM documents),
    tdf AS (
        SELECT tok, COUNT(*) AS dfreq FROM toks GROUP BY tok
        HAVING COUNT(*) BETWEEN 2 AND 64
    ),
    posts AS (
        SELECT t.doc_id, t.tok,
               CAST((SELECT n_docs FROM stats) // dfreq AS BIGINT) AS w
        FROM toks t JOIN tdf USING (tok)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM posts GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2,
               COUNT(*) AS shared, CAST(SUM(a.w) AS BIGINT) AS score
        FROM posts a JOIN posts b
          ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    flt AS (
        SELECT id1, id2, shared, score
        FROM pairs
        JOIN sizes s1 ON s1.doc_id = id1
        JOIN sizes s2 ON s2.doc_id = id2
        WHERE shared >= 3
          AND shared * 1.0 / (s1.sz + s2.sz - shared) < 0.5
    ),
    directed AS (
        SELECT id1 AS anchor_id, id2 AS negative_id, shared, score FROM flt
        UNION ALL
        SELECT id2, id1, shared, score FROM flt
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY anchor_id
            ORDER BY score DESC, shared DESC, negative_id
        ) AS rn
        FROM directed
    )
    SELECT anchor_id, negative_id,
           shared AS shared_terms, score AS rarity_score
    FROM ranked WHERE rn <= 3
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training
    (operators.corpus.mine_hard_negatives): per anchor document, the
    top-3 documents sharing rare phrasing (what a lexical retriever
    would wrongly surface) that are NOT near-duplicates
    (informative-gram Jaccard < 0.5 — duplicates would be false
    negatives). Candidates come from an inverted-index self-join on
    word 3-grams with df in [2, 64], bounding pair fan-out by df_max x
    total_postings — linear in the corpus, never all-pairs. Scoring is
    integer rarity (n_docs DIV df summed) so the selected pairs are
    bit-identical across engines and partitionings; the oracle replays
    the identical pipeline in SQL."""
    from icerunner_spark.operators.corpus import mine_hard_negatives

    # Keyed on doc_id, not round-robin: spreads the single-file fixture
    # scan without the sortBeforeRepartition local sort (same rationale
    # as corpus_clean_pipeline; on a real corpus the scan is already
    # thousands of splits and this is a no-op to remove).
    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return mine_hard_negatives(
        d, "doc_id", "text",
        ngram=3, df_max=64, min_shared=3, jaccard_max=0.5, per_anchor=3,
    )


@register(
    "source_overlap_matrix",
    oracle="""
    WITH t AS (
        SELECT source,
               regexp_extract_all(lower(text),
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') AS t
        FROM documents
    ),
    ks AS (
        SELECT DISTINCT source,
               md5(COALESCE(array_to_string(
                   t[CAST(i AS INT):CAST(i+7 AS INT)], ' '), '')) AS k
        FROM t, LATERAL (SELECT unnest(generate_series(1,
                 GREATEST(len(t) - 7, 1))) AS i) s
    ),
    per_source AS (SELECT source, COUNT(*) AS n FROM ks GROUP BY source),
    pairs AS (
        SELECT a.source AS source_1, b.source AS source_2,
               COUNT(*) AS shared_classes
        FROM ks a JOIN ks b ON a.k = b.k AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT source_1, source_2, shared_classes,
           ROUND(shared_classes * 1.0 / LEAST(n1.n, n2.n), 6)
               AS overlap_coeff
    FROM pairs
    JOIN per_source n1 ON n1.source = source_1
    JOIN per_source n2 ON n2.source = source_2
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication forensics
    (operators.corpus.source_overlap, ngram=8): for every source pair,
    the count of shared distinct word 8-grams and the overlap
    coefficient shared/min(|A|,|B|) — the CCNet-style shared-phrase
    measure behind source selection (a crawl dump largely contained in
    another contributes storage cost, not new text). One corpus-
    proportional exchange (distinct md5(gram)+source — hashes, never
    text), then an answer-shaped self-join: per-gram fan-out is bounded
    by the sources carrying it, output by sources^2. The oracle replays
    the identical gram/md5 pipeline in SQL."""
    from icerunner_spark.operators.corpus import source_overlap

    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return source_overlap(d, "source", "text", ngram=8)


# --------------------------------------------------------------------------- #
# Composed training-corpus cleaning pipeline — SURVEY §2.C flagship
# --------------------------------------------------------------------------- #


@register(
    "corpus_clean_pipeline",
    oracle="""
    WITH feats AS (
        SELECT doc_id, lang, text,
               len(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) AS n_punct,
               len(regexp_extract_all(text, '[0-9]')) AS n_digit,
               len(list_filter(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'),
                   x -> list_contains(['and','auf','con','dans','das','de','der','die','est','et','ein','el','en','for','für','is','ist','it','in','la','le','los','mit','nicht','of','por','pour','que','sur','that','the','to','un','und','was','y','不','了','人','在','我','是','有','的','和','这'], x))) AS n_stop
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang, text,
               LEAST(n_tokens / 100.0, 1.0) * 0.4
               + GREATEST(0.0, 1.0 - (n_punct * 1.0 / n_chars) * 5) * 0.2
               + GREATEST(0.0, 1.0 - (n_digit * 1.0 / n_chars) * 5) * 0.2
               + LEAST((n_stop * 1.0 / n_tokens) * 4, 1.0) * 0.2 AS quality
        FROM feats
        WHERE n_chars > 0 AND n_tokens > 0
    ),
    qual AS (SELECT * FROM scored WHERE quality >= 0.5),
    keep_exact AS (
        SELECT MIN(doc_id) AS doc_id
        FROM qual
        GROUP BY lower(regexp_replace(text, '\\s+', ' ', 'g'))
    ),
    survivors AS (
        SELECT q.doc_id, q.lang, q.text, q.quality
        FROM qual q JOIN keep_exact k ON q.doc_id = k.doc_id
    ),
    norm AS (
        SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS t
        FROM survivors
    ),
    grams AS (
        SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 5) AS gram
        FROM norm, LATERAL (SELECT unnest(generate_series(1, GREATEST(length(t) - 4, 1))) AS i) s
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    neardup_losers AS (
        SELECT DISTINCT b.doc_id
        FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        JOIN sizes s1 ON s1.doc_id = a.doc_id
        JOIN sizes s2 ON s2.doc_id = b.doc_id
        GROUP BY a.doc_id, b.doc_id, s1.sz, s2.sz
        HAVING COUNT(*) * 1.0 / (s1.sz + s2.sz - COUNT(*)) >= 0.5
    )
    SELECT s.doc_id, s.lang, ROUND(s.quality, 6) AS quality
    FROM survivors s
    WHERE s.doc_id NOT IN (SELECT doc_id FROM neardup_losers)
    """,
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus cleaning in ONE declarative plan:
    quality-score filter (>= 0.5) -> exact dedup (min-id per normalized
    text) -> near-dup removal (MinHash-LSH generate + exact-Jaccard
    verify; a doc loses to any smaller-id near-dup). The oracle replays
    the identical pipeline with the exact inverted-index formulation —
    valid because the LSH stage's recall is exact-set-pinned
    (test_minhash_recall_against_exact).

    Scale shape: the quality filter is a scan-speed narrow map that
    PRUNES the corpus before anything shuffles; exact dedup shuffles
    8-byte fingerprints, not text; only the (filtered) survivor set pays
    the near-dup pipeline. Each later stage touches less data — at
    100 TB this ordering is the difference between a running pipeline
    and an impossible one."""
    from icerunner_spark.functions.text import fingerprint64, token_count
    from icerunner_spark.operators.dedup import minhash_neardup_pairs
    from icerunner_spark.operators.text import quality_score

    # Single-file fixture scans as ONE partition, which would serialize the
    # regex-heavy quality stage on one core; spread it first. Keyed on
    # doc_id (NOT round-robin): the hash partitioning is reused by the
    # keep semi-join, the gram build, and the final anti-join — all
    # doc_id-keyed — and a keyless repartition additionally pays a local
    # sort (sortBeforeRepartition) for a partitioning nothing downstream
    # can use. On a real corpus the scan is already thousands of splits
    # and this repartition is a no-op to remove (same artifact-only
    # rationale as the gram-explode repartition in operators/dedup.py).
    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    # cache() the scored survivors-of-the-quality-gate: BOTH the exact-
    # dedup keep-list and the survivor set derive from it, and the
    # regex-heavy quality stage is ~40% of the whole pipeline — uncached
    # it runs twice (once per branch). Projected to the four columns the
    # rest of the pipeline reads; MEMORY_AND_DISK (Spark's DataFrame
    # default) spills rather than OOMs when a corpus slice outgrows
    # executor storage memory.
    qual = (
        d.filter((F.length("text") > 0) & (token_count("text") > 0))
        .withColumn("quality", quality_score("text"))
        .filter(F.col("quality") >= 0.5)
        .select("doc_id", "lang", "text", "quality")
        .cache()
    )
    keep = (
        qual.groupBy(fingerprint64("text").alias("__fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # Shuffle semi-join on the kept-id list (NO broadcast hint: keep is
    # one id per distinct document — corpus cardinality — so a forced
    # broadcast is a driver OOM at 100 TB). AQE still runtime-broadcasts
    # it while it fits; past that both sides hash on the 8-byte doc_id.
    survivors = qual.join(keep, "doc_id", "left_semi").cache()
    pairs = minhash_neardup_pairs(
        survivors, "doc_id", "text", n_hashes=48, bands=12, threshold=0.5
    )
    losers = pairs.select(F.col("id2").alias("doc_id")).distinct()
    return (
        survivors.join(losers, "doc_id", "left_anti")
        .select("doc_id", "lang", F.round("quality", 6).alias("quality"))
    )


@register(
    "null_semantics_orders",
    oracle="""
    WITH o AS (
        SELECT o_orderkey,
               NULLIF(o_orderpriority, '1-URGENT') AS prio,
               CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders
    )
    SELECT COALESCE(prio, '<urgent>') AS prio_label,
           COUNT(*) AS n_all,
           COUNT(prio) AS n_nonnull,
           CAST(ROUND(SUM(price), 2) AS DOUBLE) AS total_price
    FROM o
    GROUP BY prio
    ORDER BY prio_label NULLS FIRST
    """,
)
def null_semantics_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics end-to-end: NULLIF manufactures nulls, grouping
    keeps the null group, COUNT(col) skips nulls while COUNT(*) doesn't,
    COALESCE labels the output. Verifies the engine's three-valued logic
    matches ANSI exactly — a correctness corner every SQL surface must
    get right."""
    o = _t(spark, sf_dir, "orders")
    prio = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return (
        o.select(prio.alias("prio"), _dec("o_totalprice").alias("price"))
        .groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.count("prio").alias("n_nonnull"),
            _money_sum(F.col("price")).alias("total_price"),
        )
        .select(
            F.coalesce("prio", F.lit("<urgent>")).alias("prio_label"),
            "n_all",
            "n_nonnull",
            "total_price",
        )
    )


@register(
    "pagination_orders",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def pagination_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination (ORDER BY + LIMIT/OFFSET) on a unique sort
    key — deterministic page 3. Spark plans this as a global sort +
    CollectLimit(60) then a driver-side skip of 40: fine for UI-page
    offsets; at deep offsets the right pattern is keyset pagination
    (WHERE o_orderkey > last_seen ORDER BY LIMIT n), which is a pushed
    range filter instead of a growing offset."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.col("o_totalprice").cast("double"))
        .orderBy("o_orderkey")
        .offset(40)
        .limit(20)
    )


# --------------------------------------------------------------------------- #
# Corpus construction: cluster resolution, decontamination, domain mixing,
# repetition quality, shard assignment, sequence packing — SURVEY §2.C
# --------------------------------------------------------------------------- #


@register(
    "dedup_cluster_resolution",
    oracle="""
    WITH RECURSIVE norm AS (
        SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS t
        FROM documents
    ),
    grams0 AS (
        SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 5) AS gram
        FROM norm, LATERAL (SELECT unnest(generate_series(1, GREATEST(length(t) - 4, 1))) AS i) s
    ),
    freq AS (SELECT gram, COUNT(*) AS c FROM grams0 GROUP BY gram),
    grams AS (
        SELECT g.doc_id, g.gram FROM grams0 g JOIN freq f ON f.gram = g.gram
        WHERE f.c <= 1000
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS i
        FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id1, id2
        FROM inter
        JOIN sizes s1 ON s1.doc_id = id1
        JOIN sizes s2 ON s2.doc_id = id2
        WHERE i * 1.0 / (s1.sz + s2.sz - i) >= 0.25
    ),
    edges AS (SELECT id1 AS s, id2 AS d FROM pairs UNION SELECT id2, id1 FROM pairs),
    reach(node, label) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node)
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS cluster_id,
           COALESCE(c.component, d.doc_id) = d.doc_id AS is_canonical
    FROM documents d
    LEFT JOIN comp c ON c.node = d.doc_id
    ORDER BY d.doc_id
    """,
)
def dedup_cluster_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER resolution: pairwise dedup emits edges, but the
    pipeline must keep exactly one document per duplicate component.
    Exact Jaccard pairs feed min-label-propagation connected components;
    cluster_id = min doc_id in the component, its holder is the
    canonical survivor. The oracle replays the component closure with a
    recursive CTE. Scale: the label iteration shuffles only the PAIR
    graph (tiny vs the corpus); docs join the final labels once.

    Pair stage (r11, r10 verdict item 2): the inverted-index exact
    Jaccard with ``max_doc_freq=1000`` — shingles in more than 1000
    documents are dropped from the fingerprint (index AND set sizes;
    the oracle applies the identical df filter, so the compare stays
    value-exact). The cap makes the candidate join's volume LINEAR by
    construction (<= cap/2 x gram occurrences) where the uncapped form
    is sum df(gram)^2 — quadratic on corpus-wide boilerplate shingles.
    1000 does not bind at the driver's sf0.01 (max df ~ corpus size
    500), so r9's green rows stay comparable; at sf0.1+ it prunes the
    Zipf head (measured: 151 hyper-hot grams carried 72% of the
    sf0.1 join volume — SCALE.md §9e). The r11 probe also REFUTED the
    PPJoin prefix route at these parameters (t=0.25, short docs): its
    75%-of-doc prefixes still carry df~10^3 grams, so candidates
    matched the full index (2.6e9 at 50k docs) and the array-shipping
    verify filled the disk; prefix filtering pays only at higher
    thresholds / longer shingles (neardup_prefix_filter's regime).
    SURVEY §2.C near-dup family."""
    from icerunner_spark.operators.corpus import resolve_near_duplicates
    from icerunner_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=5, threshold=0.25, max_doc_freq=1000
    )
    resolved = resolve_near_duplicates(docs.select("doc_id"), pairs, "doc_id")
    return resolved.select("doc_id", "cluster_id", "is_canonical").orderBy("doc_id")


@register(
    "decontam_ngram_overlap",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS t
        FROM documents
    ),
    g AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   range(1, GREATEST(len(t) - 7, 1) + 1),
                   i -> COALESCE(array_to_string(t[i:i+7], ' '), ''))) AS grams
        FROM toks
    ),
    eval_grams AS (
        SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 37 = 0
    ),
    hits AS (
        SELECT c.doc_id, COUNT(*) AS overlap
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 37 <> 0) c
        JOIN eval_grams e ON c.gram = e.gram
        GROUP BY 1
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN h.overlap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           CAST(SUM(COALESCE(h.overlap, 0)) AS BIGINT) AS total_overlap_grams
    FROM documents d
    LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % 37 <> 0
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag corpus documents sharing any word
    8-gram with a held-out eval set (every 37th doc stands in for the
    benchmark). Eval n-grams are DISTINCT'd and BROADCAST — eval sets
    are MBs against a TB corpus, so the corpus side is a narrow explode
    + broadcast-hash join and the corpus text never shuffles. Output is
    the per-source contamination audit. SURVEY §2.C text analysis."""
    from icerunner_spark.operators.corpus import ngram_overlap_flags

    docs = _t(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("doc_id") % 37 == 0)
    corpus = docs.where(F.col("doc_id") % 37 != 0)
    flags = ngram_overlap_flags(corpus, eval_df, "doc_id", "text", n=8)
    return (
        corpus.select("doc_id", "source")
        .join(flags, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("contaminated").cast("long")).alias("n_contaminated"),
            F.sum("overlap_grams").cast("long").alias("total_overlap_grams"),
        )
        .orderBy("source")
    )


@register(
    "decontam_semantic_overlap",
    oracle="""
    WITH ev AS (
      SELECT vec_id AS eval_id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id % 29 = 0
      ORDER BY vec_id LIMIT 1000
    ),
    co AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id % 29 <> 0
    ),
    pairs AS (
      SELECT co.vec_id, co.label, ev.eval_id,
             ROUND(list_cosine_similarity(co.v, ev.v), 6) AS cos_sim
      FROM co, ev
    ),
    best AS (
      SELECT vec_id, label, eval_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, eval_id) AS rk
      FROM pairs
    )
    SELECT vec_id, label, eval_id, cos_sim
    FROM best WHERE rk = 1 AND cos_sim >= 0.30
    """,
)
def decontam_semantic_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC test-set decontamination — the embedding-space
    complement of decontam_ngram_overlap: a corpus document is flagged
    when its embedding is too close (cosine >= 0.30) to any held-out
    eval vector, catching paraphrased leakage that shares no 8-gram.
    The eval side (every 29th vector, hard-capped at 1000 — eval sets
    are MBs against a TB corpus) is COLLECTED to the driver and shipped
    as a 1000x64 float64 closure matrix; scoring + per-document argmax
    run inside ONE Arrow-batched ``mapInPandas`` stage
    (operators.similarity.semantic_best_match): each corpus batch is a
    BLAS matmul against the normalized eval matrix and exactly one row
    per document leaves the stage — no pair frame exists anywhere, no
    Window, no exchange at pair cardinality (pinned by
    tests/test_plans.py::test_decontam_semantic_no_pair_frame). History:
    r5 shipped a Window over the broadcast-cross-join pair frame (full
    pair shuffle); r6 collapsed it map-side with max(struct(...)) —
    shuffle-optimal but ~26 us/pair of interpreted expression folds,
    which the r7 sf1 probe measured at 362 s for 19k docs x 690 evals;
    the matmul scores the same pairs at vectorized-C speed (sf1: ~1 s).
    The tiebreak is oracle-portable: argmax on cosine ROUNDED to 6
    digits, lowest eval_id first. With an eval set too big to collect,
    the LSH/IVF candidate generators (operators.similarity) swap in.
    SURVEY §2.C decontamination."""
    from icerunner_spark.operators.similarity import semantic_best_match

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # an eval probe set is bounded BY DEFINITION — the deterministic
    # LIMIT makes that boundedness part of the collect (the one
    # driver-side materialization in this query: <= 1000 x 64 doubles)
    eval_rows = [
        (r["vec_id"], list(r["v"]))
        for r in e.where(F.col("vec_id") % 29 == 0)
        .orderBy("vec_id")
        .limit(1000)
        .collect()
    ]
    co = e.where(F.col("vec_id") % 29 != 0)
    best = semantic_best_match(
        co, eval_rows, id_col="vec_id", vec_col="v", payload_cols=("label",)
    )
    return best.select(
        "vec_id", "label", "eval_id", F.round("cos_sim", 6).alias("cos_sim")
    ).where(F.col("cos_sim") >= 0.30)


@register(
    "stratified_sample_documents",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || '-mix'), 1, 8) <
          CASE lang WHEN 'en' THEN '80000000'
                    WHEN 'es' THEN 'c0000000'
                    WHEN 'zh' THEN '40000000'
                    ELSE 'g' END
    GROUP BY lang
    ORDER BY lang
    """,
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: deterministic per-language downsampling (en 50%,
    es 75%, zh 25%, rest 100%) via an md5-derived hex bucket — the keep
    decision depends only on (doc_id, salt, rate), so re-runs, engine
    swaps, and repartitions keep the SAME documents, unlike df.sample
    whose draw depends on partition layout. Pure narrow codegen filter:
    no shuffle, no RNG state, safe at any scale. SURVEY §2.C."""
    from icerunner_spark.operators.corpus import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, "lang", {"en": 0.5, "es": 0.75, "zh": 0.25}, "doc_id", salt="mix"
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


@register(
    "repetition_quality_documents",
    oracle="""
    WITH toks AS (
        SELECT lang,
               regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS t
        FROM documents
    ),
    g AS (
        SELECT lang, t,
               list_transform(range(1, GREATEST(len(t) - 1, 1) + 1),
                              i -> COALESCE(array_to_string(t[i:i+1], ' '), '')) AS g2
        FROM toks
    ),
    per_doc AS (
        SELECT lang,
               len(t) AS n_tokens,
               CASE WHEN len(t) > 0
                    THEN 1.0 - len(list_distinct(t)) * 1.0 / len(t)
                    ELSE 0.0 END AS dup_token_ratio,
               CASE WHEN len(g2) > 0
                    THEN 1.0 - len(list_distinct(g2)) * 1.0 / len(g2)
                    ELSE 0.0 END AS dup_2gram_ratio
        FROM g
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(dup_token_ratio), 6) AS avg_dup_token_ratio,
           ROUND(AVG(dup_2gram_ratio), 6) AS avg_dup_2gram_ratio
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def repetition_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText repetition filters: within-document duplicate
    token and duplicate 2-gram fractions — the quality signals that
    catch boilerplate and generated spam. Pure higher-order array
    expressions per document (scan-speed narrow map), then one hash agg
    by language. SURVEY §2.C text analysis."""
    from icerunner_spark.operators.corpus import repetition_cols

    docs = _t(spark, sf_dir, "documents")
    cols = repetition_cols("text")
    spread = spark.sparkContext.defaultParallelism
    return (
        # repartition first: the HOF dup-ratio arrays are compute-dense and
        # the single-file fixture scans as one partition (measured 17s -> ~1s)
        docs.repartition(spread, "doc_id")
        .select(
            "lang",
            cols["n_tokens"].alias("n_tokens"),
            cols["dup_token_ratio"].alias("dup_token_ratio"),
            cols["dup_2gram_ratio"].alias("dup_2gram_ratio"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("dup_token_ratio"), 6).alias("avg_dup_token_ratio"),
            F.round(F.avg("dup_2gram_ratio"), 6).alias("avg_dup_2gram_ratio"),
        )
        .orderBy("lang")
    )


@register(
    "shard_assignment_stats",
    oracle="""
    WITH sharded AS (
        SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-shard'), 1, 8)) AS BIGINT)
                   % 16 AS shard,
               n_chars
        FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM sharded
    GROUP BY shard
    ORDER BY shard
    """,
)
def shard_assignment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output sharding: the global-shuffle step that
    scatters a corpus into N training shards. shard(doc) is a pure
    function of doc_id (md5 hex → int % 16), so shard membership is
    reproducible across runs and engines — a requirement for resumable
    pipelines and cross-engine audits. In production this column feeds
    repartition(N, shard) + partitioned write; here the query audits
    the balance (16 near-equal shards). SURVEY §2.C layout for scale."""
    from icerunner_spark.functions.text import md5_bucket

    docs = _t(spark, sf_dir, "documents")
    shard = (
        F.conv(md5_bucket("doc_id", "shard"), 16, 10).cast("bigint") % 16
    ).alias("shard")
    return (
        docs.select(shard, "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("shard")
    )


@register("sequence_packing_stats")
def sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing audit: FFD bin-packing of documents into
    512-token training sequences inside 8 deterministic hash buckets
    (operators/packing.py). Output: per-bucket document/sequence counts
    and fill efficiency. No SQL oracle — bin packing is imperative by
    nature — so correctness is pinned in pytest (budget respected,
    every doc packed once, determinism, FFD quality bound) and the
    driver records a rows-only check. SURVEY §2.C."""
    from icerunner_spark.functions.text import token_count
    from icerunner_spark.operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", budget=512, n_buckets=8)
    return (
        packed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.max("seq_id") + 1).alias("n_seqs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .withColumn(
            "avg_fill",
            F.round(F.col("total_tokens") / (F.col("n_seqs") * 512), 6),
        )
        .orderBy("bucket")
    )


@register(
    "semantic_dedup_resolution",
    oracle="""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS id1, b.vec_id AS id2
        FROM embeddings a
        JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.8
    ),
    edges AS (SELECT id1 AS s, id2 AS d FROM pairs UNION SELECT id2, id1 FROM pairs),
    reach(node, label) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node)
    SELECT v.vec_id,
           COALESCE(c.component, v.vec_id) AS cluster_id,
           COALESCE(c.component, v.vec_id) = v.vec_id AS is_canonical
    FROM embeddings v
    LEFT JOIN comp c ON c.node = v.vec_id
    ORDER BY v.vec_id
    """,
)
def semantic_dedup_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication end-to-end: embedding-cosine
    near-dup pairs (>= 0.8) -> connected components -> one canonical
    vector per semantic cluster. Exact pair generation here so the
    recursive-CTE oracle can verify the closure; the 100 TB path swaps
    the pair stage for the LSH/IVF-bucketed generators
    (operators/similarity.py) with the SAME downstream resolution —
    candidate generation and cluster resolution compose orthogonally.
    SURVEY §2.C similarity + dedup families."""
    from icerunner_spark.operators.corpus import resolve_near_duplicates
    from icerunner_spark.operators.similarity import cosine_neardup_pairs

    e = _t(spark, sf_dir, "embeddings")
    pairs = cosine_neardup_pairs(e, threshold=0.8, exact=True).select("id1", "id2")
    resolved = resolve_near_duplicates(e.select("vec_id"), pairs, "vec_id")
    return resolved.select("vec_id", "cluster_id", "is_canonical").orderBy("vec_id")


@register(
    "ranking_family_orders",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    QUALIFY NTILE(4) OVER w = 4
    ORDER BY o_orderkey
    """,
)
def ranking_family_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-ranking window family: NTILE / PERCENT_RANK /
    CUME_DIST over a deterministic (totalprice, orderkey) order,
    filtered to the top quartile (the DataFrame filter is Spark's
    QUALIFY equivalent). One shuffle on the partition key; rank
    functions are a single window pass. SURVEY §2.B window functions."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .where(F.col("quartile") == 4)
        .orderBy("o_orderkey")
    )


@register(
    "snapshot_merge_upsert",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders WHERE o_orderkey < 400
    ),
    updates AS (
        SELECT o_orderkey, o_custkey, CAST(o_totalprice * 2 AS DOUBLE) AS o_totalprice
        FROM orders WHERE o_orderkey >= 200 AND o_orderkey < 600
    )
    SELECT o_orderkey, o_custkey, o_totalprice FROM updates
    UNION ALL
    SELECT b.o_orderkey, b.o_custkey, b.o_totalprice
    FROM base b
    WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    """,
)
def snapshot_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO round-trip (IceTable.merge — Iceberg copy-on-write
    upsert parity): create a table from orders < 400, merge doubled-price
    updates for keys 200-600 (overlap updates, tail inserts), scan. The
    oracle replays the upsert relationally. Matched rows take the update,
    unmatched keep the base row, new keys insert — DELETE/UPDATE
    semantics pinned further in tests/test_table.py."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_merge_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("double")
    )
    t = c.catalog.table("orders_merge")
    t.create(orders.filter(F.col("o_orderkey") < 400))
    updates = orders.filter(
        (F.col("o_orderkey") >= 200) & (F.col("o_orderkey") < 600)
    ).withColumn("o_totalprice", (F.col("o_totalprice") * 2).cast("double"))
    t.merge(updates, ["o_orderkey"])
    return t.scan()


@register(
    "merge_into_clauses",
    oracle="""
    WITH t AS (
        SELECT o_orderkey,
               CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    s AS (
        SELECT o_orderkey,
               CAST(o_totalprice AS DECIMAL(12,2)) + 1000.00 AS new_price,
               o_orderstatus = 'F' AS retract
        FROM orders WHERE o_orderkey % 2 = 0
    ),
    kept AS (
        SELECT t.o_orderkey,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.new_price
                    ELSE t.price END AS price
        FROM t LEFT JOIN s ON t.o_orderkey = s.o_orderkey
        WHERE s.o_orderkey IS NULL OR NOT s.retract
    ),
    ins AS (
        SELECT s.o_orderkey, s.new_price AS price
        FROM s LEFT JOIN t ON s.o_orderkey = t.o_orderkey
        WHERE t.o_orderkey IS NULL AND NOT s.retract
    ),
    final AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
    SELECT COUNT(*) AS n_rows,
           CAST(ROUND(SUM(price), 2) AS DOUBLE) AS total_price
    FROM final
    """,
)
def merge_into_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE INTO clause semantics (IceTable.merge_into — Iceberg
    ``WHEN MATCHED [AND cond] THEN UPDATE / THEN DELETE / WHEN NOT
    MATCHED THEN INSERT`` parity), run merge-on-read: a CDC-style change
    set (repriced rows + retractions flagged by order status) applies to
    a snapshot table in ONE snapshot — matched live rows reprice,
    matched retractions delete, unmatched live changes insert, and
    untouched rows never rewrite (positional delete file + appends,
    O(changed rows) IO). The oracle replays the clause algebra
    relationally. Exact-decimal prices keep the comparison bit-stable."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_merge_into", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders")
    t = c.catalog.table("orders_mi")
    t.create(
        orders.filter(F.col("o_orderkey") % 3 == 0).select(
            "o_orderkey", _dec("o_totalprice").alias("price")
        )
    )
    changes = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        (_dec("o_totalprice") + F.lit(1000).cast("decimal(12,2)"))
        .cast("decimal(12,2)")  # sum widens to (13,2); values still fit
        .alias("new_price"),
        (F.col("o_orderstatus") == "F").alias("retract"),
    )
    t.merge_into(
        changes, ["o_orderkey"],
        update={"price": "s.new_price"},
        update_condition="NOT s.retract",
        delete=True, delete_condition="s.retract",
        insert_condition="NOT s.retract",
        insert_values={"price": "s.new_price"},
        mode="merge-on-read",
    )
    return t.scan().agg(
        F.count(F.lit(1)).alias("n_rows"),
        _money_sum(F.col("price")).alias("total_price"),
    )


@register(
    "catalog_view_query",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice >= 100000
    GROUP BY o_orderpriority
    """,
)
def catalog_view_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned catalog views (Iceberg view-spec shape, replacing the
    reference's per-query DuckDB view reflection, icerunner.py:90-103):
    a view's SQL lives in the catalog with a version log — REPLACE
    bumps the version and keeps history, any version stays resolvable —
    and resolution happens at query time against the CURRENT table
    state through the same Connector.sql path the Flight sql ticket
    serves. The first definition is deliberately wrong-threshold and
    replaced; the query must see v2. The aggregate runs THROUGH the
    view, and Catalyst still pushes the view's filter into the parquet
    scan (views are declarative, not materialization boundaries)."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_views", sf_dir)
    c = Connector(spark, wh)
    t = c.catalog.table("orders_v")
    t.create(
        _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        )
    )
    c.catalog.create_view(
        "open_pricey",
        "SELECT * FROM orders_v WHERE o_orderstatus = 'O' AND o_totalprice >= 1",
    )
    c.catalog.create_view(
        "open_pricey",
        "SELECT * FROM orders_v "
        "WHERE o_orderstatus = 'O' AND o_totalprice >= 100000",
        replace=True,
    )
    return c.sql_df(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total_price
        FROM open_pricey GROUP BY o_orderpriority
        """
    )


@register(
    "recursive_cte_hierarchy",
    oracle="""
    WITH RECURSIVE up AS (
        SELECT s_suppkey AS start, s_suppkey AS node, 0 AS depth
        FROM supplier
        UNION ALL
        SELECT start, node // 2, depth + 1 FROM up WHERE node > 1
    )
    SELECT depth,
           COUNT(*) AS n_chains,
           CAST(SUM(node) AS BIGINT) AS node_sum
    FROM up GROUP BY depth
    """,
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.1 ``WITH RECURSIVE``): every supplier
    walks its implicit binary-tree ancestry (parent = key div 2) up to
    the root, then the per-depth rollup aggregates all chains — the
    org-chart / BOM transitive-closure shape SQL engines express with
    recursion. Spark executes the recursion as iterated union steps
    (each level one join against the previous frontier — the same
    frontier-at-a-time plan an iterative graph algorithm would hand-roll
    with a driver loop, but planned and fused by Catalyst); depth is
    bounded by log2(max key), far under the recursion-level limit. The
    oracle is DuckDB's own WITH RECURSIVE over the same table."""
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_rc")
    return spark.sql(
        """
        WITH RECURSIVE up (start, node, depth) AS (
            SELECT s_suppkey, s_suppkey, 0 FROM supplier_rc
            UNION ALL
            SELECT start, node DIV 2, depth + 1 FROM up WHERE node > 1
        )
        SELECT depth,
               COUNT(*) AS n_chains,
               CAST(SUM(node) AS BIGINT) AS node_sum
        FROM up GROUP BY depth
        """
    )


@register(
    "row_lineage_scan",
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS row_id
        FROM orders WHERE o_orderkey < 512
    )
    SELECT o_orderkey, row_id, 0 AS last_updated_seq
    FROM base WHERE o_orderkey % 5 <> 0
    """,
)
def row_lineage_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v3 row lineage (IceTable.scan(with_lineage=True)):
    ``_row_id`` blocks allocate per data file at commit and derive as
    first_row_id + position at read — pure metadata, no id column is
    ever written. The table commits as ONE key-sorted file, so each
    row's id is its sorted rank; a merge-on-read delete then removes
    every fifth key WITHOUT moving surviving rows, and the oracle checks
    the survivors still carry their ORIGINAL ids (an engine that
    rewrote or renumbered rows would shift them).
    ``_last_updated_sequence`` stays 0 — no survivor has been updated
    since the create commit. This is the identity substrate CDC
    consumers and incremental ML-feature pipelines key on at 100 TB:
    row identity survives continuous delete maintenance for free."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_lineage", sf_dir)
    c = Connector(spark, wh)
    t = c.catalog.table("orders_lineage")
    t.create(
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 512)
        .select("o_orderkey")
        .coalesce(1)
        .sortWithinPartitions("o_orderkey")
    )
    t.delete_where("o_orderkey % 5 = 0", mode="merge-on-read")
    return t.scan(with_lineage=True).select(
        "o_orderkey",
        F.col("_row_id").alias("row_id"),
        F.col("_last_updated_sequence").cast("int").alias("last_updated_seq"),
    )


@register(
    "try_arithmetic_orders",
    oracle="""
    WITH t AS (
        SELECT TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_digit,
               CASE WHEN o_custkey % 7 = 0 THEN NULL
                    ELSE CAST(o_totalprice AS DOUBLE) / (o_custkey % 7)
               END AS safe_div
        FROM orders
    )
    SELECT prio_digit,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN safe_div IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
           CAST(ROUND(SUM(CAST(ROUND(safe_div, 6) AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_safe_div
    FROM t
    GROUP BY prio_digit
    ORDER BY prio_digit
    """,
)
def try_arithmetic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe arithmetic: TRY_CAST parses the priority
    digit, try_divide returns NULL on the zero denominators instead of
    raising (Spark 4 runs ANSI by default — plain `/` would fail the
    whole job on one bad row; at 100 TB, one poisoned row must never
    kill a pipeline). The oracle mirrors try_divide with an explicit
    zero-guard CASE since DuckDB division raises too. Per-row 6dp round
    + decimal SUM keeps the aggregate order-independent."""
    o = _t(spark, sf_dir, "orders")
    safe_div = F.try_divide(
        F.col("o_totalprice").cast("double"), (F.col("o_custkey") % 7).cast("double")
    )
    return (
        o.select(
            F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
            safe_div.alias("safe_div"),
        )
        .groupBy("prio_digit")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("safe_div").isNull().cast("long")).alias("n_div_null"),
            F.round(F.sum(F.round("safe_div", 6).cast("decimal(24,6)")), 2)
            .cast("double")
            .alias("sum_safe_div"),
        )
        .orderBy("prio_digit")
    )


def _stream_clean_oracle() -> str:
    """Oracle assembled from the SAME pattern/stopword tables the
    operators use — one source of truth across engines."""
    from icerunner_spark.functions.text import PII_PATTERNS
    from icerunner_spark.operators.text import STOPWORDS

    red = "text"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    pii_sum = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for _, pat, _ in PII_PATTERNS
    )
    stops = ",".join(
        f"'{w}'" for w in sorted({w for ws in STOPWORDS.values() for w in ws})
    )
    tok = r"regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')"
    return f"""
    WITH feats AS (
        SELECT doc_id, lang, text,
               len({tok}) AS n_tokens,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '[!-/:-@\\[-`{{-~]')) AS n_punct,
               len(regexp_extract_all(text, '[0-9]')) AS n_digit,
               len(list_filter({tok}, x -> list_contains([{stops}], x))) AS n_stop
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang, text, n_tokens,
               LEAST(n_tokens / 100.0, 1.0) * 0.4
               + GREATEST(0.0, 1.0 - (n_punct * 1.0 / n_chars) * 5) * 0.2
               + GREATEST(0.0, 1.0 - (n_digit * 1.0 / n_chars) * 5) * 0.2
               + LEAST((n_stop * 1.0 / n_tokens) * 4, 1.0) * 0.2 AS quality
        FROM feats
        WHERE n_chars > 0 AND n_tokens > 0
    )
    SELECT doc_id, lang,
           ROUND(quality, 6) AS quality,
           md5({red}) AS redacted_md5,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST({pii_sum} AS BIGINT) AS n_pii
    FROM scored
    WHERE quality >= 0.5
    """


@register("stream_corpus_clean", oracle=_stream_clean_oracle())
def stream_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingestion: the stateless clean stage (quality
    gate + PII redaction + token audit) whose body runs unchanged as a
    batch projection or an append-mode stream over arriving document
    files — stream==batch equivalence pinned in tests/test_streaming.py.
    Entirely narrow: cleaning happens at scan speed as documents land,
    before anything shuffles. SURVEY §2.B streaming + §2.C text."""
    from icerunner_spark.streaming.pipeline import clean_documents

    return clean_documents(_t(spark, sf_dir, "documents"))


@register(
    "chunk_documents_windows",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST((s - 1) // 48 AS BIGINT) AS chunk_idx,
           CAST(len(t[CAST(s AS INT):CAST(s + 63 AS INT)]) AS BIGINT) AS n_chunk_tokens,
           md5(COALESCE(array_to_string(t[CAST(s AS INT):CAST(s + 63 AS INT)], ' '), '')) AS chunk_md5
    FROM toks,
         LATERAL (SELECT unnest(range(1, GREATEST(len(t), 1) + 1, 48)) AS s) g
    ORDER BY doc_id, chunk_idx
    """,
)
def chunk_documents_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 64-token windows with 16-token overlap
    (stride 48) — the split-long-documents step before embedding or
    sequence packing. Narrow posexplode over HOF arrays: no shuffle,
    scan-speed expansion. SURVEY §2.C."""
    from icerunner_spark.operators.corpus import chunk_documents

    d = _t(spark, sf_dir, "documents")
    out = chunk_documents(d, "doc_id", "text", chunk_tokens=64, overlap=16)
    return out.select(
        "doc_id",
        "chunk_idx",
        "n_chunk_tokens",
        F.md5("chunk_text").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


# --------------------------------------------------------------------------- #
# Full TPC-H query-shape suite (the remaining shapes) — SURVEY §2.B
# --------------------------------------------------------------------------- #
# The fixture schema has no partsupp table and no
# commitdate/receiptdate/shipmode/phone/comment columns, so Q2/Q9/Q11/Q16/
# Q20 derive the part↔supplier relation from lineitem and Q4/Q12/Q21/Q22
# substitute shipdate-vs-orderdate lateness and nationkey for the missing
# columns. Every query keeps the *shape* that makes the original hard:
# correlated aggregates, scalar subqueries, disjunctive join predicates,
# HAVING over grouped sums, NOT-IN/NOT-EXISTS chains, min-over-group.


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost_dec
        FROM lineitem GROUP BY 1, 2
    ), best AS (
        SELECT *, MIN(cost_dec) OVER (PARTITION BY l_partkey) AS min_cost FROM ps
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
           CAST(ROUND(b.cost_dec, 2) AS DOUBLE) AS supply_cost
    FROM best b
    JOIN part p     ON p.p_partkey = b.l_partkey
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE b.cost_dec = b.min_cost
      AND p.p_size BETWEEN 1 AND 15 AND p.p_type = 'STANDARD'
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier per part): the correlated
    min-subquery is rewritten as MIN over a partition window on the
    aggregated part×supplier costs — one shuffle on l_partkey instead of a
    per-row re-aggregation. nation is constant-size → broadcast hint;
    part/supplier scale with SF so they are unhinted (AQE decides).
    Exact-decimal equality picks the minimum, so ties keep all winners
    deterministically on both engines."""
    l = _t(spark, sf_dir, "lineitem")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_extendedprice")).alias("cost_dec")
    )
    best = ps.withColumn(
        "min_cost", F.min("cost_dec").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("cost_dec") == F.col("min_cost"))
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(1, 15) & (F.col("p_type") == "STANDARD")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(s, best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round("cost_dec", 2).cast("double").alias("supply_cost"),
        )
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): EXISTS with a
    cross-relation predicate (shipped >30 days after order) → left-semi
    join; the date window pushes into the orders scan before the semi
    join, so only one quarter of orders shuffles."""
    o = _t(spark, sf_dir, "orders").alias("o").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    l = _t(spark, sf_dir, "lineitem").alias("l")
    return (
        o.join(
            l,
            F.expr(
                "l.l_orderkey = o.o_orderkey"
                " AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAYS"
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q8_market_share",
    oracle="""
    WITH flat AS (
        SELECT CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS vol,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'ASIA'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN vol
                               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(SUM(vol) AS DOUBLE), 6)       AS mkt_share,
           CAST(ROUND(SUM(vol), 2) AS DOUBLE)         AS total_volume
    FROM flat
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): conditional aggregation
    (share = SUM(CASE)/SUM) over a 7-way star join; nation broadcasts
    twice under different roles. Numerator and denominator are exact
    decimal sums, divided once as doubles — deterministic across
    engines."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount", 4, 2))
    flat = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == c.c_nationkey)
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n2), F.col("n2_key") == s.s_nationkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_2", F.col("vol")).otherwise(
            F.lit(0).cast("decimal(12,2)")
        )
    )
    return flat.groupBy("o_year").agg(
        F.round(num.cast("double") / F.sum("vol").cast("double"), 6).alias("mkt_share"),
        _money_sum(F.col("vol")).alias("total_volume"),
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS supp_nation,
           CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS o_year,
           CAST(ROUND(SUM(
               CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
               - CAST(p.p_retailprice AS DECIMAL(12,2))
                 * CAST(l.l_quantity AS DECIMAL(12,2))
                 * CAST(0.5 AS DECIMAL(2,1))
           ), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_size > 25
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year). The
    fixture has no partsupp.ps_supplycost, so cost is proxied as half the
    part's retail price × quantity — the arithmetic stays exact decimal
    end-to-end (0.5 is DECIMAL(2,1), products and the difference are
    exact), summed then rounded once. part filter prunes before the join
    chain; only orders⋈lineitem shuffles."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") > 25)
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    profit = _dec("l_extendedprice") * (1 - _dec("l_discount", 4, 2)) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity") * F.lit("0.5").cast("decimal(2,1)")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_money_sum(profit).alias("profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH v AS (
        SELECT n.n_name,
               SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * CAST(l.l_quantity AS DECIMAL(12,2))) AS val
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name
    )
    SELECT n_name, CAST(ROUND(val, 2) AS DOUBLE) AS part_value
    FROM v
    WHERE CAST(val AS DOUBLE) > 0.05 * (SELECT CAST(SUM(val) AS DOUBLE) FROM v)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): HAVING against an uncorrelated
    scalar subquery (5% of global value). The global total is a one-row
    aggregate broadcast against the per-nation aggregate — no second scan
    of the fact table at the comparison step."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    v = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("val"))
    )
    total = v.agg(F.sum("val").cast("double").alias("grand_total"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("val").cast("double") > 0.05 * F.col("grand_total"))
        .select("n_name", F.round("val", 2).cast("double").alias("part_value"))
    )


@register(
    "q12_priority_lateness",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode/priority matrix; l_linestatus stands
    in for the missing l_shipmode): pivot-style conditional counts with a
    cross-relation residual predicate (shipped ≥60 days after ordering)
    evaluated post-join. The shipdate year-range pushes into the lineitem
    scan."""
    o = _t(spark, sf_dir, "orders").alias("o")
    l = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .alias("l")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.expr("l.l_orderkey = o.o_orderkey"))
        .filter(F.expr("l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH co AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM co GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): left outer
    join with a filter *inside the join condition* (kept customers must
    still appear with count 0), then a second aggregation over the first.
    COUNT(col) counts non-null matches only — the outer-join null row
    becomes c_count=0, not 1."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    co = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0
             * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                             THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                                  * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE),
           6) AS promo_pct,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
             AS total_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): single-row conditional-share
    aggregate over a month of shipments; part joins unhinted (AQE picks
    broadcast while it fits, shuffle-hash at 100 TB), the month filter
    pushes into the scan. Exact decimal sums, one double division."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = _t(spark, sf_dir, "part")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount", 4, 2))
    joined = l.join(p, l.l_partkey == p.p_partkey).select(
        vol.alias("vol"), (F.col("p_type") == "PROMO").alias("is_promo")
    )
    promo = F.sum(
        F.when(F.col("is_promo"), F.col("vol")).otherwise(F.lit(0).cast("decimal(12,2)"))
    )
    return joined.agg(
        F.round(100.0 * promo.cast("double") / F.sum("vol").cast("double"), 6).alias(
            "promo_pct"
        ),
        _money_sum(F.col("vol")).alias("total_revenue"),
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier via view + scalar MAX): the CTE's max
    is a one-row aggregate broadcast back against the per-supplier revenue
    — the classic argmax-without-recompute plan. Exact-decimal equality
    keeps ties (all max suppliers) identically on both engines."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = l.groupBy("l_suppkey").agg(
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount", 4, 2))).alias(
            "total_rev"
        )
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier counts by part attributes): DISTINCT
    aggregation after an exclusion NOT-IN subquery (suppliers in deficit
    stand in for the missing 'complaints' comment filter) → anti join,
    unhinted so AQE broadcasts the deficit list only while it is small;
    part's brand/size filters prune before the fact join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS small_qty_revenue,
           COUNT(*) AS n_small
    FROM lineitem l
    JOIN pa     ON pa.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'SMALL'
    WHERE CAST(l.l_quantity AS DECIMAL(12,2)) * 5 * pa.cnt < pa.sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity order revenue): the correlated
    AVG subquery (qty < 0.2×avg per part) is restated divisionless as
    qty×5×cnt < sum_qty — exact integer/decimal arithmetic, so boundary
    rows can't flip between engines — and executed as aggregate-then-join
    on l_partkey rather than per-row re-aggregation."""
    l = _t(spark, sf_dir, "lineitem")
    pa = l.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    return (
        l.join(pa, l.l_partkey == pa.pa_partkey)
        .join(p, l.l_partkey == p.p_partkey)
        .filter(_dec("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            _money_sum(_dec("l_extendedprice")).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice_d,
           CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN-subquery with HAVING
    over a grouped sum → aggregate lineitem once, filter to the tiny
    qualifying-orderkey list (semi join back, AQE runtime-broadcasts it
    while small — lineitem itself never shuffles for the filter), then
    re-aggregate with customer joined unhinted. At a scale where the
    qualifying list outgrows broadcast, both sides hash on l_orderkey —
    the same key the final aggregation groups on, so the partitioning
    carries through."""
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("order_qty"))
        .filter(F.col("order_qty") > 150)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        l.join(big, "l_orderkey", "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice_d"),
        )
        .agg(_money_sum(_dec("l_quantity")).alias("sum_qty"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 40
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive join predicates): three OR'd predicate
    bundles mixing build-side (part) and probe-side (lineitem) columns.
    Catalyst extracts the common l_partkey equi-key so this stays a hash
    join with a residual filter — not a nested-loop — and pushes the
    derivable brand/size disjunction to the part scan."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 40)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            _money_sum(
                _dec("l_extendedprice") * (1 - _dec("l_discount", 4, 2))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q20_excess_share_suppliers",
    oracle="""
    WITH sq AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS supp_qty
        FROM lineitem GROUP BY 1, 2
    ), tq AS (
        SELECT l_partkey, SUM(supp_qty) AS tot_qty FROM sq GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
        SELECT sq.l_suppkey
        FROM sq
        JOIN tq     ON tq.l_partkey = sq.l_partkey
        JOIN part p ON p.p_partkey = sq.l_partkey AND p.p_type = 'PROMO'
        WHERE sq.supp_qty * 10 > tq.tot_qty
    )
    """,
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers holding excess share): nested
    aggregation subquery (per-supplier share vs per-part total, >10%)
    feeding an IN → two groupBys on the same l_partkey key (one exchange
    reused), then a semi join into the supplier dim. Divisionless share
    compare (qty×10 > total) keeps the threshold exact."""
    l = _t(spark, sf_dir, "lineitem")
    sq = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("supp_qty")
    )
    tq = sq.groupBy(F.col("l_partkey").alias("tq_partkey")).agg(
        F.sum("supp_qty").alias("tot_qty")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    qualifying = (
        sq.join(tq, sq.l_partkey == tq.tq_partkey)
        .join(p, sq.l_partkey == p.p_partkey)
        .filter(F.col("supp_qty") * 10 > F.col("tot_qty"))
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "q21_last_shipper",
    oracle="""
    WITH os AS (
        SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_last
        FROM lineitem GROUP BY 1, 2
    ), agg AS (
        SELECT l_orderkey, MAX(supp_last) AS order_last, COUNT(*) AS n_supps
        FROM os GROUP BY 1
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM os
    JOIN agg        ON agg.l_orderkey = os.l_orderkey
    JOIN orders o   ON o.o_orderkey = os.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = os.l_suppkey
    WHERE os.supp_last = agg.order_last AND agg.n_supps >= 2
    GROUP BY s.s_name
    """,
)
def q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS/NOT-EXISTS pair over other suppliers' lineitems is restated as
    one window-free double aggregation — per-(order, supplier) last ship
    date, then per-order max + supplier count — so the 'this supplier
    shipped last among ≥2' predicate is a join filter, not a correlated
    re-scan. The first aggregate hashes on (l_orderkey, l_suppkey), the
    per-order rollup on l_orderkey — two bounded shuffles of key+date
    pairs, never of raw lineitems twice."""
    l = _t(spark, sf_dir, "lineitem")
    os_ = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_last")
    )
    agg = os_.groupBy(F.col("l_orderkey").alias("agg_orderkey")).agg(
        F.max("supp_last").alias("order_last"), F.count(F.lit(1)).alias("n_supps")
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    return (
        os_.join(agg, os_.l_orderkey == agg.agg_orderkey)
        .filter((F.col("supp_last") == F.col("order_last")) & (F.col("n_supps") >= 2))
        .join(o, os_.l_orderkey == o.o_orderkey, "left_semi")
        .join(s, os_.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH pos AS (
        SELECT COUNT(*) AS n_pos,
               SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_pos
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey AS cntrycode,
           COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer c, pos
    WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * pos.n_pos > pos.sum_pos
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): above-average-balance
    customers with no recent orders, grouped by country (nationkey stands
    in for the missing phone country code). The uncorrelated AVG subquery
    is restated divisionless (bal × n_pos > sum_pos, exact decimals) and
    broadcast; NOT EXISTS over recent orders → broadcast anti join of a
    date-pruned orders scan."""
    c = _t(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(_dec("c_acctbal")).alias("sum_pos"),
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(_dec("c_acctbal") * F.col("n_pos") > F.col("sum_pos"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _money_sum(_dec("c_acctbal")).alias("totacctbal"),
        )
    )


@register(
    "lateral_topk_per_nation",
    oracle="""
    SELECT n.n_name, t.c_name, t.c_acctbal_d
    FROM nation n,
         LATERAL (
             SELECT c.c_name, CAST(c.c_acctbal AS DOUBLE) AS c_acctbal_d
             FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c.c_acctbal DESC, c.c_name
             LIMIT 2
         ) t
    """,
)
def lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated table subquery (SURVEY §2.B subqueries): top-2
    customers by balance per nation, expressed as a lateral per-row
    subquery rather than a window. Catalyst decorrelates the
    LATERAL-with-LIMIT into a ranked join — same physical plan family as
    the window spelling, so per-nation top-k never ships whole
    partitions. Tie-broken by name for cross-engine determinism."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal_d
        FROM nation_lat n,
             LATERAL (
                 SELECT c.c_name, CAST(c.c_acctbal AS DOUBLE) AS c_acctbal_d
                 FROM customer_lat c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c.c_acctbal DESC, c.c_name
                 LIMIT 2
             ) t
        """
    )


@register(
    "per_source_caps",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 10
    """,
)
def per_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document caps (corpus-mixing control: no source may
    contribute more than K docs, keeping the longest first): rank within
    source, keep rk <= K. One shuffle on source; a hot domain is exactly
    the rank-skew case — `operators/skew.py capped_topk_per_key` is the
    two-phase form for that regime (salted pre-cap, then exact rank over
    ≤ k·n_salts survivors; equality-pinned against this single-phase
    window in tests/test_operators.py). Deterministic tie-break by
    doc_id."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("doc_id", "source", "rk")
    )


@register(
    "training_order_shuffle",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5('epoch42:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS shuffle_pos
    FROM documents
    """,
)
def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle (seeded permutation of
    the corpus, reproducible across runs and engines): order by
    md5(seed || doc_id). A naive global ROW_NUMBER is a single-partition
    sort; instead this uses the scalable two-phase rank: hash-prefix
    buckets (256) rank in parallel, bucket counts (256 rows) cumsum into
    offsets broadcast back, global position = offset + in-bucket rank.
    Lexicographic bucket order equals global md5 order because the bucket
    IS the hash prefix. This is the terasort pattern expressed
    declaratively."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("epoch42:"), F.col("doc_id").cast("string")))
    ranked = d.select("doc_id", h.alias("__h"), F.substring(h, 1, 2).alias("__b"))
    wb = Window.partitionBy("__b").orderBy("__h", "doc_id")
    ranked = ranked.withColumn("__rk", F.row_number().over(wb))
    counts = ranked.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    wo = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(wo), F.lit(0))
    ).select("__b", "__off")
    return (
        ranked.join(F.broadcast(offsets), "__b")
        .select(
            "doc_id",
            (F.col("__off") + F.col("__rk")).cast("long").alias("shuffle_pos"),
        )
    )


@register(
    "vocab_top_tokens",
    oracle="""
    WITH t AS (
        SELECT unnest(regexp_extract_all(lower(text),
                      '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS tok
        FROM documents
    )
    SELECT tok, COUNT(*) AS n
    FROM t GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 50
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics (top-K token frequencies — the
    tokenizer-training / vocab-coverage primitive). Map-side partial
    aggregation absorbs the token skew ('the' never ships as raw rows,
    only as per-partition partial counts), then TakeOrderedAndProject
    caps the shuffle at K rows per partition. Repartition first: the
    single-file fixture would otherwise explode 5M tokens on one core
    (scan artifact, see corpus_clean_pipeline)."""
    from icerunner_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return (
        d.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(50)
    )


@register(
    "segment_dedup_reassemble",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text),
                       '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]') AS t
        FROM documents
    ),
    segs AS (
        SELECT doc_id, CAST((s - 1) / 16 AS BIGINT) AS seg_idx,
               COALESCE(array_to_string(t[CAST(s AS INT):CAST(s + 15 AS INT)], ' '), '') AS seg_text
        FROM toks,
             LATERAL (SELECT unnest(range(1, GREATEST(len(t), 1) + 1, 16)) AS s) g
    ),
    kept AS (
        SELECT doc_id, seg_idx, seg_text,
               ROW_NUMBER() OVER (PARTITION BY md5(seg_text)
                                  ORDER BY doc_id, seg_idx) AS occ
        FROM segs
    )
    SELECT doc_id,
           COUNT(*) AS n_kept,
           md5(string_agg(seg_text, ' ' ORDER BY seg_idx)) AS doc_md5
    FROM kept WHERE occ = 1
    GROUP BY doc_id
    """,
)
def segment_dedup_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup (boilerplate removal): split each doc into
    16-token segments, keep only each segment's FIRST corpus-wide
    occurrence (min doc_id, then position), reassemble survivors in
    order. Two bounded shuffles: segments hash on md5(segment) for the
    occurrence rank (segment text is <=16 tokens wide, never the whole
    doc), then on doc_id for reassembly. Reassembly is
    collect_list(struct) + array_sort — deterministic because seg_idx is
    unique per doc."""
    from icerunner_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    t = tokens("text")
    n_segs = F.greatest(F.ceil(F.size(t) / 16).cast("int"), F.lit(1))
    seg_texts = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.array_join(F.slice(t, i * 16 + 1, 16), " "),
    )
    segs = d.select(
        "doc_id", F.posexplode(seg_texts).alias("seg_idx", "seg_text")
    )
    occ = Window.partitionBy(F.md5("seg_text")).orderBy("doc_id", "seg_idx")
    kept = segs.withColumn("occ", F.row_number().over(occ)).filter(
        F.col("occ") == 1
    )
    reassembled = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seg_idx", "seg_text"))),
            lambda x: x["seg_text"],
        ),
        " ",
    )
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(reassembled).alias("doc_md5"),
    )


@register(
    "gap_fill_interpolate",
    oracle="""
    WITH src AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(12,2))) AS v, COUNT(*) AS n
        FROM events WHERE user_id % 25 = 0 GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM src GROUP BY 1
    ),
    spine AS (
        SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ),
    joined AS (
        SELECT s.user_id, s.h, src.v, COALESCE(src.n, 0) AS n_events
        FROM spine s LEFT JOIN src ON src.user_id = s.user_id AND src.h = s.h
    )
    SELECT user_id, h AS hour_ts, n_events,
           CAST(ROUND(COALESCE(v, 0), 2) AS DOUBLE) AS hour_value,
           CAST(ROUND(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS carried_value
    FROM joined
    """,
)
def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill (the hypertable 'time_bucket +
    locf' primitive): hourly per-user buckets, a generated dense hour
    spine per user, and forward-filled values over the gaps
    (last-observation-carried-forward via last(ignorenulls) over an
    unbounded-preceding frame). Scale: the spine is sequence()+explode —
    rows materialize only for each user's own [min,max] hour range, never
    a global calendar cross join; everything shuffles once on user_id and
    the fill is a streaming frame inside that partition's sort."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    src = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(_dec("value")).alias("v"), F.count(F.lit(1)).alias("n"))
    spine = (
        src.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    joined = spine.join(src, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("h").alias("hour_ts"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.round(F.coalesce("v", F.lit(0).cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("hour_value"),
        F.round(F.last("v", ignorenulls=True).over(w), 2)
        .cast("double")
        .alias("carried_value"),
    )


@register(
    "bm25_retrieval",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text),
                       '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]') AS t
        FROM documents
    ),
    tf AS (
        SELECT doc_id, len(t) AS dl,
               len(list_filter(t, x -> x = 'join')) AS tf_join,
               len(list_filter(t, x -> x = 'hash')) AS tf_hash,
               len(list_filter(t, x -> x = 'scan')) AS tf_scan
        FROM toks
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               SUM(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS df_join,
               SUM(CASE WHEN tf_hash > 0 THEN 1 ELSE 0 END) AS df_hash,
               SUM(CASE WHEN tf_scan > 0 THEN 1 ELSE 0 END) AS df_scan
        FROM tf
    )
    SELECT doc_id,
           ROUND(
             ln(1 + (n_docs - df_join + 0.5) / (df_join + 0.5))
               * (tf_join * 2.2) / (tf_join + 1.2 * (0.25 + 0.75 * dl / avgdl))
           + ln(1 + (n_docs - df_hash + 0.5) / (df_hash + 0.5))
               * (tf_hash * 2.2) / (tf_hash + 1.2 * (0.25 + 0.75 * dl / avgdl))
           + ln(1 + (n_docs - df_scan + 0.5) / (df_scan + 0.5))
               * (tf_scan * 2.2) / (tf_scan + 1.2 * (0.25 + 0.75 * dl / avgdl)),
           6) AS bm25
    FROM tf, stats
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (k1=1.2, b=0.75) for a fixed 3-term query —
    the keyword-search primitive of a corpus pipeline. Corpus statistics
    (N, avgdl, per-term document frequencies) are ONE tiny aggregate
    broadcast back over the per-doc term frequencies, so the corpus is
    scanned once and nothing but (doc_id, dl, 3 tf ints) shuffles.
    FP-determinism: the 3-term sum is written as one fixed-association
    expression (not an order-dependent SUM over exploded terms), all
    inputs are exact integers, and both engines do the same IEEE double
    arithmetic; top-k tie-broken on the rounded score then doc_id."""
    from icerunner_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    t = tokens("text")

    # single-parameter lambda builder: a 2-arg lambda would be called as
    # (element, index) by F.filter, not (element, captured-term)
    def match(term: str):
        return lambda x: x == F.lit(term)

    tf = d.select(
        "doc_id",
        F.size(t).alias("dl"),
        *[
            F.size(F.filter(t, match(term))).alias(f"tf_{term}")
            for term in ("join", "hash", "scan")
        ],
    )
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{term}") > 0, 1).otherwise(0)).alias(
                f"df_{term}"
            )
            for term in ("join", "hash", "scan")
        ],
    )

    def term_score(term: str) -> F.Column:
        tf_c = F.col(f"tf_{term}")
        df_c = F.col(f"df_{term}")
        idf = F.log(1 + (F.col("n_docs") - df_c + 0.5) / (df_c + 0.5))
        norm = tf_c + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
        return idf * (tf_c * 2.2) / norm

    score = F.round(
        term_score("join") + term_score("hash") + term_score("scan"), 6
    )
    return (
        tf.crossJoin(F.broadcast(stats))
        .select("doc_id", score.alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


# One live in-process Flight server per (process, sf_dir) for the federated
# query: the data source reads lazily at collect time, so unlike
# flight_roundtrip_nation the server must outlive query construction. A
# long-running server is also the realistic shape — this is a client-side
# cache, not server state.
_FED_SERVERS: dict[str, tuple[object, int]] = {}


def _federated_flight_server(spark: SparkSession, sf_dir: str) -> int:
    import pyarrow.parquet as pq

    from icerunner_spark.connector import Connector
    from icerunner_spark.flight.server import IceFlightServer

    key = os.path.normpath(sf_dir)
    if key not in _FED_SERVERS:
        # per-process uuid warehouse (the cached server owns it for the
        # process lifetime; _demo_warehouse's GC reclaims stale siblings)
        wh = _demo_warehouse("icerunner_flight_fed", sf_dir)
        c = Connector(spark, wh)
        c.create_table(
            "nation_fed", pq.read_table(os.path.join(sf_dir, "nation.parquet"))
        )
        # orders arrive in two key-disjoint commits so the pushdown
        # query's manifest pruning has files to skip
        t = c.catalog.table("orders_fed")
        orders = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
        )
        cut = orders.agg(F.max("o_orderkey")).first()[0] // 2
        t.create(orders.filter(F.col("o_orderkey") <= cut).repartition(2))
        t.append(orders.filter(F.col("o_orderkey") > cut).repartition(2))
        srv = IceFlightServer(c, host="127.0.0.1", port=0)
        _FED_SERVERS[key] = (srv, srv.port)
    return _FED_SERVERS[key][1]


@register(
    "flight_federated_join",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS total_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def flight_federated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated query: the nation dimension arrives over the wire through
    the Flight DATA SOURCE (spark.read.format("icerunner_flight") — each
    task streams its slice from a live server) and joins a local parquet
    fact inside one Catalyst plan. Proves the serve path composes with
    the optimizer: the remote dim broadcasts like any other dim, and the
    result must equal the all-local oracle join."""
    from icerunner_spark.sources.flight_source import register_flight_source

    register_flight_source(spark)
    port = _federated_flight_server(spark, sf_dir)
    nation = (
        spark.read.format("icerunner_flight")
        .option("url", f"grpc://127.0.0.1:{port}/nation_fed")
        .option("slices", "1")
        .load()
    )
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(nation), c.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _money_sum(_dec("c_acctbal")).alias("total_acctbal"),
        )
    )


@register(
    "flight_pushdown_scan",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice >= 150000.0
    GROUP BY o_orderpriority
    """,
)
def flight_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushdown over the Flight serve path: the client sends a
    ``scan`` ticket carrying `where` conjuncts; the SERVER prunes the file
    list against manifest column bounds (the orders table commits in two
    key-disjoint halves) and applies the residual filter in its pyarrow
    stream — the wire carries O(matching rows), Spark never runs
    server-side. At 100 TB this is the difference between shipping a
    table to filter it client-side and shipping an answer: the same
    pruning the local scan(where=) path uses, now honored by the remote
    protocol, matching Flight's DoExchange-style filtered reads and
    DataFusion/Ballista's pushdown over Flight. The ``columns``
    projection rides the same ticket: only the two aggregated columns'
    chunks are decoded and cross the wire (o_orderstatus/o_totalprice
    filter server-side WITHOUT being shipped), so the wire moves
    O(matching rows x needed columns). The oracle runs the same
    filter+aggregate over the raw parquet."""
    from icerunner_spark.flight.client import read_table_filtered

    port = _federated_flight_server(spark, sf_dir)
    got = read_table_filtered(
        "127.0.0.1", port, "orders_fed",
        [["o_orderstatus", "=", "O"], ["o_totalprice", ">=", 150000.0]],
        columns=["o_orderkey", "o_orderpriority"],
    )
    # the filtered result is O(matching rows) by construction — exactly
    # what the server streamed; aggregate it Spark-side like any frame
    local = spark.createDataFrame(got.to_pandas())
    return local.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
    )


@register(
    "high_water_marks_users",
    oracle="""
    WITH marked AS (
        SELECT user_id, value,
               CASE WHEN MAX(value) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR value > MAX(value) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    )
               THEN 1 ELSE 0 END AS breach
        FROM events
    )
    SELECT user_id,
           CAST(ROUND(MAX(value), 2) AS DOUBLE) AS high_water,
           CAST(SUM(breach) AS BIGINT) AS n_breaches
    FROM marked GROUP BY user_id
    """,
)
def high_water_marks_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user high-water-mark tracking: the running maximum in event
    order and how many events set a new record (first event counts). The
    running-max-over-preceding-rows + strict-increase-detection window
    pattern; `streaming/pipeline.py high_water_marks_stream` is the same
    operator as a transformWithStateInPandas stateful processor (two
    scalars of state per key). One shuffle on user_id; the frame is
    streaming within the partition sort."""
    from icerunner_spark.streaming.pipeline import high_water_marks

    return high_water_marks(_t(spark, sf_dir, "events"))


@register(
    "bpe_pair_frequencies",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text),
                       '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]') AS t
        FROM documents
    ),
    pairs AS (
        SELECT t[CAST(i AS INT)] || ' ' || t[CAST(i + 1 AS INT)] AS pair
        FROM toks,
             LATERAL (SELECT unnest(range(1, GREATEST(len(t), 1))) AS i) g
    )
    SELECT pair, COUNT(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 30
    """,
)
def bpe_pair_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent token-pair frequencies — the BPE/WordPiece merge-selection
    inner loop (each training iteration merges the most frequent pair).
    Pairs come from zipping the token array against itself shifted by one
    (pure HOF expression, no shuffle until the count); map-side partial
    aggregation absorbs pair skew and TakeOrdered caps the result at K.
    One round of the full tokenizer-training loop, exact on both
    engines."""
    from icerunner_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    t = tokens("text")
    n = F.size(t)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(30)
    )


@register("bpe_train_merges")
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterated BPE tokenizer TRAINING (32 merge rounds) — closes the
    loop ``bpe_pair_frequencies`` opens. One corpus pass builds the
    word-frequency table; each round then counts adjacent symbol pairs
    over that vocab-sized table (map-side-combinable sum), picks the
    argmax pair with a lexicographic tie-break, and re-tokenizes via a
    greedy left-to-right ``F.aggregate`` fold — no UDF, one driver row
    per round. No SQL oracle (32-round iteration isn't expressible);
    tests/test_operators.py pins the full merge table against a
    pure-Python BPE reference. See operators/bpe.py."""
    from icerunner_spark.operators.bpe import bpe_train_corpus

    d = _t(spark, sf_dir, "documents")
    return bpe_train_corpus(spark, d, "text", 32)


@register(
    "setops_multiset_quantities",
    oracle="""
    SELECT 'common_qty' AS op, qty, COUNT(*) AS n FROM (
        SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem
        WHERE l_returnflag = 'R'
        INTERSECT ALL
        SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem
        WHERE l_returnflag = 'A'
    ) GROUP BY qty
    UNION ALL
    SELECT 'r_extra_qty' AS op, qty, COUNT(*) AS n FROM (
        SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem
        WHERE l_returnflag = 'R'
        EXCEPT ALL
        SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem
        WHERE l_returnflag = 'A'
    ) GROUP BY qty
    """,
)
def setops_multiset_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — INTERSECT ALL keeps min(m,n)
    duplicates, EXCEPT ALL keeps m-n — the variant plain
    INTERSECT/EXCEPT (setops_customer_order_status) can't express.
    Spark's intersectAll/exceptAll compile to an aggregate-on-counts plan
    (one shuffle per input, no row-pair join); the re-aggregation
    afterward makes the output deterministic for the hash compare."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long").alias("qty")
    r = li.filter(F.col("l_returnflag") == "R").select(qty)
    a = li.filter(F.col("l_returnflag") == "A").select(qty)
    common = (
        r.intersectAll(a)
        .groupBy("qty")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("common_qty").alias("op"), "qty", "n")
    )
    extra = (
        r.exceptAll(a)
        .groupBy("qty")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("r_extra_qty").alias("op"), "qty", "n")
    )
    return common.unionAll(extra)


@register(
    "flight_sql_passthrough",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
)
def flight_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core verb — arbitrary SQL over the wire
    (icerunner.py:200-207 `sql()` + its Flight transport) — served by
    OUR engine: the client sends a ``{"sql": ...}`` ticket, the server
    plans and executes it with Spark SQL and streams Arrow batches back.
    Here the remote result lands in a DataFrame and must equal the same
    SQL run locally by the oracle."""
    import pyarrow.flight as flight

    port = _federated_flight_server(spark, sf_dir)
    client = flight.connect(f"grpc://127.0.0.1:{port}")
    ticket = (
        '{"sql": "SELECT n_regionkey, COUNT(*) AS n_nations '
        'FROM nation_fed GROUP BY n_regionkey"}'
    )
    got = client.do_get(flight.Ticket(ticket.encode())).read_all()
    return spark.createDataFrame(got.to_pandas())


@register(
    "filtered_aggregates_orders",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                      FILTER (WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
                2) AS DOUBLE) AS recent_total,
           CAST(ROUND(MIN(CAST(o_totalprice AS DECIMAL(12,2)))
                      FILTER (WHERE o_orderpriority <> '5-LOW'),
                2) AS DOUBLE) AS min_prioritized
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def filtered_aggregates_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER clause (per-aggregate predicates in one pass) —
    the standard-SQL spelling of conditional aggregation, distinct from
    the CASE-WHEN encoding used elsewhere (q8/q12/q14). One hash
    aggregate, each input row contributing only to the aggregates whose
    filter it passes; same single-shuffle cost as the unfiltered form."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_fagg")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                          FILTER (WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
                    2) AS DOUBLE) AS recent_total,
               CAST(ROUND(MIN(CAST(o_totalprice AS DECIMAL(12,2)))
                          FILTER (WHERE o_orderpriority <> '5-LOW'),
                    2) AS DOUBLE) AS min_prioritized
        FROM orders_fagg
        GROUP BY o_orderstatus
        """
    )


@register(
    "hybrid_retrieval_rerank",
    oracle="""
    WITH cand AS (
        SELECT doc_id,
               len(list_intersect(list_distinct(regexp_extract_all(lower(text),
                   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')),
                   ['join','hash','scan'])) AS n_terms
        FROM documents
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT c.doc_id, CAST(c.n_terms AS BIGINT) AS n_query_terms,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cos_sim
    FROM cand c
    JOIN embeddings e ON e.vec_id = c.doc_id, q
    WHERE c.n_terms >= 2
    ORDER BY cos_sim DESC, c.doc_id LIMIT 15
    """,
)
def hybrid_retrieval_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage hybrid search — the retrieve-then-rerank pipeline every
    RAG/search stack runs: a cheap lexical stage prunes the corpus (docs
    matching ≥2 of the query terms, scan-speed filter), then only the
    candidates pay the dense stage (exact embedding cosine against the
    broadcast query vector). At 100 TB the lexical stage is the point:
    the expensive vector math touches a candidate set, never the corpus.
    Top-k tie-broken on (rounded score, doc_id)."""
    from icerunner_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    terms = F.array(F.lit("join"), F.lit("hash"), F.lit("scan"))
    cand = d.select(
        "doc_id",
        F.size(F.array_intersect(F.array_distinct(tokens("text")), terms)).alias(
            "n_terms"
        ),
    ).filter(F.col("n_terms") >= 2)
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    # limit(1): structural bound for the broadcast audit (semantic no-op
    # on the unique vec_id — see similarity_bruteforce_topk)
    qvec = (
        e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("qv")).limit(1)
    )
    return (
        cand.join(e, cand.doc_id == e.vec_id)
        .crossJoin(F.broadcast(qvec))
        .select(
            "doc_id",
            F.col("n_terms").alias("n_query_terms"),
            F.round(cosine_similarity("emb", "qv"), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "doc_id")
        .limit(15)
    )


@register(
    "incremental_bm25_index",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
    ),
    toks AS (
        SELECT doc_id, regexp_extract_all(lower(text),
                       '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]') AS t
        FROM corpus
    ),
    tf AS (
        SELECT doc_id, len(t) AS dl,
               len(list_filter(t, x -> x = 'join')) AS tf_join,
               len(list_filter(t, x -> x = 'hash')) AS tf_hash,
               len(list_filter(t, x -> x = 'scan')) AS tf_scan
        FROM toks
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               SUM(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS df_join,
               SUM(CASE WHEN tf_hash > 0 THEN 1 ELSE 0 END) AS df_hash,
               SUM(CASE WHEN tf_scan > 0 THEN 1 ELSE 0 END) AS df_scan
        FROM tf
    )
    SELECT doc_id, bm25 FROM (
      SELECT doc_id,
             ROUND(
               ln(1 + (n_docs - df_join + 0.5) / (df_join + 0.5))
                 * (tf_join * 2.2) / (tf_join + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n_docs - df_hash + 0.5) / (df_hash + 0.5))
                 * (tf_hash * 2.2) / (tf_hash + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n_docs - df_scan + 0.5) / (df_scan + 0.5))
                 * (tf_scan * 2.2) / (tf_scan + 1.2 * (0.25 + 0.75 * dl / avgdl)),
             6) AS bm25
      FROM tf, stats
    ) WHERE bm25 > 0
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def incremental_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted inverted index maintained from the CDC changelog
    (operators.text_index.IncrementalBm25Index) — the lexical twin of
    incremental_ann_maintenance: build postings + doclens tables over
    part of the corpus, append the rest, merge-on-read delete a key
    slice, advance the index with ONE refresh (O(changed docs) equality
    deletes + appends, cursor lands last so crash-replay is idempotent),
    then serve BM25 straight FROM THE INDEX: the term-IN probe prunes
    bucket(term) partitions at planning, corpus stats are one narrow
    doclens aggregate, and the score is the same fixed-association
    double expression as the scan-time bm25_retrieval — so the oracle's
    full recompute over the final corpus state must hash-match the
    index-served top-20. At 100 TB a keyword query reads O(matching
    postings), never re-tokenizing the corpus."""
    from icerunner_spark.catalog import Catalog
    from icerunner_spark.operators.text_index import IncrementalBm25Index

    wh = _demo_warehouse("icerunner_bm25idx_demo", sf_dir)
    cat = Catalog(spark, wh)
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    t = cat.table("docs_bm25")
    t.create(d.filter(F.col("doc_id") % 3 != 2))
    idx = IncrementalBm25Index(t, os.path.join(wh, "bm25_idx"))
    idx.build()
    t.append(d.filter(F.col("doc_id") % 3 == 2))
    t.delete_where("doc_id % 5 = 0", mode="merge-on-read")
    idx.refresh()
    assert idx.refresh() is None  # already current
    assert idx.cursor() == t.current_snapshot().snapshot_id
    return idx.query(("join", "hash", "scan"), k=20)


@register("similarity_pq_topk")  # approximate: rows-only driver check;
# code determinism + recall (uniform hard mode AND clustered corpus)
# pinned in tests/test_operators.py::TestProductQuantization
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (operators.similarity.pq_topk): vectors
    stored as m=8 centroid indices (32x narrower than the embedding
    column), scored by asymmetric distance through an m×32 literal
    lookup table — no join, no shuffle before the TakeOrdered — then the
    top k·rerank candidates exact-rescored on full vectors. The
    compression tier between int8 (similarity_quantized_topk) and IVF
    cell pruning (similarity_ann_ivf); at corpus scale the ADC scan
    reads 8 bytes per row instead of 256. Parameters are probe-tuned
    (SCALE_PROBE.json ann_recall): the r7 m=4x16 books measured
    recall@10 = 0.92 at sf0.1 but 0.44 at sf1 — quantization error, not
    pool size, was the binding constraint, so r8 bought recall with
    codebook resolution (m=8x32: 1.00 / 0.84 at the same rerank=96 and
    latency) rather than letting the rescore pool grow with the
    corpus. Since r11 the resolution follows the corpus by rule
    (``_pq_codebook_budget``: n_codes = 32·ceil(sqrt(N/2000)), clamped
    to one byte) — the r10 sf2 drift to 0.72 was the frozen fixture
    codebook, not the algorithm."""
    from icerunner_spark.operators.similarity import pq_topk

    e = _t(spark, sf_dir, "embeddings")
    row = e.filter(F.col("vec_id") == 0).select("embedding").first()
    q = [float(x) for x in row["embedding"]]
    out = pq_topk(
        e.filter(F.col("vec_id") != 0),
        q,
        k=10,
        rerank=96,
        codebooks=_pq_index(spark, sf_dir),
    )
    return out.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


@register(
    "importance_sample_documents",
    oracle="""
    WITH w AS (
        SELECT doc_id, source, n_chars,
               CAST(LEAST(FLOOR(LEAST(n_chars / 200.0, 1.0) * 4294967296),
                          4294967295) AS BIGINT) AS th_int
        FROM documents
    ),
    kept AS (
        SELECT * FROM w
        WHERE substr(md5(CAST(doc_id AS VARCHAR) || '-imp'), 1, 8) <
              lpad(lower(to_hex(th_int)), 8, '0')
    )
    SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM kept GROUP BY source
    """,
)
def importance_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (importance) sampling: each document's acceptance
    probability is its own weight — here length-proportional,
    min(n_chars/200, 1) — decided by comparing a deterministic md5
    bucket against the weight scaled into hex space. Same reproducibility
    contract as stratified_sample_documents (the decision depends only on
    (doc_id, salt, weight), never on partition layout), but with a
    per-ROW rate instead of a per-stratum rate — the upsample/downsample
    primitive behind quality- or temperature-weighted corpus mixing.
    Pure narrow codegen filter; nothing shuffles until the tiny
    per-source rollup."""
    from icerunner_spark.functions.text import md5_bucket

    d = _t(spark, sf_dir, "documents")
    weight = F.least(F.col("n_chars") / 200.0, F.lit(1.0))
    th_int = F.least(
        F.floor(weight * F.lit(4294967296.0)), F.lit(4294967295)
    ).cast("long")
    th_hex = F.lpad(F.lower(F.hex(th_int)), 8, "0")
    return (
        d.filter(md5_bucket("doc_id", "imp") < th_hex)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )


@register(
    "gaps_islands_streaks",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS island
        FROM events
    ),
    streaks AS (
        SELECT user_id, event_type, island, COUNT(*) AS streak_len
        FROM ordered GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
           COUNT(*) AS n_streaks
    FROM streaks
    GROUP BY 1, 2
    HAVING MAX(streak_len) >= 4
    """,
)
def gaps_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive same-type runs per user via the
    row_number-difference idiom (global rank minus per-type rank is
    constant within a run), then run-length stats. The value-gap twin of
    session windows (time-gap), used for streak/run analytics over
    training telemetry. Both window ranks share the user_id partition —
    one shuffle, two in-partition sorts, then a tiny rollup."""
    e = _t(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    island = (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias(
        "island"
    )
    streaks = (
        e.select("user_id", "event_type", island)
        .groupBy("user_id", "event_type", "island")
        .agg(F.count(F.lit(1)).alias("streak_len"))
    )
    return (
        streaks.groupBy("user_id", "event_type")
        .agg(
            F.max("streak_len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
        .filter(F.col("longest_streak") >= 4)
    )


@register(
    "argmax_user_events",
    oracle="""
    WITH e AS (
        SELECT *, CAST(value AS DECIMAL(12,2)) * 100000000 + event_id AS ord
        FROM events WHERE user_id % 30 = 0
    )
    SELECT user_id,
           arg_max(event_type, ord) AS top_type,
           arg_max(event_id, ord) AS top_event_id,
           arg_min(event_id, ord) AS min_value_event_id,
           CAST(ROUND(MAX(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS top_value
    FROM e GROUP BY user_id
    """,
)
def argmax_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregates (max_by/min_by ↔ DuckDB arg_max/arg_min):
    the highest-value event's attributes per user in ONE aggregation pass
    — no self-join back to the winning row, no window+filter. The
    ordering key is an exact decimal composite (value·10⁸ + event_id):
    value has 2 decimals, so distinct values are ≥10⁶ apart in ord-space
    while event_id stays well below 10⁶ at any fixture SF — (value,
    event_id) pairs can never collide or invert the value-first order,
    and both engines pick the identical winner. Single
    map-side-combinable hash aggregate."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") % 30 == 0)
    ord_ = (_dec("value") * 100000000 + F.col("event_id")).alias("ord")
    e = e.withColumn("ord", ord_)
    return e.groupBy("user_id").agg(
        F.max_by("event_type", F.col("ord")).alias("top_type"),
        F.max_by("event_id", F.col("ord")).alias("top_event_id"),
        F.min_by("event_id", F.col("ord")).alias("min_value_event_id"),
        F.round(F.max(_dec("value")), 2).cast("double").alias("top_value"),
    )


@register(
    "funnel_steps_users",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    ),
    steps AS (
        SELECT user_id,
               CASE WHEN t_signup IS NULL THEN 0
                    WHEN t_view IS NULL OR t_view <= t_signup THEN 1
                    WHEN t_purchase IS NULL OR t_purchase <= t_view THEN 2
                    ELSE 3 END AS steps_completed
        FROM firsts
    )
    SELECT steps_completed, COUNT(*) AS n_users
    FROM steps GROUP BY steps_completed
    """,
)
def funnel_steps_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → view → purchase): how far each user got,
    by strictly increasing FIRST-occurrence times of each step. One
    conditional-MIN aggregation per user collapses the whole event
    history to three timestamps — the sequence test is then a scalar
    CASE, not a self-join per step (the naive funnel is an N-way
    self-join on user_id; this is one shuffle and map-side combinable).
    First-occurrence ordering is deterministic; simultaneous timestamps
    conservatively fail the step."""
    e = _t(spark, sf_dir, "events")

    def first_ts(tp: str):
        return F.min(F.when(F.col("event_type") == tp, F.col("ts")))

    firsts = e.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("view").alias("t_view"),
        first_ts("purchase").alias("t_purchase"),
    )
    steps = F.when(F.col("t_signup").isNull(), 0).when(
        F.col("t_view").isNull() | (F.col("t_view") <= F.col("t_signup")), 1
    ).when(
        F.col("t_purchase").isNull() | (F.col("t_purchase") <= F.col("t_view")), 2
    ).otherwise(3)
    return (
        firsts.select(steps.alias("steps_completed"))
        .groupBy("steps_completed")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "dedup_maintenance_roundtrip",
    oracle="""
    WITH ingested AS (
        SELECT doc_id,
               lower(regexp_replace(text, '\\s+', ' ', 'g')) AS norm
        FROM documents WHERE doc_id < 300
    )
    SELECT doc_id FROM ingested
    WHERE doc_id = (
        SELECT MIN(i2.doc_id) FROM ingested i2 WHERE i2.norm = ingested.norm
    )
    """,
)
def dedup_maintenance_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-clean loop end to end on the snapshot format:
    ingest documents in two append batches, run a CDC-driven maintenance
    pass after each (operators.incremental.dedup_maintenance_pass —
    exact-dedup the delta against the retained corpus, remove losers
    with a merge-on-read positional delete), and return the surviving
    ids. The invariant the oracle checks: after every pass the table
    equals a FULL greedy dedup of everything ingested so far — the
    prefix-decomposability that makes incremental dedup exact. Cost per
    pass is O(delta + fingerprint state); the table is never
    rewritten."""
    from icerunner_spark.connector import Connector
    from icerunner_spark.operators.incremental import dedup_maintenance_pass

    wh = _demo_warehouse("icerunner_maint_demo", sf_dir)
    c = Connector(spark, wh)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 300
    )
    t = c.catalog.table("corpus_maint")
    # start EMPTY so every ingested row goes through a maintenance pass
    # (rows present at the cursor are treated as already-retained state)
    t.create(docs.filter(F.lit(False)))
    cursor = t.current_snapshot().snapshot_id
    t.append(docs.filter(F.col("doc_id") < 150))
    _, cursor = dedup_maintenance_pass(t, cursor)
    t.append(docs.filter(F.col("doc_id") >= 150))
    _, cursor = dedup_maintenance_pass(t, cursor)
    return t.scan().select("doc_id")


@register(
    "snapshot_mor_delete_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey < 600 AND NOT (o_orderstatus = 'F' AND o_orderkey % 3 = 0)
    """,
)
def snapshot_mor_delete_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE demo on the snapshot format: load an orders
    slice, delete a predicate's rows via a POSITIONAL delete file (no
    table rewrite — table.py delete_where mode='merge-on-read'), and
    scan. The result must equal filtering the source directly, which is
    exactly what the oracle does. At 100 TB this is the difference
    between an O(deleted rows) commit and rewriting the table; the
    copy-on-write twin is exercised by snapshot_merge_upsert's family."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_mor_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).filter(F.col("o_orderkey") < 600)
    t = c.catalog.table("orders_mor")
    t.create(orders)
    t.delete_where(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 3 == 0),
        mode="merge-on-read",
    )
    return t.scan()


@register(
    "partitioned_table_prune",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
               AS total_price
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    """,
)
def partitioned_table_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec demo on the snapshot table format: write orders
    into a table identity-partitioned by o_orderpriority, then aggregate
    ONE priority — the scan rebuilds the partition column from the
    hive-style paths and Catalyst prunes every other partition at
    planning (PartitionFilters; physical numFiles/numPartitions pins in
    tests/test_table.py). At 100 TB this layout IS the index: the filter
    costs zero IO for the excluded partitions, through time travel and
    CDC reads too. The reference creates every table unpartitioned
    (icerunner.py:154-157)."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_part_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    t = c.catalog.table("orders_part")
    t.create(orders, partition_by=["o_orderpriority"])
    return (
        t.scan()
        .where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias(
                "total_price"
            ),
        )
    )


@register(
    "stats_pruned_scan",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_orderkey <= (SELECT MAX(o_orderkey) // 5 FROM orders)
    GROUP BY o_orderstatus
    """,
)
def stats_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats file skipping on the snapshot format: orders land
    in three commits covering disjoint o_orderkey ranges, each data
    file's column min/max recorded in the manifest at write
    (table.py _harvest_column_stats). A selective key-range scan then
    prunes the file list at PLANNING — driver-side metadata, zero IO for
    the excluded commits — before Catalyst ever sees a reader; the
    residual filter keeps the result exact, which is what the oracle
    (a plain filtered aggregate over the source) checks. At 100 TB this
    is Iceberg's manifest pruning: a time-ordered or key-ordered ingest
    makes selective scans O(matching files), not O(table). The inline
    assertion pins that pruning actually happened (fewer planned files
    than the manifest holds)."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_stats_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    cut = orders.agg(F.max("o_orderkey")).first()[0] // 5
    t = c.catalog.table("orders_stats")
    t.create(orders.filter(F.col("o_orderkey") <= cut).repartition(2))
    t.append(
        orders.filter(
            (F.col("o_orderkey") > cut) & (F.col("o_orderkey") <= 3 * cut)
        ).repartition(2)
    )
    t.append(orders.filter(F.col("o_orderkey") > 3 * cut).repartition(2))
    planned = t.plan_files([("o_orderkey", "<=", cut)])
    assert len(planned) < len(t.current_snapshot().manifest), "no file skipping"
    return (
        t.scan(where=[("o_orderkey", "<=", cut)])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias(
                "total_price"
            ),
        )
    )


@register(
    "bloom_pruned_scan",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM orders)
       OR o_orderkey = (SELECT MAX(o_orderkey) FROM orders)
    """,
)
def bloom_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file bloom-filter skipping (table property
    ``write.bloom.columns``): orders land in four single-file commits
    whose o_orderkey ranges fully overlap (interleaved by key mod 4), so
    min/max manifest stats can never skip — but each file carries an
    executor-built xxhash64 bloom bitmap in its commit sidecar, and a
    point/IN probe drops every file whose bloom rejects the literal at
    PLANNING time, zero IO. The residual Catalyst filter keeps the
    result exact (bloom false positives only cost a read), which the
    oracle checks by filtering the source directly. At 100 TB this is
    the needle-in-haystack path — key lookups on an unclustered ingest
    order read O(1) files instead of O(table) — the skipping tier
    Iceberg gets from parquet bloom filters / Puffin blobs. The inline
    assertion pins that files were actually skipped."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_bloom_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lo, hi, n = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey"), F.count(F.lit(1))
    ).first()
    t = c.catalog.table("orders_bloom")
    one = orders.repartition(1)  # one file per commit, overlapping bounds
    # size the filter to the data: ~12 bits per key per file (n/4 keys
    # each) keeps the FP rate ~1% at ANY scale factor — a fixed nbits
    # saturates at larger SFs and the skip (and its assert) vanishes
    nbits = 1 << max(17, (int(n) * 3).bit_length())
    t.create(
        one.filter(F.col("o_orderkey") % 4 == 0),
        properties={
            "write.bloom.columns": "o_orderkey",
            "write.bloom.nbits": str(nbits),
        },
    )
    for i in (1, 2, 3):
        t.append(one.filter(F.col("o_orderkey") % 4 == i))
    probe = [("o_orderkey", "in", [int(lo), int(hi)])]
    planned = t.plan_files(probe)
    assert len(planned) < len(t.current_snapshot().manifest), "no bloom skip"
    return t.scan(where=probe).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("total_price"),
    )


@register(
    "metadata_agg_pushdown",
    oracle="""
    WITH cut AS (SELECT MAX(o_orderkey) // 2 AS c FROM orders)
    SELECT (SELECT COUNT(*) FROM orders
            WHERE o_orderkey <= (SELECT c FROM cut)) AS n_low,
           (SELECT COUNT(*) FROM orders
            WHERE o_orderkey % 7 <> 0) AS n_after_delete,
           (SELECT MIN(o_orderkey) FROM orders) AS min_key,
           (SELECT MAX(o_orderkey) FROM orders) AS max_key
    """,
)
def metadata_agg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregate pushdown on the snapshot format
    (IceTable.metadata_count / metadata_min_max): COUNT(*) — unfiltered
    and over a bounds-provable key range — plus MIN/MAX answered from
    manifest row counts and column bounds alone, zero Spark jobs and
    zero data IO; after a merge-on-read delete the count stays exact
    (file rows minus recorded delete positions) while MIN/MAX correctly
    REFUSES (the extreme row might be deleted) — proven by inline
    assertions, with the oracle recomputing every number the slow way
    over the source table. This is Iceberg's count-star pushdown: on a
    100 TB table these aggregates are a millisecond driver-side manifest
    walk instead of a 1000-executor scan. The filtered count only
    answers when every surviving file's bounds prove ALL rows match
    (null-count zero, range containment) — partial files fall back."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_metaagg_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    cut = orders.agg(F.max("o_orderkey")).first()[0] // 2
    t = c.catalog.table("orders_metaagg")
    t.create(orders.filter(F.col("o_orderkey") <= cut).repartition(2))
    t.append(orders.filter(F.col("o_orderkey") > cut).repartition(2))
    n_low = t.metadata_count([("o_orderkey", "<=", cut)])
    assert n_low is not None, "filtered count should answer from metadata"
    mm = t.metadata_min_max("o_orderkey")
    assert mm is not None, "min/max should answer from metadata"
    t.delete_where(F.col("o_orderkey") % 7 == 0, mode="merge-on-read")
    n_after = t.metadata_count()
    assert n_after is not None, "MOR delete count should stay metadata-only"
    assert t.metadata_min_max("o_orderkey") is None, (
        "min/max must refuse while deletes are pending"
    )
    assert n_after == t.scan().count()  # metadata count == real count
    return spark.createDataFrame(
        [(n_low, n_after, int(mm[0]), int(mm[1]))],
        "n_low long, n_after_delete long, min_key long, max_key long",
    )


@register(
    "dynamic_file_prune_join",
    oracle="""
    WITH cut AS (SELECT MAX(o_orderkey) // 5 AS c FROM orders)
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey > 4 * (SELECT c FROM cut)
    GROUP BY o_orderpriority
    """,
)
def dynamic_file_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic file pruning on a star join (operators.dfp): lineitem
    lands in three commits covering disjoint l_orderkey ranges (the
    key-ordered ingest every time-series fact table has), then a
    selective orders-side filter drives the join. dim_join_predicates
    collects the dim's bounded key set (or just its [min, max] past
    ``max_keys``) and plans the fact scan through the manifest's
    per-file bounds — the two non-matching commits are skipped at
    PLANNING, zero IO, before Catalyst sees a reader; the residual
    filter plus the join keep the result exact, which the oracle (a
    plain filtered join over the sources) checks. At 100 TB this is
    Delta's dynamic file pruning / Iceberg's runtime filtering: the fact
    side reads O(files matching the dim), not O(table). The inline
    assertion pins that files were actually skipped. Join strategy is
    left to AQE — the dim side is never force-broadcast."""
    from icerunner_spark.connector import Connector
    from icerunner_spark.operators.dfp import (
        dim_join_predicates,
        dynamic_pruned_join,
    )

    wh = _demo_warehouse("icerunner_dfp_demo", sf_dir)
    c = Connector(spark, wh)
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    cut = orders.agg(F.max("o_orderkey")).first()[0] // 5
    t = c.catalog.table("lineitem_dfp")
    t.create(li.filter(F.col("l_orderkey") <= 2 * cut).repartition(2))
    t.append(
        li.filter(
            (F.col("l_orderkey") > 2 * cut) & (F.col("l_orderkey") <= 4 * cut)
        ).repartition(2)
    )
    t.append(li.filter(F.col("l_orderkey") > 4 * cut).repartition(2))
    dim = orders.filter(F.col("o_orderkey") > 4 * cut)
    planned = t.plan_files(
        dim_join_predicates(dim, "o_orderkey", "l_orderkey")
    )
    assert len(planned) < len(t.current_snapshot().manifest), "no DFP skip"
    return (
        dynamic_pruned_join(t, "l_orderkey", dim, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _money_sum(
                _dec("l_extendedprice") * (1 - _dec("l_discount", 4, 2))
            ).alias("revenue"),
        )
    )


@register(
    "incremental_ann_maintenance",
    oracle="""
    WITH state AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE NOT (vec_id % 7 = 0 AND vec_id > 0)
    ), q AS (
        SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0
    )
    SELECT s.vec_id,
           ROUND(list_cosine_similarity(s.embedding::DOUBLE[], q.qe), 6)
               AS cos_sim
    FROM state s, q
    ORDER BY cos_sim DESC, s.vec_id
    LIMIT 10
    """,
)
def incremental_ann_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted IVF index maintained from the CDC changelog
    (operators.ann_index.IncrementalAnnIndex): build the index over half
    the embeddings, append the rest, merge-on-read delete a key slice,
    then advance the index with ONE refresh — an O(keys) equality delete
    of departed ids plus an assign + merge-on-read upsert of arrivals,
    resolved per-id by the changelog's ``_change_ordinal`` (an id
    appended then deleted in-range nets to a removal). The index table
    is identity-partitioned by IVF cell, so partial probes prune whole
    partitions at planning. Here the search runs at FULL probe, making
    it exact: top-10 by cosine through the index must equal the oracle's
    brute-force ranking over the final base state. At 100 TB this is how
    an ANN index follows a living corpus — refresh cost tracks the CDC
    delta, never the corpus."""
    from icerunner_spark.connector import Connector
    from icerunner_spark.functions.vector import cosine_similarity
    from icerunner_spark.operators.ann_index import IncrementalAnnIndex

    wh = _demo_warehouse("icerunner_annidx_demo", sf_dir)
    c = Connector(spark, wh)
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    base = c.catalog.table("embeddings_base")
    base.create(emb.filter(F.col("vec_id") % 2 == 0))
    idx = IncrementalAnnIndex(base, os.path.join(wh, "ann_idx"), n_centroids=8)
    idx.build()
    base.append(emb.filter(F.col("vec_id") % 2 == 1))
    base.delete_where("vec_id % 7 = 0 AND vec_id > 0", mode="merge-on-read")
    idx.refresh()
    assert idx.refresh() is None  # already current
    qrow = emb.filter(F.col("vec_id") == 0).first()
    qarr = F.array(*[F.lit(float(x)) for x in qrow["embedding"]])
    # rank by the ROUNDED score on both sides so the LIMIT boundary is
    # engine-independent under FP noise
    return (
        idx.index.scan()
        .select(
            "vec_id",
            F.round(
                cosine_similarity(F.col("embedding"), qarr), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "table_ndv_stats",
    oracle="""
    SELECT 'o_custkey' AS col_name,
           COUNT(DISTINCT o_custkey) AS exact_ndv,
           TRUE AS within_5pct
    FROM orders
    """,
)
def table_ndv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file HLL NDV sketches (table property ``write.ndv.columns``,
    table.approx_ndv): orders land in two commits, each data file
    staging a Datasketches HLL sketch of o_custkey in its commit sidecar
    (hll_sketch_agg — map-side combinable, the shuffle moves KB sketch
    partials). approx_ndv unions the sketches at METADATA cost — no data
    scan — the role Iceberg's Puffin blobs play for its planner's NDV
    stats. The estimate is approximate, so the oracle-comparable output
    is (exact count, estimate-within-5% flag): deterministic for fixed
    data and sketch config, and the flag failing IS the accuracy
    regression signal. At 100 TB: per-column NDV for join planning /
    dedup sizing without touching the table."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_ndv_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    t = c.catalog.table("orders_ndv")
    t.create(
        orders.filter(F.col("o_orderkey") % 2 == 0),
        properties={"write.ndv.columns": "o_custkey"},
    )
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    est = t.approx_ndv("o_custkey")
    exact = orders.agg(
        F.countDistinct("o_custkey").alias("n")
    ).first()["n"]
    ok = abs(est - exact) / max(exact, 1) < 0.05
    return spark.createDataFrame(
        [("o_custkey", int(exact), bool(ok))],
        "col_name string, exact_ndv long, within_5pct boolean",
    )


@register(
    "snapshot_rollback_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    WHERE o_orderkey < 900
    GROUP BY o_orderstatus
    """,
)
def snapshot_rollback_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational rollback (Iceberg rollback_to_snapshot): the base
    slice commits, a bad pipeline run lands a merge-on-read delete AND a
    junk append, ``rollback_to`` restores the good snapshot's exact state
    as one metadata-only commit, and ingestion resumes with the second
    slice. The final scan must be indistinguishable from the bad run
    never happening — which is precisely what the oracle (a plain
    aggregate over the raw parquet) checks. The bad commits stay
    time-travelable for forensics until expiry. At 100 TB this is the
    recovery story: undoing a corrupted ingest costs one commit, not a
    restore from backup."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_rollback_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    t = c.catalog.table("orders_rb")
    t.create(orders.filter(F.col("o_orderkey") < 600))
    good = t.current_snapshot().snapshot_id
    # the bad run: rows vanish and junk arrives
    t.delete_where(F.col("o_orderkey") % 3 == 0, mode="merge-on-read")
    t.append(
        orders.filter(F.col("o_orderkey") < 50).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(5_000_000)
        )
    )
    t.rollback_to(good)
    # ingestion resumes on the restored state
    t.append(
        orders.filter((F.col("o_orderkey") >= 600) & (F.col("o_orderkey") < 900))
    )
    return (
        t.scan()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


@register(
    "add_files_import",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    WHERE o_orderkey < 1200
    GROUP BY o_orderstatus
    """,
)
def add_files_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-cost ingestion (Iceberg's ``add_files`` procedure): half
    the slice commits normally, the other half is a pre-existing parquet
    export REGISTERED into the table — hard-linked, schema-checked,
    footer stats harvested into the manifest — without reading or
    rewriting a row of it. The scan then reads both halves as one table,
    and the oracle (a plain aggregate over the raw parquet) pins that
    registration changed nothing about the values. At 100 TB this is how
    a day's crawl output or a vendor drop joins the table: O(files)
    metadata, zero data movement, stats-pruned scans from the first
    query."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_addfiles_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    ext = os.path.join(wh, "external_export")
    orders.filter(
        (F.col("o_orderkey") >= 600) & (F.col("o_orderkey") < 1200)
    ).repartition(2).write.parquet(ext)
    ext_files = sorted(
        os.path.join(ext, f) for f in os.listdir(ext) if f.endswith(".parquet")
    )
    t = c.catalog.table("orders_imported")
    t.create(orders.filter(F.col("o_orderkey") < 600))
    t.add_files(ext_files)
    return (
        t.scan()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


@register(
    "partition_spec_evolution",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    """,
)
def partition_spec_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution (Iceberg ALTER TABLE ADD PARTITION FIELD):
    half of orders commits UNPARTITIONED, then ``update_partition_spec``
    switches the table to identity partitioning on o_orderpriority —
    metadata-only, zero files touched — and the second half lands in
    hive-partitioned dirs. One scan filters the priority across BOTH
    layouts: the new dirs prune by path, the old dirs read the column
    physically, and the result must equal the oracle's plain filtered
    aggregate over the raw parquet. At 100 TB this is how a table adopts
    a better layout without an O(table) rewrite — history keeps its
    shape, the future gets the index, compaction migrates at leisure.
    The inline assertion pins that the spec actually changed mid-table."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_specev_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    cut = orders.agg(F.max("o_orderkey")).first()[0] // 2
    t = c.catalog.table("orders_specev")
    t.create(orders.filter(F.col("o_orderkey") <= cut))
    assert t.partition_spec() == []
    t.update_partition_spec(["o_orderpriority"])
    t.append(orders.filter(F.col("o_orderkey") > cut))
    assert t.partition_spec() == ["o_orderpriority"]
    return (
        t.scan(where=[("o_orderpriority", "=", "1-URGENT")])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


@register(
    "snapshot_update_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(
               CASE WHEN o_orderkey % 7 = 0 THEN 0.0 ELSE o_totalprice END
               AS DECIMAL(14,2))), 2) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey < 900
    GROUP BY o_orderstatus
    """,
)
def snapshot_update_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level UPDATE on the snapshot format: ``update_where`` in
    merge-on-read mode commits ONE 'merge' snapshot — a positional delete
    of the old row versions plus an append of the updated versions,
    O(changed rows) IO where copy-on-write would rewrite the table. The
    scan anti-joins the delete file and unions the appended rows like any
    MOR read; the oracle replays the update as a CASE expression over the
    raw parquet, pinning value-exactness. At 100 TB this is the UPDATE
    path a CDC-apply or GDPR-rectification pipeline needs — cost follows
    the changed rows, not the table."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_update_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = c.catalog.table("orders_upd")
    t.create(orders.filter(F.col("o_orderkey") < 900))
    t.update_where(
        F.col("o_orderkey") % 7 == 0,
        {"o_totalprice": F.lit(0.0)},
        mode="merge-on-read",
    )
    return (
        t.scan()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice", 14)).cast("double"), 2).alias(
                "total_price"
            ),
        )
    )


@register(
    "type_widening_roundtrip",
    oracle="""
    WITH t AS (
        SELECT CAST(o_orderkey AS INTEGER) AS o_orderkey, o_orderstatus
        FROM orders WHERE o_orderkey < 600
        UNION ALL
        SELECT o_orderkey + 3000000000, o_orderstatus
        FROM orders WHERE o_orderkey >= 600 AND o_orderkey < 900
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM t GROUP BY o_orderstatus
    """,
)
def type_widening_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only type promotion (Iceberg ALTER COLUMN TYPE): the base
    slice commits with an INT key column, ``widen_column`` promotes it to
    BIGINT without touching a data file, and an append lands keys beyond
    int range — one scan then reads old-narrow and new-wide files
    together (Spark's parquet reader upcasts int32 pages natively; pinned
    in tests/test_table.py). The oracle unions the two slices with the
    same casts over the raw parquet, verifying the widened read is
    value-exact. At 100 TB this is the evolution path that avoids an
    O(table) rewrite when an id column outgrows int32 — the schema
    changes, history stays byte-identical, and time travel still reads
    old snapshots under the old type."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_widen_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    t = c.catalog.table("orders_widen")
    t.create(
        orders.filter(F.col("o_orderkey") < 600).withColumn(
            "o_orderkey", F.col("o_orderkey").cast("int")
        )
    )
    t.widen_column("o_orderkey", "long")
    t.append(
        orders.filter(
            (F.col("o_orderkey") >= 600) & (F.col("o_orderkey") < 900)
        ).withColumn("o_orderkey", F.col("o_orderkey") + F.lit(3_000_000_000))
    )
    return (
        t.scan()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


@register(
    "wap_branch_publish",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2)
                AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey < 900
      AND NOT (o_orderkey < 600
               AND o_orderstatus = 'F'
               AND o_orderkey % 7 = 0)
    GROUP BY o_orderstatus
    """,
)
def wap_branch_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish on the snapshot format (Iceberg branch refs +
    fast_forward): the base orders slice commits to main, then an append
    and a merge-on-read delete stage on an ``audit`` branch — an
    independently-advancing metadata sub-log sharing the data dir — while
    main remains bit-identical for readers. The inline assertions ARE the
    audit step (row counts on both refs); ``fast_forward`` then publishes
    the branch chain atomically onto main, snapshot ids and CDC history
    intact. The oracle expresses the same append+delete pipeline as one
    SQL predicate over the raw parquet, pinning that staged-then-published
    equals computed-directly. At 100 TB this is how risky pipeline writes
    ship: audit on the branch costs metadata only, a failed audit is
    drop_branch (zero data IO), and publish is one CAS."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_wap_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = c.catalog.table("orders_wap")
    t.create(orders.filter(F.col("o_orderkey") < 600))
    main_head = t.current_snapshot().snapshot_id

    b = t.create_branch("audit")
    # delete BEFORE append: positional deletes bind to the files present
    # at delete time, so the appended slice survives even where it
    # matches the predicate — the oracle encodes exactly that ordering
    b.delete_where(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 7 == 0),
        mode="merge-on-read",
    )
    b.append(
        orders.filter((F.col("o_orderkey") >= 600) & (F.col("o_orderkey") < 900))
    )
    # audit: staged state visible on the branch, main untouched
    assert t.current_snapshot().snapshot_id == main_head, "main moved during WAP"
    n_main, n_branch = t.scan().count(), b.scan().count()
    assert n_branch != n_main or n_branch == 0, "branch staged nothing"
    t.fast_forward("audit")
    t.drop_branch("audit")
    return (
        t.scan()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice", 14)).cast("double"), 2).alias(
                "total_price"
            ),
        )
    )


@register(
    "clustered_compact_scan",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 2)
                AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_orderkey <= (SELECT MAX(l_orderkey) // 10 FROM lineitem)
    GROUP BY l_returnflag
    """,
)
def clustered_compact_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-clustered compaction as an index build: lineitem lands in the
    snapshot table via hash-shuffled commits (every file spans ~the full
    key range, so manifest-stats pruning removes NOTHING), then one
    ``compact(sort_by=[l_orderkey])`` range-partitions + sorts the
    rewrite — after which the per-file min/max bounds are disjoint and a
    selective key-range scan reads O(matching) files at planning time.
    The inline assertions pin both halves (no pruning before, real
    pruning after); the oracle — a plain filtered aggregate over the raw
    parquet — pins that clustering changed the LAYOUT, never the rows.
    At 100 TB this is Iceberg's rewrite_data_files(sort) maintenance:
    one O(table) background pass converts append-order chaos into an
    ordered layout every later range scan benefits from."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_cluster_demo", sf_dir)
    c = Connector(spark, wh)
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    cut = li.agg(F.max("l_orderkey")).first()[0] // 10
    t = c.catalog.table("lineitem_sorted")
    # hash repartition deliberately scatters every key range across all
    # files of both commits
    t.create(li.filter(F.col("l_orderkey") % 2 == 0).repartition(4))
    t.append(li.filter(F.col("l_orderkey") % 2 == 1).repartition(4))
    pre = t.plan_files([("l_orderkey", "<=", cut)])
    assert len(pre) == len(t.current_snapshot().manifest), (
        "expected NO pruning before clustering"
    )
    n_rows = t.scan().count()
    t.compact(target_file_rows=max(1000, n_rows // 8), sort_by=["l_orderkey"])
    post = t.plan_files([("l_orderkey", "<=", cut)])
    assert len(post) < len(t.current_snapshot().manifest), (
        "sorted compaction produced no file skipping"
    )
    return (
        t.scan(where=[("l_orderkey", "<=", cut)])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(_dec("l_extendedprice", 14)).cast("double"), 2
            ).alias("sum_price"),
        )
    )


@register(
    "transform_partition_prune",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_custkey IN (7, 19, 42)
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY o_orderstatus
    """,
)
def transform_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden (transform) partitioning on the snapshot format — Iceberg's
    ``bucket``/``month`` partition transforms: orders land under
    ``bucket(8, o_custkey) × month(o_orderdate)`` hive paths while the
    source columns stay in the files, and a query filtering the SOURCE
    columns (it never mentions the partition layout) prunes the file
    list at planning time — the bucket transform via a driver-side XXH64
    twin of the write path's ``F.xxhash64`` (pinned bit-identical in
    tests/test_table.py), the month transform via order-preserving range
    comparison. At 100 TB bucketing the customer key bounds every
    per-customer lookup to 1/N of the files regardless of ingest order —
    the layout Iceberg calls hidden partitioning, which the reference's
    identity-only tables can't express (icerunner.py:154-157). The inline
    assertion pins that pruning actually removed files; the residual
    Catalyst filter keeps the result exact, which the oracle (a plain
    filtered aggregate over the raw parquet) verifies."""
    import datetime

    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_transform_demo", sf_dir)
    c = Connector(spark, wh)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate",
    )
    t = c.catalog.table("orders_hidden")
    t.create(
        orders.repartition(4),
        partition_by=["bucket(8, o_custkey)", "month(o_orderdate)"],
    )
    where = [
        ("o_custkey", "in", [7, 19, 42]),
        ("o_orderdate", ">=", datetime.datetime(1995, 1, 1)),
    ]
    planned = t.plan_files(where)
    assert 0 < len(planned) < len(t.current_snapshot().manifest), (
        "transform pruning removed no files"
    )
    return (
        t.scan(where=where)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias(
                "total_price"
            ),
        )
    )


# --------------------------------------------------------------------------- #
# Unigram LM quality scoring — SURVEY §2.C quality filtering
# --------------------------------------------------------------------------- #

_TOKEN_RE_SQL = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


@register(
    "unigram_logprob_quality",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) AS w
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, w, COUNT(*) AS k FROM tok GROUP BY doc_id, w
    ),
    freq AS (SELECT w, CAST(SUM(k) AS BIGINT) AS c FROM per_doc GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM freq)
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_tokens,
           ROUND(SUM(k * LN(c / t)) / SUM(k), 6) AS mean_logprob
    FROM per_doc JOIN freq USING (w) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram language-model quality score: each doc's
    mean token log-probability under the corpus's own unigram
    distribution — the classic cheap perplexity proxy a training-data
    pipeline uses to rank/flag atypical documents (boilerplate, garbled
    encodings score low).

    Scale shape: tokens collapse to (doc_id, word, k) FIRST (map-side
    combinable — stopword skew is absorbed before anything wide
    shuffles), the frequency table is vocab-sized (Heaps' law: sublinear
    in corpus size), and the per-doc score is one hash aggregate. The
    freq join carries no broadcast hint — AQE runtime-broadcasts the
    vocab while it fits and degrades to a shuffle join (with skew
    splitting) past that. The total-count scalar is a 1-row cross join.
    Rounding to 6dp absorbs sub-ulp libm/log differences between
    engines; counts and the division are exact."""
    from icerunner_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("w"))
    per_doc = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("k"))
    freq = per_doc.groupBy("w").agg(F.sum("k").alias("c"))
    tot = freq.agg(F.sum("c").cast("double").alias("t"))
    scored = per_doc.join(freq, "w").crossJoin(F.broadcast(tot))
    return scored.groupBy("doc_id").agg(
        F.sum("k").alias("n_tokens"),
        F.round(
            F.sum(F.col("k") * F.log(F.col("c") / F.col("t"))) / F.sum("k"), 6
        ).alias("mean_logprob"),
    )


@register(
    "bigram_logprob_quality",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS t
      FROM documents
    ),
    uni AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM uni),
    pairs AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
    ),
    pd AS (
      SELECT doc_id, w1, w2, COUNT(*) AS k FROM pairs GROUP BY doc_id, w1, w2
    ),
    bf AS (SELECT w1, w2, SUM(k) AS c12 FROM pd GROUP BY w1, w2),
    scored AS (
      SELECT pd.doc_id, pd.k,
             ln(0.8 * (bf.c12 / u1.c) + 0.2 * (u2.c / tot.t)) AS lp
      FROM pd
      JOIN bf USING (w1, w2)
      JOIN uni u1 ON u1.w = pd.w1
      JOIN uni u2 ON u2.w = pd.w2, tot
    )
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_bigrams,
           ROUND(SUM(k * lp) / SUM(k), 6) AS mean_logprob
    FROM scored GROUP BY doc_id
    """,
)
def bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated BIGRAM language-model quality score — the step up
    from unigram_logprob_quality that actually penalizes scrambled or
    template-stitched text (right words, wrong order): each doc's mean
    bigram log-probability under P(w2|w1) = 0.8·c(w1,w2)/c(w1) +
    0.2·c(w2)/T, trained on the corpus itself.

    Scale shape mirrors the unigram query one level up: adjacent pairs
    come from a shifted-array zip (no self-join), collapse to
    (doc, w1, w2, k) FIRST so repeated bigrams combine map-side, the
    bigram table is vocab²-bounded but Heaps-sublinear in practice, and
    the three count joins carry no broadcast hints — AQE broadcasts
    while they fit. Docs with <2 tokens have no bigrams and drop from
    the output (both engines). Rounding to 6dp absorbs sub-ulp libm
    differences; counts and divisions are exact."""
    from icerunner_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens("text").alias("t"))
    n = F.greatest(F.size("t") - 1, F.lit(0))
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("t", 1, n),
                F.slice("t", 2, n),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    pd_ = pairs.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("k"))
    bf = pd_.groupBy("w1", "w2").agg(F.sum("k").alias("c12"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("double").alias("t"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        pd_.join(bf, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "k",
            F.log(
                0.8 * (F.col("c12") / F.col("c1"))
                + 0.2 * (F.col("c2") / F.col("t"))
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").alias("n_bigrams"),
        F.round(F.sum(F.col("k") * F.col("lp")) / F.sum("k"), 6).alias(
            "mean_logprob"
        ),
    )


@register(
    "token_budget_mixture",
    oracle=f"""
    SELECT lang, doc_id, n_tok, cum_tokens FROM (
        SELECT lang, doc_id, n_tok,
               CAST(SUM(n_tok) OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS cum_tokens
        FROM (
            SELECT lang, doc_id,
                   CAST(len(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) AS BIGINT) AS n_tok
            FROM documents
        )
    ) WHERE cum_tokens <= 3000
    """,
)
def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture sampling to a per-source token budget: each language
    stratum contributes documents (in deterministic md5 shuffle order)
    until its token budget is exhausted — how a training run caps each
    domain/language's contribution without a driver-side loop.

    Scale shape: one narrow map for token counts, one window per stratum
    (running token total in md5 order — the same engine-portable
    determinism rule as the sharding/sampling queries), one filter. The
    per-stratum window is the only shuffle; budget enforcement is exact,
    order-stable, and restart-safe because the acceptance order is a pure
    function of doc_id."""
    from pyspark.sql.window import Window

    from icerunner_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        "doc_id",
        token_count("text").cast("long").alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("__h"),
    )
    w = Window.partitionBy("lang").orderBy("__h", "doc_id")
    out = base.withColumn("cum_tokens", F.sum("n_tok").over(w))
    return out.filter(F.col("cum_tokens") <= 3000).select(
        "lang", "doc_id", "n_tok", "cum_tokens"
    )


@register("bpe_encode_documents")  # iterative training + sequential merge
def bpe_encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: train 16 BPE merges on the corpus
    (operators.bpe.bpe_train_corpus), then encode every document with
    the learned table — the produce-training-tokens step that follows
    bpe_train_merges. Encoding is an Arrow-batched pandas UDF with a
    per-batch word cache (Zipf absorbs almost all lookups); the merge
    table ships in the closure (KBs). No SQL oracle (iterative train +
    sequential merge replay); rows-only driver check, with the encoder
    pinned against a pure-Python reference and the
    round-trip/consistency invariants in tests/test_operators.py."""
    from icerunner_spark.operators.bpe import bpe_encode, bpe_train, word_frequencies

    d = _t(spark, sf_dir, "documents")
    merges = bpe_train(word_frequencies(d, "text"), 16)
    enc = bpe_encode(d, "text", [(le, r) for le, r, _ in merges])
    return enc.select(
        "doc_id",
        F.size("bpe_tokens").alias("n_bpe_tokens"),
        F.md5(F.concat_ws("", "bpe_tokens")).alias("tokens_md5"),
    )


@register(
    "pagerank_order_graph",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS src,
                        's:' || CAST(l.l_suppkey AS VARCHAR) AS dst
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    und AS (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM und GROUP BY src),
    r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM deg),
    r1 AS (
        SELECT e.dst AS node,
               CAST(150000000000
                    + (85 * SUM(r.rank // d.deg)) // 100 AS BIGINT) AS rank
        FROM und e JOIN r0 r ON e.src = r.node JOIN deg d ON d.node = r.node
        GROUP BY e.dst
    ),
    r2 AS (
        SELECT e.dst AS node,
               CAST(150000000000
                    + (85 * SUM(r.rank // d.deg)) // 100 AS BIGINT) AS rank
        FROM und e JOIN r1 r ON e.src = r.node JOIN deg d ON d.node = r.node
        GROUP BY e.dst
    ),
    r3 AS (
        SELECT e.dst AS node,
               CAST(150000000000
                    + (85 * SUM(r.rank // d.deg)) // 100 AS BIGINT) AS rank
        FROM und e JOIN r2 r ON e.src = r.node JOIN deg d ON d.node = r.node
        GROUP BY e.dst
    )
    SELECT node, rank AS rank_e12 FROM r3
    ORDER BY rank DESC, node LIMIT 20
    """,
)
def pagerank_order_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PageRank (3 power iterations, damping 0.85) over the
    undirected customer–supplier order graph — the iterative-graph
    family next to kmeans_cluster_profile's iterative-clustering one,
    and the shape of domain-authority / source-reputation scoring in a
    training-data pipeline. Entirely collect-free: each iteration is ONE
    shuffle keyed on the destination node (contribution = rank/degree
    flows along cached edges, map-side combinable sum per dst), the rank
    frame never exceeds |nodes| rows, and the driver only composes the
    plan. Determinism across engines is total, not probabilistic: ranks
    live in FIXED-POINT integer units of 1e-12 (init = 1e12; update =
    0.15*1e12 + (85*sum(rank div deg)) div 100 — BIGINT div/mul/sum
    only), so both engines compute bit-identical integers with no FP
    association or rounding anywhere. At 100 TB: edges/deg are built
    once and cached (at cluster scale: persisted + co-bucketed on src so
    every iteration's join is shuffle-free), per-iteration lineage is
    truncated by checkpointing every ~10 rounds, and the 1e-12 units
    would widen to DECIMAL(38,0) once n_nodes*1e12 approaches 2^63
    (~9e6 nodes)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    und = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # fold the src degree onto each edge ONCE, outside the loop: every
    # iteration is then a single src-keyed join + one dst-keyed partial
    # aggregate (the two-join formulation re-shuffled the edge set twice
    # per iteration — measured 6.1 s -> see bench for the folded form).
    # Cache-lifetime contract (r9 verdict item 7): an eager
    # localCheckpoint, NOT persist(). A persist entry lives in the SQL
    # CacheManager until someone calls clearCache — composing this
    # operator into a longer pipeline leaked it. The checkpoint
    # materializes the same |edges| rows once, registers NO CacheManager
    # entry (pinned by the composition pytest), truncates the iteration
    # lineage, and its blocks are released by the ContextCleaner when
    # the returned frame is garbage-collected — no harness clearCache
    # dependency. On a real cluster, reliable checkpointing (or
    # src-bucketed persisted edges) replaces this single-node form.
    w = Window.partitionBy("src")
    und_deg = und.withColumn("deg", F.count(F.lit(1)).over(w)).localCheckpoint()
    SCALE = 1_000_000_000_000
    ranks = (
        und_deg.select("src").distinct()
        .select(F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("rank"))
    )
    for _ in range(3):
        # ranks is |nodes| rows of (string, long) — broadcast it so the
        # cached edge set never re-shuffles for the join (measured ~13%
        # on the entry; the groupBy below is then the iteration's only
        # exchange). Holds while |nodes|*~24B fits executor memory
        # (~10^7 nodes); past that, flip to a shuffle join against
        # src-bucketed edges so neither side moves.
        contrib = und_deg.join(
            F.broadcast(ranks), und_deg["src"] == ranks["node"]
        ).select("dst", F.expr("rank div deg").alias("c"))
        ranks = contrib.groupBy("dst").agg(
            (
                F.lit(150_000_000_000).cast("long")
                + F.expr("(85 * sum(c)) div 100")
            ).alias("rank")
        ).withColumnRenamed("dst", "node")
    return ranks.select("node", F.col("rank").alias("rank_e12")).orderBy(
        F.desc("rank_e12"), "node"
    ).limit(20)


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text),
                          '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS term
            FROM documents
        ) GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * (LN((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6)
                   AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rk FROM (
        SELECT doc_id, term, tfidf,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS INT)
                   AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction (top-3 terms per doc with
    smoothed idf = ln((N+1)/(df+1)) + 1) — the feature-extraction
    primitive behind keyword tagging, topic routing, and sparse
    retrieval, distinct from bm25_retrieval's query-time scoring. Shuffle
    shape at 100 TB: tokens partial-aggregate map-side into (doc, term)
    counts (one exchange keyed on the pair, never raw token rows), the
    doc-frequency table is a SECOND aggregate of that result (vocab-sized
    exchange, no re-scan of the corpus), and the corpus count joins in as
    a broadcast single row. Ranking happens on the ROUNDED score with a
    term tie-break, so the cross-engine ordering is stable."""
    from icerunner_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
    )


@register(
    "zipf_token_fit",
    oracle="""
    WITH tok AS (
        SELECT lang,
               unnest(regexp_extract_all(lower(text),
                      '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS tok
        FROM documents
    ),
    freq AS (
        SELECT lang, tok, COUNT(*) AS c FROM tok GROUP BY lang, tok
    ),
    ranked AS (
        SELECT lang, c,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY c DESC, tok) AS r
        FROM freq
    ),
    top AS (SELECT * FROM ranked WHERE r <= 1000),
    s AS (
        SELECT lang,
               COUNT(*) AS n,
               SUM(CAST(ln(CAST(r AS DOUBLE)) AS DECIMAL(27,12))) AS sx,
               SUM(CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(27,12))) AS sy,
               SUM(CAST(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))
                        AS DECIMAL(27,12))) AS sxx,
               SUM(CAST(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE))
                        AS DECIMAL(27,12))) AS sxy
        FROM top GROUP BY lang
    )
    SELECT lang, CAST(n AS BIGINT) AS n_terms,
           CASE WHEN n >= 2 THEN
               ROUND(-(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
           END AS zipf_alpha
    FROM s ORDER BY lang
    """,
)
def zipf_token_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-exponent fit per language — the corpus-health probe behind
    "is this crawl dump natural text or generated/boilerplate spam"
    (natural language sits near alpha 1; template floods and
    deduplication failures flatten or steepen it). OLS of ln(freq) on
    ln(rank) over the top-1000 token types per language, alpha = -slope.

    Plan shape: ONE (lang, token) hash aggregate (map-side combinable —
    the only corpus-proportional exchange, carrying token strings once),
    a per-lang top-1000 rank (partition = per-lang VOCABULARY, bounded
    by type count, not corpus size; at 100 TB swap in
    operators.skew.capped_topk_per_key's two-phase pre-cap), then the
    regression as one tiny aggregate — four moment sums per language,
    bytes on the wire. Determinism: counts and ranks are exact integers
    in both engines; each ln() term is an IEEE double computed from the
    same integers, and the moment sums accumulate in DECIMAL(27,12)
    (exact addition, association-free — the array_embedding_norms
    pattern), so the 6dp slope is bit-stable across engines and
    partitionings."""
    from icerunner_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    freq = (
        d.select("lang", F.explode(tokens("text")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("c"), "tok")
    top = freq.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 1000)
    lx = F.log(F.col("r").cast("double"))
    ly = F.log(F.col("c").cast("double"))
    dec = "decimal(27,12)"
    s = top.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lx.cast(dec)).alias("sx"),
        F.sum(ly.cast(dec)).alias("sy"),
        F.sum((lx * lx).cast(dec)).alias("sxx"),
        F.sum((lx * ly).cast(dec)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    return s.select(
        "lang",
        F.col("n").cast("long").alias("n_terms"),
        # n < 2 (single token type): the denominator n*sxx - sx² is 0
        # (ln(1)=0) and the slope is undefined — emit NULL on both
        # engines instead of letting Spark's NaN/Inf diverge from
        # DuckDB's division semantics on degenerate fixtures
        F.when(
            F.col("n") >= 2,
            F.round(-(n * sxy - sx * sy) / (n * sxx - sx * sx), 6),
        ).alias("zipf_alpha"),
    ).orderBy("lang")


@register(
    "psi_source_drift",
    oracle="""
    WITH b AS (
        SELECT source,
               LEAST(CAST(n_chars AS BIGINT) // 256, 15) AS bucket
        FROM documents
    ),
    sb AS (
        SELECT source, bucket, COUNT(*) AS c FROM b GROUP BY source, bucket
    ),
    srcs AS (SELECT DISTINCT source FROM documents),
    buckets AS (SELECT unnest(generate_series(0, 15)) AS bucket),
    grid AS (
        SELECT s.source, bk.bucket, COALESCE(sb.c, 0) AS c
        FROM srcs s CROSS JOIN buckets bk
        LEFT JOIN sb ON sb.source = s.source AND sb.bucket = bk.bucket
    ),
    gl AS (SELECT bucket, SUM(c) AS g FROM grid GROUP BY bucket),
    tot AS (
        SELECT source, SUM(c) AS n_src FROM grid GROUP BY source
    ),
    n_all AS (SELECT SUM(c) AS n FROM grid),
    terms AS (
        SELECT grid.source,
               ((grid.c + 1.0) / (tot.n_src + 16.0)
                - (gl.g + 1.0) / (n_all.n + 16.0))
               * ln(((grid.c + 1.0) / (tot.n_src + 16.0))
                    / ((gl.g + 1.0) / (n_all.n + 16.0))) AS term,
               tot.n_src AS n_docs
        FROM grid
        JOIN gl USING (bucket)
        JOIN tot ON tot.source = grid.source
        CROSS JOIN n_all
    )
    SELECT source, CAST(MAX(n_docs) AS BIGINT) AS n_docs,
           ROUND(SUM(CAST(term AS DECIMAL(27,12)))::DOUBLE, 6) AS psi
    FROM terms GROUP BY source ORDER BY source
    """,
)
def psi_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's document-length
    distribution against the whole corpus — the drift monitor a
    production ingest runs per batch ("did this crawl dump's length
    profile shift from the corpus it joins?"; PSI < 0.1 stable, > 0.25
    action). Buckets are INTEGER length bands (n_chars div 256, capped
    at 15) so bucketing is bit-identical on any engine — no float
    edges; +1 Laplace smoothing on integer counts makes every
    probability a ratio of exact integers, and the 16 per-source PSI
    terms sum in DECIMAL(27,12) (association-free), so the 6dp PSI is
    engine-stable. Plan shape: ONE (source, bucket) hash aggregate —
    the only corpus-proportional pass, emitting at most
    sources x 16 rows — then broadcast-sized grid joins; output is
    answer-shaped (one row per source) regardless of corpus size."""
    d = _t(spark, sf_dir, "documents")
    b = d.select(
        "source",
        F.least(
            (F.col("n_chars").cast("long") / F.lit(256)).cast("long"),
            F.lit(15),
        ).alias("bucket"),
    )
    sb = b.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("c"))
    srcs = d.select("source").distinct()
    buckets = spark.range(0, 16).select(F.col("id").alias("bucket"))
    grid = (
        srcs.crossJoin(F.broadcast(buckets))
        .join(sb, ["source", "bucket"], "left")
        .select("source", "bucket", F.coalesce("c", F.lit(0)).alias("c"))
    )
    gl = grid.groupBy("bucket").agg(F.sum("c").alias("g"))
    tot = grid.groupBy("source").agg(F.sum("c").alias("n_src"))
    n_all = grid.agg(F.sum("c").alias("n"))
    p = (F.col("c") + F.lit(1.0)) / (F.col("n_src") + F.lit(16.0))
    q = (F.col("g") + F.lit(1.0)) / (F.col("n") + F.lit(16.0))
    terms = (
        grid.join(F.broadcast(gl), "bucket")
        .join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(n_all))
        .select(
            "source",
            "n_src",
            ((p - q) * F.log(p / q)).alias("term"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("n_src").cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("term").cast("decimal(27,12)")).cast("double"), 6
            ).alias("psi"),
        )
        .orderBy("source")
    )




@register(
    "per_source_percentile_filter",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               len(regexp_extract_all(lower(text),
                   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_tokens
        FROM documents
    ),
    r AS (
        SELECT doc_id, source, n_tokens,
               PERCENT_RANK() OVER (PARTITION BY source
                                    ORDER BY n_tokens, doc_id) AS pct
        FROM t
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN pct >= 0.2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(MIN(CASE WHEN pct >= 0.2 THEN n_tokens END) AS BIGINT)
               AS min_kept_tokens
    FROM r GROUP BY source ORDER BY source
    """,
)
def per_source_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length-percentile filter: drop each source's shortest
    20% of documents by token count instead of applying one global
    length cutoff — the calibration step that stops a verbose source's
    floor from nuking a terse-but-clean source (per-source thresholds
    are how production quality filters are actually deployed).

    TWO-PHASE rank (r11, r10 verdict item 3 — no per-source window over
    raw documents): phase 1 is ONE map-side-combinable aggregate to the
    per-(source, n_tokens) COUNT HISTOGRAM — the only
    corpus-proportional exchange, and it cannot skew because its key
    cardinality is (sources x distinct lengths), not docs. Phase 2
    derives each source's cutoff from the histogram alone: with the
    rank key (n_tokens, doc_id) every rank is distinct, so
    percent_rank >= 0.2 <=> rank - 1 >= (N-1)/5 <=> the INTEGER cutoff
    r0 = (N+3) div 5 + 1 (exact arithmetic, no float boundary), giving
    n_kept = N - r0 + 1 and min_kept_tokens = the first histogram
    bucket whose running count reaches r0. The old formulation's
    Window.partitionBy(source) put a dominant source's every doc in ONE
    partition — the 100 TB skew-killer this removes; the cumulative
    window here runs over HISTOGRAM rows only. Equality vs the window
    form is pinned in tests/test_r10_queries.py including a
    90%-dominant-source fixture; the DuckDB oracle still runs the
    percent_rank window over raw docs, so the driver's value-hash
    compare is itself the cross-form pin."""
    from icerunner_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    # r12 (r11 verdict item 8): the histogram feeds TWO consumers (the
    # cumulative window and the per-source totals), each of which re-ran
    # the corpus-wide token_count scan. One eager checkpoint of the
    # histogram — bounded by (sources x distinct lengths) at ANY corpus
    # size — runs the corpus pass exactly once. A/B at sf0.1: med
    # 0.92 -> 0.78 s, min 0.72 -> 0.64, results identical; at scale it
    # halves the operator's corpus passes.
    hist = (
        d.groupBy("source", "n_tokens")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    wh = Window.partitionBy("source").orderBy("n_tokens")
    cum = hist.withColumn("cum", F.sum("c").over(wh))
    stats = hist.groupBy("source").agg(F.sum("c").cast("long").alias("n_docs"))
    # r0 = smallest rank kept; single-doc sources keep nothing
    # (percent_rank of the only row is 0 < 0.2). DIV keeps the cutoff
    # in integer arithmetic end-to-end (no double floor at huge N).
    r0 = F.expr("(n_docs + 3) DIV 5 + 1").cast("long")
    stats = stats.withColumn("r0", r0).withColumn(
        "n_kept",
        F.when(F.col("n_docs") > 1, F.col("n_docs") - F.col("r0") + 1)
        .otherwise(0)
        .cast("long"),
    )
    min_kept = (
        cum.join(F.broadcast(stats), "source")
        .where((F.col("cum") >= F.col("r0")) & (F.col("n_docs") > 1))
        .groupBy("source")
        .agg(F.min("n_tokens").cast("long").alias("min_kept_tokens"))
    )
    return (
        stats.join(min_kept, "source", "left")
        .select("source", "n_docs", "n_kept", "min_kept_tokens")
        .orderBy("source")
    )


@register(
    "decontam_eval_containment",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS t
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, GREATEST(len(t) - 7, 1) + 1),
                   i -> COALESCE(array_to_string(t[i:i+7], ' '), ''))) AS grams
        FROM toks
    ),
    eg AS (
        SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 37 = 0
    ),
    cg AS (
        SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 37 <> 0
    ),
    hit AS (
        SELECT eg.doc_id,
               COUNT(*) AS n_grams,
               SUM(CASE WHEN cg.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        FROM eg LEFT JOIN cg ON eg.gram = cg.gram
        GROUP BY eg.doc_id
    )
    SELECT doc_id AS eval_doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_hit AS BIGINT) AS n_contained,
           ROUND(n_hit * 1.0 / n_grams, 6) AS containment
    FROM hit ORDER BY eval_doc_id
    """,
)
def decontam_eval_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVAL-side contamination report: for every eval document
    (doc_id % 37 == 0, the same held-out convention as
    decontam_ngram_overlap), the fraction of its distinct word 8-grams
    that appear anywhere in the training corpus — the containment
    direction (which BENCHMARK items are compromised and must be
    dropped or reported) that complements the corpus-side flags (which
    TRAINING docs to filter). Shape: the corpus contributes ONE
    distinct over its grams (md5-free here: grams join as strings once,
    corpus-proportional, the same exchange the corpus-side decontam
    pays); the eval side is tiny and drives a left join; output is one
    row per eval doc. Integer counts + one 6dp ratio: engine-exact."""
    from icerunner_spark.functions.text import word_ngrams

    # spread before the 8-gram explode: the gram frame is consumed twice
    # (eval side + corpus distinct), and each pass re-runs the
    # tokenize+gram build, which the single-row-group fixture scan would
    # otherwise serialize on one task. A/B: 1.67 -> 1.23 s min, rows
    # identical. GATED on detected under-parallelism (r12, r11 verdict
    # item 2): the exchange carries the document TEXT, corpus-sized at
    # 100 TB — _spread_if_narrow skips it when the scan is already
    # >= cores partitions wide.
    d = _spread_if_narrow(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    grams = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams("text", 8))).alias("gram"),
    )
    eg = grams.filter(F.col("doc_id") % 37 == 0)
    cg = (
        grams.filter(F.col("doc_id") % 37 != 0)
        .select("gram")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    hit = (
        eg.join(cg, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias(
                "n_contained"
            ),
        )
    )
    return hit.select(
        F.col("doc_id").alias("eval_doc_id"),
        "n_grams",
        "n_contained",
        F.round(F.col("n_contained") / F.col("n_grams"), 6).alias(
            "containment"
        ),
    ).orderBy("eval_doc_id")


@register(
    "embedding_outlier_zscore",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    dim AS (
        SELECT i.i AS pos, SUM(CAST(v[CAST(i.i AS INT)] AS DECIMAL(27,12))) AS s,
               COUNT(*) AS n
        FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) i
        GROUP BY i.i
    ),
    cent AS (SELECT pos, CAST(s AS DOUBLE) / n AS c FROM dim),
    dist AS (
        SELECT e.vec_id,
               sqrt(CAST(SUM(CAST(
                   (v[CAST(pos AS INT)] - c) * (v[CAST(pos AS INT)] - c)
                   AS DECIMAL(27,12))) AS DOUBLE)) AS d
        FROM e, cent
        GROUP BY e.vec_id
    ),
    mom AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(d AS DECIMAL(27,12))) AS DOUBLE) AS sd,
               CAST(SUM(CAST(d * d AS DECIMAL(27,12))) AS DOUBLE) AS sd2
        FROM dist
    )
    SELECT vec_id,
           ROUND((d - sd / n) / sqrt(sd2 / n - (sd / n) * (sd / n)), 6)
               AS dist_z
    FROM dist, mom
    ORDER BY dist_z DESC, vec_id
    LIMIT 20
    """,
)
def embedding_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection: z-score of each vector's
    distance to the corpus centroid, top-20 — the curation sweep that
    surfaces mis-embedded/garbage vectors before they poison ANN
    training or clustering. Two aggregate passes, both map-side
    combinable and association-free: (1) the centroid as 64 per-dim
    DECIMAL(27,12) sums (posexplode -> groupBy(pos), exact addition —
    dims x 16 bytes on the wire regardless of corpus size); (2) the
    distance moments (sum, sum of squares) again in decimal. Per-row
    distance folds the 64 dims LEFT-TO-RIGHT in both engines (the
    array_embedding_norms precedent), so every double matches
    bit-for-bit before the 6dp round."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dec = "decimal(27,12)"
    cent = (
        e.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum(F.col("x").cast(dec)).alias("s"), F.count(F.lit(1)).alias("n"))
        .select("pos", (F.col("s").cast("double") / F.col("n")).alias("c"))
    )
    # distance² as an EXACT decimal sum per vector: explode the dims,
    # broadcast-join the 64-row centroid, cast each squared term to
    # decimal and hash-aggregate — both engines then sum the identical
    # decimals with the identical result type (a zip_with double fold
    # would expose Spark's decimal-precision wander vs DuckDB's
    # DECIMAL(38,12) SUM at the 12th decimal)
    terms = (
        e.select("vec_id", F.posexplode("v").alias("pos", "x"))
        .join(F.broadcast(cent), "pos")
        .select(
            "vec_id",
            ((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
            .cast(dec)
            .alias("t2"),
        )
    )
    dist = terms.groupBy("vec_id").agg(
        F.sqrt(F.sum("t2").cast("double")).alias("d")
    )
    mom = F.broadcast(
        dist.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("d").cast(dec)).cast("double").alias("sd"),
            F.sum((F.col("d") * F.col("d")).cast(dec))
            .cast("double")
            .alias("sd2"),
        )
    )
    mu = F.col("sd") / F.col("n")
    sig = F.sqrt(F.col("sd2") / F.col("n") - mu * mu)
    return (
        dist.crossJoin(mom)
        .select("vec_id", F.round((F.col("d") - mu) / sig, 6).alias("dist_z"))
        .orderBy(F.desc("dist_z"), "vec_id")
        .limit(20)
    )


@register(
    "stream_dedup_watermark",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_value
    FROM events GROUP BY event_type
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under a watermark
    (streaming.pipeline.dedup_stream — ``dropDuplicatesWithinWatermark``
    on event_id, the only dedup whose state stays FINITE on an unbounded
    stream: rows older than the watermark horizon are evicted from state
    instead of accumulating forever). The fixture is deliberately doubled
    (two hard links of events.parquet drained one file per micro-batch),
    so the second copy arrives as a separate batch of exact replays; the
    deduped aggregate must equal the single-copy oracle EXACTLY —
    at-least-once passthrough would double every count. This is the
    idempotent-ingest front door for CDC/event feeds at 100 TB scale:
    state is keyed on event_id only (no payload held), sized by the
    watermark window, not the stream length."""
    from icerunner_spark.streaming.pipeline import (
        dedup_stream,
        read_events_stream,
        run_available_now,
        stream_state_partitions,
    )

    wh = _demo_warehouse("icerunner_stream_dedup", sf_dir)
    src = os.path.join(wh, "_src")
    os.makedirs(src, exist_ok=True)
    events_file = os.path.join(sf_dir, "events.parquet")
    for copy in ("events-0.parquet", "events-1.parquet"):
        dst = os.path.join(src, copy)
        try:
            os.link(events_file, dst)
        except OSError:
            shutil.copy(events_file, dst)
    out_dir = os.path.join(wh, "deduped")
    stream = dedup_stream(
        read_events_stream(spark, src, max_files_per_trigger=1),
        # the replay copy carries identical (old) timestamps, so the
        # horizon must span the fixture's full time range for the state
        # lookup to see batch-1's ids when batch 2 drains
        watermark="750 hours",
    )
    # state-store instances sized to the STATE (~100k event ids), not the
    # session's 32-wide batch shuffle width: every instance pays a task +
    # a per-micro-batch state-commit fsync whether or not it holds keys
    # (r11 optimization round; rule + production sizing in
    # streaming.pipeline.stream_state_partitions)
    run_available_now(
        stream,
        out_dir,
        checkpoint_dir=os.path.join(wh, "_ckpt"),
        state_partitions=stream_state_partitions(),
    )
    return (
        spark.read.parquet(out_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _money_sum(_dec("value")).alias("total_value"),
        )
    )


@register(
    "ridge_quality_fit",
    oracle="""
    WITH s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x1) AS DOUBLE) AS s1,
               CAST(SUM(x2) AS DOUBLE) AS s2,
               CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
               CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
               CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x1 * y) AS DOUBLE) AS s1y,
               CAST(SUM(x2 * y) AS DOUBLE) AS s2y
        FROM (
            SELECT CAST(len(regexp_extract_all(lower(text),
                       '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS x1,
                   n_chars AS x2,
                   CAST(lang = 'en' AS BIGINT) AS y
            FROM documents
        )
    ),
    m AS (
        SELECT n, sy,
               n + 1.0 AS a, s1 AS b, s2 AS c,
               s11 + 1.0 AS e, s12 AS f, s22 + 1.0 AS i,
               s1y, s2y
        FROM s
    ),
    d AS (
        SELECT n, sy, a, b, c, e, f, i, s1y, s2y,
               a * (e * i - f * f) - b * (b * i - f * c)
                   + c * (b * f - e * c) AS det
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           ROUND((sy * (e * i - f * f) - b * (s1y * i - f * s2y)
                  + c * (s1y * f - e * s2y)) / det, 6) AS beta_intercept,
           ROUND((a * (s1y * i - f * s2y) - sy * (b * i - f * c)
                  + c * (b * s2y - s1y * c)) / det, 6) AS beta_tokens,
           ROUND((a * (e * s2y - s1y * f) - b * (b * s2y - s1y * c)
                  + sy * (b * f - e * c)) / det, 6) AS beta_chars
    FROM d
    """,
)
def ridge_quality_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed closed-form ridge regression (a linear quality probe:
    predict the is-English label from token count and char count,
    lambda=1 on every diagonal entry including the intercept —
    documented, symmetric with the oracle). The whole fit is ONE
    map-side-combinable aggregate pass producing the 3x3 normal-equation
    sums (k^2+k scalars — bytes on the wire regardless of corpus size),
    then the solve is Cramer's rule expressed as column arithmetic over
    that single row: no collect(), no driver-side linear algebra, no
    iteration. Determinism: features and labels are exact integers, so
    the sums are exact long totals in both engines; the double-precision
    Cramer tree is written with the IDENTICAL association order in the
    oracle, so results are bit-stable before the 6dp round. At 100 TB the
    long sums would widen to decimal(38,0) — the plan shape (one partial
    agg, one exchange of 9 scalars) is unchanged."""
    from icerunner_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents").select(
        token_count("text").cast("long").alias("x1"),
        F.col("n_chars").alias("x2"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    s = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
    )
    m = s.select(
        "n",
        "sy",
        (F.col("n") + F.lit(1.0)).alias("a"),
        F.col("s1").alias("b"),
        F.col("s2").alias("c"),
        (F.col("s11") + F.lit(1.0)).alias("e"),
        F.col("s12").alias("f"),
        (F.col("s22") + F.lit(1.0)).alias("i"),
        "s1y",
        "s2y",
    )
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    e, f, i = F.col("e"), F.col("f"), F.col("i")
    sy, s1y, s2y = F.col("sy"), F.col("s1y"), F.col("s2y")
    det = (a * (e * i - f * f) - b * (b * i - f * c) + c * (b * f - e * c))
    return m.select(
        F.col("n").cast("long").alias("n_docs"),
        F.round(
            (sy * (e * i - f * f) - b * (s1y * i - f * s2y)
             + c * (s1y * f - e * s2y)) / det, 6
        ).alias("beta_intercept"),
        F.round(
            (a * (s1y * i - f * s2y) - sy * (b * i - f * c)
             + c * (b * s2y - s1y * c)) / det, 6
        ).alias("beta_tokens"),
        F.round(
            (a * (e * s2y - s1y * f) - b * (b * s2y - s1y * c)
             + sy * (b * f - e * c)) / det, 6
        ).alias("beta_chars"),
    )


@register(
    "ewma_anomaly_events",
    # The trailing-K EWMA is a finite weighted mean, so both engines can
    # compute it in closed form — no recursion, no unbounded pow() that
    # overflows on long partitions. The oracle replays the identical
    # 50-row window as a bounded self-join on row_number; z-scores use
    # the same 49-preceding-to-1-preceding frame. Floats: weighted sums
    # of <=50 terms agree to ~1e-13 across engines, rounded at 6dp; the
    # spike flag compares the ROUNDED z so the boolean can't straddle an
    # engine-noise boundary.
    oracle="""
    WITH seq AS (
        SELECT event_id, user_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    ew AS (
        SELECT r.event_id, r.user_id, r.value, r.rn,
               SUM(s.value * POWER(0.9, r.rn - s.rn)) AS num,
               SUM(POWER(0.9, r.rn - s.rn)) AS den
        FROM seq r
        JOIN seq s
          ON s.user_id = r.user_id AND s.rn BETWEEN r.rn - 49 AND r.rn
        GROUP BY 1, 2, 3, 4
    ),
    st AS (
        SELECT event_id,
               AVG(value) OVER w AS mean_prev,
               STDDEV_SAMP(value) OVER w AS sd_prev
        FROM seq
        WINDOW w AS (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 49 PRECEDING AND 1 PRECEDING)
    )
    SELECT e.event_id, e.user_id,
           ROUND(e.num / e.den, 6) AS ewma,
           ROUND((e.value - st.mean_prev) / NULLIF(st.sd_prev, 0), 6) AS zdev,
           COALESCE(ROUND((e.value - st.mean_prev) / NULLIF(st.sd_prev, 0), 6) > 3.0,
                    FALSE) AS is_spike
    FROM ew e JOIN st USING (event_id)
    """,
)
def ewma_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series smoothing + anomaly flags per user: trailing-50-event
    exponentially weighted moving average (decay 0.9/step, normalized
    weights) and a z-score of each value against its trailing window's
    mean/stddev (excluding the current row), spike = z > 3.

    Spark shape: ONE shuffle on user_id serves all three window
    computations (collect_list / avg / stddev share the sort); the EWMA
    is a zip_with + aggregate fold over the <=50-element trailing array
    — pure Catalyst higher-order functions, no UDF, and per-row state is
    bounded by K=50 regardless of partition length, so a user with a
    billion events costs O(K) memory per row, not O(history). At 100 TB
    the partition key (user_id) scales with data; no global sort."""
    e = _t(spark, sf_dir, "events")
    w_arr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-49, 0)
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-49, -1)
    )
    decay = F.lit(0.9)
    arr = F.collect_list("value").over(w_arr)
    base = e.select(
        "event_id",
        "user_id",
        "value",
        arr.alias("trail"),
        F.avg("value").over(w_prev).alias("mean_prev"),
        F.stddev_samp("value").over(w_prev).alias("sd_prev"),
    )
    # weight for trail[i] is decay^(len-1-i): newest term weight 1
    wts = F.transform(
        "trail", lambda x, i: F.pow(decay, F.size("trail") - 1 - i)
    )
    num = F.aggregate(
        F.zip_with("trail", wts, lambda x, wt: x * wt),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(wts, F.lit(0.0), lambda acc, x: acc + x)
    # Spark's stddev_samp over a 1-row frame is NaN where DuckDB (and
    # ANSI) give NULL — normalize before dividing
    sd_clean = F.when(
        F.col("sd_prev").isNull()
        | F.isnan("sd_prev")
        | (F.col("sd_prev") == 0.0),
        F.lit(None).cast("double"),
    ).otherwise(F.col("sd_prev"))
    zdev = F.round((F.col("value") - F.col("mean_prev")) / sd_clean, 6)
    return base.select(
        "event_id",
        "user_id",
        F.round(num / den, 6).alias("ewma"),
        zdev.alias("zdev"),
        F.coalesce(zdev > F.lit(3.0), F.lit(False)).alias("is_spike"),
    )


@register(
    "iceberg_changes_import",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(CAST(o_totalprice AS DOUBLE), 2) AS totalprice
    FROM orders
    WHERE o_orderkey >= 10000 AND o_orderkey < 20000
    """,
)
def iceberg_changes_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Import-side CDC (read_iceberg_changes — Iceberg's incremental
    append scan, Spark's start/end-snapshot-id options, re-expressed
    for foreign static tables): export, append, re-export, then read
    ONLY the delta between the two exported snapshots. This is what
    makes a pull mirror of a foreign Iceberg table incremental — each
    sync plans O(delta files) by pruning manifests on added_snapshot_id
    and entries on ADDED status, never rescanning the table. The oracle
    recomputes the appended slice from the raw fixture."""
    from icerunner_spark.iceberg_export import (
        _load_metadata,
        export_iceberg,
        read_iceberg_changes,
    )
    from icerunner_spark.table import IceTable

    wh = _demo_warehouse("icerunner_iceberg_changes_demo", sf_dir)
    t = IceTable(spark, os.path.join(wh, "orders_src"))
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    t.create(o.filter(F.col("o_orderkey") < 10000).coalesce(1))
    dest = os.path.join(wh, "orders_ice")
    export_iceberg(t, dest)
    t.append(
        o.filter(
            (F.col("o_orderkey") >= 10000) & (F.col("o_orderkey") < 20000)
        ).coalesce(1)
    )
    export_iceberg(t, dest)
    meta = _load_metadata(dest)
    first = min(
        meta["snapshots"], key=lambda s: s.get("sequence-number", 0)
    )["snapshot-id"]
    out = read_iceberg_changes(spark, dest, start_snapshot_id=first)
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("totalprice"),
    )


@register(
    "frequent_tokens_documents",
    # exact two-pass heavy hitters: pass 1 is a zero-shuffle candidate
    # superset (averaging argument), pass 2 recomputes exact counts for
    # candidates only — so the ONE-PASS exact SQL is the oracle verbatim
    oracle="""
    WITH tok AS (
        SELECT unnest(regexp_extract_all(lower(text),
                      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS item
        FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM tok)
    SELECT item, COUNT(*) AS cnt,
           ROUND(COUNT(*) * 1.0 / (SELECT n FROM tot), 6) AS frac
    FROM tok GROUP BY item
    HAVING COUNT(*) * 1.0 >= 0.02 * (SELECT n FROM tot)
    """,
)
def frequent_tokens_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent items (operators.frequent.frequent_items): tokens
    holding >= 2% of the corpus's token mass. The shuffle is bounded by
    the ANSWER (candidates from a zero-shuffle Arrow mapInPandas pass,
    at most partitions/threshold keys), not the domain — the formulation
    that still works when the key domain is billions of mostly-singleton
    tokens/URLs/entities. Result is exact and partitioning-independent
    (pinned in tests/test_operators.py)."""
    from icerunner_spark.functions.text import tokens
    from icerunner_spark.operators.frequent import frequent_items

    spread = spark.sparkContext.defaultParallelism
    d = _t(spark, sf_dir, "documents").repartition(spread, "doc_id")
    tok = d.select(F.explode(tokens("text")).alias("item"))
    return frequent_items(tok, "item", threshold=0.02)


@register(
    "temperature_sampled_mixture",
    # every step after round(pow(mass, 0.5) * 1e6) is 64-bit integer
    # arithmetic, so the oracle replays the budget math exactly
    oracle=f"""
    WITH base AS (
        SELECT lang, doc_id,
               CAST(len(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) AS BIGINT) AS n_tok
        FROM documents
    ),
    masses AS (
        SELECT lang, CAST(ROUND(POW(SUM(n_tok) * 1.0, 0.5) * 1e6) AS BIGINT) AS m
        FROM base GROUP BY lang
    ),
    budgets AS (
        SELECT lang, CAST(20000 * m // (SELECT SUM(m) FROM masses) AS BIGINT) AS budget
        FROM masses
    ),
    ranked AS (
        SELECT b.lang, b.doc_id, b.n_tok, g.budget,
               CAST(SUM(b.n_tok) OVER (
                   PARTITION BY b.lang
                   ORDER BY md5(CAST(b.doc_id AS VARCHAR) || 'temp'), b.doc_id
               ) AS BIGINT) AS cum_tokens
        FROM base b JOIN budgets g USING (lang)
    )
    SELECT lang, doc_id, n_tok, budget, cum_tokens
    FROM ranked WHERE cum_tokens <= budget
    """,
)
def temperature_sampled_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing (operators.corpus.
    temperature_mixture): each language's share of a 20k-token budget is
    proportional to sqrt(its token mass) — alpha=0.5 upweights the tail
    languages the way multilingual-LM samplers do — and documents fill
    each share in deterministic md5 order. The budget arithmetic is
    integer-exact after one rounded pow() per source, so the selected
    set is bit-identical across engines and partitionings. One agg over
    at most max_sources keys, a broadcast of the tiny budget frame, one
    window per source; the corpus shuffles once."""
    from icerunner_spark.functions.text import token_count
    from icerunner_spark.operators.corpus import temperature_mixture

    d = _t(spark, sf_dir, "documents").select(
        "lang", "doc_id", token_count("text").cast("long").alias("n_tok")
    )
    out = temperature_mixture(
        d, "lang", "n_tok", "doc_id", total_budget=20000, alpha=0.5
    )
    return out.select("lang", "doc_id", "n_tok", "budget", "cum_tokens")


@register(
    "url_canonical_dedup",
    # the oracle replays the canonicalization RULES (regex + list ops),
    # not the Spark code — an independent second implementation of the
    # same published contract (functions/url.py module doc)
    oracle="""
    WITH raw AS (
        SELECT o_orderkey AS k,
               CASE o_orderkey % 5
                 WHEN 0 THEN 'HTTP://Example.COM:80/products/' || (o_orderkey // 7) || '?utm_source=news&b=2&a=1#frag'
                 WHEN 1 THEN 'http://example.com/products/' || (o_orderkey // 7) || '?b=2&a=1'
                 WHEN 2 THEN 'https://WWW.Shop.example.ORG:443/item/' || (o_orderkey // 3) || '/'
                 WHEN 3 THEN 'https://shop.example.org/item/' || (o_orderkey // 3)
                 ELSE 'http://blog.example.net/post?gclid=x&id=' || (o_orderkey // 11)
               END AS url
        FROM orders
    ),
    parts AS (
        SELECT k,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               regexp_replace(regexp_replace(url, '#.*$', ''),
                              '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
        FROM raw
    ),
    fields AS (
        SELECT k, scheme,
               regexp_replace(lower(regexp_extract(regexp_extract(rest, '^([^/?]*)', 1), '^([^:]*)', 1)), '^www\\.', '') AS host,
               regexp_extract(regexp_extract(rest, '^([^/?]*)', 1), ':(\\d+)$', 1) AS port,
               regexp_extract(regexp_replace(rest, '^[^/?]*', ''), '^([^?]*)', 1) AS path0,
               regexp_extract(regexp_replace(rest, '^[^/?]*', ''), '\\?(.*)$', 1) AS query
        FROM parts
    ),
    canon AS (
        SELECT k,
               scheme || '://' || host ||
               CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                         OR (scheme = 'https' AND port = '443')
                    THEN '' ELSE ':' || port END ||
               CASE WHEN path0 = '' THEN '/'
                    ELSE regexp_replace(path0, '(.)/$', '\\1') END ||
               CASE WHEN len(list_filter(string_split(query, '&'),
                        p -> p <> '' AND NOT regexp_matches(p, '^(utm_[a-z]+|fbclid|gclid|msclkid|ref)='))) > 0
                    THEN '?' || array_to_string(list_sort(list_filter(string_split(query, '&'),
                        p -> p <> '' AND NOT regexp_matches(p, '^(utm_[a-z]+|fbclid|gclid|msclkid|ref)='))), '&')
                    ELSE '' END AS canonical_url
        FROM fields
    )
    SELECT canonical_url, COUNT(*) AS n_dups, MIN(k) AS first_key
    FROM canon GROUP BY canonical_url
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup, the first stage of every web-corpus pipeline
    (functions.url.canonicalize_url): five deterministic URL spellings
    are synthesized per order key (case noise, default ports, tracking
    params, unsorted query strings, trailing slashes, fragments — the
    multimodal queries' synthesize-then-process pattern), canonicalized
    by a single whole-stage-codegen expression tree (regex + sorted
    query params; zero Python, zero extra shuffle), and deduped by one
    hash aggregation on the canonical form. At 100 TB this is scan
    speed + one agg whose key is the canonical URL — the cheapest dedup
    signal there is."""
    from icerunner_spark.functions.url import canonicalize_url

    k = F.col("o_orderkey")
    url = (
        F.when(
            k % 5 == 0,
            F.concat(
                F.lit("HTTP://Example.COM:80/products/"),
                F.expr("o_orderkey div 7"),
                F.lit("?utm_source=news&b=2&a=1#frag"),
            ),
        )
        .when(
            k % 5 == 1,
            F.concat(
                F.lit("http://example.com/products/"),
                F.expr("o_orderkey div 7"),
                F.lit("?b=2&a=1"),
            ),
        )
        .when(
            k % 5 == 2,
            F.concat(
                F.lit("https://WWW.Shop.example.ORG:443/item/"),
                F.expr("o_orderkey div 3"),
                F.lit("/"),
            ),
        )
        .when(
            k % 5 == 3,
            F.concat(
                F.lit("https://shop.example.org/item/"),
                F.expr("o_orderkey div 3"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://blog.example.net/post?gclid=x&id="),
                F.expr("o_orderkey div 11"),
            )
        )
    )
    # spread the regex-heavy canonicalization before it runs: the fixture
    # scans as ONE task (single-row-group parquet — splits cannot cross a
    # row group, so split-size confs cannot parallelize it) and the
    # canonical expression tree is scan-disproportionate. The exchanged
    # column is the 8-byte key only — cheap even at scale — but the
    # spread is still GATED on detected under-parallelism (r12): a scan
    # that already has >= cores partitions gains nothing from an extra
    # exchange. Keyed, not round-robin: a keyless repartition pays
    # sortBeforeRepartition (guide §2.5). In-process A/B:
    # 2.27 -> 1.11 s min, 2.81 -> 1.52 s med, rows identical.
    o = _spread_if_narrow(
        _t(spark, sf_dir, "orders").select("o_orderkey"), "o_orderkey"
    ).select(k.alias("k"), canonicalize_url(url).alias("canonical_url"))
    return o.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_dups"), F.min("k").alias("first_key")
    )


@register(
    "image_dhash_neardup",
    # seeded gradient blobs (the multimodal_decode_stats generator:
    # pixel v = (doc_id*7+3y+x)%256, 25x16, BMP/PPM/PGM by doc_id%3) are
    # REALLY encoded and decoded; the oracle replays the dHash contract
    # bit-for-bit from the generator arithmetic — resample grid
    # ys=(y*16)//8, xs=(x*25)//9, bit = luma(y,x+1) > luma(y,x), then
    # pairwise hamming over the 64 bit positions
    oracle="""
    WITH grid AS (
        SELECT d.doc_id, y.y, x.x,
               (d.doc_id * 7 + 3 * ((y.y * 16) // 8)
                + ((x.x * 25) // 9)) % 256 AS v
        FROM documents d, range(0, 8) AS y(y), range(0, 9) AS x(x)
        WHERE d.doc_id < 60
    ),
    lum AS (
        SELECT doc_id, y, x,
               CASE WHEN doc_id % 3 = 1
                    THEN (299 * v + 587 * ((v + 40) % 256)
                          + 114 * ((v + 80) % 256)) // 1000
                    ELSE v END AS luma
        FROM grid
    ),
    bits AS (
        SELECT a.doc_id, a.y, a.x,
               CASE WHEN b.luma > a.luma THEN 1 ELSE 0 END AS bit
        FROM lum a JOIN lum b
          ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
        WHERE a.x < 8
    ),
    dist AS (
        SELECT p.doc_id AS id1, q.doc_id AS id2,
               SUM(CASE WHEN p.bit <> q.bit THEN 1 ELSE 0 END) AS d
        FROM bits p JOIN bits q
          ON p.y = q.y AND p.x = q.x AND p.doc_id < q.doc_id
        GROUP BY 1, 2
    )
    SELECT id1, id2, CAST(d AS INT) AS distance
    FROM dist WHERE d <= 7
    """,
)
def image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup end-to-end: encode 60 seeded gradient
    images (BMP / binary PPM / PGM — real bytes), dHash them
    (operators.multimodal.dhash_images: decode -> 9x8 nearest-neighbor
    luma grid -> 64 difference bits, one narrow mapInPandas stage), then
    pair near-duplicates with the banded pigeonhole join shared with
    simhash text dedup (operators.dedup.hamming_neardup_pairs, 8x8-bit
    chunks, never all-pairs). Only 16-byte (id, sig) rows ever shuffle —
    image bytes stay in the scan stage, which is what makes this the
    image-dedup plan that survives 100 TB of blobs."""
    from icerunner_spark.operators.dedup import hamming_neardup_pairs
    from icerunner_spark.operators.multimodal import as_assets, dhash_images

    def encode_batches(it):
        import numpy as np
        import pandas as pd

        from icerunner_spark.operators.codecs import (
            encode_gray_bmp,
            encode_pgm,
            encode_ppm,
        )

        for pdf in it:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                y, x = np.mgrid[0:16, 0:25]
                v = ((d * 7 + 3 * y + x) % 256).astype(np.uint8)
                if d % 3 == 0:
                    blobs.append(encode_gray_bmp(v))
                elif d % 3 == 1:
                    rgb = np.stack(
                        [v, (v.astype(np.int64) + 40) % 256,
                         (v.astype(np.int64) + 80) % 256],
                        axis=2,
                    ).astype(np.uint8)
                    blobs.append(encode_ppm(rgb))
                else:
                    blobs.append(encode_pgm(v))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    d = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 60
    )
    blobs = d.mapInPandas(encode_batches, schema="doc_id long, blob binary")
    assets = as_assets(blobs, "doc_id", "blob", kind="image",
                       content_type="image/x-seeded")
    sigs = dhash_images(assets)
    pairs = hamming_neardup_pairs(sigs, max_distance=7, chunk_bits=8)
    return pairs.select(
        "id1", "id2", F.col("distance").cast("int").alias("distance")
    )


@register(
    "audio_fingerprint_neardup",
    # seeded int16 PCM: sample s(d,t) = (((d%30)*131 + t*(t+7)) % 4096)
    # - 2048, plus a +977 tail perturbation (t >= 3840) for d >= 30 —
    # so docs d and d+30 share 60 of 65 frames and land within hamming
    # 5. Frame energies are integers, so the oracle replays the
    # fingerprint contract exactly: bit f = energy(f+1) > energy(f)
    # over 64-sample frames, pairwise hamming <= 7.
    oracle="""
    WITH samp AS (
        SELECT d.doc_id, t.t,
               (((d.doc_id % 30) * 131 + t.t * (t.t + 7)) % 4096) - 2048
               + CASE WHEN d.doc_id >= 30 AND t.t >= 3840
                      THEN 977 ELSE 0 END AS s
        FROM documents d, range(0, 4160) AS t(t)
        WHERE d.doc_id < 60
    ),
    en AS (
        SELECT doc_id, t // 64 AS f, SUM(s * s) AS e
        FROM samp GROUP BY 1, 2
    ),
    bits AS (
        SELECT a.doc_id, a.f AS p,
               CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
        FROM en a JOIN en b ON b.doc_id = a.doc_id AND b.f = a.f + 1
        WHERE a.f < 64
    ),
    dist AS (
        SELECT p.doc_id AS id1, q.doc_id AS id2,
               SUM(CASE WHEN p.bit <> q.bit THEN 1 ELSE 0 END) AS d
        FROM bits p JOIN bits q
          ON p.p = q.p AND p.doc_id < q.doc_id
        GROUP BY 1, 2
    )
    SELECT id1, id2, CAST(d AS INT) AS distance
    FROM dist WHERE d <= 7
    """,
)
def audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio dedup end-to-end: encode 60 seeded int16 PCM clips as real
    RIFF/WAVE blobs (30 base signals; clips 30..59 repeat a base with a
    perturbed tail — the re-encoded/re-trimmed duplicate case), derive
    64-bit energy-delta fingerprints (operators.multimodal.
    audio_fingerprints: real WAV decode + frame energies, one narrow
    mapInPandas), and pair near-duplicates with the banded hamming join
    shared with simhash/dHash (never all-pairs). Only 16-byte (id, sig)
    rows shuffle; audio bytes stay in the scan stage."""
    from icerunner_spark.operators.dedup import hamming_neardup_pairs
    from icerunner_spark.operators.multimodal import (
        as_assets,
        audio_fingerprints,
    )

    def encode_batches(it):
        import numpy as np
        import pandas as pd

        from icerunner_spark.operators.codecs import encode_wav

        t = np.arange(4160, dtype=np.int64)
        for pdf in it:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                s = (((d % 30) * 131 + t * (t + 7)) % 4096) - 2048
                if d >= 30:
                    s = s + np.where(t >= 3840, 977, 0)
                blobs.append(encode_wav(s.astype(np.int16), 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    d = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 60
    )
    blobs = d.mapInPandas(encode_batches, schema="doc_id long, blob binary")
    assets = as_assets(blobs, "doc_id", "blob", kind="audio",
                       content_type="audio/wav")
    sigs = audio_fingerprints(assets)
    pairs = hamming_neardup_pairs(sigs, max_distance=7, chunk_bits=8)
    return pairs.select(
        "id1", "id2", F.col("distance").cast("int").alias("distance")
    )


@register(
    "zorder_compact_scan",
    oracle="""
    WITH cuts AS (
        SELECT MAX(l_orderkey) // 4 AS cut_k, MAX(l_partkey) // 4 AS cut_p
        FROM lineitem
    )
    SELECT l_returnflag, COUNT(*) AS n_rows,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 2)
                AS DOUBLE) AS sum_price
    FROM lineitem, cuts
    WHERE l_orderkey <= cut_k AND l_partkey <= cut_p
    GROUP BY l_returnflag
    """,
)
def zorder_compact_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order compaction as a MULTI-dimensional index build
    (table.compact(zorder=[...]) — Iceberg's z-order rewrite strategy):
    lineitem lands hash-scattered (no file-stats pruning on anything),
    then one Morton-curve rewrite clusters on interleaved bit codes of
    (l_orderkey, l_partkey) — after which a selective predicate on
    EITHER column prunes files at planning time, which a single-key sort
    cannot give the second column. Inline assertions pin all three
    layout facts (no pruning before; pruning after on each dimension
    independently); the oracle — a plain 2-D filtered aggregate over the
    raw parquet — pins that the rewrite changed the LAYOUT, never the
    rows. At 100 TB this is the background pass that makes multi-tenant
    point-lookup-ish scans affordable on a fact table queried along two
    axes."""
    from icerunner_spark.connector import Connector

    wh = _demo_warehouse("icerunner_zorder_demo", sf_dir)
    c = Connector(spark, wh)
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_returnflag", "l_extendedprice"
    )
    cuts = li.agg(
        F.max("l_orderkey").alias("mk"), F.max("l_partkey").alias("mp")
    ).first()
    cut_k, cut_p = cuts["mk"] // 4, cuts["mp"] // 4
    t = c.catalog.table("lineitem_zordered")
    # hash repartition deliberately scatters both key ranges across all
    # files of both commits
    t.create(li.filter(F.col("l_orderkey") % 2 == 0).repartition(4))
    t.append(li.filter(F.col("l_orderkey") % 2 == 1).repartition(4))
    pre_k = t.plan_files([("l_orderkey", "<=", cut_k)])
    pre_p = t.plan_files([("l_partkey", "<=", cut_p)])
    total = len(t.current_snapshot().manifest)
    assert len(pre_k) == total and len(pre_p) == total, (
        "expected NO pruning before z-order clustering"
    )
    n_rows = t.scan().count()
    t.compact(
        target_file_rows=max(1000, n_rows // 16),
        zorder=["l_orderkey", "l_partkey"],
    )
    total = len(t.current_snapshot().manifest)
    post_k = t.plan_files([("l_orderkey", "<=", cut_k)])
    post_p = t.plan_files([("l_partkey", "<=", cut_p)])
    assert len(post_k) < total, "z-order gave no pruning on dim 1"
    assert len(post_p) < total, "z-order gave no pruning on dim 2"
    return (
        t.scan(
            where=[("l_orderkey", "<=", cut_k), ("l_partkey", "<=", cut_p)]
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(_dec("l_extendedprice", 14)).cast("double"), 2
            ).alias("sum_price"),
        )
    )


@register(
    "iceberg_eq_delete_export",
    # survivors = rows whose key was never equality-deleted, plus the
    # re-inserted keys (data sequence > delete sequence: the spec's
    # strictly-less rule keeps them) — recomputable from the raw fixture
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_custkey AS c,
               ROUND(CAST(o_totalprice AS DOUBLE), 2) AS p
        FROM orders WHERE o_orderkey < 5000
    )
    SELECT k, c, p FROM base WHERE k % 10 <> 3
    UNION ALL
    SELECT k, CAST(-1 AS BIGINT) AS c, p FROM base WHERE k % 100 = 13
    """,
)
def iceberg_eq_delete_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality deletes through the EXPORT direction (r9 — the refusal
    removed): key-addressed deletes land as native eq-delete files
    (O(keys) commit, no table read), a slice of the keys is re-inserted
    AFTER the delete, then the whole table exports to Iceberg v2 —
    content=2 delete manifests with equality_ids, key parquets rewritten
    to logical names + stamped field ids — and `read_iceberg` applies
    the spec's strictly-less sequence rule distributively. The oracle
    recomputes the survivor set (never-deleted ∪ re-inserted) from the
    raw fixture, so a wrong sequence comparison on either side flips the
    hash."""
    from icerunner_spark.iceberg_export import export_iceberg, read_iceberg
    from icerunner_spark.table import IceTable

    wh = _demo_warehouse("icerunner_eq_export_demo", sf_dir)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("c"),
        F.round(F.col("o_totalprice").cast("double"), 2).alias("p"),
    )
    t = IceTable(spark, os.path.join(wh, "orders_eq"))
    t.create(o.coalesce(1))
    t.delete_rows(
        o.filter(F.col("k") % 10 == 3).select("k"), ["k"], mode="equality"
    )
    t.append(
        o.filter(F.col("k") % 100 == 13)
        .withColumn("c", F.lit(-1).cast("long"))
        .coalesce(1)
    )
    dest = os.path.join(wh, "orders_ice")
    export_iceberg(t, dest)
    return read_iceberg(spark, dest).select("k", "c", "p")


# --------------------------------------------------------------------------- #
# Registration order IS the driver's correctness window
# --------------------------------------------------------------------------- #
# The driver value-hash-checks exactly the FIRST 50 registered queries
# (CORRECTNESS_r{1,2,3}.json keys == names[:50], verified every round). 100+
# of the registered queries carry a deterministic DuckDB oracle, so ordering
# chooses which 50 get value-checked. _WINDOW_ORDER makes that choice
# explicit (round-4 verdict item 5 rotated 10 long-stable near-isomorphic
# join/agg shapes out so tail queries earn driver-grade proof; the rotated-
# out ten stay value-checked locally by tests/driver_emulation.py every
# run). Everything not listed in _WINDOW_ORDER or _TAIL_ORDER keeps its
# registration order between the two; the approximate-by-design queries go
# last — their driver row could only ever be a rows-only "no_oracle" check
# (their correctness is pinned in pytest against exact baselines instead).
_WINDOW_ORDER = [
    "q1_pricing_summary",
    "q6_revenue_forecast",
    "distinct_agg_lineitem",
    "q7_nation_volume",
    "q17_small_quantity_revenue",   # r4 rotation: TPC-H correlated-scalar shape
    "q21_last_shipper",             # r4 rotation: EXISTS/NOT-EXISTS multi-join
    "theta_join_acctbal_dominance",
    "window_topk_orders_per_customer",
    "window_running_revenue",
    "grouping_sets_orders",
    "setops_multiset_quantities",   # r4 rotation: INTERSECT/EXCEPT ALL bags
    "lateral_topk_per_nation",      # r4 rotation: LATERAL per-group top-k
    "scalar_string_math_part",
    "json_events_extract",
    "unigram_logprob_quality",       # r4 new: corpus-trained LM quality score
    "asof_join_events_to_orders",
    "cdc_changes_since_snapshot",
    "time_travel_snapshot_scan",
    "flight_roundtrip_nation",
    "snapshot_history_metadata",
    "dedup_exact_documents",
    "partitioned_table_prune",       # r4 new: partition-spec pruned scan
    "neardup_ngram_jaccard",
    "dedup_minhash_lsh",
    "embedding_cosine_neardup",
    "lang_id_documents",
    "text_token_stats",
    "multimodal_byte_features",
    "snapshot_mor_delete_roundtrip", # r4 new: merge-on-read positional delete
    "session_window_events",
    "percentiles_lineitem",
    "map_functions_events",
    "higher_order_array_ops",
    "range_join_event_bands",
    "exists_subquery_large_orders",
    "sampled_systematic_agg",
    "grouped_user_trends",
    "pivot_revenue_by_status",
    "token_budget_mixture",          # r4 new: per-stratum token-budget sampling
    "incremental_dedup_cdc",        # r4 new: CDC-cursor incremental dedup
    "udtf_token_explode",
    "stream_join_view_purchases",
    "pii_redact_documents",
    "corpus_clean_pipeline",
    "filtered_aggregates_orders",   # r4 rotation: aggregate FILTER clause
    "gap_fill_interpolate",         # r4 rotation: sequence + interpolation
    "bm25_retrieval",               # r4 rotation: corpus-stats retrieval
    "gaps_islands_streaks",         # r4 rotation: gaps-and-islands windows
    "argmax_user_events",           # r4 rotation: max_by/min_by argmax
    "funnel_steps_users",           # r4 rotation: conditional-MIN funnel
]
assert len(_WINDOW_ORDER) == 50

_TAIL_ORDER = [
    # oracle-paired category-duplicates (locally green, window overflow).
    # r4 rotated OUT of the window (near-isomorphic to an in-window shape,
    # driver-green since r1-r3):
    "q3_shipping_priority",         # join+agg: q7/q21 in window
    "q5_region_revenue",            # 6-way join: q7/q21 in window
    "q10_returned_items",           # join+agg: q7 in window
    "semi_join_customers_with_open_orders",  # semi: q21 EXISTS in window
    "topk_expensive_orders",        # top-k: window_topk + lateral_topk in
    "setops_customer_order_status", # setops: setops_multiset in window
    "rollup_order_status",          # rollup: grouping_sets in window
    "unpivot_revenue_matrix",       # pivot family: pivot_revenue in window
    "multimodal_asset_stats",       # multimodal: byte_features in window
    # r4 late rotation (driver-green r1-r3, category covered in window):
    "array_embedding_norms",        # array/HOF: higher_order_array_ops in
    "full_outer_monthly_volumes",   # join family: q7/q17/q21/theta in window
    "similarity_bruteforce_topk",   # cosine-exact: embedding_cosine_neardup in
    "window_tumbling_events",       # streaming windows: session_window in
    "range_frame_rolling_value",    # windows: topk + running + gaps in
    "correlated_scalar_subquery_orders",  # correlated scalar: q17 in window
    # tail since r3:
    "dedup_exact_fingerprint",   # dedup-exact: dedup_exact_documents in window
    "cube_lineitem_flags",       # rollup/cube/sets: grouping_sets in window
    "date_parts_orders",         # scalar date/math: scalar_string_math_part in
    "lead_lag_order_gaps",       # windows: topk + running + gaps in
    "multimodal_frame_sample",   # multimodal: byte_features in window
    "string_agg_nations",        # array/agg: array_norms + higher_order in
    "anti_join_customers_without_orders",  # anti: q21 NOT EXISTS in window
    "quality_score_documents",   # text: lang_id + token_stats in window, and
    #                              corpus_clean_pipeline exercises the same
    #                              quality formula end-to-end
    "snapshot_compaction_roundtrip",  # snapshots: cdc + time_travel +
    #                              flight_roundtrip in window; pytest pins
    #                              the replace/CDC contract
    # approximate by design — no deterministic cross-engine oracle exists:
    "dedup_simhash",
    "similarity_ann_lsh",
    "similarity_knn_join",
    "similarity_quantized_topk",
    "similarity_pq_topk",
    "similarity_ann_ivf",
    "approx_distinct_parts",
    "hll_sketch_union_parts",
    "approx_quantiles_totalprice",
    "doc_winnowing_fingerprints",
    "sequence_packing_stats",
    "incremental_neardup_cdc",  # greedy==full pinned in tests/test_corpus.py
    "bpe_train_merges",         # pinned against a pure-Python BPE reference
    "bpe_encode_documents",     # encoder pinned against the same reference
]

_reordered: dict[str, QueryFn] = {}
for _n in _WINDOW_ORDER:
    _reordered[_n] = _QUERIES[_n]
for _n in _QUERIES:  # mid-section: registration order, no driver row
    if _n not in _reordered and _n not in _TAIL_ORDER:
        _reordered[_n] = _QUERIES[_n]
for _n in _TAIL_ORDER:
    _reordered[_n] = _QUERIES[_n]
assert len(_reordered) == len(_QUERIES)
_QUERIES.clear()
_QUERIES.update(_reordered)

# every window slot must be hash-checkable — catch drift at import time
_window = list(_QUERIES)[:50]
assert _window == _WINDOW_ORDER
_unoracled = [n for n in _window if n not in _ORACLES]
assert not _unoracled, f"no-oracle queries inside the driver window: {_unoracled}"

"""Pins for the r9 registry additions beyond their DuckDB oracles:
algorithmic correctness against an independent reference (numpy for the
ridge fit), and the engine-portability claims (partitioning-independent
results) the docstrings make.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from icerunner_spark import queries as q

SF = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


class TestRidgeQualityFit:
    def test_matches_numpy_closed_form(self, spark):
        """The declarative Cramer solve must equal numpy's lstsq-grade
        solve of the same ridge system (X'X + I) beta = X'y built from
        the same features — an independent linear-algebra reference, not
        a replay of the SQL."""
        row = q.queries()["ridge_quality_fit"](spark, SF).collect()[0]
        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            "text", "n_chars", "lang"
        ).collect()
        import re

        tok = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
        X = np.array(
            [
                [1.0, float(len(tok.findall(d["text"].lower()))), float(d["n_chars"])]
                for d in docs
            ]
        )
        y = np.array([1.0 if d["lang"] == "en" else 0.0 for d in docs])
        A = X.T @ X + np.eye(3)
        beta = np.linalg.solve(A, X.T @ y)
        assert row["n_docs"] == len(docs)
        assert row["beta_intercept"] == pytest.approx(beta[0], abs=5e-6)
        assert row["beta_tokens"] == pytest.approx(beta[1], abs=5e-6)
        assert row["beta_chars"] == pytest.approx(beta[2], abs=5e-6)


class TestPagerankOrderGraph:
    def test_partitioning_independent(self, spark):
        """Fixed-point integer ranks must be BIT-identical whatever the
        shuffle layout — the engine-portability claim. Run the same
        query under two adversarial shuffle-partition settings."""
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = sorted(
                tuple(r) for r in q.queries()["pagerank_order_graph"](spark, SF).collect()
            )
            # no clearCache needed between runs: the edge frame is an
            # eager localCheckpoint scoped to each invocation, not a
            # CacheManager entry that would substitute run 1's blocks
            # into run 2's identical plan
            spark.conf.set("spark.sql.shuffle.partitions", "11")
            b = sorted(
                tuple(r) for r in q.queries()["pagerank_order_graph"](spark, SF).collect()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            spark.catalog.clearCache()
        assert a == b
        assert len(a) == 20

    def test_composes_without_cache_registry_growth(self, spark):
        """Cache-lifetime contract (r9 verdict item 7): a standalone
        caller composing pagerank into a longer pipeline must not leak a
        CacheManager entry that only a harness clearCache would release.
        The edge frame is an eager localCheckpoint — SQL cache registry
        stays empty, and a second query in the same session runs on an
        untouched cache."""
        spark.catalog.clearCache()
        cm = spark._jsparkSession.sharedState().cacheManager()
        assert cm.isEmpty()
        pr = q.queries()["pagerank_order_graph"](spark, SF)
        # compose: join the ranks back to a second aggregate in one plan
        top = pr.limit(5)
        composed = top.join(
            q.queries()["q1_pricing_summary"](spark, SF).limit(1).crossJoin(
                top.select(F.count(F.lit(1)).alias("k"))
            ),
            how="cross",
        )
        assert composed.count() > 0
        assert cm.isEmpty()  # no persist entry to leak

    def test_rank_floor_and_mass(self, spark):
        """Every damped rank >= 0.15*SCALE (the teleport floor), and
        integer truncation only ever LOSES mass: total <= n_nodes*SCALE
        (mass is conserved up to the div floors)."""
        rows = q.queries()["pagerank_order_graph"](spark, SF).collect()
        scale = 1_000_000_000_000
        assert all(r["rank_e12"] >= 15 * scale // 100 for r in rows)
        # top-20 of a 3-iteration damped walk can't exceed total mass
        assert all(r["rank_e12"] < 100 * scale for r in rows)


class TestTfidfTopTerms:
    def test_terms_come_from_their_documents(self, spark):
        out = q.queries()["tfidf_top_terms"](spark, SF)
        docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
        # tokens() lowercases, so containment must compare lowercased
        # text (the fixture happens to be lowercase; don't depend on it)
        joined = out.join(docs, "doc_id").withColumn(
            "present", F.lower(F.col("text")).contains(F.col("term"))
        )
        bad = joined.filter(~F.col("present")).count()
        assert bad == 0
        ranks = out.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n"), F.max("rk").alias("mx")
        )
        assert ranks.filter((F.col("n") > 3) | (F.col("mx") > 3)).count() == 0

    def test_matches_pure_python_tfidf(self, spark):
        """Independent reference for the scoring itself: recompute the
        smoothed tf-idf with collections.Counter over the raw fixture
        and assert the per-doc top-3 (score AND order) match the query —
        an idf-direction inversion or an off-by-one in the smoothing
        cannot pass this."""
        import math
        import re as _re
        from collections import Counter

        out = {
            (r["doc_id"], r["rk"]): (r["term"], r["tfidf"])
            for r in q.queries()["tfidf_top_terms"](spark, SF).collect()
        }
        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "text"
        ).collect()
        tok = _re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
        tfs = {d["doc_id"]: Counter(tok.findall(d["text"].lower())) for d in docs}
        df = Counter()
        for c in tfs.values():
            df.update(c.keys())
        n = len(docs)
        for doc_id, tf in tfs.items():
            scored = sorted(
                (
                    (round(t * (math.log((n + 1.0) / (df[w] + 1.0)) + 1.0), 6), w)
                    for w, t in tf.items()
                ),
                key=lambda p: (-p[0], p[1]),
            )[:3]
            for rk, (score, term) in enumerate(scored, start=1):
                assert out[(doc_id, rk)] == (term, pytest.approx(score, abs=1e-9)), (
                    doc_id,
                    rk,
                )


class TestStreamDedupWatermark:
    def test_doubled_source_equals_single_copy(self, spark):
        out = q.queries()["stream_dedup_watermark"](spark, SF_MED)
        total = out.agg(F.sum("n_events").alias("s")).collect()[0]["s"]
        raw = spark.read.parquet(f"{SF_MED}/events.parquet").count()
        assert total == raw


class TestEwmaAnomalyEvents:
    def test_matches_numpy_reference(self, spark):
        """The window-array EWMA and z-scores must equal a numpy replay
        of the definition (trailing-50 normalized exponential weights;
        trailing mean/stddev excluding the current row) — an independent
        per-user sequential reference, not a SQL replay."""
        out = {
            r["event_id"]: r
            for r in q.queries()["ewma_anomaly_events"](spark, SF).collect()
        }
        rows = (
            spark.read.parquet(f"{SF}/events.parquet")
            .select("event_id", "user_id", "ts", "value")
            .collect()
        )
        by_user: dict = {}
        for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
            by_user.setdefault(r["user_id"], []).append(r)
        checked = 0
        for user, seq in by_user.items():
            vals = np.array([r["value"] for r in seq])
            for i, r in enumerate(seq):
                lo = max(0, i - 49)
                trail = vals[lo : i + 1]
                w = 0.9 ** np.arange(len(trail) - 1, -1, -1)
                ewma = float((trail * w).sum() / w.sum())
                got = out[r["event_id"]]
                assert got["ewma"] == pytest.approx(ewma, abs=5e-6), (
                    f"user {user} event {r['event_id']}"
                )
                prev = vals[lo:i]
                if len(prev) >= 2 and prev.std(ddof=1) > 0:
                    z = (vals[i] - prev.mean()) / prev.std(ddof=1)
                    assert got["zdev"] == pytest.approx(z, abs=5e-6)
                    assert bool(got["is_spike"]) == (round(z, 6) > 3.0)
                else:
                    assert got["zdev"] is None
                    assert got["is_spike"] is False
                checked += 1
        assert checked == len(rows) and checked > 0


class TestNeardupPrefixFilter:
    def test_partitioning_independent(self, spark):
        """Exact pair results must not depend on the shuffle layout."""
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = sorted(
                tuple(r)
                for r in q.queries()["neardup_prefix_filter"](spark, SF).collect()
            )
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            b = sorted(
                tuple(r)
                for r in q.queries()["neardup_prefix_filter"](spark, SF).collect()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b and a

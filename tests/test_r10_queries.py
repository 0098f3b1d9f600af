"""Pins for the r10 registry additions beyond their DuckDB oracles:
algorithmic correctness against independent references (numpy OLS for
the Zipf fit, a hand-computed planted PSI), and the engine-portability
claims (partitioning-independent results) the docstrings make."""

from __future__ import annotations

import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from icerunner_spark import queries as q

SF = "/root/testdata/sf0.001"


class TestZipfTokenFit:
    def test_matches_numpy_ols(self, spark):
        """alpha must equal numpy's polyfit slope on the same
        (ln rank, ln freq) points — an independent regression reference,
        not a replay of the SQL."""
        rows = {
            r["lang"]: r for r in q.queries()["zipf_token_fit"](spark, SF).collect()
        }
        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            "lang", "text"
        ).collect()
        tok = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
        by_lang: dict = {}
        for d in docs:
            freq = by_lang.setdefault(d["lang"], {})
            for t in tok.findall(d["text"].lower()):
                freq[t] = freq.get(t, 0) + 1
        for lang, freq in by_lang.items():
            top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
            x = np.log(np.arange(1, len(top) + 1, dtype=float))
            y = np.log(np.array([c for _, c in top], dtype=float))
            slope = np.polyfit(x, y, 1)[0]
            got = rows[lang]
            assert got["n_terms"] == len(top)
            assert got["zipf_alpha"] == pytest.approx(-slope, abs=5e-5)
            # sanity band (wide: the synthetic zh docs tokenize to
            # single CJK chars with a nearly flat frequency profile,
            # alpha ~ 0.19 — a real signal the fit correctly reports)
            assert 0.05 < got["zipf_alpha"] < 3.5

    def test_partitioning_independent(self, spark):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = sorted(tuple(r) for r in q.queries()["zipf_token_fit"](spark, SF).collect())
            spark.conf.set("spark.sql.shuffle.partitions", "13")
            b = sorted(tuple(r) for r in q.queries()["zipf_token_fit"](spark, SF).collect())
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b and a


class TestPsiSourceDrift:
    def test_planted_distribution_hand_computed(self, spark, tmp_path):
        """A planted two-source corpus where the PSI is computable by
        hand: source 'a' all short docs (bucket 0), source 'b' all long
        docs (bucket 1). Replays the +1-smoothed formula in plain
        Python over the 16 integer buckets."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = [(i, "x" * 10, "en", "a", 10) for i in range(30)] + [
            (100 + i, "y" * 300, "en", "b", 300) for i in range(10)
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                    "lang": pa.array([r[2] for r in rows]),
                    "source": pa.array([r[3] for r in rows]),
                    "n_chars": pa.array([r[4] for r in rows], pa.int64()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = {
            r["source"]: r
            for r in q.queries()["psi_source_drift"](spark, str(tmp_path)).collect()
        }

        def psi(counts: dict, n_src: int, glob: dict, n_all: int) -> float:
            s = 0.0
            for bk in range(16):
                p = (counts.get(bk, 0) + 1.0) / (n_src + 16.0)
                qq = (glob.get(bk, 0) + 1.0) / (n_all + 16.0)
                s += (p - qq) * math.log(p / qq)
            return round(s, 6)

        glob = {0: 30, 1: 10}
        assert got["a"]["n_docs"] == 30
        assert got["b"]["n_docs"] == 10
        assert got["a"]["psi"] == pytest.approx(psi({0: 30}, 30, glob, 40), abs=2e-6)
        assert got["b"]["psi"] == pytest.approx(psi({1: 10}, 10, glob, 40), abs=2e-6)
        # the minority source diverges more from the pooled corpus
        assert got["b"]["psi"] > got["a"]["psi"] > 0

    def test_identical_source_near_zero(self, spark, tmp_path):
        """Sources whose length profiles ARE the corpus profile must
        score equal, small PSI. Not ~0: with 20 docs/source the +1
        smoothing over the 12 EMPTY buckets dominates ((1/36 vs 1/56)
        per bucket), a deliberate small-sample bias the monitor shares
        across batches — so the pin is symmetry plus a bound that the
        hand replay confirms, not an idealized zero."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = [
            (i, "x" * ln, "en", src, ln)
            for i, (src, ln) in enumerate(
                [(s, ln) for s in ("a", "b") for ln in (10, 300, 600, 900) * 5]
            )
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                    "lang": pa.array([r[2] for r in rows]),
                    "source": pa.array([r[3] for r in rows]),
                    "n_chars": pa.array([r[4] for r in rows], pa.int64()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = {
            r["source"]: r["psi"]
            for r in q.queries()["psi_source_drift"](spark, str(tmp_path)).collect()
        }
        # identical profiles -> identical PSI, bounded by the smoothing
        # floor for 20-docs-vs-16-buckets (hand value ~ 0.0725)
        assert got["a"] == got["b"]
        assert 0 < got["a"] < 0.1

    def test_partitioning_independent(self, spark):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = sorted(tuple(r) for r in q.queries()["psi_source_drift"](spark, SF).collect())
            spark.conf.set("spark.sql.shuffle.partitions", "13")
            b = sorted(tuple(r) for r in q.queries()["psi_source_drift"](spark, SF).collect())
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b and a


class TestPerSourcePercentileFilter:
    def test_planted_ranks_hand_computed(self, spark, tmp_path):
        """10 docs with distinct token counts in one source: percent_rank
        = (rank-1)/9, so pct >= 0.2 keeps ranks 3..10 — 8 docs, min kept
        = the 3rd-smallest token count."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        texts = [("w " * k).strip() for k in range(1, 11)]  # 1..10 tokens
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(10), pa.int64()),
                    "text": pa.array(texts),
                    "lang": pa.array(["en"] * 10),
                    "source": pa.array(["a"] * 10),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        (row,) = q.queries()["per_source_percentile_filter"](
            spark, str(tmp_path)
        ).collect()
        assert row["n_docs"] == 10
        assert row["n_kept"] == 8
        assert row["min_kept_tokens"] == 3

    def test_partitioning_independent(self, spark):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = sorted(tuple(r) for r in q.queries()["per_source_percentile_filter"](spark, SF).collect())
            spark.conf.set("spark.sql.shuffle.partitions", "13")
            b = sorted(tuple(r) for r in q.queries()["per_source_percentile_filter"](spark, SF).collect())
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b and a

    @staticmethod
    def _window_reference(spark, sf_dir):
        """The r10 single-window formulation, kept verbatim as the
        equality oracle for the r11 two-phase histogram rank."""
        from pyspark.sql import Window

        from icerunner_spark.functions.text import token_count
        from icerunner_spark.sources.testdata import load_table

        d = load_table(spark, "documents", sf_dir).select(
            "doc_id", "source", token_count("text").alias("n_tokens")
        )
        w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
        r = d.withColumn("pct", F.percent_rank().over(w))
        kept = F.when(F.col("pct") >= 0.2, 1).otherwise(0)
        return (
            r.groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(kept).cast("long").alias("n_kept"),
                F.min(F.when(F.col("pct") >= 0.2, F.col("n_tokens")))
                .cast("long")
                .alias("min_kept_tokens"),
            )
            .orderBy("source")
        )

    def test_two_phase_equals_window_form_sf001(self, spark):
        got = [tuple(r) for r in q.queries()["per_source_percentile_filter"](spark, SF).collect()]
        ref = [tuple(r) for r in self._window_reference(spark, SF).collect()]
        assert got == ref and got

    def test_two_phase_equals_window_form_dominant_source(self, spark, tmp_path):
        """r10 verdict item 3's fixture: ONE source holds 90% of docs
        (the shape where the old per-source window serialized into one
        partition), with heavy token-count ties so the histogram path's
        cumulative-bucket cutoff is exercised, plus a single-doc source
        (percent_rank 0 -> keeps nothing, NULL min) and a two-doc tie
        source."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = []
        for i in range(900):
            rows.append((i, "big", ("w " * (1 + i % 7)).strip()))
        for i in range(98):
            rows.append((900 + i, "small", ("w " * (1 + i % 3)).strip()))
        rows.append((998, "single", "w w"))
        rows.append((999, "pair", "w"))
        rows.append((1000, "pair", "w"))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[2] for r in rows]),
                    "lang": pa.array(["en"] * len(rows)),
                    "source": pa.array([r[1] for r in rows]),
                    "n_chars": pa.array(
                        [len(r[2]) for r in rows], pa.int64()
                    ),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = [tuple(r) for r in q.queries()["per_source_percentile_filter"](
            spark, str(tmp_path)
        ).collect()]
        ref = [tuple(r) for r in self._window_reference(
            spark, str(tmp_path)
        ).collect()]
        assert got == ref
        by_src = {r[0]: r for r in got}
        assert by_src["single"][2] == 0 and by_src["single"][3] is None
        assert by_src["big"][1] == 900


class TestDecontamEvalContainment:
    def test_planted_containment(self, spark, tmp_path):
        """Eval doc 0 (0 % 37 == 0) verbatim inside corpus doc 1 ->
        containment 1.0; eval doc 37 disjoint from the corpus -> 0.0."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        shared = " ".join(chr(97 + i) * 3 for i in range(12))  # pure-alpha words
        rows = [
            (0, shared, "en", "eval", len(shared)),
            (37, "nothing here overlaps with any training text at all "
                 "truly unique words qqq www eee", "en", "eval", 10),
            (1, "prefix words " + shared + " suffix words", "en", "web", 10),
            (2, "other corpus content entirely unrelated filler "
                "padding words to be safe", "en", "web", 10),
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                    "lang": pa.array([r[2] for r in rows]),
                    "source": pa.array([r[3] for r in rows]),
                    "n_chars": pa.array([r[4] for r in rows], pa.int64()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = {
            r["eval_doc_id"]: r
            for r in q.queries()["decontam_eval_containment"](
                spark, str(tmp_path)
            ).collect()
        }
        assert got[0]["containment"] == 1.0
        assert got[0]["n_grams"] == got[0]["n_contained"] == 5  # 12 tokens -> 5 distinct 8-grams
        assert got[37]["containment"] == 0.0
        assert got[37]["n_contained"] == 0


class TestEmbeddingOutlierZscore:
    def test_planted_outlier_matches_numpy(self, spark, tmp_path):
        """A tight cluster + one far vector: the far vector must rank
        first with the z-score numpy computes from the same
        centroid-distance formula."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.RandomState(7)
        X = rng.normal(0, 0.1, size=(50, 64)).astype(np.float32)
        X[13] = 5.0  # the outlier
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(50), pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, row)) for row in X],
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array([0] * 50, pa.int32()),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        out = q.queries()["embedding_outlier_zscore"](spark, str(tmp_path)).collect()
        assert out[0]["vec_id"] == 13
        Xd = X.astype(np.float64)
        c = Xd.mean(axis=0)
        d = np.sqrt(((Xd - c) ** 2).sum(axis=1))
        z = (d - d.mean()) / d.std()
        assert out[0]["dist_z"] == pytest.approx(z[13], abs=1e-4)
        # top-20 ordering matches numpy's
        order = np.lexsort((np.arange(50), -np.round(z, 6)))[:20]
        assert [r["vec_id"] for r in out] == [int(i) for i in order]

    def test_partitioning_independent(self, spark):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = [tuple(r) for r in q.queries()["embedding_outlier_zscore"](spark, SF).collect()]
            spark.conf.set("spark.sql.shuffle.partitions", "13")
            b = [tuple(r) for r in q.queries()["embedding_outlier_zscore"](spark, SF).collect()]
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b and a

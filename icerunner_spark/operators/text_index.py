"""Persisted inverted (BM25) index over a documents table, maintained
incrementally from the CDC changelog — the lexical twin of
operators.ann_index.IncrementalAnnIndex.

The per-query BM25 operator (the ``bm25_retrieval`` registry query)
re-tokenizes the corpus every run; at 100 TB the index must be TABLES —
built once, advanced from the base table's row-level changelog, probed by
term at query time:

- **postings** (``term, doc_id, tf``): hidden-partitioned by
  ``bucket(N, term)``, so a query's term-IN probe prunes whole partition
  dirs at PLANNING (plus per-file bounds/blooms beneath) — scoring reads
  O(docs containing the query terms), never the corpus;
- **doclens** (``doc_id, dl``): the narrow per-document length table the
  BM25 normalizer needs; corpus stats (N, avgdl) are ONE tiny aggregate
  over it at query time, matching the shape of the scan-time operator;
- **refresh**: reads ``scan_changelog`` since the stored cursor. Every
  changed doc id (deleted OR re-inserted) is equality-deleted from both
  tables (O(keys) commits), fresh postings/lengths for the inserts
  append, and the cursor lands LAST as a metadata-only property commit —
  so a crash anywhere replays idempotently: re-deleting the same keys is
  a no-op and the replayed append re-creates exactly the rows the replay
  deleted. Cost is O(changed docs), never O(corpus).

Two tables cannot commit atomically (same as Iceberg without a REST
catalog transaction); a reader racing a refresh may see postings ahead
of doclens for the in-flight delta. The cursor-last ordering bounds the
skew to one delta, and ``query()`` is exact whenever no refresh is
mid-flight — the property the oracle-paired registry query pins.

Scoring reproduces ``bm25_retrieval`` bit-for-bit: the same tokenizer,
integer tf/dl/df inputs, and one fixed-association double expression per
term — which is what lets a full SQL recompute over the final corpus
state serve as the oracle for the INDEX-SERVED answer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from icerunner_spark.functions.text import tokens
from icerunner_spark.table import IceTable, NoSuchTableError

_CURSOR_PROP = "bm25.cursor"
K1 = 1.2
B = 0.75


class IncrementalBm25Index:
    def __init__(
        self,
        base: IceTable,
        path: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_buckets: int = 8,
    ):
        self.base = base
        self.id_col = id_col
        self.text_col = text_col
        self.n_buckets = n_buckets
        self.postings = IceTable(base.spark, os.path.join(path, "postings"))
        self.doclens = IceTable(base.spark, os.path.join(path, "doclens"))

    # ---------- state ----------

    def cursor(self) -> int:
        props = self.postings.properties()
        if _CURSOR_PROP not in props:
            raise NoSuchTableError(f"no BM25 index at {self.postings.path}")
        return int(props[_CURSOR_PROP])

    def _rows_of(self, docs: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(postings, doclens) rows for a batch of documents."""
        toks = docs.select(
            F.col(self.id_col).alias("doc_id"),
            tokens(self.text_col).alias("__t"),
        )
        lens = toks.select("doc_id", F.size("__t").cast("long").alias("dl"))
        posts = (
            toks.select("doc_id", F.explode("__t").alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        return posts, lens

    # ---------- build / refresh ----------

    def build(self, *, overwrite_ok: bool = False):
        """Tokenize and materialize the full index — the one O(corpus)
        pass; every refresh after is delta-sized."""
        snap = self.base.current_snapshot()
        if snap is None:
            raise NoSuchTableError(self.base.path)
        posts, lens = self._rows_of(
            self.base.scan(snapshot_id=snap.snapshot_id)
        )
        self.doclens.create(lens, overwrite_ok=overwrite_ok)
        return self.postings.create(
            posts,
            overwrite_ok=overwrite_ok,
            partition_by=[f"bucket({self.n_buckets}, term)"],
            properties={
                _CURSOR_PROP: str(snap.snapshot_id),
                # cluster each bucket's rows into its own partition dir
                # instead of tasks x buckets small files
                "write.distribution-mode": "hash",
            },
        )

    def refresh(self):
        """Advance the index to the base's current snapshot from the
        changelog. Returns the final postings snapshot, or None when
        already current."""
        start = self.cursor()
        snap = self.base.current_snapshot()
        if snap is None:
            raise NoSuchTableError(self.base.path)
        if snap.snapshot_id == start:
            return None
        # persist the delta once: changed-keys, the arrival window, and
        # the tokenize pass all derive from it, and each downstream
        # consumer (two empty-gates + two appends) would otherwise
        # replay the whole changelog scan
        delta = self.base.scan_changelog(
            start, snap.snapshot_id, with_ordinal=True
        ).persist()
        posts = lens = None
        try:
            changed = delta.select(
                F.col(self.id_col).alias("doc_id")
            ).distinct()
            # last state per id decides: an id whose final in-range
            # change is an insert re-enters; anything else just leaves
            from pyspark.sql import Window

            w = Window.partitionBy(self.id_col).orderBy(
                F.desc("_change_ordinal"),
                F.desc(F.col("_change_type") == "insert"),
            )
            arrivals = (
                delta.withColumn("__r", F.row_number().over(w))
                .filter(
                    (F.col("__r") == 1)
                    & (F.col("_change_type") == "insert")
                )
                .select(self.id_col, self.text_col)
            )
            if changed.limit(1).count():
                self.postings.delete_rows(changed, ["doc_id"], mode="equality")
                self.doclens.delete_rows(changed, ["doc_id"], mode="equality")
            posts, lens = self._rows_of(arrivals)
            # delta-sized; cached so the empty-gate probe and the append
            # share one tokenize+aggregate pass instead of two each
            posts = posts.persist()
            lens = lens.persist()
            # gate the two appends INDEPENDENTLY: a doc that tokenizes
            # to zero tokens has no postings rows but still counts in
            # doclens (dl=0) — build() includes it, so refresh must too
            # or n_docs/avgdl diverge from a from-scratch rebuild
            if posts.limit(1).count():
                self.postings.append(posts)
            if lens.limit(1).count():
                self.doclens.append(lens)
            # cursor LAST, metadata-only: a crash before this line
            # replays the whole delta idempotently
            return self.postings.set_properties(
                {_CURSOR_PROP: str(snap.snapshot_id)}
            )
        finally:
            delta.unpersist()
            if posts is not None:
                posts.unpersist()
            if lens is not None:
                lens.unpersist()

    # ---------- query ----------

    def query(self, terms: tuple[str, ...], *, k: int = 20) -> DataFrame:
        """Top-k BM25 over the index for a fixed term tuple. The term-IN
        probe prunes postings partitions at planning; N/avgdl are one
        narrow aggregate over doclens; the score expression is the same
        fixed-association double arithmetic as the scan-time operator,
        so index-served answers hash-match a full recompute."""
        probed = self.postings.scan(where=[("term", "in", list(terms))])
        # per-doc tf pivot to fixed columns (keeps term association
        # order fixed regardless of row order)
        tf = probed.groupBy("doc_id").agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
                ).alias(f"tf_{i}")
                for i, t in enumerate(terms)
            ]
        )
        # every term's df in ONE conditional aggregate over the probed
        # scan — the per-term ``dfreq.filter(term == t)`` broadcasts each
        # re-ran the postings scan + its delete anti-joins (4 scan
        # subtrees and 3 nested-loop joins in the plan for a 3-term
        # query; r11 optimization round, guide §1.2 "don't recompute").
        # A term absent from the index counts 0, same as the old
        # COALESCE(MAX(df), 0).
        dfs = probed.agg(
            *[
                F.count(F.when(F.col("term") == t, F.lit(1))).alias(f"df_{i}")
                for i, t in enumerate(terms)
            ]
        )
        stats = self.doclens.scan().agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        ).crossJoin(F.broadcast(dfs))
        scored = (
            tf.join(self.doclens.scan(), "doc_id")
            .crossJoin(F.broadcast(stats))
        )

        def term_score(i: int) -> F.Column:
            # literal constants (2.2, 0.25, 0.75) and left-to-right
            # association EXACTLY as bm25_retrieval writes them — the
            # doubles must be bit-identical to the scan-time operator
            tf_c = F.col(f"tf_{i}")
            df_c = F.col(f"df_{i}")
            idf = F.log(1 + (F.col("n_docs") - df_c + 0.5) / (df_c + 0.5))
            norm = tf_c + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
            return idf * (tf_c * 2.2) / norm

        expr = term_score(0)
        for i in range(1, len(terms)):
            expr = expr + term_score(i)
        score = F.round(expr, 6)
        return (
            scored.select("doc_id", score.alias("bm25"))
            .where(F.col("bm25") > 0)
            .orderBy(F.desc("bm25"), F.asc("doc_id"))
            .limit(k)
        )

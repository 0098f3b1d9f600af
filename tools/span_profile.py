"""Stage-level profile of exact_substring_spans at sf1 (r7 verdict
item 5: name the dominant stage behind alpha 0.894, shave it or
document the floor).

Times each materialization boundary of the operator's plan separately
(same session, cache cleared between runs):

  1. grams   — tokenize + posexplode + xxhash64 (+ the spread
               repartition), materialized via the cache the operator
               itself creates;
  2. rare    — document-frequency cap: groupBy(h) count_distinct(id)
               + semi-join back;
  3. pairs   — the h self-join, diagonal islands windows, interval
               merge, pair rollup (end-to-end minus 1 and 2, measured
               as full run on warm caches).

Usage: python tools/span_profile.py [sf_dir]   (default .scale/sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from icerunner_spark.functions.text import word_ngrams  # noqa: E402
from icerunner_spark.operators.dedup import shared_span_pairs  # noqa: E402
from icerunner_spark.session import get_spark  # noqa: E402
from icerunner_spark.sources.testdata import load_table  # noqa: E402


def _timed(label: str, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:32s} {dt:8.3f}s  {out}")
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf1",
    )
    n = 8
    spark = get_spark(app_name="span_profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "documents", sf_dir)
    docs.count()  # warm parquet footers

    from icerunner_spark.functions.text import tokens

    spread = spark.sparkContext.defaultParallelism
    grams = (
        docs.repartition(spread, "doc_id")
        .filter(F.size(tokens("text")) >= n)
        .select(
            F.col("doc_id").alias("id"),
            F.posexplode(word_ngrams("text", n)).alias("pos", "gram"),
        )
        .select("id", "pos", F.xxhash64("gram").alias("h"))
        .cache()
    )
    _timed("1 grams (tokenize+explode+hash)", lambda: grams.count())
    rare = grams.join(
        grams.groupBy("h")
        .agg(F.count_distinct("id").alias("df_"))
        .filter(F.col("df_") <= 16)
        .select("h"),
        "h",
    ).cache()
    _timed("2 rare (df cap)", lambda: rare.count())
    m = (
        rare.select(F.col("id").alias("id_a"), F.col("pos").alias("pos_a"), "h")
        .join(
            rare.select(F.col("id").alias("id_b"), F.col("pos").alias("pos_b"), "h"),
            "h",
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    _timed("3a self-join matches", lambda: m.count())
    grams.unpersist()
    rare.unpersist()
    spark.catalog.clearCache()
    _timed(
        "full operator (cold)",
        lambda: shared_span_pairs(
            docs, "doc_id", "text", n=n, max_df=16
        ).count(),
    )


if __name__ == "__main__":
    main()

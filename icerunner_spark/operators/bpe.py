"""Iterated BPE tokenizer training (SURVEY.md §2.C vocab/token-stats
family; closes the loop that ``bpe_pair_frequencies`` opens — that query
is one merge-selection round, this trains N merges).

Scale shape — the industrial BPE-trainer decomposition:

1. ONE corpus pass collapses the text to a word-frequency table
   (distinct word, count). At 100 TB of text the word table is
   vocab-sized (millions of rows, not billions) — this is the only
   stage that touches documents.
2. Each merge round then iterates over the WORD table only: count
   adjacent symbol pairs weighted by word frequency (explode +
   map-side-combinable sum), pick the argmax pair with a deterministic
   lexicographic tie-break, and apply the merge to every word's symbol
   array with a greedy left-to-right fold (pure higher-order
   ``F.aggregate`` — no UDF). The per-round driver transfer is ONE row
   (the winning pair); the word table is ``localCheckpoint``-ed each
   round so 32 rounds don't stack 32 plans.

Determinism: ties on pair frequency break lexicographically on
(left, right), and the merge fold is greedy left-to-right
non-overlapping — both rules mirrored by the pure-Python reference
implementation the tests pin against ("aaa" + merge (a,a) -> [aa, a]).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icerunner_spark.functions.text import tokens


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) — the one corpus-scaled pass of BPE training. Token
    skew (stopwords shared by every doc) is absorbed by the partial
    aggregate; only (word, partial-count) rows shuffle — the scan's own
    partitioning carries the map side, so no exchange ever moves the
    raw text."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_fold(syms, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of adjacent (left,
    right) symbol occurrences, as a single ``F.aggregate`` fold: append
    each symbol unless it completes the pair with the accumulator's
    last element, in which case the last element is replaced by the
    merged symbol. A just-merged symbol can't re-merge as the RIGHT
    half (it no longer equals ``left``), which is exactly the classic
    BPE application order."""
    merged = F.lit(left + right)

    def step(acc, x):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right))
        )
        return F.when(
            hit,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def _bpe_train_local(
    word_counts: list[tuple[str, int]], n_merges: int, min_freq: int
) -> list[tuple[str, str, int]]:
    """Pure-Python BPE training over an in-memory (word, cnt) table —
    same greedy fold (:func:`apply_merge`) and the same deterministic
    argmax (max pair count, ties broken on lexicographically smallest
    (left, right); Python tuple order on str equals Spark's binary UTF-8
    order because UTF-8 byte order preserves code-point order) as the
    distributed loop in :func:`bpe_train`, so the two paths are
    interchangeable. Cost per round is O(total symbols), driver-only."""
    state = [(list(w), int(c)) for w, c in word_counts]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in state:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + cnt
        if not counts:
            break
        (left, right), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_freq:
            break
        merges.append((left, right, n))
        state = [(apply_merge(syms, left, right), cnt) for syms, cnt in state]
    return merges


def bpe_train(
    words: DataFrame,
    n_merges: int,
    *,
    min_freq: int = 2,
    driver_vocab_cap: int = 1_000_000,
) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges over a (word, cnt) frequency table.
    Returns the learned merge table [(left, right, pair_freq)] in merge
    order. Stops early when no adjacent pair reaches ``min_freq``.

    Adaptive execution: the frequency table is materialised once
    (eager ``localCheckpoint`` — this is the only corpus-scaled work);
    when its row count fits ``driver_vocab_cap`` the merge rounds run
    driver-side over the collected table (bounded by the cap — the
    standard industrial BPE-trainer shape, since the vocab table is
    millions of rows even at 100 TB while each distributed round costs
    fixed job/codegen overhead regardless of size). Above the cap the
    original distributed loop runs unchanged. Both paths share the same
    greedy fold and tie-break and are pinned equal in
    tests/test_operators.py, so the result is path-independent. Set
    ``driver_vocab_cap=0`` to force the distributed loop."""
    words = words.localCheckpoint(eager=True)
    if driver_vocab_cap and words.count() <= driver_vocab_cap:
        pairs = [(r["word"], r["cnt"]) for r in words.select("word", "cnt").collect()]
        return _bpe_train_local(pairs, n_merges, min_freq)
    syms = F.split(F.col("word"), "")  # characters
    state = words.select("word", "cnt", syms.alias("syms")).localCheckpoint(
        eager=True
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        n = F.size("syms")
        pair_arr = F.when(
            n >= 2,
            F.zip_with(
                F.slice("syms", 1, n - 1),
                F.slice("syms", 2, n - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            ),
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        best = (
            state.select(F.explode(pair_arr).alias("p"), "cnt")
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "l", "r")
            .first()
        )
        if best is None or best["n"] < min_freq:
            break
        merges.append((best["l"], best["r"], int(best["n"])))
        state = state.withColumn(
            "syms", _merge_fold(F.col("syms"), best["l"], best["r"])
        ).localCheckpoint(eager=True)
    return merges


def bpe_train_corpus(
    spark: SparkSession, df: DataFrame, text_col: str, n_merges: int
) -> DataFrame:
    """End-to-end: corpus -> word frequencies -> trained merge table as a
    DataFrame (rank, left, right, merged, pair_freq)."""
    merges = bpe_train(word_frequencies(df, text_col), n_merges)
    rows = [
        (i, left, right, left + right, freq)
        for i, (left, right, freq) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_freq bigint"
    )


# --------------------------------------------------------------------------- #
# Encoding (applying a trained merge table)
# --------------------------------------------------------------------------- #


def apply_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Pure-Python twin of :func:`_merge_fold` — greedy left-to-right
    non-overlapping merge of adjacent (left, right). Shared by the
    executor-side encoder and the test reference so the two can never
    drift."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word by replaying the merge table in rank order —
    exactly the sequence of folds training applied, so a word seen in
    training encodes to its final training-time symbols."""
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        syms = apply_merge(syms, left, right)
    return syms


def bpe_encode(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]], *,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize documents with a TRAINED merge table: regex word split
    (functions.text.tokens semantics), each word replayed through the
    merges. Arrow-batched pandas UDF with a per-batch word cache — BPE
    merge replay is inherently sequential per word, but Zipf's law makes
    the cache absorb almost all words, so per-batch cost is ~(distinct
    words x merges), not (tokens x merges). Executor-parallel over
    partitions; the merge table (KBs) ships in the UDF closure."""
    import re

    from pyspark.sql.functions import pandas_udf

    from icerunner_spark.functions.text import _TOKEN_RE

    pairs = [(left, right) for left, right, *_ in merges]
    pat = re.compile(_TOKEN_RE)

    @pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            doc: list[str] = []
            for w in pat.findall((t or "").lower()):
                hit = cache.get(w)
                if hit is None:
                    hit = cache[w] = encode_word(w, pairs)
                doc.extend(hit)
            out.append(doc)
        return pd.Series(out)

    return df.withColumn(out_col, _enc(F.col(text_col)))

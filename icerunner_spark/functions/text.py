"""Text primitives for the training-data pipeline operators.

JVM-side expressions only (regexp/split/hash built-ins); the heavy
operators in ``icerunner_spark.operators.text`` / ``dedup`` compose these.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenization plus a BPE-ish fallback: words, numbers, or any
# single non-space symbol each count as one token.
_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column | str) -> Column:
    """array<string> of word/number/symbol tokens (lowercased)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(text), F.lit(_TOKEN_RE), 0)


def token_count(text: Column | str) -> Column:
    """Token count: BPE-ish regex token tally (SURVEY §2.C text analysis).

    Uses regexp_count rather than size(regexp_extract_all(...)) — counting
    matches without materializing the token array is ~10x cheaper on long
    documents, which matters when this runs over billions of docs."""
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(text), F.lit(_TOKEN_RE))


def char_ngrams(text: Column | str, n: int = 5) -> Column:
    """array<string> of overlapping character n-grams (shingles) —
    the input unit for MinHash / Jaccard near-dup detection."""
    text = F.col(text) if isinstance(text, str) else text
    norm = F.lower(F.regexp_replace(text, r"\s+", " "))
    # sequence over character positions, sliced JVM-side: no UDF.
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(norm) - F.lit(n - 1))),
        lambda i: norm.substr(i, F.lit(n)),
    )


def fingerprint64(text: Column | str) -> Column:
    """Deterministic 64-bit document fingerprint (xxhash64 of normalized
    text) — exact-dup key at any scale."""
    text = F.col(text) if isinstance(text, str) else text
    return F.xxhash64(F.lower(F.regexp_replace(text, r"\s+", " ")))


def winnowing_fingerprints(
    text: Column | str, *, k: int = 8, window: int = 4
) -> Column:
    """Winnowing document fingerprints (rolling-hash selection, the MOSS
    scheme): hash every k-gram, slide a window of ``window`` consecutive
    hashes, keep each window's minimum, return the distinct selection as
    array<bigint>.

    Guarantees: any shared substring of length >= k + window - 1 between
    two documents contributes at least one identical fingerprint — the
    basis for plagiarism/near-dup detection at corpus scale. Entirely
    higher-order array expressions over xxhash64: no UDF, no shuffle;
    downstream join/groupBy on exploded fingerprints is the only exchange.
    """
    grams = char_ngrams(text, k)
    hashes = F.transform(grams, lambda g: F.xxhash64(g))
    n_windows = F.greatest(F.size(hashes) - F.lit(window - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_min(F.slice(hashes, i, window)),
    )
    return F.array_distinct(mins)

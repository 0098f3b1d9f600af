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


def normalize_ws(text: Column | str) -> Column:
    """Lowercased, whitespace-collapsed text — the normalization every
    shingle/fingerprint shares. Hot pipelines should PROJECT this into a
    column once and pass ``normalized=True`` downstream: expressions
    referenced inside an array-lambda are re-evaluated per element (no
    CSE across the lambda boundary), so an un-materialized normalization
    inside :func:`char_ngrams` re-runs the regex once per gram —
    measured 2.7x on the whole shingle stage at sf0.1."""
    text = F.col(text) if isinstance(text, str) else text
    return F.lower(F.regexp_replace(text, r"\s+", " "))


def char_ngrams(text: Column | str, n: int = 5, *, normalized: bool = False) -> Column:
    """array<string> of overlapping character n-grams (shingles) —
    the input unit for MinHash / Jaccard near-dup detection. Pass
    ``normalized=True`` when ``text`` is already a materialized
    :func:`normalize_ws` column (see its docstring for why that
    matters)."""
    text = F.col(text) if isinstance(text, str) else text
    norm = text if normalized else normalize_ws(text)
    # sequence over character positions, sliced JVM-side: no UDF. The
    # normalized text is let-bound through a single-element-array
    # transform (same CSE-boundary fix as word_ngrams): otherwise an
    # un-materialized normalize_ws re-runs its regex once per GRAM.
    return F.element_at(
        F.transform(
            F.array(norm),
            lambda t: F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.lit(1), F.length(t) - F.lit(n - 1)),
                ),
                lambda i: t.substr(i, F.lit(n)),
            ),
        ),
        1,
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

    The gram-hash array is let-bound before the sliding-window lambda
    (same CSE-boundary fix as :func:`word_ngrams`): the naive form
    re-derived the whole shingle+hash chain once per WINDOW position.
    Pipelines that shape this as (id, fps) rows should still prefer
    operators.text.winnowing_fingerprints, which materializes the
    intermediate columns."""
    grams = char_ngrams(text, k)
    return F.element_at(
        F.transform(
            F.array(F.transform(grams, lambda g: F.xxhash64(g))),
            lambda hs: F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(
                            F.size(hs) - F.lit(window - 1), F.lit(1)
                        ),
                    ),
                    lambda i: F.array_min(F.slice(hs, i, window)),
                )
            ),
        ),
        1,
    )


def word_ngrams(text: Column | str, n: int) -> Column:
    """array<string> of overlapping word n-grams (space-joined token runs).

    The unit of test-set decontamination and repetition analysis: built
    from ``tokens()`` so the tokenization convention is shared with
    ``token_count``. Documents shorter than n tokens yield one (short)
    gram — both engines of the oracle pair apply the same rule. Pure
    higher-order array expressions: narrow map, no UDF, no shuffle.

    The token array is LET-BOUND through a single-element-array
    ``transform`` before the per-gram lambda: expressions referenced
    inside an array lambda re-evaluate per element (the CSE boundary
    :func:`normalize_ws` documents), so the naive form re-ran the
    tokenize regex once per GRAM — measured 10x on the whole gram stage
    of ``shared_span_pairs`` at sf1 (27.7 s -> 2.7 s, tools/span_profile
    .py). Binding ``tokens()`` to a lambda variable evaluates it once
    per document; the inner lambda then references a variable, not an
    expression tree. Result-identical, including NULL propagation."""
    toks = tokens(text)
    return F.element_at(
        F.transform(
            F.array(toks),
            lambda tk: F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size(tk) - F.lit(n - 1), F.lit(1)),
                ),
                lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
            ),
        ),
        1,
    )


def md5_bucket(key: Column | str, salt: str) -> Column:
    """First 8 hex chars of md5(key || '-' || salt) — a deterministic,
    engine-portable uniform hash in ['00000000','ffffffff'].

    Used for stratified sampling and shard assignment where the SAME
    decision must reproduce on any engine (the DuckDB oracle compares
    lexicographically on the identical hex string, so no integer-width
    or hash-seed divergence is possible). Unlike xxhash64, md5 is
    seed-free and bit-identical everywhere."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(c.cast("string"), F.lit("-" + salt))), 1, 8)


def rate_to_hex_threshold(rate: float) -> str:
    """Map a sampling rate in [0,1] to the md5_bucket hex threshold such
    that P(md5_bucket(k) < threshold) == rate for uniform hashes."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    scaled = int(rate * 0x100000000)
    # "g" sorts after every hex digit, making rate=1.0 keep everything.
    return "g" if scaled >= 0x100000000 else format(scaled, "08x")


# --------------------------------------------------------------------------- #
# PII redaction (SURVEY.md §2.C text analysis — training-corpus scrubbing)
# --------------------------------------------------------------------------- #

# Patterns restricted to syntax Java regex and RE2 (the DuckDB oracle
# engine) interpret identically: character classes, bounded repetition,
# non-capturing groups, \b word boundaries — no lookaround, no backrefs.
# Order matters (applied sequentially, same order in both engines): email
# before phone so user@123-456-7890.com never half-matches as a phone.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"(?:\+?\d{1,2}[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_pii(text: Column | str) -> Column:
    """Replace emails / SSNs / phone numbers / IPv4 addresses with typed
    placeholder tokens. Pure JVM regexp_replace chain — codegen, no UDF,
    order-deterministic, scan-speed at 100 TB (narrow map, no shuffle)."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(text: Column | str) -> dict[str, Column]:
    """{kind: count-of-matches} columns for auditing what redaction hit."""
    c = F.col(text) if isinstance(text, str) else text
    return {kind: F.regexp_count(c, F.lit(pat)) for kind, pat, _ in PII_PATTERNS}

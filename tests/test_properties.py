"""Property-based tests (hypothesis): randomized inputs against naive
reference implementations for the operators whose edge cases are easy to
miss with fixture data alone (SURVEY.md §5 — the reference repo has no
tests at all; property coverage is part of this rebuild's test ladder).

Spark jobs are slow per-example, so each property runs a small number of
generated cases with deliberately gnarly shapes (ties, empty sides,
single-key skew) rather than hypothesis' default 100."""

from __future__ import annotations

import bisect

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from icerunner_spark.operators.asof import asof_join
from icerunner_spark.operators.dedup import minhash_signatures

_key = st.integers(min_value=0, max_value=2)
_time = st.integers(min_value=0, max_value=50)
_val = st.integers(min_value=-100, max_value=100)

_left_rows = st.lists(st.tuples(_key, _time), min_size=0, max_size=15)
# right side unique per (key, time): build via dict
_right_rows = st.dictionaries(
    st.tuples(_key, _time), _val, min_size=0, max_size=15
).map(lambda d: [(k, t, v) for (k, t), v in sorted(d.items())])


def _naive_asof(left, right, direction):
    by_key = {}
    for k, t, v in right:
        by_key.setdefault(k, []).append((t, v))
    for k in by_key:
        by_key[k].sort()
    out = []
    for k, t in left:
        rs = by_key.get(k, [])
        times = [x[0] for x in rs]
        if direction == "backward":
            i = bisect.bisect_right(times, t) - 1
            out.append((k, t, rs[i][1] if i >= 0 else None))
        else:
            i = bisect.bisect_left(times, t)
            out.append((k, t, rs[i][1] if i < len(rs) else None))
    return sorted(out, key=lambda r: (r[0], r[1], r[2] is None, r[2]))


class TestAsofProperty:
    @settings(max_examples=12, deadline=None)
    @given(left=_left_rows, right=_right_rows, direction=st.sampled_from(["backward", "forward"]))
    def test_asof_matches_naive(self, spark, left, right, direction):
        ldf = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left)], "k long, t long, rowid long"
        )
        rdf = spark.createDataFrame(right, "k long, t long, v long")
        if not left:
            ldf = spark.createDataFrame([], "k long, t long, rowid long")
        if not right:
            rdf = spark.createDataFrame([], "k long, t long, v long")
        got = asof_join(
            ldf,
            rdf,
            left_on="k",
            right_on="k",
            left_time="t",
            right_time="t",
            right_values=["v"],
            direction=direction,
        )
        got_rows = sorted(
            ((r["k"], r["t"], r["v"]) for r in got.collect()),
            key=lambda r: (r[0], r[1], r[2] is None, r[2]),
        )
        assert got_rows == _naive_asof(left, right, direction)


_doc = st.text(alphabet="abcdef ", min_size=0, max_size=40)


class TestMinhashProperty:
    @settings(max_examples=6, deadline=None)
    @given(docs=st.lists(_doc, min_size=1, max_size=6, unique=True))
    def test_identical_docs_identical_signatures(self, spark, docs):
        """Signature is a pure function of text: duplicating any doc under
        a new id must reproduce its signature exactly; and signatures are
        permutation-mins, so each element is <= any single shingle hash."""
        rows = [(i, d) for i, d in enumerate(docs)] + [
            (1000 + i, d) for i, d in enumerate(docs)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sigs = {
            r["id"]: tuple(r["sig"])
            for r in minhash_signatures(df, "doc_id", "text", n_hashes=8).collect()
        }
        for i in range(len(docs)):
            orig, dup = sigs.get(i), sigs.get(1000 + i)
            assert orig == dup, f"doc {i}: signature not text-deterministic"


# --------------------------------------------------------------------------- #
# Connected components vs a union-find oracle; packing invariants
# --------------------------------------------------------------------------- #

_edges = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # always attach the larger root under the smaller, so every
            # component's root IS its minimum node id
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in list(parent)}


class TestConnectedComponentsProperties:
    @settings(max_examples=8, deadline=None)
    @given(edges=_edges)
    def test_matches_union_find(self, spark, edges):
        from icerunner_spark.operators.corpus import connected_components

        expected = _union_find_components(edges)
        pairs = spark.createDataFrame(edges, ["id1", "id2"])
        got = {
            r["node"]: r["component"]
            for r in connected_components(pairs, max_iter=40).collect()
        }
        assert got == expected

    @settings(max_examples=8, deadline=None)
    @given(edges=_edges)
    def test_two_phase_matches_union_find(self, spark, edges):
        from icerunner_spark.operators.corpus import connected_components

        expected = _union_find_components(edges)
        pairs = spark.createDataFrame(edges, ["id1", "id2"])
        got = {
            r["node"]: r["component"]
            for r in connected_components(
                pairs, max_iter=12, algorithm="two-phase"
            ).collect()
        }
        assert got == expected


_token_rows = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(1, 200)),
    min_size=1,
    max_size=40,
    unique_by=lambda r: r[0],
)


class TestPackingProperties:
    @settings(max_examples=10, deadline=None)
    @given(rows=_token_rows)
    def test_packing_invariants(self, spark, rows):
        from icerunner_spark.operators.packing import pack_sequences

        docs = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
        out = pack_sequences(docs, "doc_id", "n_tokens", budget=128, n_buckets=3).collect()
        # every doc exactly once, token counts preserved
        assert sorted(r["doc_id"] for r in out) == sorted(r[0] for r in rows)
        assert {r["doc_id"]: r["n_tokens"] for r in out} == dict(rows)
        # budget respected except single oversized docs; offsets are a
        # contiguous nonoverlapping layout within each sequence
        by_seq: dict[tuple, list] = {}
        for r in out:
            by_seq.setdefault((r["bucket"], r["seq_id"]), []).append(r)
        for members in by_seq.values():
            total = sum(m["n_tokens"] for m in members)
            if total > 128:
                assert len(members) == 1 and members[0]["n_tokens"] > 128
            spans = sorted((m["offset"], m["offset"] + m["n_tokens"]) for m in members)
            pos = 0
            for lo, hi in spans:
                assert lo == pos
                pos = hi

"""Generate sf1 scale-probe fixtures from the driver's sf0.1 testdata.

The container's /root/testdata is read-only and capped at sf0.1; every
100-TB scaling claim in SCALE.md was extrapolated from sf0.1 until the
r6 verdict demanded a measured probe (item 1, carried from r5). This
script materializes a 10x corpus at .scale/sf1/ (gitignored, ~170 MB)
as TEN KEY-SHIFTED COPIES of sf0.1 with structure-preserving per-copy
transforms, so every workload's *scaling shape* is exactly linear by
construction and a measured exponent > 1 indicts the PLAN, not the data:

- region/nation: fixed-size dims, copied once (TPC-H semantics).
- customer/supplier/part/orders/lineitem: copy c shifts every key by
  c * (domain size): o_orderkey/l_orderkey by 150k, c_custkey/o_custkey
  by 15k, p_partkey/l_partkey by 20k, s_suppkey/l_suppkey by 1k.
  Referential integrity holds within each copy; value columns
  (prices, dates, flags) are untouched so per-key distributions match.
- events: event_id by 100k, user_id by 1.5k; timestamps untouched (same
  time window, 10x density — how a busier stream actually looks).
- documents: doc_id by 5k; copy c > 0 remaps each word through a
  rotation of the corpus vocabulary (word[i] -> word[(i + 131*c) % V]).
  The remap is a bijection per copy: WITHIN-copy duplicate/near-dup/
  shared-span structure is preserved exactly, while CROSS-copy n-gram
  identity is destroyed — so dedup pair counts scale exactly 10x and
  never quadratically in the copy count. n_chars is recomputed (remap
  changes word lengths); lang/source are untouched.
- embeddings: vec_id by 2k; copy c > 0 multiplies the vector by a
  c-seeded deterministic sign pattern (a reflection: norms and
  within-copy geometry exact, cross-copy cosine scrambled), so no
  vector has 9 exact clones and ANN/kNN workloads scale honestly.

Deterministic (no RNG beyond seeded numpy), idempotent, pure
pyarrow/numpy — no Spark session needed.

Usage: python tools/make_scale_fixtures.py [--copies 10] [--out .scale/sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> {column: key-domain size} (shift = copy * size)
KEY_SHIFTS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
FIXED = ["region", "nation"]


def _shift_keys(t: pa.Table, shifts: dict[str, int], copy: int) -> pa.Table:
    for col, size in shifts.items():
        idx = t.schema.get_field_index(col)
        shifted = pc.add(t.column(col), pa.scalar(copy * size, t.schema.field(col).type))
        t = t.set_column(idx, t.schema.field(col), shifted)
    return t


def _char_rotation_table(copy: int) -> dict[int, int]:
    """Per-copy bijective character map, rotating WITHIN each tokenizer
    character class so token boundaries, token lengths, and regex class
    membership ([a-z]+ / [0-9]+ / CJK-single-char) are preserved
    exactly: lowercase and uppercase Caesar-rotate by 7*copy, digits by
    copy, CJK Unified Ideographs rotate within their block by 131*copy.
    Punctuation and whitespace are fixed points (structure carriers)."""
    rot = {}
    # step = 1 + (stride*copy) % (n-1) is provably nonzero mod n for
    # EVERY copy >= 1 (it lands in [1, n-1]) — a plain stride*copy % n
    # hits the identity at copy = n/gcd(stride, n) (digits: copy 10,
    # present in the sf2 fixture), silently re-opening cross-copy
    # shingle identity for pure-numeric grams
    for base, n, stride in ((97, 26, 7), (65, 26, 7), (48, 10, 7)):
        k = 0 if copy == 0 else 1 + (stride * copy) % (n - 1)
        for i in range(n):
            rot[base + i] = base + (i + k) % n
    cjk0, cjkn = 0x4E00, 0x9FFF - 0x4E00 + 1
    step = 0 if copy == 0 else 1 + (131 * copy) % (cjkn - 1)
    if step:
        for i in range(cjkn):
            rot[cjk0 + i] = cjk0 + (i + step) % cjkn
    return rot


def _remap_documents(t: pa.Table, copy: int) -> pa.Table:
    if copy == 0:
        return t
    texts = t.column("text").to_pylist()
    vocab = sorted({w for s in texts for w in s.split(" ")})
    pos = {w: i for i, w in enumerate(vocab)}
    v = len(vocab)
    rot = 131 * copy  # coprime-ish stride; bijection for any v
    # two bijections compose per copy: the word-level vocabulary
    # rotation destroys cross-copy WORD n-gram identity, and the
    # char-class rotation destroys cross-copy CHARACTER n-gram identity
    # (r10 fix: word rotation alone permutes the SAME shared vocabulary,
    # so char-shingle operators saw ~87% cross-copy LSH candidates at
    # J 0.1-0.3 — a quadratic fixture artifact the sf0.1->sf1 exponent
    # wrongly billed to the minhash plan). Both maps are bijective per
    # copy, so WITHIN-copy dup/near-dup/span structure, token lengths,
    # df multisets, and tokenizer character classes are preserved
    # exactly; only punctuation/whitespace chars (structure carriers)
    # remain cross-copy fixed points.
    ctab = _char_rotation_table(copy)
    new_texts = [
        " ".join(
            vocab[(pos[w] + rot) % v] for w in s.split(" ")
        ).translate(ctab)
        for s in texts
    ]
    t = t.set_column(
        t.schema.get_field_index("text"), t.schema.field("text"),
        pa.array(new_texts, pa.string()),
    )
    n_chars = pa.array([len(s) for s in new_texts], pa.int64())
    return t.set_column(
        t.schema.get_field_index("n_chars"), t.schema.field("n_chars"), n_chars
    )


def _flip_embeddings(t: pa.Table, copy: int) -> pa.Table:
    if copy == 0:
        return t
    col = t.column("embedding").combine_chunks()
    dim = len(col[0])
    signs = np.where(
        np.random.RandomState(1000 + copy).rand(dim) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    flat = col.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim) * signs
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(flat.ravel(), pa.float32()), dim
    ).cast(t.schema.field("embedding").type)
    return t.set_column(
        t.schema.get_field_index("embedding"), t.schema.field("embedding"), arr
    )


# Fixed boilerplate sentence for the df-skew variant (tools/skew_probe.py):
# appended AFTER the per-copy remap so it is IDENTICAL across copies and
# documents — its ~70 char-5-grams become corpus-wide hot shingles whose
# posting lists grow with N, the power-law shape the standard fixture's
# df-constant construction deliberately avoids. Short relative to a doc
# (~70 vs ~1000 grams), so sharing ONLY boilerplate keeps Jaccard far
# below any dedup threshold: it skews df without creating new pairs.
BOILERPLATE = (
    " subscribe to our newsletter for updates terms of service apply"
    " copyright all rights reserved"
)


def _inject_boilerplate(
    t: pa.Table, rate: float, *, min_len: int = 300
) -> pa.Table:
    """Append BOILERPLATE to every doc whose doc_id % round(1/rate) == 0
    AND whose text is at least ``min_len`` chars (deterministic, uniform
    across key-shifted copies); n_chars is recomputed so downstream
    length features stay consistent.

    The min_len gate keeps the skew HONEST: for a short doc the ~91
    boilerplate shingles dominate its gram set, making every pair of
    short boilerplate docs GENUINELY >= 0.25-Jaccard-similar — the
    fixture would plant a quadratic ANSWER (C(hot_docs, 2) real pairs),
    which no pair generator can emit sub-quadratically (measured: the
    first r11 probe run at sf1 filled 77 GB of shuffle spill on exactly
    those pairs). At min_len 300 the worst-case boilerplate-only
    Jaccard is 91/(2*387-91) ~ 0.13 < 0.25, and no doc's rare-gram
    count falls below its t=0.25 prefix length, so the boilerplate
    skews document frequency without changing the answer."""
    period = max(int(round(1.0 / rate)), 1)
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    new_texts = [
        s + BOILERPLATE if i % period == 0 and len(s) >= min_len else s
        for i, s in zip(ids, texts)
    ]
    t = t.set_column(
        t.schema.get_field_index("text"),
        t.schema.field("text"),
        pa.array(new_texts, t.schema.field("text").type),
    )
    idx = t.schema.get_field_index("n_chars")
    return t.set_column(
        idx,
        t.schema.field("n_chars"),
        pa.array(
            [len(s) for s in new_texts], t.schema.field("n_chars").type
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default=".scale/sf1")
    ap.add_argument(
        "--boilerplate-rate",
        type=float,
        default=0.0,
        help="fraction of documents to append the fixed boilerplate to "
        "(df-skew variant for tools/skew_probe.py; 0 = off)",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for name in FIXED:
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"), f"{args.out}/{name}.parquet"
        )
        print(f"{name}: copied")

    for name, shifts in KEY_SHIFTS.items():
        base = pq.read_table(f"{SRC}/{name}.parquet")
        parts = []
        for c in range(args.copies):
            t = _shift_keys(base, shifts, c)
            if name == "documents":
                t = _remap_documents(t, c)
                if args.boilerplate_rate > 0:
                    t = _inject_boilerplate(t, args.boilerplate_rate)
            elif name == "embeddings":
                t = _flip_embeddings(t, c)
            parts.append(t)
        out = pa.concat_tables(parts)
        # row-group size ~512k rows keeps multiple splittable groups per
        # file at sf1 so local[32] actually parallelizes the scan
        pq.write_table(
            out, f"{args.out}/{name}.parquet", row_group_size=524_288
        )
        print(f"{name}: {out.num_rows} rows")


if __name__ == "__main__":
    main()

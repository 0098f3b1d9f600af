"""Property-based MERGE INTO clause-algebra check: randomized targets,
sources and clause configurations against a naive Python model, both
write modes. The model is the ANSI/Iceberg contract:

- each target row matches at most one source row (duplicate source keys
  are rejected before this point);
- matched rows try UPDATE first (when the clause exists and its
  condition holds), then DELETE; neither firing leaves the row untouched;
- unmatched source rows INSERT when that clause's condition holds;
- conditions see the joined row (t.*/s.*); insert conditions see s.* only.

Spark jobs are slow per-example, so few examples with gnarly shapes
(empty sides, full overlap, condition flips) rather than hypothesis'
default 100."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from icerunner_spark.catalog import Catalog

_tgt_rows = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=-50, max_value=50),
    min_size=0,
    max_size=8,
).map(lambda d: sorted(d.items()))
_src_rows = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.tuples(st.integers(min_value=-50, max_value=50), st.booleans()),
    min_size=0,
    max_size=8,
).map(lambda d: sorted((k, sv, fl) for k, (sv, fl) in d.items()))

_upd_cond = st.sampled_from([None, "s.flag", "s.sval > t.val"])
_del_cond = st.sampled_from([None, "NOT s.flag"])
_ins_cond = st.sampled_from([None, "s.flag"])


def _model(tgt, src, *, update, upd_cond, delete, del_cond, insert, ins_cond):
    by_key = {k: (sv, fl) for k, sv, fl in src}

    def cond(c, t_val, sv, fl):
        if c is None:
            return True
        if c == "s.flag":
            return fl
        if c == "NOT s.flag":
            return not fl
        if c == "s.sval > t.val":
            return sv > t_val
        raise AssertionError(c)

    out = []
    for k, v in tgt:
        if k in by_key:
            sv, fl = by_key[k]
            upd_take = update and cond(upd_cond, v, sv, fl)
            del_take = (not upd_take) and delete and cond(del_cond, v, sv, fl)
            if upd_take:
                out.append((k, sv))
            elif not del_take:
                out.append((k, v))
        else:
            out.append((k, v))
    tkeys = {k for k, _ in tgt}
    if insert:
        for k, sv, fl in src:
            if k not in tkeys and cond(ins_cond, None, sv, fl):
                out.append((k, sv))
    return sorted(out)


class TestMergeIntoProperty:
    _n = 0

    @settings(max_examples=10, deadline=None)
    @given(
        tgt=_tgt_rows,
        src=_src_rows,
        update=st.booleans(),
        upd_cond=_upd_cond,
        delete=st.booleans(),
        del_cond=_del_cond,
        insert=st.booleans(),
        ins_cond=_ins_cond,
        mode=st.sampled_from(["copy-on-write", "merge-on-read"]),
    )
    def test_matches_model(
        self, spark, tmp_path_factory, tgt, src, update, upd_cond,
        delete, del_cond, insert, ins_cond, mode,
    ):
        if not update and not delete and not insert:
            return  # rejected by the API (no-op merge); nothing to model
        # "s.sval > t.val" references the target: only valid with a
        # matched clause to attach to — as a delete condition it is
        # exercised via the update's negation path instead
        cat = Catalog(spark, str(tmp_path_factory.mktemp("mi_props")))
        TestMergeIntoProperty._n += 1
        t = cat.table(f"t{TestMergeIntoProperty._n}")
        t.create(
            spark.createDataFrame(tgt or [], "id long, val long")
        )
        src_df = spark.createDataFrame(
            src or [], "id long, sval long, flag boolean"
        )
        snap = t.merge_into(
            src_df,
            ["id"],
            update={"val": "s.sval"} if update else None,
            update_condition=upd_cond,
            delete=delete,
            delete_condition=del_cond,
            insert=insert,
            insert_condition=ins_cond,
            insert_values={"val": "s.sval"},
            mode=mode,
        )
        got = sorted((r["id"], r["val"]) for r in t.scan().collect())
        want = _model(
            tgt, src, update=update, upd_cond=upd_cond, delete=delete,
            del_cond=del_cond, insert=insert, ins_cond=ins_cond,
        )
        assert got == want
        if snap is None:
            assert sorted(tgt) == want  # None contract: nothing changed

"""Every queries() entry with an oracle must hash-match DuckDB at sf0.01
(the driver's t2 gate, run locally first)."""

from __future__ import annotations

import pytest

from icerunner_spark import queries as q
from tests.oracle_harness import check_query

SF_DIR = "/root/testdata/sf0.01"

CASES = sorted(q.oracle_sql().keys())


@pytest.mark.parametrize("name", CASES)
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, q.queries()[name], q.oracle_sql()[name], SF_DIR)
    assert ok, f"{name}: {msg}"


def test_every_query_has_entry():
    # every oracle has a query; queries without oracle are the documented
    # non-SQL-expressible set
    assert set(q.oracle_sql()) <= set(q.queries())

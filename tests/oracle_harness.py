"""Local mirror of the driver's DuckDB-oracle compare (BASELINE.json t2):
run a Spark query and its oracle SQL over the same parquet fixtures,
sort columns by name, compare row multisets."""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

from icerunner_spark.sources.testdata import TABLES


def run_oracle(sql: str, sf_dir: str) -> list[dict]:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    out = con.sql(sql)
    cols = out.columns
    return [dict(zip(cols, row)) for row in out.fetchall()]


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rowkey(row: dict):
    # (is_null, typename, value) triples so None and mixed types sort stably
    out = []
    for k in sorted(row.keys()):
        v = _norm(row[k])
        out.append((v is None, type(v).__name__, v if v is not None else ""))
    return tuple(out)


def compare(spark_rows: list[dict], oracle_rows: list[dict]) -> tuple[bool, str]:
    if len(spark_rows) != len(oracle_rows):
        return False, f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    if spark_rows:
        sc, oc = sorted(spark_rows[0].keys()), sorted(oracle_rows[0].keys())
        if sc != oc:
            return False, f"columns differ: spark={sc} oracle={oc}"
    s = sorted(_rowkey(r) for r in spark_rows)
    o = sorted(_rowkey(r) for r in oracle_rows)
    for i, (a, b) in enumerate(zip(s, o)):
        if a != b:
            return False, f"first mismatch at sorted row {i}: spark={a} oracle={b}"
    return True, "ok"


def check_query(spark, name: str, query_fn, oracle: str, sf_dir: str) -> tuple[bool, str]:
    sdf = query_fn(spark, sf_dir)
    spark_rows = [r.asDict(recursive=True) for r in sdf.collect()]
    oracle_rows = run_oracle(oracle, sf_dir)
    return compare(spark_rows, oracle_rows)

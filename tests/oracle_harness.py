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
    rows, _types = run_oracle_typed(sql, sf_dir)
    return rows


def run_oracle_typed(sql: str, sf_dir: str) -> tuple[list[dict], dict[str, str]]:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    out = con.sql(sql)
    cols = out.columns
    types = {c: _duck_type(str(t)) for c, t in zip(cols, out.types)}
    return [dict(zip(cols, row)) for row in out.fetchall()], types


# ---- type-strict schema compare ------------------------------------------- #
# The driver's value hash is type-sensitive (round-2 lesson: DuckDB widens
# uncast integer SUMs to HUGEINT/int128, Spark stays BIGINT; Spark decimal
# vs oracle DOUBLE — both hash-fail with identical values). Python fetchall
# erases those widths, so strictness has to come from the COLUMN TYPES.

def _duck_type(name: str) -> str:
    n = name.upper()
    if n.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    if n.startswith("DECIMAL"):
        return n.replace(" ", "")
    # int widths <=64 hash identically at the driver (r2 evidence:
    # higher_order_array_ops passed with Spark int32 vs DuckDB int64);
    # HUGEINT (int128) does NOT — keep it distinct.
    if n in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT"
    return n


_SPARK_TO_ORACLE = {
    "long": "INT",
    "bigint": "INT",
    "int": "INT",
    "integer": "INT",
    "short": "INT",
    "tinyint": "INT",
    "byte": "INT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "date": "DATE",
    "boolean": "BOOLEAN",
    "binary": "BLOB",
}


def _spark_type(dt) -> str:
    s = dt.simpleString()
    if s.startswith("timestamp"):
        return "TIMESTAMP"
    if s.startswith("decimal"):
        return s.upper().replace(" ", "")
    if s.startswith("array<"):
        return _spark_type(dt.elementType) + "[]"
    return _SPARK_TO_ORACLE.get(s, s.upper())


def compare_types(spark_schema, oracle_types: dict[str, str]) -> tuple[bool, str]:
    spark_types = {f.name: _spark_type(f.dataType) for f in spark_schema.fields}
    for col in sorted(set(spark_types) | set(oracle_types)):
        a, b = spark_types.get(col), oracle_types.get(col)
        if a != b:
            return False, f"type mismatch on '{col}': spark={a} oracle={b}"
    return True, "ok"


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
    oracle_rows, oracle_types = run_oracle_typed(oracle, sf_dir)
    ok, msg = compare_types(sdf.schema, oracle_types)
    if not ok:
        return ok, msg
    return compare(spark_rows, oracle_rows)

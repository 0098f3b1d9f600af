"""Apache Iceberg v2 metadata export / import for snapshot tables.

The reference stores real Iceberg tables any engine can read (PyIceberg
catalog, icerunner.py:60-66; DuckDB ``iceberg_scan`` views,
icerunner.py:90-103). :class:`icerunner_spark.table.IceTable` has
near-complete semantic parity (snapshots, MOR deletes, hidden
partitioning, branches, row lineage, manifest stats) but its metadata
is a bespoke JSON format no other engine reads. This module closes that
gap from the PUBLIC Iceberg v2 table spec: ``export_iceberg`` emits a
spec-conformant metadata tree — ``vN.metadata.json``, Avro
manifest-list and manifest files (:mod:`icerunner_spark.iceavro`),
hard-linked data files — and ``read_iceberg`` is the import direction:
a generic Spark reader for static Iceberg tables (current snapshot or
time travel), applying positional AND equality deletes by the spec's
sequence-number rules (<= for positional, strictly-less for equality —
so foreign Flink-CDC-shaped tables read correctly even though our own
exporter never emits equality deletes). Neither direction needs
PyIceberg, fastavro, or an
iceberg-spark-runtime jar (none are installable in this container —
SCALE.md §7 records the attempted DuckDB ``iceberg`` extension load).

Fidelity notes (all spec-driven, none lossy for correctness):

- **Transforms.** identity / truncate / year / month / day / hour map
  1:1 — the hive path values convert exactly to Iceberg's epoch-based
  partition values ("2024-03" -> 650 months, etc). Our ``bucket``
  transform hashes with Spark's xxhash64, NOT Iceberg's murmur3, so a
  foreign engine pruning ``bucket[N]`` on our dir numbers would skip
  the wrong files; those spec fields export as ``void`` (always-null —
  Iceberg's retired-field transform), trading partition pruning for
  correctness. Per-file column bounds still export, so stats-based file
  skipping survives.
- **Renames.** Our parquet files carry no field-id metadata (plain
  Spark writes), so the export stamps the spec's
  ``schema.name-mapping.default`` property mapping every physical
  column name a field id was ever written under — the standard
  mechanism for files lacking ids (imported hive tables use it). A
  physical name claimed by two different ids (drop + re-add, then
  re-use) cannot be expressed in one global mapping: export refuses
  with the remediation (compact() rewrites under current names).
- **Refusals.** v3 ``initial-default`` field defaults cannot round-trip
  through v2 metadata: snapshots carrying them are skipped from the
  exported history, and if the CURRENT snapshot does, export raises
  with the remediation (``compact()`` materializes them).
- **Deletes.** Positional delete parquet files are rewritten (their
  ``file_path`` column must name the exported URIs) with the spec's
  reserved field ids 2147483546/2147483545 stamped in the parquet
  schema. Equality deletes export too (r9): each key file's
  rename-proof ``__eq_<fid>`` columns are rewritten to logical names
  with their field ids stamped, and delete manifests carry
  ``content=2`` entries with ``equality_ids`` — the import side applies
  the spec's strictly-less sequence rule, so a key re-inserted after
  the delete survives the round trip. Data files hard-link unchanged.
- **Manifests.** One manifest per (commit dir, live-file subset),
  REUSED across every snapshot that contains it — Iceberg's
  manifest-list indirection, so the export is O(total files + commits),
  not O(files x snapshots). Entries carry explicit sequence numbers
  (no inheritance needed by readers).
- **Incremental re-export.** Exporting again to the SAME dest is
  O(delta): the previous tree's manifests seed the reuse cache (rebuilt
  from their own Avro contents), already-linked data files are skipped,
  the table-uuid is preserved, and a fresh ``v{N+1}.metadata.json``
  lands with the previous file appended to ``metadata-log`` — the spec's
  own metadata-history mechanism, making the exporter usable as a
  CONTINUOUS Iceberg mirror off the commit stream, not a one-shot dump.
  (After ``expire_snapshots`` removed history, start a fresh dest: stale
  manifests are guarded per-entry but spec renumbering is not worth
  reconciling against an expired tree.)
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import shutil
import struct
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from icerunner_spark import iceavro
from icerunner_spark.table import (
    IceTable,
    Snapshot,
    _bounds_may_match,
    _commit_dir_of,
    _hive_partition_values,
    _is_nan,
    _normalize_predicates,
    _parse_spec,
    _predicates_to_column,
)

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)
# Iceberg reserved field ids for position-delete file columns
_PATH_FID = 2147483546
_POS_FID = 2147483545


# --------------------------------------------------------------------------- #
# type mapping: Spark schema -> Iceberg schema JSON
# --------------------------------------------------------------------------- #


def _ice_type(dt, alloc) -> object:
    """Spark DataType -> Iceberg type JSON. ``alloc`` is a mutable
    one-element id counter for nested element/key/value/field ids."""
    t = dt.typeName()
    prim = {
        "boolean": "boolean",
        "integer": "int",
        "short": "int",
        "byte": "int",
        "long": "long",
        "float": "float",
        "double": "double",
        "string": "string",
        "binary": "binary",
        "date": "date",
        "timestamp": "timestamptz",
        "timestamp_ntz": "timestamp",
    }
    if t in prim:
        return prim[t]
    if t == "decimal":
        return f"decimal({dt.precision}, {dt.scale})"
    if t == "array":
        eid = alloc[0]
        alloc[0] += 1
        return {
            "type": "list",
            "element-id": eid,
            "element": _ice_type(dt.elementType, alloc),
            "element-required": not dt.containsNull,
        }
    if t == "map":
        kid, vid = alloc[0], alloc[0] + 1
        alloc[0] += 2
        return {
            "type": "map",
            "key-id": kid,
            "key": _ice_type(dt.keyType, alloc),
            "value-id": vid,
            "value": _ice_type(dt.valueType, alloc),
            "value-required": not dt.valueContainsNull,
        }
    if t == "struct":
        fields = []
        for f in dt.fields:
            fid = alloc[0]
            alloc[0] += 1
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _ice_type(f.dataType, alloc),
                }
            )
        return {"type": "struct", "fields": fields}
    raise ValueError(f"cannot export Spark type {t!r} to Iceberg")


def _spark_type(ice) -> str:
    """Iceberg type JSON -> Spark DDL string (import direction)."""
    if isinstance(ice, str):
        prim = {
            "boolean": "boolean",
            "int": "int",
            "long": "bigint",
            "float": "float",
            "double": "double",
            "string": "string",
            "binary": "binary",
            "date": "date",
            "timestamptz": "timestamp",
            "timestamp": "timestamp_ntz",
            "uuid": "string",
        }
        if ice in prim:
            return prim[ice]
        if ice.startswith("decimal"):
            return ice.replace(" ", "")
        if ice.startswith("fixed"):
            return "binary"
        raise ValueError(f"cannot import Iceberg type {ice!r}")
    t = ice["type"]
    if t == "list":
        return f"array<{_spark_type(ice['element'])}>"
    if t == "map":
        return f"map<{_spark_type(ice['key'])},{_spark_type(ice['value'])}>"
    if t == "struct":
        inner = ",".join(
            f"`{f['name']}`:{_spark_type(f['type'])}" for f in ice["fields"]
        )
        return f"struct<{inner}>"
    raise ValueError(f"cannot import Iceberg type {ice!r}")


# --------------------------------------------------------------------------- #
# partition transforms and values
# --------------------------------------------------------------------------- #


def _transform_name(sf) -> str:
    if sf.transform == "identity":
        return "identity"
    if sf.transform == "truncate":
        return f"truncate[{sf.param}]"
    if sf.transform == "bucket":
        # xxhash64 buckets are NOT Iceberg murmur3 buckets: exporting the
        # true transform would make foreign engines prune wrongly. void
        # (always null) keeps results correct; bounds still skip files.
        return "void"
    return sf.transform  # year | month | day | hour


def _partition_avro_type(sf, src_type):
    """Avro schema node for one partition field's value."""
    if sf.transform == "bucket":
        return "int"  # void: value is always null
    if sf.transform in ("year", "month", "hour"):
        return "int"
    if sf.transform == "day":
        return {"type": "int", "logicalType": "date"}
    t = src_type.typeName()
    if sf.transform == "truncate":
        return "string" if t == "string" else ("long" if t == "long" else "int")
    # identity
    m = {
        "integer": "int",
        "short": "int",
        "byte": "int",
        "long": "long",
        "string": "string",
        "boolean": "boolean",
        "float": "float",
        "double": "double",
        "date": {"type": "int", "logicalType": "date"},
    }
    if t not in m:
        raise ValueError(
            f"cannot export identity partition on {t!r} column {sf.source!r}"
        )
    return m[t]


def _partition_value(sf, raw: str | None, src_type):
    """Hive path value string -> Iceberg typed partition value."""
    if raw is None or sf.transform == "bucket":
        return None
    if sf.transform == "year":
        return int(raw) - 1970
    if sf.transform == "month":
        y, m = raw.split("-")
        return (int(y) - 1970) * 12 + int(m) - 1
    if sf.transform == "day":
        return (datetime.date.fromisoformat(raw) - _EPOCH_DATE).days
    if sf.transform == "hour":
        dt = datetime.datetime.strptime(raw, "%Y-%m-%d-%H")
        return int((dt - _EPOCH_DT).total_seconds() // 3600)
    t = src_type.typeName()
    if sf.transform == "truncate":
        return raw if t == "string" else int(raw)
    if t in ("integer", "long", "short", "byte"):
        return int(raw)
    if t == "boolean":
        return raw == "true"
    if t in ("float", "double"):
        return float(raw)
    if t == "date":
        return (datetime.date.fromisoformat(raw) - _EPOCH_DATE).days
    return raw  # string


# --------------------------------------------------------------------------- #
# single-value binary serialization (bounds)
# --------------------------------------------------------------------------- #


def _partition_bound_bytes(sf, src_type, v) -> bytes | None:
    """Iceberg single-value bytes for one PARTITION value (already in
    its Iceberg representation: epoch-based ints for temporal
    transforms, typed scalars for identity/truncate)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return b"\x01" if v else b"\x00"
    if isinstance(v, int):
        # identity/truncate on a long source keeps 8 bytes; every other
        # int-valued transform result is a 4-byte int per the spec
        wide = sf.transform in ("identity", "truncate") and (
            src_type.typeName() == "long"
        )
        return struct.pack("<q" if wide else "<i", v)
    if isinstance(v, float):
        narrow = sf.transform in ("identity", "truncate") and (
            src_type.typeName() == "float"
        )
        return struct.pack("<f" if narrow else "<d", v)
    if isinstance(v, str):
        return v.encode("utf-8")
    return None


def _bound_bytes(dtype, v) -> bytes | None:
    """JSON-native manifest bound -> Iceberg single-value binary."""
    if v is None:
        return None
    t = dtype.typeName()
    try:
        if t in ("integer", "short", "byte"):
            return struct.pack("<i", int(v))
        if t == "long":
            return struct.pack("<q", int(v))
        if t == "float":
            return struct.pack("<f", float(v))
        if t == "double":
            return struct.pack("<d", float(v))
        if t == "boolean":
            return b"\x01" if v else b"\x00"
        if t == "string":
            return str(v).encode("utf-8")
        if t == "date":
            d = (
                v
                if isinstance(v, datetime.date)
                else datetime.date.fromisoformat(str(v))
            )
            return struct.pack("<i", (d - _EPOCH_DATE).days)
        if t in ("timestamp", "timestamp_ntz"):
            dt = (
                v
                if isinstance(v, datetime.datetime)
                else datetime.datetime.fromisoformat(str(v))
            )
            if dt.tzinfo is not None:
                dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            return struct.pack(
                "<q", int((dt - _EPOCH_DT).total_seconds() * 1_000_000)
            )
        if t == "decimal":
            unscaled = int(
                decimal.Decimal(str(v)).scaleb(dtype.scale).to_integral_value()
            )
            n = max(1, (unscaled.bit_length() + 8) // 8)
            return unscaled.to_bytes(n, "big", signed=True)
    except (ValueError, OverflowError, struct.error):
        return None
    return None


# --------------------------------------------------------------------------- #
# manifest Avro schemas (Iceberg v2 manifest-entry / manifest-file)
# --------------------------------------------------------------------------- #


def _kv_array(name: str, kid: int, vid: int, vtype) -> dict:
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": kid},
                {"name": "value", "type": vtype, "field-id": vid},
            ],
        },
    }


def _opt(t) -> list:
    return ["null", t]


def _manifest_entry_schema(partition_fields: list[dict]) -> dict:
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                "name": "partition",
                "type": {
                    "type": "record",
                    "name": "r102",
                    "fields": partition_fields,
                },
                "field-id": 102,
            },
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {
                "name": "null_value_counts",
                "type": _opt(_kv_array("k121_v122", 121, 122, "long")),
                "default": None,
                "field-id": 110,
            },
            {
                "name": "lower_bounds",
                "type": _opt(_kv_array("k126_v127", 126, 127, "bytes")),
                "default": None,
                "field-id": 125,
            },
            {
                "name": "upper_bounds",
                "type": _opt(_kv_array("k129_v130", 129, 130, "bytes")),
                "default": None,
                "field-id": 128,
            },
            {
                "name": "equality_ids",
                "type": _opt({"type": "array", "items": "int"}),
                "default": None,
                "field-id": 135,
            },
            {
                "name": "sort_order_id",
                "type": _opt("int"),
                "default": None,
                "field-id": 140,
            },
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {
                "name": "snapshot_id",
                "type": _opt("long"),
                "default": None,
                "field-id": 1,
            },
            {
                "name": "sequence_number",
                "type": _opt("long"),
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": _opt("long"),
                "default": None,
                "field-id": 4,
            },
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {
            "name": "partitions",
            "type": _opt(
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {
                                "name": "contains_null",
                                "type": "boolean",
                                "field-id": 509,
                            },
                            {
                                "name": "contains_nan",
                                "type": _opt("boolean"),
                                "default": None,
                                "field-id": 518,
                            },
                            {
                                "name": "lower_bound",
                                "type": _opt("bytes"),
                                "default": None,
                                "field-id": 510,
                            },
                            {
                                "name": "upper_bound",
                                "type": _opt("bytes"),
                                "default": None,
                                "field-id": 511,
                            },
                        ],
                    },
                }
            ),
            "default": None,
            "field-id": 507,
        },
    ],
}


# --------------------------------------------------------------------------- #
# export
# --------------------------------------------------------------------------- #


def _summary_to_json(s: dict) -> dict:
    """manifest_file partition summary -> JSON-safe dict (bounds b64)."""
    import base64

    return {
        "contains_null": s["contains_null"],
        "contains_nan": s.get("contains_nan", False),
        "lower_bound": base64.b64encode(s["lower_bound"]).decode("ascii")
        if s.get("lower_bound") is not None
        else None,
        "upper_bound": base64.b64encode(s["upper_bound"]).decode("ascii")
        if s.get("upper_bound") is not None
        else None,
    }


def _summary_from_json(s: dict) -> dict:
    import base64

    return {
        "contains_null": s["contains_null"],
        "contains_nan": s.get("contains_nan", False),
        "lower_bound": base64.b64decode(s["lower_bound"])
        if s.get("lower_bound") is not None
        else None,
        "upper_bound": base64.b64decode(s["upper_bound"])
        if s.get("upper_bound") is not None
        else None,
    }


def _uri(path: str) -> str:
    return "file://" + os.path.abspath(path)


def _link_or_copy(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


class IcebergExporter:
    """One export run: builds the dest tree, reusing manifests across
    snapshots. Instantiate fresh per call (export_iceberg does)."""

    def __init__(self, table: IceTable, dest: str, *, avro_codec: str = "null"):
        self.table = table
        self.dest = os.path.abspath(dest)
        self.avro_codec = avro_codec
        self.meta_dir = os.path.join(self.dest, "metadata")
        self._manifest_cache: dict = {}
        self._manifest_n = 0
        self._linked: set = set()
        # name -> dataType across ALL exported snapshots (newest wins):
        # historical partition specs may reference columns since dropped
        # or renamed out of the current schema
        self._hist_types: dict = {}
        # file stats merged across exported snapshots (immutable per
        # file): bounds survive for files later removed from the table
        self._all_stats: dict = {}

    # -- guards --------------------------------------------------------- #

    def _exportable(self) -> list[Snapshot]:
        snaps = self.table.snapshots()
        if not snaps:
            from icerunner_spark.table import NoSuchTableError

            raise NoSuchTableError(self.table.path)
        cur = snaps[-1]
        if cur.field_defaults:
            raise ValueError(
                "cannot export v3 initial-default field defaults through "
                "v2 metadata: run compact() to materialize them first"
            )
        return [s for s in snaps if not s.field_defaults]

    # -- schemas -------------------------------------------------------- #

    def _build_schemas(self, snaps: list[Snapshot]) -> tuple[list, dict, int]:
        top_max = max(
            max(s.field_ids.values(), default=0) for s in snaps
        )
        alloc = [max(top_max, max(s.next_field_id - 1 for s in snaps)) + 1]
        schemas: list = []
        index: dict = {}
        for s in snaps:
            key = (s.schema_json, tuple(sorted(s.field_ids.items())))
            if key in index:
                continue
            st = StructType.fromJson(json.loads(s.schema_json))
            fields = []
            for f in st.fields:
                fields.append(
                    {
                        "id": int(s.field_ids[f.name]),
                        "name": f.name,
                        "required": False,
                        "type": _ice_type(f.dataType, alloc),
                    }
                )
            sid = len(schemas)
            schemas.append(
                {"type": "struct", "schema-id": sid, "fields": fields}
            )
            index[key] = sid
        return schemas, index, alloc[0] - 1

    # -- partition specs ------------------------------------------------ #

    def _build_specs(self, snaps: list[Snapshot]) -> tuple[list, dict, int]:
        """Collect every distinct write-spec across history -> Iceberg
        partition-specs with ids; field-ids start at 1000 (the spec's
        convention), one per distinct (source, transform).

        Spec 0 is ALWAYS the unpartitioned spec (delete manifests ride
        it); the rest take first-discovery order over the append-only
        snapshot history, so spec-id assignment is stable across
        incremental re-exports (the previous conditional insert
        renumbered every id once a natural unpartitioned spec appeared,
        leaving logged metadata pointing at manifests whose stamped
        spec-ids no longer resolved)."""
        raw: list = [[]]
        seen: set = {json.dumps([])}
        for s in snaps:
            for spec in [s.partition_spec, *s.dir_specs.values()]:
                key = json.dumps(list(spec or []))
                if key not in seen:
                    seen.add(key)
                    raw.append(list(spec or []))
        cur = snaps[-1]
        cur_ids = cur.field_ids
        pfid: dict = {}
        next_pfid = 1000
        specs: list = []
        index: dict = {}
        for i, sp in enumerate(raw):
            fields = []
            for sf in _parse_spec(sp):
                k = (sf.source, sf.transform, sf.param)
                if k not in pfid:
                    pfid[k] = next_pfid
                    next_pfid += 1
                src_id = cur_ids.get(sf.source)
                if src_id is None:
                    # dropped source column: find its retired id in
                    # history and export the field as void
                    for old in reversed(snaps):
                        if sf.source in old.field_ids:
                            src_id = old.field_ids[sf.source]
                            break
                    else:
                        src_id = 0
                fields.append(
                    {
                        "name": sf.pname,
                        "transform": _transform_name(sf)
                        if src_id
                        else "void",
                        "source-id": int(src_id),
                        "field-id": pfid[k],
                    }
                )
            specs.append({"spec-id": i, "fields": fields})
            index[json.dumps(sp)] = i
        return specs, index, next_pfid - 1

    # -- manifests ------------------------------------------------------ #

    def _attribute_files(self, snaps: list[Snapshot]) -> dict:
        """file relpath -> (snapshot_id, sequence) of the first exported
        snapshot containing it (data files and delete files alike)."""
        attr: dict = {}
        for s in snaps:
            self._all_stats.update(
                {f: st for f, st in s.file_stats.items() if f not in self._all_stats}
            )
            for rel in list(s.manifest) + list(s.delete_files):
                if rel not in attr:
                    attr[rel] = (s.snapshot_id, s.sequence)
            # equality deletes carry their OWN applicability sequence
            # (entry[2], the committing snapshot's sequence — the spec's
            # strictly-less rule keys off it, so it must be exported
            # verbatim even when the committing snapshot was expired)
            for paths, _fids, seq in s.eq_delete_files:
                for rel in paths:
                    if rel not in attr:
                        attr[rel] = (s.snapshot_id, int(seq))
        return attr

    def _write_manifest(
        self,
        kind: int,  # 0 = data, 1 = positional deletes, 2 = eq deletes
        commit_dir: str,
        files: list[str],
        spec_list: list,
        spec_id: int,
        attr: dict,
        cur: Snapshot,
        schema_json_for_meta: str,
        schema_id: int,
        spec_fields_json: str,
        eq_ids: dict | None = None,  # rel -> tuple of key field ids
    ) -> dict:
        """Write (or reuse) one manifest Avro; returns its manifest_file
        entry for manifest lists."""
        key = (kind, commit_dir, tuple(sorted(files)))
        cached = self._manifest_cache.get(key)
        if cached is not None and cached["partition_spec_id"] == spec_id:
            return cached
        # spec-id drift against a seeded (previous-export) entry:
        # rewrite rather than reuse a manifest stamped with a stale id
        spec_parsed = _parse_spec(spec_list) if kind == 0 else []
        st = StructType.fromJson(json.loads(cur.schema_json))
        types = {f.name: f.dataType for f in st.fields}
        # a historical dir's spec may reference a column later dropped or
        # renamed out of the CURRENT schema — resolve its write-time type
        # from snapshot history (_hist_types, populated by run()); a
        # source absent from history too is exported as an always-null
        # void field (matching _build_specs' transform for src_id 0)
        src_types = [
            types.get(sf.source, self._hist_types.get(sf.source))
            for sf in spec_parsed
        ]
        pfields = []
        for sf, src_t in zip(spec_parsed, src_types):
            pfields.append(
                {
                    "name": sf.pname,
                    "type": _opt(
                        _partition_avro_type(sf, src_t)
                        if src_t is not None
                        else "string"
                    ),
                    "default": None,
                }
            )
        schema = _manifest_entry_schema(pfields)
        id_types = {
            str(fid): types[name]
            for name, fid in cur.field_ids.items()
            if name in types
        }
        entries = []
        rows_total = 0
        seqs = []
        # per-spec-field value summaries (manifest_file.partitions):
        # contains_null + typed lower/upper bounds, so engines can skip
        # whole MANIFESTS from the manifest list before opening them
        summaries = [
            {"contains_null": False, "lo": None, "hi": None}
            for _ in spec_parsed
        ]
        for rel in sorted(files):
            snap_id, seq = attr[rel]
            seqs.append((seq, snap_id))
            abs_path = os.path.join(self.dest, rel)
            stats = self._all_stats.get(rel, {})
            nrows = stats.get("__rows__")
            if nrows is None:
                import pyarrow.parquet as _pq

                nrows = _pq.read_metadata(abs_path).num_rows
            rows_total += int(nrows)
            partition = {}
            if kind == 0:
                hv = _hive_partition_values(rel)
                for i, sf in enumerate(spec_parsed):
                    val = (
                        _partition_value(
                            sf, hv.get(sf.pname), src_types[i]
                        )
                        if src_types[i] is not None
                        else None  # void: source gone from all history
                    )
                    partition[sf.pname] = val
                    s = summaries[i]
                    if val is None:
                        s["contains_null"] = True
                    else:
                        if s["lo"] is None or val < s["lo"]:
                            s["lo"] = val
                        if s["hi"] is None or val > s["hi"]:
                            s["hi"] = val
            lower, upper, nulls = [], [], []
            if kind == 0:
                for fid_s, bounds in stats.items():
                    if fid_s.startswith("__") or fid_s not in id_types:
                        continue
                    dt = id_types[fid_s]
                    lo = _bound_bytes(dt, bounds[0])
                    hi = _bound_bytes(dt, bounds[1])
                    if lo is not None and hi is not None:
                        lower.append({"key": int(fid_s), "value": lo})
                        upper.append({"key": int(fid_s), "value": hi})
                    if len(bounds) > 2 and bounds[2] is not None:
                        nulls.append({"key": int(fid_s), "value": int(bounds[2])})
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": snap_id,
                    "sequence_number": seq,
                    "file_sequence_number": seq,
                    "data_file": {
                        "content": (
                            2 if eq_ids and rel in eq_ids else min(kind, 1)
                        ),
                        "file_path": _uri(abs_path),
                        "file_format": "PARQUET",
                        "partition": partition,
                        "record_count": int(nrows),
                        "file_size_in_bytes": os.path.getsize(abs_path),
                        "null_value_counts": sorted(
                            nulls, key=lambda e: e["key"]
                        )
                        or None,
                        "lower_bounds": sorted(lower, key=lambda e: e["key"])
                        or None,
                        "upper_bounds": sorted(upper, key=lambda e: e["key"])
                        or None,
                        "equality_ids": (
                            [int(f) for f in eq_ids[rel]]
                            if eq_ids and rel in eq_ids
                            else None
                        ),
                        "sort_order_id": None,
                    },
                }
            )
        min_seq = min(s for s, _ in seqs)
        part_summaries = None
        if kind == 0 and spec_parsed:
            part_summaries = [
                {
                    "contains_null": s["contains_null"],
                    "contains_nan": False,
                    "lower_bound": _partition_bound_bytes(
                        sf, src_t, s["lo"]
                    )
                    if src_t is not None
                    else None,
                    "upper_bound": _partition_bound_bytes(
                        sf, src_t, s["hi"]
                    )
                    if src_t is not None
                    else None,
                }
                for sf, src_t, s in zip(spec_parsed, src_types, summaries)
            ]
        self._manifest_n += 1
        name = f"manifest-{self._manifest_n:05d}-{kind}.avro"
        path = os.path.join(self.meta_dir, name)
        fmeta = {
            "schema": schema_json_for_meta,
            "schema-id": str(schema_id),
            "partition-spec": spec_fields_json,
            "partition-spec-id": str(spec_id),
            "format-version": "2",
            "content": "data" if kind == 0 else "deletes",
        }
        if part_summaries is not None:
            # stash the manifest_file partition summaries in the OCF
            # header (extra avro metadata keys are spec-legal and ignored
            # by foreign readers) so incremental re-exports can seed them
            # back without re-reading every entry — they used to be
            # silently dropped to null on reuse
            fmeta["x-partition-summaries"] = json.dumps(
                [_summary_to_json(s) for s in part_summaries]
            )
        length = iceavro.write_ocf(
            path, schema, entries, metadata=fmeta, codec=self.avro_codec
        )
        entry = {
            "manifest_path": _uri(path),
            "manifest_length": length,
            "partition_spec_id": spec_id,
            # manifest_file.content is 0=data/1=deletes ONLY; eq-delete
            # manifests (kind 2) are delete manifests at this level
            "content": min(kind, 1),
            "sequence_number": max(s for s, _ in seqs),
            "min_sequence_number": min_seq,
            "added_snapshot_id": next(
                sid for s, sid in seqs if s == min_seq
            ),
            "added_files_count": len(entries),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": rows_total,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": part_summaries,
        }
        self._manifest_cache[key] = entry
        return entry

    # -- incremental re-export ------------------------------------------- #

    def _load_prev(self) -> tuple[dict, int, str] | None:
        """(previous metadata, its version, its path) when dest already
        holds an export; None for a fresh dest."""
        hint = os.path.join(self.meta_dir, "version-hint.text")
        if not os.path.exists(hint):
            return None
        with open(hint) as f:
            v = int(f.read().strip())
        path = os.path.join(self.meta_dir, f"v{v}.metadata.json")
        with open(path) as f:
            return json.load(f), v, path

    def _seed_manifest_cache(self) -> None:
        """Rebuild the manifest reuse cache from the previous export's
        Avro files: each manifest's manifest_file entry is a pure
        function of its own contents, so a re-export rewrites only
        manifests for NEW (dir, file-subset) keys — O(delta)."""
        for name in sorted(os.listdir(self.meta_dir)):
            if not (name.startswith("manifest-") and name.endswith(".avro")):
                continue
            path = os.path.join(self.meta_dir, name)
            try:
                _, fmeta, entries = iceavro.read_ocf(path)
            except (ValueError, KeyError, OSError):
                continue  # foreign/corrupt file: just don't reuse it
            if not entries:
                continue
            kind = 0 if fmeta.get("content") == b"data" else 1
            if kind == 1 and entries[0]["data_file"].get("content") == 2:
                kind = 2  # eq-delete manifests cache under their own kind
            rels = sorted(
                os.path.relpath(_strip_uri(e["data_file"]["file_path"]), self.dest)
                for e in entries
            )
            seqs = [(e["sequence_number"], e["snapshot_id"]) for e in entries]
            min_seq = min(s for s, _ in seqs)
            key = (kind, _commit_dir_of(rels[0]), tuple(rels))
            self._manifest_cache[key] = {
                "manifest_path": _uri(path),
                "manifest_length": os.path.getsize(path),
                "partition_spec_id": int(
                    fmeta.get("partition-spec-id", b"0").decode("utf-8")
                ),
                "content": min(kind, 1),
                "sequence_number": max(s for s, _ in seqs),
                "min_sequence_number": min_seq,
                "added_snapshot_id": next(
                    sid for s, sid in seqs if s == min_seq
                ),
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(
                    e["data_file"]["record_count"] for e in entries
                ),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                # per-field partition summaries ride the OCF header (see
                # _write_manifest) so reuse keeps manifest-level pruning;
                # manifests written before that key existed seed as null
                "partitions": (
                    [
                        _summary_from_json(s)
                        for s in json.loads(
                            fmeta["x-partition-summaries"].decode("utf-8")
                        )
                    ]
                    if "x-partition-summaries" in fmeta
                    else None
                ),
            }
            n = int(name.split("-")[1])
            self._manifest_n = max(self._manifest_n, n)

    def _manifest_list_path(
        self, s, manifests: list, prev_id, version: int
    ) -> str:
        """Resolve (reuse or write) the manifest-list file for snapshot
        ``s``. Iceberg treats published metadata files as immutable, and
        a re-export chains the previous vN.metadata.json into
        metadata-log — so a manifest list that logged metadata points at
        must NEVER be rewritten with different content (spec-id drift or
        new manifests would leave time travel resolving manifests
        against the wrong specs). Reuse an existing snap-<id> list when
        its decoded content matches exactly; otherwise write a fresh
        per-version file name."""
        meta = {
            "format-version": "2",
            "snapshot-id": str(s.snapshot_id),
            "parent-snapshot-id": (
                "null" if prev_id is None else str(prev_id)
            ),
            "sequence-number": str(s.sequence),
        }
        prefix = f"snap-{s.snapshot_id}-"
        for name in sorted(os.listdir(self.meta_dir)):
            if not (
                name.startswith(prefix)
                and name.endswith("manifest-list.avro")
            ):
                continue
            path = os.path.join(self.meta_dir, name)
            try:
                _, fmeta, entries = iceavro.read_ocf(path)
            except (ValueError, KeyError, OSError):
                continue
            old_meta = {
                k: v.decode("utf-8")
                for k, v in fmeta.items()
                if k in meta
            }
            if old_meta == meta and entries == manifests:
                return path
        suffix = "" if version == 1 else f"v{version}-"
        path = os.path.join(
            self.meta_dir, f"snap-{s.snapshot_id}-{suffix}manifest-list.avro"
        )
        iceavro.write_ocf(
            path, _MANIFEST_FILE_SCHEMA, manifests, metadata=meta,
            codec=self.avro_codec,
        )
        return path

    # -- data / delete file materialization ----------------------------- #

    def _materialize_data(self, rel: str) -> None:
        if rel in self._linked:
            return
        self._linked.add(rel)
        dst = os.path.join(self.dest, rel)
        if os.path.exists(dst):  # incremental re-export: already linked
            return
        _link_or_copy(os.path.join(self.table.path, rel), dst)

    def _materialize_delete(self, rel: str) -> None:
        """Rewrite one positional-delete parquet: map table-relative
        file_path values to exported URIs and stamp the reserved ids."""
        if rel in self._linked:
            return
        self._linked.add(rel)
        if os.path.exists(os.path.join(self.dest, rel)):
            return  # immutable + deterministic rewrite: reuse
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(self.table.path, rel))
        paths = [
            _uri(os.path.join(self.dest, p)) if p is not None else None
            for p in t.column("file_path").to_pylist()
        ]
        out = pa.table(
            {
                "file_path": pa.array(paths, pa.string()),
                "pos": t.column("pos").cast(pa.int64()),
            },
            schema=pa.schema(
                [
                    pa.field(
                        "file_path",
                        pa.string(),
                        metadata={b"PARQUET:field_id": str(_PATH_FID).encode()},
                    ),
                    pa.field(
                        "pos",
                        pa.int64(),
                        metadata={b"PARQUET:field_id": str(_POS_FID).encode()},
                    ),
                ]
            ),
        )
        dst = os.path.join(self.dest, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        pq.write_table(out, dst)

    def _materialize_eq_delete(self, rel: str, fids: tuple, snaps) -> None:
        """Rewrite one equality-delete key parquet: the native format's
        rename-proof ``__eq_<fid>`` columns become logical names with
        their real field ids stamped, so any Iceberg reader resolves the
        keys by id (spec) or by name (fallback). Names resolve from the
        NEWEST exported snapshot still carrying the field id — a key
        column dropped after the delete was materialized keeps its
        historical name (time-travel readers resolve it through that
        snapshot's schema or the stamped id)."""
        if rel in self._linked:
            return
        self._linked.add(rel)
        dst = os.path.join(self.dest, rel)
        if os.path.exists(dst):  # immutable + deterministic: reuse
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(self.table.path, rel))
        inv: dict[int, str] = {}
        for s in snaps:  # newest snapshot wins per fid
            for name_, fid_ in s.field_ids.items():
                inv[int(fid_)] = name_
        cols, fields = [], []
        for fid in fids:
            name = inv.get(int(fid))
            if name is None:
                raise ValueError(
                    f"equality delete references field id {fid} unknown "
                    "to every exported snapshot; run compact() first"
                )
            col = t.column(f"__eq_{int(fid)}")
            cols.append(col)
            fields.append(
                pa.field(
                    name,
                    col.type,
                    metadata={
                        b"PARQUET:field_id": str(int(fid)).encode()
                    },
                )
            )
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        pq.write_table(pa.table(cols, schema=pa.schema(fields)), dst)

    # -- name mapping ---------------------------------------------------- #

    def _name_mapping(self, snaps: list[Snapshot]) -> list:
        cur = snaps[-1]
        live_dirs = {
            _commit_dir_of(rel) for s in snaps for rel in s.manifest
        }
        names_by_id: dict = {
            int(fid): {name} for name, fid in cur.field_ids.items()
        }
        claimed: dict = {}
        for s in snaps:
            for d, mapping in s.file_mappings.items():
                if d not in live_dirs:
                    continue
                for fid_s, phys in mapping.items():
                    fid = int(fid_s)
                    prev = claimed.get(phys)
                    if prev is not None and prev != fid:
                        raise ValueError(
                            f"physical column {phys!r} was written under two "
                            f"field ids ({prev}, {fid}); a global Iceberg "
                            "name-mapping cannot express that — run compact() "
                            "to rewrite history under current names first"
                        )
                    claimed[phys] = fid
                    names_by_id.setdefault(fid, set()).add(phys)
        for name, fid in cur.field_ids.items():
            prev = claimed.get(name)
            if prev is not None and prev != int(fid):
                raise ValueError(
                    f"column name {name!r} maps to field id {fid} in the "
                    f"current schema but was written as id {prev}; run "
                    "compact() first"
                )
        return [
            {"field-id": fid, "names": sorted(names)}
            for fid, names in sorted(names_by_id.items())
        ]

    # -- driver ---------------------------------------------------------- #

    def run(self) -> str:
        snaps = self._exportable()
        cur = snaps[-1]
        os.makedirs(self.meta_dir, exist_ok=True)
        prev = self._load_prev()
        version = 1
        table_uuid = str(uuid.uuid4())
        metadata_log: list = []
        if prev is not None:
            prev_meta, prev_version, prev_path = prev
            version = prev_version + 1
            table_uuid = prev_meta["table-uuid"]
            metadata_log = list(prev_meta.get("metadata-log", []))
            metadata_log.append(
                {
                    "timestamp-ms": prev_meta["last-updated-ms"],
                    "metadata-file": _uri(prev_path),
                }
            )
            self._seed_manifest_cache()
        for s in snaps:
            st = StructType.fromJson(json.loads(s.schema_json))
            for f in st.fields:
                self._hist_types[f.name] = f.dataType
        schemas, schema_index, last_column_id = self._build_schemas(snaps)
        specs, spec_index, last_partition_id = self._build_specs(snaps)
        attr = self._attribute_files(snaps)
        name_mapping = self._name_mapping(snaps)

        all_deletes = {d for s in snaps for d in s.delete_files}
        # equality-delete key files: rel -> key field-id tuple (the
        # rewrite stamps names + ids; manifests stamp equality_ids)
        eq_info: dict[str, tuple] = {}
        for s in snaps:
            for paths, fids, _seq in s.eq_delete_files:
                for p in paths:
                    eq_info.setdefault(p, tuple(int(f) for f in fids))
        # data files first: delete rewrites reference their exported paths
        for rel in attr:
            if rel not in all_deletes and rel not in eq_info:
                self._materialize_data(rel)
        for rel in all_deletes:
            self._materialize_delete(rel)
        for rel, fids in eq_info.items():
            self._materialize_eq_delete(rel, fids, snaps)

        snapshots_meta = []
        snapshot_log = []
        prev_id = None
        for s in snaps:
            # data manifests: group live files by commit dir
            by_dir: dict = {}
            for rel in s.manifest:
                by_dir.setdefault(_commit_dir_of(rel), []).append(rel)
            sid = schema_index[
                (s.schema_json, tuple(sorted(s.field_ids.items())))
            ]
            schema_json_meta = json.dumps(schemas[sid])
            manifests = []
            for d, files in sorted(by_dir.items()):
                spec_list = s.dir_specs.get(d, s.partition_spec) or []
                spec_id = spec_index[json.dumps(list(spec_list))]
                manifests.append(
                    self._write_manifest(
                        0,
                        d,
                        files,
                        spec_list,
                        spec_id,
                        attr,
                        cur,
                        schema_json_meta,
                        sid,
                        json.dumps(specs[spec_id]["fields"]),
                    )
                )
            del_by_dir: dict = {}
            for rel in s.delete_files:
                del_by_dir.setdefault(_commit_dir_of(rel), []).append(rel)
            unpart_id = spec_index[json.dumps([])]
            for d, files in sorted(del_by_dir.items()):
                manifests.append(
                    self._write_manifest(
                        1,
                        d,
                        files,
                        [],
                        unpart_id,
                        attr,
                        cur,
                        schema_json_meta,
                        sid,
                        json.dumps(specs[unpart_id]["fields"]),
                    )
                )
            eqdel_by_dir: dict = {}
            for paths, _fids, _seq in s.eq_delete_files:
                for rel in paths:
                    eqdel_by_dir.setdefault(
                        _commit_dir_of(rel), []
                    ).append(rel)
            for d, files in sorted(eqdel_by_dir.items()):
                manifests.append(
                    self._write_manifest(
                        2,
                        d,
                        sorted(set(files)),
                        [],
                        unpart_id,
                        attr,
                        cur,
                        schema_json_meta,
                        sid,
                        json.dumps(specs[unpart_id]["fields"]),
                        eq_ids=eq_info,
                    )
                )
            ml_path = self._manifest_list_path(s, manifests, prev_id, version)
            op_map = {
                "create": "append",
                "append": "append",
                "delete": "delete",
                "replace": "replace",
                "alter": "replace",
            }
            summary = {"operation": op_map.get(s.operation, "overwrite")}
            for k, v in (s.summary or {}).items():
                summary.setdefault(str(k), str(v))
            entry = {
                "snapshot-id": s.snapshot_id,
                "sequence-number": s.sequence,
                "timestamp-ms": s.timestamp_ms,
                "manifest-list": _uri(ml_path),
                "summary": summary,
                "schema-id": schema_index[
                    (s.schema_json, tuple(sorted(s.field_ids.items())))
                ],
            }
            if prev_id is not None:
                entry["parent-snapshot-id"] = prev_id
            snapshots_meta.append(entry)
            snapshot_log.append(
                {"timestamp-ms": s.timestamp_ms, "snapshot-id": s.snapshot_id}
            )
            prev_id = s.snapshot_id

        # write.sort.columns -> a real Iceberg sort order (identity asc,
        # nulls-first — Spark's sortWithinPartitions default), so foreign
        # engines see the write clustering instead of just a property
        sort_orders = [{"order-id": 0, "fields": []}]
        default_sort_order_id = 0
        sort_cols = [
            c.strip()
            for c in (cur.properties or {}).get("write.sort.columns", "").split(",")
            if c.strip()
        ]
        if sort_cols and all(c in cur.field_ids for c in sort_cols):
            sort_orders.append(
                {
                    "order-id": 1,
                    "fields": [
                        {
                            "transform": "identity",
                            "source-id": int(cur.field_ids[c]),
                            "direction": "asc",
                            "null-order": "nulls-first",
                        }
                        for c in sort_cols
                    ],
                }
            )
            default_sort_order_id = 1
        properties = {
            str(k): str(v) for k, v in (cur.properties or {}).items()
        }
        # always stamp the mapping: our parquet files carry no field ids,
        # so every Iceberg reader needs it to resolve columns (the same
        # mechanism imported hive tables use)
        properties["schema.name-mapping.default"] = json.dumps(name_mapping)
        refs = {"main": {"snapshot-id": cur.snapshot_id, "type": "branch"}}
        exported_ids = {s.snapshot_id for s in snaps}
        for tag, sid in self.table.tags().items():
            if sid in exported_ids:
                refs[tag] = {"snapshot-id": sid, "type": "tag"}
        metadata = {
            "format-version": 2,
            "table-uuid": table_uuid,
            "location": _uri(self.dest),
            "last-sequence-number": cur.sequence,
            "last-updated-ms": max(s.timestamp_ms for s in snaps),
            "last-column-id": last_column_id,
            "current-schema-id": schema_index[
                (cur.schema_json, tuple(sorted(cur.field_ids.items())))
            ],
            "schemas": schemas,
            "default-spec-id": spec_index[
                json.dumps(list(cur.partition_spec or []))
            ],
            "partition-specs": specs,
            "last-partition-id": last_partition_id,
            "default-sort-order-id": default_sort_order_id,
            "sort-orders": sort_orders,
            "properties": properties,
            "current-snapshot-id": cur.snapshot_id,
            "snapshots": snapshots_meta,
            "snapshot-log": snapshot_log,
            "metadata-log": metadata_log,
            "refs": refs,
        }
        meta_path = os.path.join(self.meta_dir, f"v{version}.metadata.json")
        with open(meta_path, "w") as f:
            json.dump(metadata, f, indent=2)
        with open(os.path.join(self.meta_dir, "version-hint.text"), "w") as f:
            f.write(str(version))
        return meta_path


def export_iceberg(
    table: IceTable, dest: str, *, avro_codec: str = "null"
) -> str:
    """Export ``table`` (main branch history) as an Apache Iceberg v2
    table tree at ``dest``; returns the metadata.json path. Data files
    hard-link (copy on cross-device); positional delete files rewrite
    with exported URIs. ``avro_codec`` selects the Avro block codec for
    manifests and manifest lists — ``null`` (default) or ``deflate``
    (what Java Iceberg's default gzip setting frames on the wire;
    manifest trees of 100k-file tables shrink several-fold). See the
    module docstring for fidelity notes."""
    return IcebergExporter(table, dest, avro_codec=avro_codec).run()


# --------------------------------------------------------------------------- #
# import: a generic Spark reader for static Iceberg v2 tables
# --------------------------------------------------------------------------- #


def _strip_uri(p: str) -> str:
    if p.startswith("file://"):
        p = p[len("file://") :]
    elif p.startswith("file:"):
        p = p[len("file:") :]
    while p.startswith("//"):
        p = p[1:]
    return p


def _read_metadata_json(path: str) -> dict:
    """Parse one metadata JSON file, transparently un-gzipping — Java
    Iceberg writes ``vN.gz.metadata.json`` when the table property
    ``write.metadata.compression-codec`` is gzip (its default on some
    distros). Detection is by the gzip magic, not the filename, so
    mis-named foreign files still read."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:2] == b"\x1f\x8b":
        import gzip

        raw = gzip.decompress(raw)
    return json.loads(raw.decode("utf-8"))


def _load_metadata(location: str) -> dict:
    meta_dir = os.path.join(location, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = f.read().strip()
        path = os.path.join(meta_dir, f"v{v}.metadata.json")
        if not os.path.exists(path):
            gz = os.path.join(meta_dir, f"v{v}.gz.metadata.json")
            if os.path.exists(gz):
                path = gz
    else:
        import re as _re

        vre = _re.compile(r"v(\d+)(?:\.gz)?\.metadata\.json$")

        def _key(f: str):
            m = vre.search(f)
            # numeric when vN-named (v10 > v9); lexical fallback for
            # foreign catalogs' 00000-<uuid>.metadata.json names
            return (1, int(m.group(1)), f) if m else (0, 0, f)

        cands = sorted(
            (f for f in os.listdir(meta_dir) if f.endswith(".metadata.json")),
            key=_key,
        )
        if not cands:
            raise FileNotFoundError(f"no metadata.json under {meta_dir}")
        path = os.path.join(meta_dir, cands[-1])
    return _read_metadata_json(path)


def _meta_schemas(meta: dict) -> list:
    """The metadata's schema list: v2 (and late-v1) ``schemas``, or the
    ORIGINAL v1 singular ``schema`` field (pre-schema-evolution writers
    — common in old foreign tables), normalized to carry a schema-id."""
    if "schemas" in meta:
        return meta["schemas"]
    sch = dict(meta["schema"])
    sch.setdefault("schema-id", meta.get("current-schema-id", 0))
    return [sch]


def _resolve_schema(meta: dict, snap: dict) -> dict:
    """The schema a snapshot reads with: by the snapshot's pinned
    schema-id, falling back to the table's single schema when the
    metadata predates schema ids entirely."""
    schemas = _meta_schemas(meta)
    schema_id = snap.get("schema-id", meta.get("current-schema-id"))
    for s in schemas:
        if s.get("schema-id") == schema_id:
            return s
    if len(schemas) == 1:
        return schemas[0]
    raise ValueError(f"schema-id {schema_id!r} not found in metadata")


def _meta_specs(meta: dict) -> dict:
    """spec-id -> partition spec: v2 ``partition-specs``, or original
    v1's singular ``partition-spec`` (a bare field list, spec 0)."""
    if "partition-specs" in meta:
        return {sp["spec-id"]: sp for sp in meta["partition-specs"]}
    return {0: {"spec-id": 0, "fields": meta.get("partition-spec", [])}}


def _snapshot_manifest_files(snap: dict) -> list:
    """manifest_file entries for one snapshot: decoded from the v2
    ``manifest-list`` Avro, or SYNTHESIZED from original v1's inline
    ``manifests`` path list (no list level existed — sequence numbers
    default to 0, content to data, and the spec id is left None for the
    caller to fill from the manifest's own OCF header)."""
    ml = snap.get("manifest-list")
    if ml is not None:
        return iceavro.read_ocf(_strip_uri(ml))[2]
    return [
        {
            "manifest_path": p,
            "partition_spec_id": None,
            "sequence_number": 0,
            "min_sequence_number": 0,
            "content": 0,
            "added_snapshot_id": snap.get("snapshot-id"),
        }
        for p in snap.get("manifests", [])
    ]


# Positional-delete sets at or under this total parquet size broadcast
# to every task (one hash probe, no shuffle of the data side); larger
# sets — e.g. a long-lived imported table carrying GB-scale deletes —
# fall back to a shuffled equi-join on (file, pos) with the sequence
# rule as a residual, which scales with executors instead of OOMing
# the broadcast. Both paths are pinned result-equal in tests.
DELETE_BROADCAST_MAX_BYTES = 64 << 20


def read_iceberg(
    spark: SparkSession,
    location: str,
    *,
    snapshot_id: int | None = None,
    ref: str | None = None,
    where=None,
    delete_broadcast_max_bytes: int = DELETE_BROADCAST_MAX_BYTES,
) -> DataFrame:
    """Read a static Iceberg v2 — or v1, including ORIGINAL v1 with the
    singular ``schema``/``partition-spec`` metadata fields and inline
    snapshot ``manifests`` lists predating manifest-list files — table
    (current snapshot, time travel by ``snapshot_id``, or a named
    ``ref`` — branch or tag from metadata refs, `VERSION AS OF 'name'`
    semantics): walks metadata.json ->
    manifest-list Avro -> manifest Avro, reads the live data files
    grouped by physical parquet schema (one Spark scan per distinct
    write-schema — renames resolve through
    ``schema.name-mapping.default``), fills identity partition columns
    from manifest partition values when absent from the files, and
    applies deletes by the spec's sequence rules: positional deletes at
    sequence D remove (file, pos) rows of data files with sequence
    <= D; equality deletes (content=2 — Flink CDC's native upsert form)
    remove rows whose equality columns match, from data files with
    sequence STRICTLY LESS than D, with null-safe key matching.

    ``where`` (same ``(column, op, value)`` conjunct form as
    ``IceTable.scan``) prunes data files at PLANNING time from the
    manifests' identity-partition values and per-column bounds — on a
    100 TB foreign table the predicate skips files before any footer is
    read — and is applied exactly via a residual Catalyst filter."""
    if snapshot_id is not None and ref is not None:
        raise ValueError("pass at most one of snapshot_id, ref")
    meta = _load_metadata(location)
    if meta.get("format-version") not in (1, 2):
        raise ValueError("unsupported Iceberg format-version")
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if ref is not None:
        entry = meta.get("refs", {}).get(ref)
        if entry is None:
            raise ValueError(f"no such ref: {ref}")
        snapshot_id = entry["snapshot-id"]
    sid = snapshot_id if snapshot_id is not None else meta.get(
        "current-snapshot-id"
    )
    if sid is None or sid not in snaps:
        raise ValueError(f"no such snapshot: {snapshot_id}")
    snap = snaps[sid]
    schema = _resolve_schema(meta, snap)
    specs = _meta_specs(meta)
    mapping = json.loads(
        meta.get("properties", {}).get("schema.name-mapping.default", "[]")
    )
    name_to_id = {
        n: e["field-id"] for e in mapping for n in e.get("names", [])
    }

    manifests = _snapshot_manifest_files(snap)
    data_files: list[dict] = []
    delete_files: list[dict] = []
    eq_delete_files: list[dict] = []
    for m in manifests:
        _, mmeta, entries = iceavro.read_ocf(_strip_uri(m["manifest_path"]))
        if m["partition_spec_id"] is None:
            # original-v1 inline 'manifests' carry no list-level spec id;
            # the manifest's own OCF header has it (or spec 0)
            m["partition_spec_id"] = int(
                mmeta.get("partition-spec-id", b"0").decode("utf-8")
            )
        for e in entries:
            if e["status"] == 2:  # deleted
                continue
            df_rec = e["data_file"]
            rec = {
                "path": _strip_uri(df_rec["file_path"]),
                # explicit None test: sequence 0 is a valid inherited
                # number in v1-upgraded foreign tables and must not fall
                # back to the manifest's (which would wrongly widen
                # positional-delete applicability)
                # v1 manifest lists carry no sequence numbers at all
                # (everything is effectively sequence 0 — deletes are a
                # v2 feature), hence the final 0 default
                "seq": (
                    e["sequence_number"]
                    if e.get("sequence_number") is not None
                    else m.get("sequence_number", 0)
                ),
                "partition": df_rec.get("partition") or {},
                "spec_id": m["partition_spec_id"],
                "lower_bounds": df_rec.get("lower_bounds"),
                "upper_bounds": df_rec.get("upper_bounds"),
            }
            content = df_rec.get("content", 0)
            if content == 0 and m.get("content", 0) == 0:
                data_files.append(rec)
            elif content == 1:
                delete_files.append(rec)
            elif content == 2:  # equality deletes (Flink CDC et al.)
                rec["eq_ids"] = tuple(df_rec.get("equality_ids") or ())
                if not rec["eq_ids"]:
                    raise ValueError(
                        "equality delete file without equality_ids: "
                        + rec["path"]
                    )
                eq_delete_files.append(rec)
            elif m.get("content") == 1:
                delete_files.append(rec)
            else:
                raise ValueError(
                    f"unsupported delete content {content} in {rec['path']}"
                )
    # identity partition sources per spec: field-id -> spec field name
    identity_by_spec: dict = {}
    for spid, sp in specs.items():
        identity_by_spec[spid] = {
            f["source-id"]: f["name"]
            for f in sp.get("fields", [])
            if f["transform"] == "identity"
        }

    preds = _normalize_predicates(where)
    if preds and data_files:
        # planning-time file pruning: identity-partition values and
        # column bounds straight from the manifests — before the
        # per-file footer reads below, so a selective predicate cuts
        # BOTH the data IO and the planning cost
        name_to_fid = {f["name"]: f["id"] for f in schema["fields"]}
        ftype = {f["id"]: f["type"] for f in schema["fields"]}
        data_files = [
            r
            for r in data_files
            if _file_may_match(r, preds, name_to_fid, ftype, identity_by_spec)
        ]

    if not data_files:
        ddl = ", ".join(
            f"`{f['name']}` {_spark_type(f['type'])}"
            for f in schema["fields"]
        )
        return spark.createDataFrame([], ddl)

    out = _scan_data_files(
        spark, data_files, schema, name_to_id, identity_by_spec
    )

    if delete_files or eq_delete_files:
        # both delete kinds need the data file's sequence number per row
        # (a per-file map, broadcast — O(#files) rows)
        seq_rows = [(r["path"], int(r["seq"])) for r in data_files]
        seq_df = spark.createDataFrame(
            seq_rows, "__ice_file_s string, __data_seq long"
        )
        out = out.join(
            F.broadcast(seq_df),
            out["__ice_file"] == seq_df["__ice_file_s"],
            "left",
        ).drop("__ice_file_s")

    if delete_files:
        # the spec's sequence rule: a positional delete at sequence D
        # removes (file, pos) rows of data files with sequence <= D
        dels = []
        for r in delete_files:
            d = spark.read.parquet(r["path"]).select(
                F.regexp_replace(F.col("file_path"), "^file:/+", "/").alias(
                    "__del_file"
                ),
                F.col("pos").cast("long").alias("__del_pos"),
                F.lit(int(r["seq"])).cast("long").alias("__del_seq"),
            )
            dels.append(d)
        all_dels = dels[0]
        for d in dels[1:]:
            all_dels = all_dels.unionByName(d)
        del_bytes = sum(
            os.path.getsize(r["path"]) for r in delete_files
        )
        if del_bytes <= delete_broadcast_max_bytes:
            all_dels = F.broadcast(all_dels)
        # small delete sets broadcast (hash probe per task); big ones
        # shuffle on the (file, pos) equi keys with the sequence rule
        # as a residual — Catalyst plans SMJ/SHJ from the equi pair
        out = out.join(
            all_dels,
            (out["__ice_file"] == all_dels["__del_file"])
            & (out["__ice_pos"] == all_dels["__del_pos"])
            & (out["__data_seq"] <= all_dels["__del_seq"]),
            "left_anti",
        )

    if eq_delete_files:
        # equality deletes (content=2 — what Flink CDC upserts write):
        # a delete at sequence D removes rows whose equality columns
        # match, from data files with sequence STRICTLY LESS than D
        # (the spec's rule — an eq delete never applies to rows in its
        # own commit). Deletes with the same equality_ids set union into
        # one anti join; null-safe equality matches the spec (a null
        # key value deletes rows whose value is null).
        id_to_name = {f["id"]: f["name"] for f in schema["fields"]}
        names_by_id: dict = {}
        for ent in mapping:
            names_by_id.setdefault(ent["field-id"], []).extend(
                ent.get("names", [])
            )
        by_ids: dict = {}
        for r in eq_delete_files:
            by_ids.setdefault(r["eq_ids"], []).append(r)
        for eq_ids, recs_d in by_ids.items():
            key_names = []
            for fid in eq_ids:
                name = id_to_name.get(fid)
                if name is None:
                    raise ValueError(
                        f"equality delete field id {fid} is not in the "
                        "current schema"
                    )
                key_names.append(name)
            dels = []
            for r in recs_d:
                raw_d = spark.read.parquet(r["path"])
                sel = []
                for fid, name in zip(eq_ids, key_names):
                    src = name if name in raw_d.columns else next(
                        (
                            n
                            for n in names_by_id.get(fid, [])
                            if n in raw_d.columns
                        ),
                        None,
                    )
                    if src is None:
                        # last resort: the key file's own parquet field-id
                        # stamps (spec-preferred resolution — survives
                        # renames the name-mapping never saw)
                        import pyarrow.parquet as _pq

                        for fld in _pq.read_schema(r["path"]):
                            md = fld.metadata or {}
                            if md.get(b"PARQUET:field_id") == str(
                                int(fid)
                            ).encode():
                                src = fld.name
                                break
                    if src is None:
                        raise ValueError(
                            f"equality delete file {r['path']} lacks a "
                            f"column for field id {fid} ({name})"
                        )
                    tgt = _spark_type(
                        next(
                            f["type"]
                            for f in schema["fields"]
                            if f["id"] == fid
                        )
                    )
                    sel.append(
                        F.col(src).cast(tgt).alias(f"__eq_{name}")
                    )
                sel.append(
                    F.lit(int(r["seq"])).cast("long").alias("__del_seq")
                )
                dels.append(raw_d.select(*sel))
            eq_dels = dels[0]
            for d in dels[1:]:
                eq_dels = eq_dels.unionByName(d)
            eq_bytes = sum(os.path.getsize(r["path"]) for r in recs_d)
            if eq_bytes <= delete_broadcast_max_bytes:
                eq_dels = F.broadcast(eq_dels)
            cond = out["__data_seq"] < eq_dels["__del_seq"]
            for name in key_names:
                cond = cond & out[name].eqNullSafe(eq_dels[f"__eq_{name}"])
            out = out.join(eq_dels, cond, "left_anti")

    if delete_files or eq_delete_files:
        out = out.drop("__data_seq")
    out = out.drop("__ice_file", "__ice_pos")
    if preds:
        # pruning is an optimization; the residual filter is what makes
        # where= exact (same contract as IceTable.scan)
        out = out.filter(_predicates_to_column(preds))
    return out


def _scan_data_files(
    spark: SparkSession,
    data_files: list[dict],
    schema: dict,
    name_to_id: dict,
    identity_by_spec: dict,
) -> DataFrame:
    """One Spark scan per distinct physical parquet schema over the
    given data-file records, resolved to the requested Iceberg schema:
    renames resolve via name-mapping ids, widened columns cast up,
    absent identity-partition columns inject from manifest values, and
    every row carries (__ice_file, __ice_pos) for delete application."""
    import pyarrow.parquet as _pq

    # group files by physical top-level column tuple (O(#files) footer
    # reads driver-side — the same cost every Iceberg reader pays to
    # plan; at cluster scale this is the planning step, not data IO)
    # key by (name, type) pairs: a widened column (int -> long) must not
    # share a scan with files written after the widening
    groups: dict = {}
    for rec in data_files:
        sch = _pq.read_schema(rec["path"])
        phys = tuple(zip(sch.names, (str(t) for t in sch.types)))
        groups.setdefault(phys, []).append(rec)

    norm = F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/")
    parts = []
    for phys, recs in groups.items():
        phys_names = [n for n, _t in phys]
        phys_by_id = {}
        for n in phys_names:
            fid = name_to_id.get(n)
            if fid is not None:
                phys_by_id[fid] = n
        raw = spark.read.parquet(*[r["path"] for r in recs])
        cols = []
        inject: dict = {}  # field name -> (ddl, {path: value})
        for f in schema["fields"]:
            fid, name = f["id"], f["name"]
            tgt = _spark_type(f["type"])
            src = phys_by_id.get(fid) or (
                name if name in phys_names else None
            )
            if src is not None:
                cols.append(F.col(src).cast(tgt).alias(name))
                continue
            # identity-partition value from manifest metadata?
            vals = {}
            missing = False
            for r in recs:
                pname = identity_by_spec.get(r["spec_id"], {}).get(fid)
                if pname is None or pname not in r["partition"]:
                    missing = True
                    break
                vals[r["path"]] = r["partition"][pname]
            if not missing:
                inject[name] = (tgt, vals)
                continue
            cols.append(F.lit(None).cast(tgt).alias(name))
        df = raw.select(
            *cols,
            norm.alias("__ice_file"),
            F.col("_metadata.row_index").alias("__ice_pos"),
        )
        for name, (tgt, vals) in inject.items():
            rows = [(p, _partition_py_value(tgt, v)) for p, v in vals.items()]
            vmap = spark.createDataFrame(
                rows, f"__ice_file_v string, `{name}` {tgt}"
            )
            df = df.join(
                F.broadcast(vmap),
                df["__ice_file"] == vmap["__ice_file_v"],
                "left",
            ).drop("__ice_file_v")
        order = [f["name"] for f in schema["fields"]]
        parts.append(df.select(*order, "__ice_file", "__ice_pos"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_iceberg_changes(
    spark: SparkSession,
    location: str,
    *,
    start_snapshot_id: int,
    end_snapshot_id: int | None = None,
) -> DataFrame:
    """Incremental append scan of a static Iceberg v2 table: the rows
    ADDED by snapshots after ``start_snapshot_id`` (exclusive) up to
    ``end_snapshot_id`` (inclusive; default the current snapshot) —
    Spark's ``start-snapshot-id``/``end-snapshot-id`` incremental read,
    re-expressed for foreign tables. This is the import-side CDC that
    makes a PULL mirror incremental: each sync reads only the delta.

    Semantics match Iceberg's incremental append scan: 'replace'
    snapshots (compaction — no logical change) are skipped; 'overwrite'
    or 'delete' snapshots in range raise, because their row-level
    changes cannot be represented as appends. Planning walks the parent
    chain, prunes manifests by ``added_snapshot_id`` (only manifests
    minted by an in-range snapshot are opened), and reads ADDED entries
    (status=1); the scan itself is O(delta files), not O(table)."""
    meta = _load_metadata(location)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    end = (
        end_snapshot_id
        if end_snapshot_id is not None
        else meta.get("current-snapshot-id")
    )
    if end not in snaps:
        raise ValueError(f"no such snapshot: {end}")
    if start_snapshot_id not in snaps:
        raise ValueError(f"no such snapshot: {start_snapshot_id}")
    # walk end -> start along parent ids (range is exclusive of start)
    chain: list[dict] = []
    cur = end
    while cur is not None and cur != start_snapshot_id:
        s = snaps.get(cur)
        if s is None:
            raise ValueError(
                f"snapshot {start_snapshot_id} is not an ancestor of {end}"
            )
        chain.append(s)
        cur = s.get("parent-snapshot-id")
    if cur is None and start_snapshot_id != end:
        raise ValueError(
            f"snapshot {start_snapshot_id} is not an ancestor of {end}"
        )
    chain.reverse()

    schema = _resolve_schema(meta, snaps[end])
    specs = _meta_specs(meta)
    mapping = json.loads(
        meta.get("properties", {}).get("schema.name-mapping.default", "[]")
    )
    name_to_id = {
        n: e["field-id"] for e in mapping for n in e.get("names", [])
    }
    identity_by_spec = {
        spid: {
            f["source-id"]: f["name"]
            for f in sp.get("fields", [])
            if f["transform"] == "identity"
        }
        for spid, sp in specs.items()
    }

    data_files: list[dict] = []
    for s in chain:
        op = (s.get("summary") or {}).get("operation", "append")
        if op == "replace":
            continue  # compaction: no logical change
        if op not in ("append",):
            raise ValueError(
                f"cannot read snapshot {s['snapshot-id']} incrementally: "
                f"operation {op!r} is not an append"
            )
        sid = s["snapshot-id"]
        manifests = _snapshot_manifest_files(s)
        for m in manifests:
            if m.get("added_snapshot_id") != sid or m.get("content", 0) != 0:
                continue
            # original-v1 inline manifests list EVERY live manifest (no
            # added/inherited distinction at this level); the per-entry
            # status==1 + snapshot_id filters below keep only this
            # snapshot's additions either way
            _, mmeta, entries = iceavro.read_ocf(
                _strip_uri(m["manifest_path"])
            )
            if m["partition_spec_id"] is None:
                # original-v1 synthesized list entries carry no spec id;
                # without this backfill identity_by_spec.get(None) -> {}
                # would silently NULL identity-partition columns that
                # live only in manifest metadata (Hive-style layouts)
                m["partition_spec_id"] = int(
                    mmeta.get("partition-spec-id", b"0").decode("utf-8")
                )
            for e in entries:
                if e.get("status") != 1:  # ADDED in this snapshot only
                    continue
                # foreign writers merge manifests: a merged manifest's
                # added_snapshot_id is the merging commit, but entries
                # keep their minting snapshot_id — honor it when present
                esid = e.get("snapshot_id")
                if esid is not None and esid != sid:
                    continue
                df_rec = e["data_file"]
                if df_rec.get("content", 0) != 0:
                    continue
                data_files.append(
                    {
                        "path": _strip_uri(df_rec["file_path"]),
                        "partition": df_rec.get("partition") or {},
                        "spec_id": m["partition_spec_id"],
                    }
                )
    if not data_files:
        ddl = ", ".join(
            f"`{f['name']}` {_spark_type(f['type'])}"
            for f in schema["fields"]
        )
        return spark.createDataFrame([], ddl)
    out = _scan_data_files(
        spark, data_files, schema, name_to_id, identity_by_spec
    )
    return out.drop("__ice_file", "__ice_pos")


def _decode_single_value(ice_type, raw):
    """Iceberg single-value binary (spec appendix D) -> comparable
    Python value; None for types this reader doesn't prune on (decimal,
    fixed, binary, uuid, nested) — a None bound just means the file is
    never skipped on that column."""
    if raw is None or not isinstance(ice_type, str):
        return None
    b = bytes(raw)
    try:
        if ice_type == "int":
            return struct.unpack("<i", b)[0]
        if ice_type == "long":
            return struct.unpack("<q", b)[0]
        if ice_type == "float":
            return struct.unpack("<f", b)[0]
        if ice_type == "double":
            return struct.unpack("<d", b)[0]
        if ice_type == "boolean":
            return b != b"\x00"
        if ice_type == "string":
            return b.decode("utf-8")
        if ice_type == "date":
            return _EPOCH_DATE + datetime.timedelta(
                days=struct.unpack("<i", b)[0]
            )
        if ice_type in ("timestamp", "timestamptz"):
            return _EPOCH_DT + datetime.timedelta(
                microseconds=struct.unpack("<q", b)[0]
            )
    except (struct.error, UnicodeDecodeError):
        return None
    return None


def _file_may_match(
    rec: dict,
    preds: list,
    name_to_fid: dict,
    ftype: dict,
    identity_by_spec: dict,
) -> bool:
    """Manifest-level file pruning for read_iceberg: False only when the
    entry's identity-partition value or column bounds PROVE no row can
    satisfy the conjunction. Conservative everywhere else (missing
    bounds, non-identity transforms, undecodable types -> keep)."""
    ident = identity_by_spec.get(rec["spec_id"], {})
    lowers = {e["key"]: e["value"] for e in (rec.get("lower_bounds") or [])}
    uppers = {e["key"]: e["value"] for e in (rec.get("upper_bounds") or [])}
    for col, op, val in preds:
        fid = name_to_fid.get(col)
        if fid is None:
            continue
        # identity partition: the value holds for EVERY row of the file
        pname = ident.get(fid)
        if pname is not None and pname in rec["partition"]:
            pv = _partition_py_value(
                _spark_type(ftype[fid]), rec["partition"][pname]
            )
            if op == "is_null":
                if pv is not None:
                    return False
                continue
            if op == "is_not_null":
                if pv is None:
                    return False
                continue
            if pv is None:
                return False  # all-null file: no comparison matches
            # identity-partition values are ACHIEVED by every row
            # (unlike bounds, no NaN can hide behind a finite value), so
            # the NaN-aware path is needed only when the partition value
            # itself is NaN — plain interval logic would prune "= NaN"
            # though Spark's NaN = NaN is true
            if not _bounds_may_match(pv, pv, op, val, float_type=_is_nan(pv)):
                return False
            continue
        if op in ("is_null", "is_not_null"):
            continue  # null counts not tracked here — keep
        lo = _decode_single_value(ftype[fid], lowers.get(fid))
        hi = _decode_single_value(ftype[fid], uppers.get(fid))
        if lo is None or hi is None:
            continue
        # float/double bounds exclude NaN rows (Iceberg metrics), and
        # this reader has no nan_value_counts — ops a NaN row could
        # satisfy under Spark ordering never prune (see table.py)
        if not _bounds_may_match(
            lo, hi, op, val,
            float_type=ftype[fid] in ("float", "double"),
        ):
            return False
    return True


def _partition_py_value(spark_ddl: str, v):
    """Iceberg partition value (manifest representation) -> Python value
    matching the Spark DDL type for createDataFrame."""
    if v is None:
        return None
    if spark_ddl == "date":
        return _EPOCH_DATE + datetime.timedelta(days=int(v))
    if spark_ddl in ("timestamp", "timestamp_ntz"):
        return _EPOCH_DT + datetime.timedelta(microseconds=int(v))
    if spark_ddl in ("int", "bigint", "smallint", "tinyint"):
        return int(v)
    if spark_ddl in ("float", "double"):
        return float(v)
    if spark_ddl == "boolean":
        return bool(v)
    return v

"""Iceberg v2 export/import conformance.

Structural conformance is validated against the PUBLIC Apache Iceberg
table-spec's required fields (metadata.json, manifest-list, manifest
entries), and behavioral conformance by round-tripping
export -> read_iceberg -> row equality against IceTable.scan(),
including time travel, renames (name-mapping), hidden-partition
transforms, merge-on-read positional deletes, and type widening.
The reference relies on PyIceberg for all of this (icerunner.py:60-103);
neither PyIceberg nor the DuckDB iceberg extension is installable in
this container (SCALE.md §7 records the attempted load), so the gold
cross-engine read is replaced by spec-field validation plus an
independent Avro decode of every emitted file. The Avro wire format
itself IS foreign-verified: tests/test_avro_java_conformance.py decodes
every exported file through the Apache Avro Java reference
implementation on Spark's classpath.
"""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from icerunner_spark import iceavro
from icerunner_spark.iceberg_export import (
    _bound_bytes,
    _partition_value,
    export_iceberg,
    read_iceberg,
)
from icerunner_spark.table import IceTable, _parse_spec


def _rows(df):
    return {tuple(r) for r in df.collect()}


# --------------------------------------------------------------------------- #
# Avro codec
# --------------------------------------------------------------------------- #


class TestAvroCodec:
    SCHEMA = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"], "default": None},
            {"name": "c", "type": {"type": "array", "items": "int"}},
            {"name": "d", "type": ["null", "bytes"], "default": None},
            {"name": "e", "type": "boolean"},
            {"name": "f", "type": "double"},
        ],
    }

    def test_roundtrip(self, tmp_path):
        recs = [
            {"a": -(2**62), "b": None, "c": [1, -1, 0], "d": b"\x00\xff",
             "e": True, "f": -2.5},
            {"a": 2**62, "b": "héllo", "c": [], "d": None, "e": False,
             "f": 0.0},
        ]
        p = str(tmp_path / "t.avro")
        n = iceavro.write_ocf(p, self.SCHEMA, recs, metadata={"k": "v"})
        assert n == os.path.getsize(p)
        schema, meta, out = iceavro.read_ocf(p)
        assert out == recs
        assert meta["k"] == b"v"
        assert schema == self.SCHEMA

    def test_magic_and_sync(self, tmp_path):
        p = str(tmp_path / "t.avro")
        iceavro.write_ocf(p, self.SCHEMA, [])
        with open(p, "rb") as f:
            assert f.read(4) == b"Obj\x01"

    def test_zigzag_longs(self, tmp_path):
        sch = {"type": "record", "name": "z",
               "fields": [{"name": "v", "type": "long"}]}
        vals = [0, -1, 1, -2, 63, 64, -64, -65, 2**31, -(2**31), 2**63 - 1,
                -(2**63)]
        p = str(tmp_path / "z.avro")
        iceavro.write_ocf(p, sch, [{"v": v} for v in vals])
        _, _, out = iceavro.read_ocf(p)
        assert [r["v"] for r in out] == vals


# --------------------------------------------------------------------------- #
# transform / bound unit conversions
# --------------------------------------------------------------------------- #


class TestConversions:
    def test_temporal_partition_values(self):
        from pyspark.sql.types import DateType, IntegerType, StringType

        (yf,) = _parse_spec(["year(d)"])
        (mf,) = _parse_spec(["month(d)"])
        (df_,) = _parse_spec(["day(d)"])
        (hf,) = _parse_spec(["hour(ts)"])
        assert _partition_value(yf, "2024", DateType()) == 54
        assert _partition_value(mf, "1970-01", DateType()) == 0
        assert _partition_value(mf, "2024-03", DateType()) == 650
        assert _partition_value(df_, "1970-01-02", DateType()) == 1
        assert _partition_value(hf, "1970-01-02-03", DateType()) == 27
        (idf,) = _parse_spec(["grp"])
        assert _partition_value(idf, "7", IntegerType()) == 7
        assert _partition_value(idf, None, StringType()) is None

    def test_bucket_exports_void(self):
        from icerunner_spark.iceberg_export import _transform_name

        (bf,) = _parse_spec(["bucket(16, k)"])
        assert _transform_name(bf) == "void"
        (tf,) = _parse_spec(["truncate(10, k)"])
        assert _transform_name(tf) == "truncate[10]"

    def test_bound_bytes(self):
        from pyspark.sql.types import (
            DateType,
            DecimalType,
            DoubleType,
            IntegerType,
            LongType,
            StringType,
            TimestampNTZType,
        )

        assert _bound_bytes(IntegerType(), 1) == b"\x01\x00\x00\x00"
        assert _bound_bytes(LongType(), -1) == b"\xff" * 8
        assert _bound_bytes(StringType(), "ab") == b"ab"
        assert _bound_bytes(DateType(), "1970-01-03") == b"\x02\x00\x00\x00"
        assert (
            _bound_bytes(TimestampNTZType(), "1970-01-01T00:00:01")
            == (1_000_000).to_bytes(8, "little")
        )
        assert _bound_bytes(DecimalType(9, 2), "12.34") == (1234).to_bytes(
            2, "big", signed=True
        )
        import struct

        assert _bound_bytes(DoubleType(), 2.5) == struct.pack("<d", 2.5)
        assert _bound_bytes(IntegerType(), None) is None


# --------------------------------------------------------------------------- #
# end-to-end export tree
# --------------------------------------------------------------------------- #


@pytest.fixture()
def exported(spark, tmp_path):
    """A table exercising the interesting surface: hidden partitioning
    (identity + month transform), multi-commit history, rename,
    merge-on-read positional deletes, a tag; exported once."""
    t = IceTable(spark, str(tmp_path / "src"))
    df = spark.range(0, 100).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 5).cast("int").alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
        F.date_add(
            F.lit("2024-01-01").cast("date"), (F.col("id") % 40).cast("int")
        ).alias("d"),
    )
    t.create(df.filter("k < 50"), partition_by=["grp", "month(d)"])
    t.append(df.filter("k >= 50"))
    t.delete_where(F.col("k") % 7 == 0, mode="merge-on-read")
    t.rename_column("val", "value")
    t.create_tag("prerelease")
    dest = str(tmp_path / "exported")
    meta_path = export_iceberg(t, dest)
    return t, dest, meta_path


# the Iceberg v2 spec's required table-metadata fields
_REQUIRED_METADATA = [
    "format-version",
    "table-uuid",
    "location",
    "last-sequence-number",
    "last-updated-ms",
    "last-column-id",
    "schemas",
    "current-schema-id",
    "partition-specs",
    "default-spec-id",
    "last-partition-id",
    "sort-orders",
    "default-sort-order-id",
]

_REQUIRED_MANIFEST_FILE = [
    "manifest_path",
    "manifest_length",
    "partition_spec_id",
    "content",
    "sequence_number",
    "min_sequence_number",
    "added_snapshot_id",
    "added_files_count",
    "existing_files_count",
    "deleted_files_count",
    "added_rows_count",
    "existing_rows_count",
    "deleted_rows_count",
]

_REQUIRED_DATA_FILE = [
    "content",
    "file_path",
    "file_format",
    "partition",
    "record_count",
    "file_size_in_bytes",
]


class TestConformance:
    def test_metadata_required_fields(self, exported):
        _, _, meta_path = exported
        meta = json.load(open(meta_path))
        for key in _REQUIRED_METADATA:
            assert key in meta, f"metadata.json missing required {key!r}"
        assert meta["format-version"] == 2
        # schema integrity: unique ids, current-schema-id resolves
        sids = [s["schema-id"] for s in meta["schemas"]]
        assert len(set(sids)) == len(sids)
        assert meta["current-schema-id"] in sids
        cur_schema = next(
            s
            for s in meta["schemas"]
            if s["schema-id"] == meta["current-schema-id"]
        )
        ids = [f["id"] for f in cur_schema["fields"]]
        assert len(set(ids)) == len(ids)
        assert meta["last-column-id"] >= max(ids)
        # partition-spec integrity: sources resolve, field-ids >= 1000
        spec_ids = [sp["spec-id"] for sp in meta["partition-specs"]]
        assert meta["default-spec-id"] in spec_ids
        field_ids = {
            f["id"] for s in meta["schemas"] for f in s["fields"]
        }
        for sp in meta["partition-specs"]:
            for f in sp["fields"]:
                assert f["field-id"] >= 1000
                assert f["source-id"] in field_ids
                assert f["transform"] != "bucket[" , "xxhash bucket must not export"
        # snapshots: current resolves, parents chain, log matches
        by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
        assert meta["current-snapshot-id"] in by_id
        for s in meta["snapshots"]:
            if "parent-snapshot-id" in s:
                assert s["parent-snapshot-id"] in by_id
            assert s["summary"]["operation"] in (
                "append",
                "replace",
                "overwrite",
                "delete",
            )
        assert [e["snapshot-id"] for e in meta["snapshot-log"]] == [
            s["snapshot-id"] for s in meta["snapshots"]
        ]
        # refs: main branch + exported tag
        assert meta["refs"]["main"]["snapshot-id"] == meta[
            "current-snapshot-id"
        ]
        assert meta["refs"]["prerelease"]["type"] == "tag"
        # name-mapping carries BOTH physical names of the renamed column
        mapping = json.loads(
            meta["properties"]["schema.name-mapping.default"]
        )
        val_entry = next(
            e for e in mapping if "value" in e["names"]
        )
        assert "val" in val_entry["names"]

    def test_manifest_lists_decode(self, exported):
        _, _, meta_path = exported
        meta = json.load(open(meta_path))
        for s in meta["snapshots"]:
            path = s["manifest-list"]
            assert path.startswith("file://")
            schema, fmeta, entries = iceavro.read_ocf(path[len("file://"):])
            assert fmeta["format-version"] == b"2"
            assert int(fmeta["snapshot-id"]) == s["snapshot-id"]
            # every avro field carries its spec field-id
            for f in schema["fields"]:
                assert "field-id" in f
            for e in entries:
                for key in _REQUIRED_MANIFEST_FILE:
                    assert key in e, f"manifest_file missing {key!r}"
                assert e["content"] in (0, 1)
                assert e["manifest_length"] == os.path.getsize(
                    e["manifest_path"][len("file://"):]
                )
                assert e["min_sequence_number"] <= e["sequence_number"]
                assert e["sequence_number"] <= s["sequence-number"]

    def test_manifest_entries_decode(self, exported):
        t, _, meta_path = exported
        meta = json.load(open(meta_path))
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, _, manifests = iceavro.read_ocf(
            cur["manifest-list"][len("file://"):]
        )
        saw_data = saw_delete = 0
        total_rows = 0
        for m in manifests:
            schema, fmeta, entries = iceavro.read_ocf(
                m["manifest_path"][len("file://"):]
            )
            assert fmeta["format-version"] == b"2"
            assert fmeta["content"] == (
                b"data" if m["content"] == 0 else b"deletes"
            )
            json.loads(fmeta["schema"])  # embedded table schema parses
            json.loads(fmeta["partition-spec"])
            assert int(fmeta["partition-spec-id"]) == m["partition_spec_id"]
            for e in entries:
                assert e["status"] in (0, 1, 2)
                df_rec = e["data_file"]
                for key in _REQUIRED_DATA_FILE:
                    assert key in df_rec
                assert df_rec["file_format"] == "PARQUET"
                path = df_rec["file_path"]
                assert path.startswith("file://")
                assert os.path.getsize(path[len("file://"):]) == df_rec[
                    "file_size_in_bytes"
                ]
                assert e["sequence_number"] <= cur["sequence-number"]
                if m["content"] == 0:
                    saw_data += 1
                    total_rows += df_rec["record_count"]
                    # bounds decode: k is a long, lower <= upper
                    lo = df_rec.get("lower_bounds")
                    hi = df_rec.get("upper_bounds")
                    if lo and hi:
                        lo_k = {e2["key"]: e2["value"] for e2 in lo}.get(1)
                        hi_k = {e2["key"]: e2["value"] for e2 in hi}.get(1)
                        if lo_k is not None and hi_k is not None:
                            assert int.from_bytes(
                                lo_k, "little", signed=True
                            ) <= int.from_bytes(hi_k, "little", signed=True)
                else:
                    saw_delete += 1
        assert saw_data > 0 and saw_delete > 0
        # data manifests of the CURRENT snapshot cover the full pre-delete
        # row count (deletes subtract at read time)
        assert total_rows == 100

    def test_manifest_list_partition_summaries(self, exported):
        """Data manifests carry per-spec-field value summaries so foreign
        engines can skip whole manifests from the list: grp (identity
        int) bounds within [0, 4], d_month (month transform) bounds
        within [648, 649] (Jan/Feb 2024), no nulls."""
        import struct as _struct

        _, _, meta_path = exported
        meta = json.load(open(meta_path))
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, _, manifests = iceavro.read_ocf(
            cur["manifest-list"][len("file://"):]
        )
        checked = 0
        for m in manifests:
            if m["content"] != 0:
                continue
            ps = m["partitions"]
            assert ps is not None and len(ps) == 2
            for p, (lo_ok, hi_ok) in zip(ps, [(0, 4), (648, 649)]):
                assert p["contains_null"] is False
                lo = _struct.unpack("<i", p["lower_bound"])[0]
                hi = _struct.unpack("<i", p["upper_bound"])[0]
                assert lo_ok <= lo <= hi <= hi_ok
                checked += 1
        assert checked > 0

    def test_partition_values_typed(self, exported):
        _, _, meta_path = exported
        meta = json.load(open(meta_path))
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, _, manifests = iceavro.read_ocf(
            cur["manifest-list"][len("file://"):]
        )
        months = set()
        grps = set()
        for m in manifests:
            if m["content"] != 0:
                continue
            _, _, entries = iceavro.read_ocf(
                m["manifest_path"][len("file://"):]
            )
            for e in entries:
                p = e["data_file"]["partition"]
                grps.add(p["grp"])
                months.add(p["d_month"])
        assert grps == {0, 1, 2, 3, 4}
        # Jan/Feb 2024 = 648, 649 months since epoch
        assert months == {648, 649}


class TestRoundTrip:
    def test_current_snapshot_equality(self, spark, exported):
        t, dest, _ = exported
        assert _rows(read_iceberg(spark, dest)) == _rows(t.scan())

    def test_time_travel_equality(self, spark, exported):
        t, dest, _ = exported
        for s in t.snapshots():
            got = read_iceberg(spark, dest, snapshot_id=s.snapshot_id)
            assert _rows(got) == _rows(t.scan(snapshot_id=s.snapshot_id)), (
                f"snapshot {s.snapshot_id} ({s.operation}) mismatch"
            )

    def test_ref_read(self, spark, exported):
        # VERSION AS OF 'tag' through the exported refs map
        t, dest, _ = exported
        tag_sid = t.tags()["prerelease"]
        got = read_iceberg(spark, dest, ref="prerelease")
        assert _rows(got) == _rows(t.scan(snapshot_id=tag_sid))
        with pytest.raises(ValueError, match="no such ref"):
            read_iceberg(spark, dest, ref="nope")

    def test_identity_partition_column_restored(self, spark, exported):
        # grp lives only in hive paths; the importer must rebuild it from
        # manifest partition values (Iceberg identity-read-from-metadata)
        t, dest, _ = exported
        got = read_iceberg(spark, dest)
        assert _rows(got.groupBy("grp").count()) == _rows(
            t.scan().groupBy("grp").count()
        )

    def test_unpartitioned_and_widened(self, spark, tmp_path):
        t = IceTable(spark, str(tmp_path / "w_src"))
        df = spark.range(0, 20).select(
            F.col("id").cast("int").alias("a"),
            F.col("id").cast("double").alias("x"),
        )
        t.create(df)
        t.widen_column("a", "bigint")
        t.append(
            spark.range(20, 30).select(
                F.col("id").cast("long").alias("a"),
                F.col("id").cast("double").alias("x"),
            )
        )
        dest = str(tmp_path / "w_exp")
        export_iceberg(t, dest)
        got = read_iceberg(spark, dest)
        assert got.schema["a"].dataType.typeName() == "long"
        assert _rows(got) == _rows(t.scan())

    def test_empty_after_full_delete(self, spark, tmp_path):
        t = IceTable(spark, str(tmp_path / "e_src"))
        t.create(spark.range(0, 5).select(F.col("id").alias("k")))
        t.delete_where(F.lit(True), mode="merge-on-read")
        dest = str(tmp_path / "e_exp")
        export_iceberg(t, dest)
        assert read_iceberg(spark, dest).count() == 0


class TestSortOrderExport:
    def test_write_sort_columns_become_sort_order(self, spark, tmp_path):
        t = IceTable(spark, str(tmp_path / "so_src"))
        t.create(
            spark.range(0, 10).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("w")
            ),
            properties={"write.sort.columns": "k"},
        )
        dest = str(tmp_path / "so_exp")
        meta = json.load(open(export_iceberg(t, dest)))
        assert meta["default-sort-order-id"] == 1
        order = next(
            o for o in meta["sort-orders"] if o["order-id"] == 1
        )
        [f] = order["fields"]
        k_id = next(
            x["id"]
            for x in meta["schemas"][meta["current-schema-id"]]["fields"]
            if x["name"] == "k"
        )
        assert f == {
            "transform": "identity",
            "source-id": k_id,
            "direction": "asc",
            "null-order": "nulls-first",
        }
        assert _rows(read_iceberg(spark, dest)) == _rows(t.scan())


class TestIncrementalReExport:
    def test_re_export_is_delta_and_chains_metadata(self, spark, tmp_path):
        t = IceTable(spark, str(tmp_path / "inc_src"))
        t.create(
            spark.range(0, 30).select(
                F.col("id").alias("k"), (F.col("id") % 3).alias("g")
            )
        )
        t.append(spark.range(30, 60).select(F.col("id").alias("k"), (F.col("id") % 3).alias("g")))
        dest = str(tmp_path / "inc_exp")
        p1 = export_iceberg(t, dest)
        meta1 = json.load(open(p1))
        manifests_before = {
            f
            for f in os.listdir(os.path.join(dest, "metadata"))
            if f.startswith("manifest-") and f.endswith(".avro")
        }
        # advance the table, re-export to the SAME dest
        t.append(spark.range(60, 80).select(F.col("id").alias("k"), (F.col("id") % 3).alias("g")))
        t.delete_where(F.col("k") % 11 == 0, mode="merge-on-read")
        p2 = export_iceberg(t, dest)
        assert p2.endswith("v2.metadata.json")
        meta2 = json.load(open(p2))
        # identity is stable; history chains through metadata-log
        assert meta2["table-uuid"] == meta1["table-uuid"]
        assert len(meta2["metadata-log"]) == 1
        assert meta2["metadata-log"][0]["metadata-file"].endswith(
            "v1.metadata.json"
        )
        with open(os.path.join(dest, "metadata", "version-hint.text")) as f:
            assert f.read().strip() == "2"
        # old manifests were REUSED, not rewritten: the prior set is a
        # subset of the new set (delta = the new append + the delete)
        manifests_after = {
            f
            for f in os.listdir(os.path.join(dest, "metadata"))
            if f.startswith("manifest-") and f.endswith(".avro")
        }
        assert manifests_before <= manifests_after
        assert len(manifests_after) > len(manifests_before)
        # and the re-exported tree reads correctly at every snapshot
        assert _rows(read_iceberg(spark, dest)) == _rows(t.scan())
        for s in t.snapshots():
            got = read_iceberg(spark, dest, snapshot_id=s.snapshot_id)
            assert _rows(got) == _rows(t.scan(snapshot_id=s.snapshot_id))


class TestEqualityDeleteExport:
    """Pending equality deletes export for real (r9): content=2 delete
    files with equality_ids, key columns rewritten from the native
    ``__eq_<fid>`` names to the current schema names with field ids
    stamped — and the spec's strictly-less sequence rule survives the
    round trip (a re-inserted key stays alive)."""

    def test_eq_delete_export_roundtrip_and_sequence_rule(
        self, spark, tmp_path
    ):
        t = IceTable(spark, str(tmp_path / "eq_src"))
        t.create(
            spark.range(0, 10).select(
                F.col("id").alias("k"), F.lit("x").alias("v")
            ).coalesce(1)
        )
        keys = spark.createDataFrame([(3,), (4,)], "k long")
        t.delete_rows(keys, ["k"], mode="equality")
        # re-insert one deleted key AFTER the delete: the eq delete must
        # not touch it (its data sequence postdates the delete's)
        t.append(spark.createDataFrame([(3, "reborn")], "k long, v string"))
        dest = str(tmp_path / "eq_exp")
        export_iceberg(t, dest)
        assert _rows(read_iceberg(spark, dest)) == _rows(t.scan())
        got = {
            (r["k"], r["v"]) for r in read_iceberg(spark, dest).collect()
        }
        assert (3, "reborn") in got and not any(k == 4 for k, _ in got)
        # time travel through the export sees the pre-delete state too
        for s in t.snapshots():
            ti = read_iceberg(spark, dest, snapshot_id=s.snapshot_id)
            assert _rows(ti) == _rows(t.scan(snapshot_id=s.snapshot_id))
        # the standalone auditor accepts the tree and counts the eq files
        from tools.iceberg_validate import validate

        rep = validate(dest)
        assert rep.as_dict()["ok"], rep.as_dict()["errors"]
        assert rep.checked.get("eq_delete_files", 0) >= 1

    def test_eq_delete_incremental_reexport_reuses(self, spark, tmp_path):
        """A second export after another eq delete rewrites only the NEW
        metadata (O(delta)); reads stay equal at every snapshot."""
        t = IceTable(spark, str(tmp_path / "eqi_src"))
        t.create(
            spark.range(0, 20).select(
                F.col("id").alias("k"), F.lit("x").alias("v")
            ).coalesce(1)
        )
        t.delete_rows(
            spark.createDataFrame([(1,)], "k long"), ["k"], mode="equality"
        )
        dest = str(tmp_path / "eqi_exp")
        export_iceberg(t, dest)
        before = {
            f
            for f in os.listdir(os.path.join(dest, "metadata"))
            if f.startswith("manifest-") and f.endswith(".avro")
        }
        t.delete_rows(
            spark.createDataFrame([(2,)], "k long"), ["k"], mode="equality"
        )
        export_iceberg(t, dest)
        after = {
            f
            for f in os.listdir(os.path.join(dest, "metadata"))
            if f.startswith("manifest-") and f.endswith(".avro")
        }
        assert before <= after and len(after) > len(before)
        assert _rows(read_iceberg(spark, dest)) == _rows(t.scan())
        for s in t.snapshots():
            got = read_iceberg(spark, dest, snapshot_id=s.snapshot_id)
            assert _rows(got) == _rows(t.scan(snapshot_id=s.snapshot_id))

    def test_eq_delete_key_column_dropped_after_compact(
        self, spark, tmp_path
    ):
        """An eq delete materialized by compact() whose key column is
        THEN dropped still exports: the historical snapshot needs the
        delete for time travel, and the key file resolves its name from
        the newest snapshot that knew the field id (plus the stamped
        parquet field id as the reader's last resort)."""
        t = IceTable(spark, str(tmp_path / "eqd_src"))
        t.create(
            spark.range(0, 6).select(
                F.col("id").alias("k"), F.lit("x").alias("v"),
                (F.col("id") % 2).alias("g")
            ).coalesce(1)
        )
        t.delete_rows(
            spark.createDataFrame([(0,)], "g long"), ["g"], mode="equality"
        )
        t.compact()  # materializes; current snapshot has no pending eq
        t.drop_column("g")
        dest = str(tmp_path / "eqd_exp")
        export_iceberg(t, dest)
        assert _rows(read_iceberg(spark, dest)) == _rows(t.scan())
        for s in t.snapshots():
            got = read_iceberg(spark, dest, snapshot_id=s.snapshot_id)
            assert _rows(got) == _rows(t.scan(snapshot_id=s.snapshot_id))


class TestRefusals:

    def test_field_defaults_refused(self, spark, tmp_path):
        t = IceTable(spark, str(tmp_path / "fd_src"))
        t.create(spark.range(0, 5).select(F.col("id").alias("k")))
        t.add_column("tier", "string", default="bronze")
        with pytest.raises(ValueError, match="initial-default"):
            export_iceberg(t, str(tmp_path / "fd_exp"))

    def test_ambiguous_physical_name_refused(self, spark, tmp_path):
        # drop a column, re-add the same name, append: the physical name
        # now belongs to two field ids -> a global name-mapping cannot
        # express it
        t = IceTable(spark, str(tmp_path / "amb_src"))
        t.create(
            spark.range(0, 5).select(
                F.col("id").alias("k"), F.lit("a").alias("v")
            )
        )
        t.drop_column("v")
        t.add_column("v", "string")
        t.append(
            spark.range(5, 8).select(
                F.col("id").alias("k"), F.lit("b").alias("v")
            )
        )
        with pytest.raises(ValueError, match="name-mapping|two"):
            export_iceberg(t, str(tmp_path / "amb_exp"))


class TestCliVerb:
    def test_export_iceberg_cli(self, spark, tmp_path):
        from icerunner_spark.cli import main as cli_main
        from icerunner_spark.connector import Connector

        wh = str(tmp_path / "wh")
        c = Connector(spark, wh)
        c.table("cli_tbl").create(
            spark.range(0, 12).select(F.col("id").alias("k"))
        )
        out = str(tmp_path / "cli_exp")
        rc = cli_main(["export-iceberg", "-w", wh, "-n", "cli_tbl", "-o", out])
        assert rc == 0
        assert os.path.exists(
            os.path.join(out, "metadata", "v1.metadata.json")
        )
        assert read_iceberg(spark, out).count() == 12


class TestDeleteRewrite:
    def test_delete_files_point_at_exported_uris(self, exported):
        import pyarrow.parquet as pq

        t, dest, meta_path = exported
        meta = json.load(open(meta_path))
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, _, manifests = iceavro.read_ocf(
            cur["manifest-list"][len("file://"):]
        )
        checked = 0
        for m in manifests:
            if m["content"] != 1:
                continue
            _, _, entries = iceavro.read_ocf(
                m["manifest_path"][len("file://"):]
            )
            for e in entries:
                tbl = pq.read_table(e["data_file"]["file_path"][len("file://"):])
                # reserved Iceberg field ids stamped in the parquet schema
                fp_field = tbl.schema.field("file_path")
                assert fp_field.metadata[b"PARQUET:field_id"] == b"2147483546"
                for p in tbl.column("file_path").to_pylist():
                    assert p.startswith("file://" + dest)
                    assert os.path.exists(p[len("file://"):])
                    checked += 1
        assert checked > 0

# --------------------------------------------------------------------------- #
# r9 hardening: dropped partition sources, published-file immutability,
# summary survival across re-export, foreign sequence-0 entries, and the
# shuffled-hash delete path
# --------------------------------------------------------------------------- #


class TestR9Hardening:
    def test_export_survives_dropped_partition_source(self, spark, tmp_path):
        """A historical commit dir's spec may reference a column that
        later left the schema (legal once the dir leaves the live set —
        evolution only guards _live_specs). The exporter used to resolve
        partition-source types against the CURRENT schema only and
        KeyError'd; it must fall back to the write-time type from
        snapshot history."""
        t = IceTable(spark, str(tmp_path / "drop_src"))
        df = spark.range(0, 40).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("int").alias("g"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        t.create(df.filter("k < 20"), partition_by=["g"])
        t.append(df.filter("k >= 20"))
        # full replace WITHOUT g: old partitioned dirs leave the live
        # set and the column leaves the schema
        t.overwrite(
            spark.range(100, 120).select(
                F.col("id").alias("k"),
                F.concat(F.lit("w"), F.col("id")).alias("v"),
            )
        )
        dest = str(tmp_path / "drop_exp")
        meta_path = export_iceberg(t, dest)  # KeyError before the fix
        meta = json.load(open(meta_path))
        # the historical partitioned spec exports with a REAL transform
        # (its retired source id resolves through history, not void)
        part_specs = [
            sp for sp in meta["partition-specs"] if sp["fields"]
        ]
        assert part_specs, "historical partitioned spec missing"
        assert part_specs[0]["fields"][0]["transform"] == "identity"
        # every snapshot still round-trips, including the partitioned era
        for s in t.snapshots():
            got = read_iceberg(spark, dest, snapshot_id=s.snapshot_id)
            assert _rows(got) == _rows(t.scan(snapshot_id=s.snapshot_id))

    def test_spec_zero_always_unpartitioned(self, spark, tmp_path):
        """Spec 0 is reserved for the unpartitioned spec even when the
        table was created partitioned — spec-id assignment must be
        stable across incremental re-exports (the old conditional
        insert renumbered ids once a natural unpartitioned spec
        appeared, breaking manifests referenced by logged metadata)."""
        t = IceTable(spark, str(tmp_path / "spec0_src"))
        t.create(
            spark.range(0, 20).select(
                F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("g")
            ),
            partition_by=["g"],
        )
        dest = str(tmp_path / "spec0_exp")
        p1 = export_iceberg(t, dest)
        meta1 = json.load(open(p1))
        by_id = {sp["spec-id"]: sp for sp in meta1["partition-specs"]}
        assert by_id[0]["fields"] == []
        assert meta1["default-spec-id"] != 0
        # partition-spec evolution to unpartitioned + re-export: ids of
        # pre-existing specs must not move
        t.update_partition_spec([])
        t.append(spark.range(20, 30).select(
            F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("g")
        ))
        p2 = export_iceberg(t, dest)
        meta2 = json.load(open(p2))
        by_id2 = {sp["spec-id"]: sp for sp in meta2["partition-specs"]}
        assert by_id2[0]["fields"] == []
        for sid, sp in by_id.items():
            assert by_id2[sid] == sp, "spec ids renumbered across exports"
        assert meta2["default-spec-id"] == 0
        assert _rows(read_iceberg(spark, dest)) == _rows(t.scan())

    def test_reexport_never_mutates_published_manifest_lists(
        self, spark, tmp_path
    ):
        """Iceberg metadata files are immutable once published: after a
        re-export, every manifest-list the chained (metadata-log) v1
        metadata points at must be byte-identical to what v1 was
        written against."""
        t = IceTable(spark, str(tmp_path / "imm_src"))
        t.create(spark.range(0, 15).select(F.col("id").alias("k")))
        dest = str(tmp_path / "imm_exp")
        p1 = export_iceberg(t, dest)
        meta1 = json.load(open(p1))
        published = {}
        for s in meta1["snapshots"]:
            path = s["manifest-list"][len("file://"):]
            published[path] = open(path, "rb").read()
        t.append(spark.range(15, 25).select(F.col("id").alias("k")))
        t.delete_where(F.col("k") % 5 == 0, mode="merge-on-read")
        export_iceberg(t, dest)
        for path, before in published.items():
            assert os.path.exists(path), "published manifest list removed"
            assert open(path, "rb").read() == before, (
                "published manifest list rewritten in place"
            )
        # and the old metadata still reads as it did at publish time
        snap1 = meta1["current-snapshot-id"]
        got = read_iceberg(spark, dest, snapshot_id=snap1)
        assert _rows(got) == _rows(t.scan(snapshot_id=snap1))

    def test_incremental_reexport_keeps_partition_summaries(
        self, spark, tmp_path
    ):
        """Reused (seeded) manifests must keep their manifest-list
        per-field partition summaries — they used to silently reset to
        null after any incremental re-export, degrading foreign engines'
        manifest-level pruning."""
        t = IceTable(spark, str(tmp_path / "sum_src"))
        df = spark.range(0, 30).select(
            F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("g")
        )
        t.create(df, partition_by=["g"])
        dest = str(tmp_path / "sum_exp")
        export_iceberg(t, dest)
        t.append(
            spark.range(30, 40).select(
                F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("g")
            )
        )
        p2 = export_iceberg(t, dest)
        meta2 = json.load(open(p2))
        cur = next(
            s
            for s in meta2["snapshots"]
            if s["snapshot-id"] == meta2["current-snapshot-id"]
        )
        _, _, manifests = iceavro.read_ocf(
            cur["manifest-list"][len("file://"):]
        )
        data_manifests = [m for m in manifests if m["content"] == 0]
        assert len(data_manifests) >= 2  # the seeded one + the delta
        for m in data_manifests:
            assert m["partitions"], (
                "partition summaries lost on incremental re-export"
            )
            s = m["partitions"][0]
            assert s["contains_null"] is False
            assert s["lower_bound"] is not None
            assert s["upper_bound"] is not None

    def test_foreign_sequence_zero_entry_not_widened(self, spark, tmp_path):
        """A hand-built foreign table whose data-file manifest ENTRY
        carries an explicit sequence_number of 0 (valid — v1-upgraded
        history) inside a manifest stamped sequence 5: the reader must
        use the entry's 0, so a positional delete at sequence 3 applies
        (0 <= 3). The old `or`-fallback read the data file as sequence 5
        and kept the deleted row."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from icerunner_spark.iceberg_export import (
            _MANIFEST_FILE_SCHEMA,
            _manifest_entry_schema,
            _uri,
        )

        dest = tmp_path / "foreign"
        (dest / "data").mkdir(parents=True)
        (dest / "metadata").mkdir()
        data_path = str(dest / "data" / "f1.parquet")
        pq.write_table(pa.table({"k": pa.array([1, 2, 3], pa.int64())}), data_path)
        del_path = str(dest / "data" / "d1.parquet")
        pq.write_table(
            pa.table(
                {
                    "file_path": pa.array([_uri(data_path)], pa.string()),
                    "pos": pa.array([0], pa.int64()),
                }
            ),
            del_path,
        )

        def _entry(content, path, nrows, seq):
            return {
                "status": 1,
                "snapshot_id": 99,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": content,
                    "file_path": _uri(path),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": nrows,
                    "file_size_in_bytes": os.path.getsize(path),
                    "null_value_counts": None,
                    "lower_bounds": None,
                    "upper_bounds": None,
                    "equality_ids": None,
                    "sort_order_id": None,
                },
            }

        schema = _manifest_entry_schema([])
        m_data = str(dest / "metadata" / "m-data.avro")
        iceavro.write_ocf(
            m_data, schema, [_entry(0, data_path, 3, 0)],
            metadata={"content": "data", "partition-spec-id": "0"},
        )
        m_del = str(dest / "metadata" / "m-del.avro")
        iceavro.write_ocf(
            m_del, schema, [_entry(1, del_path, 1, 3)],
            metadata={"content": "deletes", "partition-spec-id": "0"},
        )

        def _mf(path, content, seq):
            return {
                "manifest_path": _uri(path),
                "manifest_length": os.path.getsize(path),
                "partition_spec_id": 0,
                "content": content,
                # the manifest-level sequence is 5 — the trap the old
                # `or`-fallback fell into for the entry's explicit 0
                "sequence_number": 5 if content == 0 else seq,
                "min_sequence_number": 0,
                "added_snapshot_id": 99,
                "added_files_count": 1,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 3,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": None,
            }

        ml_path = str(dest / "metadata" / "snap-99-manifest-list.avro")
        iceavro.write_ocf(
            ml_path,
            _MANIFEST_FILE_SCHEMA,
            [_mf(m_data, 0, 0), _mf(m_del, 1, 3)],
            metadata={"format-version": "2", "snapshot-id": "99"},
        )
        meta = {
            "format-version": 2,
            "table-uuid": "00000000-0000-0000-0000-000000000099",
            "location": _uri(str(dest)),
            "last-sequence-number": 5,
            "last-updated-ms": 0,
            "last-column-id": 1,
            "current-schema-id": 0,
            "schemas": [
                {
                    "type": "struct",
                    "schema-id": 0,
                    "fields": [
                        {"id": 1, "name": "k", "required": False, "type": "long"}
                    ],
                }
            ],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999,
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {
                "schema.name-mapping.default": json.dumps(
                    [{"field-id": 1, "names": ["k"]}]
                )
            },
            "current-snapshot-id": 99,
            "snapshots": [
                {
                    "snapshot-id": 99,
                    "sequence-number": 5,
                    "timestamp-ms": 0,
                    "manifest-list": _uri(ml_path),
                    "summary": {"operation": "append"},
                    "schema-id": 0,
                }
            ],
            "snapshot-log": [],
            "metadata-log": [],
            "refs": {"main": {"snapshot-id": 99, "type": "branch"}},
        }
        with open(dest / "metadata" / "v1.metadata.json", "w") as f:
            json.dump(meta, f)
        with open(dest / "metadata" / "version-hint.text", "w") as f:
            f.write("1")

        got = read_iceberg(spark, str(dest))
        # pos 0 (k=1) is deleted: data seq 0 <= delete seq 3
        assert _rows(got) == {(2,), (3,)}

    def test_large_delete_set_shuffled_path_equal(self, spark, exported):
        """The broadcast-vs-shuffled delete application paths are
        result-equal: threshold 0 forces the shuffled-hash variant the
        100 TB path needs when an imported table carries GB-scale
        positional deletes."""
        t, dest, _ = exported
        base = _rows(read_iceberg(spark, dest))
        shuffled = _rows(
            read_iceberg(spark, dest, delete_broadcast_max_bytes=0)
        )
        assert shuffled == base == _rows(t.scan())


# --------------------------------------------------------------------------- #
# golden-byte Avro conformance (r8 verdict item 3): reader and writer
# live in one module, so round-trips can't catch a symmetric
# spec-misreading. Everything below derives its bytes from the Avro 1.x
# spec IN THE TEST (its own zigzag/varint/framing helpers), never from
# iceavro — a hand-built manifest-list decodes through iceavro.read_ocf,
# and an iceavro.write_ocf file parses with the test's own decoder.
# --------------------------------------------------------------------------- #


def _zz(n: int) -> bytes:
    """Avro spec: long = zigzag (n<<1)^(n>>63), then base-128 varint,
    little-endian groups, high bit = continuation."""
    z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_str(s: str) -> bytes:
    """Avro spec: string = long length prefix + utf-8 bytes."""
    raw = s.encode("utf-8")
    return _zz(len(raw)) + raw


def _read_varlong(buf) -> int:
    z = shift = 0
    while True:
        (b,) = buf.read(1)
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1)


class TestAvroGoldenBytes:
    # one full manifest_file record, hand-encoded field by field in the
    # schema's declaration order per the spec (record = concatenation of
    # field encodings; union = branch index long + value; array =
    # count-prefixed blocks + 0 terminator)
    RECORD = {
        "manifest_path": "m.avro",
        "manifest_length": 100,
        "partition_spec_id": 0,
        "content": 1,
        "sequence_number": 3,
        "min_sequence_number": 1,
        "added_snapshot_id": 99,
        "added_files_count": 1,
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": 10,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": [
            {
                "contains_null": False,
                "contains_nan": False,
                "lower_bound": b"\x05\x00\x00\x00",
                "upper_bound": None,
            }
        ],
    }
    PAYLOAD = (
        _avro_str("m.avro")  # manifest_path
        + _zz(100)           # manifest_length
        + _zz(0)             # partition_spec_id
        + _zz(1)             # content
        + _zz(3)             # sequence_number
        + _zz(1)             # min_sequence_number
        + _zz(99)            # added_snapshot_id
        + _zz(1) + _zz(0) + _zz(0)   # added/existing/deleted files
        + _zz(10) + _zz(0) + _zz(0)  # added/existing/deleted rows
        + _zz(1)             # partitions: union branch 1 (non-null)
        + _zz(1)             # array block: 1 item
        + b"\x00"            # contains_null = false
        + _zz(1) + b"\x00"   # contains_nan: branch 1, false
        + _zz(1) + _zz(4) + b"\x05\x00\x00\x00"  # lower_bound: branch 1, 4 bytes
        + _zz(0)             # upper_bound: branch 0 (null)
        + _zz(0)             # array terminator
    )

    def test_spot_varints(self):
        """Spec-derived literals for the varint helper itself (these
        exact byte values appear in the Avro 1.11 spec's examples)."""
        assert _zz(0) == b"\x00"
        assert _zz(-1) == b"\x01"
        assert _zz(1) == b"\x02"
        assert _zz(-2) == b"\x03"
        assert _zz(2) == b"\x04"
        assert _zz(-64) == b"\x7f"
        assert _zz(64) == b"\x80\x01"
        assert _zz(2**31 - 1) == b"\xfe\xff\xff\xff\x0f"
        assert _zz(-(2**31)) == b"\xff\xff\xff\xff\x0f"
        assert _zz(2**63 - 1) == b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01"
        assert _zz(-(2**63)) == b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"

    def test_hand_built_manifest_list_decodes(self, tmp_path):
        """An OCF whose every byte was laid down from the spec (magic,
        metadata map, sync, count+size block framing) must decode through
        iceavro.read_ocf into exactly the expected manifest_file record —
        the reader has now decoded bytes it did not write."""
        from icerunner_spark.iceberg_export import _MANIFEST_FILE_SCHEMA

        schema_json = json.dumps(_MANIFEST_FILE_SCHEMA)
        sync = b"0123456789ABCDEF"
        ocf = (
            b"Obj\x01"
            + _zz(2)  # metadata map: one block of 2 entries
            + _avro_str("avro.schema") + _avro_str(schema_json)
            + _avro_str("avro.codec") + _avro_str("null")
            + _zz(0)  # map terminator
            + sync
            + _zz(1)                  # block record count
            + _zz(len(self.PAYLOAD))  # block byte size
            + self.PAYLOAD
            + sync
        )
        p = tmp_path / "hand.avro"
        p.write_bytes(ocf)
        schema, meta, records = iceavro.read_ocf(str(p))
        assert schema == _MANIFEST_FILE_SCHEMA
        assert records == [self.RECORD]

    def test_written_file_parses_with_spec_decoder(self, tmp_path):
        """The reverse direction: iceavro.write_ocf's bytes must parse
        with the test's own spec-derived decoder, and the record body
        must be byte-exact against the hand-derived literal."""
        import io as _io

        from icerunner_spark.iceberg_export import _MANIFEST_FILE_SCHEMA

        p = str(tmp_path / "written.avro")
        n = iceavro.write_ocf(
            p, _MANIFEST_FILE_SCHEMA, [self.RECORD],
            metadata={"format-version": "2"},
        )
        raw = open(p, "rb").read()
        assert n == len(raw)
        buf = _io.BytesIO(raw)
        assert buf.read(4) == b"Obj\x01", "bad magic"
        meta = {}
        while True:
            cnt = _read_varlong(buf)
            if cnt == 0:
                break
            if cnt < 0:
                _read_varlong(buf)
                cnt = -cnt
            for _ in range(cnt):
                k = buf.read(_read_varlong(buf)).decode("utf-8")
                meta[k] = buf.read(_read_varlong(buf))
        assert json.loads(meta["avro.schema"]) == _MANIFEST_FILE_SCHEMA
        assert meta["avro.codec"] == b"null"
        assert meta["format-version"] == b"2"
        sync = buf.read(16)
        assert len(sync) == 16
        assert _read_varlong(buf) == 1, "block record count"
        size = _read_varlong(buf)
        body = buf.read(size)
        assert body == self.PAYLOAD, "record body deviates from the spec"
        assert buf.read(16) == sync, "trailing sync differs"
        assert buf.read() == b"", "bytes after final sync"

    def test_negative_block_counts_read(self, tmp_path):
        """Foreign writers may emit size-annotated array blocks
        (negative count, then byte size — Avro spec §binary encoding);
        the reader must accept them even though iceavro never writes
        them."""
        import io as _io

        schema = {"type": "array", "items": "long"}
        items = _zz(7) + _zz(-7)
        blob = _zz(-2) + _zz(len(items)) + items + _zz(0)
        assert iceavro.decode_value(_io.BytesIO(blob), schema) == [7, -7]


class TestContinuousMirror:
    def test_n_cycle_reexport_stays_odelta(self, spark, tmp_path):
        """The continuous-mirror claim (r8 verdict item 6): N
        append/delete cycles re-exporting to ONE dest must write O(delta)
        manifest files per cycle (reuse everything untouched) and read
        back equal at every step. 10 cycles; per-cycle new-manifest
        counts are asserted bounded by the cycle's own commit count, not
        the table's history size."""
        t = IceTable(spark, str(tmp_path / "cm_src"))
        t.create(
            spark.range(0, 20).select(
                F.col("id").alias("k"), (F.col("id") % 4).alias("g")
            )
        )
        dest = str(tmp_path / "cm_exp")
        export_iceberg(t, dest)

        def _manifest_files():
            return {
                f
                for f in os.listdir(os.path.join(dest, "metadata"))
                if f.startswith("manifest-") and f.endswith(".avro")
            }

        per_cycle_new = []
        for cycle in range(10):
            lo = 20 + cycle * 10
            t.append(
                spark.range(lo, lo + 10).select(
                    F.col("id").alias("k"), (F.col("id") % 4).alias("g")
                )
            )
            if cycle % 3 == 1:
                t.delete_where(F.col("k") == lo, mode="merge-on-read")
            before = _manifest_files()
            export_iceberg(t, dest)
            after = _manifest_files()
            assert before <= after, "published manifests removed"
            new = len(after) - len(before)
            per_cycle_new.append(new)
            # O(delta): this cycle committed 1-2 snapshots; a history-
            # proportional rewrite would add ~cycle manifests by now
            assert 1 <= new <= 3, (
                f"cycle {cycle}: {new} new manifests — not O(delta)"
            )
            assert _rows(read_iceberg(spark, dest)) == _rows(t.scan())
        # time travel still resolves across the whole mirrored history
        for s in t.snapshots()[:: max(1, len(t.snapshots()) // 4)]:
            got = read_iceberg(spark, dest, snapshot_id=s.snapshot_id)
            assert _rows(got) == _rows(t.scan(snapshot_id=s.snapshot_id))
        # the per-cycle counts are the SCALE.md §7b evidence
        assert max(per_cycle_new) <= 3


class TestEqualityDeleteRead:
    def test_foreign_equality_deletes_apply(self, spark, tmp_path):
        """A hand-built foreign table in Flink-CDC shape: equality
        delete files (data_file.content=2, equality_ids on k). Spec
        rules exercised: an eq delete at sequence D applies only to data
        files with sequence STRICTLY LESS than D (so the same key
        re-inserted in the delete's own commit survives), and key
        matching is null-safe (a null key value deletes null-key rows).
        The reader used to reject content=2 outright."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from icerunner_spark.iceberg_export import (
            _MANIFEST_FILE_SCHEMA,
            _manifest_entry_schema,
            _uri,
        )

        dest = tmp_path / "cdc"
        (dest / "data").mkdir(parents=True)
        (dest / "metadata").mkdir()

        def _pq_write(name, cols):
            p = str(dest / "data" / name)
            pq.write_table(pa.table(cols), p)
            return p

        # data at seq 1: includes a null key (for the null-safe pin)
        f1 = _pq_write(
            "f1.parquet",
            {
                "k": pa.array([1, 2, 3, None], pa.int64()),
                "v": pa.array(["a", "b", "c", "n"], pa.string()),
            },
        )
        # data at seq 3: re-inserts k=2 in the SAME commit as the first
        # eq delete — strict < means the re-insert survives
        f2 = _pq_write(
            "f2.parquet",
            {
                "k": pa.array([2, 4], pa.int64()),
                "v": pa.array(["b2", "d"], pa.string()),
            },
        )
        # eq delete at seq 3 on k: deletes k=2 and k=null from seq<3
        d1 = _pq_write(
            "d1.parquet", {"k": pa.array([2, None], pa.int64())}
        )
        # eq delete at seq 4 on k: deletes k=4 (applies to both files)
        d2 = _pq_write("d2.parquet", {"k": pa.array([4], pa.int64())})

        def _entry(content, path, nrows, seq, eq_ids=None):
            return {
                "status": 1,
                "snapshot_id": 7,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": content,
                    "file_path": _uri(path),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": nrows,
                    "file_size_in_bytes": os.path.getsize(path),
                    "null_value_counts": None,
                    "lower_bounds": None,
                    "upper_bounds": None,
                    "equality_ids": eq_ids,
                    "sort_order_id": None,
                },
            }

        schema = _manifest_entry_schema([])
        m_data = str(dest / "metadata" / "m-data.avro")
        iceavro.write_ocf(
            m_data,
            schema,
            [_entry(0, f1, 4, 1), _entry(0, f2, 2, 3)],
            metadata={"content": "data", "partition-spec-id": "0"},
        )
        m_del = str(dest / "metadata" / "m-del.avro")
        iceavro.write_ocf(
            m_del,
            schema,
            [
                _entry(2, d1, 2, 3, eq_ids=[1]),
                _entry(2, d2, 1, 4, eq_ids=[1]),
            ],
            metadata={"content": "deletes", "partition-spec-id": "0"},
        )

        def _mf(path, content, seq, rows):
            return {
                "manifest_path": _uri(path),
                "manifest_length": os.path.getsize(path),
                "partition_spec_id": 0,
                "content": content,
                "sequence_number": seq,
                "min_sequence_number": 1,
                "added_snapshot_id": 7,
                "added_files_count": 2,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": rows,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": None,
            }

        ml_path = str(dest / "metadata" / "snap-7-manifest-list.avro")
        iceavro.write_ocf(
            ml_path,
            _MANIFEST_FILE_SCHEMA,
            [_mf(m_data, 0, 3, 6), _mf(m_del, 1, 4, 3)],
            metadata={"format-version": "2", "snapshot-id": "7"},
        )
        meta = {
            "format-version": 2,
            "table-uuid": "00000000-0000-0000-0000-000000000007",
            "location": _uri(str(dest)),
            "last-sequence-number": 4,
            "last-updated-ms": 0,
            "last-column-id": 2,
            "current-schema-id": 0,
            "schemas": [
                {
                    "type": "struct",
                    "schema-id": 0,
                    "fields": [
                        {"id": 1, "name": "k", "required": False, "type": "long"},
                        {"id": 2, "name": "v", "required": False, "type": "string"},
                    ],
                }
            ],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999,
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {
                "schema.name-mapping.default": json.dumps(
                    [
                        {"field-id": 1, "names": ["k"]},
                        {"field-id": 2, "names": ["v"]},
                    ]
                )
            },
            "current-snapshot-id": 7,
            "snapshots": [
                {
                    "snapshot-id": 7,
                    "sequence-number": 4,
                    "timestamp-ms": 0,
                    "manifest-list": _uri(ml_path),
                    "summary": {"operation": "overwrite"},
                    "schema-id": 0,
                }
            ],
            "snapshot-log": [],
            "metadata-log": [],
            "refs": {"main": {"snapshot-id": 7, "type": "branch"}},
        }
        with open(dest / "metadata" / "v1.metadata.json", "w") as f:
            json.dump(meta, f)
        with open(dest / "metadata" / "version-hint.text", "w") as f:
            f.write("1")

        got = _rows(read_iceberg(spark, str(dest)))
        # f1 loses k=2 (eq delete), k=null (null-safe), k=4 absent;
        # f2 keeps k=2 (strict <: same-sequence re-insert survives)
        # but loses k=4 to the seq-4 delete
        assert got == {(1, "a"), (3, "c"), (2, "b2")}
        # the shuffled (non-broadcast) path agrees
        got2 = _rows(
            read_iceberg(spark, str(dest), delete_broadcast_max_bytes=0)
        )
        assert got2 == got


# --------------------------------------------------------------------------- #
# deflate codec + gzip metadata (Java Iceberg's default wire compression)
# --------------------------------------------------------------------------- #


class TestDeflateCodec:
    """Java Iceberg writes Avro manifests with the deflate codec by
    default (``write.avro.compression-codec: gzip`` frames raw RFC-1951
    streams per the Avro spec) and optionally gzips metadata JSON —
    a foreign table import hits both immediately."""

    def test_hand_built_deflate_ocf_decodes(self, tmp_path):
        """Golden direction: the block payload is compressed by the
        TEST with zlib (the reference RFC-1951 implementation), framed
        by hand from the Avro spec — iceavro.read_ocf never wrote any
        of these bytes."""
        import zlib as _zlib

        from icerunner_spark.iceberg_export import _MANIFEST_FILE_SCHEMA

        payload = TestAvroGoldenBytes.PAYLOAD
        co = _zlib.compressobj(6, _zlib.DEFLATED, -15)
        compressed = co.compress(payload) + co.flush()
        sync = b"FEDCBA9876543210"
        ocf = (
            b"Obj\x01"
            + _zz(2)
            + _avro_str("avro.schema")
            + _avro_str(json.dumps(_MANIFEST_FILE_SCHEMA))
            + _avro_str("avro.codec") + _avro_str("deflate")
            + _zz(0)
            + sync
            + _zz(1)                 # record count
            + _zz(len(compressed))   # block byte size = COMPRESSED size
            + compressed
            + sync
        )
        p = tmp_path / "deflate.avro"
        p.write_bytes(ocf)
        schema, meta, records = iceavro.read_ocf(str(p))
        assert records == [TestAvroGoldenBytes.RECORD]

    def test_written_deflate_file_parses_with_spec_decoder(self, tmp_path):
        """Reverse: write_ocf(codec=deflate) framing checked field by
        field with the test's own decoder; the decompressed block body
        must be byte-exact the same record encoding the null codec
        produces (the codec only wraps the block)."""
        import io as _io
        import zlib as _zlib

        from icerunner_spark.iceberg_export import _MANIFEST_FILE_SCHEMA

        p = str(tmp_path / "written-deflate.avro")
        n = iceavro.write_ocf(
            p, _MANIFEST_FILE_SCHEMA, [TestAvroGoldenBytes.RECORD],
            codec="deflate",
        )
        raw = open(p, "rb").read()
        assert n == len(raw)
        buf = _io.BytesIO(raw)
        assert buf.read(4) == b"Obj\x01"
        meta = {}
        while True:
            cnt = _read_varlong(buf)
            if cnt == 0:
                break
            for _ in range(cnt):
                k = buf.read(_read_varlong(buf)).decode("utf-8")
                meta[k] = buf.read(_read_varlong(buf))
        assert meta["avro.codec"] == b"deflate"
        sync = buf.read(16)
        assert _read_varlong(buf) == 1
        size = _read_varlong(buf)
        body = _zlib.decompress(buf.read(size), -15)
        assert body == TestAvroGoldenBytes.PAYLOAD
        assert buf.read(16) == sync
        assert buf.read() == b""

    def test_unknown_codec_rejected(self, tmp_path):
        ocf = (
            b"Obj\x01"
            + _zz(1)
            + _avro_str("avro.codec") + _avro_str("snappy")
            + _zz(0)
        )
        p = tmp_path / "snappy.avro"
        p.write_bytes(ocf + b"0123456789ABCDEF")
        with pytest.raises(ValueError, match="snappy"):
            iceavro.read_ocf(str(p))

    def test_deflate_export_reads_and_validates(self, exported, tmp_path):
        """End to end: a deflate-codec export round-trips through
        read_iceberg (row equality vs the native scan) and passes the
        standalone auditor; every emitted Avro file actually carries the
        deflate codec and the manifest tree is smaller than the null
        export's."""
        import importlib.util as _ilu

        t, null_dest, _ = exported
        dest = str(tmp_path / "deflated")
        export_iceberg(t, dest, avro_codec="deflate")

        codecs, sizes = set(), {}
        for d in (dest, null_dest):
            total = 0
            for name in os.listdir(os.path.join(d, "metadata")):
                if name.endswith(".avro"):
                    fp = os.path.join(d, "metadata", name)
                    total += os.path.getsize(fp)
                    _, fmeta, _ = iceavro.read_ocf(fp)
                    if d == dest:
                        codecs.add(fmeta["avro.codec"])
            sizes[d] = total
        assert codecs == {b"deflate"}
        assert sizes[dest] < sizes[null_dest]

        got = _rows(read_iceberg(t.spark, dest))
        assert got == _rows(t.scan())

        spec = _ilu.spec_from_file_location(
            "iceberg_validate",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools", "iceberg_validate.py",
            ),
        )
        mod = _ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        rep = mod.validate(dest)
        assert rep.as_dict()["ok"], rep.as_dict()["errors"]

    def test_gzip_metadata_json_reads(self, exported, tmp_path):
        """A foreign table whose metadata JSON is gzip-compressed under
        the vN.gz.metadata.json naming must read (version-hint present
        and absent) and audit clean."""
        import gzip
        import importlib.util as _ilu
        import shutil

        t, null_dest, _ = exported
        dest = str(tmp_path / "gz")
        shutil.copytree(null_dest, dest)
        md = os.path.join(dest, "metadata")
        for name in list(os.listdir(md)):
            m = __import__("re").match(r"v(\d+)\.metadata\.json$", name)
            if not m:
                continue
            src = os.path.join(md, name)
            with open(src, "rb") as f:
                raw = f.read()
            with open(
                os.path.join(md, f"v{m.group(1)}.gz.metadata.json"), "wb"
            ) as f:
                f.write(gzip.compress(raw))
            os.remove(src)

        got = _rows(read_iceberg(t.spark, dest))
        assert got == _rows(t.scan())
        # no version-hint: numeric-latest fallback must pick the gz file
        os.remove(os.path.join(md, "version-hint.text"))
        assert _rows(read_iceberg(t.spark, dest)) == got

        spec = _ilu.spec_from_file_location(
            "iceberg_validate",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools", "iceberg_validate.py",
            ),
        )
        mod = _ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        rep = mod.validate(dest)
        assert rep.as_dict()["ok"], rep.as_dict()["errors"]

    def test_incremental_reexport_mixes_codecs(self, spark, tmp_path):
        """A deflate re-export over a null-codec dest reuses the old
        manifests untouched (mixed codecs are spec-legal — codec is
        per-file) and the incremental result still reads equal."""
        t = IceTable(spark, str(tmp_path / "src"))
        df = spark.range(0, 40).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g")
        )
        t.create(df.filter("k < 20"))
        dest = str(tmp_path / "mixed")
        export_iceberg(t, dest)  # null codec
        t.append(df.filter("k >= 20"))
        export_iceberg(t, dest, avro_codec="deflate")
        assert _rows(read_iceberg(spark, dest)) == _rows(t.scan())
        codecs = set()
        for name in os.listdir(os.path.join(dest, "metadata")):
            if name.endswith(".avro"):
                _, fmeta, _ = iceavro.read_ocf(
                    os.path.join(dest, "metadata", name)
                )
                codecs.add(fmeta["avro.codec"])
        assert b"deflate" in codecs and b"null" in codecs


# --------------------------------------------------------------------------- #
# planning-time predicate pruning on import (where=)
# --------------------------------------------------------------------------- #


class TestReadIcebergPruning:
    def _count_footer_reads(self, monkeypatch):
        """read_iceberg reads one parquet footer per surviving data file
        (the schema-grouping step) — counting them observes pruning."""
        import pyarrow.parquet as pq

        calls = {"n": 0}
        real = pq.read_schema

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(pq, "read_schema", counting)
        return calls

    def test_partition_prune_and_exactness(self, spark, tmp_path, monkeypatch):
        """An identity-partitioned export read with where= must (a)
        return exactly the filtered rows, (b) plan only the partition's
        files — observed via footer-read count."""
        t = IceTable(spark, str(tmp_path / "src"))
        df = spark.range(0, 90).select(
            F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("g")
        )
        t.create(df, partition_by=["g"])
        t.delete_where((F.col("k") % 7) == 0, mode="merge-on-read")
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)

        calls = self._count_footer_reads(monkeypatch)
        got = _rows(read_iceberg(spark, dest, where=[("g", "=", 1)]))
        pruned_reads = calls["n"]
        want = _rows(t.scan().filter("g = 1"))
        assert got == want and got

        calls["n"] = 0
        _rows(read_iceberg(spark, dest))
        full_reads = calls["n"]
        assert 0 < pruned_reads < full_reads, (
            f"where= read {pruned_reads} footers vs {full_reads} unpruned"
        )

    def test_bounds_prune_sorted_files(self, spark, tmp_path, monkeypatch):
        """Column-bound pruning: a range predicate over sort-clustered
        files must skip the files whose [min,max] misses the range."""
        t = IceTable(spark, str(tmp_path / "src"))
        t.create(
            spark.range(0, 100).select(F.col("id").alias("k")),
            properties={"write.sort.columns": "k"},
        )
        for lo in (100, 200, 300):
            t.append(
                spark.range(lo, lo + 100).select(F.col("id").alias("k"))
            )
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)

        calls = self._count_footer_reads(monkeypatch)
        got = _rows(read_iceberg(spark, dest, where=[("k", "<", 50)]))
        pruned_reads = calls["n"]
        assert got == {(i,) for i in range(50)}

        calls["n"] = 0
        _rows(read_iceberg(spark, dest))
        full_reads = calls["n"]
        assert 0 < pruned_reads < full_reads

    def test_where_all_pruned_returns_empty_with_schema(self, spark, tmp_path):
        t = IceTable(spark, str(tmp_path / "src"))
        t.create(spark.range(0, 10).select(F.col("id").alias("k")))
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        out = read_iceberg(spark, dest, where=[("k", ">", 10_000)])
        assert out.count() == 0
        assert out.columns == ["k"]

    def test_residual_filter_is_exact_within_file(self, spark, tmp_path):
        """A predicate no file can be pruned by (mid-range) must still
        filter exactly — the residual Catalyst filter, not pruning, is
        the correctness path."""
        t = IceTable(spark, str(tmp_path / "src"))
        t.create(spark.range(0, 100).select(F.col("id").alias("k")))
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        got = _rows(
            read_iceberg(
                spark, dest, where=[("k", ">=", 10), ("k", "<", 13)]
            )
        )
        assert got == {(10,), (11,), (12,)}


class TestExpireThenReexport:
    def test_history_shrink_between_exports(self, spark, tmp_path):
        """Continuous mirror with retention: snapshots EXPIRED between
        two incremental exports must not corrupt the dest — the new
        metadata carries only live history, rows read equal, and the
        standalone audit stays clean (expired-snapshot references in
        old metadata-log entries are Iceberg-normal)."""
        import importlib.util as _ilu

        t = IceTable(spark, str(tmp_path / "src"))
        df = spark.range(0, 60).select(F.col("id").alias("k"))
        t.create(df.filter("k < 20").coalesce(1))
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        t.append(df.filter("k >= 20 and k < 40").coalesce(1))
        export_iceberg(t, dest)
        t.append(df.filter("k >= 40").coalesce(1))
        t.expire_snapshots(keep_last=1, older_than_ms=0)
        meta_path = export_iceberg(t, dest)
        assert meta_path.endswith("v3.metadata.json")
        assert _rows(read_iceberg(spark, dest)) == _rows(t.scan())

        spec = _ilu.spec_from_file_location(
            "iceberg_validate",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools", "iceberg_validate.py",
            ),
        )
        mod = _ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        rep = mod.validate(dest).as_dict()
        assert rep["ok"], rep["errors"]


# --------------------------------------------------------------------------- #
# incremental append scan (read_iceberg_changes)
# --------------------------------------------------------------------------- #


class TestReadIcebergChanges:
    def _snap_ids(self, dest):
        from icerunner_spark.iceberg_export import _load_metadata

        meta = _load_metadata(dest)
        ordered = sorted(
            meta["snapshots"], key=lambda s: s.get("sequence-number", 0)
        )
        return [s["snapshot-id"] for s in ordered]

    def test_delta_between_snapshots(self, spark, tmp_path):
        from icerunner_spark.iceberg_export import read_iceberg_changes

        t = IceTable(spark, str(tmp_path / "src"))
        df = spark.range(0, 90).select(F.col("id").alias("k"))
        t.create(df.filter("k < 30").coalesce(1))
        t.append(df.filter("k >= 30 and k < 60").coalesce(1))
        t.append(df.filter("k >= 60").coalesce(1))
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        s1, s2, s3 = self._snap_ids(dest)

        got = _rows(
            read_iceberg_changes(spark, dest, start_snapshot_id=s1)
        )
        assert got == {(i,) for i in range(30, 90)}
        mid = _rows(
            read_iceberg_changes(
                spark, dest, start_snapshot_id=s1, end_snapshot_id=s2
            )
        )
        assert mid == {(i,) for i in range(30, 60)}
        none = _rows(
            read_iceberg_changes(
                spark, dest, start_snapshot_id=s3, end_snapshot_id=s3
            )
        )
        assert none == set()

    def test_replace_skipped_and_delete_raises(self, spark, tmp_path):
        from icerunner_spark.iceberg_export import read_iceberg_changes

        t = IceTable(spark, str(tmp_path / "src"))
        df = spark.range(0, 60).select(F.col("id").alias("k"))
        t.create(df.filter("k < 20").coalesce(1))
        t.append(df.filter("k >= 20 and k < 40").coalesce(1))
        t.compact()  # 'replace': rewrites files, no logical change
        t.append(df.filter("k >= 40").coalesce(1))
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        ids = self._snap_ids(dest)

        # from the first snapshot: the compaction must contribute
        # NOTHING (its rewritten files would duplicate rows 0-39)
        got = _rows(
            read_iceberg_changes(spark, dest, start_snapshot_id=ids[0])
        )
        assert got == {(i,) for i in range(20, 60)}

        t.delete_where("k % 7 = 0")
        export_iceberg(t, dest)
        ids2 = self._snap_ids(dest)
        with pytest.raises(ValueError, match="not an append"):
            read_iceberg_changes(
                spark, dest, start_snapshot_id=ids2[0]
            ).collect()

    def test_non_ancestor_raises(self, spark, tmp_path):
        from icerunner_spark.iceberg_export import read_iceberg_changes

        t = IceTable(spark, str(tmp_path / "src"))
        t.create(spark.range(0, 10).select(F.col("id").alias("k")))
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        (s1,) = self._snap_ids(dest)
        with pytest.raises(ValueError, match="no such snapshot"):
            read_iceberg_changes(spark, dest, start_snapshot_id=s1 + 1)

    def test_partitioned_delta_carries_partition_column(self, spark, tmp_path):
        """Appended files in a hive-partitioned table drop the partition
        column from the parquet — the delta must inject it from manifest
        partition values, same as the full read."""
        from icerunner_spark.iceberg_export import read_iceberg_changes

        t = IceTable(spark, str(tmp_path / "src"))
        df = spark.range(0, 40).select(
            F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("g")
        )
        t.create(df.filter("k < 20").coalesce(1), partition_by=["g"])
        t.append(df.filter("k >= 20").coalesce(1))
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        s1, _s2 = self._snap_ids(dest)
        got = _rows(
            read_iceberg_changes(spark, dest, start_snapshot_id=s1)
        )
        assert got == {(i, i % 2) for i in range(20, 40)}


class TestOriginalV1Import:
    def test_hand_built_original_v1_table_reads(self, spark, tmp_path):
        """A foreign table in ORIGINAL Iceberg v1 shape — singular
        'schema' and 'partition-spec' metadata fields (pre-schema-
        evolution writers), snapshots carrying an inline 'manifests'
        path list instead of a manifest-list Avro, manifest entries
        without any sequence-number fields, data_file records with v1's
        block_size_in_bytes and no content field. read_iceberg must
        resolve the singular schema, synthesize the manifest-file level,
        pull the spec id from the manifest's own OCF header, and
        attribute incremental changes per-entry (read_iceberg_changes
        has no added_snapshot_id to go by at the list level)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from icerunner_spark.iceberg_export import (
            _uri,
            read_iceberg,
            read_iceberg_changes,
        )

        dest = tmp_path / "v1tab"
        (dest / "data").mkdir(parents=True)
        (dest / "metadata").mkdir()

        def _datafile(name, ks):
            p = str(dest / "data" / name)
            pq.write_table(pa.table({"k": pa.array(ks, pa.int64())}), p)
            return p

        f1 = _datafile("f1.parquet", [1, 2])
        f2 = _datafile("f2.parquet", [3, 4, 5])

        # v1 manifest entry: no sequence fields; v1 data_file shape
        entry_schema = {
            "type": "record",
            "name": "manifest_entry",
            "fields": [
                {"name": "status", "type": "int"},
                {"name": "snapshot_id", "type": ["null", "long"],
                 "default": None},
                {
                    "name": "data_file",
                    "type": {
                        "type": "record",
                        "name": "r2",
                        "fields": [
                            {"name": "file_path", "type": "string"},
                            {"name": "file_format", "type": "string"},
                            {
                                "name": "partition",
                                "type": {"type": "record", "name": "r102",
                                         "fields": []},
                            },
                            {"name": "record_count", "type": "long"},
                            {"name": "file_size_in_bytes", "type": "long"},
                            {"name": "block_size_in_bytes", "type": "long"},
                        ],
                    },
                },
            ],
        }

        def _manifest(name, path, nrows, sid):
            mp = str(dest / "metadata" / name)
            iceavro.write_ocf(
                mp,
                entry_schema,
                [
                    {
                        "status": 1,
                        "snapshot_id": sid,
                        "data_file": {
                            "file_path": _uri(path),
                            "file_format": "PARQUET",
                            "partition": {},
                            "record_count": nrows,
                            "file_size_in_bytes": os.path.getsize(path),
                            "block_size_in_bytes": 67108864,
                        },
                    }
                ],
                metadata={"partition-spec-id": "0", "content": "data"},
            )
            return mp

        m1 = _manifest("m1.avro", f1, 2, 11)
        m2 = _manifest("m2.avro", f2, 3, 12)

        meta = {
            "format-version": 1,
            "table-uuid": "00000000-0000-0000-0000-000000000011",
            "location": _uri(str(dest)),
            "last-updated-ms": 0,
            "last-column-id": 1,
            # ORIGINAL v1: singular schema / partition-spec, no ids
            "schema": {
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "k", "required": False, "type": "long"}
                ],
            },
            "partition-spec": [],
            "properties": {
                "schema.name-mapping.default": json.dumps(
                    [{"field-id": 1, "names": ["k"]}]
                )
            },
            "current-snapshot-id": 12,
            "snapshots": [
                {
                    "snapshot-id": 11,
                    "timestamp-ms": 0,
                    "summary": {"operation": "append"},
                    "manifests": [_uri(m1)],
                },
                {
                    "snapshot-id": 12,
                    "parent-snapshot-id": 11,
                    "timestamp-ms": 1,
                    "summary": {"operation": "append"},
                    # v1 snapshots list EVERY live manifest inline
                    "manifests": [_uri(m1), _uri(m2)],
                },
            ],
            "snapshot-log": [],
        }
        with open(dest / "metadata" / "v1.metadata.json", "w") as f:
            json.dump(meta, f)
        with open(dest / "metadata" / "version-hint.text", "w") as f:
            f.write("1")

        got = read_iceberg(spark, str(dest))
        assert _rows(got) == {(1,), (2,), (3,), (4,), (5,)}
        # time travel to the first snapshot
        assert _rows(read_iceberg(spark, str(dest), snapshot_id=11)) == {
            (1,), (2,),
        }
        # incremental append scan: only snapshot 12's additions, even
        # though its inline manifest list repeats m1
        delta = read_iceberg_changes(spark, str(dest), start_snapshot_id=11)
        assert _rows(delta.select("k")) == {(3,), (4,), (5,)}

    def test_original_v1_partitioned_changelog_injects_partition(
        self, spark, tmp_path
    ):
        """Hive-style original-v1 layout: the partition column exists
        ONLY in manifest metadata (data parquets carry just `k`), and
        the synthesized manifest-file entries carry spec_id=None.
        read_iceberg_changes must backfill the spec id from each
        manifest's own OCF header — identity_by_spec.get(None) would
        silently inject NULL for `g` (the r9->r10 ADVICE.md medium)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from icerunner_spark.iceberg_export import (
            _uri,
            read_iceberg,
            read_iceberg_changes,
        )

        dest = tmp_path / "v1part"
        (dest / "data").mkdir(parents=True)
        (dest / "metadata").mkdir()

        def _datafile(name, ks):
            p = str(dest / "data" / name)
            # Hive-style: partition column NOT in the file
            pq.write_table(pa.table({"k": pa.array(ks, pa.int64())}), p)
            return p

        f1 = _datafile("g0.parquet", [1, 2])
        f2 = _datafile("g1.parquet", [3, 4])

        entry_schema = {
            "type": "record",
            "name": "manifest_entry",
            "fields": [
                {"name": "status", "type": "int"},
                {"name": "snapshot_id", "type": ["null", "long"],
                 "default": None},
                {
                    "name": "data_file",
                    "type": {
                        "type": "record",
                        "name": "r2",
                        "fields": [
                            {"name": "file_path", "type": "string"},
                            {"name": "file_format", "type": "string"},
                            {
                                "name": "partition",
                                "type": {
                                    "type": "record",
                                    "name": "r102",
                                    "fields": [
                                        {"name": "g",
                                         "type": ["null", "int"],
                                         "default": None}
                                    ],
                                },
                            },
                            {"name": "record_count", "type": "long"},
                            {"name": "file_size_in_bytes", "type": "long"},
                            {"name": "block_size_in_bytes", "type": "long"},
                        ],
                    },
                },
            ],
        }

        def _manifest(name, path, nrows, sid, g):
            mp = str(dest / "metadata" / name)
            iceavro.write_ocf(
                mp,
                entry_schema,
                [
                    {
                        "status": 1,
                        "snapshot_id": sid,
                        "data_file": {
                            "file_path": _uri(path),
                            "file_format": "PARQUET",
                            "partition": {"g": g},
                            "record_count": nrows,
                            "file_size_in_bytes": os.path.getsize(path),
                            "block_size_in_bytes": 67108864,
                        },
                    }
                ],
                metadata={"partition-spec-id": "0", "content": "data"},
            )
            return mp

        m1 = _manifest("m1.avro", f1, 2, 21, 0)
        m2 = _manifest("m2.avro", f2, 2, 22, 1)

        meta = {
            "format-version": 1,
            "table-uuid": "00000000-0000-0000-0000-000000000012",
            "location": _uri(str(dest)),
            "last-updated-ms": 0,
            "last-column-id": 2,
            "schema": {
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "k", "required": False,
                     "type": "long"},
                    {"id": 2, "name": "g", "required": False,
                     "type": "int"},
                ],
            },
            # ORIGINAL v1: singular bare field list = spec 0
            "partition-spec": [
                {"name": "g", "transform": "identity",
                 "source-id": 2, "field-id": 1000}
            ],
            "properties": {
                "schema.name-mapping.default": json.dumps(
                    [{"field-id": 1, "names": ["k"]}]
                )
            },
            "current-snapshot-id": 22,
            "snapshots": [
                {
                    "snapshot-id": 21,
                    "timestamp-ms": 0,
                    "summary": {"operation": "append"},
                    "manifests": [_uri(m1)],
                },
                {
                    "snapshot-id": 22,
                    "parent-snapshot-id": 21,
                    "timestamp-ms": 1,
                    "summary": {"operation": "append"},
                    "manifests": [_uri(m1), _uri(m2)],
                },
            ],
            "snapshot-log": [],
        }
        with open(dest / "metadata" / "v1.metadata.json", "w") as f:
            json.dump(meta, f)
        with open(dest / "metadata" / "version-hint.text", "w") as f:
            f.write("1")

        # full read injects g from manifest partition values
        assert _rows(read_iceberg(spark, str(dest))) == {
            (1, 0), (2, 0), (3, 1), (4, 1),
        }
        # changelog: g must be the manifest value, not NULL
        delta = read_iceberg_changes(spark, str(dest), start_snapshot_id=21)
        assert _rows(delta.select("k", "g")) == {(3, 1), (4, 1)}

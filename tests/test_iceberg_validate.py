"""tools/iceberg_validate.py — the standalone export conformance
auditor. A clean export (including MOR deletes, partitioning, and
incremental re-export history) must validate with zero errors, and each
corruption class must be caught, not crashed on."""

from __future__ import annotations

import importlib.util
import json
import os
import re

import pytest
from pyspark.sql import functions as F

from icerunner_spark.catalog import Catalog
from icerunner_spark.iceberg_export import export_iceberg
from icerunner_spark.sources.testdata import load_table

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _validator():
    spec = importlib.util.spec_from_file_location(
        "iceberg_validate", os.path.join(_HERE, "tools/iceberg_validate.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("icex_validate")
    cat = Catalog(spark, str(base / "wh"))
    t = cat.table("orders_v")
    o = load_table(spark, "orders", "/root/testdata/sf0.001").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    t.create(o.filter(F.col("o_orderkey") % 2 == 0), partition_by=["o_orderstatus"])
    t.delete_where("o_orderkey % 10 = 0", mode="merge-on-read")
    dest = str(base / "exported")
    export_iceberg(t, dest)
    # incremental re-export after more history: append + CoW-ish update
    t.append(o.filter(F.col("o_orderkey") % 2 == 1))
    export_iceberg(t, dest)
    return dest


class TestValidatorPasses:
    def test_clean_export_validates(self, exported):
        rep = _validator().validate(exported).as_dict()
        assert rep["errors"] == []
        assert rep["checked"]["metadata_files"] >= 2  # incremental history
        assert rep["checked"]["manifest_lists"] >= 2
        assert rep["checked"]["data_files"] >= 1
        assert rep["checked"]["delete_files"] >= 1
        assert rep["checked"]["delete_rows"] >= 1

    def test_cli_exit_codes(self, exported):
        import subprocess
        import sys

        r = subprocess.run(
            [sys.executable, os.path.join(_HERE, "tools/iceberg_validate.py"),
             exported, "--json"],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert json.loads(r.stdout)["ok"] is True


class TestValidatorCatches:
    def test_truncated_manifest_reports_not_crashes(self, exported, tmp_path, spark):
        v = _validator()
        # fresh private export we may corrupt freely
        cat = Catalog(spark, str(tmp_path / "wh"))
        t = cat.table("nation_c")
        t.create(load_table(spark, "nation", "/root/testdata/sf0.001"))
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        assert v.validate(dest).as_dict()["ok"]
        manifest = next(
            os.path.join(dest, "metadata", f)
            for f in os.listdir(os.path.join(dest, "metadata"))
            if f.startswith("manifest-") and f.endswith(".avro")
        )
        size = os.path.getsize(manifest)
        with open(manifest, "r+b") as fh:
            fh.truncate(size - 10)
        rep = v.validate(dest).as_dict()
        assert not rep["ok"]
        assert any(
            "manifest_length" in e or "undecodable" in e for e in rep["errors"]
        )

    def test_tampered_metadata_and_hint(self, exported, tmp_path, spark):
        v = _validator()
        cat = Catalog(spark, str(tmp_path / "wh"))
        t = cat.table("nation_c2")
        t.create(load_table(spark, "nation", "/root/testdata/sf0.001"))
        t.delete_where("n_nationkey % 5 = 0", mode="merge-on-read")
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        md_dir = os.path.join(dest, "metadata")
        latest = sorted(
            (f for f in os.listdir(md_dir) if re.match(r"v\d+\.metadata\.json", f)),
            key=lambda f: int(re.search(r"\d+", f).group()),
        )[-1]
        with open(os.path.join(md_dir, latest)) as fh:
            meta = json.load(fh)
        meta["current-snapshot-id"] = 999
        with open(os.path.join(md_dir, latest), "w") as fh:
            json.dump(meta, fh)
        rep = v.validate(dest).as_dict()
        assert any("current-snapshot-id" in e for e in rep["errors"])
        with open(os.path.join(md_dir, "version-hint.text"), "w") as fh:
            fh.write("999")
        rep = v.validate(dest).as_dict()
        assert any("version-hint" in e for e in rep["errors"])

    def test_deleted_file_detected(self, tmp_path, spark):
        v = _validator()
        cat = Catalog(spark, str(tmp_path / "wh"))
        t = cat.table("nation_c3")
        t.create(load_table(spark, "nation", "/root/testdata/sf0.001"))
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        data_dir = os.path.join(dest, "data")
        victim = next(
            os.path.join(root, f)
            for root, _d, files in os.walk(data_dir)
            for f in files
            if f.endswith(".parquet")
        )
        os.remove(victim)
        rep = v.validate(dest).as_dict()
        assert any("missing on disk" in e for e in rep["errors"])


class TestCliVerb:
    def test_validate_iceberg_cli(self, exported):
        from icerunner_spark.cli import main as cli_main

        assert cli_main(["validate-iceberg", "-p", exported]) == 0

    def test_validate_iceberg_cli_invalid(self, tmp_path, spark):
        from icerunner_spark.cli import main as cli_main

        cat = Catalog(spark, str(tmp_path / "wh"))
        t = cat.table("nation_cli")
        t.create(load_table(spark, "nation", "/root/testdata/sf0.001"))
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        victim = next(
            os.path.join(root, f)
            for root, _d, files in os.walk(os.path.join(dest, "data"))
            for f in files
        )
        os.remove(victim)
        assert cli_main(["validate-iceberg", "-p", dest]) == 1


class TestPartitionSummaryBounds:
    def test_bound_violations_and_null_flags_caught(self):
        v = _validator()
        rep = v.Report()
        ml = {"manifest_path": "m.avro", "partitions": [
            {"contains_null": False, "lower_bound": b"F", "upper_bound": b"O"}]}
        entries = [
            {"status": 1, "data_file": {"partition": {"s": "P"}}},
            {"status": 0, "data_file": {"partition": {"s": None}}},
        ]
        v._check_partition_summaries(ml, entries, {"fields": [{"name": "s"}]}, rep)
        assert any("upper_bound" in e for e in rep.errors)
        assert any("contains_null" in e for e in rep.errors)

    def test_integer_bounds(self):
        v = _validator()
        rep = v.Report()
        ml = {"manifest_path": "m.avro", "partitions": [
            {"contains_null": False,
             "lower_bound": (5).to_bytes(4, "little", signed=True),
             "upper_bound": (9).to_bytes(4, "little", signed=True)}]}
        entries = [{"status": 1, "data_file": {"partition": {"k": 3}}}]
        v._check_partition_summaries(ml, entries, {"fields": [{"name": "k"}]}, rep)
        assert any("lower_bound" in e for e in rep.errors)


class TestColumnBoundsAudit:
    """Manifest lower/upper bounds are load-bearing (read_iceberg and
    foreign engines prune files on them) — the auditor re-measures the
    true per-column min/max from the parquet data and must flag a bound
    that no longer bounds it."""

    def _tamper_long_bound(self, dest, kind):
        import struct

        from icerunner_spark import iceavro

        manifest = next(
            os.path.join(dest, "metadata", f)
            for f in sorted(os.listdir(os.path.join(dest, "metadata")))
            if f.startswith("manifest-") and f.endswith("-0.avro")
        )
        schema, fmeta, entries = iceavro.read_ocf(manifest)
        bumped = False
        for e in entries:
            df = e.get("data_file") or {}
            for kv in df.get(kind) or []:
                raw = bytes(kv["value"])
                if len(raw) == 8 and not bumped:
                    (v,) = struct.unpack("<q", raw)
                    # lower bound raised above the min / upper lowered
                    # below the max — both must be caught
                    delta = 1 if kind == "lower_bounds" else -1
                    kv["value"] = struct.pack("<q", v + delta)
                    bumped = True
        assert bumped, "no 8-byte long bound found to tamper"
        extras = {
            k: v
            for k, v in fmeta.items()
            if k not in ("avro.schema", "avro.codec")
        }
        iceavro.write_ocf(manifest, schema, entries, metadata=extras)
        return manifest

    def test_clean_bounds_pass_and_are_checked(self, tmp_path, spark):
        v = _validator()
        cat = Catalog(spark, str(tmp_path / "wh"))
        t = cat.table("orders_b")
        t.create(
            load_table(spark, "orders", "/root/testdata/sf0.001").select(
                "o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus"
            )
        )
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        rep = v.validate(dest).as_dict()
        assert rep["ok"], rep["errors"]

    @pytest.mark.parametrize("kind", ["lower_bounds", "upper_bounds"])
    def test_tampered_bound_is_caught(self, tmp_path, spark, kind):
        v = _validator()
        cat = Catalog(spark, str(tmp_path / "wh"))
        t = cat.table(f"orders_t_{kind}")
        t.create(
            load_table(spark, "orders", "/root/testdata/sf0.001").select(
                "o_orderkey", "o_totalprice"
            )
        )
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        assert v.validate(dest).as_dict()["ok"]
        self._tamper_long_bound(dest, kind)
        rep = v.validate(dest).as_dict()
        want = "lower_bound" if kind == "lower_bounds" else "upper_bound"
        assert any(
            want in e and "does not bound actual" in e for e in rep["errors"]
        ), rep["errors"]


class TestIdentityPartitionAudit:
    def test_tampered_partition_value_is_caught(self, tmp_path, spark):
        """A manifest that claims the wrong identity-partition value must
        be flagged: readers inject/prune on these values, so a bad one is
        silent wrong data."""
        from icerunner_spark import iceavro

        v = _validator()
        cat = Catalog(spark, str(tmp_path / "wh"))
        t = cat.table("orders_p")
        t.create(
            load_table(spark, "orders", "/root/testdata/sf0.001").select(
                "o_orderkey", "o_orderstatus"
            ).coalesce(1),
            partition_by=["o_orderstatus"],
        )
        dest = str(tmp_path / "exp")
        export_iceberg(t, dest)
        assert v.validate(dest).as_dict()["ok"]

        manifest = next(
            os.path.join(dest, "metadata", f)
            for f in sorted(os.listdir(os.path.join(dest, "metadata")))
            if f.startswith("manifest-") and f.endswith("-0.avro")
        )
        schema, fmeta, entries = iceavro.read_ocf(manifest)
        part = entries[0]["data_file"]["partition"]
        key = next(iter(part))
        assert isinstance(part[key], str)
        # same-length tamper so the manifest_length check can't mask
        # the partition-value check
        assert part[key] != "X" * len(part[key])
        part[key] = "X" * len(part[key])
        extras = {
            k: val for k, val in fmeta.items()
            if k not in ("avro.schema", "avro.codec")
        }
        iceavro.write_ocf(manifest, schema, entries, metadata=extras)
        rep = v.validate(dest).as_dict()
        # hive-layout tables drop the column from the parquet, so the
        # cross-check is against the hive path value; a table that keeps
        # the column would produce the "column holds other values" form
        assert any(
            "column holds other values" in e
            or "disagrees with hive path value" in e
            for e in rep["errors"]
        ), rep["errors"]

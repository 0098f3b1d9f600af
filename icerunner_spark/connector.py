"""IceRunnerConnector parity API (reference: icerunner.py:49-259).

Same operator surface as the reference connector —
``create_table / insert / query / count / sql / tables /
get_current_snapshot_id / get_changes_since_snapshot`` — re-expressed on the
Spark engine and the snapshot table format:

- No per-query "view reflection" (icerunner.py:82-103): temp views are
  registered lazily pointing at the *latest* snapshot manifest, a pure
  metadata operation.
- ``sql`` runs through ``spark.sql`` — the entire delegated DuckDB surface
  (SURVEY.md §2.B) comes with it: joins, windows, grouping sets, set ops,
  array/map/JSON functions, sampling.
- CDC is a true incremental read (files added in the snapshot range), not
  the reference's broken theta-join (icerunner.py:224-259).
- Arrow is the interchange format at the API boundary, matching the
  reference's columnar-everywhere model (SURVEY.md §1.2).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from icerunner_spark.catalog import Catalog
from icerunner_spark.table import IceTable, NoSuchTableError


def arrow_to_df(spark: SparkSession, data: pa.Table) -> DataFrame:
    """Arrow Table -> Spark DataFrame across the Arrow batch channel.

    Full type lattice: int8/16/32/64, float32/64, bool, string, binary,
    date, timestamp, decimal, list, struct, map all survive (the reference
    collapses unknown types to strings — icerunner.py:112-131 — a quirk we
    deliberately do not replicate, SURVEY.md §1.2)."""
    # Timestamps: normalize to microseconds (Spark's native resolution) to
    # avoid ns truncation surprises at the boundary.
    fields = []
    cols = []
    for field_, col in zip(data.schema, data.columns):
        if pa.types.is_timestamp(field_.type) and field_.type.unit != "us":
            t = pa.timestamp("us", tz=field_.type.tz)
            fields.append(pa.field(field_.name, t, field_.nullable))
            cols.append(col.cast(t))
        else:
            fields.append(field_)
            cols.append(col)
    data = pa.Table.from_arrays(cols, schema=pa.schema(fields))
    # PySpark >= 4.0 takes an Arrow Table directly (zero pandas lossiness).
    return spark.createDataFrame(data)


def df_to_arrow(df: DataFrame) -> pa.Table:
    """Spark DataFrame -> Arrow Table (driver-side materialization; the
    Flight server streams per-batch instead for large results)."""
    return df.toArrow()


class Connector:
    """Spark-backed replacement for the reference's IceRunnerConnector."""

    def __init__(self, spark: SparkSession, warehouse_path: str):
        self.spark = spark
        self.catalog = Catalog(spark, warehouse_path)

    # -- catalog ----------------------------------------------------- #

    @property
    def tables(self) -> list[str]:
        """List tables in the namespace (icerunner.py:105-110)."""
        return self.catalog.list_tables()

    def table(self, name: str) -> IceTable:
        return self.catalog.table(name)

    # -- writes ------------------------------------------------------ #

    def create_table(
        self, table_name: str, data: pa.Table,
        partition_by: list[str] | None = None,
    ) -> bool:
        """Create from the first batch's schema and load it — the
        create-on-first-put flow (icerunner.py:133-161). Idempotent:
        returns True if the table already exists. ``partition_by``
        identity-partitions the table (hive-style layout, partition-
        pruned scans; beyond reference parity — it creates every table
        unpartitioned, icerunner.py:154-157)."""
        t = self.catalog.table(table_name)
        if t.exists():
            return True
        t.create(arrow_to_df(self.spark, data), partition_by=partition_by)
        return True

    def insert(self, table_name: str, data: pa.Table) -> bool:
        """Atomic snapshot append (icerunner.py:163-178)."""
        t = self.catalog.table(table_name)
        if not t.exists():
            return False
        t.append(arrow_to_df(self.spark, data))
        return True

    # -- reads ------------------------------------------------------- #

    def query(self, table_name: str) -> pa.Table:
        """Full scan -> Arrow (icerunner.py:180-188)."""
        return df_to_arrow(self.scan(table_name))

    def scan(self, table_name: str, snapshot_id: int | None = None) -> DataFrame:
        """Lazy scan (preferred over query() for anything large)."""
        return self.catalog.table(table_name).scan(snapshot_id)

    def count(self, table_name: str) -> int:
        """COUNT(*) (icerunner.py:190-198). Answered from manifest
        metadata when provably exact (sum of file row counts minus
        positional-delete positions — a driver-side walk, no Spark job;
        at 100 TB this is the difference between milliseconds and a
        cluster scan), falling back to a real count when metadata can't
        answer (pending equality deletes)."""
        t = self.catalog.table(table_name)
        n = t.metadata_count()
        return n if n is not None else t.scan().count()

    def sql(self, sql_command: str) -> pa.Table:
        """Arbitrary SQL over the managed tables (icerunner.py:200-207).
        Registers each table as a temp view resolved at call time."""
        return df_to_arrow(self.sql_df(sql_command))

    def sql_df(self, sql_command: str) -> DataFrame:
        # the engine's text/vector primitives are in scope as SQL
        # functions (ice_token_count, ice_cos_sim, ...) for every SQL
        # entry point: this method, Flight sql tickets, the CLI verb
        from icerunner_spark.functions.sql_udfs import register_sql_functions

        register_sql_functions(self.spark)
        # Register ONLY what the statement (transitively, through any
        # referenced catalog views) mentions: per-statement cost is
        # O(referenced names), not O(catalog). Matching is a lowercase
        # substring test — Spark SQL identifiers are case-insensitive,
        # and over-matching (a table name inside a string literal) only
        # costs a spare registration, never a miss.
        texts = [sql_command.lower()]
        view_sqls: dict[str, str] = {}
        for vname in self.catalog.list_views():
            try:
                view_sqls[vname] = self.catalog.view_sql(vname)
            except Exception:
                view_sqls[vname] = ""  # dangling: referencing it errors
        referenced_views: list[str] = []
        changed = True
        while changed:
            changed = False
            for vname, vsql in view_sqls.items():
                if vname in referenced_views:
                    continue
                if any(vname.lower() in t for t in texts):
                    referenced_views.append(vname)
                    texts.append(vsql.lower())
                    changed = True
        for name in self.tables:
            if not any(name.lower() in t for t in texts):
                continue
            t = self.catalog.table(name)
            t.scan().createOrReplaceTempView(name)
            # Iceberg-style metadata tables on the SQL surface
            # (SELECT * FROM <t>.files → <t>__files here: temp-view
            # names can't carry dots). Built ONLY when referenced —
            # materializing files_df costs a footer walk.
            for suffix, df_of in (
                ("files", t.files_df),
                ("partitions", t.partitions_df),
                ("snapshots", t.snapshots_df),
                ("refs", t.refs_df),
                ("history", t.history_df),
            ):
                view = f"{name}__{suffix}"
                if not any(view.lower() in t_ for t_ in texts):
                    continue
                try:
                    df_of().createOrReplaceTempView(view)
                except Exception:
                    pass  # a racing drop must not break unrelated SQL
        # referenced catalog views register until fixpoint so a view on
        # a view resolves regardless of listing order (analysis of the
        # outer one fails harmlessly until the inner one exists)
        pending = list(referenced_views)
        for _ in range(len(pending)):
            still: list[str] = []
            for vname in pending:
                try:
                    self.spark.sql(
                        view_sqls[vname]
                    ).createOrReplaceTempView(vname)
                except Exception:
                    still.append(vname)
            if not still:
                break
            pending = still
        return self.spark.sql(sql_command)

    # -- snapshots / CDC --------------------------------------------- #

    def get_current_snapshot_id(self, table_name: str) -> int | None:
        """Latest snapshot id or None (icerunner.py:209-222)."""
        try:
            snap = self.catalog.table(table_name).current_snapshot()
        except NoSuchTableError:
            return None
        return snap.snapshot_id if snap else None

    def get_changes_since_snapshot(
        self, table_name: str, snapshot_id: int | None
    ) -> pa.Table:
        """Rows appended strictly after ``snapshot_id`` (icerunner.py:224-259,
        with corrected semantics — see IceTable.scan_changes)."""
        return df_to_arrow(self.scan_changes(table_name, snapshot_id))

    def scan_changes(
        self, table_name: str, snapshot_id: int | None,
        end_snapshot_id: int | None = None,
    ) -> DataFrame:
        return self.catalog.table(table_name).scan_changes(snapshot_id, end_snapshot_id)

"""Spark Python DataSource over the Flight serve path: executors pull
snapshot-pinned table slices straight from a Flight server in parallel.

``spark.read.format("icerunner_flight").option("url", "grpc://h:p/t").load()``

This closes the last driver-side bottleneck on the serve path
(SURVEY.md §7 "serve-path scale"): ``flight/client.py
read_table_parallel`` already moves k slices over k threads, but the
result still lands in ONE client process. Here each *executor task*
opens its own ``do_get`` against its own slice ticket, so a 100 TB
table fans out across the cluster and no single process ever holds the
table. Slices come from the server's ``get_slices`` command
(flight/server.py) — disjoint manifest slices, all pinned to the same
snapshot id at planning time, so a concurrent commit can't tear the
read: every task resolves the same frozen file list.

The reference's serve path materializes the entire table in the server
before streaming one connection (icerunner.py:278-279); this module is
the Spark-native inversion of that design.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class FlightSlicePartition(InputPartition):
    """One snapshot-pinned slice: (endpoint location, opaque ticket).

    Only plain picklable fields — this object ships to executors."""

    def __init__(self, uri: str, ticket: bytes):
        self.uri = uri
        self.ticket = ticket


def _normalize_batch(batch):
    """Cast ns-timestamp columns to µs: legacy servers (or INT96 parquet
    read through pyarrow) stream timestamp[ns] batches, which Spark's
    Arrow conversion rejects outright. µs is lossless for every value the
    engine writes (µs-aligned) and truncates sub-µs the same way the
    parquet reader would."""
    import pyarrow as pa

    cols, fields, changed = [], [], False
    for field, col in zip(batch.schema, batch.columns):
        t = field.type
        if pa.types.is_timestamp(t) and t.unit == "ns":
            t = pa.timestamp("us", tz=t.tz)
            col = col.cast(t)
            changed = True
        cols.append(col)
        fields.append(pa.field(field.name, t, field.nullable))
    if not changed:
        return batch
    return pa.RecordBatch.from_arrays(cols, schema=pa.schema(fields))


def _parse(options) -> tuple[str, int, str, int]:
    from icerunner_spark.flight.client import flight_url_table, parse_flight_url

    url = options.get("url")
    if not url:
        raise ValueError("icerunner_flight requires option 'url' (grpc://host:port/table)")
    host, port = parse_flight_url(url)
    table = options.get("table") or flight_url_table(url)
    if not table:
        raise ValueError("icerunner_flight: no table in url path or 'table' option")
    return host, port, table, int(options.get("slices", "8"))


def _columns_option(options) -> list | None:
    raw = options.get("columns") or ""
    cols = [c.strip() for c in raw.split(",") if c.strip()]
    return cols or None


def _filter_to_conjunct(f) -> list | None:
    """One Spark DataSource Filter -> a JSON-safe ``[col, op, value]``
    ticket conjunct, or None when the filter can't ride the wire (nested
    column, unsupported shape/value type). Date/timestamp values travel
    as ISO strings — the server decodes them back through the snapshot
    schema (flight/server.py _typed_preds)."""
    import datetime
    from decimal import Decimal

    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        IsNotNull,
        IsNull,
        LessThan,
        LessThanOrEqual,
        Not,
    )

    if isinstance(f, Not):
        # negated equality/membership ride the wire as their own ops;
        # other negations stay Spark-side (returning None keeps them)
        inner = _filter_to_conjunct(f.child)
        if inner is not None and inner[1] == "=":
            return [inner[0], "!=", inner[2]]
        if inner is not None and inner[1] == "in":
            return [inner[0], "not_in", inner[2]]
        return None

    ops = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
        In: "in",
        IsNull: "is_null",
        IsNotNull: "is_not_null",
    }
    op = ops.get(type(f))
    if op is None or len(f.attribute) != 1:
        return None
    if op in ("is_null", "is_not_null"):
        return [f.attribute[0], op, None]

    def enc(v):
        if isinstance(v, bool) or v is None:
            return ...  # unsupported sentinel
        if isinstance(v, (int, float, str)):
            return v
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        if isinstance(v, Decimal):
            return str(v)
        return ...

    if op == "in":
        vals = [enc(v) for v in f.value]
        if any(v is ... for v in vals):
            return None
        return [f.attribute[0], "in", vals]
    v = enc(f.value)
    return None if v is ... else [f.attribute[0], op, v]


class FlightTableReader(DataSourceReader):
    def __init__(self, options):
        self._host, self._port, self._table, self._n = _parse(options)
        self._where: list = []
        # explicit column projection (the Python DataSource API has no
        # Catalyst column-pruning hook, so the user opts in):
        # .option("columns", "a,b") — the server decodes and ships only
        # those column chunks, and schema() advertises the projection
        self._columns = _columns_option(options)

    def pushFilters(self, filters):
        """Catalyst filter pushdown over the wire (Spark 4.1 Python
        DataSource API): supported conjuncts become the ticket's ``where``
        — the SERVER prunes files against manifest bounds/partition
        transforms and filters rows in its pyarrow stream (row-exact, see
        flight/server.py), so absorbed filters need no Spark re-check and
        the wire moves O(matching rows). Unsupported filters stay with
        Spark."""
        for f in filters:
            conj = _filter_to_conjunct(f)
            if conj is None:
                yield f
            else:
                self._where.append(conj)

    def partitions(self) -> list[FlightSlicePartition]:
        """Driver-side planning: one InputPartition per server slice.
        Falls back to a single endpoint for legacy servers without
        ``get_slices`` (one partition, still streamed)."""
        import pyarrow.flight as flight

        client = flight.connect(f"grpc://{self._host}:{self._port}")
        try:
            cmd = {"command": "get_slices", "table": self._table, "n": self._n}
            if self._where:
                cmd["where"] = self._where
            if self._columns:
                cmd["columns"] = self._columns
            info = client.get_flight_info(
                flight.FlightDescriptor.for_command(json.dumps(cmd).encode())
            )
        except (flight.FlightServerError, flight.FlightInternalError):
            # legacy server that doesn't speak get_slices — fall back to
            # the single for_path endpoint. Connection-level errors
            # (FlightUnavailableError, FlightTimedOutError) propagate:
            # masking them here would resurface as a confusing secondary
            # failure on the fallback path.
            if self._where or self._columns:
                # absorbed filters and the advertised projection MUST be
                # honored: use a single filtered/projected scan ticket; a
                # server too old for that errors loudly instead of
                # silently returning unfiltered or mis-shaped rows
                cmd = {"command": "scan", "table": self._table}
                if self._where:
                    cmd["where"] = self._where
                if self._columns:
                    cmd["columns"] = self._columns
                return [
                    FlightSlicePartition(
                        f"grpc://{self._host}:{self._port}",
                        json.dumps(cmd).encode(),
                    )
                ]
            info = client.get_flight_info(
                flight.FlightDescriptor.for_path(self._table.encode())
            )
        parts = []
        for ep in info.endpoints:
            uri = ep.locations[0].uri if ep.locations else f"grpc://{self._host}:{self._port}"
            if isinstance(uri, bytes):
                uri = uri.decode()
            parts.append(FlightSlicePartition(uri, ep.ticket.ticket))
        return parts

    def read(self, partition: FlightSlicePartition):
        """Executor-side: stream Arrow batches for ONE slice. Yields
        RecordBatches as they arrive — no slice-level materialization."""
        import pyarrow.flight as flight

        client = flight.connect(partition.uri)
        for chunk in client.do_get(flight.Ticket(partition.ticket)):
            yield _normalize_batch(chunk.data)


class FlightCDCStreamReader(DataSourceStreamReader):
    """Structured-Streaming source over the Flight CDC protocol: stream
    OFFSETS ARE SNAPSHOT IDS. The first microbatch reads the full table
    through N slice tickets pinned to the latest snapshot; every later
    batch is one ``get_changes(start, end)`` delta — exactly the mirror's
    incremental cursor (flight/mirror.py), but with Spark's checkpoint
    as the durable cursor store and executors doing the pulling. This is
    the SURVEY §1.1 'Structured Streaming upgrade path' made real.

    Append-only contract: if the range crosses an ``overwrite`` snapshot
    the server refuses (same as scan_changes) and the query fails rather
    than silently dropping the overwrite — restart the stream with a
    fresh checkpoint to re-baseline.

    ``option("changelog", "true")`` upgrades the stream to a CHANGE DATA
    FEED (Delta ``readChangeFeed`` shape): rows gain a ``_change_type``
    column (insert/delete), deltas come from the server's
    ``get_changelog`` — recovered row-level across merge-on-read
    deletes/merges — and the initial load labels every row ``insert``.
    Downstream replicas apply deletes instead of failing the query when
    the source table is under continuous-clean maintenance."""

    _NONE = -1  # sentinel: nothing consumed yet / empty table

    def __init__(self, options):
        self._host, self._port, self._table, self._n = _parse(options)
        self._changelog = str(options.get("changelog", "")).lower() == "true"

    def _uri(self) -> str:
        return f"grpc://{self._host}:{self._port}"

    def initialOffset(self) -> dict:
        return {"snapshot_id": self._NONE}

    def latestOffset(self) -> dict:
        import pyarrow.flight as flight

        client = flight.connect(self._uri())
        ticket = json.dumps({"command": "get_metadata", "table": self._table})
        meta = client.do_get(flight.Ticket(ticket.encode())).read_all()
        sid = meta.column("snapshot_id").to_pylist()[0]
        return {"snapshot_id": self._NONE if sid is None else int(sid)}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["snapshot_id"]), int(end["snapshot_id"])
        if e == self._NONE or s == e:
            return []
        if s == self._NONE:
            # initial load: slice tickets crafted with the EXPLICIT end
            # snapshot (round-robin i::n needs no file count), so a commit
            # racing the planner cannot leak rows into this batch that the
            # next get_changes delta would repeat.
            return [
                FlightSlicePartition(
                    self._uri(),
                    json.dumps(
                        {
                            "command": "get_slice",
                            "table": self._table,
                            "index": i,
                            "of": self._n,
                            "snapshot_id": e,
                        }
                    ).encode(),
                )
                for i in range(self._n)
            ]
        return [
            FlightSlicePartition(
                self._uri(),
                json.dumps(
                    {
                        "command": (
                            "get_changelog" if self._changelog else "get_changes"
                        ),
                        "table": self._table,
                        "snapshot_id": s,
                        "end_snapshot_id": e,
                    }
                ).encode(),
            )
        ]

    def read(self, partition: FlightSlicePartition):
        import pyarrow as pa
        import pyarrow.flight as flight

        client = flight.connect(partition.uri)
        for chunk in client.do_get(flight.Ticket(partition.ticket)):
            batch = _normalize_batch(chunk.data)
            if self._changelog and "_change_type" not in batch.schema.names:
                # initial-load slices stream plain table rows; in the
                # change feed every baseline row IS an insert
                batch = pa.RecordBatch.from_arrays(
                    list(batch.columns)
                    + [pa.array(["insert"] * batch.num_rows, pa.string())],
                    schema=batch.schema.append(
                        pa.field("_change_type", pa.string())
                    ),
                )
            yield batch

    def commit(self, end: dict) -> None:
        pass  # the checkpoint is the cursor; the server keeps no reader state


class FlightCommit(WriterCommitMessage):
    def __init__(self, rows: int):
        self.rows = rows


class FlightArrowWriter(DataSourceArrowWriter):
    """Append path: every task opens its own ``do_put`` stream and ships
    its Arrow batches; the server stages per stream and commits ONE
    snapshot at stream end, so a write lands as one snapshot per task.
    At-least-once on task retry (a retried task re-puts its partition) —
    same contract as the reference's chunked mirror appends
    (icerunner.py:1107-1134); exact-once needs the engine-managed table
    path (connector/IceTable), not the wire path.

    Deployment note: writer tasks block on the server's commit. If the
    Flight server shares the writing cluster's task slots (single-process
    demos), keep writer parallelism below the slot count or the blocked
    put tasks can starve the server's own insert job — in production the
    server is a separate process and this cannot happen."""

    def __init__(self, options):
        self._host, self._port, self._table, _ = _parse(options)

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.flight as flight

        client = flight.connect(f"grpc://{self._host}:{self._port}")
        descriptor = flight.FlightDescriptor.for_path(self._table.encode())
        writer = None
        rows = 0
        for batch in iterator:
            if writer is None:
                writer, _ = client.do_put(descriptor, batch.schema)
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is not None:
            writer.close()
        return FlightCommit(rows)


class FlightDataSource(DataSource):
    """``format("icerunner_flight")`` — options:

    - ``url`` (required): ``grpc://host:port/table``
    - ``table``: overrides the table from the url path
    - ``slices``: requested parallelism (server may return fewer; default 8)

    Batch read, streaming CDC read (``spark.readStream``, offsets =
    snapshot ids), and append write (``df.write.mode("append")``)."""

    @classmethod
    def name(cls) -> str:
        return "icerunner_flight"

    def schema(self) -> StructType:
        # Metadata-only: the server answers get_flight_info from its
        # catalog (flight/server.py), never by materializing data — the
        # reference's schema-via-full-scan quirk (icerunner.py:306) is
        # exactly what this avoids.
        import pyarrow as pa
        import pyarrow.flight as flight
        from pyspark.sql.pandas.types import from_arrow_schema

        host, port, table, _ = _parse(self.options)
        client = flight.connect(f"grpc://{host}:{port}")
        info = client.get_flight_info(flight.FlightDescriptor.for_path(table.encode()))
        fields = [
            pa.field(f.name, pa.timestamp("us", tz=f.type.tz), f.nullable)
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
            else f
            for f in info.schema
        ]
        cols = _columns_option(self.options)
        if cols:
            # projection: advertise exactly what the server will stream
            # (table-schema order — the server normalizes request order)
            unknown = [c for c in cols if c not in {f.name for f in fields}]
            if unknown:
                raise ValueError(
                    f"icerunner_flight: unknown columns {unknown}"
                )
            want = set(cols)
            fields = [f for f in fields if f.name in want]
        if str(self.options.get("changelog", "")).lower() == "true":
            fields = fields + [pa.field("_change_type", pa.string())]
        return from_arrow_schema(pa.schema(fields))

    def reader(self, schema: StructType) -> FlightTableReader:
        if str(self.options.get("changelog", "")).lower() == "true":
            raise ValueError(
                "changelog=true is a streaming option (readStream); batch "
                "reads return current-state rows, not a change feed"
            )
        return FlightTableReader(self.options)

    def streamReader(self, schema: StructType) -> FlightCDCStreamReader:
        if _columns_option(self.options):
            raise ValueError(
                "icerunner_flight: 'columns' projection is a batch-read "
                "option; CDC streams move whole change rows"
            )
        return FlightCDCStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> FlightArrowWriter:
        if overwrite:
            raise ValueError(
                "icerunner_flight is append-only over the wire; use the "
                "engine-managed table path (Connector/IceTable.overwrite) "
                "for replacement semantics"
            )
        return FlightArrowWriter(self.options)


def register_flight_source(spark) -> None:
    """Make ``format("icerunner_flight")`` available on this session.
    Also enables Python-DataSource filter pushdown (off by default in
    Spark 4.1; reading a source that implements ``pushFilters`` ERRORS
    with the flag off, so the engine sets it rather than relying on
    session factories — vanilla sessions must work)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FlightDataSource)

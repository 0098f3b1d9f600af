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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class FlightSlicePartition(InputPartition):
    """One snapshot-pinned slice: (endpoint location, opaque ticket).

    Only plain picklable fields — this object ships to executors."""

    def __init__(self, uri: str, ticket: bytes):
        self.uri = uri
        self.ticket = ticket


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


class FlightTableReader(DataSourceReader):
    def __init__(self, options):
        self._host, self._port, self._table, self._n = _parse(options)

    def partitions(self) -> list[FlightSlicePartition]:
        """Driver-side planning: one InputPartition per server slice.
        Falls back to the single ``for_path`` endpoint for legacy servers
        without ``get_slices`` (one partition, still streamed)."""
        import pyarrow.flight as flight

        client = flight.connect(f"grpc://{self._host}:{self._port}")
        try:
            cmd = {"command": "get_slices", "table": self._table, "n": self._n}
            info = client.get_flight_info(
                flight.FlightDescriptor.for_command(json.dumps(cmd).encode())
            )
        except Exception:
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
            yield chunk.data


class FlightDataSource(DataSource):
    """``format("icerunner_flight")`` — options:

    - ``url`` (required): ``grpc://host:port/table``
    - ``table``: overrides the table from the url path
    - ``slices``: requested parallelism (server may return fewer; default 8)
    """

    @classmethod
    def name(cls) -> str:
        return "icerunner_flight"

    def schema(self) -> StructType:
        # Metadata-only: the server answers get_flight_info from its
        # catalog (flight/server.py), never by materializing data — the
        # reference's schema-via-full-scan quirk (icerunner.py:306) is
        # exactly what this avoids.
        import pyarrow.flight as flight
        from pyspark.sql.pandas.types import from_arrow_schema

        host, port, table, _ = _parse(self.options)
        client = flight.connect(f"grpc://{host}:{port}")
        info = client.get_flight_info(flight.FlightDescriptor.for_path(table.encode()))
        return from_arrow_schema(info.schema)

    def reader(self, schema: StructType) -> FlightTableReader:
        return FlightTableReader(self.options)


def register_flight_source(spark) -> None:
    """Make ``format("icerunner_flight")`` available on this session."""
    spark.dataSource.register(FlightDataSource)

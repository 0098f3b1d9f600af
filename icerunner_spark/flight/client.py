"""Flight client utilities: URL parsing, remote discovery, reader/writer
loops (reference: icerunner.py:716-800). Pure pyarrow.flight — no Spark on
the client side."""

from __future__ import annotations

import logging
import time
from urllib.parse import urlparse

import pyarrow as pa
import pyarrow.flight as flight

logger = logging.getLogger(__name__)

DEFAULT_REMOTE_PORT = 8815


def parse_flight_url(url: str) -> tuple[str, int]:
    """grpc://host:port/table -> (host, port); default port 8815
    (icerunner.py:770-775)."""
    parsed = urlparse(url)
    return parsed.hostname or "localhost", parsed.port or DEFAULT_REMOTE_PORT


def flight_url_table(url: str) -> str | None:
    """Table name from the URL path, if present."""
    path = urlparse(url).path.strip("/")
    return path or None


def get_remote_tables(client: flight.FlightClient) -> list[str]:
    """LIST_TABLES command, falling back to list_flights path descriptors
    (icerunner.py:778-800)."""
    try:
        info = client.get_flight_info(flight.FlightDescriptor.for_command(b"LIST_TABLES"))
        reader = client.do_get(info.endpoints[0].ticket)
        return reader.read_all()["table_name"].to_pylist()
    except Exception as e:
        logger.warning("LIST_TABLES failed (%s); falling back to list_flights", e)
        try:
            return [
                info.descriptor.path[0].decode()
                for info in client.list_flights()
                if info.descriptor.path
            ]
        except Exception as e2:
            logger.error("unable to list remote tables: %s", e2)
            return []


def read_table_once(host: str, port: int, table_name: str) -> pa.Table:
    client = flight.connect(f"grpc://{host}:{port}")
    info = client.get_flight_info(flight.FlightDescriptor.for_path(table_name.encode()))
    return client.do_get(info.endpoints[0].ticket).read_all()


def read_table_filtered(
    host: str, port: int, table_name: str, where: list,
    columns: list | None = None, snapshot_id: int | None = None,
    tag: str | None = None, as_of_ms: int | None = None,
) -> pa.Table:
    """Predicate-pushdown read (server command ``scan``): the server
    prunes the file list against manifest column bounds and partition
    transforms, then filters rows server-side — the client receives
    O(matching rows), not the table. ``where`` is a list of
    ``[col, op, value]`` conjuncts (op in =, <, <=, >, >=, in;
    date/timestamp values as ISO strings). ``columns`` projects the
    stream server-side: only those column chunks are decoded and move
    over the wire (returned in table-schema order); predicates may name
    columns outside the projection."""
    import json as _json

    client = flight.connect(f"grpc://{host}:{port}")
    cmd = {"command": "scan", "table": table_name, "where": where}
    if columns:
        cmd["columns"] = list(columns)
    # remote time travel (VERSION / TIMESTAMP AS OF over the wire)
    if snapshot_id is not None:
        cmd["snapshot_id"] = int(snapshot_id)
    if tag is not None:
        cmd["tag"] = tag
    if as_of_ms is not None:
        cmd["as_of_ms"] = int(as_of_ms)
    ticket = flight.Ticket(_json.dumps(cmd).encode())
    return client.do_get(ticket).read_all()


def read_table_parallel(
    host: str, port: int, table_name: str, *, n_streams: int = 4,
    where: list | None = None, columns: list | None = None,
) -> pa.Table:
    """Read a table through N concurrent slice endpoints (server command
    ``get_slices``): get_flight_info returns one endpoint per disjoint
    manifest slice, all pinned to the same snapshot, and a thread pulls
    each stream. This is the scale read path — k clients (or threads)
    each move 1/k of the files; a single stream caps throughput at one
    connection no matter how big the table."""
    import json as _json
    from concurrent.futures import ThreadPoolExecutor

    client = flight.connect(f"grpc://{host}:{port}")
    cmd = {"command": "get_slices", "table": table_name, "n": n_streams}
    if where:
        cmd["where"] = where
    if columns:
        cmd["columns"] = list(columns)
    info = client.get_flight_info(
        flight.FlightDescriptor.for_command(_json.dumps(cmd).encode())
    )

    def _pull(endpoint: flight.FlightEndpoint) -> pa.Table:
        # each slice may come from any advertised location; all local here
        return client.do_get(endpoint.ticket).read_all()

    with ThreadPoolExecutor(max_workers=max(1, len(info.endpoints))) as ex:
        tables = list(ex.map(_pull, info.endpoints))
    tables = [t for t in tables if t.num_rows] or tables[:1]
    return pa.concat_tables(tables)


def run_reader(table_name: str, port: int = 8816, interval: float = 1.0,
               host: str = "localhost", max_iterations: int | None = None) -> None:
    """Poll loop: get_flight_info -> do_get -> log row count
    (icerunner.py:716-736)."""
    client = flight.connect(f"grpc://{host}:{port}")
    i = 0
    while max_iterations is None or i < max_iterations:
        try:
            info = client.get_flight_info(
                flight.FlightDescriptor.for_path(table_name.encode())
            )
            table = client.do_get(info.endpoints[0].ticket).read_all()
            logger.info("read %d rows from %s", table.num_rows, table_name)
        except Exception as e:
            logger.error("read error: %s", e)
        i += 1
        time.sleep(interval)


def write_batch(host: str, port: int, table_name: str, data: pa.Table) -> None:
    client = flight.connect(f"grpc://{host}:{port}")
    descriptor = flight.FlightDescriptor.for_path(table_name.encode())
    writer, _ = client.do_put(descriptor, data.schema)
    writer.write_table(data)
    writer.close()


def run_writer(table_name: str, port: int = 8816, interval: float = 1.0,
               host: str = "localhost", max_iterations: int | None = None) -> None:
    """Poll loop pushing one {id, value} row per tick (icerunner.py:739-767).
    Unlike the reference demo — whose payload schema mismatches the demo
    table and silently fails every insert (icerunner.py:746-765, SURVEY
    §1.3) — this targets a table created with the writer schema."""
    import random

    i = 0
    while max_iterations is None or i < max_iterations:
        data = pa.table(
            {
                "id": pa.array([int(time.time())], pa.int64()),
                "value": pa.array([f"val-{random.randint(100, 999)}"], pa.string()),
            }
        )
        try:
            write_batch(host, port, table_name, data)
            logger.info("wrote 1 row to %s", table_name)
        except Exception as e:
            logger.error("write error: %s", e)
        i += 1
        time.sleep(interval)

"""Flight-to-flight replication ("mirror") with working incremental sync
(reference: icerunner.py:803-1156).

Differences from the reference, all deliberate (SURVEY.md §3.3):

- Incremental sync actually works: the server implements ``get_changes`` /
  ``get_metadata`` (flight/server.py), so after the first full sync only
  the appended delta moves. The reference always falls back to full sync
  because its server never implements the commands.
- Full re-sync **overwrites** instead of re-appending (the reference
  duplicates every row on each fallback sync, icerunner.py:1042-1076).
- Idempotence guard: if the source snapshot hasn't advanced, the sync is a
  no-op.
- Batching is by row count (the reference's ``batch_size`` counts batches
  despite being documented as rows — bug at icerunner.py:1118).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import time
from datetime import datetime

import pyarrow as pa
import pyarrow.flight as flight

from icerunner_spark.connector import Connector
from icerunner_spark.flight.client import (
    flight_url_table,
    get_remote_tables,
    parse_flight_url,
)

logger = logging.getLogger(__name__)


class SyncState:
    """JSON sync-state files under <warehouse>/sync_state/, keyed by
    (md5(source_url)[:8], target_table) (icerunner.py:803-843)."""

    def __init__(self, warehouse_path: str):
        self.state_dir = os.path.join(warehouse_path, "sync_state")
        os.makedirs(self.state_dir, exist_ok=True)

    def get_state_path(self, source_url: str, target_table: str) -> str:
        key = hashlib.md5(source_url.encode()).hexdigest()[:8]
        return os.path.join(self.state_dir, f"sync_{key}_{target_table}.json")

    def get_last_sync_state(self, source_url: str, target_table: str) -> dict:
        path = self.get_state_path(source_url, target_table)
        if os.path.isfile(path):
            with open(path) as f:
                return json.load(f)
        return {
            "last_sync_time": None,
            "source_snapshot_id": None,
            "target_snapshot_id": None,
            "rows_synced": 0,
            "last_sync_status": "never_synced",
        }

    def save_sync_state(self, source_url: str, target_table: str, state: dict) -> None:
        with open(self.get_state_path(source_url, target_table), "w") as f:
            json.dump(state, f, indent=2)


def _append_stream(
    reader, connector: Connector, table_name: str, batch_rows: int
) -> int:
    """Drain a Flight stream into row-capped appends; returns rows synced."""
    pending: list[pa.RecordBatch] = []
    pending_rows = total = 0
    for chunk in reader:
        batch = chunk.data if hasattr(chunk, "data") else chunk
        if batch is None or batch.num_rows == 0:
            continue
        pending.append(batch)
        pending_rows += batch.num_rows
        if pending_rows >= batch_rows:
            connector.insert(table_name, pa.Table.from_batches(pending))
            total += pending_rows
            pending, pending_rows = [], 0
    if pending:
        connector.insert(table_name, pa.Table.from_batches(pending))
        total += pending_rows
    return total


def _apply_changelog_stream(
    reader, connector: Connector, table_name: str, batch_rows: int
) -> int:
    """Drain a get_changelog stream (rows + ``_change_type``) into the
    target: inserts stage in row-capped chunks and publish as ONE append
    snapshot; delete rows accumulate (they are O(maintenance delta),
    small by construction) and apply value-based with exact multiplicity
    (IceTable.delete_rows_exact). Insert-before-delete makes an
    in-range insert+delete of the same row net out. Returns rows applied
    (inserts + deletes)."""
    import pyarrow.compute as pc

    from icerunner_spark.connector import arrow_to_df

    t = connector.table(table_name)
    staged: list[str] = []
    pending: list[pa.Table] = []
    pending_rows = total = 0
    del_parts: list[pa.Table] = []
    for chunk in reader:
        batch = chunk.data if hasattr(chunk, "data") else chunk
        if batch is None or batch.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([batch])
        mask = pc.equal(tbl.column("_change_type"), "insert")
        ins = tbl.filter(mask).drop_columns(["_change_type"])
        dels = tbl.filter(pc.invert(mask)).drop_columns(["_change_type"])
        if dels.num_rows:
            del_parts.append(dels)
            total += dels.num_rows
        if ins.num_rows:
            pending.append(ins)
            pending_rows += ins.num_rows
            total += ins.num_rows
        if pending_rows >= batch_rows:
            staged += t.stage_append(
                arrow_to_df(connector.spark, pa.concat_tables(pending))
            )
            pending, pending_rows = [], 0
    if pending:
        staged += t.stage_append(
            arrow_to_df(connector.spark, pa.concat_tables(pending))
        )
    if staged:
        t.publish_append(staged)
    if del_parts:
        t.delete_rows_exact(
            arrow_to_df(connector.spark, pa.concat_tables(del_parts))
        )
    return total


def _source_fields(client: flight.FlightClient, source_table: str):
    """Source schema via the get_schema command as ``[(field_id_or_None,
    name, arrow_type, initial_default_or_None)]`` in schema order. Field
    ids and initial column defaults ride in Arrow field metadata
    (``ICE:field_id`` / ``ICE:default``, flight/server.py); a server that
    doesn't send them yields ids of None and the caller falls back to
    name-diffs (defaults then replay as None — pre-evolution rows on the
    mirror read NULL, the best a default-blind server allows)."""
    reader = _command_reader(
        client, {"command": "get_schema", "table": source_table}
    )
    out = []
    for f in reader.schema:
        fid = dfl = None
        if f.metadata and b"ICE:field_id" in f.metadata:
            try:
                fid = int(f.metadata[b"ICE:field_id"].decode())
            except ValueError:
                fid = None
        if f.metadata and b"ICE:default" in f.metadata:
            try:
                dfl = json.loads(f.metadata[b"ICE:default"].decode())
            except ValueError:
                dfl = None
        out.append((fid, f.name, f.type, dfl))
    return out


def _arrow_type_ddl(arrow_type) -> str:
    from pyspark.sql.pandas.types import from_arrow_type

    return from_arrow_type(arrow_type).simpleString()


def _evolve_target_schema(
    fields, prev_ids: dict | None, connector: Connector, target_table: str
) -> None:
    """Replay the source's schema evolution onto the mirror target,
    metadata-only. ``fields`` is the source's current [(id, name, type)];
    ``prev_ids`` is {id(str): name} recorded at the last sync — the names
    the TARGET currently carries. Drops first, then renames (through
    temp names, so swap-renames can't collide), then adds. Raises on
    anything it can't express (no ids on either side plus an ambiguous
    drop+add, which could be a rename) — the caller falls back to a full
    overwrite resync, which converges regardless."""
    t = connector.table(target_table)
    tgt_names = [f.name for f in t.schema().fields]
    cur_names = [n for _, n, _t, _d in fields]
    has_ids = bool(fields) and all(i is not None for i, _, _t, _d in fields)
    if has_ids and prev_ids:
        cur = {str(i): (n, typ, dfl) for i, n, typ, dfl in fields}
        if {f: n for f, (n, _t, _d) in cur.items()} == prev_ids:
            return  # no id-level change (a name-set compare would miss a swap-rename)
        for fid, old_name in prev_ids.items():
            if fid not in cur:
                if old_name not in tgt_names:
                    raise RuntimeError(
                        f"target out of step: expected column {old_name}"
                    )
                t.drop_column(old_name)
        renames = [
            (prev_ids[fid], n, fid)
            for fid, (n, _typ, _d) in cur.items()
            if fid in prev_ids and prev_ids[fid] != n
        ]
        for old, _new, fid in renames:
            t.rename_column(old, f"__mirror_tmp_{fid}")
        for _old, new, fid in renames:
            t.rename_column(f"__mirror_tmp_{fid}", new)
        for fid, (n, typ, dfl) in cur.items():
            if fid not in prev_ids:
                t.add_column(n, _arrow_type_ddl(typ), default=dfl)
    else:
        if set(cur_names) == set(tgt_names):
            return  # without ids a same-name-set change is undetectable
        added = [n for n in cur_names if n not in tgt_names]
        removed = [n for n in tgt_names if n not in cur_names]
        if added and removed:
            raise RuntimeError(
                "ambiguous schema change without field ids (possible rename)"
            )
        for n in removed:
            t.drop_column(n)
        for _fid, n, typ, dfl in fields:
            if n in added:
                t.add_column(n, _arrow_type_ddl(typ), default=dfl)
    if {f.name for f in t.schema().fields} != set(cur_names):
        raise RuntimeError("schema sync did not converge")


def _command_reader(client: flight.FlightClient, cmd: dict):
    info = client.get_flight_info(
        flight.FlightDescriptor.for_command(json.dumps(cmd).encode())
    )
    if not info.endpoints:
        raise RuntimeError(f"no endpoints for command {cmd}")
    return client.do_get(info.endpoints[0].ticket)


def perform_sync(
    source_client: flight.FlightClient,
    source_url: str,
    source_table: str,
    target_table: str,
    connector: Connector,
    sync_state: SyncState,
    batch_rows: int = 100_000,
) -> int:
    """One sync pass; returns rows moved."""
    state = sync_state.get_last_sync_state(source_url, target_table)
    last_source_snapshot = state.get("source_snapshot_id")

    info = source_client.get_flight_info(
        flight.FlightDescriptor.for_path(source_table.encode())
    )
    if not info.endpoints:
        raise RuntimeError(f"no endpoints for table {source_table}")
    endpoint = info.endpoints[0]
    # follow endpoint locations to a different server if advertised
    # (icerunner.py:925-934)
    client = source_client
    if endpoint.locations:
        loc_uri = endpoint.locations[0].uri
        if isinstance(loc_uri, bytes):
            loc_uri = loc_uri.decode()
        src_host, src_port = parse_flight_url(source_url)
        loc_host, loc_port = parse_flight_url(loc_uri)
        if (loc_host, loc_port) != (src_host, src_port):
            logger.info("following endpoint location to %s", loc_uri)
            client = flight.connect(loc_uri)

    def _source_metadata() -> dict:
        table = _command_reader(
            client, {"command": "get_metadata", "table": source_table}
        ).read_all()
        d = table.to_pydict()
        return {k: v[0] for k, v in d.items() if v}

    def _pinned_full_reader() -> tuple[object, int | None, bool]:
        """(reader, snapshot_id, pinned) for a full-table read,
        snapshot-pinned when the server supports get_slices (the ticket
        embeds the id, so the stream and the saved cursor describe the
        SAME table version — closing the race where rows commit mid-drain
        and then fall between cursor and stream).

        Legacy-server fallback (no get_slices): cursor from get_metadata
        BEFORE the unpinned drain. Rows committed between the pin and the
        drain then appear in the stream AND in the next pass's
        get_changes delta — which would append them twice. The caller
        therefore records an ``*_unpinned`` status, and the NEXT pass
        repairs by full overwrite resync instead of an incremental append
        (converging the target exactly; strictly better than the old
        lossy cursor-after-drain, which skipped those rows forever)."""
        try:
            info_slices = client.get_flight_info(
                flight.FlightDescriptor.for_command(
                    json.dumps(
                        {"command": "get_slices", "table": source_table, "n": 1}
                    ).encode()
                )
            )
            ticket = info_slices.endpoints[0].ticket
            pinned = json.loads(ticket.ticket.decode()).get("snapshot_id")
            return client.do_get(ticket), pinned, True
        except Exception as e:
            logger.warning("get_slices unsupported (%s); unpinned full read", e)
            pinned = _safe_source_snapshot(_source_metadata)
            return client.do_get(endpoint.ticket), pinned, False

    rows_synced = 0
    status = "success"
    src_fields = None

    def _replay_properties() -> None:
        """Replicate source table properties onto the target (they ride
        get_metadata): additive — source keys overwrite, target-only
        keys survive, so a mirror admin's local knobs are never
        clobbered by the sync (property REMOVAL at the source is
        deliberately not replayed for the same reason). This is what
        makes a mirrored table self-maintaining: write-path config
        (bloom/ndv/sort columns) and the maintenance policy
        (maintenance.*) follow the source automatically. Metadata-only;
        a failed replay logs and never blocks the row sync."""
        try:
            src_props = json.loads(
                _source_metadata().get("properties") or "{}"
            )
            tt = connector.table(target_table)
            snap = tt.current_snapshot()
            cur = dict(snap.properties) if snap else {}
            diff = {k: v for k, v in src_props.items() if cur.get(k) != v}
            if diff:
                tt.set_properties(diff)
                logger.info(
                    "replayed source properties: %s", sorted(diff)
                )
        except Exception as e:
            logger.warning("property replay skipped: %s", e)

    def _fetch_source_fields():
        nonlocal src_fields
        if src_fields is None:
            try:
                src_fields = _source_fields(client, source_table)
            except Exception as e:  # legacy server without get_schema
                logger.warning("get_schema unavailable for field ids: %s", e)
        return src_fields

    if target_table not in connector.tables:
        # new target: schema via get_schema command, fallback to a sampled
        # data batch (icerunner.py:939-967)
        try:
            schema_reader = _command_reader(
                client, {"command": "get_schema", "table": source_table}
            )
            sample = pa.Table.from_batches(
                [schema_reader.read_chunk().data], schema=schema_reader.schema
            )
        except Exception as e:
            logger.warning("get_schema unsupported (%s); sampling data", e)
            data_reader = client.do_get(endpoint.ticket)
            sample = pa.Table.from_batches([data_reader.read_chunk().data])
        # replicate the source's partition layout, not just its rows
        # (partition_spec rides get_metadata; legacy servers omit it)
        try:
            spec = json.loads(_source_metadata().get("partition_spec") or "[]")
        except Exception:
            spec = []
        connector.create_table(
            target_table, sample.slice(0, 0), partition_by=spec or None
        )
        reader, source_snapshot, was_pinned = _pinned_full_reader()
        rows_synced = _append_stream(reader, connector, target_table, batch_rows)
        if not was_pinned:
            status = "success_unpinned"
        _replay_properties()
    else:
        # Pin the end snapshot BEFORE reading and bound get_changes to it;
        # the same id becomes the saved cursor, so rows committed after the
        # pin are exactly the next pass's delta — no skip, no double-sync.
        source_snapshot = _safe_source_snapshot(_source_metadata)
        if source_snapshot is not None and source_snapshot == last_source_snapshot:
            logger.info("source snapshot unchanged; nothing to sync")
            return 0
        # After an unpinned read, the target may hold rows the delta also
        # covers (see _pinned_full_reader) — an incremental append would
        # duplicate them, so repair via full overwrite resync instead.
        prev_unpinned = str(state.get("last_sync_status", "")).endswith("_unpinned")
        if prev_unpinned:
            logger.warning("previous sync was unpinned; repairing via full resync")
        try:
            if prev_unpinned:
                raise RuntimeError("unpinned predecessor: incremental unsafe")
            # Replay source schema evolution (rename/add/drop since the
            # saved field-id map) onto the target BEFORE draining the
            # delta — metadata-only, so a rename with no new rows still
            # converges without moving data. Anything inexpressible
            # raises into the full-resync fallback below.
            if _fetch_source_fields() is not None:
                _evolve_target_schema(
                    src_fields, state.get("source_field_ids"), connector, target_table
                )
            # Replay source partition-spec EVOLUTION (update_partition_spec
            # is metadata-only; the target's existing dirs keep their own
            # layout via dir_specs, exactly like the source's). Layout is
            # an optimization — a failed replay logs and never blocks the
            # row sync.
            try:
                src_spec = json.loads(
                    _source_metadata().get("partition_spec") or "[]"
                )
                tt = connector.table(target_table)
                if list(tt.partition_spec()) != list(src_spec):
                    tt.update_partition_spec(src_spec)
                    logger.info("replayed source partition spec: %s", src_spec)
            except Exception as e_spec:
                logger.warning("partition-spec replay skipped: %s", e_spec)
            _replay_properties()
            changes_cmd = {
                "command": "get_changes",
                "table": source_table,
                "snapshot_id": last_source_snapshot,
            }
            if source_snapshot is not None:
                changes_cmd["end_snapshot_id"] = source_snapshot
            try:
                changes_reader = _command_reader(client, changes_cmd)
                rows_synced = _append_stream(
                    changes_reader, connector, target_table, batch_rows
                )
            except Exception as e_changes:
                # append-only diff refused (a merge-on-read delete/merge in
                # range — the continuous-clean maintenance shape) — apply
                # the ROW-LEVEL changelog instead of a full resync: appends
                # plus value-based deletes, O(delta) either way. A true
                # overwrite errors here too and falls through to resync.
                logger.info(
                    "append-only delta unavailable (%s); applying changelog",
                    e_changes,
                )
                cl_cmd = dict(changes_cmd)
                cl_cmd["command"] = "get_changelog"
                cl_reader = _command_reader(client, cl_cmd)
                rows_synced = _apply_changelog_stream(
                    cl_reader, connector, target_table, batch_rows
                )
                status = "success_changelog"
        except Exception as e:
            # full re-sync fallback — OVERWRITE, never append-duplicate
            # (reference duplicates all rows here, icerunner.py:1042-1076).
            # The server errors get_changes across overwrite snapshots
            # (append-only diff contract), which lands here by design.
            logger.warning("incremental sync unavailable (%s); full overwrite sync", e)
            reader, source_snapshot, was_pinned = _pinned_full_reader()
            full = reader.read_all()
            from icerunner_spark.connector import arrow_to_df

            connector.table(target_table).overwrite(
                arrow_to_df(connector.spark, full)
            )
            rows_synced = full.num_rows
            status = "full_resync" if was_pinned else "full_resync_unpinned"

    _fetch_source_fields()
    sync_state.save_sync_state(
        source_url,
        target_table,
        {
            "last_sync_time": datetime.now().isoformat(),
            "source_snapshot_id": source_snapshot,
            "target_snapshot_id": connector.get_current_snapshot_id(target_table),
            "rows_synced": rows_synced,
            "last_sync_status": status,
            # id->name map of the source schema this pass synced to; the
            # next pass diffs against it to replay schema evolution
            "source_field_ids": (
                {str(i): n for i, n, _t, _d in src_fields}
                if src_fields and all(i is not None for i, _, _t, _d in src_fields)
                else None
            ),
        },
    )
    logger.info("sync complete: %d rows (%s)", rows_synced, status)
    return rows_synced


def _safe_source_snapshot(metadata_fn) -> int | None:
    try:
        return metadata_fn().get("snapshot_id")
    except Exception as e:
        logger.warning("get_metadata unsupported: %s", e)
        return None


def run_mirror(
    source_url: str,
    target_table: str | None = None,
    warehouse_path: str = "warehouse",
    interval: float = 60.0,
    batch_rows: int = 100_000,
    continuous: bool = False,
    spark=None,
    max_iterations: int | None = None,
) -> int:
    """Mirror a remote Flight table into a local snapshot table
    (icerunner.py:846-1156). Returns total rows synced."""
    from icerunner_spark.session import get_spark

    spark = spark or get_spark(app_name="icerunner_mirror")
    connector = Connector(spark, warehouse_path)
    sync_state = SyncState(connector.catalog.warehouse_path)

    host, port = parse_flight_url(source_url)
    client = flight.connect(f"grpc://{host}:{port}")

    source_table = flight_url_table(source_url)
    if not source_table:
        tables = get_remote_tables(client)
        if not tables:
            raise RuntimeError(f"no tables discoverable at {source_url}")
        source_table = tables[0]
    target = target_table or source_table

    total = 0
    i = 0
    while True:
        total += perform_sync(
            client, source_url, source_table, target, connector, sync_state, batch_rows
        )
        i += 1
        if not continuous or (max_iterations is not None and i >= max_iterations):
            break
        time.sleep(interval)
    return total


def run_mirror_streaming(
    source_url: str,
    target_table: str | None = None,
    warehouse_path: str = "warehouse",
    interval: float = 60.0,
    continuous: bool = False,
    spark=None,
    timeout_s: float | None = None,
) -> int:
    """Mirror as a Structured Streaming query over the CDC data source
    (sources/flight_source.py): the stream's snapshot-id offsets replace
    the JSON sync-state cursor, and the query CHECKPOINT under
    ``<warehouse>/sync_state/`` is the durable replication state — kill
    the process anywhere and the next run resumes from the last committed
    snapshot. foreachBatch alone is only at-least-once (a crash between
    the append and Spark's checkpoint commit replays the microbatch), so
    the sink stamps ``(mirror_stream, mirror_batch_id)`` into each target
    snapshot's summary and skips batch ids at or below the stream's
    high-water mark on replay — idempotent appends make the end-to-end
    delivery exactly-once.

    One-shot (``continuous=False``) uses availableNow (drain to the
    source's current snapshot, then stop); continuous polls every
    ``interval`` seconds. Returns rows appended this invocation."""
    from icerunner_spark.session import get_spark
    from icerunner_spark.sources.flight_source import register_flight_source

    spark = spark or get_spark(app_name="icerunner_mirror_stream")
    register_flight_source(spark)
    connector = Connector(spark, warehouse_path)

    host, port = parse_flight_url(source_url)
    source_table = flight_url_table(source_url)
    if not source_table:
        tables = get_remote_tables(flight.connect(f"grpc://{host}:{port}"))
        if not tables:
            raise RuntimeError(f"no tables discoverable at {source_url}")
        source_table = tables[0]
    target = target_table or source_table

    key = hashlib.md5(source_url.encode()).hexdigest()[:8]
    ckpt = os.path.join(
        connector.catalog.warehouse_path, "sync_state", f"stream_{key}_{target}"
    )

    synced = {"rows": 0}

    def _applied_high_water(t) -> int:
        """Highest mirror_batch_id this stream has committed to the
        target (scan of snapshot summaries — metadata-only, cheap at
        mirror cadence; foreign snapshots without our stamp are skipped)."""
        last = -1
        for s in t.snapshots():
            if s.summary.get("mirror_stream") == key:
                b = s.summary.get("mirror_batch_id")
                if b is not None:
                    last = max(last, int(b))
        return last

    def _sink(batch_df, batch_id):  # runs on the driver per microbatch
        t = connector.catalog.table(target)
        if t.exists() and batch_id <= _applied_high_water(t):
            # crash-replay of a batch whose append already committed:
            # skipping it is what turns at-least-once into exactly-once
            logger.info("mirror-stream batch %d already applied; skipping", batch_id)
            return
        # persist: the count action and the append's parquet write would
        # otherwise each re-pull the whole batch from the Flight server
        batch_df.persist()
        try:
            n = batch_df.count()
            if n == 0:
                return
            stamp = {"mirror_stream": key, "mirror_batch_id": str(batch_id)}
            if not t.exists():
                t.create(batch_df, summary=stamp)
            else:
                t.append(batch_df, summary=stamp)
            synced["rows"] += n
            logger.info("mirror-stream batch %d: %d rows -> %s", batch_id, n, target)
        finally:
            batch_df.unpersist()

    url = f"grpc://{host}:{port}/{source_table}"
    writer = (
        spark.readStream.format("icerunner_flight")
        .option("url", url)
        .load()
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
    )
    if continuous:
        q = writer.trigger(processingTime=f"{interval} seconds").start()
        q.awaitTermination(timeout_s)
        q.stop()
    else:
        q = writer.trigger(availableNow=True).start()
        if not q.awaitTermination(timeout_s or 300):
            q.stop()
            raise TimeoutError("mirror stream did not drain in time")
    logger.info("sync complete: %d rows (streaming)", synced["rows"])
    return synced["rows"]

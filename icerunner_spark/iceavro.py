"""Minimal pure-Python Avro Object Container File codec.

Implements exactly the subset of the Avro 1.x specification that Apache
Iceberg's metadata files use — records, ``["null", T]`` unions, arrays,
the primitive types, and null-codec OCF framing — so the Iceberg v2
exporter (:mod:`icerunner_spark.iceberg_export`) can emit real
manifest-list / manifest Avro files with zero third-party dependencies,
the same way :mod:`icerunner_spark.operators.codecs` implements the
public image/audio container specs. The reference gets this for free
from PyIceberg's bundled Avro (icerunner.py:60-66); neither PyIceberg
nor fastavro is installed in this container, so the wire format is
implemented from the public spec.

Scope (everything Iceberg manifests need, nothing more):

- primitives: null, boolean, int, long (zigzag varints), float, double
  (little-endian IEEE), bytes, string (length-prefixed);
- complex: record (fields in declaration order), array (block-encoded,
  negative block counts tolerated on read), map (for completeness —
  Iceberg encodes its int-keyed maps as arrays of key/value records to
  carry field-ids), unions (branch index + value);
- logical types pass through untouched (date/timestamp-micros ride the
  underlying int/long) — Iceberg readers interpret them from the schema;
- OCF framing: ``Obj\\x01`` magic, file-metadata map (``avro.schema``,
  ``avro.codec: null``, plus caller extras — Iceberg stamps
  ``schema`` / ``partition-spec`` / ``format-version`` here), 16-byte
  sync marker, one or more data blocks.

Writers emit a single data block (Iceberg manifests are metadata-sized:
one block per file keeps this O(entries) with no framing overhead);
the reader accepts any number of blocks. Supported codecs are ``null``
and ``deflate`` (raw RFC-1951 streams per the Avro spec — the wire form
Java Iceberg writes by default, since its table property
``write.avro.compression-codec`` defaults to gzip which Avro frames as
the ``deflate`` codec). ``snappy``/``zstandard`` need non-stdlib
libraries absent from this container and are rejected on read with a
clear message.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------- #
# primitive encoders
# --------------------------------------------------------------------------- #


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = (n << 1) ^ (n >> 63)
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_long(buf) -> int:
    shift = 0
    z = 0
    while True:
        (b,) = buf.read(1)
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1)


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


# --------------------------------------------------------------------------- #
# schema-driven value codec
# --------------------------------------------------------------------------- #


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def encode_value(buf: io.BytesIO, schema, value) -> None:
    """Encode one value per its (JSON-parsed) Avro schema node."""
    t = _type_name(schema)
    if t == "union":
        # Iceberg metadata unions are all ["null", T]; pick by None-ness,
        # falling back to the first non-null branch.
        branches = schema
        if value is None:
            idx = next(
                i for i, b in enumerate(branches) if _type_name(b) == "null"
            )
            _write_long(buf, idx)
            return
        idx, branch = next(
            (i, b)
            for i, b in enumerate(branches)
            if _type_name(b) != "null"
        )
        _write_long(buf, idx)
        encode_value(buf, branch, value)
        return
    if t == "null":
        if value is not None:
            raise ValueError(f"non-null value {value!r} for null schema")
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
        return
    if t in ("int", "long"):
        _write_long(buf, int(value))
        return
    if t == "float":
        buf.write(struct.pack("<f", float(value)))
        return
    if t == "double":
        buf.write(struct.pack("<d", float(value)))
        return
    if t == "bytes":
        _write_bytes(buf, bytes(value))
        return
    if t == "string":
        _write_bytes(buf, str(value).encode("utf-8"))
        return
    if t == "fixed":
        data = bytes(value)
        if len(data) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(data)
        return
    if t == "record":
        for f in schema["fields"]:
            encode_value(buf, f["type"], value.get(f["name"]))
        return
    if t == "array":
        items = list(value)
        if items:
            _write_long(buf, len(items))
            for it in items:
                encode_value(buf, schema["items"], it)
        _write_long(buf, 0)
        return
    if t == "map":
        entries = dict(value)
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, str(k).encode("utf-8"))
                encode_value(buf, schema["values"], v)
        _write_long(buf, 0)
        return
    raise ValueError(f"unsupported Avro type: {t!r}")


def decode_value(buf, schema):
    t = _type_name(schema)
    if t == "union":
        idx = _read_long(buf)
        return decode_value(buf, schema[idx])
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) != b"\x00"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "record":
        return {
            f["name"]: decode_value(buf, f["type"]) for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # negative count: a block byte-size follows
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(decode_value(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = decode_value(buf, schema["values"])
    raise ValueError(f"unsupported Avro type: {t!r}")


# --------------------------------------------------------------------------- #
# object container files
# --------------------------------------------------------------------------- #


def write_ocf(
    path: str,
    schema: dict,
    records: list[dict],
    *,
    metadata: dict | None = None,
    codec: str = "null",
) -> int:
    """Write an Avro OCF of ``records`` under ``schema``; returns the
    file length in bytes (manifest lists need ``manifest_length``).
    ``metadata`` adds extra file-metadata entries (str -> str/bytes).
    ``codec`` is ``null`` (default) or ``deflate`` (raw RFC-1951, the
    Avro spec's framing for Java Iceberg's default gzip setting)."""
    import uuid

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec: {codec}")
    sync = uuid.uuid4().bytes
    meta = {"avro.schema": json.dumps(schema), "avro.codec": codec}
    for k, v in (metadata or {}).items():
        meta[k] = v
    buf = io.BytesIO()
    buf.write(_MAGIC)
    _write_long(buf, len(meta))
    for k, v in meta.items():
        _write_bytes(buf, k.encode("utf-8"))
        _write_bytes(buf, v if isinstance(v, bytes) else str(v).encode("utf-8"))
    _write_long(buf, 0)
    buf.write(sync)
    block = io.BytesIO()
    for rec in records:
        encode_value(block, schema, rec)
    payload = block.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(zlib.Z_DEFAULT_COMPRESSION, zlib.DEFLATED, -15)
        payload = co.compress(payload) + co.flush()
    _write_long(buf, len(records))
    _write_long(buf, len(payload))
    buf.write(payload)
    buf.write(sync)
    data = buf.getvalue()
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return len(data)


def read_ocf(path: str) -> tuple[dict, dict, list]:
    """Read an Avro OCF; returns (schema, file_metadata, records)."""
    with open(path, "rb") as f:
        raw = f.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"not an Avro object container file: {path}")
    meta: dict = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            v = _read_bytes(buf)
            meta[k] = v
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(
            f"unsupported Avro codec: {codec} (null and deflate are "
            "implemented; snappy/zstandard need libraries this "
            "container lacks)"
        )
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = buf.read(16)
    records: list = []
    while buf.tell() < len(raw):
        count = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if len(payload) != size:
            raise ValueError(f"truncated Avro data block in {path}")
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        block = io.BytesIO(payload)
        for _ in range(count):
            records.append(decode_value(block, schema))
        if block.read(1):
            raise ValueError(f"trailing bytes in Avro data block of {path}")
        if buf.read(16) != sync:
            raise ValueError(f"sync marker mismatch in {path}")
    return schema, meta, records

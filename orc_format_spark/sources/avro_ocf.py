"""Minimal pure-Python Avro Object Container File reader/writer.

Iceberg's manifest-list and manifest files are Avro OCF (Apache Avro
1.11 spec, "Object Container Files" + "Binary Encoding"); this sandbox
has no Python avro library and no spark-avro datasource jar, so the
manifest path reimplements the subset of the public Avro spec that
Iceberg metadata actually uses:

- binary encoding: null / boolean / int / long (zigzag varint) / float /
  double / bytes / string / fixed / enum / record / array / map / union
- container layout: magic ``Obj\\x01``, file-metadata map carrying
  ``avro.schema`` (+ arbitrary keys — Iceberg stores its own schema
  metadata there), 16-byte sync marker, then blocks of
  (count, byte-size, payload, sync)
- codecs: ``null`` and ``deflate`` (raw DEFLATE, no zlib header)

This is driver-side metadata I/O (a manifest is thousands of rows at
most, listed once per job), NOT the token data path — per-record Python
is the appropriate tool here; the payload never flows through Avro.

The reference repo has no Avro/Iceberg code at all (its input is an
in-memory Vec — src/writer.rs:84-90); this module exists because
BASELINE.json's input_hint names an Iceberg table and the manifest is
the split source at cluster scale (sources/parquet_scan.py docstring).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"

# --------------------------------------------------------------- binary


def _read_long(r: io.BufferedIOBase) -> int:
    """Zigzag varint (Avro spec "int and long values are written using
    variable-length zig-zag coding")."""
    shift = 0
    acc = 0
    while True:
        b = r.read(1)
        if not b:
            raise ValueError("avro: truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if byte < 0x80:
            return (acc >> 1) ^ -(acc & 1)
        shift += 7


def _write_long(w: io.BytesIO, v: int) -> None:
    u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    while True:
        if u < 0x80:
            w.write(bytes((u,)))
            return
        w.write(bytes((0x80 | (u & 0x7F),)))
        u >>= 7


def _read_bytes(r: io.BufferedIOBase) -> bytes:
    n = _read_long(r)
    if n < 0:
        raise ValueError("avro: negative byte-length")
    out = r.read(n)
    if len(out) != n:
        raise ValueError("avro: truncated bytes")
    return out


def _write_bytes(w: io.BytesIO, b: bytes) -> None:
    _write_long(w, len(b))
    w.write(b)


def _resolve(schema, named: dict):
    """Follow named-type references ("manifest_entry" used by name)."""
    if isinstance(schema, str) and schema in named:
        return named[schema]
    return schema


def _register(schema, named: dict) -> None:
    if isinstance(schema, dict) and schema.get("name") and schema.get("type") in (
        "record",
        "fixed",
        "enum",
    ):
        named[schema["name"]] = schema


def read_datum(r: io.BufferedIOBase, schema, named: dict | None = None):
    """Decode one value of ``schema`` (parsed JSON) from ``r``.

    Logical types (timestamp-micros etc.) decode as their underlying
    primitive — Iceberg metadata consumers want the raw long anyway.
    """
    named = named if named is not None else {}
    schema = _resolve(schema, named)
    if isinstance(schema, list):  # union: long index then value
        idx = _read_long(r)
        if not 0 <= idx < len(schema):
            raise ValueError(f"avro: union index {idx} out of range")
        return read_datum(r, schema[idx], named)
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, (dict, list)):  # {"type": {...nested...}}
        return read_datum(r, t, named)
    if t == "null":
        return None
    if t == "boolean":
        b = r.read(1)
        if not b:
            raise ValueError("avro: truncated boolean")
        return b[0] != 0
    if t in ("int", "long"):
        return _read_long(r)
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return _read_bytes(r)
    if t == "string":
        return _read_bytes(r).decode("utf-8")
    if t == "fixed":
        _register(schema, named)
        return r.read(schema["size"])
    if t == "enum":
        _register(schema, named)
        return schema["symbols"][_read_long(r)]
    if t == "record":
        _register(schema, named)
        return {
            f["name"]: read_datum(r, f["type"], named) for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = _read_long(r)
            if n == 0:
                return out
            if n < 0:  # block-size prefix variant
                n = -n
                _read_long(r)
            for _ in range(n):
                out.append(read_datum(r, schema["items"], named))
    if t == "map":
        out = {}
        while True:
            n = _read_long(r)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(r)
            for _ in range(n):
                k = _read_bytes(r).decode("utf-8")
                out[k] = read_datum(r, schema["values"], named)
    raise ValueError(f"avro: unsupported type {t!r}")


def write_datum(w: io.BytesIO, schema, value, named: dict | None = None) -> None:
    """Encode ``value`` per ``schema``. Union branch selection: None ->
    the "null" branch, else the first non-null branch (the only union
    shape Iceberg metadata uses is ["null", X] / [X, "null"])."""
    named = named if named is not None else {}
    schema = _resolve(schema, named)
    if isinstance(schema, list):
        want_null = value is None
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if (bt == "null") == want_null:
                _write_long(w, i)
                write_datum(w, branch, value, named)
                return
        raise ValueError(f"avro: no union branch for {value!r} in {schema}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, (dict, list)):
        write_datum(w, t, value, named)
    elif t == "null":
        pass
    elif t == "boolean":
        w.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(w, int(value))
    elif t == "float":
        w.write(struct.pack("<f", value))
    elif t == "double":
        w.write(struct.pack("<d", value))
    elif t == "bytes":
        _write_bytes(w, bytes(value))
    elif t == "string":
        _write_bytes(w, value.encode("utf-8"))
    elif t == "fixed":
        _register(schema, named)
        if len(value) != schema["size"]:
            raise ValueError("avro: fixed size mismatch")
        w.write(bytes(value))
    elif t == "enum":
        _register(schema, named)
        _write_long(w, schema["symbols"].index(value))
    elif t == "record":
        _register(schema, named)
        for f in schema["fields"]:
            if f["name"] in value:
                fv = value[f["name"]]
            elif "default" in f:
                fv = f["default"]
            else:
                raise ValueError(f"avro: missing field {f['name']}")
            write_datum(w, f["type"], fv, named)
    elif t == "array":
        if value:
            _write_long(w, len(value))
            for item in value:
                write_datum(w, schema["items"], item, named)
        _write_long(w, 0)
    elif t == "map":
        if value:
            _write_long(w, len(value))
            for k, v in value.items():
                _write_bytes(w, k.encode("utf-8"))
                write_datum(w, schema["values"], v, named)
        _write_long(w, 0)
    else:
        raise ValueError(f"avro: unsupported type {t!r}")


# ------------------------------------------------------------ container


def read_ocf(data: bytes) -> tuple[list, dict, dict]:
    """Parse an Object Container File.

    Returns (records, schema_json, file_metadata) where file_metadata maps
    str -> bytes (Iceberg stores e.g. ``format-version``, ``content``,
    ``partition-spec`` there).
    """
    r = io.BytesIO(data)
    if r.read(4) != MAGIC:
        raise ValueError("avro: bad magic (not an OCF)")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = read_datum(r, meta_schema)
    sync = r.read(16)
    if len(sync) != 16:
        raise ValueError("avro: truncated header sync")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    records: list = []
    while True:
        probe = r.read(1)
        if not probe:
            break
        r.seek(-1, io.SEEK_CUR)
        count = _read_long(r)
        payload = _read_bytes(r)
        if r.read(16) != sync:
            raise ValueError("avro: block sync mismatch")
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        br = io.BytesIO(payload)
        named: dict = {}
        for _ in range(count):
            records.append(read_datum(br, schema, named))
    return records, schema, meta


def write_ocf(
    schema,
    records: list,
    metadata: dict[str, bytes] | None = None,
    codec: str = "deflate",
    sync: bytes = b"\x00" * 16,
) -> bytes:
    """Serialize records as a single-block OCF. A fixed sync marker keeps
    output deterministic (exact-resume: re-writing the same manifest
    yields identical bytes)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")
    w = io.BytesIO()
    w.write(MAGIC)
    write_datum(w, {"type": "map", "values": "bytes"}, meta)
    w.write(sync)
    body = io.BytesIO()
    named: dict = {}
    for rec in records:
        write_datum(body, schema, rec, named)
    payload = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(level=6, wbits=-15)
        payload = co.compress(payload) + co.flush()
    _write_long(w, len(records))
    _write_bytes(w, payload)
    w.write(sync)
    return w.getvalue()

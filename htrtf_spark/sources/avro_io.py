"""Minimal Apache Avro object-container-file codec (write + read), pure
stdlib, for Iceberg manifest / manifest-list files.

Implements the subset of the public Avro 1.11 spec
(https://avro.apache.org/docs/1.11.1/specification/) that Iceberg
metadata needs: null/boolean/int/long/string/bytes primitives, records,
arrays, maps, and 2-branch null unions, with the "null" (uncompressed)
and "deflate" (raw RFC-1951, what native Iceberg manifest writers emit)
codecs. Schemas are plain JSON dicts, exactly as they appear in the
file header, so Iceberg's field-id annotations pass through verbatim.

This exists because the sandbox has no avro/fastavro package and no
network; the format is simple enough that a from-scratch codec is
smaller than vendoring one. It is NOT a general Avro implementation —
unsupported schema shapes raise immediately.
"""

from __future__ import annotations

import io
import json
import struct
from typing import Any

MAGIC = b"Obj\x01"


# ------------------------------------------------------------------ encode
def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _write_str(buf: io.BytesIO, s: str) -> None:
    _write_bytes(buf, s.encode("utf-8"))


def _is_null_union(schema: Any) -> bool:
    return (
        isinstance(schema, list)
        and len(schema) == 2
        and "null" in schema
    )


def _encode(buf: io.BytesIO, schema: Any, value: Any) -> None:
    if isinstance(schema, str):
        if schema == "null":
            if value is not None:
                raise ValueError("non-null for null schema")
            return
        if schema == "boolean":
            buf.write(b"\x01" if value else b"\x00")
            return
        if schema in ("int", "long"):
            _write_long(buf, int(value))
            return
        if schema == "float":
            buf.write(struct.pack("<f", float(value)))
            return
        if schema == "double":
            buf.write(struct.pack("<d", float(value)))
            return
        if schema == "string":
            _write_str(buf, value)
            return
        if schema == "bytes":
            _write_bytes(buf, value)
            return
        raise ValueError(f"unsupported primitive {schema!r}")
    if _is_null_union(schema):
        other = schema[1] if schema[0] == "null" else schema[0]
        null_idx = schema.index("null")
        if value is None:
            _write_long(buf, null_idx)
        else:
            _write_long(buf, 1 - null_idx)
            _encode(buf, other, value)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                if f["name"] not in value and "default" in f:
                    _encode(buf, f["type"], f["default"])
                else:
                    _encode(buf, f["type"], value[f["name"]])
            return
        if t == "array":
            items = value or []
            if items:
                _write_long(buf, len(items))
                for it in items:
                    _encode(buf, schema["items"], it)
            _write_long(buf, 0)
            return
        if t == "map":
            entries = value or {}
            if entries:
                _write_long(buf, len(entries))
                for k, v in entries.items():
                    _write_str(buf, k)
                    _encode(buf, schema["values"], v)
            _write_long(buf, 0)
            return
        # named alias of a primitive/logical type, e.g.
        # {"type": "long", "logicalType": ...}
        if isinstance(t, str):
            _encode(buf, t, value)
            return
    raise ValueError(f"unsupported schema {schema!r}")


# ------------------------------------------------------------------ decode
class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return _unzigzag(acc)
            shift += 7

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_str(self) -> str:
        return self.read_bytes().decode("utf-8")


def _decode(r: _Reader, schema: Any) -> Any:
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return r.read(1) == b"\x01"
        if schema in ("int", "long"):
            return r.read_long()
        if schema == "float":
            return struct.unpack("<f", r.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", r.read(8))[0]
        if schema == "string":
            return r.read_str()
        if schema == "bytes":
            return r.read_bytes()
        raise ValueError(f"unsupported primitive {schema!r}")
    if isinstance(schema, list):
        idx = r.read_long()
        return _decode(r, schema[idx])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _decode(r, f["type"]) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:  # block-size variant: skip the byte count
                    n = -n
                    r.read_long()
                for _ in range(n):
                    out.append(_decode(r, schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    # RHS evaluates first in Python — key must read first
                    k = r.read_str()
                    out[k] = _decode(r, schema["values"])
        if isinstance(t, str):
            return _decode(r, t)
    raise ValueError(f"unsupported schema {schema!r}")


# -------------------------------------------------------------- container
def avro_write(
    path: str,
    schema: dict,
    records: list[dict],
    file_meta: dict[str, str] | None = None,
    sync: bytes = b"\x00" * 16,
    codec: str = "null",
) -> None:
    """Write an Avro object container file, one block. ``codec`` is
    "null" (uncompressed) or "deflate" (raw zlib stream, RFC 1951
    without the zlib wrapper, per the Avro spec) — deflate is what
    native Iceberg writers emit for manifests."""
    body = io.BytesIO()
    for rec in records:
        _encode(body, schema, rec)
    payload = body.getvalue()
    if codec == "deflate":
        import zlib

        co = zlib.compressobj(9, zlib.DEFLATED, -15)  # raw deflate
        payload = co.compress(payload) + co.flush()
    elif codec != "null":
        raise ValueError(f"unsupported avro codec {codec!r}")

    meta = {"avro.schema": json.dumps(schema), "avro.codec": codec}
    for k, v in (file_meta or {}).items():
        meta[k] = v

    out = io.BytesIO()
    out.write(MAGIC)
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_str(out, k)
        _write_bytes(out, v.encode("utf-8"))
    _write_long(out, 0)
    out.write(sync)
    if records:
        _write_long(out, len(records))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())


def avro_read(path: str) -> tuple[dict, dict[str, str], list[dict]]:
    """Read an Avro object container file → (schema, file_meta, records)."""
    with open(path, "rb") as fh:
        r = _Reader(fh.read())
    if r.read(4) != MAGIC:
        raise ValueError(f"{path}: not an avro container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            # RHS evaluates first in Python — read the key explicitly
            k = r.read_str()
            meta[k] = r.read_bytes()
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "", "deflate"):
        raise ValueError(f"{path}: unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = r.read(16)
    records: list[dict] = []
    while r.pos < len(r.data):
        count = r.read_long()
        size = r.read_long()  # block byte size
        if codec == "deflate":
            import zlib

            raw = zlib.decompress(r.read(size), -15)
            br = _Reader(raw)
            for _ in range(count):
                records.append(_decode(br, schema))
        else:
            for _ in range(count):
                records.append(_decode(r, schema))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    str_meta = {
        k: v.decode("utf-8", "replace")
        for k, v in meta.items()
        if not k.startswith("avro.")
    }
    return schema, str_meta, records

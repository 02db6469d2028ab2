"""Pure-Python Avro object-container codec for engine-table data files (S15).

The container has no Avro library (no spark-avro jar, no fastavro), so this
implements the Avro 1.11 object container format directly from the public
spec (https://avro.apache.org/docs/1.11.1/specification/): magic `Obj\\x01`,
metadata map (avro.schema JSON + avro.codec), 16-byte sync marker, then
blocks of <count, byte-size, records, sync>.  Null codec only.  Supported
field types are the flat primitives the engine's tables use: boolean, int,
long, float, double, string, binary, plus the date / timestamp-micros
logical types — each optionally nullable (encoded as a ["null", T] union,
matching what the reference's GenericAvroWriter emits for optional fields;
ref: core/.../avro/Avro.java, ProjectionDatumReader.java).

Row-at-a-time encode/decode is inherent to the Avro record format (the
reference's Avro path is also row-based); the Spark integration keeps it
distributed — every file is encoded/decoded inside a mapInPandas task,
never on the driver (sources/avro_spark.py).
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import os
import struct
import uuid

_MAGIC = b"Obj\x01"
_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)

# our type str -> (avro schema fragment, kind tag used by the codec)
_AVRO_TYPES = {
    "boolean": ("boolean", "boolean"),
    "int": ("int", "int"),
    "long": ("long", "long"),
    "float": ("float", "float"),
    "double": ("double", "double"),
    "string": ("string", "string"),
    "binary": ("bytes", "bytes"),
    "date": ({"type": "int", "logicalType": "date"}, "date"),
    "time": ({"type": "long", "logicalType": "time-micros"}, "long"),
    "timestamp": ({"type": "long", "logicalType": "timestamp-micros"},
                  "timestamp"),
    "timestamptz": ({"type": "long", "logicalType": "timestamp-micros",
                     "adjust-to-utc": True}, "timestamp"),
}


def avro_schema_json(schema, name: str = "row") -> str:
    """Avro record schema for an engine Schema (flat primitives only)."""
    fields = []
    for f in schema.fields:
        if not isinstance(f.type, str) or f.type not in _AVRO_TYPES:
            raise NotImplementedError(
                f"avro data files support flat primitive columns; "
                f"column {f.name!r} has type {f.type!r}")
        frag, _kind = _AVRO_TYPES[f.type]
        if f.required:
            fields.append({"name": f.name, "type": frag,
                           "field-id": f.field_id})
        else:
            fields.append({"name": f.name, "type": ["null", frag],
                           "default": None, "field-id": f.field_id})
    return json.dumps({"type": "record", "name": name, "fields": fields})


def _kinds(schema) -> list:
    return [(f.name, _AVRO_TYPES[f.type][1], not f.required)
            for f in schema.fields]


# ---------------------------------------------------------------- encoding
def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_value(buf: bytearray, kind: str, v) -> None:
    if kind == "boolean":
        buf.append(1 if v else 0)
    elif kind in ("int", "long"):
        buf += _zigzag(int(v))
    elif kind == "float":
        buf += struct.pack("<f", float(v))
    elif kind == "double":
        buf += struct.pack("<d", float(v))
    elif kind == "string":
        b = str(v).encode("utf-8")
        buf += _zigzag(len(b))
        buf += b
    elif kind == "bytes":
        b = bytes(v)
        buf += _zigzag(len(b))
        buf += b
    elif kind == "date":
        if isinstance(v, _dt.datetime):
            v = v.date()
        days = (v - _EPOCH_DATE).days if isinstance(v, _dt.date) else int(v)
        buf += _zigzag(days)
    elif kind == "timestamp":
        if isinstance(v, _dt.datetime):
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            delta = v - _EPOCH_DT
            v = (delta.days * 86_400_000_000 + delta.seconds * 1_000_000
                 + delta.microseconds)
        buf += _zigzag(int(v))
    else:  # pragma: no cover
        raise TypeError(f"unsupported avro kind {kind}")


def write_avro(path: str, rows, schema) -> int:
    """Write rows (iterable of per-field tuples in schema order) to an Avro
    container file.  Returns the record count."""
    kinds = _kinds(schema)
    sync = uuid.uuid4().bytes
    header = bytearray()
    header += _MAGIC
    meta = {"avro.schema": avro_schema_json(schema).encode(),
            "avro.codec": b"null"}
    header += _zigzag(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        header += _zigzag(len(kb))
        header += kb
        header += _zigzag(len(v))
        header += v
    header += _zigzag(0)  # end of metadata map
    header += sync

    body = bytearray()
    count = 0
    for row in rows:
        for (name, kind, nullable), v in zip(kinds, row):
            is_null = v is None or (isinstance(v, float) and v != v)
            if nullable:
                body += _zigzag(1 if not is_null else 0)
                if is_null:
                    continue
            elif is_null:
                raise ValueError(f"null in required column {name}")
            _enc_value(body, kind, v)
        count += 1

    with open(path, "wb") as f:
        f.write(header)
        if count:
            f.write(_zigzag(count))
            f.write(_zigzag(len(body)))
            f.write(body)
            f.write(sync)
    return count


# ---------------------------------------------------------------- decoding
class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def long(self) -> int:
        shift = 0
        u = 0
        while True:
            b = self.d[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)

    def raw(self, n: int) -> bytes:
        out = self.d[self.pos:self.pos + n]
        self.pos += n
        return out


def _dec_value(r: _Reader, kind: str):
    if kind == "boolean":
        return r.raw(1) == b"\x01"
    if kind in ("int", "long"):
        return r.long()
    if kind == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if kind == "double":
        return struct.unpack("<d", r.raw(8))[0]
    if kind == "string":
        return r.raw(r.long()).decode("utf-8")
    if kind == "bytes":
        return bytes(r.raw(r.long()))
    if kind == "date":
        return _EPOCH_DATE + _dt.timedelta(days=r.long())
    if kind == "timestamp":
        return _EPOCH_DT + _dt.timedelta(microseconds=r.long())
    raise TypeError(f"unsupported avro kind {kind}")  # pragma: no cover


def read_avro_header(path: str) -> tuple:
    """Returns (schema_json_dict, sync_marker, header_len)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != _MAGIC:
        raise ValueError(f"not an avro container: {path}")
    r = _Reader(data)
    r.pos = 4
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:  # spec: negative count followed by byte size
            n = -n
            r.long()
        for _ in range(n):
            k = r.raw(r.long()).decode()
            v = r.raw(r.long())
            meta[k] = v
    if meta.get("avro.codec", b"null") != b"null":
        raise NotImplementedError("only the null avro codec is supported")
    sync = r.raw(16)
    return json.loads(meta["avro.schema"]), sync, r.pos


def count_avro_records(path: str) -> int:
    """Record count from block headers only — no row decode (stats path)."""
    _schema, sync, pos = read_avro_header(path)
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    r.pos = pos
    total = 0
    while r.pos < len(data):
        n = r.long()
        size = r.long()
        r.pos += size + 16  # skip records + sync
        total += n
    return total


def read_avro(path: str, schema) -> list:
    """Decode all rows as per-field tuples in `schema` field order.  Fields
    are matched BY NAME against the file's own schema (projection by id
    happens later in the scan's align step); file columns absent from
    `schema` are skipped, missing ones are null."""
    file_schema, sync, pos = read_avro_header(path)
    file_fields = []
    for jf in file_schema["fields"]:
        t = jf["type"]
        nullable = isinstance(t, list)
        if nullable:
            t = [x for x in t if x != "null"][0]
        if isinstance(t, dict):
            lt = t.get("logicalType")
            kind = {"date": "date", "timestamp-micros": "timestamp",
                    "time-micros": "long"}.get(lt, t["type"])
        else:
            kind = {"bytes": "bytes"}.get(t, t)
        file_fields.append((jf["name"], kind, nullable))

    want = [f.name for f in schema.fields]
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    r.pos = pos
    rows = []
    n_data = len(data)
    while r.pos < n_data:
        n = r.long()
        _size = r.long()
        for _ in range(n):
            rec = {}
            for (name, kind, nullable) in file_fields:
                if nullable and r.long() == 0:
                    rec[name] = None
                    continue
                rec[name] = _dec_value(r, kind)
            rows.append(tuple(rec.get(w) for w in want))
        r.raw(16)  # sync
    return rows

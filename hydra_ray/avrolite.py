"""Pure-Python Apache Avro binary codec + Object Container Files.

The reference engine's interchange format is Avro (its conformance core
is the JSON→GenericRecord converter,
`avro/src/test/.../StringToGenericRecordSpec.scala`); this build
previously converted JSON to Arrow only.  This module implements the
PUBLIC Avro 1.11 specification from scratch — no avro package in the
sandbox:

- schemas: primitives, records, enums, arrays, maps, unions, fixed,
  named-type references, logicalType pass-through;
- binary encoding: zigzag varints, length-prefixed bytes/strings,
  block-encoded arrays/maps, union branch indices;
- Object Container Files (OCF): magic ``Obj\\x01``, metadata map
  (``avro.schema`` / ``avro.codec``), 16-byte sync markers, ``null``
  and ``deflate`` codecs (zlib raw streams per the spec).

Scale shape: one OCF **block** is the unit of parallelism — the engine
reads a file's blocks in ``map_batches`` tasks (`read_avro`), each
decoding its rows into ONE Arrow table; writing emits a block per
batch.  Per-record decode is sequential Python over the block (the
format's schema-driven interleaving is inherently sequential, the same
situation as jpeglite's Huffman walk); blocks are small and many, so
corpus-level throughput comes from task parallelism, and the hot
analytical path stays parquet — Avro is the ingest/interchange edge,
exactly the reference's split.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

import pyarrow as pa

__all__ = [
    "AvroError",
    "parse_schema",
    "encode_record",
    "decode_record",
    "write_ocf",
    "read_ocf",
    "ocf_schema",
    "read_avro",
    "write_avro",
    "arrow_to_avro_schema",
]

_MAGIC = b"Obj\x01"
_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


class AvroError(ValueError):
    """Malformed schema or data."""


# ------------------------------------------------------------------ schemas
def parse_schema(schema) -> dict:
    """Normalize a schema (JSON string or python object) into a dict
    form: primitives → {"type": name}; named types registered so later
    references resolve."""
    if isinstance(schema, str):
        try:
            schema = json.loads(schema)
        except json.JSONDecodeError:
            schema = schema.strip('"')
    names: dict[str, dict] = {}
    return _norm(schema, names)


def _norm(s, names: dict) -> dict:
    if isinstance(s, str):
        if s in _PRIMITIVES:
            return {"type": s}
        if s in names:
            return names[s]
        raise AvroError(f"unknown type {s!r}")
    if isinstance(s, list):  # union
        return {"type": "union", "branches": [_norm(b, names) for b in s]}
    if not isinstance(s, dict):
        raise AvroError(f"bad schema node {s!r}")
    t = s.get("type")
    if t in _PRIMITIVES:
        return dict(s)
    if t == "record":
        out = {"type": "record", "name": s["name"], "fields": [],
               **({"aliases": list(s["aliases"])} if "aliases" in s else {})}
        names[s["name"]] = out
        for f in s.get("fields", ()):
            out["fields"].append({
                "name": f["name"],
                "type": _norm(f["type"], names),
                **({"default": f["default"]} if "default" in f else {}),
                **({"aliases": list(f["aliases"])} if "aliases" in f
                   else {}),
            })
        return out
    if t == "enum":
        out = {"type": "enum", "name": s["name"],
               "symbols": list(s["symbols"]),
               **({"default": s["default"]} if "default" in s else {}),
               **({"aliases": list(s["aliases"])} if "aliases" in s
                  else {})}
        names[s["name"]] = out
        return out
    if t == "fixed":
        out = {"type": "fixed", "name": s["name"], "size": int(s["size"]),
               **({"aliases": list(s["aliases"])} if "aliases" in s
                  else {})}
        names[s["name"]] = out
        return out
    if t == "array":
        return {"type": "array", "items": _norm(s["items"], names)}
    if t == "map":
        return {"type": "map", "values": _norm(s["values"], names)}
    if t == "union" and "branches" in s:  # re-norm of a normalized form
        return {"type": "union",
                "branches": [_norm(b, names) for b in s["branches"]]}
    if isinstance(t, (list, dict)):
        return _norm(t, names)
    raise AvroError(f"unsupported schema type {t!r}")


# ----------------------------------------------------------------- encoding
def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(out: bytearray, n: int) -> None:
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_long(out: bytearray, v: int) -> None:
    _write_varint(out, _zigzag(int(v)))


def _read_long(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        if pos >= len(buf):
            raise AvroError("truncated varint")
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise AvroError("varint too long")
    n &= (1 << 64) - 1
    return _unzigzag(n), pos


def _encode(out: bytearray, sch: dict, v) -> None:
    t = sch["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        _write_long(out, v)
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "bytes":
        b = bytes(v)
        _write_long(out, len(b))
        out += b
    elif t == "string":
        b = str(v).encode("utf-8")
        _write_long(out, len(b))
        out += b
    elif t == "record":
        for f in sch["fields"]:
            try:
                fv = v[f["name"]]
            except KeyError:
                if "default" in f:
                    fv = f["default"]
                else:
                    raise AvroError(f"missing field {f['name']!r}")
            _encode(out, f["type"], fv)
    elif t == "enum":
        try:
            _write_long(out, sch["symbols"].index(v))
        except ValueError:
            raise AvroError(f"unknown enum symbol {v!r}")
    elif t == "fixed":
        b = bytes(v)
        if len(b) != sch["size"]:
            raise AvroError("fixed size mismatch")
        out += b
    elif t == "array":
        items = list(v)
        if items:
            _write_long(out, len(items))
            for it in items:
                _encode(out, sch["items"], it)
        _write_long(out, 0)
    elif t == "map":
        if v:
            _write_long(out, len(v))
            for k, mv in v.items():
                _encode(out, {"type": "string"}, k)
                _encode(out, sch["values"], mv)
        _write_long(out, 0)
    elif t == "union":
        idx = _union_branch(sch["branches"], v)
        _write_long(out, idx)
        _encode(out, sch["branches"][idx], v)
    else:
        raise AvroError(f"cannot encode type {t!r}")


def _union_branch(branches: list[dict], v) -> int:
    for i, b in enumerate(branches):
        t = b["type"]
        if v is None and t == "null":
            return i
        if isinstance(v, bool):
            if t == "boolean":
                return i
            continue
        if isinstance(v, int) and t in ("int", "long"):
            return i
        if isinstance(v, float) and t in ("float", "double"):
            return i
        if isinstance(v, str) and t in ("string", "enum"):
            return i
        if isinstance(v, (bytes, bytearray)) and t in ("bytes", "fixed"):
            return i
        if isinstance(v, dict) and t in ("record", "map"):
            return i
        if isinstance(v, (list, tuple)) and t == "array":
            return i
    raise AvroError(f"no union branch for {type(v).__name__}")


def _decode(buf: memoryview, pos: int, sch: dict):
    t = sch["type"]
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("bytes", "string"):
        n, pos = _read_long(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise AvroError("bad length")
        raw = bytes(buf[pos:pos + n])
        return (raw.decode("utf-8") if t == "string" else raw), pos + n
    if t == "record":
        out = {}
        for f in sch["fields"]:
            out[f["name"]], pos = _decode(buf, pos, f["type"])
        return out, pos
    if t == "enum":
        i, pos = _read_long(buf, pos)
        try:
            return sch["symbols"][i], pos
        except IndexError:
            raise AvroError("enum index out of range")
    if t == "fixed":
        n = sch["size"]
        return bytes(buf[pos:pos + n]), pos + n
    if t == "array":
        out = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with byte size prefix
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                v, pos = _decode(buf, pos, sch["items"])
                out.append(v)
    if t == "map":
        out = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                k, pos = _decode(buf, pos, {"type": "string"})
                out[k], pos = _decode(buf, pos, sch["values"])
    if t == "union":
        i, pos = _read_long(buf, pos)
        if not 0 <= i < len(sch["branches"]):
            raise AvroError("union branch out of range")
        return _decode(buf, pos, sch["branches"][i])
    raise AvroError(f"cannot decode type {t!r}")


def encode_record(sch: dict, record) -> bytes:
    out = bytearray()
    _encode(out, sch, record)
    return bytes(out)


def decode_record(sch: dict, data: bytes):
    v, pos = _decode(memoryview(data), 0, sch)
    if pos != len(data):
        raise AvroError(f"{len(data) - pos} trailing bytes")
    return v


# ----------------------------------------------------- object container files
def write_ocf(path: str, schema, records, codec: str = "deflate",
              block_records: int = 4096, sync: bytes | None = None) -> int:
    """Write records to an Avro OCF; returns the record count.  One
    block per ``block_records`` — the read-side parallelism unit."""
    sch = parse_schema(schema)
    if sync is None:
        # deterministic per-path marker (no wall-clock/random: replayable)
        import hashlib

        sync = hashlib.md5(path.encode()).digest()
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    header = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(
            schema if not isinstance(schema, str) else json.loads(schema)
        ).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(header, len(meta))
    for k, v in meta.items():
        _encode(header, {"type": "string"}, k)
        _encode(header, {"type": "bytes"}, v)
    _write_long(header, 0)
    header += sync

    n_total = 0
    with open(path, "wb") as f:
        f.write(header)
        block = bytearray()
        count = 0

        def flush():
            nonlocal block, count, n_total
            if not count:
                return
            payload = bytes(block)
            if codec == "deflate":
                payload = zlib.compress(payload)[2:-4]  # raw deflate stream
            head = bytearray()
            _write_long(head, count)
            _write_long(head, len(payload))
            f.write(bytes(head) + payload + sync)
            n_total += count
            block = bytearray()
            count = 0

        for rec in records:
            _encode(block, sch, rec)
            count += 1
            if count >= block_records:
                flush()
        flush()
    return n_total


def _read_header(f) -> tuple[dict, str, bytes]:
    if f.read(4) != _MAGIC:
        raise AvroError("not an Avro object container file")
    data = f.read()
    buf = memoryview(data)
    meta, pos = _decode(buf, 0, {
        "type": "map", "values": {"type": "bytes"},
    })
    sync = bytes(buf[pos:pos + 16])
    schema = parse_schema(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, data, pos + 16


def ocf_schema(path: str) -> dict:
    with open(path, "rb") as f:
        schema, _, _, _, _ = _read_header(f)
    return schema


def read_ocf(path: str, reader_schema=None):
    """Yield records from an Avro OCF (null/deflate codecs).  With
    ``reader_schema`` set, records resolve from the file's writer schema
    to the reader's view (Avro spec Schema Resolution — defaults fill,
    extra fields skip, promotions apply)."""
    with open(path, "rb") as f:
        schema, codec, sync, data, pos = _read_header(f)
    rsch = parse_schema(reader_schema) if reader_schema is not None else None
    buf = memoryview(data)
    while pos < len(buf):
        n, pos = _read_long(buf, pos)
        size, pos = _read_long(buf, pos)
        payload = bytes(buf[pos:pos + size])
        pos += size
        if bytes(buf[pos:pos + 16]) != sync:
            raise AvroError("sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise AvroError(f"unsupported codec {codec!r}")
        bv = memoryview(payload)
        p = 0
        for _ in range(n):
            if rsch is None:
                rec, p = _decode(bv, p, schema)
            else:
                rec, p = _decode_resolved(bv, p, schema, rsch)
            yield rec
        if p != len(bv):
            raise AvroError("block has trailing bytes")


# --------------------------------------------------------------- Ray surface
_ARROW_TO_AVRO = {
    pa.types.is_boolean: "boolean",
    pa.types.is_int32: "int",
    pa.types.is_int64: "long",
    pa.types.is_float32: "float",
    pa.types.is_float64: "double",
    pa.types.is_string: "string",
    pa.types.is_large_string: "string",
    pa.types.is_binary: "bytes",
    pa.types.is_large_binary: "bytes",
}


def arrow_to_avro_schema(schema: pa.Schema, name: str = "row") -> dict:
    """Arrow schema → Avro record schema (nullable columns become
    ``["null", T]`` unions; timestamps → long millis with the
    timestamp-millis logicalType)."""
    fields = []
    for f in schema:
        at = None
        if pa.types.is_timestamp(f.type):
            at = {"type": "long", "logicalType": "timestamp-millis"}
        else:
            for pred, avro_t in _ARROW_TO_AVRO.items():
                if pred(f.type):
                    at = avro_t
                    break
        if at is None:
            raise AvroError(f"no avro mapping for arrow type {f.type}")
        fields.append({
            "name": f.name,
            "type": ["null", at] if f.nullable else at,
        })
    return {"type": "record", "name": name, "fields": fields}


def write_avro(ds, out_dir: str, schema=None, codec: str = "deflate"):
    """Dataset → one OCF per batch task under ``out_dir`` (the
    block/file granularity IS the resumable-parallelism unit — same
    rule as ``sinks.write_partitioned``).  Returns total rows."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        import uuid

        sch = schema if schema is not None else arrow_to_avro_schema(t.schema)
        rows = t.to_pylist()
        for r in rows:  # timestamps → epoch millis longs
            for k, v in r.items():
                if hasattr(v, "timestamp"):
                    r[k] = int(v.timestamp() * 1000)
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.avro")
        n = write_ocf(path, sch, rows, codec=codec)
        return pa.table({"path": [path], "rows": pa.array([n], pa.int64())})

    parts = ds.map_batches(write_batch, batch_format="pyarrow").to_pandas()
    return int(parts["rows"].sum())


def read_avro(paths, schema: pa.Schema | None = None,
              reader_schema=None):
    """Avro OCF file(s) → Ray Dataset (one decode task per file via
    ``from_items`` + ``flat_map``-style map_batches).  With
    ``reader_schema`` set, every file resolves from its own writer
    schema to the reader's view (spec Schema Resolution) — mixed-version
    directories read under ONE schema, the registry-compat contract."""
    import ray.data as rd

    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(
                os.path.join(paths, p) for p in os.listdir(paths)
                if p.endswith(".avro")
            )
        else:
            paths = [paths]

    def load(t: pa.Table) -> pa.Table:
        rows = []
        for p in t["path"].to_pylist():
            rows.extend(read_ocf(p, reader_schema=reader_schema))
        if schema is not None:
            return pa.Table.from_pylist(rows, schema=schema)
        return pa.Table.from_pylist(rows)

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )


# --------------------------------------------------- schema resolution
# Avro spec "Schema Resolution": data written under the WRITER schema is
# read under a (compatible) READER schema — fields match by name (or
# reader alias), missing reader fields fill from defaults, extra writer
# fields skip, and primitive promotions int→long/float/double,
# long→float/double, float→double, string↔bytes apply.  This is the
# runtime half of the registry's FULL_TRANSITIVE compat contract
# (table/registry.py): any registered version can read any other's data.
# Reference analogue: avro/src/main/.../StringToGenericRecord.scala
# (conversion under an evolved subject schema).

_PROMOTE = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
    "boolean": {"boolean"},
    "null": {"null"},
}


def _skip(buf: memoryview, pos: int, sch: dict) -> int:
    """Advance past one value of ``sch`` without materializing it."""
    t = sch["type"]
    if t == "null":
        return pos
    if t == "boolean":
        return pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)[1]
    if t == "float":
        return pos + 4
    if t == "double":
        return pos + 8
    if t in ("bytes", "string"):
        n, pos = _read_long(buf, pos)
        return pos + n
    if t == "fixed":
        return pos + sch["size"]
    if t == "enum":
        return _read_long(buf, pos)[1]
    if t == "record":
        for f in sch["fields"]:
            pos = _skip(buf, pos, f["type"])
        return pos
    if t == "union":
        i, pos = _read_long(buf, pos)
        return _skip(buf, pos, sch["branches"][i])
    if t in ("array", "map"):
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return pos
            if n < 0:  # size-prefixed block: jump the byte count
                size, pos = _read_long(buf, pos)
                pos += size
                continue
            for _ in range(n):
                if t == "map":
                    pos = _skip(buf, pos, {"type": "string"})
                pos = _skip(buf, pos, sch["items" if t == "array"
                                          else "values"])
    raise AvroError(f"cannot skip type {t!r}")


def _names_match(w: dict, r: dict) -> bool:
    return w["name"] == r["name"] or w["name"] in r.get("aliases", ())


def _resolvable(w: dict, r: dict) -> bool:
    wt, rt = w["type"], r["type"]
    if rt == "union":
        return wt == "union" or any(_resolvable(w, b)
                                    for b in r["branches"])
    if wt == "union":
        return True  # per-branch check happens at read time
    if wt in _PROMOTE:
        return rt in _PROMOTE[wt]
    if wt != rt:
        return False
    if wt in ("record", "enum", "fixed"):
        return _names_match(w, r)
    return True


def _default_value(sch: dict, d):
    """JSON default → runtime value under ``sch`` (spec: bytes/fixed
    defaults are ISO-8859-1 strings; union defaults type the FIRST
    branch)."""
    t = sch["type"]
    if t == "union":
        return _default_value(sch["branches"][0], d)
    if t in ("bytes", "fixed"):
        return d.encode("latin-1") if isinstance(d, str) else d
    if t == "record":
        return {f["name"]: _default_value(f["type"], d.get(
            f["name"], f.get("default"))) for f in sch["fields"]}
    if t == "array":
        return [_default_value(sch["items"], x) for x in d]
    if t == "map":
        return {k: _default_value(sch["values"], v) for k, v in d.items()}
    return d


def _decode_resolved(buf: memoryview, pos: int, w: dict, r: dict):
    wt, rt = w["type"], r["type"]
    if wt == "union":
        i, pos = _read_long(buf, pos)
        if not 0 <= i < len(w["branches"]):
            raise AvroError("union branch out of range")
        return _decode_resolved(buf, pos, w["branches"][i], r)
    if rt == "union":
        for b in r["branches"]:
            if _resolvable(w, b):
                return _decode_resolved(buf, pos, w, b)
        raise AvroError(
            f"writer {wt!r} matches no reader union branch")
    if wt in _PROMOTE:
        if rt not in _PROMOTE[wt]:
            raise AvroError(f"cannot promote {wt!r} to {rt!r}")
        v, pos = _decode(buf, pos, w)
        if rt in ("float", "double"):
            return float(v), pos
        if wt == "string" and rt == "bytes":
            return v.encode("utf-8"), pos
        if wt == "bytes" and rt == "string":
            return v.decode("utf-8"), pos
        return v, pos
    if wt != rt or (wt in ("record", "enum", "fixed")
                    and not _names_match(w, r)):
        raise AvroError(f"writer {wt!r}/{w.get('name')} does not "
                        f"resolve to reader {rt!r}/{r.get('name')}")
    if wt == "record":
        by_name = {}
        for rf in r["fields"]:
            by_name[rf["name"]] = rf
            for a in rf.get("aliases", ()):
                by_name[a] = rf
        out = {}
        seen = set()
        for wf in w["fields"]:
            rf = by_name.get(wf["name"])
            if rf is None:
                pos = _skip(buf, pos, wf["type"])
            else:
                out[rf["name"]], pos = _decode_resolved(
                    buf, pos, wf["type"], rf["type"])
                seen.add(rf["name"])
        for rf in r["fields"]:
            if rf["name"] in seen:
                continue
            if "default" not in rf:
                raise AvroError(
                    f"reader field {rf['name']!r} missing in writer "
                    "data and has no default")
            out[rf["name"]] = _default_value(rf["type"], rf["default"])
        return out, pos
    if wt == "enum":
        i, pos = _read_long(buf, pos)
        sym = w["symbols"][i]
        if sym in r["symbols"]:
            return sym, pos
        if "default" in r:  # spec 1.9+ enum default
            return r["default"], pos
        raise AvroError(f"enum symbol {sym!r} not in reader schema")
    if wt == "fixed":
        if w["size"] != r["size"]:
            raise AvroError("fixed size mismatch")
        return _decode(buf, pos, w)
    if wt == "array":
        out = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                v, pos = _decode_resolved(buf, pos, w["items"],
                                          r["items"])
                out.append(v)
    if wt == "map":
        out = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                k, pos = _decode(buf, pos, {"type": "string"})
                out[k], pos = _decode_resolved(buf, pos, w["values"],
                                               r["values"])
    return _decode(buf, pos, w)  # null/boolean handled by promotion map


def decode_record_resolved(writer_schema, reader_schema, data: bytes):
    """Decode ``data`` written under ``writer_schema`` as the
    ``reader_schema`` sees it (Avro spec Schema Resolution)."""
    w = parse_schema(writer_schema)
    r = parse_schema(reader_schema)
    v, pos = _decode_resolved(memoryview(data), 0, w, r)
    if pos != len(data):
        raise AvroError(f"{len(data) - pos} trailing bytes")
    return v

"""Pure-stdlib Avro Object Container File codec.

Spark ships Avro as an EXTERNAL module (spark-avro) that this sandbox
does not carry — probed: `format("avro")` fails with "Failed to find
data source: avro" — and no Python avro library is installed either.
Avro remains a standard interchange format for event pipelines (it is
the wire format of Kafka's schema registry, reference:
services/kafka.py uses JSON but production CDC overwhelmingly ships
Avro), so this module implements the Object Container File format
from the PUBLIC Avro 1.11 specification, the same
implement-the-format-from-the-spec approach the repo's PNG/GIF/WAV
codecs take:

- header: magic ``Obj\\x01``, file-metadata map (``avro.schema`` JSON,
  ``avro.codec``), 16-byte sync marker (spec "Object Container Files")
- blocks: record count (long), serialized size (long), payload,
  sync marker — payload raw or raw-DEFLATE (RFC 1951, the spec's
  ``deflate`` codec: zlib with no header/checksum)
- primitives: zigzag-varint longs, little-endian IEEE-754 doubles,
  length-prefixed UTF-8 strings/bytes, union-by-branch-index
  (spec "Binary Encoding"); ``timestamp-micros`` logical type rides
  a long (spec "Logical Types")

Scope: the primitives (null, boolean, int, long, float, double,
string, bytes), unions, timestamp-micros, and — r16, per the same
spec sections "Complex Types" / "Binary Encoding" — nested records,
arrays, and maps (blocked encoding: item-count blocks terminated by a
zero count; a negative count is followed by the block's byte size and
negated). Nested records are what real CDC Avro IS — the Debezium
envelope's before/after/source records — so refusing them made the
reader useless for its primary payload. Enums, fixed, named-type
references, and schema resolution stay out of scope — a reader
hitting them refuses loudly rather than mis-decoding. Python-value
mapping: record <-> dict keyed by field name, array <-> list,
map <-> dict with string keys. Wire-format compliance is pinned in
pytest against the spec's own zigzag examples, so files written here
are readable by any conforming Avro implementation.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "string",
    "bytes",
}


# -- primitive binary encoding (spec "Binary Encoding") ----------------------

def zigzag_encode(n: int) -> int:
    """64-bit zigzag: small magnitudes -> small unsigned codes
    (0→0, -1→1, 1→2, -2→3, ...)."""
    return (n << 1) ^ (n >> 63)


def zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_long(n: int) -> bytes:
    """Zigzag then base-128 varint, low group first — ints and longs
    share this encoding in Avro."""
    u = zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    u, shift = 0, 0
    while True:
        if pos >= len(buf):
            raise ValueError("Avro varint runs past end of buffer")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return zigzag_decode(u), pos
        shift += 7
        if shift > 63:
            raise ValueError("Avro varint longer than 64 bits")


def _is_null_node(typ) -> bool:
    return typ == "null" or (
        isinstance(typ, dict) and typ.get("type") == "null"
    )


def compile_encoder(typ):
    """Compile a schema node into a closure ``fn(v) -> bytes`` — the
    encode-side twin of compile_decoder: schema introspection happens
    once per writer, not once per cell (``_encode_value`` delegates
    here, so the spec-pinned wire tests exercise the same code)."""
    if isinstance(typ, list):  # union: branch index, then the value
        has_null = "null" in typ
        null_prefix = encode_long(typ.index("null")) if has_null else None
        branch = next(
            (i for i, t in enumerate(typ) if not _is_null_node(t)), None
        )
        branch_prefix = encode_long(branch) if branch is not None else None
        branch_enc = (
            compile_encoder(typ[branch]) if branch is not None else None
        )

        def enc_union(v, _typ=typ):
            if v is None:
                if not has_null:
                    raise ValueError(
                        f"null for non-nullable union {_typ}"
                    )
                return null_prefix
            return branch_prefix + branch_enc(v)

        return enc_union
    if isinstance(typ, dict) and typ.get("type") == "record":
        # spec "Complex Types": a record is its fields' values,
        # encoded in declaration order, no framing of its own
        fes = [(f["name"], compile_encoder(f["type"])) for f in typ["fields"]]

        def enc_record(v, _fes=fes):
            return b"".join(e(v[name]) for name, e in _fes)

        return enc_record
    if isinstance(typ, dict) and typ.get("type") == "array":
        # blocked encoding: non-empty blocks of (count, items...),
        # terminated by a zero count
        item_enc = compile_encoder(typ["items"])

        def enc_array(v, _e=item_enc):
            out = bytearray()
            if v:
                out += encode_long(len(v))
                for item in v:
                    out += _e(item)
            out += encode_long(0)
            return bytes(out)

        return enc_array
    if isinstance(typ, dict) and typ.get("type") == "map":
        # like arrays, with (string key, value) pairs; sorted keys
        # keep the fixture bytes deterministic (any order is legal)
        val_enc = compile_encoder(typ["values"])

        def enc_map(v, _e=val_enc):
            out = bytearray()
            if v:
                out += encode_long(len(v))
                for k in sorted(v):
                    kb = k.encode("utf-8")
                    out += encode_long(len(kb)) + kb
                    out += _e(v[k])
            out += encode_long(0)
            return bytes(out)

        return enc_map
    name = _type_name(typ)
    if name == "null":
        return lambda v: b""
    if name == "boolean":
        return lambda v: b"\x01" if v else b"\x00"
    if name in ("int", "long"):
        return lambda v: encode_long(int(v))
    if name == "float":
        return lambda v: struct.pack("<f", float(v))
    if name == "double":
        return lambda v: struct.pack("<d", float(v))
    if name == "string":

        def enc_string(v):
            raw = v.encode("utf-8")
            return encode_long(len(raw)) + raw

        return enc_string
    if name == "bytes":
        return lambda v: encode_long(len(v)) + bytes(v)
    raise ValueError(f"unsupported Avro type for encode: {typ!r}")


def _encode_value(typ, v) -> bytes:
    """Reference entry point (tests, one-off encodes): compile then
    run — identical bytes to the hot compiled path by construction."""
    return compile_encoder(typ)(v)


def compile_decoder(typ):
    """Compile a schema node into a closure ``fn(buf, pos) ->
    (value, pos)``. The interpretive walk re-dispatched on the schema
    dict for EVERY value (isinstance/dict.get per cell — measured as
    the dominant cost of the Debezium-envelope decode at ~30 schema
    nodes/row); compiling once per container moves all schema
    introspection out of the per-row path while keeping a single
    decode implementation (``_decode_value`` delegates here, so the
    spec-pinned wire tests exercise the same code)."""
    if isinstance(typ, list):  # union: branch index, then the value
        subs = [
            None if _is_null_node(t) else compile_decoder(t) for t in typ
        ]
        n_branches = len(typ)

        def dec_union(buf, pos, _subs=subs, _n=n_branches):
            branch, pos = decode_long(buf, pos)
            if not 0 <= branch < _n:
                raise ValueError(
                    f"Avro union branch {branch} out of range"
                )
            d = _subs[branch]
            if d is None:
                return None, pos
            return d(buf, pos)

        return dec_union
    if isinstance(typ, dict) and typ.get("type") == "record":
        fds = [(f["name"], compile_decoder(f["type"])) for f in typ["fields"]]

        def dec_record(buf, pos, _fds=fds):
            rec = {}
            for name, d in _fds:
                rec[name], pos = d(buf, pos)
            return rec, pos

        return dec_record
    if isinstance(typ, dict) and typ.get("type") in ("array", "map"):
        # blocked encoding: zero count terminates; a NEGATIVE count is
        # negated and followed by the block's byte size (spec: lets
        # skippers jump blocks without decoding)
        if typ["type"] == "array":
            item_dec = compile_decoder(typ["items"])

            def dec_array(buf, pos, _d=item_dec):
                items: list = []
                while True:
                    count, pos = decode_long(buf, pos)
                    if count == 0:
                        return items, pos
                    if count < 0:
                        _size, pos = decode_long(buf, pos)
                        count = -count
                    for _ in range(count):
                        v, pos = _d(buf, pos)
                        items.append(v)

            return dec_array
        val_dec = compile_decoder(typ["values"])

        def dec_map(buf, pos, _d=val_dec):
            entries: dict = {}
            while True:
                count, pos = decode_long(buf, pos)
                if count == 0:
                    return entries, pos
                if count < 0:
                    _size, pos = decode_long(buf, pos)
                    count = -count
                for _ in range(count):
                    n, pos = decode_long(buf, pos)
                    k = buf[pos : pos + n].decode("utf-8")
                    pos += n
                    entries[k], pos = _d(buf, pos)

        return dec_map
    name = _type_name(typ)
    if name == "null":
        return lambda buf, pos: (None, pos)
    if name == "boolean":
        return lambda buf, pos: (buf[pos] == 1, pos + 1)
    if name in ("int", "long"):
        return decode_long
    if name == "float":

        def dec_float(buf, pos):
            return struct.unpack_from("<f", buf, pos)[0], pos + 4

        return dec_float
    if name == "double":

        def dec_double(buf, pos):
            return struct.unpack_from("<d", buf, pos)[0], pos + 8

        return dec_double
    if name == "string":

        def dec_string(buf, pos):
            n, pos = decode_long(buf, pos)
            return buf[pos : pos + n].decode("utf-8"), pos + n

        return dec_string
    if name == "bytes":

        def dec_bytes(buf, pos):
            n, pos = decode_long(buf, pos)
            return bytes(buf[pos : pos + n]), pos + n

        return dec_bytes
    raise ValueError(f"unsupported Avro type for decode: {typ!r}")


def _decode_value(typ, buf: bytes, pos: int):
    """Reference entry point (tests, one-off decodes): compile then
    run — identical semantics to the hot compiled path by
    construction."""
    return compile_decoder(typ)(buf, pos)


def _type_name(typ) -> str:
    """Primitive name of a schema node ('{"type": "long",
    "logicalType": ...}' and plain 'long' are the same wire type)."""
    if isinstance(typ, str):
        name = typ
    elif isinstance(typ, dict):
        name = typ.get("type")
    else:
        raise ValueError(f"unsupported Avro schema node: {typ!r}")
    if name not in _PRIMITIVES:
        raise ValueError(
            f"unsupported Avro type {name!r} — this codec implements "
            "the primitive/union subset and refuses the rest"
        )
    return name


# -- container files (spec "Object Container Files") -------------------------

def _encode_meta_map(meta: dict[str, bytes]) -> bytes:
    out = bytearray(encode_long(len(meta)))
    for k, v in sorted(meta.items()):
        kb = k.encode("utf-8")
        out += encode_long(len(kb)) + kb
        out += encode_long(len(v)) + v
    out += encode_long(0)  # map terminator block
    return bytes(out)


def _decode_meta_map(buf: bytes, pos: int) -> tuple[dict[str, bytes], int]:
    meta: dict[str, bytes] = {}
    while True:
        count, pos = decode_long(buf, pos)
        if count == 0:
            return meta, pos
        if count < 0:
            # negative count is followed by a byte size (spec);
            # the items follow either way
            _size, pos = decode_long(buf, pos)
            count = -count
        for _ in range(count):
            n, pos = decode_long(buf, pos)
            k = buf[pos : pos + n].decode("utf-8")
            pos += n
            n, pos = decode_long(buf, pos)
            meta[k] = bytes(buf[pos : pos + n])
            pos += n


def write_container(
    path: str,
    schema: dict,
    rows,
    codec: str = "deflate",
    sync: bytes | None = None,
    block_rows: int = 4096,
) -> int:
    """Write rows (sequences matching ``schema['fields']`` order) as
    one Avro Object Container File; returns the row count. ``sync``
    defaults to a digest of the path — deterministic for the fixture
    caches, still unique per file as the spec intends."""
    import hashlib

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    field_encoders = [compile_encoder(f["type"]) for f in schema["fields"]]
    if sync is None:
        sync = hashlib.md5(path.encode()).digest()
    if len(sync) != SYNC_SIZE:
        raise ValueError("Avro sync marker must be 16 bytes")
    n_rows = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(
            _encode_meta_map(
                {
                    "avro.schema": json.dumps(schema).encode(),
                    "avro.codec": codec.encode(),
                }
            )
        )
        f.write(sync)
        block: list = []

        def flush():
            if not block:
                return
            payload = b"".join(
                b"".join(e(v) for e, v in zip(field_encoders, row))
                for row in block
            )
            if codec == "deflate":
                co = zlib.compressobj(9, zlib.DEFLATED, -15)  # raw
                payload = co.compress(payload) + co.flush()
            f.write(encode_long(len(block)))
            f.write(encode_long(len(payload)))
            f.write(payload)
            f.write(sync)
            block.clear()

        for row in rows:
            block.append(row)
            n_rows += 1
            if len(block) >= block_rows:
                flush()
        flush()
    return n_rows


def read_container(data: bytes) -> tuple[dict, list[tuple]]:
    """Decode one container file held in memory (the binaryFile-scan
    shape: whole shards arrive as binary cells); returns
    (schema, rows). Refuses unknown magic/codec and a corrupted sync
    chain rather than resyncing silently."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta, pos = _decode_meta_map(data, 4)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    if schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    field_decoders = [
        compile_decoder(f["type"]) for f in schema["fields"]
    ]
    sync = data[pos : pos + SYNC_SIZE]
    pos += SYNC_SIZE
    rows: list[tuple] = []
    while pos < len(data):
        count, pos = decode_long(data, pos)
        size, pos = decode_long(data, pos)
        payload = data[pos : pos + size]
        pos += size
        if data[pos : pos + SYNC_SIZE] != sync:
            raise ValueError("Avro block sync marker mismatch")
        pos += SYNC_SIZE
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        p = 0
        for _ in range(count):
            vals = []
            for d in field_decoders:
                v, p = d(payload, p)
                vals.append(v)
            rows.append(tuple(vals))
        if p != len(payload):
            raise ValueError(
                f"Avro block decoded {p} of {len(payload)} bytes — "
                "trailing garbage or a short read"
            )
    return schema, rows

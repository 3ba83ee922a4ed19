"""Avro object-container source & sink WITHOUT the spark-avro connector.

Reference surface: ``db.read_avro`` (module-level source re-export,
``src/dask_obj/core.py:6``) and the bag ``to_avro`` sink passthrough —
the one Tier-D cell every round-10 audit carried as environment-blocked
(no ``spark-avro_2.13`` jar in this image, no network to fetch one).

The block is only the CONNECTOR, not the format: the Avro object
container file is a small open spec (magic ``Obj\\x01``, a metadata map
carrying the JSON schema and codec, then length-prefixed binary blocks
separated by a 16-byte sync marker; values are zigzag-varint longs,
length-prefixed utf-8 strings/bytes, little-endian IEEE doubles/floats,
union-index-prefixed nullables).  So the sink is a pure-Python encoder
running INSIDE ``df.mapInArrow`` — one container file per non-empty
partition, written tmp-then-rename, with Arrow giving exact null
semantics (pandas would fold integer nulls into NaN) — and the source
is a Spark-4 Python DataSource (the ``synthetic_docs`` precedent in
sources/io.py) streaming length-prefixed blocks (O(block) memory, NOT
whole-file) and splitting large files at sync-marker boundaries into
multiple input partitions, exactly the way Hadoop's AvroInputFormat
does: seek into the byte range, pattern-scan forward to the next sync
marker, decode blocks whose start offset falls inside the range.  Both
sides scale the way every file source does: per-partition independent
work, no driver bottleneck, no shuffle.

Spec compliance is pinned by round-tripping through the APACHE AVRO JVM
reader (`org.apache.avro.file.DataFileReader`) that ships on Spark's
own classpath (avro-1.12.1.jar) — see tests/test_core.py — so the
bytes this writer emits are proven readable by the canonical
implementation, not merely by our own decoder.

Supported Spark types (the testdata + reference surface): integral
types → avro long, double/float, string, boolean, binary → bytes,
TimestampType → long+``timestamp-micros``, TimestampNTZType →
long+``local-timestamp-micros``, DateType → int+``date`` (the Avro
logical types, annotation-only on the wire — the JVM reader sees the
annotated long/int), ArrayType of the non-temporal scalars; every
field nullable via ["null", T] unions.  Codecs: ``null``, ``deflate``
(raw RFC-1951 via stdlib zlib, per the spec — no zlib wrapper, no
checksum), and ``snappy`` (pure-Python encoder/decoder per the public
snappy format description + the spec's 4-byte big-endian CRC32 of the
uncompressed block — interop path, not a throughput path).

Deterministic output: the sync marker is the md5 of (schema JSON,
partition id, write id), so identical data produces identical bytes —
replays and retries rewrite the same file instead of scattering
variants.

Filesystem contract: the sink's overwrite/rename/cleanup and the
source's directory listing use the LOCAL POSIX filesystem (os /
shutil), which is the execution model of this image (local[32], shared
FS).  On a real cluster with an object store or HDFS these paths would
route through the Hadoop FileSystem API (``spark._jvm``) instead; the
per-partition encode/decode is FS-agnostic.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

_PRIMS = {
    LongType: "long",
    IntegerType: "long",
    ShortType: "long",
    ByteType: "long",
    DoubleType: "double",
    FloatType: "float",
    StringType: "string",
    BooleanType: "boolean",
    BinaryType: "bytes",
}

# temporal Spark types ride as Avro logical types: an int/long on the
# wire plus a schema annotation (spark-avro uses the same mapping)
_LOGICAL = {
    TimestampType: "ts-micros",       # long + logicalType timestamp-micros
    TimestampNTZType: "ts-ntz-micros",  # long + local-timestamp-micros
    DateType: "date",                 # int + logicalType date
}


def _field_kinds(schema: StructType) -> list[tuple[str, str, str | None]]:
    """(name, kind, item_kind) per field; kind 'array' carries the item."""
    out = []
    for f in schema.fields:
        t = type(f.dataType)
        if t in _PRIMS:
            out.append((f.name, _PRIMS[t], None))
        elif t in _LOGICAL:
            out.append((f.name, _LOGICAL[t], None))
        elif t is ArrayType:
            it = type(f.dataType.elementType)
            if it not in _PRIMS:
                raise NotImplementedError(
                    f"avro sink: unsupported array element type "
                    f"{f.dataType.elementType} for field {f.name!r}"
                )
            out.append((f.name, "array", _PRIMS[it]))
        else:
            raise NotImplementedError(
                f"avro sink: unsupported type {f.dataType} for field {f.name!r}"
            )
    return out


def _avro_schema_json(kinds: list[tuple[str, str, str | None]], name: str) -> str:
    def t(kind, item):
        if kind == "array":
            base = {"type": "array", "items": item}
        elif kind == "ts-micros":
            base = {"type": "long", "logicalType": "timestamp-micros"}
        elif kind == "ts-ntz-micros":
            base = {"type": "long", "logicalType": "local-timestamp-micros"}
        elif kind == "date":
            base = {"type": "int", "logicalType": "date"}
        else:
            base = kind
        return ["null", base]  # every Spark field is nullable

    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [
                {"name": n, "type": t(k, i), "default": None}
                for n, k, i in kinds
            ],
        }
    )


def _make_avro_codec():
    """Self-contained encode/decode primitives (nested defs → cloudpickle
    ships them by value; workers never import this module — the
    `_make_bpe_greedy_encode` factory discipline from operators/corpus.py)."""

    import struct
    import zlib
    from datetime import date as _date
    from datetime import datetime as _datetime
    from datetime import timedelta as _timedelta
    from datetime import timezone as _timezone

    _EPOCH_UTC = _datetime(1970, 1, 1, tzinfo=_timezone.utc)
    _EPOCH_NAIVE = _datetime(1970, 1, 1)
    _EPOCH_DATE = _date(1970, 1, 1)

    def zz(n):
        u = (n << 1) ^ (n >> 63)
        out = bytearray()
        while u > 0x7F:
            out.append((u & 0x7F) | 0x80)
            u >>= 7
        out.append(u)
        return bytes(out)

    def enc_value(kind, v, buf):
        # ts/date reach here already as int micros/days (arrow cast)
        if kind in ("long", "ts-micros", "ts-ntz-micros", "date"):
            buf += zz(int(v))
        elif kind == "double":
            buf += struct.pack("<d", float(v))
        elif kind == "float":
            buf += struct.pack("<f", float(v))
        elif kind == "string":
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            buf += zz(len(b)) + b
        elif kind == "bytes":
            b = bytes(v)
            buf += zz(len(b)) + b
        elif kind == "boolean":
            buf += b"\x01" if v else b"\x00"
        else:
            raise ValueError(f"bad kind {kind}")

    def enc_row(kinds, row, buf):
        for (name, kind, item), v in zip(kinds, row):
            if v is None:
                buf += zz(0)  # union branch 0 = null
                continue
            buf += zz(1)  # union branch 1 = value
            if kind == "array":
                vals = list(v)
                if vals:
                    buf += zz(len(vals))
                    for x in vals:
                        enc_value(item, x, buf)
                buf += zz(0)
            else:
                enc_value(kind, v, buf)

    def header(schema_json, sync, codec="null"):
        buf = bytearray(b"Obj\x01")
        meta = [
            (b"avro.schema", schema_json.encode("utf-8")),
            (b"avro.codec", codec.encode("ascii")),
        ]
        buf += zz(len(meta))
        for k, v in meta:
            buf += zz(len(k)) + k + zz(len(v)) + v
        buf += zz(0)
        buf += sync
        return bytes(buf)

    # -- snappy (pure Python, per google/snappy format_description.txt;
    #    for interop with snappy-coded containers, not for throughput —
    #    the default codec stays "null") --

    def _snappy_emit_literal(out, src, lo, hi):
        n = hi - lo
        if n <= 0:
            return
        if n <= 60:
            out.append((n - 1) << 2)
        elif n <= 256:
            out.append(60 << 2)
            out += (n - 1).to_bytes(1, "little")
        else:  # fragments are <= 64 KiB, so 2 length bytes always fit
            out.append(61 << 2)
            out += (n - 1).to_bytes(2, "little")
        out += src[lo:hi]

    def _snappy_emit_copy(out, off, ln):
        while ln >= 68:
            out.append(2 | (63 << 2))  # copy-2, length 64
            out += off.to_bytes(2, "little")
            ln -= 64
        if ln > 64:  # leave a >= 4-byte remainder
            out.append(2 | (59 << 2))  # length 60
            out += off.to_bytes(2, "little")
            ln -= 60
        if 4 <= ln <= 11 and off < 2048:
            out.append(1 | ((ln - 4) << 2) | ((off >> 8) << 5))
            out.append(off & 0xFF)
        else:
            out.append(2 | ((ln - 1) << 2))
            out += off.to_bytes(2, "little")

    def snappy_compress(data):
        data = bytes(data)
        out = bytearray()
        # preamble: uncompressed length, plain little-endian base-128
        u = len(data)
        while u > 0x7F:
            out.append((u & 0x7F) | 0x80)
            u >>= 7
        out.append(u)
        # greedy hash matcher per 64 KiB fragment (matches never cross a
        # fragment, so copy offsets always fit the 2-byte copy tag) —
        # the structure of the reference C implementation, simplified
        for frag_lo in range(0, len(data), 1 << 16):
            src = data[frag_lo : frag_lo + (1 << 16)]
            n = len(src)
            table = {}
            i = lit_start = 0
            while i + 4 <= n:
                key = src[i : i + 4]
                j = table.get(key)
                table[key] = i
                if j is None:
                    i += 1
                    continue
                ln = 4
                while i + ln < n and src[j + ln] == src[i + ln]:
                    ln += 1
                _snappy_emit_literal(out, src, lit_start, i)
                _snappy_emit_copy(out, i - j, ln)
                i += ln
                lit_start = i
            _snappy_emit_literal(out, src, lit_start, n)
        return bytes(out)

    def snappy_decompress(data):
        mv = memoryview(data)
        pos, n = 0, len(data)
        ulen = shift = 0
        while True:
            b = mv[pos]
            pos += 1
            ulen |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        out = bytearray()
        while pos < n:
            tag = mv[pos]
            pos += 1
            t = tag & 3
            if t == 0:  # literal
                ln = tag >> 2
                if ln >= 60:
                    nb = ln - 59
                    ln = int.from_bytes(mv[pos : pos + nb], "little")
                    pos += nb
                ln += 1
                out += mv[pos : pos + ln]
                pos += ln
                continue
            if t == 1:  # copy, 1-byte offset
                ln = 4 + ((tag >> 2) & 7)
                off = ((tag >> 5) << 8) | mv[pos]
                pos += 1
            elif t == 2:  # copy, 2-byte offset
                ln = (tag >> 2) + 1
                off = int.from_bytes(mv[pos : pos + 2], "little")
                pos += 2
            else:  # copy, 4-byte offset
                ln = (tag >> 2) + 1
                off = int.from_bytes(mv[pos : pos + 4], "little")
                pos += 4
            if off == 0 or off > len(out):
                raise ValueError("snappy: bad copy offset")
            start = len(out) - off
            if off >= ln:
                out += out[start : start + ln]
            else:  # overlapping copy: byte-wise, RLE-style
                for k in range(ln):
                    out.append(out[start + k])
        if len(out) != ulen:
            raise ValueError("snappy: declared/actual length mismatch")
        return bytes(out)

    def compress(codec, block):
        if codec == "null":
            return bytes(block)
        if codec == "deflate":
            # Avro deflate = raw RFC-1951 stream (wbits=-15): no zlib
            # header, no checksum
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            return c.compress(bytes(block)) + c.flush()
        if codec == "snappy":
            # Avro snappy = snappy stream + 4-byte BIG-endian CRC32 of
            # the UNCOMPRESSED data (java.util.zip.CRC32 == zlib.crc32)
            raw = bytes(block)
            return snappy_compress(raw) + struct.pack(
                ">I", zlib.crc32(raw) & 0xFFFFFFFF
            )
        raise NotImplementedError(f"avro codec {codec!r} not supported")

    # ---- decoder (the read side of the same spec) ----

    def rd_long(mv, pos):
        shift = u = 0
        while True:
            b = mv[pos]
            pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1), pos

    def rd_value(kind, mv, pos):
        if kind == "long":
            return rd_long(mv, pos)
        if kind == "double":
            return struct.unpack("<d", mv[pos : pos + 8])[0], pos + 8
        if kind == "float":
            return struct.unpack("<f", mv[pos : pos + 4])[0], pos + 4
        if kind in ("string", "bytes"):
            n, pos = rd_long(mv, pos)
            raw = bytes(mv[pos : pos + n])
            return (raw.decode("utf-8") if kind == "string" else raw), pos + n
        if kind == "boolean":
            return mv[pos] == 1, pos + 1
        if kind == "ts-micros":
            us, pos = rd_long(mv, pos)
            return _EPOCH_UTC + _timedelta(microseconds=us), pos
        if kind == "ts-ntz-micros":
            us, pos = rd_long(mv, pos)
            return _EPOCH_NAIVE + _timedelta(microseconds=us), pos
        if kind == "ts-millis":  # foreign files: timestamp-millis
            ms, pos = rd_long(mv, pos)
            return _EPOCH_UTC + _timedelta(milliseconds=ms), pos
        if kind == "ts-ntz-millis":
            ms, pos = rd_long(mv, pos)
            return _EPOCH_NAIVE + _timedelta(milliseconds=ms), pos
        if kind == "date":
            days, pos = rd_long(mv, pos)
            return _EPOCH_DATE + _timedelta(days=days), pos
        raise ValueError(f"bad kind {kind}")

    def rd_row(plan, nsel, mv, pos):
        """Decode one record per the FILE's schema plan, projecting into
        `nsel` output slots.  plan rows: (kind, item_kind, mode, slot) —
        mode is 'plain' (non-nullable), 'null0' (["null",T]), or 'null1'
        ([T,"null"]); slot is the output index, or -1 for a file field
        the caller did not request (its bytes are still consumed —
        Avro rows have no per-field offsets)."""
        row = [None] * nsel
        for kind, item, mode, slot in plan:
            if mode == "plain":
                is_null = False
            else:
                branch, pos = rd_long(mv, pos)
                is_null = (branch == 0) if mode == "null0" else (branch == 1)
            if is_null:
                continue
            if kind == "array":
                vals = []
                while True:
                    n, pos = rd_long(mv, pos)
                    if n == 0:
                        break
                    if n < 0:  # block with byte-size prefix
                        n = -n
                        _, pos = rd_long(mv, pos)
                    for _ in range(n):
                        v, pos = rd_value(item, mv, pos)
                        vals.append(v)
                if slot >= 0:
                    row[slot] = vals
            else:
                v, pos = rd_value(kind, mv, pos)
                if slot >= 0:
                    row[slot] = v
        return row, pos

    # -- streaming file-handle primitives (header parse + block scan) --

    def rd_long_f(fh):
        shift = u = 0
        while True:
            b = fh.read(1)[0]
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)

    def read_header(fh):
        """Parse magic + metadata map + sync from the current handle
        position (must be 0).  Returns (codec:str, schema_json:str,
        sync:bytes, header_len:int).  Streams — never loads the file."""
        if fh.read(4) != b"Obj\x01":
            raise ValueError("not an avro container file")
        codec = b"null"
        schema_raw = None
        nmeta = rd_long_f(fh)
        while nmeta != 0:
            if nmeta < 0:
                nmeta = -nmeta
                rd_long_f(fh)  # byte-size prefix of the map block
            for _ in range(nmeta):
                kl = rd_long_f(fh)
                key = fh.read(kl)
                vl = rd_long_f(fh)
                val = fh.read(vl)
                if key == b"avro.codec":
                    codec = val
                elif key == b"avro.schema":
                    schema_raw = val
            nmeta = rd_long_f(fh)
        codec_s = (codec or b"null").decode("ascii")
        if codec_s not in ("null", "deflate", "snappy"):
            raise NotImplementedError(f"avro codec {codec_s!r} not supported")
        if schema_raw is None:
            raise ValueError("avro container missing avro.schema metadata")
        sync = fh.read(16)
        return codec_s, schema_raw.decode("utf-8"), sync, fh.tell()

    def _avro_type_to_kind(t):
        """Map one (non-union) avro schema type to our kind tag."""
        prims = {
            "long": "long", "int": "long", "double": "double",
            "float": "float", "string": "string", "bytes": "bytes",
            "boolean": "boolean",
        }
        if isinstance(t, str):
            if t in prims:
                return prims[t], None
            raise NotImplementedError(f"avro type {t!r} not supported")
        if isinstance(t, dict):
            lt = t.get("logicalType")
            if lt == "timestamp-micros":
                return "ts-micros", None
            if lt == "local-timestamp-micros":
                return "ts-ntz-micros", None
            if lt == "timestamp-millis":
                return "ts-millis", None
            if lt == "local-timestamp-millis":
                return "ts-ntz-millis", None
            if lt == "date":
                return "date", None
            if t.get("type") == "array":
                it = t["items"]
                if isinstance(it, dict) and "logicalType" not in it:
                    it = it.get("type")
                ik, sub = _avro_type_to_kind(it)
                if sub is not None or ik == "array":
                    raise NotImplementedError("avro: nested arrays not supported")
                return "array", ik
            if t.get("type") in prims or "logicalType" in t:
                # dict-wrapped primitive (unknown logical types fall back
                # to their base wire type, per the avro spec)
                base = t.get("type")
                if base in prims:
                    return prims[base], None
            raise NotImplementedError(f"avro type {t!r} not supported")
        raise NotImplementedError(f"avro type {t!r} not supported")

    def kinds_from_schema_json(schema_json):
        """FILE-schema decode plan: [(name, kind, item_kind, mode)] where
        mode records nullability + union null-branch index ('plain',
        'null0', 'null1').  This is what makes foreign containers —
        arbitrary field order, [T,"null"] unions, non-nullable fields —
        decode correctly instead of per the caller's requested layout."""
        import json as _json

        sch = _json.loads(schema_json)
        if not isinstance(sch, dict) or sch.get("type") != "record":
            raise NotImplementedError("avro: top-level schema must be a record")
        out = []
        for f in sch.get("fields", []):
            t = f["type"]
            mode = "plain"
            if isinstance(t, list):
                if len(t) == 2 and "null" in t:
                    ni = t.index("null")
                    mode = "null0" if ni == 0 else "null1"
                    t = t[1 - ni]
                else:
                    raise NotImplementedError(
                        f"avro: unsupported union {t} for field {f['name']!r}"
                    )
            kind, item = _avro_type_to_kind(t)
            out.append((f["name"], kind, item, mode))
        return out

    def _validate_anchor(fh, anchor, sync, filesize):
        """True iff a well-formed block starts at `anchor`: positive row
        count, in-bounds size, and the 16-byte sync marker sits exactly
        after the data — a 128-bit check that makes a false sync-pattern
        match in row data vanishingly unlikely to also validate."""
        try:
            fh.seek(anchor)
            cnt = rd_long_f(fh)
            size = rd_long_f(fh)
            if cnt <= 0 or size < 0:
                return False
            data_end = fh.tell() + size
            if data_end + 16 > filesize:
                return False
            fh.seek(data_end)
            return fh.read(16) == sync
        except (IndexError, OSError):
            return False

    def find_anchor(fh, sync, start, filesize):
        """First validated block start (offset of its count varint)
        >= `start`, found by scanning for the sync pattern the way
        Avro's own DataFileReader.sync() does — chunked, O(1) memory,
        15-byte overlap so markers straddling chunk edges are seen."""
        pos = max(start - 16, 0)
        tail = b""
        base = pos
        while True:
            fh.seek(base + len(tail))
            chunk = fh.read(1 << 20)
            if not chunk:
                return None
            buf = tail + chunk
            off = 0
            while True:
                q = buf.find(sync, off)
                if q < 0:
                    break
                anchor = base + q + 16
                if anchor >= start and _validate_anchor(fh, anchor, sync, filesize):
                    return anchor
                off = q + 1
            # keep a 15-byte overlap for markers spanning the boundary
            base += len(buf) - 15
            tail = buf[-15:]

    def iter_block_rows(fh, anchor, hi, filesize, sync, codec, plan, nsel):
        """Decode blocks starting at `anchor` while their start offset
        is < `hi` (split ownership rule: a block belongs to the split
        containing its first byte).  O(one block) memory."""
        import zlib as _zlib

        pos = anchor
        while pos is not None and pos < hi and pos + 16 < filesize:
            fh.seek(pos)
            cnt = rd_long_f(fh)
            size = rd_long_f(fh)
            data = fh.read(size)
            if codec == "deflate":
                data = _zlib.decompress(data, -15)
            elif codec == "snappy":
                crc = int.from_bytes(data[-4:], "big")
                data = snappy_decompress(data[:-4])
                if _zlib.crc32(data) & 0xFFFFFFFF != crc:
                    raise ValueError(
                        f"avro snappy block at offset {pos}: CRC mismatch"
                    )
            mv = memoryview(data)
            p = 0
            for _ in range(cnt):
                row, p = rd_row(plan, nsel, mv, p)
                yield row
            got = fh.read(16)
            if got != sync:
                raise ValueError(
                    f"avro: bad sync after block at offset {pos} "
                    f"(corrupt file or mid-write read)"
                )
            pos = fh.tell()

    return {
        "zz": zz,
        "enc_row": enc_row,
        "header": header,
        "compress": compress,
        "read_header": read_header,
        "find_anchor": find_anchor,
        "iter_block_rows": iter_block_rows,
        "kinds_from_schema_json": kinds_from_schema_json,
        "snappy_compress": snappy_compress,
        "snappy_decompress": snappy_decompress,
    }


def to_avro(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    codec: str = "null",
    block_rows: int = 4096,
    write_id: str | None = None,
) -> DataFrame:
    """Distributed Avro sink: one container file per non-empty partition
    via ``mapInArrow`` (exact nulls), tmp-then-rename per file, rows
    chunked into blocks of at most ``block_rows`` so readers stay
    O(block) and big files split at sync boundaries.  ``codec`` is
    ``"null"``, ``"deflate"`` (raw zlib per the spec), or ``"snappy"``
    (pure-Python, + big-endian CRC32 suffix per the spec).  Returns the
    per-file stats frame (file, n_rows) — dimension-sized — after
    materializing it (the write IS the action).

    ``mode="append"`` REQUIRES a caller-supplied ``write_id``: files are
    named ``part-{pid}-{write_id}.avro``, so distinct appends coexist
    while a RETRY of the same (data, write_id) idempotently rewrites the
    same files.  Without it, a second append's part-00000 would
    ``os.replace`` the first one's — silent data loss (round-11 advice).

    Overwrite/rename assume a local POSIX filesystem (true in this
    image); on a cluster store, route through the Hadoop FS API.
    """
    import shutil

    if codec not in ("null", "deflate", "snappy"):
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    if block_rows < 1:
        raise ValueError("to_avro: block_rows must be >= 1")
    kinds = _field_kinds(df.schema)
    schema_json = _avro_schema_json(kinds, "spark_row")
    if mode == "overwrite":
        shutil.rmtree(path, ignore_errors=True)  # local-FS contract (see docstring)
    elif mode == "append":
        if write_id is None:
            raise ValueError(
                "to_avro: mode='append' requires write_id= (a per-write "
                "unique, retry-stable token) — otherwise part files from "
                "an earlier append would be silently replaced"
            )
    else:
        raise ValueError(f"to_avro: unsupported mode {mode!r}")
    os.makedirs(path, exist_ok=True)
    suffix = f"-{write_id}" if write_id is not None else ""
    # call the factory on the DRIVER: the returned nested (<locals>)
    # functions cloudpickle BY VALUE into the closure — capturing the
    # module-level factory itself would pickle by reference and fail
    # on executors without dask_obj_spark on PYTHONPATH (verify-skill
    # worker-closure rule; _make_bpe_greedy_encode precedent)
    cdc = _make_avro_codec()
    zz, enc_row, header, compress = (
        cdc["zz"], cdc["enc_row"], cdc["header"], cdc["compress"],
    )
    # temporal columns: have Arrow hand us the raw int micros/days —
    # exact, tz-free, and ~free (a metadata-only cast)
    cast_kinds = {"ts-micros": "int64", "ts-ntz-micros": "int64", "date": "int32"}
    casts = [cast_kinds.get(k) for _, k, _ in kinds]

    def write_partition(batches):
        import hashlib
        import os as _os

        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sync = hashlib.md5(
            (schema_json + f"#part{pid}{suffix}").encode("utf-8")
        ).digest()
        fh = None
        final = _os.path.join(path, f"part-{pid:05d}{suffix}.avro")
        tmp = final + ".tmp"
        n_rows = 0
        for batch in batches:
            cols = [
                (batch.column(i).cast(getattr(pa, c)()) if c else batch.column(i))
                .to_pylist()
                for i, c in enumerate(casts)
            ]
            if not cols or not cols[0]:
                continue
            if fh is None:
                fh = open(tmp, "wb")
                fh.write(header(schema_json, sync, codec))
            cnt_total = len(cols[0])
            for lo in range(0, cnt_total, block_rows):
                hi = min(lo + block_rows, cnt_total)
                block = bytearray()
                for r in range(lo, hi):
                    enc_row(kinds, [c[r] for c in cols], block)
                payload = compress(codec, block)
                fh.write(zz(hi - lo) + zz(len(payload)) + payload + sync)
            n_rows += cnt_total
        if fh is not None:
            fh.close()
            _os.replace(tmp, final)
            yield pa.RecordBatch.from_pydict(
                {"file": [f"part-{pid:05d}{suffix}.avro"], "n_rows": [n_rows]}
            )

    stats = df.mapInArrow(
        write_partition, "file string, n_rows bigint"
    ).localCheckpoint(eager=True)
    return stats


def read_avro(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    split_bytes: int = 32 << 20,
) -> DataFrame:
    """Distributed Avro source without the connector jar: a Spark-4
    Python DataSource whose reader STREAMS length-prefixed blocks
    (O(block) memory, never the whole file) and SPLITS files larger
    than ``split_bytes`` at sync-marker boundaries into multiple input
    partitions — the Hadoop AvroInputFormat recipe: seek into the byte
    range, pattern-scan to the next 16-byte sync, own every block whose
    start offset falls inside [lo, hi).  A foreign multi-GB container
    therefore fans out across tasks instead of pinning one task + one
    file of memory.  ``schema`` is required (DDL string or StructType)
    — never inferred at plan time, so the scan stays a single pass.

    Schema RESOLUTION, per file: each task decodes per the FILE's own
    writer schema (parsed from the container header) and projects the
    requested columns by NAME — so foreign containers with a different
    field order, ``[T, "null"]`` union order, non-nullable fields,
    extra fields (consumed and dropped), or ``timestamp-millis``
    temporals (promoted to the requested micros class, as are int →
    long and float → double) all read correctly.  A requested field
    missing from a file, or present with an incompatible type, raises
    a ValueError naming the field and both types.
    An empty directory (e.g. the round-trip of an all-empty frame)
    yields an empty DataFrame, not an executor error.  The directory
    listing assumes a local POSIX filesystem (true in this image)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema) if isinstance(schema, str) else schema
    kinds = _field_kinds(st)
    # driver-side factory call → by-value pickling (see to_avro)
    cdc = _make_avro_codec()
    read_header, find_anchor, iter_block_rows, kinds_from_schema_json = (
        cdc["read_header"], cdc["find_anchor"], cdc["iter_block_rows"],
        cdc["kinds_from_schema_json"],
    )

    # requested kind per output slot; a file kind is accepted for a
    # requested kind per avro schema-resolution promotions (float→double,
    # millis→the requested micros timestamp class).  long→double is NOT
    # accepted: the decoder would hand Spark a Python int in a double
    # slot — read as long and cast instead.  Timestamps resolve ACROSS
    # the instant/naive classes: the wire value is the same long either
    # way, the UNIT (millis/micros) comes from the file, and the
    # AWARENESS comes from the reader's declared type — exactly the
    # interpretation contract Spark's session gives those columns (and
    # what the pre-resolution reader did; events.ts round-trips as
    # TimestampType written / timestamp_ntz requested).
    _TS_KINDS = ("ts-micros", "ts-millis", "ts-ntz-micros", "ts-ntz-millis")
    _COMPAT = {
        "double": ("double", "float"),
        "float": ("float",),
        "long": ("long",),
        "string": ("string",),
        "bytes": ("bytes",),
        "boolean": ("boolean",),
        "ts-micros": _TS_KINDS,
        "ts-ntz-micros": _TS_KINDS,
        "date": ("date",),
    }

    def _resolve_plan(file_kinds, fname):
        """Project the FILE's decode order onto the requested columns:
        every file field is decoded (rows have no per-field offsets),
        requested fields land in their output slot, extras are consumed
        and dropped.  Raises loudly on missing/incompatible fields."""
        slot_of = {}
        for i, (name, kind, item) in enumerate(kinds):
            slot_of[name] = (i, kind, item)
        plan, seen = [], set()
        for name, fkind, fitem, mode in file_kinds:
            if name not in slot_of:
                plan.append((fkind, fitem, mode, -1))
                continue
            i, rkind, ritem = slot_of[name]
            seen.add(name)
            if rkind == "array":
                ok = fkind == "array" and fitem in _COMPAT.get(ritem, ())
            else:
                ok = fkind in _COMPAT.get(rkind, ())
            if not ok:
                raise ValueError(
                    f"read_avro: field {name!r} in {fname} has avro kind "
                    f"{fkind!r}{f'<{fitem}>' if fitem else ''}, incompatible "
                    f"with requested {rkind!r}"
                )
            if rkind in ("ts-micros", "ts-ntz-micros"):
                # unit from the file, awareness from the request
                unit = "millis" if fkind.endswith("millis") else "micros"
                fkind = ("ts-ntz-" if rkind == "ts-ntz-micros" else "ts-") + unit
            plan.append((fkind, fitem, mode, i))
        missing = [n for n, _, _ in kinds if n not in seen]
        if missing:
            raise ValueError(
                f"read_avro: fields {missing} not present in {fname} "
                f"(file has {[n for n, *_ in file_kinds]})"
            )
        return plan
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro")
    )
    splits = []
    for f in files:
        size = os.path.getsize(f)
        n = max(1, math.ceil(size / split_bytes))
        for i in range(n):
            splits.append((f, i * split_bytes, min((i + 1) * split_bytes, size), size))

    class _Split(InputPartition):
        def __init__(self, f, lo, hi, size):
            self.f, self.lo, self.hi, self.size = f, lo, hi, size

    class _Reader(DataSourceReader):
        def partitions(self):
            return [_Split(*s) for s in splits]

        def read(self, part):
            # an empty dir → partitions() == [], which PySpark turns
            # into a single None partition — yield nothing (r11 advice)
            if part is None:
                return
            with open(part.f, "rb") as fh:
                codec, schema_json, sync, header_len = read_header(fh)
                # decode per the FILE's writer schema, project by name —
                # foreign field order / union order / non-nullable
                # fields / extra fields all resolve correctly
                plan = _resolve_plan(
                    kinds_from_schema_json(schema_json), part.f
                )
                if part.lo == 0:
                    anchor = header_len if header_len < part.hi else None
                else:
                    anchor = find_anchor(fh, sync, part.lo, part.size)
                if anchor is None:
                    return
                for row in iter_block_rows(
                    fh, anchor, part.hi, part.size, sync, codec,
                    plan, len(kinds),
                ):
                    yield tuple(row)

    class _AvroSource(DataSource):
        @classmethod
        def name(cls):
            return "dask_obj_avro"

        def schema(self):
            return st

        def reader(self, schema):
            return _Reader()

    spark.dataSource.register(_AvroSource)
    return spark.read.format("dask_obj_avro").schema(st).load()

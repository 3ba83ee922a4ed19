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
sources/io.py) decoding one file per input partition.  Both scale the
same way every file source does: per-partition independent work, no
driver bottleneck, no shuffle.

Spec compliance is pinned by round-tripping through the APACHE AVRO JVM
reader (`org.apache.avro.file.DataFileReader`) that ships on Spark's
own classpath (avro-1.12.1.jar) — see tests/test_core.py — so the
bytes this writer emits are proven readable by the canonical
implementation, not merely by our own decoder.

Supported Spark types (the testdata + reference surface): integral
types → avro long, double/float, string, boolean, binary → bytes,
ArrayType of any of those; every field nullable via ["null", T] unions.
Deterministic output: the sync marker is the md5 of (schema JSON,
partition id), so identical data produces identical bytes — replays
and retries rewrite the same file instead of scattering variants.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
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


def _field_kinds(schema: StructType) -> list[tuple[str, str, str | None]]:
    """(name, kind, item_kind) per field; kind 'array' carries the item."""
    out = []
    for f in schema.fields:
        t = type(f.dataType)
        if t in _PRIMS:
            out.append((f.name, _PRIMS[t], None))
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
        base = {"type": "array", "items": item} if kind == "array" else kind
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

    def zz(n):
        u = (n << 1) ^ (n >> 63)
        out = bytearray()
        while u > 0x7F:
            out.append((u & 0x7F) | 0x80)
            u >>= 7
        out.append(u)
        return bytes(out)

    def enc_value(kind, v, buf):
        if kind == "long":
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

    def header(schema_json, sync):
        buf = bytearray(b"Obj\x01")
        meta = [
            (b"avro.schema", schema_json.encode("utf-8")),
            (b"avro.codec", b"null"),
        ]
        buf += zz(len(meta))
        for k, v in meta:
            buf += zz(len(k)) + k + zz(len(v)) + v
        buf += zz(0)
        buf += sync
        return bytes(buf)

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
        raise ValueError(f"bad kind {kind}")

    def rd_row(kinds, mv, pos):
        row = []
        for name, kind, item in kinds:
            branch, pos = rd_long(mv, pos)
            if branch == 0:
                row.append(None)
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
                row.append(vals)
            else:
                v, pos = rd_value(kind, mv, pos)
                row.append(v)
        return row, pos

    def read_container(data, kinds):
        mv = memoryview(data)
        assert bytes(mv[:4]) == b"Obj\x01", "not an avro container file"
        pos = 4
        nmeta, pos = rd_long(mv, pos)
        codec = b"null"
        while nmeta != 0:
            if nmeta < 0:
                nmeta = -nmeta
                _, pos = rd_long(mv, pos)
            for _ in range(nmeta):
                kl, pos = rd_long(mv, pos)
                key = bytes(mv[pos : pos + kl])
                pos += kl
                vl, pos = rd_long(mv, pos)
                val = bytes(mv[pos : pos + vl])
                pos += vl
                if key == b"avro.codec":
                    codec = val
            nmeta, pos = rd_long(mv, pos)
        if codec not in (b"null", b""):
            raise NotImplementedError(f"avro codec {codec!r} not supported")
        pos += 16  # sync
        rows = []
        while pos < len(mv):
            cnt, pos = rd_long(mv, pos)
            _size, pos = rd_long(mv, pos)
            for _ in range(cnt):
                row, pos = rd_row(kinds, mv, pos)
                rows.append(row)
            pos += 16  # sync
        return rows

    return zz, enc_row, header, read_container


def to_avro(df: DataFrame, path: str, mode: str = "overwrite") -> DataFrame:
    """Distributed Avro sink: one container file per non-empty partition
    via ``mapInArrow`` (exact nulls), tmp-then-rename per file.  Returns
    the per-file stats frame (file, n_rows) — dimension-sized — after
    materializing it (the write IS the action)."""
    import shutil

    kinds = _field_kinds(df.schema)
    schema_json = _avro_schema_json(kinds, "spark_row")
    if mode == "overwrite":
        shutil.rmtree(path, ignore_errors=True)
    elif mode != "append":
        raise ValueError(f"to_avro: unsupported mode {mode!r}")
    os.makedirs(path, exist_ok=True)
    # call the factory on the DRIVER: the returned nested (<locals>)
    # functions cloudpickle BY VALUE into the closure — capturing the
    # module-level factory itself would pickle by reference and fail
    # on executors without dask_obj_spark on PYTHONPATH (verify-skill
    # worker-closure rule; _make_bpe_greedy_encode precedent)
    zz, enc_row, header, _ = _make_avro_codec()

    def write_partition(batches):
        import hashlib
        import os as _os

        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sync = hashlib.md5(
            (schema_json + f"#part{pid}").encode("utf-8")
        ).digest()
        fh = None
        final = _os.path.join(path, f"part-{pid:05d}.avro")
        tmp = final + ".tmp"
        n_rows = 0
        for batch in batches:
            cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
            if not cols or not cols[0]:
                continue
            if fh is None:
                fh = open(tmp, "wb")
                fh.write(header(schema_json, sync))
            block = bytearray()
            cnt = len(cols[0])
            for r in range(cnt):
                enc_row(kinds, [c[r] for c in cols], block)
            fh.write(zz(cnt) + zz(len(block)) + bytes(block) + sync)
            n_rows += cnt
        if fh is not None:
            fh.close()
            _os.replace(tmp, final)
            yield pa.RecordBatch.from_pydict(
                {"file": [f"part-{pid:05d}.avro"], "n_rows": [n_rows]}
            )

    stats = df.mapInArrow(
        write_partition, "file string, n_rows bigint"
    ).localCheckpoint(eager=True)
    return stats


def read_avro(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Distributed Avro source without the connector jar: a Spark-4
    Python DataSource, one input partition per container file (the
    ``synthetic_docs`` precedent), pure-Python block decoder per task.
    ``schema`` is required (DDL string or StructType) — never inferred
    at plan time, so the scan stays a single pass."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema) if isinstance(schema, str) else schema
    kinds = _field_kinds(st)
    # driver-side factory call → by-value pickling (see to_avro)
    _, _, _, read_container = _make_avro_codec()
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro")
    )

    class _File(InputPartition):
        def __init__(self, f):
            self.f = f

    class _Reader(DataSourceReader):
        def partitions(self):
            return [_File(f) for f in files]

        def read(self, part):
            with open(part.f, "rb") as fh:
                data = fh.read()
            for row in read_container(data, kinds):
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

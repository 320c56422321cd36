"""Avro source WITHOUT the spark-avro jar — a pure-stdlib implementation
of the Avro 1.11 object-container format (public spec:
https://avro.apache.org/docs/1.11.1/specification/) behind a Spark 4
Python DataSource.

The r2-r4 rounds documented Avro as environment-blocked (external
spark-avro jar, no pip). Like ``sqlite_ds.py``, the block dissolves
with public stdlib machinery: the container format is a JSON schema
header + deflate(zlib)/null-codec data blocks of binary-encoded rows —
every piece decodable with ``json``, ``zlib`` and ``struct``.

Supported schema subset (the warehouse-interchange core):

* primitives: null, boolean, int, long, float, double, bytes, string
* record (top level must be a record), array<T>, map<T>, enum, fixed
* unions — general N-branch unions decode to the first non-null
  branch's Spark type (the overwhelmingly common ``["null", T]``
  nullable pattern maps exactly; mixed-type unions would need Spark
  variant types and raise)
* logical types: timestamp-micros/millis → TimestampType,
  date → DateType (decoded to epoch-day ints then converted),
  decimal(bytes) is NOT mapped (raises — no exact context here)

Parallelism: one Spark partition per ``.avro`` FILE (the standard
directory-of-files layout gives multi-file datasets full parallelism;
splitting a single file on sync markers is possible but needs a scan —
documented trade, not silent). Each task opens and decodes only its
file.

Writing is DISTRIBUTED too (r6): :class:`AvroBatchWriter` implements
the Python DataSource write protocol — each task streams its partition
into one deflate-block container file under a temp name, the driver's
``commit`` renames them into place (overwrite removes stale parts),
``abort`` cleans up — so the spark-avro jar is not needed in either
direction. :func:`write_avro` remains as the bounded single-file
fixture writer (deterministic sync marker).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from dataclasses import dataclass
from datetime import date, datetime, timedelta, timezone
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FORMAT_NAME = "avro_py"
_MAGIC = b"Obj\x01"
_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)
_EPOCH_DAY = date(1970, 1, 1)


# ---------------------------------------------------------------------------
# binary decoding (spec §"Binary encoding")
# ---------------------------------------------------------------------------

class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        p = self.pos
        self.pos = p + n
        out = self.buf[p : p + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        return out

    def read_long(self) -> int:
        # variable-length zig-zag
        b = self.buf
        p = self.pos
        shift = 0
        acc = 0
        while True:
            byte = b[p]
            p += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        self.pos = p
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _decode(r: _Reader, schema):
    """Decode one value of ``schema`` (parsed JSON) from ``r``."""
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) == b"\x01"
        if t in ("int", "long"):
            return r.read_long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.read_bytes()
        if t == "string":
            return r.read_bytes().decode("utf-8")
        raise ValueError(f"unsupported avro type: {t}")
    if isinstance(schema, list):  # union: long branch index, then value
        idx = r.read_long()
        return _decode(r, schema[idx])
    t = schema["type"]
    if t == "record":
        return tuple(_decode(r, f["type"]) for f in schema["fields"])
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(r, schema["values"])
        return out
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        return r.read(schema["size"])
    if t in ("int", "long"):  # annotated primitive (logicalType wrapper)
        v = r.read_long()
        lt = schema.get("logicalType")
        if lt == "timestamp-micros":
            return _EPOCH + timedelta(microseconds=v)
        if lt == "timestamp-millis":
            return _EPOCH + timedelta(milliseconds=v)
        if lt == "date":
            return _EPOCH_DAY + timedelta(days=v)
        return v
    if t in ("null", "boolean", "float", "double", "bytes", "string"):
        return _decode(r, t)
    raise ValueError(f"unsupported avro type: {t}")


def _spark_type(schema) -> DataType:
    if isinstance(schema, str):
        return {
            "boolean": BooleanType(),
            "int": IntegerType(),
            "long": LongType(),
            "float": FloatType(),
            "double": DoubleType(),
            "bytes": BinaryType(),
            "string": StringType(),
            "null": StringType(),  # standalone null column — inert
        }[schema]
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        if len(branches) != 1:
            raise ValueError("mixed-type avro unions are not supported")
        return _spark_type(branches[0])
    t = schema["type"]
    if t == "record":
        return StructType(
            [
                StructField(f["name"], _spark_type(f["type"]), True)
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return ArrayType(_spark_type(schema["items"]), True)
    if t == "map":
        return MapType(StringType(), _spark_type(schema["values"]), True)
    if t == "enum":
        return StringType()
    if t == "fixed":
        return BinaryType()
    lt = schema.get("logicalType")
    if lt in ("timestamp-micros", "timestamp-millis"):
        return TimestampType()
    if lt == "date":
        return DateType()
    if lt == "decimal":
        raise ValueError("avro decimal logical type is not supported")
    return _spark_type(t)


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------

def _read_header(data: bytes):
    """Parse container header from ``data`` → (schema, codec, sync,
    reader positioned at the first block)."""
    if data[:4] != _MAGIC:
        raise ValueError("not an avro object container file")
    r = _Reader(data)
    r.pos = 4
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync, r


def _iter_file(path: str) -> Iterator[tuple]:
    with open(path, "rb") as fh:
        schema, codec, sync, r = _read_header(fh.read())
        while r.pos < len(r.buf):
            n_rows = r.read_long()
            size = r.read_long()
            block = r.read(size)
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            elif codec != "null":
                raise ValueError(f"unsupported avro codec: {codec}")
            if r.read(16) != sync:
                raise ValueError("avro sync marker mismatch")
            br = _Reader(block)
            for _ in range(n_rows):
                yield _decode(br, schema)


def avro_schema(path: str) -> StructType:
    """Spark schema of one ``.avro`` file (top-level record required).

    Reads only the file HEAD (4 MiB cap — headers are a few KB; a
    schema bigger than that raises rather than silently truncating),
    so driver-side schema inference never pulls a whole data file."""
    with open(path, "rb") as fh:
        head = fh.read(4 << 20)
    try:
        schema, _, _, _ = _read_header(head)
    except EOFError as exc:
        raise ValueError(
            f"avro header larger than the 4 MiB inference cap: {path}"
        ) from exc
    st = _spark_type(schema)
    if not isinstance(st, StructType):
        raise ValueError("top-level avro schema must be a record")
    return st


def _list_avro_files(path: str) -> list[str]:
    # Underscore-prefixed names are hidden (Hadoop convention): a
    # retried/speculative task's `_tmp-*` file can survive a SUCCESSFUL
    # job (commit renames only winning attempts), and reading it would
    # duplicate rows or fail on a truncated container.
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro") and not f.startswith(("_", "."))
    )


@dataclass
class _AvroFile(InputPartition):
    path: str


class AvroScanReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro_py requires option: path")
        self.schema = schema
        self.files = _list_avro_files(self.path)

    def partitions(self):
        return [_AvroFile(f) for f in self.files]

    def read(self, partition: _AvroFile) -> Iterator[tuple]:
        yield from _iter_file(partition.path)


class AvroDataSource(DataSource):
    """``spark.read.format("avro_py").option("path", p).load()``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        files = _list_avro_files(self.options.get("path", ""))
        if not files:
            raise ValueError(f"no .avro files under {self.options.get('path')}")
        return avro_schema(files[0])

    def reader(self, schema: StructType):
        return AvroScanReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        return AvroBatchWriter(self.options, schema, overwrite)


def register_avro_source(spark) -> None:
    spark.dataSource.register(AvroDataSource)


def read_avro(spark, path: str):
    """Directory/file of Avro containers → DataFrame, one partition per
    file, no jar required."""
    register_avro_source(spark)
    return spark.read.format(FORMAT_NAME).option("path", path).load()


# ---------------------------------------------------------------------------
# bounded writer (fixtures + dimension-sized sinks)
# ---------------------------------------------------------------------------

def _zigzag(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(out: bytearray, schema, value) -> None:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out += b"\x01" if value else b"\x00"
        elif t in ("int", "long"):
            out += _zigzag(int(value))
        elif t == "float":
            out += struct.pack("<f", value)
        elif t == "double":
            out += struct.pack("<d", value)
        elif t == "bytes":
            out += _zigzag(len(value)) + bytes(value)
        elif t == "string":
            b = value.encode("utf-8")
            out += _zigzag(len(b)) + b
        else:
            raise ValueError(f"unsupported avro type: {t}")
        return
    if isinstance(schema, list):
        if value is None and "null" in schema:
            out += _zigzag(schema.index("null"))
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        out += _zigzag(idx)
        _encode(out, schema[idx], value)
        return
    t = schema["type"]
    if t == "record":
        for f, v in zip(schema["fields"], value):
            _encode(out, f["type"], v)
    elif t == "array":
        if value:
            out += _zigzag(len(value))
            for v in value:
                _encode(out, schema["items"], v)
        out += _zigzag(0)
    elif t == "map":
        if value:
            out += _zigzag(len(value))
            for k, v in value.items():
                _encode(out, "string", k)
                _encode(out, schema["values"], v)
        out += _zigzag(0)
    elif t == "enum":
        out += _zigzag(schema["symbols"].index(value))
    elif t == "fixed":
        out += bytes(value)
    else:
        lt = schema.get("logicalType")
        if lt in ("timestamp-micros", "timestamp-millis") and isinstance(
            value, datetime
        ):
            if value.tzinfo is None:
                value = value.replace(tzinfo=timezone.utc)
            delta = value - _EPOCH
            micros = (delta.days * 86400 + delta.seconds) * 1_000_000 + (
                delta.microseconds
            )
            value = micros if lt == "timestamp-micros" else micros // 1000
        elif lt == "date" and isinstance(value, date):
            value = (value - _EPOCH_DAY).days
        _encode(out, t, value)


def write_avro(
    rows: list[tuple], schema: dict, path: str, codec: str = "deflate"
) -> None:
    """Write one Avro container file (bounded, driver-side)."""
    body = bytearray()
    for row in rows:
        _encode(body, schema, row)
    block = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = co.compress(block) + co.flush()
    sync = b"\x42" * 16  # deterministic fixture marker
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out.write(_zigzag(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        out.write(_zigzag(len(kb)) + kb)
        out.write(_zigzag(len(v)) + v)
    out.write(_zigzag(0))
    out.write(sync)
    out.write(_zigzag(len(rows)))
    out.write(_zigzag(len(block)))
    out.write(block)
    out.write(sync)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())


# ---------------------------------------------------------------------------
# distributed writer (Python DataSource write path — no spark-avro jar)
# ---------------------------------------------------------------------------

def _avro_type_of(dt: DataType, name: str):
    """Spark type → Avro schema (JSON-able), the inverse of _spark_type
    for the writer-supported subset. Named types get path-derived names
    (Avro requires unique record names)."""
    if isinstance(dt, LongType):
        return "long"
    if isinstance(dt, IntegerType):
        return "int"
    if isinstance(dt, DoubleType):
        return "double"
    if isinstance(dt, FloatType):
        return "float"
    if isinstance(dt, StringType):
        return "string"
    if isinstance(dt, BinaryType):
        return "bytes"
    if isinstance(dt, BooleanType):
        return "boolean"
    if isinstance(dt, TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, ArrayType):
        items = _avro_type_of(dt.elementType, name + "_item")
        return {
            "type": "array",
            "items": ["null", items] if dt.containsNull else items,
        }
    if isinstance(dt, MapType):
        if not isinstance(dt.keyType, StringType):
            raise ValueError("avro maps require string keys")
        values = _avro_type_of(dt.valueType, name + "_value")
        return {
            "type": "map",
            "values": ["null", values] if dt.valueContainsNull else values,
        }
    if isinstance(dt, StructType):
        return _avro_schema_of(dt, name)
    raise ValueError(f"unsupported Spark type for avro write: {dt}")


def _avro_schema_of(st: StructType, name: str = "spark_record") -> dict:
    fields = []
    for f in st.fields:
        t = _avro_type_of(f.dataType, f"{name}_{f.name}")
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return {"type": "record", "name": name, "fields": fields}


@dataclass
class _AvroCommit(WriterCommitMessage):
    tmp_path: str
    final_name: str
    n_rows: int


class AvroBatchWriter(DataSourceWriter):
    """Distributed Avro write: each task streams its partition into ONE
    container file (deflate blocks of ``BLOCK_ROWS``), written under a
    temp name; the driver's ``commit`` renames every task file into
    place and — in overwrite mode — removes pre-existing part files,
    so a failed job never leaves a half-replaced dataset and a replayed
    task never double-counts (tmp names carry the attempt id; only the
    committed attempt is renamed). ``abort`` deletes the temp files.

    Closes the r2–r5 "distributed Avro write needs the spark-avro jar"
    gap the same way ``sqlite_ds.py`` closed the JDBC gap: the Avro
    object-container format is stdlib-writable, and the Spark 4 Python
    DataSource write protocol supplies the task/commit machinery.
    Scale: one file per partition, each task O(its rows), no driver
    data movement — repartition upstream to control file count/size.
    Paths are local/posix-mounted filesystems (same contract as this
    module's reader; object stores need a mounted or fuse path).
    """

    BLOCK_ROWS = 2000

    def __init__(self, options, schema: StructType, overwrite: bool):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro_py write needs a path")
        self.avro_schema = _avro_schema_of(schema)
        self.overwrite = overwrite
        # Driver-generated once, shipped to every task: final names embed
        # it so mode("append") genuinely appends (never clobbers a prior
        # job's part-00000), while a REPLAYED attempt of the same job
        # still lands on the same final name (byte-identical container —
        # the sync marker derives from the final name).
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _AvroCommit:
        import hashlib

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        final = f"part-{pid:05d}-{self.job_id}.avro"
        tmp = os.path.join(
            self.path, f"_tmp-{self.job_id}-{pid:05d}-{attempt}.avro"
        )
        # sync marker deterministic per FINAL file name: a replayed
        # attempt produces a byte-identical container
        sync = hashlib.md5(final.encode()).digest()
        n_total = 0
        with open(tmp, "wb") as fh:
            fh.write(_MAGIC)
            meta = {
                "avro.schema": json.dumps(self.avro_schema).encode(),
                "avro.codec": b"deflate",
            }
            fh.write(_zigzag(len(meta)))
            for k, v in meta.items():
                kb = k.encode()
                fh.write(_zigzag(len(kb)) + kb)
                fh.write(_zigzag(len(v)) + v)
            fh.write(_zigzag(0))
            fh.write(sync)

            buf = bytearray()
            n_block = 0

            def flush():
                nonlocal buf, n_block
                if not n_block:
                    return
                co = zlib.compressobj(9, zlib.DEFLATED, -15)
                block = co.compress(bytes(buf)) + co.flush()
                fh.write(_zigzag(n_block))
                fh.write(_zigzag(len(block)))
                fh.write(block)
                fh.write(sync)
                buf = bytearray()
                n_block = 0

            for row in iterator:
                _encode(buf, self.avro_schema, tuple(row))
                n_block += 1
                n_total += 1
                if n_block >= self.BLOCK_ROWS:
                    flush()
            flush()
        return _AvroCommit(tmp, final, n_total)

    def commit(self, messages) -> None:
        # pre-existing part files only — the listing runs AFTER tasks
        # wrote their temp files, which must not enter the delete set
        existing = (
            {
                f
                for f in os.listdir(self.path)
                if f.endswith(".avro") and not f.startswith("_tmp")
            }
            if os.path.isdir(self.path)
            else set()
        )
        renamed = set()
        for m in messages:
            if m is None:
                continue
            os.replace(m.tmp_path, os.path.join(self.path, m.final_name))
            renamed.add(m.final_name)
        if self.overwrite:
            for f in existing - renamed:
                os.remove(os.path.join(self.path, f))
        # Sweep THIS job's residual temp files: a lost/speculative
        # attempt's `_tmp-{job}-*` survives a successful job (only the
        # winning attempt's message reaches commit). Scoped to our job
        # id so a concurrent writer's in-flight temps are untouched.
        if os.path.isdir(self.path):
            residue = f"_tmp-{self.job_id}-"
            for f in os.listdir(self.path):
                if f.startswith(residue):
                    os.remove(os.path.join(self.path, f))

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


def write_avro_dataset(df, path: str, mode: str = "overwrite") -> None:
    """Distributed Avro write, no jar: one container file per partition
    via the Python DataSource write protocol (see AvroBatchWriter)."""
    register_avro_source(df.sparkSession)
    df.write.format(FORMAT_NAME).mode(mode).save(path)

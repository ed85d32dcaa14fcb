"""Spark Python DataSource for ElephantBird protobuf records in 4mc/4mz.

PySpark-native twin of the reference's EB adapters (SURVEY.md §2.1 S8/K4:
`FourMcEbProtoInputFormat.java:34-80`, `FourMcEbProtoOutputFormat.java:37-98`).
The record schema is declarative (no generated classes): pass ``fields`` as
a JSON array of ``{number, name, type, repeated}`` — default is the
reference's `user.proto` fixture schema.

Usage::

    spark.dataSource.register(FourMcProtoDataSource)
    df = spark.read.format("fourmcproto").load(path)   # struct columns
    df.write.format("fourmcproto").option("codec", "zstd") \
        .option("level", "high").save(out)

Planning is identical to the text source (one footer read per file,
block-aligned splits); the record reader resynchronizes on the EB sync
marker instead of a newline.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceArrowWriter, WriterCommitMessage
from pyspark.sql.types import StructType

from fourmc_spark.format.protobuf import ProtoField, USER_SCHEMA, spark_struct

from .datasource import FourMcCommitMessage, FourMcDataSourceReader, FourMcInputPartition
from .stream import FourMcStreamReader, FourMcStreamWriter

DEFAULT_CLASS_NAME = "com.fing.fourmc.protobuf.USER$User"
DEFAULT_RECORDS_PER_BLOCK = 100  # elephant-bird BinaryBlockWriter default


def _schema_from_options(options) -> tuple[ProtoField, ...]:
    raw = options.get("fields")
    if not raw:
        return USER_SCHEMA
    return tuple(
        ProtoField(
            number=int(f["number"]),
            name=f["name"],
            type=f["type"],
            repeated=bool(f.get("repeated", False)),
        )
        for f in json.loads(raw)
    )


class FourMcProtoDataSource(DataSource):
    """name: ``fourmcproto``; schema derived from the proto field list."""

    @classmethod
    def name(cls) -> str:
        return "fourmcproto"

    def schema(self) -> StructType:
        return spark_struct(_schema_from_options(self.options))

    def reader(self, schema: StructType) -> "FourMcProtoReader":
        return FourMcProtoReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> "FourMcProtoWriter":
        return FourMcProtoWriter(self.options, schema, overwrite)

    def streamReader(self, schema: StructType):
        return FourMcProtoStreamReader(self.options, schema)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return FourMcProtoStreamWriter(self.options, schema, overwrite)


class FourMcProtoReader(FourMcDataSourceReader):
    """Reuses the text source's block-aligned planning (S1/X4-X6); only the
    record loop differs: EB sync-marker resync instead of newline."""

    def __init__(self, options, schema: StructType) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fourmcproto source requires a path")
        self.max_partition_bytes = int(
            options.get("maxpartitionbytes", 128 * 1024 * 1024)
        )
        from fourmc_spark.sources.datasource import DEFAULT_MAX_BLOCKS_PER_SPLIT

        self.max_blocks_per_split = int(
            options.get("maxblockspersplit", DEFAULT_MAX_BLOCKS_PER_SPLIT)
        )
        self.verify = str(options.get("verify", "true")).lower() != "false"
        self.proto_schema = _schema_from_options(options)
        self.columns = [f.name for f in schema.fields]
        # shared pruning state consumed by the inherited pushFilters()/
        # partitions(); every proto column is a PAYLOAD field from the
        # user's schema — including one legally named "offset", which
        # must never route into the compressed-block-offset pruning
        # (it zone-prunes by VALUE like any other payload field)
        self._init_pruning_state(options)
        self.offset_is_pseudo = False
        # value zone-map constraints (analyze_stats_proto sidecars) on
        # the scalar orderable payload fields; bool/bytes/repeated have
        # no shared ordering with JSON stats and stay unpruned
        from fourmc_spark.format.protobuf import (
            bloom_eligible_fields, zone_eligible_fields,
        )

        self._zone_cols = frozenset(zone_eligible_fields(self.proto_schema))
        # bloom probes on scalar int/string payload fields: the decoded
        # Python value's str() is the canonical text analyze_stats_proto
        # hashed at build time (bloom_columns=...)
        self._bloom_typemap = bloom_eligible_fields(self.proto_schema)

    def read(self, partition: FourMcInputPartition):
        import pyarrow as pa

        from fourmc_spark.format.protobuf import iter_eb_records_for_split

        if not partition.path:
            return
        wanted = [f for f in self.proto_schema if f.name in self.columns]
        arrow_schema = _arrow_schema(wanted)
        batch_rows = 8192
        cols: dict[str, list] = {f.name: [] for f in wanted}

        def flush():
            arrays = [
                pa.array(cols[f.name], type=arrow_schema.field(f.name).type)
                for f in wanted
            ]
            return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

        n = 0
        with open(partition.path, "rb") as f:
            for _, rec in iter_eb_records_for_split(
                f,
                partition.codec,
                partition.start,
                partition.end,
                self.proto_schema,
                verify=self.verify,
            ):
                for fld in wanted:
                    cols[fld.name].append(rec[fld.name])
                n += 1
                if n >= batch_rows:
                    yield flush()
                    n = 0
                    for v in cols.values():
                        v.clear()
        if n:
            yield flush()


def _arrow_schema(fields: tuple[ProtoField, ...] | list[ProtoField]):
    import pyarrow as pa

    scalar = {
        "string": pa.string(),
        "bytes": pa.binary(),
        "int64": pa.int64(),
        "int32": pa.int32(),
        "bool": pa.bool_(),
        "double": pa.float64(),
        "float": pa.float32(),
    }
    return pa.schema(
        [
            pa.field(f.name, pa.list_(scalar[f.type]) if f.repeated else scalar[f.type])
            for f in fields
        ]
    )


class FourMcProtoWriter(DataSourceArrowWriter):
    """Per-task sink: rows -> proto blobs -> EB blocks -> framed 4mc/4mz
    file (K4 over K1), staged then atomically promoted on commit."""

    def __init__(self, options, schema: StructType, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fourmcproto sink requires a path")
        self.codec_raw = options.get("codec", "lz4")
        self.level = options.get("level", "fast")
        self.class_name = options.get("classname", DEFAULT_CLASS_NAME)
        self.records_per_block = int(
            options.get("recordsperblock", DEFAULT_RECORDS_PER_BLOCK)
        )
        from fourmc_spark.format.core import MAX_BLOCK_SIZE

        self.block_size = int(options.get("blocksize", MAX_BLOCK_SIZE))
        self.overwrite = overwrite
        self.proto_schema = _schema_from_options(options)
        self.field_names = [f.name for f in schema.fields]
        self.existing: list[str] = []
        if overwrite and self.path and os.path.isdir(self.path):
            self.existing = [
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".4mc", ".4mz")) or f == "_SUCCESS"
            ]

    def write(self, iterator: Iterator) -> WriterCommitMessage:
        from fourmc_spark.format.protobuf import encode_eb_block, encode_message
        from fourmc_spark.format.writer import FourMcWriter, normalize_codec

        codec = normalize_codec(self.codec_raw)
        ext = ".4mc" if codec == "lz4" else ".4mz"
        fname = f"part-{uuid.uuid4().hex}{ext}"
        staging = os.path.join(self.path, "_temporary")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, fname)
        final = os.path.join(self.path, fname)
        pending: list[bytes] = []
        with open(staged, "wb") as f, FourMcWriter(
            f, codec=codec, level=self.level, block_size=self.block_size
        ) as w:
            for batch in iterator:
                for row in batch.to_pylist():
                    pending.append(encode_message(row, self.proto_schema))
                    if len(pending) >= self.records_per_block:
                        w.write(encode_eb_block(pending, self.class_name))
                        pending.clear()
            if pending:
                w.write(encode_eb_block(pending, self.class_name))
        return FourMcCommitMessage(files=((staged, final),))

    def commit(self, messages) -> None:
        if self.overwrite:
            from fourmc_spark.sources.datasource import STATS_SUFFIX

            for old in self.existing:
                # an analyze_stats_proto sidecar must not outlive its
                # data file (same eviction rule as the text sink)
                for p in (old, old + STATS_SUFFIX):
                    try:
                        os.remove(p)
                    except FileNotFoundError:
                        pass
        for m in messages:
            if m is not None:
                for staged, final in m.files:
                    os.makedirs(os.path.dirname(final), exist_ok=True)
                    os.replace(staged, final)
        try:
            os.rmdir(os.path.join(self.path, "_temporary"))
        except OSError:
            pass
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None:
                for staged, _ in m.files:
                    if os.path.exists(staged):
                        os.remove(staged)


class FourMcProtoStreamReader(FourMcStreamReader):
    """S8 streaming twin: the fourmc stream source's sealed-file offset
    machinery (monotone high-water mark, maxfilespertrigger,
    orderednames) over the EB-protobuf record model."""

    def _make_batch_reader(self, options, schema: StructType):
        return FourMcProtoReader(options, schema)


class FourMcProtoStreamWriter(FourMcStreamWriter):
    """K4 streaming twin: per-micro-batch sealed proto files with the
    fourmc stream sink's batch-replay-idempotent deterministic commit
    names."""

    def _make_batch_writer(self, options, schema: StructType):
        return FourMcProtoWriter(options, schema, overwrite=False)

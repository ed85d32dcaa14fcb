"""Spark Python DataSource for splittable 4mc/4mz files.

The PySpark-native equivalent of the reference's Hadoop input/output
formats (SURVEY.md §2.1 S1-S8 / K1-K3):

* **planning** (driver): one ranged tail read per file loads the footer
  block index (`FourMcInputFormat.getSplits`,
  `FourMcInputFormat.java:126-173`); byte-range splits of
  ``maxPartitionBytes`` are aligned to block boundaries with the
  reference's arithmetic (`FourMcBlockIndex.java:142-173`).  Planning cost
  is O(files), never O(bytes) — the 100 TB posture.
* **scan** (executors): each partition streams its block range directly
  (blocks are self-delimiting), verifies xxh32 per block, decompresses
  with native lz4/zstd, splits lines with Hadoop LineRecordReader
  ownership semantics, and yields Arrow record batches
  (zero-copy into Spark's columnar pipeline).
* **sink**: per-task writers produce independent .4mc/.4mz files
  (header + <=4 MiB framed blocks + EOS + footer index) into a staging
  directory; a commit on the driver atomically renames them into place —
  the FileCommitProtocol pattern.

Usage::

    spark.dataSource.register(FourMcDataSource)
    df = spark.read.format("fourmc").load("/data/logs")        # offset, value
    df.write.format("fourmc").option("codec", "zstd") \
        .option("level", "medium").save("/data/out")
"""

from __future__ import annotations

import json as _json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024
# Cap on blocks per split: bounds a partition's UNCOMPRESSED size at
# maxblockspersplit * 4 MiB (the format's hard block cap, MAX_BLOCK_SIZE)
# regardless of compression ratio. Compressed-byte slicing alone is unsafe
# at scale: 128 MB of compressed highly-compressible text can be many GB
# uncompressed — one task, one OOM. 64 blocks => <= 256 MiB per task.
DEFAULT_MAX_BLOCKS_PER_SPLIT = 64
# .zst = standard zstd streaming format (reference ZstCodec.java:47-169):
# readable but non-splittable (no internal index) — one partition per file.
# The .lz4_*/.zstd_* extensions are the reference's "straight" block
# codecs (Hadoop BlockCompressorStream M/R intermediate files,
# Lz4Codec.java:163 / ZstdCodec.java) — also non-splittable.
_HADOOP_EXTS = (
    ".lz4_fast", ".lz4_mc", ".lz4_hc", ".lz4_uc",
    ".zstd_fast", ".zstd_mc", ".zstd_hc", ".zstd_uc",
)
_EXTS = (".4mc", ".4mz", ".zst") + _HADOOP_EXTS


def _list_files(path: str) -> list[str]:
    """Recursive listing, skipping hidden/_ files like
    FourMcInputFormat.listStatus (FourMcInputFormat.java:70-118).
    Glob patterns (Hadoop-path style: ``*``, ``?``, ``[...]``) expand to
    every matching file/dir; comma-separated paths union their listings
    (Hadoop ``FileInputFormat.setInputPaths`` semantics)."""
    if "," in path:
        out: list[str] = []
        for p in path.split(","):
            p = p.strip()
            if p:
                out.extend(_list_files(p))
        return out
    if any(ch in path for ch in "*?["):
        import glob as _glob

        out: list[str] = []
        for m in sorted(_glob.glob(path)):
            out.extend(_list_files(m))
        return out
    if os.path.isfile(path):
        return [path]
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for fn in sorted(files):
            if fn.startswith((".", "_")):
                continue
            if fn.endswith(_EXTS):
                out.append(os.path.join(root, fn))
    return out


@dataclass
class FourMcInputPartition(InputPartition):
    """One block-aligned slice of one file. Carries no block list — the
    reader streams self-delimiting blocks, so partition metadata stays O(1)
    regardless of file size."""

    path: str
    codec: str
    start: int
    end: int
    # True for the partition holding the file's FIRST data block — the one
    # that owns the file's first line (drives header skip: skipfirstline)
    head: bool = False


class FourMcDataSource(DataSource):
    """name: ``fourmc``; schema: ``offset bigint, value string``."""

    @classmethod
    def name(cls) -> str:
        return "fourmc"

    def schema(self) -> StructType:
        js = self.options.get("jsonschema") or self.options.get("csvschema")
        if js:
            # typed record scan (NDJSON or CSV lines): the payload lines
            # are parsed into these columns executor-side (Arrow
            # JSON/CSV kernels), which makes value predicates PUSHABLE —
            # combined with analyze_stats()/analyze_bloom() sidecars
            # they prune whole files and blocks
            fields = list(_parse_flat_ddl(js).fields)
        else:
            fields = [
                StructField("offset", LongType(), nullable=False),
                StructField("value", StringType(), nullable=True),
            ]
        # withoffset=true (typed mode): ALSO expose the owning block's
        # compressed offset as a pseudo-column — the provenance key the
        # ANALYZE passes group block stats by (value mode always has it)
        if js and str(
            self.options.get("withoffset", "false")
        ).lower() == "true":
            fields.insert(
                0, StructField("offset", LongType(), nullable=False)
            )
        # partitioncolumns=c1[,c2...]: rebuild hive key=value path segments
        # as string columns (cast downstream as needed)
        for c in _partition_col_opt(self.options):
            fields.append(StructField(c, StringType(), nullable=True))
        if str(self.options.get("withfilename", "false")).lower() == "true":
            fields.append(StructField("_file", StringType(), nullable=False))
        names = [f.name for f in fields]
        if len(set(names)) != len(names):
            raise ValueError(
                "fourmc: duplicate column names in the scan schema "
                f"({names}) — jsonschema fields must not collide with "
                "partitioncolumns or the _file provenance column"
            )
        return StructType(fields)

    def reader(self, schema: StructType) -> "FourMcDataSourceReader":
        return FourMcDataSourceReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> "FourMcDataSourceWriter":
        return FourMcDataSourceWriter(self.options, schema, overwrite)

    def streamReader(self, schema: StructType):
        from fourmc_spark.sources.stream import FourMcStreamReader

        return FourMcStreamReader(self.options, schema)

    def streamWriter(self, schema: StructType, overwrite: bool):
        from fourmc_spark.sources.stream import FourMcStreamWriter

        return FourMcStreamWriter(self.options, schema, overwrite)


class FourMcDataSourceReader(DataSourceReader):
    def __init__(self, options, schema: StructType) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fourmc source requires a path")
        self.max_partition_bytes = int(
            options.get("maxpartitionbytes", DEFAULT_MAX_PARTITION_BYTES)
        )
        self.max_blocks_per_split = int(
            options.get("maxblockspersplit", DEFAULT_MAX_BLOCKS_PER_SPLIT)
        )
        self.verify = str(options.get("verify", "true")).lower() != "false"
        # drop the first line of each FILE (header rows); resolved per
        # head-partition in the reader, so it is split-plan invariant
        self.skip_first = (
            str(options.get("skipfirstline", "false")).lower() == "true"
        )
        self.pcols = _partition_col_opt(options)
        # pushdown=false (parsed in _init_pruning_state): per-read
        # opt-out of ALL planning-time pruning. Spark 4.1.2 caches one
        # readInfo per relation instance
        # (PythonDataSourceV2.getOrCreateReadInfo): after a FILTERED
        # action on a base load() DataFrame, a later action on the SAME
        # DataFrame with fewer/different filters skips the pushdown
        # re-plan and silently reuses the pruned scan. Safe patterns:
        # call load() per query (planning is O(files)), keep one
        # filtered DataFrame per filter set, or set pushdown=false on
        # reads that will be reused with varying filters.
        self.with_file = (
            str(options.get("withfilename", "false")).lower() == "true"
        )
        js = options.get("jsonschema")
        cs = options.get("csvschema")
        if js and cs:
            raise ValueError(
                "fourmc source: jsonschema and csvschema are mutually "
                "exclusive (one record model per read)"
            )
        # json_schema is the TYPED-scan schema regardless of record
        # model (the shared pruning state keys off it); typed_fmt picks
        # the parser (NDJSON or CSV) in read()
        self.json_schema: StructType | None = (
            _parse_flat_ddl(js or cs) if (js or cs) else None
        )
        self.typed_fmt = "csv" if cs else "json"
        self.with_offset = (
            str(options.get("withoffset", "false")).lower() == "true"
        )
        self.columns = [f.name for f in schema.fields]
        self._init_pruning_state(options)

    def _init_pruning_state(self, options) -> None:
        """Planning-time pruning state, filled by pushFilters(): an
        inclusive [lo, hi] constraint on the offset pseudo-column
        (hi=None = unbounded), per-partition-column allowed value sets,
        and — in typed (jsonschema) mode — per-column zone constraints
        checked against analyze_stats() sidecars. Subclasses with their
        own __init__ (the protobuf reader) MUST call this so the
        inherited pushFilters()/partitions() find every attribute they
        touch — and must set offset_is_pseudo=False when their schema's
        'offset' (if any) is a PAYLOAD field, not the scan's
        compressed-block-offset column."""
        self._off_lo: int = 0
        self._off_hi: int | None = None
        self._pcol_allowed: dict[str, set] = {}
        # col -> [lo_value, lo_inclusive, hi_value, hi_inclusive]
        self._zone: dict[str, list] = {}
        # col -> intersected set of EqualTo/In point values, probed
        # against analyze_bloom sidecar bitmaps (file tier)
        self._point: dict[str, set] = {}
        # col -> {"null", "notnull"} requirements (IsNull / IsNotNull /
        # null-safe equality), pruned via sidecar null counts
        self._nullreq: dict[str, set] = {}
        self.pushdown_enabled = (
            str(options.get("pushdown", "true")).lower() != "false"
        )
        self.offset_is_pseudo = True
        if not hasattr(self, "pcols"):
            self.pcols = []
        if not hasattr(self, "json_schema"):
            self.json_schema = None
        # columns eligible for value zone-map constraints: the typed
        # NDJSON scan's declared fields here; the protobuf reader
        # overrides with its scalar payload fields
        self._zone_cols: frozenset = (
            frozenset(f.name for f in self.json_schema.fields)
            if self.json_schema is not None else frozenset()
        )
        # bloom-probe type families (analyze_bloom's eligibility: the
        # column's CAST AS STRING must equal the probe's str()). Columns
        # absent here are never bloom-probed — the proto reader leaves
        # this empty until it grows its own bloom pass.
        from pyspark.sql import types as _T

        self._bloom_typemap: dict[str, str] = {}
        if self.json_schema is not None:
            for f in self.json_schema.fields:
                if isinstance(
                    f.dataType,
                    (_T.LongType, _T.IntegerType, _T.ShortType),
                ):
                    self._bloom_typemap[f.name] = "int"
                elif isinstance(f.dataType, _T.StringType):
                    self._bloom_typemap[f.name] = "str"

    def pushFilters(self, filters):
        """Planning-time pruning, the query-side payoff of the footer
        block index (reference X2/X3: FourMcBlockIndex.java:92-123
        binary search): a line's ``offset`` IS its owning block's
        compressed file offset, so offset range/equality predicates
        select exactly the matching blocks per file — Catalyst's
        partition pruning, driven by the same index the reference built
        for split alignment. Equality/IN predicates on hive partition
        columns prune whole files by path.

        Every filter is returned as partially-pushed: Spark re-applies
        them post-scan, so pruning can only remove provably-empty work —
        never change results.
        """
        from pyspark.sql.datasource import (
            EqualNullSafe, EqualTo, GreaterThan, GreaterThanOrEqual, In,
            IsNotNull, IsNull, LessThan, LessThanOrEqual, StringStartsWith,
        )

        if not self.pushdown_enabled:
            return filters  # record nothing: the scan never prunes

        for flt in filters:
            attr = getattr(flt, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col = attr[0]
            # the offset pseudo-column exists only in the text source's
            # (offset, value) mode; in typed mode — and in the protobuf
            # source, whose user-defined schema may legally hold a
            # payload field named "offset" — routing it here would
            # prune blocks by COMPRESSED BYTE offsets against record
            # values
            if (col == "offset" and self.offset_is_pseudo
                    and self.json_schema is None):
                v = getattr(flt, "value", None)
                if not isinstance(v, int) or isinstance(v, bool):
                    continue
                if isinstance(flt, EqualTo):
                    self._off_lo = max(self._off_lo, v)
                    self._off_hi = v if self._off_hi is None else min(self._off_hi, v)
                elif isinstance(flt, GreaterThan):
                    self._off_lo = max(self._off_lo, v + 1)
                elif isinstance(flt, GreaterThanOrEqual):
                    self._off_lo = max(self._off_lo, v)
                elif isinstance(flt, LessThan):
                    self._off_hi = v - 1 if self._off_hi is None else min(self._off_hi, v - 1)
                elif isinstance(flt, LessThanOrEqual):
                    self._off_hi = v if self._off_hi is None else min(self._off_hi, v)
            elif col in self.pcols:
                if isinstance(flt, EqualTo) and isinstance(flt.value, str):
                    vals = {flt.value}
                elif isinstance(flt, In) and all(
                    isinstance(x, str) for x in flt.value
                ):
                    vals = set(flt.value)
                else:
                    continue
                prev = self._pcol_allowed.get(col)
                self._pcol_allowed[col] = vals if prev is None else prev & vals
            elif col in self._zone_cols:
                # zone-map constraint on a typed payload column: file
                # pruning against analyze_stats sidecars. Number,
                # string, timestamp, and date bounds. Instant-typed
                # (TimestampType) filter values arrive as tz-aware UTC
                # datetimes (VariantVal.toPython) and are canonicalized
                # to EPOCH MICROS ints — comparable against the micros
                # the new sidecars store, session-timezone-free; naive
                # (TimestampNTZ) and date values stay Python objects
                # and are compared against PARSED sidecar ISO strings
                # (see _zone_pair), so sidecar text-format drift can
                # never flip an ordering.
                import datetime as _dt

                def _is_point(x):
                    # bloom-probe-able point value: int (not bool) or str
                    return (
                        isinstance(x, int) and not isinstance(x, bool)
                    ) or isinstance(x, str)

                def _take_points(vals: set):
                    prev = self._point.get(col)
                    self._point[col] = (
                        vals if prev is None else prev & vals
                    )

                if isinstance(flt, (IsNull, IsNotNull)):
                    # null-ness constraints prune from the sidecar null
                    # counts: a file/block with NO non-null values
                    # (min and max both null) yields nothing under
                    # IsNotNull; one with nulls == 0 yields nothing
                    # under IsNull. Both requirements on one column is
                    # unsatisfiable — partitions() plans nothing.
                    self._nullreq.setdefault(col, set()).add(
                        "null" if isinstance(flt, IsNull) else "notnull"
                    )
                    continue
                if isinstance(flt, StringStartsWith):
                    # prefix predicate == the range [v, next_prefix(v)):
                    # UTF-8 byte order equals code-point order, so the
                    # string zone bounds compare soundly
                    v = flt.value
                    if not isinstance(v, str) or not v:
                        continue
                    z = self._zone.setdefault(col, [None, True, None, True])
                    if isinstance(z[0], (str, type(None))) and (
                        z[0] is None or v > z[0]
                    ):
                        z[0], z[1] = v, True
                    hi = _next_prefix(v)
                    if hi is not None and isinstance(
                        z[2], (str, type(None))
                    ) and (z[2] is None or hi < z[2]):
                        z[2], z[3] = hi, False
                    continue
                if isinstance(flt, EqualNullSafe):
                    # col <=> NULL matches exactly the null rows: that is
                    # an IsNull requirement; non-null values behave like
                    # EqualTo below (the class check tuples include it)
                    if getattr(flt, "value", None) is None:
                        self._nullreq.setdefault(col, set()).add("null")
                        continue
                if isinstance(flt, In):
                    # IN-list on a typed payload column: the exact set
                    # feeds the bloom probe, and [min, max] of the list
                    # is a valid conjunct relaxation for the zone tier.
                    # Same-class int or str lists only (mixed/temporal
                    # lists stay unpruned — conservative).
                    vals = list(flt.value)
                    if not vals:
                        continue
                    all_int = all(
                        isinstance(x, int) and not isinstance(x, bool)
                        for x in vals
                    )
                    all_str = all(isinstance(x, str) for x in vals)
                    if not (all_int or all_str):
                        continue
                    _take_points(set(vals))
                    lo_hi = [(min(vals), True, 0), (max(vals), True, 2)]
                    for v, inc, slot in lo_hi:
                        z = self._zone.setdefault(
                            col, [None, True, None, True]
                        )
                        old = z[slot]
                        same = old is None or (
                            isinstance(old, str) == isinstance(v, str)
                            and not isinstance(old, _dt.date)
                        )
                        if slot == 0 and same and (old is None or v > old):
                            z[0], z[1] = v, True
                        if slot == 2 and same and (old is None or v < old):
                            z[2], z[3] = v, True
                    continue

                v = getattr(flt, "value", None)
                if isinstance(flt, (EqualTo, EqualNullSafe)) and _is_point(v):
                    _take_points({v})
                if isinstance(v, _dt.datetime) and v.tzinfo is not None:
                    v = (
                        v.astimezone(_dt.timezone.utc)
                        - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
                    ) // _dt.timedelta(microseconds=1)
                is_num = isinstance(v, (int, float)) and not isinstance(v, bool)
                if not (is_num or isinstance(v, (str, _dt.date))):
                    continue  # (datetime is a date subclass: both pass)
                z = self._zone.setdefault(col, [None, True, None, True])

                def _cls(x):
                    if isinstance(x, _dt.datetime):
                        return "ts"
                    if isinstance(x, _dt.date):
                        return "date"
                    return isinstance(x, str)

                def _num_str_cmp_ok(old):
                    return old is None or _cls(old) == _cls(v)

                if isinstance(flt, (EqualTo, EqualNullSafe)):
                    if _num_str_cmp_ok(z[0]) and (z[0] is None or v > z[0]):
                        z[0], z[1] = v, True
                    if _num_str_cmp_ok(z[2]) and (z[2] is None or v < z[2]):
                        z[2], z[3] = v, True
                elif isinstance(flt, (GreaterThan, GreaterThanOrEqual)):
                    inc = isinstance(flt, GreaterThanOrEqual)
                    if _num_str_cmp_ok(z[0]) and (
                        z[0] is None or v > z[0] or (v == z[0] and not inc)
                    ):
                        z[0], z[1] = v, inc
                elif isinstance(flt, (LessThan, LessThanOrEqual)):
                    inc = isinstance(flt, LessThanOrEqual)
                    if _num_str_cmp_ok(z[2]) and (
                        z[2] is None or v < z[2] or (v == z[2] and not inc)
                    ):
                        z[2], z[3] = v, inc
        return filters

    def partitions(self) -> list[FourMcInputPartition]:
        # driver-side planning: one footer read per file (S1/X6)
        from fourmc_spark.format import core
        from fourmc_spark.format.reader import scan_file_info

        parts: list[FourMcInputPartition] = []
        # provably-unsatisfiable conjunctions plan NOTHING: point sets
        # intersected to empty (doc_id = 1 AND doc_id = 2, disjoint IN
        # lists) or a column required both null and not-null. Spark
        # still re-applies the filters on zero rows.
        unsat = any(not s for s in self._point.values()) or any(
            len(r) > 1 for r in self._nullreq.values()
        )
        paths = [] if unsat else _list_files(self.path)
        for path in paths:
            if self._pcol_allowed:
                pvals = _partition_values_from_path(
                    path, list(self._pcol_allowed)
                )
                if any(
                    pvals.get(c) not in allowed
                    for c, allowed in self._pcol_allowed.items()
                ):
                    continue  # file pruned by partition-column predicate
            dropped_blocks: frozenset = frozenset()
            if self._zone or self._point or self._nullreq:
                meta = _load_zone_sidecar(path)
                if meta is not None:
                    if self._zone and _zone_file_pruned(meta, self._zone):
                        continue  # file pruned by analyze_stats zone map
                    if self._nullreq and _null_file_pruned(
                        meta, self._nullreq
                    ):
                        continue  # null-ness requirement unsatisfiable
                    if self._point and _bloom_file_pruned(
                        meta, self._point, self._bloom_typemap
                    ):
                        continue  # file pruned by analyze_bloom bitmap
                    if self._zone:
                        dropped_blocks = _zone_dropped_blocks(
                            meta, self._zone
                        )
                    if self._nullreq:
                        dropped_blocks = dropped_blocks | (
                            _null_dropped_blocks(meta, self._nullreq)
                        )
                    if self._point:
                        dropped_blocks = dropped_blocks | (
                            _bloom_dropped_blocks(
                                meta, self._point, self._bloom_typemap
                            )
                        )
            if path.endswith(".zst"):
                fsize = os.path.getsize(path)
                if fsize:
                    parts.append(
                        FourMcInputPartition(path, "zst", 0, fsize, head=True)
                    )
                continue
            if path.endswith(_HADOOP_EXTS):
                from fourmc_spark.format.hadoop_stream import hadoop_ext_info

                fsize = os.path.getsize(path)
                if fsize:
                    hcodec = hadoop_ext_info(path)[0]
                    parts.append(
                        FourMcInputPartition(
                            path, f"hadoop-{hcodec}", 0, fsize, head=True
                        )
                    )
                continue
            codec, fsize, offsets = scan_file_info(path)
            if not offsets:
                continue  # empty file
            # Greedy block grouping under two bounds: compressed span
            # (maxpartitionbytes — the reference's Hadoop split-size
            # semantics) AND block count (maxblockspersplit — caps the
            # partition's uncompressed size at count * MAX_BLOCK_SIZE,
            # which compressed bytes alone cannot bound).
            step = max(self.max_partition_bytes, 1)
            maxb = max(self.max_blocks_per_split, 1)
            n = len(offsets)
            # offset-predicate block pruning (X2/X3 binary search): keep
            # only blocks whose offset can satisfy [lo, hi] — every line's
            # offset equals its owning block's offset, so this is exact
            i0, i1 = 0, n
            if self._off_lo > 0 or self._off_hi is not None:
                import bisect

                if self._off_lo > 0:
                    i0 = bisect.bisect_left(offsets, self._off_lo)
                if self._off_hi is not None:
                    i1 = bisect.bisect_right(offsets, self._off_hi)
                if i0 >= i1:
                    continue  # no block can produce a matching row
            # value-predicate block pruning (zone-map block tier): skip
            # blocks whose per-block [min, max] excludes the pushed
            # bounds. A partition's END may land on a dropped block —
            # the reader streams past `end` to finish a line that STARTS
            # inside the partition (Hadoop split spillover), so dropping
            # a block only removes the lines it OWNS, exactly the rows
            # the stats speak for.
            i = i0
            while i < i1:
                if offsets[i] in dropped_blocks:
                    i += 1
                    continue
                j = i + 1
                while (
                    j < i1
                    and j - i < maxb
                    and offsets[j] - offsets[i] < step
                    and offsets[j] not in dropped_blocks
                ):
                    j += 1
                astart = max(offsets[i], core.HEADER_SIZE)
                aend = offsets[j] if j < n else fsize
                if astart < aend:
                    parts.append(
                        FourMcInputPartition(
                            path, codec, astart, aend, head=(i == 0),
                        )
                    )
                i = j
        if not parts:
            # empty dataset still needs one no-op partition
            parts.append(FourMcInputPartition("", "lz4", 0, 0))
        return parts

    def read(self, partition: FourMcInputPartition):
        import pyarrow as pa

        if not partition.path:
            return
        typed = self.json_schema is not None
        want_offset = "offset" in self.columns and (
            not typed or self.with_offset
        )
        want_value = (not typed) and "value" in self.columns
        typed_names = (
            [f.name for f in self.json_schema.fields] if typed else []
        )
        want_typed = [c for c in self.columns if c in typed_names]
        # hive partition columns wanted in the output: constant per file
        want_pcols = [c for c in self.pcols if c in self.columns]
        want_file = self.with_file and "_file" in self.columns
        pvals = (
            _partition_values_from_path(partition.path, want_pcols)
            if want_pcols
            else {}
        )

        def _with_pcols(batch: "pa.RecordBatch") -> "pa.RecordBatch":
            if not want_pcols and not want_file:
                return batch
            arrays = list(batch.columns)
            names = list(batch.schema.names)
            for c in want_pcols:
                v = pvals.get(c)
                arrays.append(
                    pa.nulls(len(batch), type=pa.string())
                    if v is None
                    else pa.array([v] * len(batch), type=pa.string())
                )
                names.append(c)
            if want_file:
                arrays.append(
                    pa.array([partition.path] * len(batch), type=pa.string())
                )
                names.append("_file")
            return pa.RecordBatch.from_arrays(arrays, names=names)

        # Arrow's JSON/CSV kernels parse each micro-batch in C;
        # explicit schemas pin types so output never depends on
        # inference (absent fields come back NULL). Column pruning
        # reaches the PARSER: only the requested fields enter the
        # explicit schema / include_columns. Built once per partition —
        # never per batch. empty_line is the record model's all-null
        # placeholder ('{}' for NDJSON, a line of bare commas for CSV).
        if not typed:
            typed_parser = None
            empty_line = "{}"
        elif self.typed_fmt == "csv":
            typed_parser = _TypedCsvParser(self.json_schema, want_typed)
            empty_line = typed_parser.empty_line
        else:
            typed_parser = _TypedNdjsonParser(self.json_schema, want_typed)
            empty_line = "{}"

        def _typed_batch(buf, offs=None) -> "pa.RecordBatch":
            arrays = typed_parser.arrays(buf)
            names = list(want_typed)
            if want_offset:
                arrays = [pa.array(offs, type=pa.int64())] + arrays
                names = ["offset"] + names
            return pa.RecordBatch.from_arrays(arrays, names=names)

        def _cast_lines(arr: "pa.Array") -> "pa.Array":
            try:
                return arr.cast(pa.string())
            except pa.ArrowInvalid:
                return pa.array(
                    [v.as_py().decode("utf-8", "replace") for v in arr]
                )

        if partition.codec == "zst" or partition.codec.startswith("hadoop-"):
            # non-splittable streaming codecs: row iterator + batch buffer
            from fourmc_spark.format.reader import (
                iter_lines_hadoop,
                iter_lines_zst,
            )

            batch_rows = 16384
            offsets: list[int] = []
            lines: list[bytes] = []

            def flush():
                if typed:
                    # empty lines (the sink writes NULL values that way)
                    # must parse as all-null rows like from_json('') /
                    # from_csv('') — Arrow's readers would skip or
                    # reject them
                    ph = empty_line.encode()
                    return _typed_batch(
                        b"\n".join(ln if ln else ph for ln in lines),
                        offs=list(offsets),
                    )
                arrays, names = [], []
                if want_offset:
                    arrays.append(pa.array(offsets, type=pa.int64()))
                    names.append("offset")
                if want_value:
                    arrays.append(_cast_lines(pa.array(lines, type=pa.binary())))
                    names.append("value")
                return pa.RecordBatch.from_arrays(arrays, names=names)

            drop_first = self.skip_first and partition.head
            with open(partition.path, "rb") as f:
                if partition.codec.startswith("hadoop-"):
                    it = iter_lines_hadoop(
                        f, partition.codec.split("-", 1)[1]
                    )
                else:
                    it = iter_lines_zst(f)
                for owner, line in it:
                    if drop_first:
                        drop_first = False
                        continue
                    offsets.append(owner)
                    lines.append(line)
                    if len(lines) >= batch_rows:
                        yield _with_pcols(flush())
                        offsets.clear()
                        lines.clear()
            if lines or offsets:
                yield _with_pcols(flush())
            return

        # 4mc/4mz: vectorized per-block batches — line splitting runs in
        # Arrow compute kernels, never a per-line Python loop
        from fourmc_spark.format.reader import iter_line_batches_for_split

        drop_first = self.skip_first and partition.head
        with open(partition.path, "rb") as f:
            for offs_np, lines_arr in iter_line_batches_for_split(
                f, partition.codec, partition.start, partition.end,
                verify=self.verify,
            ):
                if drop_first and len(lines_arr) > 0:
                    drop_first = False
                    offs_np = offs_np[1:]
                    lines_arr = lines_arr.slice(1)
                    if len(lines_arr) == 0:
                        continue
                if typed:
                    # join the Arrow line array into one NDJSON buffer
                    # (C-side: one-list binary_join), then parse — no
                    # per-line Python. Empty lines become '{}' first so
                    # they parse as all-null rows exactly like
                    # from_json('') in value mode (Arrow's reader would
                    # silently skip them, losing the NULL rows the sink
                    # itself writes as empty lines)
                    import pyarrow.compute as pc

                    strs = lines_arr.cast(pa.string())
                    strs = pc.if_else(
                        pc.equal(pc.binary_length(strs), 0),
                        pa.scalar(empty_line),
                        strs,
                    )
                    la = pa.ListArray.from_arrays(
                        pa.array([0, len(strs)], type=pa.int32()), strs
                    )
                    nd = pc.binary_join(la, "\n")[0].as_buffer()
                    yield _with_pcols(_typed_batch(nd, offs=offs_np))
                    continue
                arrays, names = [], []
                if want_offset:
                    arrays.append(pa.array(offs_np, type=pa.int64()))
                    names.append("offset")
                if want_value:
                    arrays.append(_cast_lines(lines_arr))
                    names.append("value")
                yield _with_pcols(pa.RecordBatch.from_arrays(arrays, names=names))


def _partition_col_opt(options) -> list[str]:
    return [
        c.strip()
        for c in options.get("partitioncolumns", "").split(",")
        if c.strip()
    ]


def _parse_flat_ddl(ddl: str) -> StructType:
    """Context-free parser for the flat ``name type, name type`` DDL the
    typed scan supports (StructType.fromDDL needs a live SparkContext,
    which the data source worker process does not have). Nested types
    are out of scope by design — they are also unsupported by the typed
    scan itself (see _arrow_schema_for)."""
    from pyspark.sql import types as T

    by_name = {
        "bigint": T.LongType(), "long": T.LongType(),
        "int": T.IntegerType(), "integer": T.IntegerType(),
        "smallint": T.ShortType(), "short": T.ShortType(),
        "double": T.DoubleType(),
        "float": T.FloatType(), "real": T.FloatType(),
        "string": T.StringType(), "varchar": T.StringType(),
        "boolean": T.BooleanType(), "bool": T.BooleanType(),
        "date": T.DateType(),
        "timestamp": T.TimestampType(),
        "timestamp_ntz": T.TimestampNTZType(),
    }
    fields = []
    for part in ddl.split(","):
        toks = part.strip().split()
        if len(toks) != 2:
            raise ValueError(
                f"fourmc jsonschema: expected 'name type' pairs, got "
                f"{part.strip()!r} (nested/parameterized types are not "
                "supported — use value mode + from_json)"
            )
        name, tname = toks[0].strip("`"), toks[1].lower()
        if tname not in by_name:
            raise ValueError(
                f"fourmc jsonschema: unsupported type {toks[1]!r} for "
                f"column {name!r} — supported: {sorted(by_name)}"
            )
        fields.append(StructField(name, by_name[tname], nullable=True))
    if not fields:
        raise ValueError("fourmc jsonschema: empty schema")
    return StructType(fields)


def _arrow_schema_for(st: StructType):
    """Arrow explicit_schema for the typed NDJSON scan, plus the
    post-parse casts the raw parse can't express. Only types whose JSON
    representation parses unambiguously are supported; anything else
    should stay in ``value`` mode and be parsed with from_json.

    Returns ``(parse_schema, post_casts)``: DATE columns parse as
    STRING (Arrow's JSON reader accepts only epoch-day numbers for
    date32, but the sink/to_json pipeline writes ISO strings) and are
    cast to date32 afterwards — the string→date32 cast kernel does
    accept ISO text. Timestamp columns parse as naive microseconds:
    Arrow normalizes zone-suffixed text ("...Z", "...+05:00") to the
    UTC wall clock and passes zone-less text through, which matches
    from_json exactly when the session timezone is UTC (the to_json
    pipeline always writes zone-suffixed UTC text, so its data is
    unambiguous under any session timezone)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    mapping = [
        (T.LongType, pa.int64()),
        (T.IntegerType, pa.int32()),
        (T.ShortType, pa.int16()),
        (T.DoubleType, pa.float64()),
        (T.FloatType, pa.float32()),
        (T.StringType, pa.string()),
        (T.BooleanType, pa.bool_()),
        (T.DateType, pa.date32()),
        (T.TimestampNTZType, pa.timestamp("us")),
        (T.TimestampType, pa.timestamp("us")),
    ]
    fields = []
    post_casts: dict[str, "pa.DataType"] = {}
    for f in st.fields:
        for spark_t, arrow_t in mapping:
            if isinstance(f.dataType, spark_t):
                if arrow_t == pa.date32():
                    fields.append(pa.field(f.name, pa.string()))
                    post_casts[f.name] = arrow_t
                else:
                    fields.append(pa.field(f.name, arrow_t))
                break
        else:
            raise ValueError(
                f"fourmc jsonschema: unsupported type {f.dataType} for "
                f"column {f.name!r} — use value mode + from_json for it"
            )
    return pa.schema(fields), post_casts


def _float_cols_of(st: StructType) -> list[str]:
    from pyspark.sql import types as T

    return [
        f.name for f in st.fields
        if isinstance(f.dataType, (T.DoubleType, T.FloatType))
    ]


def _unquote_float_specials(ndjson: bytes, float_cols: list[str]) -> bytes:
    """Rewrite quoted non-finite float tokens to bare JSON tokens for
    the DECLARED float/double keys only: Spark's to_json serializes
    NaN/Infinity doubles as the quoted strings "NaN"/"Infinity"/
    "-Infinity", which Arrow's typed parse rejects ('changed from
    number to string'). The lookbehind keeps the rewrite out of string
    VALUES: inside a JSON string every quote is escaped, so an
    unescaped "key": match can only be a real object key."""
    import re

    for c in float_cols:
        key = re.escape(_json.dumps(c))
        ndjson = re.sub(
            (r'(?<!\\)(' + key + r'\s*:\s*)"(NaN|Infinity|\+Infinity'
             r'|-Infinity)"').encode(),
            rb"\1\2",
            ndjson,
        )
    return ndjson


class _TypedNdjsonParser:
    """One Arrow C-side parse of an NDJSON buffer against the declared
    flat schema, producing FINAL-typed combined arrays for ``want``
    (post-parse casts applied). Built ONCE per scan partition / sink
    task — the schema filtering, Arrow schema, and ParseOptions are
    hot-path-invariant, so they must not be rebuilt per micro-batch.

    On the quoted-NaN/Infinity ArrowInvalid (Spark's to_json serializes
    non-finite doubles as quoted strings), retries once after rewriting
    those tokens for the declared float columns; any other parse
    failure names the value-mode + from_json fallback."""

    def __init__(self, st: StructType, want: list[str]) -> None:
        import pyarrow as pa
        import pyarrow.json as pj

        self.want = list(want)
        sub = StructType([f for f in st.fields if f.name in self.want])
        self.schema, self.post_casts = _arrow_schema_for(sub)
        self.float_cols = _float_cols_of(sub)
        self.opts = pj.ParseOptions(
            explicit_schema=self.schema, unexpected_field_behavior="ignore"
        )
        # date columns primarily parse as STRING (to_json writes ISO
        # text, which Arrow's date32 JSON parse rejects), but data that
        # predates the string path — or any producer writing epoch-day
        # NUMBERS, the one form Arrow's date32 parse accepts natively —
        # must keep reading: a retry schema parses dates as date32
        # directly (no post-cast). Mixed representations for one
        # column inside one buffer stay unsupported (both parses fail;
        # the error names the value-mode fallback).
        self.date_retry_opts = None
        if any(t == pa.date32() for t in self.post_casts.values()):
            native = [
                pa.field(f.name, pa.date32())
                if self.post_casts.get(f.name) == pa.date32()
                else f
                for f in self.schema
            ]
            self.date_retry_opts = pj.ParseOptions(
                explicit_schema=pa.schema(native),
                unexpected_field_behavior="ignore",
            )

    def _parse(self, ndjson):
        """The parse-attempt ladder: primary schema; then (as needed)
        quoted-NaN rewrite, epoch-day-number dates, and both at once."""
        import pyarrow as pa
        import pyarrow.json as pj

        try:
            return pj.read_json(
                pa.BufferReader(ndjson), parse_options=self.opts
            ), False
        except pa.ArrowInvalid:
            if not self.float_cols and self.date_retry_opts is None:
                raise
        raw = ndjson if isinstance(ndjson, bytes) else ndjson.to_pybytes()
        attempts = []
        if self.float_cols:
            fixed = _unquote_float_specials(raw, self.float_cols)
            attempts.append((fixed, self.opts, False))
        if self.date_retry_opts is not None:
            attempts.append((raw, self.date_retry_opts, True))
            if self.float_cols:
                attempts.append((fixed, self.date_retry_opts, True))
        err = None
        for buf, opts, native_dates in attempts:
            try:
                return pj.read_json(
                    pa.BufferReader(buf), parse_options=opts
                ), native_dates
            except pa.ArrowInvalid as e:
                err = e
        raise ValueError(
            "fourmc jsonschema: typed parse failed under every supported "
            "representation (ISO-string or epoch-day-number dates, quoted "
            "NaN/Infinity floats normalized) — read in value mode and "
            "parse with from_json instead"
        ) from err

    def arrays(self, ndjson) -> list:
        """Final-typed pa.Array per ``want`` column, chunks combined."""
        import pyarrow as pa

        if not isinstance(ndjson, (bytes, pa.Buffer)):
            raise TypeError("ndjson must be bytes or an Arrow buffer")
        tbl, native_dates = self._parse(ndjson)
        out = []
        for c in self.want:
            col = tbl.column(c).combine_chunks()
            tgt = self.post_casts.get(c)
            if tgt is not None and not (native_dates and tgt == pa.date32()):
                col = col.cast(tgt)
            out.append(col)
        return out


class _TypedCsvParser:
    """CSV twin of :class:`_TypedNdjsonParser` (the ``csvschema`` scan
    option): one Arrow C-side CSV parse per buffer against the declared
    flat schema. CSV is POSITIONAL — the DDL declares every on-disk
    column in order; ``want`` selects the parsed subset.

    Conventions match Spark's ``to_csv``/``from_csv`` defaults: comma
    separator, ``"`` quotes with ``\\`` escapes, empty unquoted field =
    NULL, quoted ``\"\"`` also reads back NULL (from_csv cannot tell
    them apart either). Timestamp columns parse as STRING and cast
    after a trailing-``Z`` strip (to_csv writes Z-suffixed UTC; Arrow's
    timestamp cast refuses zone offsets), matching from_csv under the
    UTC session convention the typed tier documents. KNOWN divergence:
    a ``\\`` in an UNQUOTED field is treated as an escape by Arrow but
    as a literal by from_csv — data with raw unquoted backslashes
    should stay in value mode + from_csv (ANALYZE-CSV sidecars are
    built THROUGH this parser, so pruning always agrees with the scan
    either way). Embedded newlines cannot roundtrip in ANY CSV-line
    consumer of this container (the record model is LINES; to_csv
    quotes the newline but the line reader splits on it) — use the
    JSON record model for such data."""

    def __init__(self, st: StructType, want: list[str]) -> None:
        import pyarrow as pa
        import pyarrow.csv as pcsv
        from pyspark.sql import types as T

        self.want = list(want)
        self.all_names = [f.name for f in st.fields]
        # empty VALUE lines must parse as all-null rows (the sink writes
        # NULL rows that way): a line of n-1 bare commas is n null
        # fields. The 1-column case uses '""' (quoted empty, which
        # quoted_strings_can_be_null reads as NULL) — an EMPTY placeholder
        # would vanish when it lands as the buffer's unterminated final
        # line (Arrow doesn't count a trailing empty line: row loss).
        n = len(self.all_names)
        self.empty_line = '""' if n == 1 else "," * (n - 1)
        sub = StructType([f for f in st.fields if f.name in self.want])
        # reuse the NDJSON type mapping for validation; timestamps join
        # dates on the parse-as-string + post-cast path (CSV text is
        # Z-suffixed, which the cast kernel refuses until stripped)
        schema, post = _arrow_schema_for(sub)
        self.post_casts = dict(post)
        col_types = {}
        for f in schema:
            if pa.types.is_timestamp(f.type):
                col_types[f.name] = pa.string()
                self.post_casts[f.name] = f.type
            else:
                col_types[f.name] = f.type
        self.read_opts = pcsv.ReadOptions(column_names=self.all_names)
        self.parse_opts = pcsv.ParseOptions(
            quote_char='"',
            double_quote=False,
            escape_char="\\",
            newlines_in_values=False,
            ignore_empty_lines=False,
        )
        self.convert_opts = pcsv.ConvertOptions(
            column_types=col_types,
            include_columns=self.want,
            null_values=[""],
            strings_can_be_null=True,
            quoted_strings_can_be_null=True,  # from_csv: "" is NULL too
        )

    def arrays(self, buf) -> list:
        """Final-typed pa.Array per ``want`` column, chunks combined."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.csv as pcsv

        if not isinstance(buf, (bytes, pa.Buffer)):
            raise TypeError("csv buffer must be bytes or an Arrow buffer")
        try:
            tbl = pcsv.read_csv(
                pa.BufferReader(buf),
                read_options=self.read_opts,
                parse_options=self.parse_opts,
                convert_options=self.convert_opts,
            )
            out = []
            for c in self.want:
                col = tbl.column(c).combine_chunks()
                tgt = self.post_casts.get(c)
                if tgt is not None:
                    if pa.types.is_timestamp(tgt):
                        col = pc.replace_substring_regex(col, "Z$", "")
                    col = col.cast(tgt)
                out.append(col)
            return out
        except pa.ArrowInvalid as e:
            raise ValueError(
                "fourmc csvschema: typed CSV parse failed (malformed "
                "rows, zone offsets other than Z, or unquoted escapes) "
                "— read in value mode and parse with from_csv instead"
            ) from e


# per-file zone-map sidecar written by operators/maintenance.analyze_stats
STATS_SUFFIX = ".stats.json"


def _zone_comparable(a, b) -> bool:
    """Same-ordering check for two SIDECAR values (JSON primitives):
    number vs number, str vs str. Used by the compaction stats carry to
    refuse min/max across inputs analyzed under different DDLs. (Bound
    vs sidecar comparisons go through _zone_pair, which also parses
    temporal ISO strings.)"""
    def _num(x):
        return isinstance(x, (int, float)) and not isinstance(x, bool)

    return (_num(a) and _num(b)) or (
        isinstance(a, str) and isinstance(b, str)
    )


def _zone_pair(stat, bv):
    """Normalize a (sidecar stat value, pushed bound value) pair into
    two directly comparable objects, or None when no ordering is
    provably shared (conservative — the file/block is scanned).

    Shared orderings: number vs number (covers TimestampType bounds,
    canonicalized to epoch micros by pushFilters, against the micros
    ints new sidecars store); str vs str; a naive-datetime bound
    (TimestampNTZ) or date bound against a sidecar ISO string, PARSED
    before comparing so text-format drift (variable fraction digits,
    'T' vs ' ' separator, old sidecars) can never flip an ordering.
    A TimestampType bound against an OLD sidecar's wall-clock string is
    deliberately incomparable — those strings are session-timezone
    wall times with no zone recorded; re-ANALYZE writes micros."""
    import datetime as _dt

    def _num(x):
        return isinstance(x, (int, float)) and not isinstance(x, bool)

    if _num(stat) and _num(bv):
        return stat, bv
    if isinstance(bv, _dt.datetime):  # naive NTZ bound (aware→micros already)
        if isinstance(stat, str):
            try:
                s = _dt.datetime.fromisoformat(stat)
            except ValueError:
                return None
            if s.tzinfo is not None:
                return None
            return s, bv
        return None
    if isinstance(bv, _dt.date):
        if isinstance(stat, str):
            try:
                return _dt.date.fromisoformat(stat), bv
            except ValueError:
                return None
        return None
    if isinstance(stat, str) and isinstance(bv, str):
        return stat, bv
    return None


#: parsed-sidecar cache — the SAME freshness contract as the
#: footer-index cache in format/reader.scan_file_info: keyed on
#: (sidecar size, sidecar mtime_ns, data size), and every hit ALSO
#: re-reads a small content fingerprint (first+last bytes of the
#: sidecar), because stat() alone is spoofable (cp -p / rsync -t /
#: same-tick rewrites) and serving a stale parsed zone map could
#: falsely prune files. Bloom-fattened sidecars cost ~300 µs to parse
#: (measured, scripts/measure_bloom_planning.py: the 175 KB base64
#: string dominates json.loads); the fingerprint pread is ~10 µs.
#: Stale/invalid sidecars negative-cache (the _STALE sentinel) so a
#: rewritten-but-not-re-ANALYZEd tree doesn't re-parse every fat
#: sidecar on every plan. Bounded with the sibling cache's atomic
#: clear (a fat sidecar parses to ~200 KB, so 2048 entries tops out
#: ~400 MB on the driver — small next to the O(files) split plan).
_SIDECAR_CACHE: dict[str, tuple[tuple, bytes, object]] = {}
_SIDECAR_CACHE_MAX = 2048
_SIDECAR_FP_BYTES = 32
_STALE = object()  # negative-cache sentinel: sidecar present but unusable


def _sidecar_fingerprint(f, size: int) -> bytes:
    f.seek(0)
    head = f.read(_SIDECAR_FP_BYTES)
    f.seek(max(0, size - _SIDECAR_FP_BYTES))
    return head + f.read(_SIDECAR_FP_BYTES)


def _load_zone_sidecar(path: str):
    """The file's analyze_stats sidecar, or None when missing,
    unreadable, or STALE (recorded size != current size — the data was
    rewritten after ANALYZE)."""
    import json

    sc = path + STATS_SUFFIX
    try:
        st = os.stat(sc)
        data_size = os.path.getsize(path)
    except OSError:
        return None
    key = (st.st_size, st.st_mtime_ns, data_size)
    hit = _SIDECAR_CACHE.get(path)
    if hit is not None and hit[0] == key:
        try:
            with open(sc, "rb") as f:
                if _sidecar_fingerprint(f, st.st_size) == hit[1]:
                    meta = hit[2]
                    return None if meta is _STALE else meta
        except OSError:
            return None
    try:
        with open(sc, "rb") as f:
            raw = f.read()
        meta = json.loads(raw)
        if meta.get("size") != data_size:
            meta = _STALE
    except (OSError, ValueError):
        return None
    fp = (
        raw[:_SIDECAR_FP_BYTES]
        + raw[max(0, len(raw) - _SIDECAR_FP_BYTES):]
    )
    if len(_SIDECAR_CACHE) >= _SIDECAR_CACHE_MAX:
        _SIDECAR_CACHE.clear()  # atomic under concurrent planners
    _SIDECAR_CACHE[path] = (key, fp, meta)
    return None if meta is _STALE else meta


def _range_excluded(mn, mx, bound) -> bool:
    """True iff a column whose values span [mn, mx] provably cannot
    satisfy the (lo, lo_inc, hi, hi_inc) bound conjunction. min/max of
    None means the span holds no non-null value — range and equality
    predicates reject NULL, so nothing can match."""
    lo, lo_inc, hi, hi_inc = bound
    if mn is None or mx is None:
        return True
    if lo is not None:
        p = _zone_pair(mx, lo)
        if p is not None and (p[0] < p[1] or (p[0] == p[1] and not lo_inc)):
            return True
    if hi is not None:
        p = _zone_pair(mn, hi)
        if p is not None and (p[0] > p[1] or (p[0] == p[1] and not hi_inc)):
            return True
    return False


def _zone_file_pruned(meta: dict, zone: dict[str, list]) -> bool:
    """True iff the sidecar PROVES no row in the file can satisfy the
    conjunction of pushed bounds. Conservative everywhere: missing
    column or incomparable types => NOT pruned. Spark re-applies every
    filter post-scan, so pruning can only remove provably-empty work."""
    cols = meta.get("columns", {})
    for col, bound in zone.items():
        if bound[0] is None and bound[2] is None:
            continue
        st = cols.get(col)
        if not isinstance(st, dict):
            continue
        if _range_excluded(st.get("min"), st.get("max"), bound):
            return True
    return False


def _zone_dropped_blocks(meta: dict, zone: dict[str, list]) -> frozenset:
    """Block offsets whose per-block stats (sidecar ``blocks`` entries,
    keyed by the compressed block offset that the scan's ``offset``
    column exposes) prove the block owns no matching line. Blocks
    absent from the sidecar are kept — same conservative contract as
    the file tier."""
    dropped = set()
    for b in meta.get("blocks") or ():
        c = b.get("c", {})
        for col, bound in zone.items():
            if bound[0] is None and bound[2] is None:
                continue
            st = c.get(col)
            if not isinstance(st, (list, tuple)) or len(st) < 2:
                continue
            if _range_excluded(st[0], st[1], bound):
                dropped.add(b.get("o"))
                break
    return frozenset(dropped)


#: bloom sidecar hash contract (shared with operators/maintenance.
#: analyze_bloom, which imports these): xxhash64(CAST(col AS STRING)
#: UTF-8 bytes) with Spark's fixed seed 42, double-hashed into k
#: positions (h1 + i*h2) mod bits where h1 = low 32 bits, h2 = high 32
#: bits | 1; bit p sits at byte p >> 3, mask 1 << (p & 7). The probe
#: recognizes exactly this tag — sidecars written under any future
#: contract are ignored (conservative: the file is scanned).
BLOOM_ALGO = "xxh64-str"
BLOOM_SEED = 42


def _next_prefix(v: str) -> str | None:
    """Smallest string greater than every string with prefix *v* (an
    EXCLUSIVE upper bound for StartsWith), or None when no such string
    exists (all code points at the max). Walks from the end, bumping
    the first incrementable code point and truncating the rest;
    surrogate-range successors are skipped (unencodable in UTF-8, and
    0xE000 is the next real code point — order-safe either way)."""
    for i in range(len(v) - 1, -1, -1):
        cp = ord(v[i])
        nxt = cp + 1
        if nxt == 0xD800:  # skip the surrogate block entirely
            nxt = 0xE000
        if nxt <= 0x10FFFF:
            return v[:i] + chr(nxt)
    return None


def _null_file_pruned(meta: dict, nullreq: dict[str, set]) -> bool:
    """True iff some null-ness requirement is provably unsatisfiable in
    this file: IsNotNull against a column with NO non-null values
    (min and max both null — includes the zero-row case, vacuously
    empty), or IsNull against a column whose recorded null count is 0.
    Conservative: missing column stats never prune."""
    cols = meta.get("columns", {})
    for col, req in nullreq.items():
        st = cols.get(col)
        if not isinstance(st, dict):
            continue
        if (
            "notnull" in req
            and st.get("min") is None
            and st.get("max") is None
        ):
            return True
        if "null" in req and st.get("nulls") == 0:
            return True
    return False


def _null_dropped_blocks(meta: dict, nullreq: dict[str, set]) -> frozenset:
    """Block offsets whose per-block stats prove the null-ness
    requirements unsatisfiable — same rules as the file tier."""
    dropped = set()
    for b in meta.get("blocks") or ():
        c = b.get("c", {})
        for col, req in nullreq.items():
            st = c.get(col)
            if not isinstance(st, (list, tuple)) or len(st) < 3:
                continue
            if ("notnull" in req and st[0] is None and st[1] is None) or (
                "null" in req and st[2] == 0
            ):
                dropped.add(b.get("o"))
                break
    return frozenset(dropped)


def bloom_positions(h: int, k: int, bits: int):
    """THE position derivation, shared by every Python bloom builder and
    the probe (the JVM builder in analyze_bloom mirrors it as SQL
    expressions, pinned equivalent by tests): double hashing with
    h1 = low 32 bits, h2 = high 32 bits | 1, position_i =
    (h1 + i*h2) mod bits. Any drift between a builder and the probe
    would silently mis-prune under the same contract tag — this helper
    exists so there is exactly one derivation to drift."""
    h1 = h & 0xFFFFFFFF
    h2 = (h >> 32) | 1
    for i in range(k):
        yield (h1 + i * h2) % bits


def seal_bloom_spec(bitmap: bytes, bits: int, k: int, fam: str) -> dict:
    """The sidecar bloom spec dict every builder seals: contract tag,
    geometry, the build-time type FAMILY ('int' | 'str' — the probe
    refuses a spec whose family differs from the read schema's, because
    a DDL drift between build and read could hash different canonical
    text for the same data), and the base64 bitmap."""
    import base64

    return {
        "algo": BLOOM_ALGO,
        "seed": BLOOM_SEED,
        "bits": bits,
        "k": k,
        "fam": fam,
        "b64": base64.b64encode(bitmap).decode("ascii"),
    }


def seal_bloom_blocks_header(
    bits: int, k: int, fams: dict, entries: list
) -> dict:
    """The sidecar ``bloom_blocks`` header every builder (and the
    compaction carry) seals: one shared geometry + per-column family
    map, with per-block per-column base64 bitmaps under ``blocks``."""
    return {
        "algo": BLOOM_ALGO,
        "seed": BLOOM_SEED,
        "bits": bits,
        "k": k,
        "fam": dict(fams),
        "blocks": entries,
    }


def validate_bloom_geometry(
    bits: int, k: int, what: str, max_bits: int = 1 << 27
) -> None:
    """Shared geometry validation for every bloom builder."""
    if bits % 8 or not 64 <= bits <= max_bits:
        raise ValueError(
            f"{what}: bits must be a multiple of 8 in [64, "
            f"2^{max_bits.bit_length() - 1}], got {bits}"
        )
    if not 1 <= k <= 16:
        raise ValueError(f"{what}: k must be in [1, 16], got {k}")


def _decode_bloom_spec(spec, fam: str):
    """(bitmap bytes, bits, k) when *spec* is a well-formed bloom under
    the recognized contract AND was built for type family *fam*; None
    on any doubt (the file is scanned). Decoded ONCE per (file, column)
    — probing an IN-list reuses the decoded bitmap."""
    import base64

    if (
        not isinstance(spec, dict)
        or spec.get("algo") != BLOOM_ALGO
        or spec.get("seed") != BLOOM_SEED
        or spec.get("fam") != fam
    ):
        return None
    try:
        bits, k = spec["bits"], spec["k"]
        bm = base64.b64decode(spec["b64"], validate=True)
    except (KeyError, TypeError, ValueError):
        return None
    if (
        not isinstance(bits, int)
        or not isinstance(k, int)
        or isinstance(bits, bool)
        or isinstance(k, bool)
        or bits <= 0
        or not 1 <= k <= 64
        or len(bm) * 8 != bits
    ):
        return None
    return bm, bits, k


def _bloom_canon(v, fam: str):
    """Canonical probe text for *v* under type family *fam*, or None
    when the value's type doesn't match (can't prove absence)."""
    if fam == "int" and isinstance(v, int) and not isinstance(v, bool):
        return str(v)
    if fam == "str" and isinstance(v, str):
        return v
    return None


def _bloom_dropped_blocks(
    meta: dict, points: dict[str, set], typemap: dict[str, str]
) -> frozenset:
    """Block offsets whose BLOCK-tier bloom (sidecar ``bloom_blocks``:
    shared geometry header + per-block per-column base64 bitmaps)
    proves every probed value absent — the within-file complement of
    the file tier: a kept 256 MB file scans only the blocks that may
    hold the probed id. Conservative on every doubt: foreign tag,
    geometry/bitmap-length mismatch, family drift, missing column or
    block entry => the block is kept."""
    import base64

    from fourmc_spark.format.native import xxh64

    bb = meta.get("bloom_blocks")
    if not isinstance(bb, dict) or bb.get("algo") != BLOOM_ALGO or (
        bb.get("seed") != BLOOM_SEED
    ):
        return frozenset()
    bits, k = bb.get("bits"), bb.get("k")
    fams = bb.get("fam")
    if (
        not isinstance(bits, int)
        or not isinstance(k, int)
        or isinstance(bits, bool)
        or isinstance(k, bool)
        or bits <= 0
        or bits % 8
        or not 1 <= k <= 64
        or not isinstance(fams, dict)
    ):
        return frozenset()
    # positions per probed column computed ONCE, reused for every block
    col_pos: dict[str, list[list[int]] | None] = {}
    for col, vals in points.items():
        fam = typemap.get(col)
        if fam is None or fams.get(col) != fam:
            continue
        pos_lists = []
        for v in vals:
            canon = _bloom_canon(v, fam)
            if canon is None:
                pos_lists = None  # un-probeable value: skip the column
                break
            h = xxh64(canon.encode("utf-8"), BLOOM_SEED)
            pos_lists.append(list(bloom_positions(h, k, bits)))
        if pos_lists:
            col_pos[col] = pos_lists
    if not col_pos:
        return frozenset()
    dropped = set()
    for b in bb.get("blocks") or ():
        c = b.get("c")
        if not isinstance(c, dict):
            continue
        for col, pos_lists in col_pos.items():
            b64 = c.get(col)
            if not isinstance(b64, str):
                continue
            try:
                bm = base64.b64decode(b64, validate=True)
            except (TypeError, ValueError):
                continue
            if len(bm) * 8 != bits:
                continue
            if not any(
                all((bm[p >> 3] >> (p & 7)) & 1 for p in pl)
                for pl in pos_lists
            ):
                dropped.add(b.get("o"))
                break
    return frozenset(dropped)


def _bloom_file_pruned(
    meta: dict, points: dict[str, set], typemap: dict[str, str]
) -> bool:
    """True iff some probed column's bloom proves EVERY point value
    absent from the file. Conservative everywhere: missing bloom,
    foreign algo/seed tag, build-vs-read type-family mismatch, value
    whose type doesn't match the declared column family (its canonical
    text could differ from CAST AS STRING) => NOT pruned."""
    from fourmc_spark.format.native import xxh64

    blooms = meta.get("bloom")
    if not isinstance(blooms, dict):
        return False
    for col, vals in points.items():
        fam = typemap.get(col)
        if fam is None:
            continue
        decoded = _decode_bloom_spec(blooms.get(col), fam)
        if decoded is None:
            continue
        bm, bits, k = decoded
        any_hit = False
        provable = True
        for v in vals:
            canon = _bloom_canon(v, fam)
            if canon is None:
                provable = False
                break
            h = xxh64(canon.encode("utf-8"), BLOOM_SEED)
            if all(
                (bm[p >> 3] >> (p & 7)) & 1
                for p in bloom_positions(h, k, bits)
            ):
                any_hit = True
                break
        if provable and not any_hit:
            return True
    return False


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _sanitize_pv(v) -> str:
    if v is None:
        return _HIVE_NULL
    s = str(v)
    # hive-style escaping kept minimal: path separators and NULs
    return s.replace("/", "%2F").replace("\x00", "%00") or _HIVE_NULL


def _split_by_partition(batch, pcols: list[str]):
    """Yield (reldir, sub_batch) per distinct partition-column combo.

    Partition columns are low-cardinality by contract, so per-batch
    distinct+filter (Arrow compute, no Python row loop) stays cheap."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = {c: batch.column(c) for c in pcols}
    combos = (
        pa.Table.from_arrays([cols[c] for c in pcols], names=pcols)
        .group_by(pcols)
        .aggregate([])
        .to_pylist()
    )
    for row in combos:
        mask = None
        for c in pcols:
            v = row[c]
            m = (
                pc.is_null(cols[c])
                if v is None
                else pc.equal(cols[c], pa.scalar(v, type=cols[c].type))
            )
            mask = m if mask is None else pc.and_kleene(mask, m)
        reldir = "/".join(f"{c}={_sanitize_pv(row[c])}" for c in pcols)
        yield reldir, batch.filter(pc.fill_null(mask, False))


def _partition_values_from_path(path: str, pcols: list[str]) -> dict[str, str | None]:
    """Recover hive-style key=value segments from a file path."""
    out: dict[str, str | None] = {c: None for c in pcols}
    for seg in path.split(os.sep):
        if "=" in seg:
            k, _, v = seg.partition("=")
            if k in out:
                out[k] = None if v == _HIVE_NULL else v.replace("%2F", "/").replace(
                    "%00", "\x00"
                )
    return out


def _join_lines(col) -> memoryview:
    """newline-join an Arrow column into one buffer — Arrow compute
    (C-speed), never a per-value Python loop. NULLs write as empty lines,
    matching Hadoop TextOutputFormat.

    Single-copy: an appended empty element makes ``binary_join`` itself
    produce the trailing newline, and the result is returned as a
    zero-copy memoryview over the join's output buffer (the writer
    re-slices it into blocks; ``as_py()`` + concat would copy the batch
    twice more for nothing)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import numpy as np

    vals = pc.fill_null(col.cast(pa.large_binary()), b"")
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    # [v1..vn, ""] joined on \n = "v1\n...\nvn\n" — the trailing newline
    # comes from an appended empty element. Appending via concat_arrays
    # would copy the whole data buffer; duplicating the last offset
    # instead shares it (offsets are 8 bytes/row).
    n = len(vals)
    off = np.frombuffer(
        vals.buffers()[1], dtype=np.int64, count=n + 1, offset=vals.offset * 8
    )
    ext = np.empty(n + 2, dtype=np.int64)
    ext[: n + 1] = off
    ext[n + 1] = off[n]  # empty final element
    vals = pa.Array.from_buffers(
        pa.large_binary(), n + 1,
        [None, pa.py_buffer(ext), vals.buffers()[2]],
    )
    wrapped = pa.LargeListArray.from_arrays([0, len(vals)], vals)
    sep = pa.scalar(b"\n", type=pa.large_binary())
    joined = pc.binary_join(wrapped, sep)
    # length-1 LargeBinaryArray: buffers = [validity, int64 offsets, data]
    offs = memoryview(joined.buffers()[1]).cast("q")
    lo, hi = offs[joined.offset], offs[joined.offset + 1]
    return memoryview(joined.buffers()[2])[lo:hi]


@dataclass
class FourMcCommitMessage(WriterCommitMessage):
    # (staged, final) path pairs — one per file this task produced
    # (several when writing hive-partitioned output)
    files: tuple


class FourMcDataSourceWriter(DataSourceArrowWriter):
    """Arrow-batch sink: writes each task's rows as one .4mc/.4mz file.

    Mirrors FourMcOutputStream (K1/K2) per task; commit() promotes staged
    files, abort() discards them (FileCommitProtocol-style atomicity).
    """

    def __init__(self, options, schema: StructType, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fourmc sink requires a path")
        self.codec_raw = options.get("codec", "lz4")
        self.level = options.get("level", "fast")
        self.block_size = int(options.get("blocksize", 4 * 1024 * 1024))
        # maxfilebytes: roll to a new file once the current one exceeds
        # this many COMPRESSED bytes (0 = one file per task). The
        # maxRecordsPerFile analog: without it a task holding 100 GB
        # writes one 100 GB file; each rolled file is independently
        # sealed (EOS + footer), so downstream split planning stays
        # per-file and bounded.
        self.max_file_bytes = int(options.get("maxfilebytes", 0))
        self.overwrite = overwrite
        # hive-style layout: partitionby=c1[,c2...] writes key=value/ dirs —
        # readers prune by path (glob) and can rebuild the columns with the
        # partitioncolumns scan option
        self.partition_cols = [
            c.strip() for c in options.get("partitionby", "").split(",") if c.strip()
        ]
        names = [f.name for f in schema.fields]
        for c in self.partition_cols:
            if c not in names:
                raise ValueError(f"partitionby column {c!r} not in schema {names}")
        # snapshot pre-existing output (driver side, plan time); on commit
        # with overwrite these are removed *after* staged files are ready,
        # so failed jobs never destroy existing data
        self.existing: list[str] = []
        if overwrite and self.path and os.path.isdir(self.path):
            self.existing = _list_files(self.path)
            succ = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(succ):
                self.existing.append(succ)
        # statsschema=<flat ddl>: the task computes file-tier zone maps
        # (min/max/null-count per declared column) from the NDJSON value
        # lines WHILE writing, and seals a .stats.json sidecar next to
        # each file — fresh ingest prunes immediately, no ANALYZE lag.
        # Requires the value lines to be valid NDJSON for the declared
        # fields (the to_json(struct(...)) pipeline); Arrow-parsed per
        # batch, zero cost when unset.
        # LIMITATION (documented, same convention as the typed scan):
        # TimestampType stats are epoch micros computed from the parsed
        # wall clock — exact for zone-suffixed text (to_json always
        # writes Z-suffixed UTC) under ANY session timezone, but
        # ZONE-LESS timestamp text is assumed UTC, so under a non-UTC
        # spark.sql.session.timeZone its sidecar micros would be offset
        # from the instants the session reads back, and pruning could
        # go wrong. The writer cannot see the session timezone (Python
        # DataSource workers get options only) and Arrow's parse cannot
        # flag zone-less text (it silently assumes UTC). For zone-less
        # timestamp text under a non-UTC session, use analyze_stats()
        # instead — its unix_micros aggregation is session-tz-exact.
        ss = options.get("statsschema")
        self.stats_schema: StructType | None = (
            _parse_flat_ddl(ss) if ss else None
        )
        # statsformat: the record model of the value lines ('json'
        # default; 'csv' for to_csv pipelines — the csvschema twin)
        self.stats_format = str(options.get("statsformat", "json")).lower()
        if self.stats_format not in ("json", "csv"):
            raise ValueError(
                f"fourmc sink: statsformat must be 'json' or 'csv', "
                f"got {self.stats_format!r}"
            )
        # bloomcolumns=c1[,c2...]: ALSO seal write-time bloom bitmaps for
        # the named statsschema fields (int/string only — the same
        # eligibility as analyze_bloom, whose sidecars these match
        # bit-for-bit). Values canonicalize through Arrow's int->string
        # cast (decimal text == the probe's str()), dedup per batch with
        # pc.unique, and hash via ctypes XXH64 — the only Python-side
        # per-value work in the sink, opt-in and proportional to the
        # batch's DISTINCT values. With statsschema + bloomcolumns a
        # sealed log prunes ranges AND point lookups with no ANALYZE
        # job ever; compaction carries both tiers.
        bc = options.get("bloomcolumns", "")
        self.bloom_cols = [c.strip() for c in bc.split(",") if c.strip()]
        self.bloom_bits = int(options.get("bloombits", 1 << 20))
        self.bloom_k = int(options.get("bloomk", 7))
        if self.bloom_cols:
            if self.stats_schema is None:
                raise ValueError(
                    "fourmc sink: bloomcolumns requires statsschema "
                    "(the declared NDJSON fields to parse)"
                )
            validate_bloom_geometry(
                self.bloom_bits, self.bloom_k, "fourmc sink bloomcolumns"
            )
            from pyspark.sql import types as _T

            types = {f.name: f.dataType for f in self.stats_schema.fields}
            for c in self.bloom_cols:
                if c not in types:
                    raise ValueError(
                        f"fourmc sink: bloomcolumns field {c!r} not in "
                        "statsschema"
                    )
                if not isinstance(
                    types[c],
                    (_T.LongType, _T.IntegerType, _T.ShortType, _T.StringType),
                ):
                    raise ValueError(
                        f"fourmc sink: bloomcolumns field {c!r} has type "
                        f"{types[c].simpleString()}; only long/int/short/"
                        "string fields are bloom-eligible"
                    )
        # pick the string column to serialize as lines
        data_names = [n for n in names if n not in self.partition_cols]
        if "value" in data_names:
            self.value_col = "value"
        else:
            str_cols = [
                f.name
                for f in schema.fields
                if isinstance(f.dataType, StringType) and f.name in data_names
            ]
            if len(data_names) == 1:
                self.value_col = data_names[0]
            elif len(str_cols) >= 1:
                self.value_col = str_cols[0]
            else:
                raise ValueError(
                    "fourmc sink needs a 'value' string column "
                    f"(got schema {names})"
                )

    def write(self, iterator: Iterator["pa.RecordBatch"]) -> FourMcCommitMessage:
        import pyarrow as pa  # noqa: F811

        from fourmc_spark.format.hadoop_stream import HADOOP_EXTS
        from fourmc_spark.format.writer import (
            FourMcWriter,
            HadoopBlockWriter,
            ZstWriter,
            normalize_codec,
        )

        # codec=zst -> standard zstd streaming format (reference C8): one
        # frame per task file, no block index — interop output, not the
        # splittable scale path (that's 4mz). codec=lz4_fast/... (a
        # straight-block-codec extension name) -> Hadoop
        # BlockCompressorStream container for M/R interop.
        hadoop_pair = HADOOP_EXTS.get(self.codec_raw.lower())
        if hadoop_pair is not None:
            codec, ext = "hadoop", f".{self.codec_raw.lower()}"
        elif self.codec_raw.lower() == "zst":
            codec, ext = "zst", ".zst"
        else:
            codec = normalize_codec(self.codec_raw)
            ext = ".4mc" if codec == "lz4" else ".4mz"
        staging = os.path.join(self.path, "_temporary")
        os.makedirs(staging, exist_ok=True)
        task_id = uuid.uuid4().hex

        streams: dict[str, tuple] = {}  # reldir -> (fileobj, writer, staged, acc)
        files: list[tuple[str, str]] = []
        stat_cols = (
            [f.name for f in self.stats_schema.fields]
            if self.stats_schema is not None else []
        )
        if self.stats_schema is None:
            stats_parser = None
            stats_empty = "{}"
        elif self.stats_format == "csv":
            stats_parser = _TypedCsvParser(self.stats_schema, stat_cols)
            stats_empty = stats_parser.empty_line
        else:
            stats_parser = _TypedNdjsonParser(self.stats_schema, stat_cols)
            stats_empty = "{}"

        def _writer_for(reldir: str):
            if reldir in streams:
                return streams[reldir][1]
            fname = f"part-{task_id}-{len(files)}{ext}"
            staged = os.path.join(staging, f"{len(files)}-{fname}")
            final = os.path.join(self.path, reldir, fname) if reldir else os.path.join(
                self.path, fname
            )
            f = open(staged, "wb")
            if codec == "hadoop":
                w = HadoopBlockWriter(
                    f, codec=hadoop_pair[0], level=hadoop_pair[1],
                )
            elif codec == "zst":
                w = ZstWriter(f, level=self.level)
            else:
                w = FourMcWriter(
                    f, codec=codec, level=self.level, block_size=self.block_size
                )
            acc = (
                # per column: [min, max, nulls, has_nan]; bloom: set of
                # bit positions per bloomcolumns field
                {"rows": 0,
                 "cols": {c: [None, None, 0, False] for c in stat_cols},
                 "bloom": {c: set() for c in self.bloom_cols}}
                if self.stats_schema is not None else None
            )
            streams[reldir] = (f, w, staged, acc)
            files.append((staged, final))
            return w

        def _accumulate_stats(reldir: str, values: "pa.Array") -> None:
            # file-tier zone map from the exact lines this file receives:
            # one Arrow JSON parse per batch (C-side), typed min_max —
            # int64 stays exact (no pandas float64 boundary)
            import pyarrow.compute as pc

            acc = streams[reldir][3]
            strs = values.cast(pa.string())
            # NULL values write as empty lines; both read back as
            # all-null rows, so both stat as the record model's all-null
            # placeholder
            strs = pc.fill_null(strs, stats_empty)
            strs = pc.if_else(
                pc.equal(pc.binary_length(strs), 0),
                pa.scalar(stats_empty),
                strs,
            )
            la = pa.ListArray.from_arrays(
                pa.array([0, len(strs)], type=pa.int32()), strs
            )
            nd = pc.binary_join(la, "\n")[0].as_buffer()
            arrays = stats_parser.arrays(nd)
            acc["rows"] += len(strs)
            for c, col in zip(stat_cols, arrays):
                st = acc["cols"][c]
                st[2] += col.null_count
                n_valid = len(col) - col.null_count
                if pa.types.is_floating(col.type) and n_valid:
                    # Arrow min_max SKIPS NaN (all-NaN spans return the
                    # +inf/-inf identities) but Spark's SQL ordering
                    # puts NaN ABOVE everything — x >= 0 matches a NaN
                    # row. Track NaN presence so the sealed max can be
                    # widened to NaN (comparisons against NaN are all
                    # false, so such spans never prune — conservative
                    # AND semantically exact, NaN being Spark's max).
                    n_nan = pc.sum(
                        pc.is_nan(col), min_count=0
                    ).as_py() or 0
                    if n_nan:
                        st[3] = True
                    n_valid -= n_nan
                if n_valid:
                    mm = pc.min_max(col)
                    mn = mm["min"].as_py()
                    mx = mm["max"].as_py()
                    if st[0] is None or mn < st[0]:
                        st[0] = mn
                    if st[1] is None or mx > st[1]:
                        st[1] = mx
                if c in acc["bloom"]:
                    from fourmc_spark.format.native import xxh64

                    uniq = pc.unique(pc.drop_null(col.cast(pa.string())))
                    pos = acc["bloom"][c]
                    bits, k = self.bloom_bits, self.bloom_k
                    for v in uniq:
                        h = xxh64(v.as_py().encode("utf-8"), BLOOM_SEED)
                        pos.update(bloom_positions(h, k, bits))

        def _seal_sidecar(f, staged: str, acc) -> None:
            if acc is None:
                return
            import datetime

            from pyspark.sql import types as T

            # TimestampType stats travel as EPOCH MICROS ints — the one
            # representation the pushdown can compare against an
            # instant-typed filter value without knowing the session
            # timezone (the Arrow parse normalized zone-suffixed text
            # to the UTC wall clock, so naive-epoch arithmetic is exact)
            ts_cols = {
                f2.name for f2 in self.stats_schema.fields
                if isinstance(f2.dataType, T.TimestampType)
            }
            _EPOCH = datetime.datetime(1970, 1, 1)
            _US = datetime.timedelta(microseconds=1)

            def _jv(c, v):
                if isinstance(v, datetime.datetime):
                    if c in ts_cols:
                        return (v.replace(tzinfo=None) - _EPOCH) // _US
                    return v.isoformat(sep=" ")
                if isinstance(v, datetime.date):
                    return v.isoformat()
                return v

            def _col_meta(c, st):
                mn, mx = _jv(c, st[0]), _jv(c, st[1])
                if st[3]:  # NaN present: NaN is Spark's greatest double
                    mx = float("nan")
                    if mn is None:  # every valid value was NaN
                        mn = float("nan")
                return {"min": mn, "max": mx, "nulls": st[2]}

            meta = {
                "version": 2,
                "size": os.path.getsize(staged),
                "rows": acc["rows"],
                "columns": {
                    c: _col_meta(c, st) for c, st in acc["cols"].items()
                },
            }
            if self.bloom_cols:
                fams = {
                    f2.name: "str"
                    if isinstance(f2.dataType, T.StringType) else "int"
                    for f2 in self.stats_schema.fields
                }
                bitmaps = {}
                for c in self.bloom_cols:
                    bm = bytearray(self.bloom_bits // 8)
                    for p in acc["bloom"][c]:
                        bm[p >> 3] |= 1 << (p & 7)
                    bitmaps[c] = seal_bloom_spec(
                        bytes(bm), self.bloom_bits, self.bloom_k, fams[c]
                    )
                meta["bloom"] = bitmaps
            with open(staged + STATS_SUFFIX, "w") as sf:
                _json.dump(meta, sf)

        def _close_stream(reldir: str) -> None:
            f, w, staged, acc = streams.pop(reldir)
            w.close()
            f.close()
            _seal_sidecar(f, staged, acc)

        def _roll_if_needed(reldir: str) -> None:
            if self.max_file_bytes <= 0 or reldir not in streams:
                return
            f = streams[reldir][0]
            if f.tell() >= self.max_file_bytes:
                _close_stream(reldir)  # next batch opens a fresh sealed file

        def _sub_batches(batch: "pa.RecordBatch"):
            # with rolling on, bound the roll-check granularity: a task's
            # whole partition can arrive as one Arrow batch, which would
            # defeat any maxfilebytes smaller than the batch
            if self.max_file_bytes <= 0 or len(batch) <= 4096:
                yield batch
                return
            for off in range(0, len(batch), 4096):
                yield batch.slice(off, 4096)

        try:
            for full_batch in iterator:
                if len(full_batch) == 0:
                    continue
                for batch in _sub_batches(full_batch):
                    if not self.partition_cols:
                        _writer_for("").write(
                            _join_lines(batch.column(self.value_col))
                        )
                        if self.stats_schema is not None:
                            _accumulate_stats(
                                "", batch.column(self.value_col)
                            )
                        _roll_if_needed("")
                        continue
                    for reldir, sub in _split_by_partition(
                        batch, self.partition_cols
                    ):
                        _writer_for(reldir).write(
                            _join_lines(sub.column(self.value_col))
                        )
                        if self.stats_schema is not None:
                            _accumulate_stats(
                                reldir, sub.column(self.value_col)
                            )
                        _roll_if_needed(reldir)
        finally:
            for reldir in list(streams):
                _close_stream(reldir)
        return FourMcCommitMessage(files=tuple(files))

    def commit(self, messages) -> None:
        if self.overwrite:
            for old in self.existing:
                # the data file's sidecar must not outlive it: a later
                # file landing on the same name with a colliding byte
                # size would re-adopt stats for different content
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
                    # statsschema sidecar rides along with its data
                    # file; a stats-less file landing over a previous
                    # occupant must also evict that occupant's sidecar
                    # (mirrors maintenance._drop_stale_sidecar)
                    if os.path.exists(staged + STATS_SUFFIX):
                        os.replace(staged + STATS_SUFFIX, final + STATS_SUFFIX)
                    else:
                        try:
                            os.remove(final + STATS_SUFFIX)
                        except FileNotFoundError:
                            pass
        staging = os.path.join(self.path, "_temporary")
        try:
            os.rmdir(staging)
        except OSError:
            pass
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None:
                for staged, _ in m.files:
                    for p in (staged, staged + STATS_SUFFIX):
                        if os.path.exists(p):
                            os.remove(p)

"""Dataset maintenance: small-file compaction and layout stats.

The small-files problem is the death of 100 TB pipelines: a streaming
ingest that seals a 4mc file per micro-batch per task leaves millions of
KB-sized files, and every downstream scan pays one task + one footer read
per file. Compaction rewrites them into few, large, still-splittable
files — planning cost drops from O(files) to O(bytes / target_size),
and the write amplification is paid once (the same compress-once-scan-many
economics as the reference's codec-level guidance, Readme.md:98-101).

Two compaction strategies, picked by what needs to change:

* ``compact`` / ``compact_partitioned`` — full rewrite through the
  scan+sink (decompress, re-block, recompress). The right tool when the
  codec/level should change or rows need re-clustering; pays one full
  codec pass over the data.
* ``compact_blocks`` (round 9) — RAW BLOCK COPY. 4mc blocks are
  independently compressed and self-delimiting (reference
  4mc-format-spec:11, FourMcOutputStream.java:195-223), so same-codec
  files concatenate at the block level: compressed payloads move
  byte-for-byte into one new container and only header/EOS/footer are
  rewritten. No decompression, no row decode; per-task cost is pure
  sequential I/O — the default for the streaming sink's droppings,
  where the codec is already right and CPU is the scarce resource.

``compact_blocks`` correctness notes:

* Text (line) semantics: a sealed file whose content lacks a trailing
  newline still ends a line at EOF for every 4mc reader. Concatenating
  its blocks in front of another file would glue that final line onto
  the next file's first line, so ``newline_fix=True`` (the text-mode
  default) decodes ONLY each input's final block and appends a 1-byte
  raw ``\\n`` block when the terminator is missing — line content is
  preserved exactly, at the cost of decoding one block per input.
* ElephantBird-protobuf containers need no fix (records self-delimit
  via sync markers; a whole file is always a whole-record stream), so
  ``compact_protobuf`` passes ``newline_fix=False`` — and because
  marker-start ownership is concatenation-invariant, it also carries
  zone maps EXACTLY (``self_delimiting=True``: every block entry kept,
  no seam drops).
* NEVER compact in place under a live ordered-names stream: replacing
  files below the consumer's high-water mark violates the orderednames
  contract (sources/stream.py). Compaction writes a NEW tree; readers
  cut over by path.

Distribution (``compact_blocks``): the driver plans greedy same-codec
bins from footer-only ``scan_file_info`` preads (O(inputs) tiny reads,
same cost class as split planning) and executes one task per output
file via ``sc.parallelize`` — per-partition imperative file I/O is the
one job shape where the RDD API is the honest tool. No shuffle.
"""

from __future__ import annotations

import math
import os
import struct
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from fourmc_spark.format import core
from fourmc_spark.format.reader import iter_block_payloads, scan_file_info
from fourmc_spark.format.writer import FourMcWriter, normalize_codec
from fourmc_spark.sources.datasource import _list_files, _load_zone_sidecar

__all__ = [
    "analyze_stats",
    "compact",
    "compact_blocks",
    "compact_partitioned",
    "compact_protobuf",
    "layout_stats",
    "sidecar_health",
    "plan_compaction",
]


def layout_stats(path: str) -> dict:
    """File-layout health of a 4mc/4mz/zst dataset directory: counts,
    bytes, and block counts straight from the footers (one ranged read per
    file — the same metadata the split planner touches, no data bytes)."""
    from fourmc_spark.format import scan_file_info

    files = _list_files(path)
    sizes = [os.path.getsize(f) for f in files]
    blocks = 0
    for f in files:
        if f.endswith(".zst"):
            blocks += 1  # no index; planned as one partition
        else:
            _, _, offsets = scan_file_info(f)
            blocks += len(offsets)
    return {
        "n_files": len(files),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes, default=0),
        "max_bytes": max(sizes, default=0),
        "n_blocks": blocks,
    }


def sidecar_health(path: str) -> dict:
    """Operational audit of the pruning-sidecar tiers: which data files
    carry a VALID (size-matching) ``.stats.json``, which are stale or
    bare, and which tiers each valid sidecar seals — the numbers an
    operator needs to decide when to re-ANALYZE (or whether write-time
    ``statsschema``/``bloomcolumns`` is doing its job). Metadata-only:
    one os.stat + one small JSON read per file, no data bytes."""
    from fourmc_spark.sources.datasource import STATS_SUFFIX

    files = [p for p in _list_files(path) if not p.endswith(STATS_SUFFIX)]
    out = {
        "n_files": len(files),
        "with_sidecar": 0,
        "stale": 0,        # sidecar exists but is unusable (the planner
        "missing": 0,      # ignores it: size mismatch or unreadable)
        "zone_files": 0,   # file-tier min/max present
        "zone_blocks": 0,  # per-block min/max present
        "bloom_files": 0,  # file-tier blooms present
        "bloom_blocks": 0,
        "zone_columns": set(),
        "bloom_columns": set(),
        # sidecars with no data file; counted only for a plain-directory
        # path (glob/multi/single-file inputs have no well-defined tree
        # to sweep) — None means "not checked"
        "orphan_sidecars": 0 if os.path.isdir(path) else None,
    }
    for f in files:
        if not os.path.exists(f + STATS_SUFFIX):
            out["missing"] += 1
            continue
        # ONE validity contract: exactly what the planner would load
        meta = _load_zone_sidecar(f)
        if meta is None:
            out["stale"] += 1
            continue
        out["with_sidecar"] += 1
        cols = meta.get("columns")
        if isinstance(cols, dict) and cols:
            out["zone_files"] += 1
            out["zone_columns"] |= set(cols)
        if meta.get("blocks"):
            out["zone_blocks"] += 1
        bloom = meta.get("bloom")
        if isinstance(bloom, dict) and bloom:
            out["bloom_files"] += 1
            out["bloom_columns"] |= set(bloom)
        if isinstance(meta.get("bloom_blocks"), dict):
            out["bloom_blocks"] += 1
    if out["orphan_sidecars"] is not None:
        for dirpath, dirs, names in os.walk(path):
            # match _list_files' visibility rule: hidden/underscore
            # directories are outside the dataset
            dirs[:] = [
                x for x in dirs if not x.startswith((".", "_"))
            ]
            for n in names:
                if n.endswith(STATS_SUFFIX) and not os.path.exists(
                    os.path.join(dirpath, n[: -len(STATS_SUFFIX)])
                ):
                    out["orphan_sidecars"] += 1
    out["zone_columns"] = sorted(out["zone_columns"])
    out["bloom_columns"] = sorted(out["bloom_columns"])
    return out


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    codec: str = "zstd",
    level: str = "high",
    target_file_bytes: int = 512 * 1024 * 1024,
) -> int:
    """Rewrite many small files into ~``target_file_bytes`` sealed files.

    Returns the number of output partitions (= files). Scale shape:

    * the scan plans block-aligned partitions as usual (parallel read);
    * `coalesce` merges read partitions WITHOUT a shuffle — each output
      task streams several input partitions end-to-end;
    * the sink writes one sealed file per output task with atomic commit.

    ``target_file_bytes`` is compared against the INPUT's compressed size;
    recompression at a different level changes output sizes proportionally
    (compact is the natural place to raise the codec level: these files
    are written once and scanned forever after).
    """
    stats = layout_stats(in_path)
    if stats["n_files"] == 0:
        raise ValueError(f"no 4mc/4mz/zst files under {in_path!r}")
    n_out = max(1, math.ceil(stats["total_bytes"] / target_file_bytes))
    df = spark.read.format("fourmc").load(in_path)
    (
        df.select("value")
        .coalesce(n_out)
        .write.format("fourmc")
        .option("codec", codec)
        .option("level", level)
        .mode("overwrite")
        .save(out_path)
    )
    return n_out


def compact_partitioned(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    partition_cols: list[str],
    codec: str = "zstd",
    level: str = "high",
    target_file_bytes: int = 512 * 1024 * 1024,
) -> int:
    """Partition-preserving compaction of a hive-layout dataset.

    Reads with `partitioncolumns` (values rebuilt from paths), repartitions
    by the partition columns so each output task holds whole partitions,
    and writes back with `partitionby` — the `key=value/` layout survives,
    small files per partition collapse. One shuffle, keyed by the partition
    columns; AQE coalesces the output to ~target-size tasks.
    """
    stats = layout_stats(in_path)
    if stats["n_files"] == 0:
        raise ValueError(f"no 4mc/4mz/zst files under {in_path!r}")
    n_out = max(1, math.ceil(stats["total_bytes"] / target_file_bytes))
    df = spark.read.format("fourmc").option(
        "partitioncolumns", ",".join(partition_cols)
    ).load(in_path)
    (
        df.select("value", *partition_cols)
        .repartition(n_out, *partition_cols)
        .write.format("fourmc")
        .option("codec", codec)
        .option("level", level)
        .option("partitionby", ",".join(partition_cols))
        .mode("overwrite")
        .save(out_path)
    )
    return n_out


DEFAULT_TARGET_BYTES = 512 << 20  # compressed bytes per output file


@dataclass(frozen=True)
class CompactionPlan:
    """One output file: ordered input paths sharing one codec, all from
    one directory (*reldir*, relative to the compaction root — '' at the
    root) so hive ``key=value/`` layouts survive compaction."""

    codec: str
    inputs: tuple[str, ...]
    est_bytes: int
    reldir: str = ""


# raw block copy needs the 4mc framing + footer index; .zst and the
# Hadoop block-codec containers have neither — they are skipped (and
# reported) rather than crashing planning with a BadHeaderError
_BLOCK_EXTS = (".4mc", ".4mz")


def _split_compactable(in_dir: str) -> tuple[list[str], list[str]]:
    files = sorted(_list_files(in_dir))
    ok = [f for f in files if f.endswith(_BLOCK_EXTS)]
    return ok, [f for f in files if not f.endswith(_BLOCK_EXTS)]


def plan_compaction(
    in_dir: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> list[CompactionPlan]:
    """Greedy name-ordered bins of same-codec files up to *target_bytes*
    compressed, binned per directory: files never cross a directory
    boundary, so partition values encoded only in hive dir names
    (``region=eu/…``) are preserved by construction. Name order keeps
    arrival locality (part-b names sort in batch order), so compacted
    files stay roughly time-clustered — which is what downstream range
    filters prune on. Only footer-indexed containers (.4mc/.4mz) are
    planned; other extensions are left to the caller to report."""
    in_real = os.path.realpath(in_dir)
    bins: list[CompactionPlan] = []
    cur: dict[tuple[str, str], list] = {}  # (reldir, codec) -> [paths, bytes]
    ok, _skipped = _split_compactable(in_dir)
    for path in ok:
        reldir = os.path.relpath(os.path.dirname(os.path.realpath(path)),
                                 in_real)
        reldir = "" if reldir == "." else reldir
        codec, size, _offs = scan_file_info(path)
        key = (reldir, codec)
        got = cur.get(key)
        if got is not None and got[1] + size > target_bytes and got[0]:
            bins.append(CompactionPlan(codec, tuple(got[0]), got[1], reldir))
            got = None
        if got is None:
            got = cur[key] = [[], 0]
        got[0].append(path)
        got[1] += size
    for (reldir, codec), (paths, nbytes) in cur.items():
        if paths:
            bins.append(CompactionPlan(codec, tuple(paths), nbytes, reldir))
    return bins


def _append_raw_blocks(
    out_f, offsets: list[int], src: str
) -> list[tuple[int, int]]:
    """Copy *src*'s framed blocks verbatim; returns the (input offset,
    output offset) pair of every copied block, in file order."""
    pairs: list[tuple[int, int]] = []
    with open(src, "rb") as f:
        core.decode_header(f.read(core.HEADER_SIZE))
        while True:
            in_off = f.tell()
            hdr = f.read(core.BLOCK_HEADER_SIZE)
            if len(hdr) < core.BLOCK_HEADER_SIZE:
                raise core.BadBlockError(f"{src}: truncated block header")
            usize, csize, checksum = struct.unpack(">III", hdr)
            if usize == 0 and csize == 0 and checksum == 0:
                return pairs  # EOS — footer follows; nothing left to copy
            payload = f.read(csize)
            if len(payload) != csize:
                raise core.BadBlockError(f"{src}: truncated block payload")
            out_off = out_f.tell()
            offsets.append(out_off)
            pairs.append((in_off, out_off))
            out_f.write(hdr)
            out_f.write(payload)


def _last_block_ends_with_newline(src: str) -> bool:
    codec, _size, offs = scan_file_info(src)
    if not offs:
        return True  # empty file: nothing to terminate
    with open(src, "rb") as f:
        for _off, data in iter_block_payloads(f, codec, offs[-1]):
            last = data  # single iteration: offs[-1] is the final block
        return last.endswith(b"\n")


def compact_group(
    plan: CompactionPlan,
    out_path: str,
    newline_fix: bool = True,
    carry_stats: bool = True,
    self_delimiting: bool = False,
) -> dict:
    """Compact one plan into *out_path* (executor-side; pure file I/O).

    ``carry_stats=True`` forwards analyze_stats zone maps WITHOUT
    re-analyzing: raw-copied blocks keep their per-block min/max (the
    entries remap from input to output offsets), and the file tier
    merges the inputs' file stats. Two conservativeness rules for the
    TEXT record model:

    * carried only when EVERY input has a valid (size-matching)
      sidecar — otherwise the output gets none;
    * each input's LAST copied block loses its entry. Concatenation
      moves ownership of the NEXT input's first line into it (the line
      is preceded by the prior input's final byte), so its input-time
      stats would be too NARROW — and narrow stats can wrongly prune.
      Too-wide stats (the next input's block 0 no longer owns its
      first line) are safe and kept.

    ``self_delimiting=True`` (the EB-protobuf model, compact_protobuf):
    records self-delimit via sync markers and ownership is
    marker-start-block, which concatenation cannot move — no record
    ever crosses into another input's block. Both text rules are
    needless there, so EVERY block entry carries and the newline-glue
    check is skipped (it would kill the carry on ~every binary file).
    """
    magic = core.magic_for_codec(plan.codec)
    offsets: list[int] = []
    blocks = 0
    fixes = 0
    metas = (
        {src: _load_zone_sidecar(src) for src in plan.inputs}
        if carry_stats else {}
    )
    carry = bool(metas) and all(m is not None for m in metas.values())
    if carry and not newline_fix and not self_delimiting:
        # with the newline fix OFF, an unterminated non-final input
        # GLUES its last line onto the next input's first — the glued
        # line is owned by the block holding the last terminator, whose
        # carried stats would be too narrow (and narrow stats can
        # wrongly prune). Conservative: carry nothing for such groups.
        if any(
            not _last_block_ends_with_newline(s) for s in plan.inputs[:-1]
        ):
            carry = False
    block_entries: list[dict] = []
    bloom_block_entries: list[dict] = []
    tmp = f"{out_path}.inprogress"
    with open(tmp, "wb") as out_f:
        out_f.write(core.encode_header(magic))
        for src in plan.inputs:
            pairs = _append_raw_blocks(out_f, offsets, src)
            blocks += len(pairs)
            if carry and pairs:
                by_off = {
                    b.get("o"): b.get("c")
                    for b in metas[src].get("blocks") or ()
                }
                bb = metas[src].get("bloom_blocks")
                bloom_by_off = {
                    b.get("o"): b.get("c")
                    for b in (bb or {}).get("blocks") or ()
                } if isinstance(bb, dict) else {}
                # text: drop the seam block (ownership can widen into
                # it); self-delimiting records: every entry stays exact
                kept = pairs if self_delimiting else pairs[:-1]
                for in_off, out_off in kept:
                    c = by_off.get(in_off)
                    if c is not None:
                        block_entries.append({"o": out_off, "c": c})
                    c = bloom_by_off.get(in_off)
                    if c is not None:
                        bloom_block_entries.append({"o": out_off, "c": c})
            if newline_fix and not _last_block_ends_with_newline(src):
                offsets.append(out_f.tell())
                out_f.write(core.encode_block(1, b"\n", compressed=False))
                blocks += 1
                fixes += 1
        out_f.write(core.encode_eos())
        out_f.write(core.encode_footer(magic, offsets))
    os.replace(tmp, out_path)
    if carry:
        _write_carried_sidecar(
            out_path,
            [metas[s] for s in plan.inputs],
            block_entries,
            bloom_block_entries,
        )
    else:
        _drop_stale_sidecar(out_path)
    return {
        "out": out_path,
        "inputs": len(plan.inputs),
        "blocks": blocks,
        "newline_fixes": fixes,
        "stats_carried": carry,
        "bytes": os.path.getsize(out_path),
    }


def _or_bit_positions(bm, positions) -> None:
    """OR bit ``positions`` into little-bit-order bitmap ``bm`` in place.

    The ONE definition of the within-byte bit layout shared by the
    partial-bitmap encoder and the sparse-wire decoder in
    :func:`analyze_bloom` (and matched by the ``unpackbits``
    ``bitorder="little"`` extraction): byte ``p >> 3``, bit ``p & 7``.
    Encoder and decoder drifting apart here would silently corrupt
    every merged bloom sidecar, so neither site may inline its own
    copy."""
    import numpy as np

    np.bitwise_or.at(
        bm, positions >> 3, np.left_shift(1, positions & 7).astype(np.uint8)
    )


def _drop_stale_sidecar(out_path: str) -> None:
    """A rerun into the same out_dir writes deterministic compact-NNNNNN
    names: when the new output carries no stats, a sidecar left by an
    earlier run must not survive next to it — the size check alone
    could accept it if the byte sizes happen to collide."""
    from fourmc_spark.sources.datasource import STATS_SUFFIX

    try:
        os.remove(out_path + STATS_SUFFIX)
    except OSError:
        pass


def _write_carried_sidecar(
    out_path: str,
    metas: list[dict],
    block_entries: list[dict],
    bloom_block_entries: list[dict] | None = None,
) -> None:
    """Merge the inputs' file-tier stats and attach the remapped block
    entries. A column enters the merged file tier only when EVERY input
    records it (a gap would make the merged range too narrow). Block
    BLOOM entries carry only when every input's ``bloom_blocks`` header
    (algo/seed/bits/k/fam) is identical — a geometry or family mismatch
    would probe one input's bitmaps under another's derivation."""
    import json as _json

    from fourmc_spark.sources.datasource import _zone_comparable

    common = set(metas[0].get("columns", {}))
    for m in metas[1:]:
        common &= set(m.get("columns", {}))
    file_cols = {}
    for c in sorted(common):
        stats = [m["columns"][c] for m in metas]
        mns = [s.get("min") for s in stats if s.get("min") is not None]
        mxs = [s.get("max") for s in stats if s.get("max") is not None]
        vals = mns + mxs
        if any(not _zone_comparable(vals[0], v) for v in vals[1:]):
            # inputs analyzed under different DDLs for this column:
            # min()/max() across mixed types would raise, and even a
            # successful mix could understate the range — skip it
            # (conservative: the column never file-prunes)
            continue
        file_cols[c] = {
            "min": _zone_min(mns),
            "max": _zone_max(mxs),
            "nulls": sum(int(s.get("nulls") or 0) for s in stats),
        }
    meta = {
        "version": 2,
        "size": os.path.getsize(out_path),
        "rows": sum(int(m.get("rows") or 0) for m in metas),
        "columns": file_cols,
        "blocks": block_entries,
        "carried": True,
    }
    blooms = _merge_carried_blooms(metas)
    if blooms:
        meta["bloom"] = blooms
    if bloom_block_entries:
        heads = [m.get("bloom_blocks") for m in metas]
        head = heads[0]
        keys = ("algo", "seed", "bits", "k", "fam")
        if (
            isinstance(head, dict)
            # every header field PRESENT (a vacuous None == None match
            # must not reach the seal below and KeyError the task)
            and all(f in head for f in keys)
            and all(
                isinstance(h, dict)
                and all(h.get(f) == head.get(f) for f in keys)
                for h in heads
            )
        ):
            meta["bloom_blocks"] = dict(
                {f: head[f] for f in keys}, blocks=bloom_block_entries
            )
    from fourmc_spark.sources.datasource import STATS_SUFFIX

    tmp = out_path + STATS_SUFFIX + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    os.replace(tmp, out_path + STATS_SUFFIX)


def _merge_carried_blooms(metas: list[dict]) -> dict:
    """Bloom carry across compaction: the output file's value set is the
    UNION of its inputs', and a bloom of a union is the bitwise OR of
    the blooms — exact, no re-hash. A column carries only when EVERY
    input has a bloom for it under the IDENTICAL contract (algo, seed,
    bits, k, bitmap length); any gap or mismatch drops that column
    (conservative: it simply never bloom-prunes). Seam-block text
    ownership shifts are irrelevant here — the OR covers every input
    row, and extra coverage only adds false positives, never false
    absence."""
    import base64 as _b64

    all_blooms = [m.get("bloom") for m in metas]
    if not all(isinstance(b, dict) for b in all_blooms):
        common = set()
    else:
        common = set(all_blooms[0])
        for b in all_blooms[1:]:
            common &= set(b)
    merged = {}
    for c in sorted(common):
        specs = [b[c] for b in all_blooms]
        head = specs[0]
        if not all(
            isinstance(s, dict)
            and s.get("algo") == head.get("algo")
            and s.get("seed") == head.get("seed")
            and s.get("bits") == head.get("bits")
            and s.get("k") == head.get("k")
            and s.get("fam") == head.get("fam")
            for s in specs
        ):
            continue
        try:
            bms = [_b64.b64decode(s["b64"], validate=True) for s in specs]
        except (KeyError, TypeError, ValueError):
            continue
        if any(len(bm) != len(bms[0]) for bm in bms):
            continue
        acc = 0  # big-int OR: C-speed regardless of bitmap size
        for bm in bms:
            acc |= int.from_bytes(bm, "little")
        merged[c] = dict(
            head,
            b64=_b64.b64encode(
                acc.to_bytes(len(bms[0]), "little")
            ).decode("ascii"),
        )
    return merged


def _recompress_group(
    plan: CompactionPlan,
    out_path: str,
    codec: str,
    level,
    workers: int,
    newline_fix: bool = True,
) -> dict:
    """Decompress-and-reseal fallback for codec conversion. Re-blocks at
    the 4 MiB bound, so many tiny input blocks also coalesce. Applies
    the same text terminator fix as the raw-copy path."""
    tmp = f"{out_path}.inprogress"
    fixes = 0
    with open(tmp, "wb") as out_f:
        w = FourMcWriter(out_f, codec=codec, level=level, workers=workers)
        for src in plan.inputs:
            in_codec, _size, _offs = scan_file_info(src)
            last = b"\n"
            with open(src, "rb") as f:
                for _off, data in iter_block_payloads(f, in_codec):
                    w.write(data)
                    if data:
                        last = data
            if newline_fix and not last.endswith(b"\n"):
                w.write(b"\n")
                fixes += 1
        w.close()
    os.replace(tmp, out_path)
    _drop_stale_sidecar(out_path)  # recompression invalidates zone maps
    return {
        "out": out_path,
        "inputs": len(plan.inputs),
        "blocks": None,
        "newline_fixes": fixes,
        "bytes": os.path.getsize(out_path),
    }


def compact_blocks(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    newline_fix: bool = True,
    codec: str | None = None,
    level="medium",
    carry_stats: bool = True,
    self_delimiting: bool = False,
) -> dict:
    """Compact a tree of sealed 4mc/4mz files into *out_dir* by raw
    block copy (no recompression). Hive subdirectories are mirrored
    (bins never cross a directory, see ``plan_compaction``), so
    ``key=value/`` partition values survive. Passing ``codec=`` ALWAYS
    forces the decompress-and-reseal conversion — including when it
    equals the inputs' codec, which is how you re-level or coalesce
    many tiny blocks into full 4 MiB ones. Non-block containers under
    the tree (.zst, Hadoop ``.lz4_*``/``.zstd_*``) carry no footer
    index and are skipped, reported under ``"skipped"`` (convert them
    with ``compact``/the CLI). One Spark task per output file; the
    driver only plans (footer preads) and never touches block data.
    See the module docstring for the text/protobuf semantics."""
    in_real = os.path.realpath(in_dir)
    if os.path.realpath(out_dir) == in_real:
        raise ValueError(
            "compact_blocks writes a NEW tree: out_dir must differ from "
            "in_dir (in-place compaction under a live stream would "
            "violate the orderednames contract)"
        )
    plans = plan_compaction(in_dir, target_bytes)
    _ok, skipped = _split_compactable(in_dir)
    os.makedirs(out_dir, exist_ok=True)
    target_codec = normalize_codec(codec) if codec else None
    jobs = []
    for i, p in enumerate(plans):
        out_codec = target_codec or p.codec
        ext = core.extension_for_codec(out_codec)
        d = os.path.join(out_dir, p.reldir) if p.reldir else out_dir
        os.makedirs(d, exist_ok=True)
        out_path = os.path.join(d, f"compact-{i:06d}{ext}")
        jobs.append((p, out_path, out_codec))
    sc = spark.sparkContext
    reseal = target_codec is not None

    def _run(job):
        p, out_path, out_codec = job
        if not reseal and out_codec == p.codec:
            return compact_group(
                p, out_path, newline_fix=newline_fix,
                carry_stats=carry_stats, self_delimiting=self_delimiting,
            )
        return _recompress_group(
            p, out_path, out_codec, level, workers=1,
            newline_fix=newline_fix,
        )

    results = (
        sc.parallelize(jobs, max(1, len(jobs))).map(_run).collect()
        if jobs else []
    )
    return {
        "inputs": sum(r["inputs"] for r in results),
        "outputs": len(results),
        "bytes": sum(r["bytes"] for r in results),
        "newline_fixes": sum(r["newline_fixes"] for r in results),
        "stats_carried": sum(1 for r in results if r.get("stats_carried")),
        "skipped": skipped,
        "files": results,
    }


def compact_protobuf(spark: SparkSession, in_dir: str, out_dir: str, **kw) -> dict:
    """Protobuf twin of ``compact_blocks``: EB records self-delimit, so
    no newline fix, and zone maps carry EXACTLY (every block entry —
    sync-marker ownership is concatenation-invariant, no seam drops);
    otherwise identical raw block copy."""
    kw.setdefault("newline_fix", False)
    kw.setdefault("self_delimiting", True)
    return compact_blocks(spark, in_dir, out_dir, **kw)


def analyze_stats_proto(
    spark: SparkSession,
    path: str,
    fields=None,
    columns: list[str] | None = None,
    blocks: bool = True,
    split_bytes: int = 256 << 20,
    bloom_columns: list[str] | None = None,
    bloom_bits: int = 1 << 20,
    bloom_k: int = 7,
    bloom_block_bits: int | None = None,
    bloom_block_k: int | None = None,
) -> dict:
    """ANALYZE twin of :func:`analyze_stats` for ElephantBird-protobuf
    4mc/4mz trees (the ``fourmcproto`` source): one pass per file
    computes the two-tier zone map — per-FILE and per-BLOCK row count +
    min/max/null-count per scalar field — and writes the same
    ``<file>.stats.json`` sidecar the typed scans prune against.

    ``bloom_columns`` additionally seals a per-file bloom bitmap per
    named int/string field IN THE SAME DECODE PASS (no second read):
    each non-null value hashes through the shared contract
    (xxh64(str(value)) seed 42 — identical bytes to the NDJSON tier's
    JVM ``CAST AS STRING`` path) into ``bloom_bits``/``bloom_k``
    positions; the ``fourmcproto`` reader probes EqualTo/In point
    predicates against them at planning time, pruning point lookups on
    unclustered fields the zone tier cannot touch. Range merges union
    the position sets (exact — same rows, same hashes).
    ``bloom_block_bits`` additionally seals the per-BLOCK bloom tier
    (keyed by the sync-marker-owner block offset — the same ownership
    rule the proto split reader enforces), so point probes inside kept
    files scan only the blocks that may hold the value.

    The block key is the compressed offset of the block in which each
    EB record's sync marker starts — exactly the ownership rule the
    proto split reader enforces (format/protobuf.py:
    iter_eb_records_for_split), so dropping a block removes precisely
    the records its stats speak for. bool/bytes/repeated fields are
    skipped (no shared ordering with the JSON sidecar primitives);
    float/double spans containing NaN record max=NaN (Spark orders NaN
    above every double — such spans never prune, conservatively).

    100 TB shape: files at or under ``split_bytes`` are one task each,
    footer read EXECUTOR-side (the driver pays no per-file pread — a
    100 TB tree of sealed 128-256 MB files is ~500k independent tasks
    planned from the listing alone); files LARGER than ``split_bytes``
    split into block-aligned ranges, each closing at the first block
    boundary at or past ``split_bytes`` (so a range overshoots by at
    most one block). Per-file block stats merge executor-side via
    reduceByKey (block keys are disjoint across ranges by the
    ownership rule) and the reducer task writes the sidecar; the
    driver sees one summary row per file."""
    import json as _json
    import math

    from fourmc_spark.format.protobuf import (
        USER_SCHEMA, bloom_eligible_fields, zone_eligible_fields,
    )
    from fourmc_spark.sources.datasource import STATS_SUFFIX, _list_files

    schema = tuple(fields) if fields else USER_SCHEMA
    eligible = zone_eligible_fields(schema)
    cols = [c for c in (columns or eligible) if c in eligible]
    if not cols:
        raise ValueError(
            "analyze_stats_proto: no scalar orderable fields to analyze"
        )
    floats = {
        f.name for f in schema if f.type in ("double", "float")
    }
    unknown = [c for c in (columns or ()) if c not in eligible]
    if unknown:
        raise ValueError(
            f"analyze_stats_proto: columns {unknown!r} are not scalar "
            f"orderable fields of the schema (eligible: {eligible})"
        )
    bl_cols = list(bloom_columns or [])
    bl_fams: dict[str, str] = {}
    bk = bloom_block_k if bloom_block_k is not None else bloom_k
    if bloom_block_bits is not None and not bl_cols:
        raise ValueError(
            "analyze_stats_proto: bloom_block_bits requires bloom_columns"
        )
    if bl_cols:
        from fourmc_spark.sources.datasource import validate_bloom_geometry

        validate_bloom_geometry(bloom_bits, bloom_k, "analyze_stats_proto")
        if bloom_block_bits is not None:
            validate_bloom_geometry(
                bloom_block_bits, bk, "analyze_stats_proto (block tier)",
                max_bits=1 << 24,
            )
        bl_eligible = bloom_eligible_fields(schema)
        for c in bl_cols:
            if c not in bl_eligible:
                raise ValueError(
                    f"analyze_stats_proto: field {c!r} is not bloom-eligible"
                    " (scalar int32/int64/string only)"
                )
            bl_fams[c] = bl_eligible[c]
    files = [
        p for p in _list_files(path)
        if p.endswith((".4mc", ".4mz")) and not p.endswith(STATS_SUFFIX)
    ]
    if not files:
        return {"files": 0, "rows": 0, "columns": cols,
                "block_stats": blocks}
    want_blocks = blocks

    def _range_stats(task) -> tuple:
        """(file, (per-block stats, bloom position sets)) for one
        block-aligned range — per-block ownership is the marker-start
        block, so ranges never share a block key; bloom sets union
        exactly across ranges."""
        fpath, codec, start, end = task

        from fourmc_spark.format.native import xxh64
        from fourmc_spark.format.protobuf import iter_eb_records_for_split
        from fourmc_spark.sources.datasource import BLOOM_SEED, bloom_positions

        if codec is None:  # whole file: resolve the footer executor-side
            from fourmc_spark.format.reader import scan_file_info

            codec, end, _offs = scan_file_info(fpath)
        per_block: dict[int, dict] = {}
        bl: dict[str, set] = {c: set() for c in bl_cols}
        bl_blocks: dict[int, dict[str, set]] = {}
        if start >= end:
            return fpath, (per_block, bl, bl_blocks)
        with open(fpath, "rb") as f:
            for owner, rec in iter_eb_records_for_split(
                f, codec, start, end, schema
            ):
                b = per_block.get(owner)
                if b is None:
                    b = per_block[owner] = {
                        "rows": 0,
                        "c": {c: [None, None, 0, False] for c in cols},
                    }
                    if bloom_block_bits is not None:
                        bl_blocks[owner] = {c: set() for c in bl_cols}
                b["rows"] += 1
                for c in cols:
                    v = rec.get(c)
                    st = b["c"][c]
                    if v is None:
                        st[2] += 1
                        continue
                    if c in floats:
                        v = float(v)
                        if math.isnan(v):
                            st[3] = True
                            continue
                    if st[0] is None or v < st[0]:
                        st[0] = v
                    if st[1] is None or v > st[1]:
                        st[1] = v
                for c in bl_cols:
                    v = rec.get(c)
                    if v is None:
                        continue
                    h = xxh64(str(v).encode("utf-8"), BLOOM_SEED)
                    bl[c].update(bloom_positions(h, bloom_k, bloom_bits))
                    if bloom_block_bits is not None:
                        bl_blocks[owner][c].update(
                            bloom_positions(h, bk, bloom_block_bits)
                        )
        return fpath, (per_block, bl, bl_blocks)

    def _merge_pb(a: tuple, b: tuple) -> tuple:
        a[0].update(b[0])  # block keys disjoint across ranges
        for c, s in b[1].items():
            a[1][c] |= s  # bloom positions union exactly
        a[2].update(b[2])  # block-bloom keys disjoint too
        return a

    def _finalize(kv) -> dict:
        fpath, (per_block, bl, bl_blocks) = kv
        import os as _os

        def _mnmx(st):
            mn, mx = st[0], st[1]
            if st[3]:  # NaN present: Spark's greatest double
                mx = float("nan")
                if mn is None:
                    mn = float("nan")
            return mn, mx

        file_cols = {}
        for c in cols:
            mns, mxs, nulls = [], [], 0
            for b in per_block.values():
                mn, mx = _mnmx(b["c"][c])
                if mn is not None:
                    mns.append(mn)
                if mx is not None:
                    mxs.append(mx)
                nulls += b["c"][c][2]
            file_cols[c] = {
                "min": _zone_min(mns), "max": _zone_max(mxs),
                "nulls": nulls,
            }
        rows = sum(b["rows"] for b in per_block.values())
        meta = {
            "version": 2,
            "size": _os.path.getsize(fpath),
            "rows": rows,
            "columns": file_cols,
        }
        if bl_cols:
            import base64 as _b64

            from fourmc_spark.sources.datasource import (
                seal_bloom_blocks_header, seal_bloom_spec,
            )

            def _bitset(positions, n_bits: int) -> bytes:
                bm = bytearray(n_bits // 8)
                for p in positions:
                    bm[p >> 3] |= 1 << (p & 7)
                return bytes(bm)

            meta["bloom"] = {
                c: seal_bloom_spec(
                    _bitset(bl[c], bloom_bits), bloom_bits, bloom_k,
                    bl_fams[c],
                )
                for c in bl_cols
            }
            if bloom_block_bits is not None:
                entries = [
                    {
                        "o": o,
                        "c": {
                            c: _b64.b64encode(
                                _bitset(bl_blocks[o][c], bloom_block_bits)
                            ).decode("ascii")
                            for c in bl_cols
                        },
                    }
                    for o in sorted(bl_blocks)
                ]
                meta["bloom_blocks"] = seal_bloom_blocks_header(
                    bloom_block_bits, bk, bl_fams, entries
                )
        if want_blocks:
            meta["blocks"] = [
                {
                    "o": o,
                    "c": {
                        c: list(_mnmx(b["c"][c])) + [b["c"][c][2]]
                        for c in cols
                    },
                }
                for o, b in sorted(per_block.items())
            ]
        tmp = fpath + STATS_SUFFIX + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(meta, f)
        _os.replace(tmp, fpath + STATS_SUFFIX)
        return {"file": fpath, "rows": rows, "n_blocks": len(per_block)}

    # plan tasks: files at or under split_bytes (the common sealed-log
    # case) are one whole-file task each whose footer is read
    # EXECUTOR-side — the driver pays only the os.stat the listing
    # already did, never 500k serial footer preads; only files LARGER
    # than split_bytes get a driver-side footer read to plan
    # block-aligned ranges (codec None = resolve executor-side)
    from fourmc_spark.format.reader import scan_file_info

    tasks: list[tuple] = []
    for fpath in files:
        if os.path.getsize(fpath) <= split_bytes:
            tasks.append((fpath, None, 0, -1))  # whole file
            continue
        codec, fsize, offsets = scan_file_info(fpath)
        if not offsets:
            tasks.append((fpath, codec, 0, 0))  # empty: rows-0 sidecar
            continue
        i, n = 0, len(offsets)
        while i < n:
            j = i + 1
            while j < n and offsets[j] - offsets[i] < split_bytes:
                j += 1
            tasks.append(
                (fpath, codec, offsets[i], offsets[j] if j < n else fsize)
            )
            i = j
    sc = spark.sparkContext
    summaries = (
        sc.parallelize(tasks, len(tasks))
        .map(_range_stats)
        .reduceByKey(_merge_pb)
        .map(_finalize)
        .collect()
    )
    return {
        "files": len(summaries),
        "rows": sum(r["rows"] for r in summaries),
        "columns": cols,
        "block_stats": blocks,
        "bloom_columns": bl_cols,
        "tasks": len(tasks),
    }


def _zone_min(vals):
    """min over stat values with Spark's NaN ordering (NaN greatest):
    NaN contributes to min only when EVERY value is NaN. Python's bare
    min/max are order-dependent with NaN ([nan,1]→nan but [1,nan]→1),
    which could record a max below a real NaN row — a conservativeness
    violation for x >= k predicates."""
    import math

    if not vals:
        return None
    real = [v for v in vals
            if not (isinstance(v, float) and math.isnan(v))]
    return min(real) if real else float("nan")


def _zone_max(vals):
    """max over stat values with Spark's NaN ordering (NaN greatest)."""
    import math

    if not vals:
        return None
    if any(isinstance(v, float) and math.isnan(v) for v in vals):
        return float("nan")
    return max(vals)


def _json_stat_value(v):
    import datetime
    import decimal

    import pandas as pd

    if v is None:
        return None
    if not isinstance(v, (str, bytes, list, dict)) and pd.isna(v):
        return None  # NaN/NaT from an all-null span
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if type(v).__module__ == "numpy":
        return v.item()
    return v


def _analyze_src(
    spark: SparkSession, path: str, schema_ddl: str, record_format: str
) -> DataFrame:
    """The ``(_file, offset, _r struct)`` source the ANALYZE passes
    aggregate over. NDJSON parses JVM-side with from_json (pinned equal
    to the jsonschema scan row for row); CSV reads THROUGH the typed
    scan itself (``csvschema`` + ``withoffset`` provenance), so sidecar
    stats and bloom hashes are built from exactly the values the scan
    yields — from_csv's unquoted-escape divergence from Arrow's CSV
    parse can therefore never poison pruning (the sidecars and their
    only consumer always agree). Consequence: a CSV DDL may not declare
    fields named ``offset``/``_file`` (the provenance pseudo-columns) —
    such data stays in value mode."""
    if record_format == "json":
        return (
            spark.read.format("fourmc")
            .option("withfilename", "true")
            .load(path)
            .select(
                "_file", "offset", F.from_json("value", schema_ddl).alias("_r")
            )
        )
    if record_format == "csv":
        from fourmc_spark.sources.datasource import _parse_flat_ddl

        cols = [f.name for f in _parse_flat_ddl(schema_ddl).fields]
        return (
            spark.read.format("fourmc")
            .option("csvschema", schema_ddl)
            .option("withoffset", "true")
            .option("withfilename", "true")
            .load(path)
            .select("_file", "offset", F.struct(*cols).alias("_r"))
        )
    raise ValueError(
        f"record_format must be 'json' or 'csv', got {record_format!r}"
    )


def analyze_stats(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    columns: list[str] | None = None,
    blocks: bool = True,
    record_format: str = "json",
) -> dict:
    """ANALYZE for NDJSON (or, with ``record_format='csv'``, CSV-line)
    4mc/4mz trees: one distributed scan computes a TWO-TIER zone map —
    per-FILE and (``blocks=True``) per-BLOCK row count +
    min/max/null-count per column — and writes it to a
    ``<file>.stats.json`` sidecar next to each data file.

    The typed scan (``jsonschema`` option, sources/datasource.py) then
    prunes whole files whose [min, max] provably excludes a pushed
    predicate, and within kept files skips the non-matching BLOCKS —
    the Iceberg-manifest + parquet-row-group economics for data whose
    natural clustering (time-ordered ingest, range-compacted output)
    makes ranges narrow. The block key is the compressed block offset
    the scan's ``offset`` column already exposes, so block stats group
    lines exactly by the ownership rule the split reader enforces.

    Safety: sidecars record the data file's byte size; the reader
    ignores a sidecar whose size mismatches (stale after rewrite), and
    Spark re-applies every filter post-scan, so pruning can only remove
    provably-empty work. 100 TB shape: stats aggregate distributed
    (one shuffle keyed by (file, block)); sidecars are WRITTEN
    EXECUTOR-SIDE (applyInPandas per file), so the driver materializes
    only one summary row per file — the O(files) it already pays to
    plan splits.
    """
    import json as _json

    import pandas as pd
    from pyspark.sql import types as T

    from fourmc_spark.sources.datasource import STATS_SUFFIX, _parse_flat_ddl

    st = _parse_flat_ddl(schema_ddl)  # same surface the typed scan takes
    cols = list(columns) if columns else [f.name for f in st.fields]
    if "_file" in cols:
        raise ValueError(
            "analyze_stats: '_file' is the scan's provenance column and "
            "cannot also be a payload column"
        )
    types = {f.name: f.dataType for f in st.fields}
    # integral min/max travel as STRINGS through the pandas boundary:
    # Arrow->pandas turns int64-with-nulls into float64, which silently
    # rounds values above 2^53 — a zone map rounded DOWN can wrongly
    # prune a file holding the true max (conservativeness violation)
    integral = {
        c for c in cols
        if isinstance(types.get(c), (T.LongType, T.IntegerType, T.ShortType))
    }
    # instant-typed (TimestampType) stats are recorded as EPOCH MICROS
    # via unix_micros — computed JVM-side from the internal UTC instant,
    # so the sidecar value is session-timezone-free and directly
    # comparable against the micros the pushdown canonicalizes aware
    # filter values to. (TimestampNTZ and date have no instant — their
    # wall-clock ISO strings through the pandas boundary are already
    # unambiguous, and _zone_pair parses them before comparing.)
    ts_cols = {
        c for c in cols if isinstance(types.get(c), T.TimestampType)
    }
    # float/double min/max ALSO travel as strings: Spark's SQL ordering
    # puts NaN above every double (x >= 0 MATCHES a NaN row), but a NaN
    # min/max through the pandas boundary is indistinguishable from
    # null — which the reader treats as "no values: prune everything".
    # The string "NaN" survives the boundary and decodes to float nan,
    # whose comparisons are all false — such spans never prune.
    floats = {
        c for c in cols
        if isinstance(types.get(c), (T.DoubleType, T.FloatType))
    }
    # the payload struct stays NESTED: expanding _r.* would collide
    # with the scan's _file/offset pseudo-columns when the (JSON) DDL
    # legally declares fields with those names
    src = _analyze_src(spark, path, schema_ddl, record_format)
    aggs = [F.count(F.lit(1)).cast("long").alias("__rows")]
    for i, c in enumerate(cols):
        fc = F.col("_r").getField(c)
        mn, mx = F.min(fc), F.max(fc)
        if c in ts_cols:
            mn, mx = F.unix_micros(mn), F.unix_micros(mx)
        if c in floats:
            # widen float32 BEFORE the string cast: CAST(0.1f AS STRING)
            # is the float32 shortest repr "0.1", which reparses to a
            # double just BELOW the widened float value 0.100000001...
            # — a bound sitting under the true max wrongly prunes.
            # Doubles round-trip through their own shortest repr.
            mn, mx = mn.cast("double"), mx.cast("double")
        if c in integral or c in ts_cols or c in floats:
            mn, mx = mn.cast("string"), mx.cast("string")
        aggs.append(mn.alias(f"__min_{i}"))
        aggs.append(mx.alias(f"__max_{i}"))
        aggs.append(
            F.sum(F.when(fc.isNull(), 1).otherwise(0))
            .cast("long").alias(f"__nulls_{i}")
        )
    per_block = src.groupBy("_file", "offset").agg(*aggs)
    want_blocks = blocks

    def _decode(c: str, i: int, v):
        v = _json_stat_value(v)
        if v is not None:
            if c in integral or c in ts_cols:
                v = int(v)
            elif c in floats:
                v = float(v)  # parses "NaN"/"Infinity"/"-Infinity" too
        return v

    def _write_sidecar(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        fpath = key[0]
        pdf = pdf.sort_values("offset")
        file_cols = {}
        for i, c in enumerate(cols):
            mns = [x for x in (_decode(c, i, v) for v in pdf[f"__min_{i}"])
                   if x is not None]
            mxs = [x for x in (_decode(c, i, v) for v in pdf[f"__max_{i}"])
                   if x is not None]
            file_cols[c] = {
                "min": _zone_min(mns),
                "max": _zone_max(mxs),
                "nulls": int(pdf[f"__nulls_{i}"].sum()),
            }
        meta = {
            "version": 2,
            "size": os.path.getsize(fpath),
            "rows": int(pdf["__rows"].sum()),
            "columns": file_cols,
        }
        # bloom tiers sealed by analyze_bloom for the SAME bytes stay
        # valid — re-ANALYZE of min/max must not drop either of them
        try:
            with open(fpath + STATS_SUFFIX) as f:
                old = _json.load(f)
            if old.get("size") == meta["size"]:
                if isinstance(old.get("bloom"), dict):
                    meta["bloom"] = old["bloom"]
                if isinstance(old.get("bloom_blocks"), dict):
                    meta["bloom_blocks"] = old["bloom_blocks"]
        except (OSError, ValueError):
            pass
        if want_blocks:
            meta["blocks"] = [
                {
                    "o": int(r["offset"]),
                    "c": {
                        c: [
                            _decode(c, i, r[f"__min_{i}"]),
                            _decode(c, i, r[f"__max_{i}"]),
                            int(r[f"__nulls_{i}"]),
                        ]
                        for i, c in enumerate(cols)
                    },
                }
                for _, r in pdf.iterrows()
            ]
        tmp = fpath + STATS_SUFFIX + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(meta, f)
        os.replace(tmp, fpath + STATS_SUFFIX)
        return pd.DataFrame(
            {"file": [fpath], "rows": [int(pdf["__rows"].sum())],
             "n_blocks": [len(pdf)]}
        )

    summaries = (
        per_block.groupBy("_file")
        .applyInPandas(_write_sidecar, "file string, rows long, n_blocks long")
        .collect()
    )
    return {
        "files": len(summaries),
        "rows": sum(r["rows"] for r in summaries),
        "columns": cols,
        "block_stats": blocks,
    }


_BLOOM_ELIGIBLE = "long/int/short/string"


def analyze_bloom(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    columns: list[str],
    bits: int = 1 << 20,
    k: int = 7,
    block_bits: int | None = None,
    block_k: int | None = None,
    record_format: str = "json",
) -> dict:
    """ANALYZE ... FOR BLOOM: per-FILE bloom filters for point-predicate
    pruning on columns zone maps cannot help with — plus an optional
    per-BLOCK tier (``block_bits``) so a point probe inside a KEPT file
    scans only the blocks that may hold the value.
    ``record_format='csv'`` analyzes CSV-line trees (the ``csvschema``
    typed scan) instead of NDJSON.

    Zone maps (analyze_stats) prune by [min, max] — decisive on the
    natural clustering key (time, monotonic ids) and useless on
    everything else: a point lookup ``doc_id = X`` against a
    time-ordered log overlaps every file's id range, so min/max keeps
    them all. This pass amends each file's ``.stats.json`` sidecar with
    a bloom bitmap per requested column; the typed scan's planner then
    drops every file whose bloom proves all probed values absent
    (EqualTo / In pushdown, sources/datasource.py). False positives
    only cost a scan Spark's re-applied filters empty out; false
    negatives are impossible for the values the file actually holds.

    Hashing happens JVM-SIDE (``F.xxhash64`` on ``CAST(col AS
    STRING)``, verified bit-identical to libxxhash XXH64 seed 42 in
    tests/test_native.py), so the analyze pass runs at scan speed; the
    planner reproduces the hash in Python (format/native.xxh64) per
    probed value — O(k) bit tests per (file, value), no data I/O.

    Eligibility is long/int/short/string columns: their CAST AS STRING
    is the same canonical text Python's ``str()`` produces, so build
    and probe agree exactly. Floats/timestamps are refused (equality
    semantics on those are hazard-prone; ranges already have zone
    maps).

    100 TB shape: one distributed scan and ONE exchange; each scan
    partition folds its rows into per-(file, column, block) partials
    locally (bitmaps are OR-mergeable) and ships each in whichever
    encoding is smaller — dense bitmap or sparse sorted set-position
    list — so the shuffle carries, per scan SPLIT, columns × (1 +
    blocks-in-split) rows of min(``bits``/8, 4 × distinct-positions)
    bytes, regardless of row count: never more than the deduplicated
    position rows a low-NDV split would have shipped, and capped at
    the bitmap size for high-NDV splits. Sidecars are amended
    EXECUTOR-SIDE (applyInPandas per file, OR-merging the partials);
    the driver sees one summary row per file. Sizing: false-positive rate ≈ (1 - e^(-k·n/bits))^k
    for n distinct values per span; the 2^20-bit file default (128 KiB
    bitmap) holds ~100k NDV per file at ~1%; size ``block_bits`` for
    the ~4 MiB-block NDV (the 2^13 suggestion = 1 KiB per (block, col)
    in the sidecar). The block tier is the within-file complement: a
    kept 256 MB file (≈64 blocks) scans only the blocks whose bitmap
    may hold the probe — parquet-page economics for point lookups on
    ANY layout, clustered or not. Compaction OR-merges carried file
    blooms (union of inputs = bitwise OR, exact) and carries block
    blooms by offset remap with the same seam rule as zone maps, so
    steady-state needs no re-ANALYZE.
    """
    import json as _json

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from fourmc_spark.sources.datasource import (
        STATS_SUFFIX, _parse_flat_ddl, seal_bloom_spec,
    )

    from fourmc_spark.sources.datasource import validate_bloom_geometry

    validate_bloom_geometry(bits, k, "analyze_bloom")
    bk = block_k if block_k is not None else k
    if block_bits is not None:
        validate_bloom_geometry(
            block_bits, bk, "analyze_bloom (block tier)", max_bits=1 << 24
        )
    st = _parse_flat_ddl(schema_ddl)
    types = {f.name: f.dataType for f in st.fields}
    cols = list(columns)
    if not cols:
        raise ValueError("analyze_bloom: at least one column required")
    for c in cols:
        if c not in types:
            raise ValueError(f"analyze_bloom: column {c!r} not in schema")
        if not isinstance(
            types[c],
            (T.LongType, T.IntegerType, T.ShortType, T.StringType),
        ):
            raise ValueError(
                f"analyze_bloom: column {c!r} has type {types[c].simpleString()};"
                f" only {_BLOOM_ELIGIBLE} columns are bloom-eligible"
                " (their CAST AS STRING matches the probe's str())"
            )
    fams = {
        c: "str" if isinstance(types[c], T.StringType) else "int"
        for c in cols
    }

    src = _analyze_src(spark, path, schema_ddl, record_format)
    # one pass: every row fans out to k (column, block, bit-position)
    # structs per non-null bloom column — block -1 is the file tier, the
    # owning block's compressed offset keys the block tier — flattened
    # into a single explode
    def _pos_fn(c, h1, h2, n_bits, block_expr):
        def inner(i):
            return F.struct(
                F.lit(c).alias("col_name"),
                block_expr.alias("block"),
                F.pmod(h1 + i.cast("long") * h2, F.lit(n_bits))
                .cast("int")
                .alias("pos"),
            )

        return inner

    per_col = []
    for c in cols:
        fc = F.col("_r").getField(c)
        h = F.xxhash64(fc.cast("string"))  # Spark's fixed seed 42
        h1 = h.bitwiseAND(F.lit(4294967295))
        h2 = F.shiftrightunsigned(h, 32).bitwiseOR(F.lit(1))
        tiers = [(k, bits, F.lit(-1).cast("long"))]
        if block_bits is not None:
            tiers.append((bk, block_bits, F.col("offset")))
        for t_k, t_bits, block_expr in tiers:
            positions = F.transform(
                F.sequence(F.lit(0), F.lit(t_k - 1)),
                _pos_fn(c, h1, h2, t_bits, block_expr),
            )
            # NULL values never match equality: rows where the column is
            # null contribute nothing (NULL arrays filtered pre-flatten)
            per_col.append(F.when(fc.isNotNull(), positions))
    # a SEED struct rides every row's fan-out so each (file, block) seen
    # by the scan reaches the group output even when its bloom columns
    # are ALL NULL there (those bitmaps must seal EMPTY — all-zero
    # prunes every probe, which is exact: equality never matches NULL).
    # Inlining it keeps the pass to ONE scan; map-side partial dedup
    # collapses the per-row copies before the shuffle.
    seed_struct = F.array(
        F.struct(
            F.lit(None).cast("string").alias("col_name"),
            F.col("offset").alias("block"),
            F.lit(None).cast("int").alias("pos"),
        )
    )
    flat = F.flatten(
        F.filter(F.array(*per_col, seed_struct), lambda x: x.isNotNull())
    )
    all_rows = (
        src.select("_file", F.explode(flat).alias("e"))
        .select(
            "_file",
            F.col("e.col_name").alias("col_name"),
            F.col("e.block").alias("block"),
            F.col("e.pos").alias("pos"),
        )
    )

    # PARTIAL BITMAP AGGREGATION before the pass's only exchange (r10
    # optimization, guide §2.3/§2.4): bloom bitmaps are mergeable by
    # bitwise OR, so each scan partition folds its position rows into
    # per-(file, column, block) partials locally and ships THOSE. Each
    # partial is emitted in whichever encoding is smaller — the DENSE
    # ``n_bits``/8-byte bitmap, or the SPARSE sorted uint32 list of its
    # set positions — so the shuffle carries, per scan split, at most
    # splits-in-file × columns × (1 + blocks) rows of
    # min(n_bits/8, 4 × set-positions) bytes: never worse than the old
    # deduplicated position rows (sparse = exactly those, binary-packed)
    # AND capped at the bitmap size for high-NDV splits. This replaces
    # the former exact ``dropDuplicates``, whose reduce-side Exchange +
    # final aggregate only removed duplicates the bitmap OR makes
    # redundant anyway (a duplicate position sets the same bit). Seed
    # rows (``col_name`` NULL) survive as payload-less rows so every
    # (file, block) the scan saw still reaches its group even when its
    # bloom columns are all NULL there.

    def _partial(
        it: "Iterator[pd.DataFrame]",
    ) -> "Iterator[pd.DataFrame]":
        # per-byte popcount table (built once per task, 256 entries):
        # lets the flush below count set bits without unpacking bitmaps
        _POPCNT8 = (
            np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1)
            .sum(axis=1)
            .astype(np.uint16)
        )
        acc: dict[tuple, "np.ndarray"] = {}
        seeds: set[tuple] = set()
        for pdf in it:
            seed_mask = pdf["col_name"].isna()
            for fp, blk in zip(
                pdf["_file"][seed_mask], pdf["block"][seed_mask]
            ):
                seeds.add((fp, int(blk)))
            data = pdf[~seed_mask]
            for (fp, cname, blk), sub in data.groupby(
                ["_file", "col_name", "block"], sort=False
            ):
                n_bits = bits if blk == -1 else block_bits
                key = (fp, cname, int(blk))
                bm = acc.get(key)
                if bm is None:
                    bm = acc[key] = np.zeros(n_bits // 8, dtype=np.uint8)
                p = sub["pos"].to_numpy(dtype=np.int64)
                _or_bit_positions(bm, p)
        files, names, blks, bms, dense = [], [], [], [], []
        for (fp, cname, blk), bm in acc.items():
            # popcount FIRST (256-entry table) to pick the encoding:
            # unpackbits materializes 8x the bitmap (a transient ~128 MB
            # at the max 2^27-bit geometry) and is only needed when the
            # sparse branch actually wins (ADVICE r10)
            n_set = int(_POPCNT8[bm].sum())
            files.append(fp)
            names.append(cname)
            blks.append(blk)
            if 4 * n_set < len(bm):
                set_pos = np.flatnonzero(
                    np.unpackbits(bm, bitorder="little")
                )
                bms.append(set_pos.astype("<u4").tobytes())
                dense.append(False)
            else:
                bms.append(bm.tobytes())
                dense.append(True)
        for fp, blk in seeds:
            files.append(fp)
            names.append(None)
            blks.append(blk)
            bms.append(None)
            dense.append(True)
        yield pd.DataFrame(
            {
                "_file": pd.Series(files, dtype="object"),
                "col_name": pd.Series(names, dtype="object"),
                "block": pd.Series(blks, dtype="int64"),
                "bm": pd.Series(bms, dtype="object"),
                "dense": pd.Series(dense, dtype="bool"),
            }
        )

    partials = all_rows.mapInPandas(
        _partial,
        "_file string, col_name string, block long, bm binary, dense boolean",
    )

    def _amend(key: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
        fpath = key[0]
        meta = None
        try:
            with open(fpath + STATS_SUFFIX) as f:
                meta = _json.load(f)
            if meta.get("size") != os.path.getsize(fpath):
                meta = None  # stale: data rewritten after the last ANALYZE
        except (OSError, ValueError):
            meta = None
        if meta is None:
            meta = {"version": 2, "size": os.path.getsize(fpath)}
        import base64 as _b64

        def _merge(sub: "pd.DataFrame", n_bits: int) -> "np.ndarray":
            bm = np.zeros(n_bits // 8, dtype=np.uint8)
            for part, is_dense in zip(sub["bm"], sub["dense"]):
                if part is None:
                    continue
                if is_dense:
                    bm |= np.frombuffer(part, dtype=np.uint8)
                else:
                    p = np.frombuffer(part, dtype="<u4").astype(np.int64)
                    _or_bit_positions(bm, p)
            return bm

        blooms = meta.setdefault("bloom", {})
        set_bits = 0
        data = pdf[pdf["col_name"].notna()]
        ftier = data[data["block"] == -1]
        for c in cols:
            bm = _merge(ftier[ftier["col_name"] == c], bits)
            blooms[c] = seal_bloom_spec(bm.tobytes(), bits, k, fams[c])
            set_bits += int(np.unpackbits(bm).sum())
        if block_bits is not None:
            from fourmc_spark.sources.datasource import (
                seal_bloom_blocks_header,
            )

            # ONE grouped pass over the block-tier rows (a per-offset
            # boolean filter would rescan the frame O(blocks) times —
            # quadratic exactly when blocks are many, the tier's
            # target shape)
            btier = pdf[pdf["block"] != -1]
            grouped: dict[int, dict[str, "np.ndarray"]] = {}
            for (off, cname), sub in btier[
                btier["col_name"].notna()
            ].groupby(["block", "col_name"], sort=False):
                grouped.setdefault(int(off), {})[cname] = _merge(
                    sub, block_bits
                )
            # seed rows guarantee every block offset appears in pdf
            all_offs = sorted(int(o) for o in btier["block"].unique())
            zero = np.zeros(block_bits // 8, dtype=np.uint8)
            entries = [
                {
                    "o": off,
                    "c": {
                        c: _b64.b64encode(
                            grouped.get(off, {}).get(c, zero).tobytes()
                        ).decode("ascii")
                        for c in cols
                    },
                }
                for off in all_offs
            ]
            meta["bloom_blocks"] = seal_bloom_blocks_header(
                block_bits, bk, fams, entries
            )
        tmp = fpath + STATS_SUFFIX + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(meta, f)
        os.replace(tmp, fpath + STATS_SUFFIX)
        return pd.DataFrame({"file": [fpath], "set_bits": [set_bits]})

    summaries = (
        partials.groupBy("_file")
        .applyInPandas(_amend, "file string, set_bits long")
        .collect()
    )
    return {
        "files": len(summaries),
        "columns": cols,
        "bits": bits,
        "k": k,
        "block_bits": block_bits,
        "set_bits": sum(r["set_bits"] for r in summaries),
    }

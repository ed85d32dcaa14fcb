"""Schema-on-read ingestion over 4mc text: CSV / JSON lines -> typed rows.

The reference's text record model is schema-on-read by design — the
consumer parses the line (SURVEY.md §1.2: "Schema is whatever the consumer
parses"). These helpers are that consumer, Spark-first: the splittable
scan yields `[offset, value]`, then `from_csv` / `from_json` (JVM
expressions, whole-stage codegen) lift lines into typed columns. Parsing
is a map-only projection — it fuses into the scan stage, so a 100 TB
ingest is still one pass with zero shuffles, and corrupt lines surface
through PERMISSIVE-mode nulls instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["read_fourmc_csv", "read_fourmc_json"]


def _scan(spark: SparkSession, path: str, **options) -> DataFrame:
    r = spark.read.format("fourmc")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


def read_fourmc_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ",",
    header: bool = False,
    keep_offset: bool = False,
    **scan_options,
) -> DataFrame:
    """Typed rows from CSV lines stored in .4mc/.4mz/.zst files.

    ``schema`` is a DDL string ("a INT, b STRING, ..."). With
    ``header=True`` the first line of each FILE is dropped inside the
    scan (the head partition of each file skips one line — Hadoop's
    split-invariant header rule). Malformed lines parse to nulls
    (PERMISSIVE), they do not kill the 100 TB job.
    """
    if header:
        scan_options = {**scan_options, "skipfirstline": "true"}
    df = _scan(spark, path, **scan_options)
    parsed = df.select(
        "offset", F.from_csv(F.col("value"), schema, {"sep": sep}).alias("r")
    )
    cols = ["offset", "r.*"] if keep_offset else ["r.*"]
    return parsed.select(*cols)


def read_fourmc_json(
    spark: SparkSession,
    path: str,
    schema: str,
    keep_offset: bool = False,
    **scan_options,
) -> DataFrame:
    """Typed rows from JSON-lines stored in .4mc/.4mz/.zst files.

    Same shape as :func:`read_fourmc_csv`; nested structs/arrays in the
    DDL schema work (from_json handles the full type tree)."""
    df = _scan(spark, path, **scan_options)
    parsed = df.select("offset", F.from_json(F.col("value"), schema).alias("r"))
    cols = ["offset", "r.*"] if keep_offset else ["r.*"]
    return parsed.select(*cols)

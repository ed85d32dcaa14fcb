"""Migration shim for the reference's ``sc.newAPIHadoopFile`` recipe.

The reference's headline PySpark usage (``Readme.md:110-131``) is::

    data = sc.newAPIHadoopFile(
        'gs://data/foo.4mc',
        'com.fing.mapreduce.FourMcTextInputFormat',
        'org.apache.hadoop.io.LongWritable',
        'org.apache.hadoop.io.Text')
    data.take(1)   # -> [(0, 'first line')]

That call needs the hadoop-4mc jar on the JVM classpath. This engine is
PySpark-native — the scan runs through ``spark.read.format("fourmc")`` —
so :func:`new_api_hadoop_file` accepts the SAME call shape (input-format
/ key / value class names are validated-and-ignored; recognised Hadoop
conf keys map onto scan options) and returns the SAME ``RDD[(offset,
line)]``, splittable into many partitions. A migrating job changes the
call site from ``sc.newAPIHadoopFile(...)`` to
``new_api_hadoop_file(spark, ...)`` and keeps everything downstream.

Prefer the DataFrame scan for new code — the RDD surface forgoes
Catalyst (no pushdown, no pruning, Python-side rows); this shim exists
to make old call sites portable, not to be the hot path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

__all__ = ["new_api_hadoop_file", "text_file_4mc"]

_KNOWN_FORMATS = (
    "com.fing.mapreduce.FourMcTextInputFormat",
    "com.fing.mapreduce.FourMzTextInputFormat",
    "com.hadoop.mapreduce.FourMcTextInputFormat",  # legacy package alias
)

# Hadoop conf keys honored by the reference's FileInputFormat planning,
# mapped to the equivalent fourmc scan options
_CONF_MAP = {
    "mapreduce.input.fileinputformat.split.maxsize": "maxpartitionbytes",
    "mapred.max.split.size": "maxpartitionbytes",
}


def new_api_hadoop_file(
    spark: SparkSession | Any,
    path: str,
    inputFormatClass: str | None = None,
    keyClass: str | None = None,
    valueClass: str | None = None,
    keyConverter: str | None = None,
    valueConverter: str | None = None,
    conf: dict[str, str] | None = None,
):
    """Drop-in twin of ``sc.newAPIHadoopFile`` for 4mc/4mz text inputs.

    Returns an ``RDD[(offset: int, line: str)]`` with the block-aligned
    split parallelism of the native scan (the whole point of the
    reference recipe vs ``sc.textFile``'s single partition).
    """
    # accept a SparkContext too — the call site being migrated has one
    if not isinstance(spark, SparkSession):
        spark = SparkSession.builder.getOrCreate()
    if inputFormatClass is not None and inputFormatClass not in _KNOWN_FORMATS:
        raise ValueError(
            f"unsupported input format {inputFormatClass!r}; this shim "
            f"covers the 4mc text formats {_KNOWN_FORMATS}"
        )
    from fourmc_spark.session import register_fourmc

    register_fourmc(spark)
    reader = spark.read.format("fourmc")
    for k, opt in _CONF_MAP.items():
        if conf and k in conf:
            reader = reader.option(opt, int(conf[k]))
    df = reader.load(path)
    return df.rdd.map(lambda r: (r["offset"], r["value"]))


def text_file_4mc(spark: SparkSession, path: str, **options):
    """``sc.textFile`` twin returning ``RDD[str]`` — splittable, unlike
    pointing ``sc.textFile`` at a .4mc file (which the reference README
    calls out as collapsing to one partition)."""
    from fourmc_spark.session import register_fourmc

    register_fourmc(spark)
    reader = spark.read.format("fourmc")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path).rdd.map(lambda r: r["value"])

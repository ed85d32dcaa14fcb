"""fourmc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of fingltd/4mc (splittable block-compressed
I/O) plus a full relational + LLM-data-pipeline operator surface.

Layout:
    format/     byte-exact 4mc/4mz container format (read/write/index),
                .zst streaming codec, Hadoop block-codec containers
    sources/    Spark Python DataSource ("fourmc") — splittable scan + sink
    operators/  dedup, similarity search, text analysis, multimodal
                (real PPM/BMP/WAV/Y4M decode), curation, joins
    functions/  reusable column expression helpers
    streaming/  Structured Streaming operators over events / 4mc files
    queries.py  declared query corpus (SURVEY.md §2.3) + extensions
    session.py  tuned SparkSession builder
    hadoop_compat.py  sc.newAPIHadoopFile migration shim
    cli.py      4mc-compatible command-line tool
"""

__version__ = "0.1.0"

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


# TRACE-IMPORT (temporary)
import os as _os
_tl = _os.environ.get("FOURMC_TRACE_IMPORT")
if _tl:
    import json as _j, sys as _s, time as _t
    with open(_tl, "a") as _f:
        _f.write(_j.dumps({"pid": _os.getpid(), "t": _t.time(), "argv": _s.argv[:3]}) + "\n")

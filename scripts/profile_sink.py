"""Profile the fourmc sink lane: where does 25 MB/s come from?

Feeds the same ~128 MB of text through the sink from different sources
and with different partition counts, plus component timings.
"""
import os
import sys
import time
import shutil
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def blob(target_mb=64):
    import duckdb
    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    base = ("\n".join(t[0] for t in texts) + "\n").encode()
    reps = max(1, (target_mb * 1024 * 1024) // len(base))
    return base * reps


def main():
    from fourmc_spark.session import get_spark
    from fourmc_spark.format import write_file

    tmp = tempfile.mkdtemp(prefix="sinkprof-")
    spark = get_spark("sink-profile")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        data = blob(64)
        mb2 = 2 * len(data) / (1024 * 1024)

        # raw ceiling: write_file single thread
        t0 = time.perf_counter()
        write_file(os.path.join(tmp, "raw.4mc"), data, codec="lz4", level="fast")
        print(f"raw write_file 1t: {len(data)/(1024*1024)/(time.perf_counter()-t0):.1f} MB/s")

        d = os.path.join(tmp, "scan")
        os.makedirs(d)
        for i in range(2):
            write_file(os.path.join(d, f"data{i}.4mc"), data, codec="lz4", level="fast", workers=16)

        # feed 1: fourmc scan, 4 MiB partitions (current bench shape)
        def sink(df, name, outdir):
            df.write.format("fourmc").option("codec", "lz4").option(
                "level", "fast").mode("overwrite").save(outdir)

        for mpb, label in ((4 << 20, "4MiB"), (32 << 20, "32MiB")):
            df = spark.read.format("fourmc").option("maxpartitionbytes", mpb).load(d)
            out = os.path.join(tmp, f"out-fourmc-{label}")
            sink(df.select("value"), "warm", out)
            t0 = time.perf_counter()
            sink(df.select("value"), "meas", out)
            dt = time.perf_counter() - t0
            print(f"fourmc-scan[{label}] -> sink: {mb2/dt:.1f} MB/s  ({dt:.2f}s)")

        # feed 2: parquet scan -> sink (isolate sink from python source)
        pq = os.path.join(tmp, "pq")
        df = spark.read.format("fourmc").option("maxpartitionbytes", 32 << 20).load(d)
        df.select("value").write.mode("overwrite").parquet(pq)
        for nparts in (32, 8):
            pdf = spark.read.parquet(pq).repartition(nparts)
            out = os.path.join(tmp, f"out-pq-{nparts}")
            sink(pdf, "warm", out)
            t0 = time.perf_counter()
            sink(pdf, "meas", out)
            dt = time.perf_counter() - t0
            print(f"parquet[{nparts} parts] -> sink: {mb2/dt:.1f} MB/s  ({dt:.2f}s)")

        # feed 3: parquet scan -> noop (cost of the feed alone)
        pdf = spark.read.parquet(pq)
        pdf.write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        pdf.write.format("noop").mode("overwrite").save()
        print(f"parquet -> noop: {mb2/(time.perf_counter()-t0):.1f} MB/s")

        # feed 4: fourmc scan -> noop (cost of the python scan alone)
        for mpb, label in ((4 << 20, "4MiB"), (32 << 20, "32MiB")):
            df = spark.read.format("fourmc").option("maxpartitionbytes", mpb).load(d).select("value")
            df.write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            print(f"fourmc-scan[{label}] -> noop: {mb2/(time.perf_counter()-t0):.1f} MB/s")
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

"""heavy_hitters: exact frequent-token mining via per-partition
Misra-Gries candidate sketches + broadcast exact recount.

The contract under test is EXACTNESS: whatever the sketch does
internally, the output must equal the naive
GROUP BY token HAVING count >= ceil(phi * N) — including under
adversarial spreads that force constant sketch evictions."""

import math

import pytest
from pyspark.sql import functions as F

from fourmc_spark.operators.text import heavy_hitters


def _exact(df, phi):
    ex = (
        df.select(F.explode(F.expr("split(text, ' ')")).alias("token"))
        .groupBy("token").agg(F.count("*").cast("long").alias("cnt"))
    )
    total = df.select(F.sum(F.size(F.expr("split(text, ' ')")))).first()[0]
    th = math.ceil(total * phi)
    return sorted(
        (r["token"], r["cnt"])
        for r in ex.filter(F.col("cnt") >= th).collect()
    )


def _got(df, phi):
    return sorted((r["token"], r["cnt"]) for r in heavy_hitters(df, phi=phi).collect())


def test_heavy_hitters_exact_on_skewed_corpus(spark):
    # zipf-ish: token t{i} appears ~1000/i times, long unique tail
    docs = []
    for i in range(1, 60):
        docs.extend([f"t{i:03d} filler{j}-{i}" for j in range(1000 // i)])
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    ).repartition(16)
    phi = 0.01
    assert _got(df, phi) == _exact(df, phi)


def test_heavy_hitters_survives_eviction_pressure(spark):
    # phi=0.05 -> sketch capacity m=40; 500 once-per-partition decoys per
    # partition force constant decrement cycles, while the two true heavy
    # tokens are spread EVENLY (each partition holds only its proportional
    # share — the pigeonhole boundary the superset guarantee rests on)
    rows = []
    did = 0
    for p in range(8):
        for r in range(30):
            rows.append((did, "hot cold"))
            did += 1
        for j in range(500):
            rows.append((did, f"decoy-{p}-{j}"))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string") \
              .repartition(8, "doc_id")
    phi = 0.05
    got = _got(df, phi)
    assert got == _exact(df, phi)
    assert {t for t, _ in got} == {"hot", "cold"}


def test_heavy_hitters_threshold_boundary(spark):
    # 100 tokens total; phi=0.05 -> threshold ceil(5.0)=5: a token with
    # exactly 5 hits is IN, 4 hits is OUT
    words = ["at5"] * 5 + ["at4"] * 4 + [f"u{i}" for i in range(91)]
    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    got = dict(_got(df, 0.05))
    assert got.get("at5") == 5
    assert "at4" not in got


def test_heavy_hitters_phi_validation(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, phi=0.0)
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, phi=1.5)


def test_heavy_hitters_guard_fires_before_any_job(spark, monkeypatch):
    # the guard is on m itself, pre-flight: no Spark job should run
    monkeypatch.setenv("HH_MAX_CANDIDATES", "10")
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="HH_MAX_CANDIDATES"):
        heavy_hitters(df, phi=0.01)  # m = 200 > 10


def test_mg_merged_summary_size_independent_of_input_partitions(spark):
    # the driver-side collect in heavy_hitters is the merged summary;
    # it must stay <= m+1 rows whether the corpus scan ran on 2 or 64
    # partitions (the round-9 version collected m rows PER partition)
    from fourmc_spark.operators.text import _mg_merged_summary

    import pandas as pd

    m = 8

    def sketch(it):
        counters, n = {}, 0
        for pdf in it:
            for tok in pdf["token"]:
                counters[tok] = counters.get(tok, 0) + 1
                n += 1
            if len(counters) > m:
                vals = sorted(counters.values(), reverse=True)
                d = vals[m]
                counters = {t: c - d for t, c in counters.items() if c - d > 0}
        yield pd.DataFrame(
            {"token": pd.Series(list(counters) + [None], dtype="object"),
             "w": pd.Series(list(counters.values()) + [n], dtype="int64")}
        )

    rows = [(f"tok{i % 50}",) for i in range(2000)] + [("hot",)] * 1000
    sizes = {}
    for nparts in (2, 64):
        src = spark.createDataFrame(rows, "token string").repartition(nparts)
        merged = _mg_merged_summary(
            src.mapInPandas(sketch, schema="token string, w long"), m
        ).collect()
        sizes[nparts] = len(merged)
        assert len(merged) <= m + 1
        # the exact-N trailer must survive every merge stage
        assert sum(r["w"] for r in merged if r["token"] is None) == 3000
        # the one true heavy token must survive the merged superset
        assert "hot" in {r["token"] for r in merged}
    assert sizes[64] <= m + 1  # NOT m * 64

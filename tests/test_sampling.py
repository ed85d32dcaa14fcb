"""mixture_sample semantics: temperature flattening, integer-exact rates,
and partitioning-invariant membership (the 100 TB reproducibility
contract). hash_sample / stratified / split are pinned by their oracle
queries (q31/q32/curation_split_assign); this file covers the mixture
math those cannot see."""

import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, sizes: dict[str, int]):
    rows = []
    i = 0
    for src, n in sorted(sizes.items()):
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_rates_match_integer_formula(spark):
    from fourmc_spark.operators.sampling import mixture_sample

    sizes = {"big": 4000, "mid": 900, "rare": 100}
    df = _docs(spark, sizes)
    kept = mixture_sample(df, "source", ["doc_id"], sample_rows=1000)
    rates = {
        r["source"]: r["rate_bp"]
        for r in kept.select("source", "rate_bp").distinct().collect()
    }
    w = {s: max(int(math.isqrt(n)), 1) for s, n in sizes.items()}
    W = sum(w.values())
    expected = {
        s: min((1000 * w[s] // W) * 65536 // n, 65536) for s, n in sizes.items()
    }
    for s in rates:
        assert rates[s] == expected[s], (s, rates[s], expected[s])


def test_mixture_upweights_rare_domains(spark):
    from fourmc_spark.operators.sampling import mixture_sample

    sizes = {"big": 6000, "rare": 60}
    df = _docs(spark, sizes)
    kept = mixture_sample(df, "source", ["doc_id"], sample_rows=600)
    got = {r["source"]: r["n_kept"] for r in
           kept.groupBy("source").agg(F.count("*").alias("n_kept")).collect()}
    # proportional would give rare ~6 rows of 600; sqrt-flattening gives
    # rare a ~10x larger share of the budget than its row share
    frac_rare_kept = got.get("rare", 0) / max(got.get("big", 1), 1)
    assert frac_rare_kept > 3 * (60 / 6000)


def test_mixture_membership_invariant_under_partitioning(spark):
    from fourmc_spark.operators.sampling import mixture_sample

    df = _docs(spark, {"a": 3000, "b": 500})
    a = mixture_sample(df, "source", ["doc_id"], sample_rows=700)
    b = mixture_sample(df.repartition(13, "doc_id"), "source", ["doc_id"],
                       sample_rows=700)
    ia = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ib = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ia == ib and len(ia) > 0


def test_mixture_full_keep_when_quota_exceeds_domain(spark):
    from fourmc_spark.operators.sampling import mixture_sample

    # sample_rows >= corpus: every domain saturates at rate_bp = 65536
    df = _docs(spark, {"a": 50, "b": 20})
    kept = mixture_sample(df, "source", ["doc_id"], sample_rows=1000)
    assert kept.count() == 70
    assert kept.select(F.min("rate_bp")).first()[0] == 65536

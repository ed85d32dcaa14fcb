"""Unit semantics for operators/timeseries.py on hand-built frames:
the cascade fold must equal a direct aggregation of raw at every level,
and gap_fill must densify, forward-fill, and leave leading gaps NULL.
"""

from datetime import datetime

from pyspark.sql import functions as F


def _frame(spark):
    rows = [
        # key "a": hours 00, 01, 03 (02 missing), two rows in hour 00
        ("a", datetime(2024, 1, 1, 0, 10), 10.0),
        ("a", datetime(2024, 1, 1, 0, 50), 30.0),
        ("a", datetime(2024, 1, 1, 1, 5), 7.0),
        ("a", datetime(2024, 1, 1, 3, 59), 1.0),
        # key "b": first appears at hour 02
        ("b", datetime(2024, 1, 1, 2, 30), 100.0),
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"])


def test_cascade_fold_equals_direct(spark):
    from fourmc_spark.operators.timeseries import rollup_cascade

    df = _frame(spark)
    levels = rollup_cascade(df, "ts", ["k"], "v", levels=("hour", "day"))
    direct_day = (
        df.groupBy("k", F.date_trunc("day", "ts").alias("bucket"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum("v").alias("sum_value"),
            F.min("v").alias("min_value"),
            F.max("v").alias("max_value"),
        )
    )
    got = {tuple(r) for r in levels["day"].collect()}
    want = {tuple(r) for r in direct_day.collect()}
    assert got == want
    hour = {(r["k"], r["bucket"].hour): (r["cnt"], r["sum_value"]) for r in levels["hour"].collect()}
    assert hour[("a", 0)] == (2, 40.0)
    assert hour[("a", 3)] == (1, 1.0)


def test_cascade_rejects_bad_level_order(spark):
    import pytest

    from fourmc_spark.operators.timeseries import rollup_cascade

    with pytest.raises(ValueError):
        rollup_cascade(_frame(spark), "ts", ["k"], "v", levels=("day", "hour"))


def test_gap_fill_semantics(spark):
    from fourmc_spark.operators.timeseries import gap_fill

    out = gap_fill(_frame(spark), "ts", ["k"], "v", unit="hour")
    rows = {
        (r["k"], r["bucket"].hour): (r["value_ff"], r["filled"])
        for r in out.collect()
    }
    # grid is the global [min,max] bucket range for EVERY key: hours 0..3
    assert len(rows) == 8
    assert rows[("a", 0)] == (20.0, False)   # avg of 10, 30
    assert rows[("a", 1)] == (7.0, False)
    assert rows[("a", 2)] == (7.0, True)     # forward-filled
    assert rows[("a", 3)] == (1.0, False)
    # key b: leading gaps before its first observation stay NULL
    assert rows[("b", 0)] == (None, True)
    assert rows[("b", 1)] == (None, True)
    assert rows[("b", 2)] == (100.0, False)
    assert rows[("b", 3)] == (100.0, True)


def test_apply_changes_semantics(spark):
    from fourmc_spark.operators.timeseries import apply_changes

    snap = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 1, 20.0), ("c", 5, 30.0)],
        "k string, seq long, v double",
    )
    changes = spark.createDataFrame(
        [
            ("a", 2, 11.0, "upsert"),   # newer than snapshot -> wins
            ("b", 3, 0.0, "delete"),    # newest is delete -> key drops
            ("c", 2, 99.0, "upsert"),   # OLDER than snapshot -> loses
            ("d", 1, 40.0, "upsert"),   # brand-new key
            ("d", 2, 41.0, "upsert"),   # two changes, newest wins
        ],
        "k string, seq long, v double, op string",
    )
    got = {
        r["k"]: (r["seq"], r["v"])
        for r in apply_changes(snap, changes, ["k"], ["seq"]).collect()
    }
    assert got == {"a": (2, 11.0), "c": (5, 30.0), "d": (2, 41.0)}


def test_funnel_stages_semantics(spark):
    import datetime as dt

    from fourmc_spark.operators.timeseries import funnel_stages

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1: full chain in order
        (1, t(0), "A"), (1, t(5), "B"), (1, t(9), "C"),
        # user 2: B only BEFORE A -> stage 1 (stays in frontier, t2 NULL)
        (2, t(5), "A"), (2, t(1), "B"), (2, t(9), "C"),
        # user 3: A then B, no C -> stage 2
        (3, t(0), "A"), (3, t(2), "B"),
        # user 4: no A -> absent entirely
        (4, t(0), "B"), (4, t(1), "C"),
        # user 5: B exactly AT t1 -> strict ">" rejects it
        (5, t(3), "A"), (5, t(3), "B"),
        # user 6: two Bs after A -> earliest wins
        (6, t(0), "A"), (6, t(8), "B"), (6, t(4), "B"), (6, t(6), "C"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r["user"]: (r["t1"], r["t2"], r["t3"], r["stage"])
        for r in funnel_stages(df, ["A", "B", "C"]).collect()
    }
    assert set(got) == {1, 2, 3, 5, 6}
    assert got[1] == (t(0), t(5), t(9), 3)
    assert got[2] == (t(5), None, None, 1)
    assert got[3] == (t(0), t(2), None, 2)
    assert got[5] == (t(3), None, None, 1)
    assert got[6] == (t(0), t(4), t(6), 3)
    # user 2's C at t9 must NOT count: stage 2 (B) was never reached,
    # so t3 is NULL even though a C event exists after t1

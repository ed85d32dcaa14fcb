"""Classic TPC-H query suite, adapted to the driver's reduced schema.

The driver tables (TESTDATA.md) carry a TPC-H-ish star schema but omit
``partsupp`` and several columns (``l_commitdate``/``l_receiptdate``,
``l_shipmode``, ``c_phone``, ``ps_supplycost`` …).  Each query below keeps
the *shape* of its TPC-H namesake — the join topology, the aggregation
pattern, the subquery class — and substitutes available columns where the
original ones don't exist (each substitution is noted in the docstring).
Together with q04/q08 in queries.py (TPC-H Q1/Q5) this covers all 22
TPC-H query shapes.

Every query follows the corpus conventions (queries.py): DataFrame-first,
broadcast hints on constant-size dims, size-based planning for SF-scaled
dims, aliases/int-widths/rounding pinned identically on the Spark and
DuckDB sides, fully-ordered output.

Scale posture: the only large-large shuffles are lineitem x orders joins
on their natural keys; everything else broadcasts or aggregates before
joining.  Correlated subqueries are expressed as explicit aggregate-join
plans (no per-row re-scan), the same decorrelation Catalyst would emit.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from fourmc_spark.queries import _t, query

_TS = "timestamp"


def _ts(s: str):
    return F.lit(s).cast(_TS)


# -- Q2: min-cost supplier --------------------------------------------------
# partsupp.ps_supplycost -> per-row unit sale price from lineitem (rounded
# row-level, so the min is exact and engine-order-independent).
@query(
    "tpch_q02_min_cost_supplier",
    """WITH ps AS (
         SELECT l_partkey, l_suppkey,
                min((CAST(round(l_extendedprice * 100) AS BIGINT) * 100)
                    // CAST(l_quantity AS BIGINT)) AS unit_cost_e4
         FROM lineitem GROUP BY l_partkey, l_suppkey)
       SELECT p.p_partkey, s.s_name, ps.unit_cost_e4 / 10000.0 AS unit_cost
       FROM part p
         JOIN ps ON ps.l_partkey = p.p_partkey
         JOIN supplier s ON s.s_suppkey = ps.l_suppkey
       WHERE p.p_size < 15 AND p.p_type = 'STANDARD'
         AND ps.unit_cost_e4 = (
           SELECT min(ps2.unit_cost_e4) FROM ps ps2
           WHERE ps2.l_partkey = p.p_partkey)
       ORDER BY p.p_partkey, s.s_name""",
)
def tpch_q02(spark, sf):
    """TPC-H Q2 shape (correlated min over a derived supplier-cost table).

    Correlated ``= (SELECT min ...)`` decorrelates into a window min —
    one shuffle on l_partkey, no re-scan per part. Unit cost is computed
    in exact integer ten-thousandths (price cents × 100 div quantity):
    float division rounded to 4 decimals sits on a rounding boundary
    once per few hundred thousand rows, and the min-equality then flips
    between engines — integer arithmetic cannot.
    """
    li = _t(spark, sf, "lineitem")
    unit_cost_e4 = F.expr(
        "(CAST(round(l_extendedprice * 100) AS BIGINT) * 100)"
        " div CAST(l_quantity AS BIGINT)"
    )
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit_cost_e4).alias("unit_cost_e4"))
    )
    w = Window.partitionBy("l_partkey")
    ps = ps.withColumn("min_cost", F.min("unit_cost_e4").over(w)).where(
        F.col("unit_cost_e4") == F.col("min_cost")
    )
    p = _t(spark, sf, "part").where((F.col("p_size") < 15) & (F.col("p_type") == "STANDARD"))
    s = _t(spark, sf, "supplier")
    return (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "s_name",
            (F.col("unit_cost_e4") / 10000.0).alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_name")
    )


# -- Q3: shipping priority --------------------------------------------------
@query(
    "tpch_q03_shipping_priority",
    """SELECT l.l_orderkey,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
              o.o_orderdate
       FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
       GROUP BY l.l_orderkey, o.o_orderdate
       ORDER BY revenue DESC, l.l_orderkey LIMIT 20""",
)
def tpch_q03(spark, sf):
    """TPC-H Q3: unshipped-revenue top-k. Segment filter prunes customer
    before the join; top-20 is TakeOrderedAndProject, never a total sort."""
    c = _t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").where(F.col("o_orderdate") < _ts("1998-03-15 00:00:00"))
    li = _t(spark, sf, "lineitem").where(F.col("l_shipdate") > _ts("1998-03-15 00:00:00"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(20)
    )


# -- Q4: order priority checking --------------------------------------------
# l_commitdate < l_receiptdate  ->  l_shipdate > o_orderdate + 60 days
@query(
    "tpch_q04_order_priority",
    """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
       FROM orders o
       WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
         AND EXISTS (
           SELECT 1 FROM lineitem l
           WHERE l.l_orderkey = o.o_orderkey
             AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
       GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""",
)
def tpch_q04(spark, sf):
    """TPC-H Q4: EXISTS with a cross-table date predicate -> left-semi
    join (Catalyst keeps the correlated condition in the join)."""
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-04-01 00:00:00"))
    )
    li = _t(spark, sf, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# -- Q6: forecasting revenue change -----------------------------------------
@query(
    "tpch_q06_forecast_revenue",
    """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)
def tpch_q06(spark, sf):
    """TPC-H Q6: pure scan-filter-aggregate; all four predicates push to
    the parquet scan, partial agg leaves one row per task."""
    return _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))


# -- Q7: volume shipping ----------------------------------------------------
@query(
    "tpch_q07_volume_shipping",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
       FROM supplier s
         JOIN lineitem l ON l.l_suppkey = s.s_suppkey
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
         JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
       WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year""",
)
def tpch_q07(spark, sf):
    """TPC-H Q7: bidirectional nation-pair trade volume. The nation pair
    filter lands after both broadcasts; lineitem x orders is the only
    large shuffle."""
    n = _t(spark, sf, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    s = _t(spark, sf, "supplier")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# -- Q8: national market share ----------------------------------------------
@query(
    "tpch_q08_market_share",
    """SELECT o_year,
              round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                    / sum(volume), 4) AS mkt_share
       FROM (
         SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                l.l_extendedprice * (1 - l.l_discount) AS volume,
                n2.n_name AS supp_nation
         FROM part p
           JOIN lineitem l ON l.l_partkey = p.p_partkey
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
           JOIN region r ON r.r_regionkey = n1.n_regionkey
           JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
         WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
           AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations
       GROUP BY o_year ORDER BY o_year""",
)
def tpch_q08(spark, sf):
    """TPC-H Q8: market share of one supplier nation inside one customer
    region. Part filter prunes lineitem early (semi-ish via inner join on
    the filtered broadcast part)."""
    p = _t(spark, sf, "part").where(F.col("p_type") == "PROMO")
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    r = _t(spark, sf, "region").where(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        _t(spark, sf, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# -- Q9: product type profit ------------------------------------------------
# ps_supplycost -> 0.6 * p_retailprice per unit (documented cost model).
@query(
    "tpch_q09_profit",
    """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
              round(sum(l.l_extendedprice * (1 - l.l_discount)
                        - 0.6 * p.p_retailprice * l.l_quantity), 4) AS profit
       FROM part p
         JOIN lineitem l ON l.l_partkey = p.p_partkey
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
       WHERE p.p_name LIKE '%widget%'
       GROUP BY nation, o_year
       ORDER BY nation, o_year DESC""",
)
def tpch_q09(spark, sf):
    """TPC-H Q9: profit by supplier nation x order year for a part-name
    slice; supply cost modeled as 60% of retail price."""
    p = _t(spark, sf, "part").where(F.col("p_name").contains("widget"))
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    o = _t(spark, sf, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        _t(spark, sf, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(profit), 4).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# -- Q10: returned item reporting -------------------------------------------
@query(
    "tpch_q10_returned_items",
    """SELECT c.c_custkey, c.c_name,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
              round(c.c_acctbal, 4) AS acctbal, n.n_name AS nation
       FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN nation n ON n.n_nationkey = c.c_nationkey
       WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
         AND l.l_returnflag = 'R'
       GROUP BY c.c_custkey, c.c_name, acctbal, nation
       ORDER BY revenue DESC, c.c_custkey LIMIT 20""",
)
def tpch_q10(spark, sf):
    """TPC-H Q10: top-20 customers by returned revenue in a quarter."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-04-01 00:00:00"))
    )
    li = _t(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 4).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "acctbal", "nation")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# -- Q11: important stock ---------------------------------------------------
# partsupp value -> shipped value per part from suppliers of one region;
# threshold = 0.001 of the regional total (uncorrelated scalar subquery).
@query(
    "tpch_q11_important_parts",
    """WITH pv AS (
         SELECT l.l_partkey,
                sum(l.l_extendedprice * l.l_quantity) AS value
         FROM lineitem l
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN nation n ON n.n_nationkey = s.s_nationkey
         WHERE n.n_regionkey = 2
         GROUP BY l.l_partkey)
       SELECT l_partkey, round(value, 4) AS value
       FROM pv
       WHERE value > (SELECT 0.001 * sum(value) FROM pv)
       ORDER BY value DESC, l_partkey""",
)
def tpch_q11(spark, sf):
    """TPC-H Q11: parts whose shipped value exceeds a fraction of the
    regional total. The scalar total is a one-row broadcast (no second
    scan of lineitem: the per-part aggregate is reused for the total)."""
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation").where(F.col("n_regionkey") == 2)
    pv = (
        _t(spark, sf, "lineitem")
        .join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    total = pv.agg((F.sum("value") * 0.001).alias("threshold"))
    return (
        pv.join(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select("l_partkey", F.round("value", 4).alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


# -- Q12: shipping-delay priority classes -----------------------------------
# l_shipmode -> delay bucket (days from order to ship); the CASE-sum shape
# of Q12 is preserved exactly.
@query(
    "tpch_q12_ship_delay_priority",
    """SELECT CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)) <= 30 THEN 'FAST'
                   WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)) <= 90 THEN 'NORMAL'
                   ELSE 'SLOW' END AS delay_class,
              CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY delay_class ORDER BY delay_class""",
)
def tpch_q12(spark, sf):
    """TPC-H Q12 shape: priority counts per shipping-delay class."""
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    cls = (
        F.when(delay <= 30, "FAST").when(delay <= 90, "NORMAL").otherwise("SLOW")
    ).alias("delay_class")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(cls)
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


# -- Q13: customer order-count distribution ---------------------------------
@query(
    "tpch_q13_order_distribution",
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
       FROM (
         SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
         FROM customer c
           LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                             AND o.o_orderpriority <> '5-LOW'
         GROUP BY c.c_custkey) c_orders
       GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
)
def tpch_q13(spark, sf):
    """TPC-H Q13: two-level aggregation over a left join with an extra
    join-side predicate (kept in the join condition, not a post-filter —
    customers with zero qualifying orders must survive)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# -- Q14: promotion effect --------------------------------------------------
@query(
    "tpch_q14_promo_share",
    """SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                     THEN l.l_extendedprice * (1 - l.l_discount)
                                     ELSE 0 END)
                    / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
         AND l.l_shipdate < TIMESTAMP '1997-07-01 00:00:00'""",
)
def tpch_q14(spark, sf):
    """TPC-H Q14: promo revenue share in one month; part broadcasts."""
    p = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-06-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-07-01 00:00:00"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


# -- Q15: top supplier ------------------------------------------------------
@query(
    "tpch_q15_top_supplier",
    """WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
                round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         GROUP BY l_suppkey)
       SELECT s.s_suppkey, s.s_name, r.total_revenue
       FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
       WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
       ORDER BY s.s_suppkey""",
)
def tpch_q15(spark, sf):
    """TPC-H Q15: supplier(s) achieving the quarterly revenue maximum.
    The scalar max is computed from the same aggregate (one lineitem
    scan), joined back as a one-row broadcast."""
    rev = (
        _t(spark, sf, "lineitem")
        .where(
            (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# -- Q16: part/supplier relationship ----------------------------------------
# partsupp -> the (part, supplier) pairs observed in lineitem.
@query(
    "tpch_q16_supplier_cnt",
    """SELECT p.p_brand, p.p_size,
              CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
       FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
       WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
         AND p.p_size IN (1, 5, 9, 13, 17, 21)
       GROUP BY p.p_brand, p.p_size
       ORDER BY supplier_cnt DESC, p.p_brand, p.p_size""",
)
def tpch_q16(spark, sf):
    """TPC-H Q16: distinct supplier counts per (brand, size) slice."""
    p = _t(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21)
    )
    li = _t(spark, sf, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


# -- Q17: small-quantity-order revenue --------------------------------------
@query(
    "tpch_q17_small_qty_revenue",
    """SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly
       FROM lineitem l
         JOIN part p ON p.p_partkey = l.l_partkey
       WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
         AND l.l_quantity < (
           SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
           WHERE l2.l_partkey = l.l_partkey)""",
)
def tpch_q17(spark, sf):
    """TPC-H Q17: correlated avg decorrelated to an aggregate join; the
    per-part average is computed once, broadcast into the filtered scan."""
    p = _t(spark, sf, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    li = _t(spark, sf, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


# -- Q18: large-volume customers --------------------------------------------
@query(
    "tpch_q18_large_orders",
    """SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
              round(o.o_totalprice, 4) AS totalprice,
              round(t.sum_qty, 4) AS sum_qty
       FROM orders o
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
               FROM lineitem GROUP BY l_orderkey
               HAVING sum(l_quantity) > 150) t
           ON t.l_orderkey = o.o_orderkey
       ORDER BY totalprice DESC, o.o_orderkey LIMIT 100""",
)
def tpch_q18(spark, sf):
    """TPC-H Q18: orders above a total-quantity threshold (150 for the
    ~4-line synthetic orders). Aggregate-then-join: lineitem is reduced
    to qualifying orderkeys before touching orders."""
    big = (
        _t(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 4).alias("totalprice"),
            F.round("sum_qty", 4).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# -- Q19: discounted revenue (disjunctive predicates) ------------------------
@query(
    "tpch_q19_or_predicates",
    """SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
              AND l.l_quantity BETWEEN 1 AND 11)
          OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
              AND l.l_quantity BETWEEN 10 AND 20)
          OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
              AND l.l_quantity BETWEEN 20 AND 30)""",
)
def tpch_q19(spark, sf):
    """TPC-H Q19: three OR'd brand/size/quantity windows across the join.
    Catalyst extracts the common l_quantity/p_size bounds as pushable
    conjuncts; the disjunction evaluates post-join (broadcast part)."""
    p = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#1") & sz.between(1, 5) & q.between(1, 11))
        | ((br == "Brand#2") & sz.between(1, 10) & q.between(10, 20))
        | ((br == "Brand#3") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


# -- Q20: potential part promotion ------------------------------------------
# ps_availqty -> shipped quantity; suppliers who shipped more than 100
# units of any 'red%' part qualify.
@query(
    "tpch_q20_promotion_suppliers",
    """SELECT s.s_name, n.n_name AS nation
       FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
       WHERE s.s_suppkey IN (
         SELECT l.l_suppkey FROM lineitem l
         WHERE l.l_partkey IN (
           SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
         GROUP BY l.l_suppkey, l.l_partkey
         HAVING sum(l.l_quantity) > 100)
       ORDER BY s.s_name""",
)
def tpch_q20(spark, sf):
    """TPC-H Q20: nested IN subqueries -> semi-join chain. The part
    filter broadcasts into the lineitem aggregate; supplier left-semi
    joins the qualifying supplier set."""
    red = _t(spark, sf, "part").where(F.col("p_name").startswith("red"))
    qual = (
        _t(spark, sf, "lineitem")
        .join(F.broadcast(red), F.col("l_partkey") == red.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    return (
        s.join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


# -- Q21: suppliers who kept orders waiting ----------------------------------
# "late" = shipped > 90 days after the order date (no commit/receipt
# dates in the schema); the EXISTS / NOT EXISTS pair is preserved.
@query(
    "tpch_q21_waiting_suppliers",
    """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
       FROM supplier s
         JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
         JOIN orders o ON o.o_orderkey = l1.l_orderkey
       WHERE o.o_orderstatus = 'F'
         AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
         AND EXISTS (
           SELECT 1 FROM lineitem l2
           WHERE l2.l_orderkey = l1.l_orderkey
             AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (
           SELECT 1 FROM lineitem l3
           WHERE l3.l_orderkey = l1.l_orderkey
             AND l3.l_suppkey <> l1.l_suppkey
             AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
       GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 50""",
)
def tpch_q21(spark, sf):
    """TPC-H Q21: the sole-late-supplier-in-a-multi-supplier-order query.

    Instead of two correlated EXISTS re-scans, the per-order facts
    (supplier count, late-supplier count) are computed in ONE lineitem
    aggregate keyed by l_orderkey and joined back — at 100 TB this is
    two shuffles of pre-aggregated per-order rows, not four lineitem
    self-join passes.
    """
    o = _t(spark, sf, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf, "lineitem")
    # per (orderkey): distinct suppliers and distinct LATE suppliers
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).cast("int"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    s = _t(spark, sf, "supplier")
    late_lines = lo.where(F.col("is_late") == 1)
    return (
        late_lines.join(per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
                        "l_orderkey")
        .join(F.broadcast(s), late_lines.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(50)
    )


# -- Q22: global sales opportunity ------------------------------------------
# phone country code -> c_nationkey; "positive-balance average" kept.
@query(
    "tpch_q22_idle_customers",
    """SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
              round(sum(c.c_acctbal), 4) AS totacctbal
       FROM customer c
       WHERE c.c_acctbal > (
           SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0)
         AND NOT EXISTS (
           SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
             AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
       GROUP BY c.c_nationkey ORDER BY c.c_nationkey""",
)
def tpch_q22(spark, sf):
    """TPC-H Q22: above-average-balance customers gone idle (no orders
    since 2000 — the dataset has orders for nearly every customer, so
    the idle window replaces TPC-H's "never ordered" test). Scalar avg
    broadcasts; the idle test is a left-anti join with the date filter
    pushed into the orders scan."""
    c = _t(spark, sf, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    o = _t(spark, sf, "orders").where(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )

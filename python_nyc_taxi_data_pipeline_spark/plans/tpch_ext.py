"""Extended TPC-H-shaped plans
(Q2/Q4/Q6/Q7/Q8/Q9/Q10/Q11/Q12/Q13/Q14/Q15/Q16/Q19/Q20/Q21/Q22 —
with Q1/Q3/Q5/Q13/Q15-core in `plans/tpch.py`, all 22 classic query
SHAPES are covered).

Widens the join/agg surface beyond `plans/tpch.py` with the remaining
classic shapes expressible over the trimmed fixture star schema (no
partsupp / commitdate / shipmode / phone / container columns, so each
query keeps the SHAPE — EXISTS, disjunctive predicates, conditional
aggregation, double aggregation over an outer join, NOT-IN anti-join,
scalar-subquery thresholds, per-group argmin, sole-blame lateness —
while substituting available columns).

Scale rules shared by all plans (the 100 TB stance):
- dims (part/supplier/customer/nation/region) broadcast — they stay
  1e-3 of the fact row count at every TPC-H scale factor;
- the only shuffles are fact-side aggregations on their group keys;
- date/brand/size predicates sit directly on the scan so parquet
  row-group stats and dictionary filters prune IO before the join;
- money sums accumulate in DECIMAL (order-independent → hash-stable)
  and report DOUBLE, matching the registry determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.scalars import decimal_sum
from ..registry import register

_TS = "timestamp_ntz"


def _ts(s: str):
    return F.lit(s).cast(_TS)


_DISC_PRICE_DEC = "decimal(18,4)"


def _disc_price():
    return (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        _DISC_PRICE_DEC
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("tpch", "semijoin", "agg"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join with a
    non-equi residual (shipped >60 days after ordering, standing in for
    the reference schema's commit/receipt lateness check), then a
    tiny-cardinality hash aggregate on priority."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-07-01 00:00:00"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "agg", "pushdown"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure pushdown showcase — scan→filter→scalar
    agg, no joins, no shuffle beyond the single-row final agg. All four
    predicates and the 2-column projection reach the parquet reader."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_DISC_PRICE_DEC))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM supplier s, lineitem l, orders o, customer c, nation n1, nation n2
    WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
      AND c.c_custkey = o.o_custkey AND s.s_nationkey = n1.n_nationkey
      AND c.c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.
    Both nation sides and supplier/customer broadcast; the symmetric
    OR-pair predicate is evaluated post-join on broadcast columns, and
    the only shuffle is orders⋈lineitem plus the final group-by."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           round(CAST(SUM(CASE WHEN nation = 'NATION_7' THEN vol ELSE 0 END)
                      AS DOUBLE)
                 / CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS vol,
             n2.n_name AS nation
      FROM lineitem l, orders o, customer c, supplier s, nation n1, nation n2,
           region r
      WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
        AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r.r_regionkey
        AND r.r_name = 'ASIA' AND l.l_suppkey = s.s_suppkey
        AND s.s_nationkey = n2.n_nationkey
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) t
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("tpch", "join", "conditional-agg"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a supplier nation's market share inside one
    region per year — conditional (CASE-filtered) aggregate over a
    6-way join divided by the unconditional aggregate in one pass.
    DECIMAL accumulation keeps both numerator and denominator exact,
    so the double division is hash-stable against the oracle."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n_cust = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    n_supp = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _disc_price()
    t = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("ns_key"))
        .select(
            F.year("o_orderdate").alias("o_year"), vol.alias("vol"), F.col("nation")
        )
    )
    num = F.sum(F.when(F.col("nation") == "NATION_7", F.col("vol")).otherwise(F.lit(0).cast(_DISC_PRICE_DEC)))
    den = F.sum(F.col("vol"))
    return (
        t.groupBy("o_year")
        .agg(F.round(num.cast("double") / den.cast("double"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c, orders o, lineitem l, nation n
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost revenue from returned items, top-20
    customers. The quarter filter prunes orders at the scan; the
    returnflag filter prunes lineitem; customer+nation broadcast; the
    sort is a TakeOrderedAndProject, never a global sort."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-04-01 00:00:00"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q12_priority_class",
    oracle="""
    SELECT l.l_linestatus,
           -- CAST: DuckDB SUM(int) is HUGEINT (pandas float64); Spark
           -- F.sum(when) is BIGINT (int64) — the driver hash is
           -- dtype-sensitive, so align to BIGINT on both sides.
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o, lineitem l
    WHERE o.o_orderkey = l.l_orderkey
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    tags=("tpch", "conditional-agg"),
)
def tpch_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: pivot-style conditional counts (urgent vs not,
    standing in for the reference schema's shipmode column) per line
    status. One fact-fact shuffle join, then a 3-group aggregate."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "outer-join", "agg"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: double aggregation over an outer join — order
    count per customer (join predicate filters the fact side, keeping
    zero-order customers), then the distribution of those counts. The
    second aggregate is tiny; the first shuffles on custkey once."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT round(
      100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
            / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                   AS DOUBLE), 6) AS promo_revenue
    FROM lineitem l, part p
    WHERE l.l_partkey = p.p_partkey
      AND l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("tpch", "conditional-agg"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue percentage — conditional/total
    ratio in a single aggregate pass over a broadcast part join."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _disc_price()
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", vol).otherwise(
            F.lit(0).cast(_DISC_PRICE_DEC)
        )
    )
    total = F.sum(vol)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * promo.cast("double") / total.cast("double"), 6
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s, revenue r
    WHERE s.s_suppkey = r.supplier_no
      AND r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    tags=("tpch", "subquery", "agg"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the reference's CREATE VIEW + scalar-max pattern.
    The per-supplier revenue aggregate plays the view; the scalar max is
    a 1-row broadcast cross join (no second scan of lineitem, the agg
    result is reused for both sides). DECIMAL accumulation makes the
    double equality against the max exact."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    s = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).cast("double").alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(best), F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l, part p
    WHERE p.p_partkey = l.l_partkey
      AND p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 15, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch", "anti-join", "distinct-agg"),
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part group with a
    NOT IN exclusion subquery (negative-balance suppliers standing in
    for the complaint-comment filter; lineitem stands in for partsupp).
    s_suppkey is non-null so NOT IN lowers to a broadcast anti-join.
    The distinct-agg expands to a two-phase aggregate on the JVM side."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 5, 9, 15, 23, 36, 45, 49))
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem l, part p
    WHERE p.p_partkey = l.l_partkey
      AND ((p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
            AND l.l_quantity BETWEEN 1 AND 11)
        OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
            AND l.l_quantity BETWEEN 10 AND 20)
        OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
            AND l.l_quantity BETWEEN 20 AND 30))
    """,
    tags=("tpch", "disjunctive"),
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs disjunctive predicate spanning both
    join sides. The common conjunct (the part join key) is the equi
    condition; the disjunction is the post-join residual. The brand/size
    part filter (union of the three brand clauses) is pushed to the
    broadcast side so the fact join stays narrow."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (
            (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
        )
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35))
    )
    clause = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
      SELECT substr(c_name, -2, 2) AS cntrycode, c_custkey, c_acctbal
      FROM customer
      WHERE substr(c_name, -2, 2) IN ('11', '17', '25', '31', '42', '56', '73')
    ), threshold AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / count(c_acctbal) AS avg_bal
      FROM eligible WHERE c_acctbal > 0.0
    )
    SELECT e.cntrycode, count(*) AS numcust,
           CAST(SUM(CAST(e.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM eligible e, threshold t
    WHERE e.c_acctbal > t.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = e.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY e.cntrycode
    ORDER BY e.cntrycode
    """,
    tags=("tpch", "anti-join", "subquery"),
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: substring-derived country code (last two digits
    of c_name standing in for the phone prefix), scalar-average
    threshold subquery (exact DECIMAL mean → hash-stable comparison),
    and a NOT EXISTS anti-join against recent orders (the fixture has
    no order-less customers, so "dormant since 1999" keeps the shape
    non-degenerate). The threshold is a 1-row broadcast; the anti-join
    shuffles on custkey only, with the date filter pushed to the scan."""
    codes = ("11", "17", "25", "31", "42", "56", "73")
    c = load(spark, sf_dir, "customer").select(
        F.substring("c_name", -2, 2).alias("cntrycode"), "c_custkey", "c_acctbal"
    )
    eligible = c.filter(F.col("cntrycode").isin(*codes))
    threshold = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1999-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        eligible.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            decimal_sum("c_acctbal", "totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), ranked AS (
      SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal, n.n_name,
             ROW_NUMBER() OVER (
               PARTITION BY p.p_partkey ORDER BY s.s_acctbal, s.s_suppkey
             ) AS rn
      FROM ps
      JOIN part p ON p.p_partkey = ps.l_partkey
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_size < 15
    )
    SELECT p_partkey, p_brand, s_name, s_acctbal, n_name
    FROM ranked WHERE rn = 1
    ORDER BY s_acctbal DESC, p_partkey
    LIMIT 100
    """,
    tags=("tpch", "argmin", "window"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part argmin supplier. The fixture schema has
    no partsupp/ps_supplycost, so the correlated MIN picks the
    lowest-acctbal supplier that ever shipped the part (ties broken by
    suppkey). Spark-first plan: the part→supplier pair set is DISTINCT
    lineitem keys (one shuffle, map-side combine), the per-part argmin
    is a row_number window over that deduped pair set (tiny vs
    lineitem), and part/supplier/nation are broadcast dims."""
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey"), F.col("l_suppkey"))
        .distinct()
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    from pyspark.sql import Window

    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        pairs.join(p, pairs.l_partkey == p.p_partkey)
        .join(s, pairs.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_brand", "s_name", "s_acctbal", "n_name")
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"))
        .limit(100)
    )


@register(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity
             AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "multijoin", "agg"),
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per order year across
    a 5-table join. No ps_supplycost in the fixture schema, so unit
    cost is modeled as 0.6 × p_retailprice (same expression tree on
    both engines → bit-identical doubles before the DECIMAL
    accumulation). The p_name filter is pushed into the broadcast part
    dim, pruning lineitem via the join; the only shuffle is the final
    (nation, year) aggregate."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
    WITH pv AS (
      SELECT l.l_partkey AS p_partkey,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(18,4))) AS value_dec
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    ), tot AS (
      SELECT CAST(SUM(value_dec) AS DOUBLE) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM pv
    )
    SELECT pv.p_partkey, CAST(pv.value_dec AS DOUBLE) AS part_value
    FROM pv, tot
    WHERE CAST(pv.value_dec AS DOUBLE) > tot.total / tot.n_parts * 1.5
    ORDER BY part_value DESC, p_partkey
    """,
    tags=("tpch", "scalar-subquery", "agg"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value vs a global scalar-subquery
    threshold (parts above 1.5× the MEAN part value of one nation's
    shipped volume — scale-invariant, so the result is non-empty at
    every SF, unlike the classic fixed fraction; value = discounted
    price standing in for ps_supplycost×availqty). The global
    total derives from the SAME per-part decimal aggregate —
    computed once, reused via a 1-row broadcast cross join, so the
    plan adds no second pass over lineitem."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    li = load(spark, sf_dir, "lineitem")
    pv = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_disc_price()).alias("value_dec"))
        .localCheckpoint(eager=True)  # computed once; reused by the
        # total AND the filter branch (lineitem is scanned exactly once)
    )
    tot = pv.agg(
        F.sum("value_dec").cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        pv.join(F.broadcast(tot))
        .filter(
            F.col("value_dec").cast("double")
            > F.col("total") / F.col("n_parts") * 1.5
        )
        .select(
            "p_partkey", F.col("value_dec").cast("double").alias("part_value")
        )
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


@register(
    "tpch_q20_excess_shippers",
    oracle="""
    WITH pq AS (
      SELECT l.l_partkey, l.l_suppkey,
             SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS pair_qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'cold%'
      GROUP BY l.l_partkey, l.l_suppkey
    ), marked AS (
      SELECT l_suppkey,
             CAST(pair_qty AS DOUBLE) AS pair_qty_d,
             CAST(SUM(pair_qty) OVER (PARTITION BY l_partkey) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY l_partkey) AS part_mean_d
      FROM pq
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM marked m
    JOIN supplier s ON s.s_suppkey = m.l_suppkey
    WHERE m.pair_qty_d > m.part_mean_d
    ORDER BY s.s_suppkey
    """,
    tags=("tpch", "semijoin", "window"),
)
def tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding "excess" share of a filtered
    part family (no ps_availqty in the fixture schema, so excess =
    shipped more of a 'cold%' part than that part's mean per-supplier
    quantity). Nested-subquery chain expressed Spark-first: one
    (part,supp) decimal aggregate, a per-part window mean over that
    SMALL aggregate (not over lineitem), then a distinct semi-join
    into the supplier dim."""
    from pyspark.sql import Window

    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("cold%"))
    li = load(spark, sf_dir, "lineitem")
    pq = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pair_qty"))
    )
    w = Window.partitionBy("l_partkey")
    marked = pq.select(
        "l_suppkey",
        F.col("pair_qty").cast("double").alias("pair_qty_d"),
        (
            F.sum("pair_qty").over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("part_mean_d"),
    )
    s = load(spark, sf_dir, "supplier")
    excess = marked.filter(F.col("pair_qty_d") > F.col("part_mean_d")).select(
        "l_suppkey"
    )
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ), per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
      FROM li GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM (SELECT DISTINCT l.l_orderkey, l.l_suppkey
          FROM li l WHERE l.late = 1) lw
    JOIN per_order po ON po.l_orderkey = lw.l_orderkey
    JOIN supplier s ON s.s_suppkey = lw.l_suppkey
    WHERE po.n_supp > 1 AND po.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    tags=("tpch", "antijoin", "agg"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely to blame for keeping a
    multi-supplier order waiting ("late" = shipped >90 days after the
    order date; the fixture schema has no receipt/commit dates). The
    classic EXISTS + NOT EXISTS pair collapses into ONE pass over
    lineitem: a (orderkey, suppkey) aggregate with a per-supplier late
    flag, then window counts over the order — so lineitem is scanned
    once and only order-sized aggregates shuffle again; no lineitem
    self-joins."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem").join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("int")
    per_pair = (
        li.select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late_any"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_pair.select(
        "l_orderkey",
        "l_suppkey",
        "late_any",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("late_any").over(w).alias("n_late"),
    )
    s = load(spark, sf_dir, "supplier")
    return (
        flagged.filter(
            (F.col("late_any") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )

"""TPC-H-shaped analytical plans over the fixture star schema.

The reference's gold layer is three single-join aggregates
(`/root/reference/src/sql/gold_aggregate_layer.sql`); these plans extend
the same operator set (scan→filter→join→agg→sort) to multi-join shapes
so the engine's join planning is exercised and benchmarked.

Scale notes per plan are in the docstrings; the common rules:
- only BOUNDED dims (region: 5 rows, nation: 25 rows) carry explicit
  broadcast hints. SF-scaled tables (customer/supplier/part/orders/
  lineitem and anything derived from them by filter or group-by) never
  do — the planner broadcasts them from file-size stats and AQE from
  runtime stats while they fit `autoBroadcastJoinThreshold`, and falls
  back to shuffle when they don't. A forced hint would pin a plan that
  dies at 100× SF;
- fact-fact joins (orders⋈lineitem) shuffle on the join key once, and
  AQE picks sort-merge vs shuffled-hash at runtime;
- date filters sit directly on the scan so parquet row-group min/max
  stats prune IO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out_if_narrow, load
from ..functions.scalars import decimal_avg, decimal_sum
from ..registry import register

# Products of two 2-dp values carry exactly 4 decimal digits, so we
# quantize at DECIMAL(18,4): the double approximation is ~1e-12 from an
# on-grid value, never at a rounding half-boundary — Spark (BigDecimal
# HALF_UP on the shortest decimal string) and DuckDB (binary scaling)
# then agree exactly. DECIMAL(18,2) would sit on x.xx5 boundaries where
# the two engines legitimately disagree.
_REVENUE = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"


def _revenue_col(alias: str):
    return (
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias(alias)
    )


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity), 2) AS avg_qty,
      round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice), 2) AS avg_price,
      round(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(l_discount), 4) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "agg"),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-pass scan→filter→hash-agg. The filter and
    the 7-column projection push into the parquet scan; partial (map-side)
    aggregation means the shuffle carries ≤ |groups|×|partitions| rows."""
    li = load(spark, sf_dir, "lineitem")
    flt = li.filter(
        F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp_ntz")
    )
    # fan_out_if_narrow (guide §2.5): the fixture's lineitem is one
    # parquet row group = ONE effective scan task, which serializes the
    # 8-aggregate decimal partial agg (~1.7 s of the 2.0 s warm time)
    # on a single core. Guarded: a no-op once the scan is wide. All
    # aggregates are decimal/integer (order-free), so the rebalance
    # cannot change the result.
    flt = fan_out_if_narrow(li, flt)
    return (
        flt
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            decimal_sum("l_quantity", "sum_qty"),
            decimal_sum("l_extendedprice", "sum_base_price"),
            _revenue_col("sum_disc_price"),
            F.sum(
                (
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                    * (F.lit(1) + F.col("l_tax"))
                ).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("sum_charge"),
            decimal_avg("l_quantity", "avg_qty"),
            decimal_avg("l_extendedprice", "avg_price"),
            decimal_avg("l_discount", "avg_disc", scale=4, dec="decimal(18,4)"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey, {_REVENUE} AS revenue, o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter joined to the orders fact
    → one shuffle join to lineitem → agg → top-k (no global sort).

    customer is SF-scaled, so no forced broadcast hint: the planner
    (file-size stats) / AQE (runtime stats) picks broadcast while the
    filtered side fits the threshold and falls back to shuffle when it
    doesn't — the 100 TB-safe default."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_revenue_col("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "fk_violations",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
    )
    """,
    tags=("join", "validation"),
)
def fk_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — FK integrity as a validation anti-join (the reference
    declares FKs, `db_setup.py:185,191,195`; Spark validates instead of
    enforcing). Empty result = clean data. customer is SF-scaled, so the
    anti-join carries no broadcast hint — AQE broadcasts while the key
    column fits, shuffles when it doesn't."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey")
    return o.select("o_orderkey", "o_custkey").join(
        c, o.o_custkey == c.c_custkey, "left_anti"
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
    tags=("tpch", "subquery"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into an aggregate + join — the standard Spark plan;
    Catalyst performs the same rewrite for the SQL form."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c, orders o, lineitem l
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
      )
      AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    tags=("tpch", "having", "semijoin"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: GROUP BY + HAVING feeding a semi-join, then the
    3-way join and top-k.

    No forced broadcast hints: the HAVING set and customer both scale
    with SF, so AQE decides from runtime sizes. The join ORDER is the
    scale lever — the semi-join prunes orders first, so the surviving
    (tiny, data-dependent) orders side is what joins customer and then
    lineitem; AQE broadcasts that side at runtime and lineitem never
    shuffles. Forcing broadcast(customer) here (the r3 plan) would blow
    the driver at 100× SF."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name, {_REVENUE} AS revenue
    FROM customer c, orders o, lineitem l, supplier s, nation n, region r
    WHERE c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey
      AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. nation/region are bounded (25/5 rows)
    and keep explicit broadcast hints; supplier/customer are SF-scaled,
    so their joins carry no hint and the planner/AQE picks broadcast
    only while they actually fit. orders⋈lineitem shuffles once. The
    c_nationkey = s_nationkey residual is a non-equi conjunct Catalyst
    evaluates post-join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue_col("revenue"))
        .orderBy(F.desc("revenue"))
    )

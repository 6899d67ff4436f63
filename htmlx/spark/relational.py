"""Relational query surface over the TPC-H-style tables (SURVEY.md §2.4-2.8).

The reference is an HTML library, so these operators have no reference
counterpart — they exist to exercise (and pin, via DuckDB oracles) the
engine's join / aggregation / window surface with the classic shapes a
100 TB warehouse workload uses: partial-aggregate rollups, broadcast dim
joins, multi-way fact joins, and per-group top-k windows.

Float parity rule: money/rate inputs are cast to DECIMAL up front and ALL
arithmetic and summation happens in exact decimal — order-independent, so
Spark's partial-aggregation order can never diverge from DuckDB's, and no
double-to-decimal rounding of computed products exists anywhere (that cast
is engine-divergent on boundary values; measured on this corpus).

Output representation rule (round-2 VERDICT fix): the FINAL decimal
aggregates are rounded to 2dp and cast to DOUBLE on both engines. Decimal
values hash engine-specifically at the driver gate (Spark emits
DECIMAL(22,2), DuckDB DECIMAL(38,2); pandas conversion diverges further),
while a double is a double everywhere. The conversion is deterministic:
the rounded sum is an exact decimal with unscaled value < 2^53, so both
engines' decimal->double casts are the same correctly-rounded IEEE value
(exact integer conversion + one correctly-rounded division by 100).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

# Inputs are 2-decimal money/rate values stored as DOUBLE; cast them to
# DECIMAL(12,2) FIRST (unambiguous — the doubles sit ~1e-13 from their 2dp
# values), then all arithmetic is exact decimal with pinned scales. Casting
# double PRODUCTS to decimal instead is engine-divergent on rare boundary
# values (Spark rounds the exact binary expansion, DuckDB rounds the
# double*10^scale product).
D2 = "decimal(12, 2)"
D4 = "decimal(18, 4)"
D6 = "decimal(24, 6)"


def _disc_price():
    from pyspark.sql import functions as F

    p = F.col("l_extendedprice").cast(D2)
    d = F.col("l_discount").cast(D2)
    return (p * (1 - d)).cast(D4)


def _d2d(c):
    """Hash-stable output form for an exact decimal aggregate: round to 2dp
    (HALF_UP on both engines for positive money values), cast to DOUBLE."""
    return F.round(c, 2).cast("double")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: big-fact rollup with map-side partial aggregation —
    the canonical 'scan 100 TB, shuffle only the group cells' query."""
    # NO spread of the fact scan, deliberately (r10, measured): at bench
    # SFs the 600k-row lineitem round-robin exchange costs ~0.4-0.7 s on
    # a FIRST run (1.83-2.13 s nospread vs 2.27-3.10 s spread, 3/3 fresh
    # sessions) and only pays for itself on warm re-runs; at real scale
    # the scan is already parallel and the question vanishes. AQE alone
    # keeps the post-agg exchange right-sized.
    li = _t(spark, sf_dir, "lineitem")
    disc_price = _disc_price()
    charge = (disc_price * (1 + F.col("l_tax").cast(D2))).cast(D6)
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _d2d(F.sum(F.col("l_quantity").cast(D2))).alias("sum_qty"),
            _d2d(F.sum(F.col("l_extendedprice").cast(D2))).alias("sum_base_price"),
            _d2d(F.sum(disc_price)).alias("sum_disc_price"),
            _d2d(F.sum(charge)).alias("sum_charge"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


def top_revenue_orders(spark: SparkSession, sf_dir: str, segment: str = "BUILDING", k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> revenue rollup
    -> deterministic top-k. customer is small relative to the facts and
    broadcast explicitly."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == segment)
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = _disc_price()
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate").agg(F.sum(revenue).alias("revenue"))
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(k)
        .select("o_orderkey", "o_orderdate", _d2d(F.col("revenue")).alias("revenue"))
    )


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: multi-way join with broadcast dimension chain
    (region -> nation -> customer) into the fact tables; revenue per
    nation. Dim joins broadcast; only the facts shuffle."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = _disc_price()
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        orders.join(F.broadcast(dims), orders.o_custkey == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("r_name", "n_name")
        .agg(
            _d2d(F.sum(revenue)).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
    )


def top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-1 window (the dedup/top-k pattern at warehouse scale):
    each customer's highest-value order, deterministic tie-break."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").cast("long").alias("custkey"),
            F.col("o_orderkey").cast("long").alias("orderkey"),
            "o_totalprice",
        )
    )


O_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(12,2))) AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_charge,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY 1, 2
"""

O_TOP_REVENUE_ORDERS = """
SELECT o_orderkey, o_orderdate, CAST(round(revenue, 2) AS DOUBLE) AS revenue
FROM (
  SELECT o.o_orderkey, o.o_orderdate,
         sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
  ORDER BY revenue DESC, o.o_orderkey
  LIMIT 10
)
"""

O_REGIONAL_REVENUE = """
SELECT r.r_name, n.n_name,
       CAST(round(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
"""

O_TOP_ORDER_PER_CUSTOMER = """
SELECT CAST(o_custkey AS BIGINT) AS custkey,
       CAST(o_orderkey AS BIGINT) AS orderkey, o_totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) = 1
"""


def regional_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregation (region -> nation -> total): the
    classic warehouse subtotal shape — one pass, partial aggregation per
    grouping set, NULL-marked subtotal rows. Money math follows the module
    rule: exact decimal internally, round+DOUBLE out."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cust = _t(spark, sf_dir, "customer")
    acct = F.col("c_acctbal").cast(D2)
    dims = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        dims.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            _d2d(F.sum(acct)).alias("sum_acctbal"),
        )
    )


O_REGIONAL_ROLLUP = """
SELECT r.r_name, n.n_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
"""


def events_distribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group distribution stats with ORDER-INDEPENDENT math: count,
    mean and sample stddev are all derived from exact-decimal sum and
    sum-of-squares (value is a 2dp money-like double -> DECIMAL(12,2);
    its square has scale 4, exactly representable), so partial-aggregation
    order can never flip a bit. The float appears only in the final
    per-row sqrt/round over identical inputs on both engines."""
    events = _t(spark, sf_dir, "events")
    v = F.col("value").cast(D2)
    vv = (v * v).cast("decimal(24, 4)")
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).alias("__s"),
        F.sum(vv).alias("__ss"),
    )
    n = F.col("n")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    # clamp: for a (near-)constant group the residual ss - s^2/n is float
    # noise of either sign; DuckDB's sqrt RAISES on negatives while Spark
    # returns NaN, so both sides clamp to 0 before the root
    var = F.greatest((ss - s * s / n) / (n - 1), F.lit(0.0))
    return agg.select(
        "event_type",
        "n",
        F.round(s / n, 4).alias("mean_value"),
        F.round(F.sqrt(var), 4).alias("stddev_value"),
    )


O_EVENTS_DISTRIBUTION = """
SELECT event_type, n,
       round(s / n, 4) AS mean_value,
       round(sqrt(greatest((ss - s * s / n) / (n - 1), 0)), 4) AS stddev_value
FROM (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s,
         CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)) AS DECIMAL(24,4))) AS DOUBLE) AS ss
  FROM events GROUP BY 1)
"""

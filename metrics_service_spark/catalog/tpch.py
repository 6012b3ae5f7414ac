"""TPC-H-style relational benchmarks on the driver tables.

These are the bench headliners: classic scan-heavy aggregation (q1),
multi-join top-k (q3-style), and a 6-table snowflake join (q5-style),
adapted to the driver schema (orders has o_orderpriority, not
o_shippriority; dates span 1995-2001).

All money aggregates go through DECIMAL(18,2) so results are exact and
order-independent (comparable against DuckDB bit-for-bit after the
final cast to double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metrics_service_spark.catalog import QuerySpec
from metrics_service_spark.functions.stable import round_frac, sql_round_frac
from metrics_service_spark.sources.tables import load_table


def _dec(col: str):
    return F.col(col).cast("decimal(18,2)")


# --- q1: pricing summary (scan + groupBy, the throughput benchmark) ------
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            # exact-integer rounding (functions/stable.py): DECIMAL sums
            # x100 are integers, so the 4-dp rounding never touches a
            # double half-boundary on either engine
            round_frac(F.sum(_dec("l_quantity")) * 100, n * 100, 4).alias("avg_qty"),
            round_frac(F.sum(_dec("l_extendedprice")) * 100, n * 100, 4).alias("avg_price"),
            round_frac(F.sum(_dec("l_discount")) * 100, n * 100, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


ORACLE_Q1 = f"""
SELECT l_returnflag, l_linestatus,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
  {sql_round_frac("sum(CAST(l_quantity AS DECIMAL(18,2))) * 100", "count(*) * 100", 4)} AS avg_qty,
  {sql_round_frac("sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100", "count(*) * 100", 4)} AS avg_price,
  {sql_round_frac("sum(CAST(l_discount AS DECIMAL(18,2))) * 100", "count(*) * 100", 4)} AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- q3-style: shipping priority top-10 ----------------------------------
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


ORACLE_Q3 = """
SELECT l_orderkey,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
  o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- q5-style: local supplier volume (6-table snowflake) -----------------
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(revenue), 2).cast("double").alias("revenue")
    )


ORACLE_Q5 = """
SELECT n_name,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


QUERIES: dict[str, QuerySpec] = {
    "tpch_q1": QuerySpec(q_tpch_q1, ORACLE_Q1, "pricing summary scan/agg", ("tpch",)),
    "tpch_q3": QuerySpec(q_tpch_q3, ORACLE_Q3, "top-10 multi-join", ("tpch",)),
    "tpch_q5": QuerySpec(q_tpch_q5, ORACLE_Q5, "6-table snowflake join", ("tpch",)),
}


# --- q6: forecast revenue change (pure scan, tight filter) ---------------
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (_dec("l_discount").between(
                F.lit("0.05").cast("decimal(18,2)"), F.lit("0.07").cast("decimal(18,2)")
            ))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
            .cast("double")
            .alias("revenue")
        )
    )


ORACLE_Q6 = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(18,2))
      BETWEEN CAST('0.05' AS DECIMAL(18,2)) AND CAST('0.07' AS DECIMAL(18,2))
  AND l_quantity < 24
"""


# --- q12: shipping modes / priority classes (join + conditional agg) -----
# driver schema has no l_shipmode; class on o_orderpriority instead,
# bucketing lineitems by ship year — same join + CASE-sum shape as q12
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy").alias("ship_year"))
        .agg(
            F.count(F.when(is_high, 1)).alias("high_line_count"),
            F.count(F.when(~is_high, 1)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT strftime(l_shipdate, '%Y') AS ship_year,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""

QUERIES["tpch_q6"] = QuerySpec(q_tpch_q6, ORACLE_Q6, "pure-scan filter agg", ("tpch",))
QUERIES["tpch_q12"] = QuerySpec(
    q_tpch_q12, ORACLE_Q12, "join + conditional agg", ("tpch",)
)


# --- q14: promo revenue share (join + conditional decimal ratio) ---------
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc_price = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            round_frac(
                F.sum(promo) * 1000000, F.sum(disc_price) * 10000, 4
            ).alias("promo_revenue_pct")
        )
    )


ORACLE_Q14 = f"""
SELECT {sql_round_frac("sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) ELSE CAST(0 AS DECIMAL(18,2)) END) * 1000000", "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000", 4)} AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""

QUERIES["tpch_q14"] = QuerySpec(
    q_tpch_q14, ORACLE_Q14, "promo revenue ratio (lineitem x part)", ("tpch",)
)


# --- q4-style: order priority checking (EXISTS semi-join) -----------------
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in a quarter with at least one RETURNED lineitem (the
    EXISTS subquery of classic q4, with the late-delivery predicate
    adapted to the driver schema's l_returnflag — lineitem carries no
    commit/receipt dates) -> left_semi join, counted per priority.
    The semi-join deduplicates multi-lineitem matches without a
    distinct."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    late = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(late, orders["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""

QUERIES["tpch_q4"] = QuerySpec(
    q_tpch_q4, ORACLE_Q4, "EXISTS semi-join order priority check", ("tpch",)
)


# --- q18-style: large-volume customers (HAVING subquery join-back) --------
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose single order exceeds a quantity threshold: the
    HAVING-subquery key set joins back to orders/customer.  The inner
    aggregate is the only corpus-sized shuffle; the key set is small
    and drives broadcast join-backs."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(_dec("l_quantity")), 2).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 250)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
    )


ORACLE_Q18 = """
WITH big AS (
  SELECT l_orderkey,
         round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS sum_qty_dec
  FROM lineitem GROUP BY 1
  HAVING round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) > 250
)
SELECT c_name, o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(sum_qty_dec AS DOUBLE) AS sum_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
"""

QUERIES["tpch_q18"] = QuerySpec(
    q_tpch_q18, ORACLE_Q18, "HAVING-subquery large orders join-back", ("tpch",)
)


# --- q10-style: returned-item customer revenue top-20 ---------------------
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue from returned items in a quarter:
    join + decimal agg + deterministic top-k (TakeOrderedAndProject —
    per-partition top-N + driver merge, never a global sort)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name, n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

QUERIES["tpch_q10"] = QuerySpec(
    q_tpch_q10, ORACLE_Q10, "returned-item revenue top-20", ("tpch",)
)


# --- q19-style: disjunctive predicate pushdown (lineitem x part) ----------
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under an OR-of-ANDs predicate spanning both
    join sides — classic q19 shape (p_container adapted out: the driver
    part table carries brand/size/type).  Catalyst splits the common
    conjuncts to each scan and evaluates the disjunction post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li["l_partkey"] == part["p_partkey"])
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 20)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(20, 30)
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return joined.filter(cond).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


ORACLE_Q19 = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)
"""

QUERIES["tpch_q19"] = QuerySpec(
    q_tpch_q19, ORACLE_Q19, "disjunctive-predicate revenue (q19 shape)", ("tpch",)
)


# =========================================================================
# Round 3: the remaining 12 classic shapes, completing all 22 TPC-H
# queries.  The driver schema has no partsupp table and no
# phone/comment/commit-date columns, so q2/q9/q11/q16/q20/q21/q22 keep
# the classic query SHAPE (correlated min, scalar subquery, nested agg,
# EXISTS/NOT EXISTS, histogram-of-counts) with the part<->supplier
# relationship bridged through lineitem and the text predicates adapted
# to existing columns.  Money stays in DECIMAL(18,2); every
# double-valued comparison derives from identical decimal inputs on
# both engines so results are bit-stable.
# =========================================================================


# --- q2-style: minimum-cost supplier per part (correlated MIN) -----------
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic q2 correlated-min: for each LARGE part, the EUROPE
    supplier(s) whose cheapest shipped line (min extendedprice, exact
    decimal) equals the part's regional minimum.  partsupp is bridged
    via lineitem; the min-per-part aggregate joins back on exact
    decimal equality (never a float compare)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    li = load_table(spark, sf_dir, "lineitem")
    bridge = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name",
            _dec("l_extendedprice").alias("cost_dec"),
        )
    )
    min_cost = bridge.groupBy(F.col("p_partkey").alias("mc_partkey")).agg(
        F.min("cost_dec").alias("min_cost_dec")
    )
    return (
        bridge.join(
            F.broadcast(min_cost),
            (F.col("p_partkey") == F.col("mc_partkey"))
            & (F.col("cost_dec") == F.col("min_cost_dec")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("min_cost_dec").cast("double").alias("min_cost"),
        )
        .distinct()
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name").asc(),
            F.col("s_name").asc(), F.col("p_partkey").asc(),
        )
        .limit(100)
    )


ORACLE_Q2 = """
WITH bridge AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS cost_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  JOIN part ON l_partkey = p_partkey
  WHERE r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size <= 15
),
mc AS (SELECT p_partkey AS mc_partkey, min(cost_dec) AS min_cost_dec
       FROM bridge GROUP BY 1)
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(min_cost_dec AS DOUBLE) AS min_cost
FROM bridge JOIN mc ON p_partkey = mc_partkey AND cost_dec = min_cost_dec
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

QUERIES["tpch_q2"] = QuerySpec(
    q_tpch_q2, ORACLE_Q2, "correlated-min cheapest supplier per part", ("tpch",)
)


# --- q7-style: volume shipping between two nations ------------------------
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nation-pair trade volume per ship year (classic q7):
    lineitem x orders x customer x supplier with two nation lookups and
    the (n1,n2)|(n2,n1) disjunctive pair filter."""
    n1 = "NATION_1"
    n2 = "NATION_2"
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("l_year"),
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


ORACLE_Q7 = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       strftime(l_shipdate, '%Y') AS l_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""

QUERIES["tpch_q7"] = QuerySpec(
    q_tpch_q7, ORACLE_Q7, "nation-pair trade volume by year", ("tpch",)
)


# --- q8-style: national market share --------------------------------------
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share of one supplier nation within a customer region for
    one product type, per order year (classic q8 conditional-ratio)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    target = F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        joined.groupBy(F.date_format("o_orderdate", "yyyy").alias("o_year"))
        .agg(
            round_frac(
                F.sum(target) * 10000, F.sum(vol) * 10000, 6
            ).alias("mkt_share")
        )
    )


ORACLE_Q8 = f"""
SELECT strftime(o_orderdate, '%Y') AS o_year,
       {sql_round_frac("sum(CASE WHEN sn.n_name = 'NATION_2' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) ELSE CAST(0 AS DECIMAL(18,2)) END) * 10000", "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000", 6)} AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""

QUERIES["tpch_q8"] = QuerySpec(
    q_tpch_q8, ORACLE_Q8, "national market share ratio", ("tpch",)
)


# --- q9-style: product-type profit by nation and year ---------------------
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic q9 profit rollup (supplier nation x order year) for parts
    matching a name substring.  ps_supplycost is absent, so cost is
    p_retailprice x quantity (exact decimal product); profit stays an
    exact decimal difference."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    cost = _dec("p_retailprice") * _dec("l_quantity")
    amount = disc_price - cost
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
    )


ORACLE_Q9 = """
SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                      - CAST(p_retailprice AS DECIMAL(18,2)) *
                        CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""

QUERIES["tpch_q9"] = QuerySpec(
    q_tpch_q9, ORACLE_Q9, "profit by supplier nation and year", ("tpch",)
)


# --- q11-style: important part value (scalar-subquery HAVING) -------------
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value from one nation's suppliers exceeds a
    fraction of that nation's total (classic q11 scalar-subquery
    HAVING).  The 1-row total broadcasts; the fraction compare runs in
    double on identical decimal inputs in both engines."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    li = load_table(spark, sf_dir, "lineitem")
    val = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    base = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("l_partkey").alias("ps_partkey"), val.alias("val_dec"))
    )
    per_part = base.groupBy("ps_partkey").agg(F.sum("val_dec").alias("part_val_dec"))
    total = base.agg(F.sum("val_dec").alias("total_val_dec"))
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("part_val_dec").cast("double")
            > F.col("total_val_dec").cast("double") * 0.001
        )
        .select(
            "ps_partkey",
            F.round(F.col("part_val_dec"), 2).cast("double").alias("part_value"),
        )
    )


ORACLE_Q11 = """
WITH base AS (
  SELECT l_partkey AS ps_partkey,
         CAST(l_extendedprice AS DECIMAL(18,2)) *
         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS val_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT ps_partkey,
       CAST(round(sum(val_dec), 2) AS DOUBLE) AS part_value
FROM base
GROUP BY 1
HAVING CAST(sum(val_dec) AS DOUBLE) >
       (SELECT CAST(sum(val_dec) AS DOUBLE) FROM base) * 0.001
"""

QUERIES["tpch_q11"] = QuerySpec(
    q_tpch_q11, ORACLE_Q11, "scalar-subquery HAVING part value", ("tpch",)
)


# --- q13-style: customer order-count distribution -------------------------
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of orders-per-customer (classic q13): left outer join
    with an ON-clause predicate (priority class stands in for the
    comment NOT LIKE), count non-null per customer, then histogram the
    counts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORACLE_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

QUERIES["tpch_q13"] = QuerySpec(
    q_tpch_q13, ORACLE_Q13, "orders-per-customer histogram", ("tpch",)
)


# --- q15-style: top supplier (revenue == MAX scalar subquery) -------------
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) whose quarterly revenue equals the global max
    (classic q15 view + scalar subquery).  Exact decimal equality
    against the broadcast 1-row max — float-compare-free."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).alias("total_rev_dec")
    )
    max_rev = revenue.agg(F.max("total_rev_dec").alias("max_rev_dec"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_rev_dec") == F.col("max_rev_dec"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("total_rev_dec"), 2).cast("double").alias("total_revenue"),
        )
    )


ORACLE_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name,
       CAST(round(total_rev_dec, 2) AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_rev_dec = (SELECT max(total_rev_dec) FROM revenue)
"""

QUERIES["tpch_q15"] = QuerySpec(
    q_tpch_q15, ORACLE_Q15, "top supplier via MAX scalar subquery", ("tpch",)
)


# --- q16-style: supplier-part relationship counts (NOT IN anti-join) ------
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per (brand, type, size) over the
    lineitem-bridged part-supplier relation, excluding flagged
    suppliers via NOT IN (classic q16; negative account balance stands
    in for the complaints comment filter)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        pairs.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand").asc(),
            F.col("p_type").asc(), F.col("p_size").asc(),
        )
    )


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

QUERIES["tpch_q16"] = QuerySpec(
    q_tpch_q16, ORACLE_Q16, "distinct-supplier counts with NOT IN", ("tpch",)
)


# --- q17-style: small-quantity-order revenue (correlated AVG) -------------
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-yearly revenue from lines under 20% of the part's mean
    quantity (classic q17 correlated-avg).  The per-part mean derives
    from an exact decimal sum/count so the double threshold is
    bit-identical in both engines."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = (
        joined.groupBy(F.col("p_partkey").alias("aq_partkey"))
        .agg(
            F.sum(_dec("l_quantity")).alias("qty_sum_dec"),
            F.count(F.lit(1)).alias("qty_n"),
        )
        .select(
            "aq_partkey",
            (F.col("qty_sum_dec").cast("double") / F.col("qty_n")).alias("avg_qty"),
        )
    )
    return (
        joined.join(F.broadcast(avg_qty), F.col("p_partkey") == F.col("aq_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            round_frac(F.sum(_dec("l_extendedprice")) * 100, F.lit(700), 2).alias(
                "avg_yearly"
            )
        )
    )


ORACLE_Q17 = f"""
WITH joined AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#5'
),
aq AS (
  SELECT l_partkey AS aq_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
  FROM joined GROUP BY 1
)
SELECT {sql_round_frac("sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100", "700", 2)}
       AS avg_yearly
FROM joined JOIN aq ON l_partkey = aq_partkey
WHERE l_quantity < 0.2 * avg_qty
"""

QUERIES["tpch_q17"] = QuerySpec(
    q_tpch_q17, ORACLE_Q17, "correlated-avg small-quantity revenue", ("tpch",)
)


# --- q20-style: excess suppliers (nested agg + semi-join chain) -----------
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped more than 30% of a small-part's 1996 total
    (classic q20 nested-aggregate semi-join; availqty > half-of-shipped
    becomes share-of-shipped with partsupp bridged via lineitem)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    small_li = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    per_pair = small_li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("pair_qty_dec")
    )
    per_part = small_li.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum(_dec("l_quantity")).alias("part_qty_dec")
    )
    excess = (
        per_pair.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pt_partkey"))
        .filter(
            F.col("pair_qty_dec").cast("double")
            > F.col("part_qty_dec").cast("double") * 0.3
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


ORACLE_Q20 = """
WITH small_li AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
),
per_pair AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS pair_qty_dec
  FROM small_li GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey AS pt_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS part_qty_dec
  FROM small_li GROUP BY 1
),
excess AS (
  SELECT DISTINCT l_suppkey
  FROM per_pair JOIN per_part ON l_partkey = pt_partkey
  WHERE CAST(pair_qty_dec AS DOUBLE) > CAST(part_qty_dec AS DOUBLE) * 0.3
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM excess)
ORDER BY s_name
"""

QUERIES["tpch_q20"] = QuerySpec(
    q_tpch_q20, ORACLE_Q20, "nested-agg excess-supplier semi-join", ("tpch",)
)


# --- q21-style: suppliers who kept orders waiting (EXISTS/NOT EXISTS) -----
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic q21 EXISTS + NOT-EXISTS: for finalized orders, the sole
    supplier whose line returned 'R' while other suppliers' lines did
    not (returnflag stands in for the receipt>commit lateness test).
    Expressed as one per-order aggregate (distinct-supplier counts)
    re-joined to the R-flag supplier set — two shuffles total, no
    correlated per-row probes."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li_f = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    per_order = li_f.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_supp_r"),
    )
    r_pairs = (
        li_f.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    waiting = (
        r_pairs.join(
            per_order,
            (F.col("l_orderkey") == F.col("po_orderkey"))
            & (F.col("n_supp") > 1)
            & (F.col("n_supp_r") == 1),
        )
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


ORACLE_Q21 = """
WITH li_f AS (
  SELECT l_orderkey, l_suppkey, l_returnflag
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
),
per_order AS (
  SELECT l_orderkey AS po_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_supp_r
  FROM li_f GROUP BY 1
),
r_pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM li_f WHERE l_returnflag = 'R'
)
SELECT s_name, n_name, count(*) AS numwait
FROM r_pairs
JOIN per_order ON l_orderkey = po_orderkey AND n_supp > 1 AND n_supp_r = 1
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""

QUERIES["tpch_q21"] = QuerySpec(
    q_tpch_q21, ORACLE_Q21, "EXISTS/NOT-EXISTS waiting suppliers", ("tpch",)
)


# --- q22-style: global sales opportunity (anti-join + scalar AVG) ---------
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic q22: rich-but-inactive customers per country code.
    Nation key stands in for the phone prefix; the above-average-balance
    threshold is a broadcast scalar from exact decimal sums; inactivity
    is an anti-join against RECENT orders (classic q22's "no orders in
    the last N years" — every customer in this data has SOME order, so
    an unscoped anti-join would be vacuously empty)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(0, 3, 7, 11, 14, 17, 21)
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


ORACLE_Q22 = """
WITH cust AS (
  SELECT c_custkey, c_nationkey, c_acctbal
  FROM customer
  WHERE c_nationkey IN (0, 3, 7, 11, 14, 17, 21)
),
avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
  FROM cust WHERE c_acctbal > 0
)
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
FROM cust, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY 1
ORDER BY 1
"""

QUERIES["tpch_q22"] = QuerySpec(
    q_tpch_q22, ORACLE_Q22, "anti-join rich inactive customers", ("tpch",)
)

"""Decision-support query shapes (TPC-H-derived) over the driver tables.

Round-6 extension: the classic join-heavy TPC-H patterns re-expressed on
the simplified schemas (no partsupp / commit / receipt dates — date
predicates adapt to ``l_shipdate`` vs ``o_orderdate`` lateness).  These
exercise exactly the planner behaviors that matter at 100 TB: join
ordering, semi/anti decorrelation, agg-before-join, broadcast of
filtered dims, and scalar-subquery broadcasting.

Every query keeps the repo's bit-exactness contract: money through
exact integer cents, total-order tiebreaks on every top-k, ints for
years/counts.  Registered into the same ``QUERIES``/``ORACLES`` registry
as queries.py via the shared ``@query`` decorator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdfs_stream_processing_spark.queries import cents_sum, prep, query

# revenue in exact cents: both engines compute the identical double
# product l_extendedprice*(1-l_discount) before the single round —
# bit-exact across Spark and DuckDB (same IEEE754 ops, same order).
_REV_CENTS_SQL = "CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0) AS BIGINT)"


def _rev_cents() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0), 0
    ).cast("long")


@query(
    "ship_priority",
    f"""SELECT l_orderkey, o_orderdate,
              CAST(SUM({_REV_CENTS_SQL}) AS DOUBLE) / 100.0 AS revenue
       FROM customer
       JOIN orders   ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-07-01'
         AND l_shipdate  > TIMESTAMP '1998-07-01'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY SUM({_REV_CENTS_SQL}) DESC, l_orderkey
       LIMIT 10""",
)
def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): unshipped revenue of BUILDING
    orders placed before the cutoff, top-10 by revenue.

    Scale plan: both selective filters sit on the scans (segment prunes
    customer 5x, the date prunes orders), the filtered customer keylist
    broadcasts onto orders, and the final ORDER BY+LIMIT is a
    TakeOrderedAndProject — no global sort of the aggregate.  Exact-cent
    ordering key with an orderkey tiebreak gives a total order."""
    customer, orders, lineitem = prep(spark, sf_dir, "customer", "orders", "lineitem")
    cust = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = orders.where(F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    items = lineitem.where(F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp"))
    joined = items.join(
        ords.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")).select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(_rev_cents()).alias("_cents")
    )
    return (
        agg.orderBy(F.col("_cents").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "o_orderdate",
            (F.col("_cents").cast("double") / F.lit(100.0)).alias("revenue"),
        )
    )


@query(
    "late_ship_priority",
    """SELECT o_orderpriority, count(*) AS n_late
       FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
       GROUP BY o_orderpriority""",
)
def q_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS decorrelation): orders with at least one
    line shipped >90 days after order date, counted per priority class.

    The correlated EXISTS becomes a LEFT SEMI join — Catalyst never
    materializes the multiplicity of matching lines, so the 100 TB
    lineitem contributes only a deduplicated orderkey stream to the
    semi-join probe.  (No commit/receipt dates in this schema; lateness
    is shipdate vs orderdate.)"""
    orders, lineitem = prep(spark, sf_dir, "orders", "lineitem")
    late = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_late"))


@query(
    "nation_trade",
    f"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
              CAST(year(o_orderdate) AS INT) AS o_year,
              CAST(SUM({_REV_CENTS_SQL}) AS DOUBLE) / 100.0 AS revenue
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation sn ON s_nationkey = sn.n_nationkey
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey  = c_custkey
       JOIN nation cn ON c_nationkey = cn.n_nationkey
       WHERE sn.n_name IN ('NATION_1', 'NATION_2')
         AND cn.n_name IN ('NATION_1', 'NATION_2')
         AND sn.n_name <> cn.n_name
       GROUP BY sn.n_name, cn.n_name, year(o_orderdate)""",
)
def q_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade revenue between
    two nations by year.

    Scale plan: nation filters push into BOTH dimension scans before
    their (broadcast) joins — supplier and customer shrink to 2/25 of
    their rows before touching the facts; the cross-nation inequality
    applies after the two small joins, never as a cross product."""
    lineitem, supplier, nation, orders, customer = prep(
        spark, sf_dir, "lineitem", "supplier", "nation", "orders", "customer"
    )
    nat = nation.where(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = supplier.join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sk"),
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("ck"),
    ).select("c_custkey", "cust_nation")
    joined = (
        lineitem.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "o_year")
        .agg(cents_sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"))
    )


@query(
    "market_share",
    f"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
              CAST(SUM(CASE WHEN sn.n_name = 'NATION_2' THEN {_REV_CENTS_SQL} ELSE 0 END) AS DOUBLE)
                / CAST(SUM({_REV_CENTS_SQL}) AS DOUBLE) AS mkt_share
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation sn ON s_nationkey = sn.n_nationkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation cn ON c_nationkey = cn.n_nationkey
       JOIN region ON cn.n_regionkey = r_regionkey
       WHERE r_name = 'ASIA' AND p_type = 'PROMO'
       GROUP BY year(o_orderdate)""",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_2's share of PROMO
    revenue sold into ASIA, per year — numerator and denominator in ONE
    aggregate pass via a conditional cent sum (no second scan, no join
    of two aggregates).

    Scale plan: the p_type filter prunes part before its broadcast; the
    region filter prunes the customer-side nation dim; the share is a
    single double division of two exact longs."""
    lineitem, part, supplier, nation, orders, customer, region = prep(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders", "customer", "region"
    )
    promo = part.where(F.col("p_type") == "PROMO").select("p_partkey")
    supp = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sk"),
    ).select("s_suppkey", "supp_nation")
    asia = region.where(F.col("r_name") == "ASIA").select("r_regionkey")
    asia_nat = nation.join(F.broadcast(asia), F.col("n_regionkey") == F.col("r_regionkey")).select(
        F.col("n_nationkey").alias("ck")
    )
    cust = customer.join(F.broadcast(asia_nat), F.col("c_nationkey") == F.col("ck")).select(
        "c_custkey"
    )
    joined = (
        lineitem.join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    nation2 = F.when(F.col("supp_nation") == "NATION_2", _rev_cents()).otherwise(F.lit(0))
    return (
        joined.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            (F.sum(nation2).cast("double") / F.sum(_rev_cents()).cast("double")).alias(
                "mkt_share"
            )
        )
    )


@query(
    "returned_revenue",
    f"""SELECT c_custkey, c_name,
              CAST(SUM({_REV_CENTS_SQL}) AS DOUBLE) / 100.0 AS revenue,
              c_acctbal, n_name
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
         AND o_orderdate >= TIMESTAMP '1999-01-01'
         AND o_orderdate <  TIMESTAMP '1999-04-01'
       GROUP BY c_custkey, c_name, c_acctbal, n_name
       ORDER BY SUM({_REV_CENTS_SQL}) DESC, c_custkey
       LIMIT 20""",
)
def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue lost to returns in one quarter.

    Scale plan: the quarter filter prunes orders at the scan; returns
    filter prunes lineitem; the grouped agg happens BEFORE the wide
    customer attributes join in this formulation is avoided — group
    keys carry the needed attrs, and the final top-20 is a
    TakeOrderedAndProject with a custkey tiebreak."""
    customer, orders, lineitem, nation = prep(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    returns = lineitem.where(F.col("l_returnflag") == "R")
    per_cust = (
        returns.join(F.broadcast(ords), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(_rev_cents()).alias("_cents"))
    )
    enriched = per_cust.join(
        customer, F.col("o_custkey") == F.col("c_custkey")
    ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    return (
        enriched.orderBy(F.col("_cents").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            (F.col("_cents").cast("double") / F.lit(100.0)).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


@query(
    "cust_order_dist",
    """SELECT c_count, count(*) AS custdist
       FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer LEFT JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             GROUP BY c_custkey)
       GROUP BY c_count""",
)
def q_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): histogram of
    non-urgent order counts per customer, INCLUDING zero-order customers
    (the left join's null rows count as 0).

    Scale plan: two aggregations, each one shuffle — the first keyed by
    custkey (same key as the join, so AQE reuses the exchange), the
    second over the tiny count domain.  count(o_orderkey) skips nulls
    natively; no driver-side histogramming."""
    customer, orders = prep(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "promo_share",
    f"""SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_CENTS_SQL} ELSE 0 END) AS DOUBLE)
              * 100.0 / CAST(SUM({_REV_CENTS_SQL}) AS DOUBLE) AS promo_pct,
              count(*) AS n_lines
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1999-06-01'
         AND l_shipdate <  TIMESTAMP '1999-07-01'""",
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): PROMO revenue percentage for
    one ship-month, numerator and denominator in one conditional pass.

    Scale plan: month filter on the lineitem scan (partition-prunable on
    a shipdate-partitioned lake), part broadcast, single global agg."""
    lineitem, part = prep(spark, sf_dir, "lineitem", "part")
    month = lineitem.where(
        (F.col("l_shipdate") >= F.lit("1999-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-07-01").cast("timestamp"))
    )
    joined = month.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.when(F.col("p_type") == "PROMO", _rev_cents()).otherwise(F.lit(0))
    return joined.agg(
        (
            F.sum(promo).cast("double") * F.lit(100.0) / F.sum(_rev_cents()).cast("double")
        ).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "top_supplier",
    f"""WITH rev AS (
         SELECT l_suppkey, SUM({_REV_CENTS_SQL}) AS cents
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1999-01-01'
           AND l_shipdate <  TIMESTAMP '1999-04-01'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name,
              CAST(cents AS DOUBLE) / 100.0 AS total_revenue
       FROM rev JOIN supplier ON s_suppkey = l_suppkey
       WHERE cents = (SELECT max(cents) FROM rev)""",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) achieving the
    maximum quarterly revenue — the classic view-plus-scalar-subquery,
    expressed as one aggregate reused for both the per-supplier revenue
    and its broadcast scalar max (ties kept, as the spec requires).

    Scale plan: one shuffle for the per-supplier agg (supplier domain ≪
    fact rows after map-side partials); the global max is a 1-row
    aggregate CROSS-JOINED back (broadcast), NOT an unpartitioned
    window — a window would funnel every supplier row through a single
    partition at 100 TB.  Supplier dim broadcast for the name."""
    lineitem, supplier = prep(spark, sf_dir, "lineitem", "supplier")
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_cents()).alias("cents"))
    )
    best = rev.crossJoin(F.broadcast(rev.agg(F.max("cents").alias("_max")))).where(
        F.col("cents") == F.col("_max")
    )
    return best.join(
        F.broadcast(supplier.select("s_suppkey", "s_name")),
        F.col("l_suppkey") == F.col("s_suppkey"),
    ).select(
        "s_suppkey",
        "s_name",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("total_revenue"),
    )


@query(
    "waiting_suppliers",
    """SELECT s_name, count(*) AS numwait
       FROM supplier
       JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
       JOIN orders ON o_orderkey = l1.l_orderkey
       WHERE o_orderstatus = 'F'
         AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
       GROUP BY s_name""",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    multi-supplier orders, the supplier whose line was the ONLY late one
    — an EXISTS (semi) plus a correlated NOT EXISTS (anti) whose
    predicate references the outer join's o_orderdate.

    Scale plan: both the semi and anti sides are the same lineitem keyed
    by orderkey — at scale all three legs co-partition on l_orderkey, so
    the pair of (semi, anti) joins adds no extra shuffle beyond the
    first; lateness is shipdate vs orderdate (no receiptdate in this
    schema)."""
    supplier, lineitem, orders = prep(spark, sf_dir, "supplier", "lineitem", "orders")
    l1 = lineitem.alias("l1")
    fin = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    late1 = (
        l1.join(fin, F.col("l1.l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l1.l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l1.l_orderkey", "l1.l_suppkey", "o_orderdate")
    )
    l2 = lineitem.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    multi = late1.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "left_semi",
    )
    l3 = lineitem.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    only_late = multi.join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey"))
        & (F.col("l3_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    return (
        only_late.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "idle_customers",
    """SELECT c_custkey, c_name, c_acctbal
       FROM customer
       WHERE c_acctbal > (SELECT CAST(SUM(CAST(round(c_acctbal * 100.0, 0) AS BIGINT)) AS DOUBLE)
                                 / (count(*) * 100.0)
                          FROM customer WHERE c_acctbal > 0)
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '2001-01-01')""",
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): above-average-balance
    customers with no recent orders — a scalar aggregate broadcast as a
    filter plus an anti-join against the date-pruned orders.

    Scale plan: the scalar avg is a 1-row cross-join broadcast (not a
    collect); the NOT EXISTS is a left-anti against orders already
    pruned to the recent window at the scan.  avg() is float-summed in
    both engines over the same values in arbitrary order — to stay
    bit-exact the threshold avg is computed over exact integer cents
    then divided once."""
    customer, orders = prep(spark, sf_dir, "customer", "orders")
    bal_cents = F.round(F.col("c_acctbal") * F.lit(100.0), 0).cast("long")
    thresh = (
        customer.where(F.col("c_acctbal") > 0)
        .agg((F.sum(bal_cents).cast("double") / (F.count(F.lit(1)) * F.lit(100.0))).alias("_avg"))
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = customer.crossJoin(F.broadcast(thresh)).where(
        F.col("c_acctbal") > F.col("_avg")
    )
    return rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


# ---- round-7 extension: the remaining classic TPC-H shapes ----------------


@query(
    "local_volume",
    f"""SELECT n_name,
              CAST(SUM({_REV_CENTS_SQL}) AS DOUBLE) / 100.0 AS revenue
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
                    AND s_nationkey = c_nationkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate <  TIMESTAMP '1998-01-01'
       GROUP BY n_name""",
)
def q_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): revenue per ASIA nation
    where the customer and the shipping supplier share that nation.

    Scale plan: region→nation prunes to 1/5 of nations BEFORE anything
    touches a fact table; customer and supplier broadcast after their
    nation filters; the same-nation constraint rides the supplier join
    condition, never a post-join filter of a wider product.  One fact
    shuffle (lineitem⋈orders on orderkey); everything else map-side."""
    lineitem, orders, customer, supplier, nation, region = prep(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    asia_nations = nation.join(
        F.broadcast(region.where(F.col("r_name") == "ASIA").select("r_regionkey")),
        nation["n_regionkey"] == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("c_nationkey").alias("_cnat"), "n_name")
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("_cnat")),
        )
        .groupBy("n_name")
        .agg(cents_sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"))
    )


@query(
    "forecast_revenue",
    """SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 100.0, 0) AS BIGINT)) AS DOUBLE) / 100.0
              AS revenue_delta
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate <  TIMESTAMP '1998-01-01'
         AND l_discount BETWEEN 0.02 AND 0.04
         AND l_quantity < 24""",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): what the year's
    revenue would gain by eliminating small-quantity discounts.

    Scale plan: the whole query is scan→filter→one global agg — all
    three predicates (date range, discount band, quantity cap) push to
    the parquet scan as PushedFilters, the projection reads 4 columns,
    and the single partial-aggregated exchange carries ONE row per
    partition.  The canonical 'is pushdown working' probe."""
    (lineitem,) = prep(spark, sf_dir, "lineitem")
    f = lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        cents_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue_delta")
    )


@query(
    "product_profit",
    f"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
              CAST(SUM({_REV_CENTS_SQL}
                       - CAST(round(l_quantity * p_retailprice * 100.0, 0) AS BIGINT))
                   AS DOUBLE) / 100.0 AS profit
       FROM lineitem
       JOIN part     ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation   ON s_nationkey = n_nationkey
       JOIN orders   ON l_orderkey = o_orderkey
       WHERE p_name LIKE '%widget%'
       GROUP BY n_name, year(o_orderdate)""",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product type profit): per supplier-nation,
    per-year profit on 'widget' parts — revenue minus cost, cost being
    quantity × the part's list price (this schema has no partsupp;
    p_retailprice stands in for supply cost).

    Scale plan: the name filter prunes part BEFORE its broadcast, so
    the 100 TB lineitem is filtered map-side by the part join; supplier
    and nation broadcast; one fact shuffle (orderkey join) and one
    agg exchange of nation×year rows.  Profit is an exact bigint cents
    difference summed with a long accumulator."""
    lineitem, part, supplier, nation, orders = prep(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders"
    )
    widget = part.where(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    rev = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0), 0
    ).cast("long")
    cost = F.round(F.col("l_quantity") * F.col("p_retailprice") * F.lit(100.0), 0).cast("long")
    joined = (
        lineitem.join(F.broadcast(widget), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            (rev - cost).alias("_pc"),
        )
        .groupBy("nation", "o_year")
        .agg((F.sum("_pc").cast("double") / F.lit(100.0)).alias("profit"))
    )


@query(
    "priority_lateness",
    """SELECT o_orderpriority,
              CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
              CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                            THEN 0 ELSE 1 END) AS BIGINT) AS n_ontime
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate <  TIMESTAMP '1998-01-01'
       GROUP BY o_orderpriority""",
)
def q_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): one year of
    shipments split late vs on-time per priority class — the classic
    conditional-aggregation-after-join (no shipmode column here;
    lateness is shipdate vs orderdate + 60 days).

    Scale plan: the date range prunes lineitem at the scan; one
    orderkey fact shuffle; both CASE sums fold into a single partial
    aggregate — never two passes."""
    orders, lineitem = prep(spark, sf_dir, "orders", "lineitem")
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("n_late"),
            F.sum(F.when(late, 0).otherwise(1)).alias("n_ontime"),
        )
    )


@query(
    "disjunct_revenue",
    f"""SELECT CAST(SUM({_REV_CENTS_SQL}) AS DOUBLE) / 100.0 AS revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
          OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 30)
          OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 40)""",
)
def q_disjunct_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): an OR-of-ANDs predicate
    spanning both join sides — the planner stress test for disjunctive
    pushdown.

    Scale plan: Catalyst derives the IMPLIED single-side conjuncts and
    pushes them through the join — part prunes to the 3 brands
    (p_brand IN ...) and lineitem to the quantity hull (1..40) AT THE
    SCANS, so the full disjunction only evaluates on pre-filtered rows;
    the brand-filtered part side broadcasts."""
    lineitem, part = prep(spark, sf_dir, "lineitem", "part")
    j = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    pred = (
        ((b == "Brand#1") & s.between(1, 10) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(1, 20) & q.between(10, 30))
        | ((b == "Brand#3") & s.between(1, 30) & q.between(20, 40))
    )
    return j.where(pred).agg(
        cents_sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue")
    )


@query(
    "min_cost_supplier",
    """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
       euro AS (SELECT s_suppkey, s_name, s_acctbal FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE'),
       ranked AS (
         SELECT p_partkey, s_suppkey, s_name, s_acctbal,
                row_number() OVER (PARTITION BY p_partkey
                                   ORDER BY s_acctbal DESC, s_suppkey) AS rn
         FROM pairs
         JOIN part ON l_partkey = p_partkey AND p_size = 15
         JOIN euro ON l_suppkey = s_suppkey)
       SELECT p_partkey, s_suppkey, s_name, s_acctbal
       FROM ranked WHERE rn = 1""",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (best supplier per part): for each size-15 part,
    the EUROPE supplier who has actually shipped it with the best
    standing (max acctbal, suppkey tiebreak — no partsupp cost in this
    schema, so account balance stands in for the cost ranking).

    Scale plan: the (partkey, suppkey) pair universe dedups ONCE from
    the fact table (partial-agg distinct), both dims broadcast after
    their filters, and the per-part argmax is one row_number window on
    the already-tiny candidate set — never a self-join of lineitem, and
    the total order makes the survivor set partitioning-independent."""
    lineitem, part, supplier, nation, region = prep(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    euro_keys = nation.join(
        F.broadcast(region.where(F.col("r_name") == "EUROPE").select("r_regionkey")),
        nation["n_regionkey"] == F.col("r_regionkey"),
    ).select("n_nationkey")
    euro = supplier.join(
        F.broadcast(euro_keys), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal")
    from pyspark.sql import Window

    cand = pairs.join(
        F.broadcast(part.where(F.col("p_size") == 15).select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).join(F.broadcast(euro), F.col("l_suppkey") == F.col("s_suppkey"))
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal")
    )


@query(
    "important_parts",
    f"""WITH pv AS (
         SELECT l_partkey, SUM({_REV_CENTS_SQL}) AS cents
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
         GROUP BY l_partkey),
       tot AS (SELECT SUM(cents) AS total_cents FROM pv)
       SELECT l_partkey, CAST(cents AS DOUBLE) / 100.0 AS part_value
       FROM pv, tot
       WHERE cents * 1000 > total_cents""",
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose NATION_1-supplied
    revenue exceeds 0.1% of that nation's total — the scalar-subquery-
    as-threshold pattern.

    Scale plan: one agg builds the per-part value table; its grand
    total re-aggregates THAT (already tiny) result, never the facts
    twice; the 1-row total broadcasts back as a cross join.  The
    threshold compares exact integer cents (cents*1000 > total) — no
    float fraction, so the survivor set is bit-stable."""
    lineitem, supplier, nation = prep(spark, sf_dir, "lineitem", "supplier", "nation")
    n1_supp = supplier.join(
        F.broadcast(
            nation.where(F.col("n_name") == "NATION_1").select("n_nationkey")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0), 0
    ).cast("long")
    pv = (
        lineitem.join(F.broadcast(n1_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("_cents"))
    )
    tot = pv.agg(F.sum("_cents").alias("_total"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .where(F.col("_cents") * 1000 > F.col("_total"))
        .select("l_partkey", (F.col("_cents").cast("double") / 100.0).alias("part_value"))
    )


@query(
    "parts_supplier_counts",
    """SELECT p_brand, p_type, p_size,
              COUNT(DISTINCT l_suppkey) AS supplier_cnt
       FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
       JOIN part ON l_partkey = p_partkey
       WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
         AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size""",
)
def q_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers ship each (brand, type, size) combination, excluding one
    brand, one type, and black-listed suppliers (negative balance —
    the schema's stand-in for the complaints list).

    Scale plan: the pair universe dedups once from the facts; the
    NOT IN becomes a broadcast anti-join on the (tiny) black list; the
    part filters prune before the broadcast; the distinct count is one
    two-phase hash aggregate."""
    lineitem, part, supplier = prep(spark, sf_dir, "lineitem", "part", "supplier")
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    bad = supplier.where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    keep_parts = part.where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(keep_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "excess_suppliers",
    """SELECT s_suppkey, s_name
       FROM supplier
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'EUROPE'
         AND s_suppkey IN (
           SELECT l_suppkey FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
             AND l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate <  TIMESTAMP '1998-01-01'
           GROUP BY l_suppkey
           HAVING SUM(l_quantity) > 200)""",
)
def q_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): EUROPE suppliers who
    moved more than 200 units of 'red' parts in a year — the NESTED
    semi-join ladder (part-name IN inside a grouped HAVING inside a
    supplier IN).

    Scale plan: innermost first — the red-part keylist broadcasts as a
    semi-join onto the date-pruned lineitem; the per-supplier quantity
    agg happens BEFORE touching supplier (agg-then-semi, so the big
    side aggregates once); the qualifying supplier keys then semi-join
    the region-filtered supplier dim.  l_quantity is integral by data
    contract, so the HAVING threshold is exact."""
    supplier, nation, region, lineitem, part = prep(
        spark, sf_dir, "supplier", "nation", "region", "lineitem", "part"
    )
    red = part.where(F.col("p_name").like("red%")).select("p_partkey")
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    movers = (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("_qty"))
        .where(F.col("_qty") > 200)
        .select("l_suppkey")
    )
    euro_keys = nation.join(
        F.broadcast(region.where(F.col("r_name") == "EUROPE").select("r_regionkey")),
        nation["n_regionkey"] == F.col("r_regionkey"),
    ).select("n_nationkey")
    return (
        supplier.join(F.broadcast(euro_keys), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(movers), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )

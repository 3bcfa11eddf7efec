"""Deeper TPC-H-style shapes (HiveQL surface [H]) adapted to the driver
schema: correlated scalar aggregates (Q2), HAVING-vs-global-scalar
(Q11), view+max (Q15), exclusion counts (Q16), nested IN chains (Q20),
anti-join + scalar filter (Q22)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query

_DEC = "decimal(18,6)"


def _dec(col):
    return F.col(col).cast(_DEC)


def _views(spark, sf_dir, *tables):
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "q2_min_cost_per_brand",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice
    FROM part p1
    WHERE p_retailprice = (SELECT MIN(p_retailprice) FROM part p2
                            WHERE p2.p_brand = p1.p_brand)
    ORDER BY p_brand, p_partkey
    """,
)
def q2_min_cost_per_brand(spark, sf_dir):
    """TPC-H Q2 shape: correlated scalar MIN subquery → Catalyst
    decorrelates into an aggregate + join (no per-row rescan)."""
    _views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_retailprice
        FROM part p1
        WHERE p_retailprice = (SELECT MIN(p_retailprice) FROM part p2
                                WHERE p2.p_brand = p1.p_brand)
        ORDER BY p_brand, p_partkey
        """
    )


@query(
    "q11_important_stock",
    oracle="""
    SELECT s_nationkey,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS nation_value
    FROM supplier
    GROUP BY s_nationkey
    HAVING SUM(CAST(s_acctbal AS DECIMAL(18,6))) >
           (SELECT SUM(CAST(s_acctbal AS DECIMAL(18,6))) * 0.1 FROM supplier)
    ORDER BY nation_value DESC
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: HAVING against a global scalar subquery
    (decimal-exact on both sides so the threshold can't flip)."""
    _views(spark, sf_dir, "supplier")
    return spark.sql(
        """
        SELECT s_nationkey,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS nation_value
        FROM supplier
        GROUP BY s_nationkey
        HAVING SUM(CAST(s_acctbal AS DECIMAL(18,6))) >
               (SELECT SUM(CAST(s_acctbal AS DECIMAL(18,6))) * 0.1 FROM supplier)
        ORDER BY nation_value DESC
        """
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(18,6)) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: named view + MAX-of-view scalar subquery.
    The CTE computes once (Catalyst reuses the subplan)."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey,
                 CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(18,6)) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
        """
    )


@query(
    "q16_supplier_cnt_excl",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_cnt_excl(spark, sf_dir):
    """TPC-H Q16 shape: distinct-count with NOT-IN exclusion subquery."""
    _views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type NOT IN ('PROMO', 'ECONOMY')
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """
    )


@query(
    "q20_nested_in_chain",
    oracle="""
    SELECT s_name, s_suppkey FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        AND l_quantity > 48
    )
    ORDER BY s_suppkey
    """,
)
def q20_nested_in_chain(spark, sf_dir):
    """TPC-H Q20 shape: IN-inside-IN chain → stacked semi joins."""
    _views(spark, sf_dir, "supplier", "lineitem", "part")
    return spark.sql(
        """
        SELECT s_name, s_suppkey FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
            AND l_quantity > 48
        )
        ORDER BY s_suppkey
        """
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT SUBSTR(c_name, 1, 9) AS cntry, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                              / COUNT(*)
                         FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY 1
    ORDER BY 1
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: scalar-subquery filter + NOT EXISTS anti join +
    substring grouping."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT SUBSTR(c_name, 1, 9) AS cntry, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                                  / COUNT(*)
                             FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
        GROUP BY 1
        ORDER BY 1
        """
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))
                 - CAST(l_quantity AS DECIMAL(18,6)) * CAST(CAST(p_retailprice AS DECIMAL(18,6)) * CAST(0.1 AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS profit
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%a%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit rollup by nation-year over a 5-way join
    with a LIKE filter (supply cost approximated as 10% of retail price —
    no partsupp table in the fixture set)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    supply_cost = (_dec("p_retailprice") * F.lit(0.1).cast(_DEC)).cast(_DEC)
    profit = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount")) - (
        _dec("l_quantity") * supply_cost
    )
    # no broadcast hint on part/supplier (fact-scaling tables — a forced
    # hint would bypass AQE's size check at 100×, VERDICT r1 #3); the
    # hint stays only on nation, a true fixed-size dimension. AQE still
    # broadcasts the others at this SF because they fit the threshold.
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast(_DEC).cast("double").alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_quantity > 40
      AND EXISTS (SELECT 1 FROM lineitem l2
                   WHERE l2.l_orderkey = l1.l_orderkey
                     AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                       WHERE l3.l_orderkey = l1.l_orderkey
                         AND l3.l_suppkey <> l1.l_suppkey
                         AND l3.l_quantity > 40)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: EXISTS + NOT EXISTS against the same fact table
    (the 'only supplier who kept the order waiting' pattern) — the
    hardest decorrelation case in the TPC-H suite; Catalyst plans it as
    semi + anti joins on l_orderkey."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
          JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
          JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_quantity > 40
          AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_quantity > 40)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        """
    )

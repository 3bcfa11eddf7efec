"""Reference-parity predicate operators (SURVEY.md §2.2).

The reference translates Hive SARG leaves to Iceberg expressions in
IcebergFilterFactory.java:99-156: =, null-safe =, <, <=, IN, BETWEEN,
IS NULL, plus AND/OR/NOT trees (:45-91); >, >=, != arrive as Hive
residuals. Each leaf is declared here as a DataFrame filter — Catalyst
pushes all of them to the parquet scan (the reference only pushes the
SARG subset and re-evaluates everything as residual,
IcebergStorageHandler.java:106-112).

Divergence kept on purpose: the reference's null-safe `<=>` translation
drops null-safety (IcebergFilterFactory.java:140-141, author TODO); we
use Spark's eqNullSafe, which is correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query


@query(
    "filter_eq",
    oracle="SELECT n_nationkey, n_name FROM nation WHERE n_name = 'NATION_7'",
)
def filter_eq(spark, sf_dir):
    """= leaf (IcebergFilterFactory.java:138-139). Literal is a fixture
    nation name (round 13 — 'CHINA' matched nothing, so the driver row
    passed vacuously at 0=0)."""
    return (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_7")
        .select("n_nationkey", "n_name")
    )


@query(
    "filter_eq_nullsafe",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment IS NOT DISTINCT FROM 'MACHINERY'
    """,
)
def filter_eq_nullsafe(spark, sf_dir):
    """<=> leaf (IcebergFilterFactory.java:140-141) — correctly null-safe."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").eqNullSafe("MACHINERY"))
        .select("c_custkey")
    )


@query(
    "filter_lt_lte",
    oracle="""
    SELECT p_partkey, p_size FROM part WHERE p_size < 15 AND p_retailprice <= 1200.0
    """,
)
def filter_lt_lte(spark, sf_dir):
    """< and <= leaves (IcebergFilterFactory.java:142-145)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter((F.col("p_size") < 15) & (F.col("p_retailprice") <= 1200.0)).select(
        "p_partkey", "p_size"
    )


@query(
    "filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_in(spark, sf_dir):
    """IN leaf (IcebergFilterFactory.java:146-147)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
    """,
)
def filter_between(spark, sf_dir):
    """BETWEEN leaf → and(ge, le) (IcebergFilterFactory.java:148-150)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(10, 20))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "filter_is_null",
    oracle="SELECT COUNT(*) AS n_null FROM events WHERE value IS NULL",
)
def filter_is_null(spark, sf_dir):
    """IS NULL leaf (IcebergFilterFactory.java:151-152)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNull())
        .agg(F.count("*").alias("n_null"))
    )


@query(
    "filter_bool_tree",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE (l_returnflag = 'A' OR l_returnflag = 'R')
      AND NOT (l_linestatus = 'O')
      AND l_quantity > 45
      AND l_discount != 0.0
    """,
)
def filter_bool_tree(spark, sf_dir):
    """AND/OR/NOT tree incl. >2-child AND (IcebergFilterFactory.java:45-91)
    plus the residual-only leaves > and != (Hive-evaluated in the
    reference, pushed-down built-ins here)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_returnflag") == "A") | (F.col("l_returnflag") == "R"))
        & ~(F.col("l_linestatus") == "O")
        & (F.col("l_quantity") > 45)
        & (F.col("l_discount") != 0.0)
    ).select("l_orderkey", "l_linenumber")


@query(
    "projection_pushdown",
    oracle="SELECT l_orderkey, l_extendedprice FROM lineitem WHERE l_orderkey % 1000 = 7",
)
def projection_pushdown(spark, sf_dir):
    """Column-projection parity (IcebergInputFormat.java:87,92,105): a
    2-column SELECT must reach the parquet reader as a 2-3 column
    ReadSchema (asserted in tests via .explain)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 1000 == 7)
        .select("l_orderkey", "l_extendedprice")
    )


@query(
    "scan_multifile_union",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    UNION ALL
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def scan_multifile_union(spark, sf_dir):
    """Multi-file/multi-split semantics parity
    (TestInputFormatWithMultipleTasks.java:85-107): every appended file's
    rows surface exactly once; modeled as a 2-file union over the same
    fixture."""
    n = load_table(spark, sf_dir, "nation")
    return n.unionAll(n)

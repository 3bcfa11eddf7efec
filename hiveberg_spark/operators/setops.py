"""Sorts / limits / top-k / set operations / distinct (SURVEY.md §2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query


@query(
    "sort_order_by",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey
    """,
)
def sort_order_by(spark, sf_dir):
    """Total ORDER BY → range-partitioned sort (sampled boundaries), the
    scalable global sort; SORT BY (per-partition) is sortWithinPartitions
    and is exercised in unit tests (order-insensitive here)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select("s_suppkey", "s_name", "s_acctbal").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )


@query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def limit_topk(spark, sf_dir):
    """ORDER BY + LIMIT k → TakeOrderedAndProject: per-partition heap of
    k, then k·partitions merged on the driver — never a full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@query(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9990
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_all(spark, sf_dir):
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9990)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s)


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_suppkey < 8
    """,
)
def set_except(spark, sf_dir):
    """EXCEPT (distinct). The supplier side restricts to the first 8
    suppliers (round 13): the fixture's suppliers cover every nation,
    so the unrestricted EXCEPT was empty and the driver row passed
    vacuously — 17 nations now survive at every SF."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 8)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    # subtract == SQL EXCEPT (distinct); exceptAll is bag semantics
    return c.subtract(s)


@query(
    "distinct_dropdup",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def distinct_dropdup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "reshape_unpivot_melt",
    oracle="""
    WITH s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM documents GROUP BY source
    )
    SELECT source, metric, value
    FROM (UNPIVOT s ON n_docs, total_chars, n_langs
          INTO NAME metric VALUE value)
    """,
)
def reshape_unpivot_melt(spark, sf_dir):
    """UNPIVOT / MELT — wide-to-long reshape (Spark 3.4's `unpivot`,
    SQL UNPIVOT): a per-source metrics row fans out to (source, metric,
    value) tuples, the shape metric stores and plotting layers want.
    Completes the reshape pair with `agg_pivot` (long-to-wide). Scale:
    unpivot is a stateless per-row expansion (Expand node) — no shuffle
    beyond the feeding aggregate."""
    from hiveberg_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    return s.unpivot(
        ["source"], ["n_docs", "total_chars", "n_langs"], "metric", "value"
    )

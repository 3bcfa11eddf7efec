"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

The reference exposes no UDFs of its own — Hive UDFs flow through its
ObjectInspectors (IcebergObjectInspectorGenerator.java:34-71). Ours is
the PySpark surface, with the house rule: Arrow-vectorized pandas UDFs
only — row-at-a-time Python UDFs never appear in a hot path. (The UDTF
shape — mapInPandas — is exercised by multimodal_feature_extract.)

pandas_udf decorators are applied lazily inside each query: the
decorator parses its return type against the active session, which
doesn't exist at import time.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT c_custkey,
           GREATEST(c_acctbal, 0.0) * 0.01 + c_nationkey * 2.0 AS clv
    FROM customer
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    """Scalar pandas UDF (Arrow batches, ~10-100× over row-Python): a toy
    'customer lifetime value' score, numpy arithmetic over the whole
    batch. No rounding — each value is a fixed sequence of IEEE ops, so
    the SQL oracle is bit-identical."""

    @pandas_udf("double")
    def clv_score(acctbal: pd.Series, nationkey: pd.Series) -> pd.Series:
        return acctbal.clip(lower=0.0) * 0.01 + nationkey * 2.0

    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", clv_score("c_acctbal", "c_nationkey").alias("clv"))


@query(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag, TRUE AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_pandas_grouped_agg(spark, sf_dir):
    """Grouped-agg pandas UDF (UDAF surface): whole group arrives as one
    pandas batch; price-weighted mean quantity. numpy's pairwise float
    summation orders differently from SQL SUM, so the value itself can't
    hash-match an oracle — instead the query emits the CONTRACT: the UDF
    result agrees with the decimal-exact weighted mean to 1e-6 relative
    (same pattern as sketches.py). Scale note: a group must fit in
    executor memory — fine for bounded keys (returnflag), wrong for
    unbounded ones; that case belongs to applyInPandas with
    pre-aggregation."""

    @pandas_udf("double")
    def weighted_avg_qty(qty: pd.Series, price: pd.Series) -> float:
        import numpy as np

        w = price.to_numpy()
        return float(np.dot(qty.to_numpy(), w) / w.sum())

    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(30,8)"
    # a grouped-agg pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — two tiny aggs joined on the
    # 3-value group key instead
    udf_side = li.groupBy("l_returnflag").agg(
        weighted_avg_qty("l_quantity", "l_extendedprice").alias("w_avg_qty")
    )
    exact_side = li.groupBy("l_returnflag").agg(
        (
            F.sum(F.col("l_quantity").cast(dec) * F.col("l_extendedprice").cast(dec))
            / F.sum(F.col("l_extendedprice").cast(dec))
        )
        .cast("double")
        .alias("exact")
    )
    est = udf_side.join(exact_side, "l_returnflag")
    return est.select(
        "l_returnflag",
        (
            F.abs(F.col("w_avg_qty") - F.col("exact"))
            <= F.abs(F.col("exact")) * F.lit(1e-6)
        ).alias("within_tol"),
    )


@query(
    "udf_sql_registration",
    oracle="""
    SELECT p_partkey, UPPER(p_brand) || ':' || CAST(p_size AS VARCHAR) AS brand_tag
    FROM part WHERE p_size >= 45
    """,
)
def udf_sql_registration(spark, sf_dir):
    """SQL-registered function surface: a vectorized pandas UDF
    registered under a name and invoked from SQL text
    (spark.udf.register == session-scoped CREATE TEMPORARY FUNCTION)."""

    @pandas_udf("string")
    def brand_tag(brand: pd.Series, size: pd.Series) -> pd.Series:
        return brand.str.upper() + ":" + size.astype(str)

    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    spark.udf.register("brand_tag", brand_tag)
    return spark.sql(
        """
        SELECT p_partkey, brand_tag(p_brand, p_size) AS brand_tag
        FROM part WHERE p_size >= 45
        """
    )


@query(
    "applyinpandas_zscore",
    oracle="""
    WITH stats AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mu
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber,
           l.l_quantity - s.mu AS qty_centered
    FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
    WHERE l.l_orderkey < 100
    """,
)
def applyinpandas_zscore(spark, sf_dir):
    """applyInPandas (grouped map): per-group mean-centering — each group
    is one pandas DataFrame in, one out. The mean uses an exact integer
    sum (quantities are integral) so the SQL oracle matches bit-for-bit.

    Scale: grouped-map shuffles whole groups; keys here are 3-valued so
    production parallelism comes from pre-aggregation or salting."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = float(pdf["l_quantity"].astype("int64").sum()) / len(pdf)
        out = pdf[pdf["l_orderkey"] < 100].copy()
        out["qty_centered"] = out["l_quantity"] - mu
        return out[["l_orderkey", "l_linenumber", "qty_centered"]]

    return li.groupBy("l_returnflag").applyInPandas(
        center, schema="l_orderkey long, l_linenumber int, qty_centered double"
    )


@query(
    "udtf_mapinarrow",
    oracle="""
    SELECT doc_id, n_chars,
           LENGTH(text) AS measured_chars,
           (n_chars = LENGTH(text)) AS length_consistent
    FROM documents WHERE doc_id < 300
    """,
)
def udtf_mapinarrow(spark, sf_dir):
    """mapInArrow (the lowest-overhead Python batch API): operates on raw
    pyarrow RecordBatches with zero pandas conversion — the right tool
    when the Python side is itself columnar (tokenizers, arrow-native
    codecs). Validates the stored n_chars against a recomputed length."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def one_chunk(arr):
        return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr

    def measure(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            measured = pc.cast(pc.utf8_length(t["text"]), pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    one_chunk(t["doc_id"]),
                    one_chunk(t["n_chars"]),
                    one_chunk(measured),
                    one_chunk(pc.equal(t["n_chars"], measured)),
                ],
                names=["doc_id", "n_chars", "measured_chars", "length_consistent"],
            )

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "n_chars", "text")
    )
    return d.mapInArrow(
        measure,
        schema="doc_id long, n_chars long, measured_chars long, length_consistent boolean",
    )


@query(
    "udtf_word_runs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, ws[u.i] AS w, u.i
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t
      CROSS JOIN UNNEST(range(1, len(ws) + 1)) AS u(i)
    ),
    isl AS (
      SELECT doc_id, w, i,
             i - ROW_NUMBER() OVER (PARTITION BY doc_id, w ORDER BY i) AS grp
      FROM toks
    )
    SELECT doc_id, w AS word, CAST(MIN(i) AS BIGINT) AS start_pos,
           CAST(COUNT(*) AS BIGINT) AS run_len
    FROM isl GROUP BY doc_id, w, grp HAVING COUNT(*) >= 2
    """,
)
def udtf_word_runs(spark, sf_dir):
    """Python UDTF (PySpark 4 `@udtf`) exercised through SQL LATERAL —
    the table-function API the reference's Hive surface gets from
    LATERAL VIEW + Hive UDTFs (via IcebergObjectInspectorGenerator's
    inspectors); ours is the native Spark registration + lateral
    correlation. The function run-length-encodes consecutive repeated
    words per document (emitting runs >= 2: the intra-doc duplication
    signal repetition filters consume), which keeps per-row output
    small and is exactly replicable in the oracle via gaps-and-islands.
    House rule unchanged: row-at-a-time Python stays OUT of hot paths —
    this registers the API surface and is sized accordingly (one corpus
    pass; the equivalent hot-path form is the JVM window in
    text_repetition_filter)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, start_pos long, run_len long")
    class WordRuns:
        def eval(self, text):
            if text is None:
                return
            words = text.split(" ")
            n = len(words)
            i = 0
            while i < n:
                j = i
                while j + 1 < n and words[j + 1] == words[i]:
                    j += 1
                if j > i:
                    yield words[i], i + 1, j - i + 1
                i = j + 1

    spark.udtf.register("hb_word_runs", WordRuns)
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("hb_word_runs_docs")
    return spark.sql(
        """
        SELECT d.doc_id, r.word, r.start_pos, r.run_len
        FROM hb_word_runs_docs d, LATERAL hb_word_runs(d.text) r
        """
    )

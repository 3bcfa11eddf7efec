"""Scalar function batteries (SURVEY.md §2.8): string / date / math /
array / map / json.

The reference implements zero scalar functions (HiveQL built-ins run in
Hive, flowing through the SerDe's ObjectInspectors —
IcebergObjectInspectorGenerator.java:34-71). Contract: the equivalent
pyspark.sql.functions surface, all JVM-side/codegen'd — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT n_nationkey,
           CONCAT(LOWER(n_name), '-', CAST(n_regionkey AS VARCHAR)) AS tag,
           UPPER(SUBSTR(n_name, 1, 3)) AS prefix3,
           LENGTH(TRIM(n_name)) AS name_len,
           REGEXP_EXTRACT(n_name, '([AEIOU]+)', 1) AS first_vowels,
           REGEXP_REPLACE(n_name, '[AEIOU]', '_', 'g') AS devoweled,
           (n_name LIKE '%IA%') AS has_ia,
           ARRAY_TO_STRING(regexp_split_to_array(n_name, ' '), '|') AS words
    FROM nation
    """,
)
def scalar_string_funcs(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.concat(
            F.lower("n_name"), F.lit("-"), F.col("n_regionkey").cast("string")
        ).alias("tag"),
        F.upper(F.substring("n_name", 1, 3)).alias("prefix3"),
        F.length(F.trim(F.col("n_name"))).alias("name_len"),
        F.regexp_extract("n_name", "([AEIOU]+)", 1).alias("first_vowels"),
        F.regexp_replace("n_name", "[AEIOU]", "_").alias("devoweled"),
        F.col("n_name").like("%IA%").alias("has_ia"),
        F.array_join(F.split("n_name", " "), "|").alias("words"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(YEAR FROM o_orderdate)  AS yr,
           EXTRACT(MONTH FROM o_orderdate) AS mon,
           EXTRACT(DAY FROM o_orderdate)   AS dom,
           STRFTIME(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS order_month,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders WHERE o_orderkey <= 500
    """,
)
def scalar_date_funcs(spark, sf_dir):
    """Temporal outputs are formatted as strings: engines disagree on how
    DATE surfaces through pandas/Arrow, strings are unambiguous."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("long").alias("days_to_eoy"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT p_partkey,
           ROUND(p_retailprice, 1) AS price_r1,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           CAST(CEIL(p_retailprice) AS BIGINT)  AS price_ceil,
           ABS(p_size - 25)        AS size_dist,
           ROUND(SQRT(p_retailprice), 6)      AS price_sqrt,
           ROUND(LN(p_retailprice), 6)        AS price_ln,
           ROUND(POW(CAST(p_size AS DOUBLE), 2.0), 6) AS size_sq,
           p_size % 7 AS size_mod
    FROM part
    """,
)
def scalar_math_funcs(spark, sf_dir):
    """Rounded to 6 decimals where libm implementations may differ in the
    last ulp (pow/ln); floor/ceil/abs/sqrt are IEEE-exact."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_r1"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.pow(F.col("p_size").cast("double"), F.lit(2.0)), 6).alias("size_sq"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other
    FROM customer
    """,
)
def scalar_conditional(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS dim,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(list_sum(list_transform(embedding[1:3], x -> CAST(x AS DOUBLE))), 6) AS head3_sum,
           LEN(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings WHERE vec_id < 100
    """,
)
def scalar_array_funcs(spark, sf_dir):
    """Array battery over the embeddings table: size/element_at/slice/
    transform/filter/aggregate — all JVM higher-order functions (the
    pattern the similarity ops build on)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    dbl = lambda x: x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + dbl(x) * dbl(x)
            ),
            6,
        ).alias("sq_norm"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(
                F.slice("embedding", 1, 3), F.lit(0.0), lambda acc, x: acc + dbl(x)
            ),
            6,
        ).alias("head3_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events WHERE event_id < 200
    """,
)
def scalar_json_funcs(spark, sf_dir):
    """JSON extraction over events.props (get_json_object / from_json)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
    )


@query(
    "scalar_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           'k' AS first_key
    FROM events WHERE event_id < 100
    """,
)
def scalar_map_funcs(spark, sf_dir):
    """from_json → MapType → map_keys/element_at (Hive map surface;
    nested-type parity with the reference's map fixtures,
    TestIcebergSerDe.java:99-137)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    )


@query(
    "explode_posexplode",
    oracle="""
    SELECT vec_id, CAST(pos - 1 AS INT) AS pos, ROUND(CAST(val AS DOUBLE), 6) AS val
    FROM (
      SELECT vec_id, UNNEST(embedding) AS val,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings WHERE vec_id < 10
    )
    """,
)
def explode_posexplode(spark, sf_dir):
    """posexplode (UDTF surface §2.10): array → (pos, val) rows."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "val")).select(
        "vec_id", "pos", F.round(F.col("val").cast("double"), 6).alias("val")
    )


@query(
    "scalar_variant_funcs",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k,
           CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def scalar_variant_funcs(spark, sf_dir):
    """Spark 4 VARIANT semi-structured analytics (the open-table-format
    v3 variant type): `parse_json` once into a variant column, then
    typed path extraction with `variant_get` feeding ordinary
    aggregation, and `try_variant_get` for absent paths (NULL, never an
    error). The scale point: variant is a BINARY encoding — the
    parse happens once and every extraction is a typed binary probe,
    not a per-access string re-parse; the oracle recomputes through
    DuckDB's JSON path functions on the raw strings."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.expr("variant_get(v, '$.k', 'long')")
    miss = F.expr("try_variant_get(v, '$.missing', 'long')")
    return e.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).cast("long").alias("max_k"),
        F.sum(F.when(miss.isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing"),
        F.count("*").cast("long").alias("n"),
    )


@query(
    "scalar_url_funcs",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://h' || CAST(doc_id % 5 AS VARCHAR)
               || '.example.org/p/' || CAST(doc_id AS VARCHAR)
               || '?q=' || CAST(doc_id % 7 AS VARCHAR) || '&ref=abc' AS u
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           regexp_extract(u, '^([a-z]+)://', 1) AS protocol,
           regexp_extract(u, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(u, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(u, '\\?([^#]*)', 1) AS query,
           regexp_extract(u, '[?&]q=([^&#]*)', 1) AS q_param
    FROM urls
    """,
)
def scalar_url_funcs(spark, sf_dir):
    """URL scalar-function battery [H] — `parse_url` over PROTOCOL /
    HOST / PATH / QUERY / per-key query parameter (Hive's parse_url
    surface, which the reference's HiveSQL-over-Iceberg queries get
    from the executor; Spark ships the same builtin). The companion
    primitive to `dedup_url_host`: canonicalization composes these
    extractors. URLs are synthesized deterministically from doc_id
    (documents carries no URL column); the oracle recomputes every
    component with portable regexes, pinning Spark's parse_url
    semantics against an engine-independent definition. One projection,
    zero shuffle."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    u = F.concat(
        F.lit("https://h"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.org/p/"),
        F.col("doc_id").cast("string"),
        F.lit("?q="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&ref=abc"),
    )
    urls = d.select("doc_id", u.alias("u"))
    return urls.select(
        "doc_id",
        F.parse_url("u", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("u", F.lit("HOST")).alias("host"),
        F.parse_url("u", F.lit("PATH")).alias("path"),
        F.parse_url("u", F.lit("QUERY")).alias("query"),
        F.parse_url("u", F.lit("QUERY"), F.lit("q")).alias("q_param"),
    )


@query(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(o_orderkey, 21845) AS BIGINT) AS toggled,
           CAST(o_orderkey << 2 AS BIGINT) AS shifted_up,
           CAST(o_orderkey >> 3 AS BIGINT) AS shifted_down,
           CAST(bit_count(o_orderkey) AS BIGINT) AS popcount,
           CAST(~o_orderkey AS BIGINT) AS complement
    FROM orders WHERE o_orderkey < 2000
    """,
)
def scalar_bitwise_funcs(spark, sf_dir):
    """Bitwise scalar battery [H] — AND/OR/XOR/NOT, shifts, popcount
    (HiveSQL's bit operators, which the reference's query surface gets
    from the executor; Spark ships the same semantics on BIGINT).
    These are the primitives the engine's own hash/banding operators
    compose (`simsearch_binary_hamming`'s xor+bit_count scan, b-bit
    minhash's masks), registered here as the user-facing surface.
    Exact integer outputs; one projection, zero shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("long").alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).cast("long").alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).cast("long").alias("toggled"),
        F.expr("o_orderkey << 2").cast("long").alias("shifted_up"),
        F.expr("o_orderkey >> 3").cast("long").alias("shifted_down"),
        F.bit_count(k).cast("long").alias("popcount"),
        F.expr("~o_orderkey").cast("long").alias("complement"),
    )


@query(
    "scalar_struct_funcs",
    oracle="""
    WITH built AS (
      SELECT c_custkey,
             struct_pack(k := c_nationkey, bal := round(c_acctbal, 2)) AS s
      FROM customer WHERE c_custkey < 300
    )
    SELECT c_custkey,
           CAST(s.k AS BIGINT) AS nation_field,
           s.bal AS bal_field,
           (s.k = 7) AS is_nation7,
           CAST(LENGTH(CAST(s.k AS VARCHAR)) AS INTEGER) AS key_digits
    FROM built
    """,
)
def scalar_struct_funcs(spark, sf_dir):
    """STRUCT scalar battery [H] — build (named_struct), field access
    (dot path), predicates on fields, and casting a field through a
    string function: the nested-type surface the reference's type
    system maps through ObjectInspectors (IcebergSchemaToTypeInfo.java:
    83-84 struct recursion; exercised in TestIcebergSerDe.java:99-137)
    and Spark expresses natively as StructType columns. Output columns
    are flattened scalars so the cross-engine hash compares leaf
    values, not engine-specific struct renderings. One projection,
    zero shuffle."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    s = F.named_struct(
        F.lit("k"), F.col("c_nationkey"),
        F.lit("bal"), F.round("c_acctbal", 2),
    )
    built = c.select("c_custkey", s.alias("s"))
    return built.select(
        "c_custkey",
        F.col("s.k").cast("long").alias("nation_field"),
        F.col("s.bal").alias("bal_field"),
        (F.col("s.k") == 7).alias("is_nation7"),
        F.length(F.col("s.k").cast("string")).cast("int").alias("key_digits"),
    )


@query(
    "scalar_regex_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER)
             AS n_numbers,
           regexp_matches(text, 'data') AS mentions_data,
           LENGTH(regexp_replace(text, '[aeiou]', '', 'g'))
             AS len_no_vowels,
           CAST(LENGTH(text) - LENGTH(regexp_replace(text, 'a', '', 'g'))
                AS INTEGER) AS n_a
    FROM documents WHERE doc_id < 200
    """,
)
def scalar_regex_funcs(spark, sf_dir):
    """REGEX scalar battery [H] — extract / extract-all count / match
    predicate / global replace / occurrence count, the HiveSQL regexp
    surface concentrated into one pinned battery (individual operators
    use these everywhere — PII scrub, boilerplate, langid — but the
    user-facing functions deserve their own parity row). Patterns stay
    in the Java∩RE2 portable subset: character classes, groups,
    literals — no lookaround, no backreferences (those genuinely
    diverge between engines and are documented out of the portable
    surface). One projection, zero shuffle."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_extract(t, "([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all(t, F.lit("[0-9]+"), F.lit(0)))
        .cast("int")
        .alias("n_numbers"),
        t.rlike("data").alias("mentions_data"),
        F.length(F.regexp_replace(t, "[aeiou]", "")).alias("len_no_vowels"),
        (F.length(t) - F.length(F.regexp_replace(t, "a", "")))
        .cast("int")
        .alias("n_a"),
    )


@query(
    "scalar_date_parts_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           STRFTIME(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS month_end,
           STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH,
                    '%Y-%m-%d') AS plus3mo
    FROM orders WHERE o_orderkey <= 500
    """,
)
def scalar_date_parts_funcs(spark, sf_dir):
    """Calendar-part scalar battery [§2.8 completion]: quarter, ISO
    week, day-of-week, day-of-year, month-end, month arithmetic.
    Cross-engine trivia pinned by the oracle: Spark's dayofweek is
    1=Sunday while DuckDB's is 0=Sunday (offset in the oracle), both
    engines' weekofyear is ISO-8601, and both clamp month addition to
    the target month's last day (Jan 31 + 1 month = Feb 29 in a leap
    year) — so `add_months` maps to `+ INTERVAL n MONTH` exactly.
    Pure projection: whole-stage codegen, no exchange."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3mo"),
    )

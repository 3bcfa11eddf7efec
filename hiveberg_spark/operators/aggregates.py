"""Aggregation operators (SURVEY.md §2.4).

HiveQL aggregate surface (executed by Hive in the reference) re-expressed
as Spark built-ins. Catalyst plans partial (map-side) + final aggregation
automatically — the property that makes these shuffle only the distinct
group keys, not the data, at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hiveberg_spark.caching import persist_tracked
from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query

_DEC = "decimal(30,6)"


@query(
    "agg_basic_stats",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS min_price,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_basic_stats(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast(_DEC)
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(dec).cast("double").alias("total"),
        F.min(dec).cast("double").alias("min_price"),
        F.max(dec).cast("double").alias("max_price"),
        (F.sum(dec).cast("double") / F.count("*")).alias("avg_price"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark, sf_dir):
    """Exact distinct: Catalyst expands to a two-phase expand+agg —
    shuffle is on (group, key) pairs, safe under skew at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS names
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """collect_list/collect_set parity (Hive UDAF surface), made
    deterministic by sorting before concatenation."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names")
    )


@query(
    "agg_median_percentile",
    oracle="""
    SELECT l_returnflag,
           MEDIAN(l_quantity) AS med_qty,
           CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median_percentile(spark, sf_dir):
    """Exact percentiles (interpolated) — matches DuckDB quantile_cont.
    At 100 TB the approximate sketch (percentile_approx) replaces this;
    declared as a checkable contract in sketches.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90_qty"),
    )


@query(
    "agg_stddev_corr",
    oracle="""
    SELECT l_linestatus,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
           ROUND(VAR_SAMP(l_discount), 6) AS var_disc,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_POP(l_quantity, l_extendedprice), 4) AS covar_qp
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_stddev_corr(spark, sf_dir):
    """Statistical aggregates. Both engines use single-pass co-moment
    updates whose exact float result is order-dependent — rounded to 6
    decimals to compare (verified stable at sf0.01/sf0.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_qp"),
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS status_O,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS status_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot with explicit value list (the scalable form — no extra pass
    to discover pivot values)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .count()
        .na.fill(0)
        .withColumnRenamed("O", "status_O")
        .withColumnRenamed("F", "status_F")
    )


@query(
    "events_hourly_rollup",
    oracle="""
    WITH base AS (
      SELECT STRFTIME(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_hour,
             STRFTIME(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S') AS bucket_day,
             event_type, value
      FROM events
    )
    SELECT bucket_day, bucket_hour, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM base
    GROUP BY GROUPING SETS ((bucket_day, bucket_hour, event_type),
                            (bucket_day, event_type),
                            (bucket_day))
    """,
)
def events_hourly_rollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate rollup [N]: one pass
    produces hour-level, day-level, and day-total aggregates via
    GROUPING SETS on aligned time buckets (the batch twin of a
    TimescaleDB/streaming rollup). Scale: Catalyst expands the sets
    map-side; one shuffle keyed on the expanded grouping id."""
    from hiveberg_spark.catalog import load_table as _lt

    e = _lt(spark, sf_dir, "events")
    e.select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "bucket_hour"
        ),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "bucket_day"
        ),
        "event_type",
        "value",
    ).createOrReplaceTempView("events_bucketed")
    return spark.sql(
        """
        SELECT bucket_day, bucket_hour, event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM events_bucketed
        GROUP BY GROUPING SETS ((bucket_day, bucket_hour, event_type),
                                (bucket_day, event_type),
                                (bucket_day))
        """
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel,
           ROUND((SELECT COUNT(*) FROM p) * 1.0
                 / (SELECT COUNT(*) FROM v), 6) AS conversion
    """,
)
def events_funnel_conversion(spark, sf_dir):
    """Ordered funnel analysis (the MATCH_RECOGNIZE/window-funnel class
    of event analytics): users progressing view → click → purchase in
    strict timestamp order, each stage anchored at the EARLIEST event
    after the previous stage's anchor (the standard greedy funnel
    semantics — a click before the first view does not count). Three
    conditional-min aggregations, every shuffle keyed on user_id so
    AQE reuses one partitioning end to end; stage frames shrink
    monotonically, and at 100 TB each stage join is a
    progressively-smaller semi-join, never a re-scan of raw events."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_full_funnel")))
        .select(
            "n_view",
            "n_view_click",
            "n_full_funnel",
            F.round(F.col("n_full_funnel") / F.col("n_view"), 6).alias(
                "conversion"
            ),
        )
    )


@query(
    "events_gapfill_locf",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*), 6) AS v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1 FROM events
    ), spine AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ), grid AS (
      SELECT u.user_id, s.h
      FROM (SELECT DISTINCT user_id FROM events) u, spine s
    )
    SELECT g.user_id, STRFTIME(g.h, '%Y-%m-%d %H:00:00') AS hour_s,
           LAST_VALUE(hourly.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.h
             ROWS UNBOUNDED PRECEDING) AS value_filled,
           (hourly.v IS NULL) AS is_gap
    FROM grid g
    LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h
    """,
)
def events_gapfill_locf(spark, sf_dir):
    """Time-series gap-fill with last-observation-carried-forward (the
    densification op every monitoring/feature pipeline runs before
    resampling): a complete user × hour grid spans the corpus's hour
    range, hours with no events join null, and LOCF fills them from
    each user's latest prior observation (hours before a user's first
    observation stay null — carrying backwards would fabricate data).
    Scale shape: the spine is a one-row agg exploded (broadcast side),
    the grid is |users| × |hours| — dimension-sized, never event-sized
    — and the only wide operations are the hourly pre-aggregation and
    one user-keyed window; hourly means are decimal-exact before the
    single double division."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("v")
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    grid = e.select("user_id").distinct().crossJoin(F.broadcast(spine))
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.date_format("h", "yyyy-MM-dd HH:00:00").alias("hour_s"),
            F.last("v", ignorenulls=True).over(w).alias("value_filled"),
            F.col("v").isNull().alias("is_gap"),
        )
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
      FROM events GROUP BY user_id
    ), sizes AS (
      SELECT cohort_day, COUNT(*) AS cohort_size
      FROM firsts GROUP BY cohort_day
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, date_trunc('day', e.ts))
               AS age_days
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT STRFTIME(a.cohort_day, '%Y-%m-%d') AS cohort,
           a.age_days,
           COUNT(*) AS n_active,
           s.cohort_size,
           ROUND(COUNT(*) * 1.0 / s.cohort_size, 6) AS retention
    FROM activity a JOIN sizes s USING (cohort_day)
    GROUP BY 1, 2, s.cohort_size
    """,
)
def events_cohort_retention(spark, sf_dir):
    """Cohort retention analysis (the day-N retention matrix every
    product-analytics stack computes): users cohort by first-seen day;
    each (cohort, age) cell counts distinct users active that many
    days after joining, normalized by cohort size. Two user-keyed
    aggregations share one shuffle partitioning; the cohort-size frame
    is day-cardinality and broadcasts. Day-N retention at 100 TB is a
    distinct-count per (cohort, age) cell — never a per-user loop."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(
                F.date_trunc("day", "ts"), F.col("cohort_day")
            ).alias("age_days"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_day", "age_days")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            F.col("age_days").cast("long"),
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
    )


@query(
    "events_ab_test",
    oracle="""
    WITH arms AS (
      SELECT user_id,
             (CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 2) AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ), agg AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
             CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
      FROM arms
    )
    , z AS (
      SELECT *,
             CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
                  THEN 0.0
                  ELSE (conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
                       / SQRT(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                              * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                              * (1.0 / n_a + 1.0 / n_b))
             END AS zval
      FROM agg
    )
    SELECT n_a, n_b, conv_a, conv_b,
           ROUND(conv_a * 1.0 / n_a, 6) AS rate_a,
           ROUND(conv_b * 1.0 / n_b, 6) AS rate_b,
           ROUND(zval, 6) AS z_score,
           (ABS(zval) > 1.96) AS significant
    FROM z
    """,
)
def events_ab_test(spark, sf_dir):
    """Two-proportion z-test over a deterministic hash split (the
    experimentation-platform primitive): users assign to arm A/B by an
    md5-derived bit, conversion = any 'purchase' event, and the pooled
    two-proportion z statistic decides significance at α=0.05. One
    user-keyed aggregation then a single four-number reduction — the
    entire test collapses to O(1) state regardless of corpus size,
    which is why experiment scorecards at 100 TB are cheap. All inputs
    to the float math are exact integer counts, so the z computation
    is operand-identical across engines (ROUND 6 guards the ULPs)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    arms = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).withColumn(
        "arm",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        ),
    )
    agg = arms.agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n_a"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    # degenerate arms (all or none converted): z pinned to 0, not NaN —
    # a no-signal experiment reads as not-significant, never as NULL
    z = F.when(
        (F.col("conv_a") + F.col("conv_b") == 0)
        | (F.col("conv_a") + F.col("conv_b") == F.col("n_a") + F.col("n_b")),
        F.lit(0.0),
    ).otherwise(
        (p_a - p_b)
        / F.sqrt(pooled * (1 - pooled) * (1 / F.col("n_a") + 1 / F.col("n_b")))
    )
    return agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant"),
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    )
    SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def events_transition_matrix(spark, sf_dir):
    """Event TRANSITION MATRIX (first-order Markov counts — the
    next-action analytics behind product flow diagrams and behavioral
    anomaly baselines): per user, each event pairs with its successor
    in (ts, event_id) order, then one count per (from, to) edge.
    One user-keyed window + one partial-aggregated count — both
    shuffles on keys AQE coalesces; at 100 TB this is a single
    events pass, never a self-join."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").cast("long").alias("n"))
    )


@query(
    "events_top_paths",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_no
                                   ORDER BY ts, event_id) AS rn
      FROM sessions
    ),
    paths AS (
      SELECT user_id, session_no,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM ranked WHERE rn <= 5 GROUP BY user_id, session_no
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
)
def events_top_paths(spark, sf_dir):
    """PATH analysis (the sequence sibling of the funnel and the
    transition matrix): top session journeys — each session's first
    five event types in order, '>'-joined — ranked by frequency. The
    per-pair transition matrix cannot distinguish A>B>C from C>B>A
    chains; full path counting is how product analytics finds dominant
    journeys. Pipeline: gaps-and-islands sessionization (one shuffle on
    user_id; the lag, cumulative-sum, and rank windows all reuse that
    partitioning), truncate to the session head (rn <= 5 caps the path
    alphabet so the path-keyed aggregation stays bounded at any scale),
    collect_list of (ts, event_id, type) structs sorted JVM-side for a
    deterministic join order, then one path-keyed count. Ordering ties
    break on (ts, event_id) in BOTH engines, and the top-20 boundary
    breaks on (n_sessions DESC, path), so the cut is cross-engine
    deterministic."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    marked = e.select(
        "user_id",
        "ts_us",
        "event_id",
        "event_type",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = marked.withColumn("session_no", F.sum("new_session").over(cum))
    ranked = sessions.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("user_id", "session_no").orderBy(
                "ts_us", "event_id"
            )
        ),
    ).filter(F.col("rn") <= 5)
    paths = (
        ranked.groupBy("user_id", "session_no")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts_us", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.concat_ws(
                ">", F.transform("evs", lambda s: s["event_type"])
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


@query(
    "events_rolling_actives",
    oracle="""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM du)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
      CAST(COUNT(DISTINCT CASE WHEN du.day = d.day
                               THEN du.user_id END) AS BIGINT) AS dau,
      CAST(COUNT(DISTINCT CASE WHEN du.day > d.day - 7
                               THEN du.user_id END) AS BIGINT) AS wau,
      CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS mau
    FROM days d JOIN du ON du.day BETWEEN d.day - 27 AND d.day
    GROUP BY d.day
    """,
)
def events_rolling_actives(spark, sf_dir):
    """Rolling active-user metrics (DAU / trailing-7-day WAU /
    trailing-28-day MAU per day) — the product-analytics staple that a
    plain window function cannot express exactly (COUNT(DISTINCT) over
    a RANGE frame is unsupported; approx sketches drift). Exact shape:
    dedupe events to (day, user) pairs FIRST (the only O(events) pass),
    then range-join the tiny day spine against the pair table and take
    three conditional distinct counts in ONE aggregation. Scale: the
    joined fan-out is days x active-pairs-in-window — bounded by 28 x
    |pairs|, independent of raw event volume; the spine is metadata-
    sized and broadcasts."""
    e = load_table(spark, sf_dir, "events").select(
        F.to_date(F.col("ts").cast("timestamp")).alias("day"), "user_id"
    )
    du = e.distinct()
    days = du.select(F.col("day").alias("d")).distinct()
    j = F.broadcast(days).join(
        du,
        (F.col("day") >= F.date_sub(F.col("d"), 27))
        & (F.col("day") <= F.col("d")),
    )
    return j.groupBy("d").agg(
        F.count_distinct(
            F.when(F.col("day") == F.col("d"), F.col("user_id"))
        ).alias("dau"),
        F.count_distinct(
            F.when(F.col("day") > F.date_sub(F.col("d"), 7), F.col("user_id"))
        ).alias("wau"),
        F.count_distinct("user_id").alias("mau"),
    ).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"), "dau", "wau", "mau"
    )


@query(
    "agg_numeric_histogram",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN CAST(o_totalprice AS DOUBLE) < 0 THEN 0
                  WHEN CAST(o_totalprice AS DOUBLE) >= 600000 THEN 13
                  ELSE CAST(FLOOR(CAST(o_totalprice AS DOUBLE)
                                  / (600000.0 / 12)) AS INTEGER) + 1
             END AS bucket,
             CAST(o_totalprice AS DECIMAL(18,6)) AS p
      FROM orders
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(p) AS DOUBLE) AS lo,
           CAST(MAX(p) AS DOUBLE) AS hi
    FROM b GROUP BY bucket
    """,
)
def agg_numeric_histogram(spark, sf_dir):
    """Equi-width numeric HISTOGRAM (the OLAP profiling staple —
    SQL width_bucket semantics: 12 buckets over [0, 600000), bucket 13
    for overflow): one map-side-combinable aggregation keyed by a pure
    arithmetic bucket expression — distribution profiling at 100 TB
    costs exactly one scan. Neither engine ships width_bucket (Spark
    has no such function; this DuckDB build lacks it), so BOTH sides
    spell out the identical floor definition — which also pins the
    cross-engine arithmetic exactly."""
    lo, hi, nb = 0.0, 600000.0, 12
    p = F.col("o_totalprice").cast("double")
    bucket = F.when(p < lo, F.lit(0)).when(p >= hi, F.lit(nb + 1)).otherwise(
        F.floor((p - lo) / ((hi - lo) / nb)) + 1
    )
    d = load_table(spark, sf_dir, "orders").select(
        bucket.cast("long").alias("bucket"),
        F.col("o_totalprice").cast("decimal(18,6)").alias("pd"),
    )
    return d.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("pd").cast("double").alias("lo"),
        F.max("pd").cast("double").alias("hi"),
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, AVG(n) AS mu, STDDEV_SAMP(n) AS sd
      FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, strftime(h.h, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(h.n AS BIGINT) AS n,
           ROUND((h.n - s.mu) / s.sd, 6) AS z
    FROM hourly h JOIN stats s USING (event_type)
    WHERE s.sd > 0 AND ABS(ROUND((h.n - s.mu) / s.sd, 6)) > 2
    """,
)
def events_anomaly_zscore(spark, sf_dir):
    """Volume ANOMALY detection (monitoring's bread and butter): per
    event type, flag hours whose event count sits more than 2 sample
    standard deviations from that type's hourly mean. Two cheap
    aggregations — hourly counts (map-side combinable over the raw
    stream) and per-type moments over the tiny hourly table — then a
    broadcast-sized join back; the raw events are touched exactly
    once. The z-score is ROUNDED before the threshold compare in both
    engines so a boundary hour can never flip on float-aggregation
    order."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h"),
    )
    hourly = e.groupBy("event_type", "h").agg(F.count("*").alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    z = F.round((F.col("n") - F.col("mu")) / F.col("sd"), 6)
    return (
        hourly.join(stats, "event_type")
        .filter((F.col("sd") > 0) & (F.abs(z) > 2))
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("n").cast("long").alias("n"),
            z.alias("z"),
        )
    )


@query(
    "events_attribution_touch",
    oracle="""
    WITH conv AS (
      SELECT event_id, ts, user_id, value FROM events
      WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT c.event_id AS conv_id, c.value, e.event_type,
             ROW_NUMBER() OVER (PARTITION BY c.event_id
                                ORDER BY e.ts DESC, e.event_id DESC)
               AS rn_last,
             ROW_NUMBER() OVER (PARTITION BY c.event_id
                                ORDER BY e.ts ASC, e.event_id ASC)
               AS rn_first
      FROM conv c JOIN events e
        ON e.user_id = c.user_id AND e.event_type <> 'purchase'
       AND (e.ts < c.ts OR (e.ts = c.ts AND e.event_id < c.event_id))
    ),
    lastt AS (
      SELECT conv_id, value, event_type FROM touch WHERE rn_last = 1
    ),
    firstt AS (SELECT conv_id, event_type FROM touch WHERE rn_first = 1),
    unattr AS (
      SELECT c.event_id AS conv_id, c.value, 'direct' AS event_type
      FROM conv c LEFT JOIN lastt l ON l.conv_id = c.event_id
      WHERE l.conv_id IS NULL
    ),
    last_all AS (
      SELECT * FROM lastt UNION ALL SELECT * FROM unattr
    ),
    first_all AS (
      SELECT conv_id, event_type FROM firstt
      UNION ALL SELECT conv_id, event_type FROM unattr
    ),
    lg AS (
      SELECT event_type AS channel, COUNT(*) AS n_last,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
               AS last_touch_value
      FROM last_all GROUP BY 1
    ),
    fg AS (
      SELECT event_type AS channel, COUNT(*) AS n_first
      FROM first_all GROUP BY 1
    )
    SELECT lg.channel, CAST(lg.n_last AS BIGINT) AS n_last_touch,
           CAST(COALESCE(fg.n_first, 0) AS BIGINT) AS n_first_touch,
           lg.last_touch_value
    FROM lg LEFT JOIN fg USING (channel)
    """,
)
def events_attribution_touch(spark, sf_dir):
    """CONVERSION ATTRIBUTION, last-touch and first-touch in one pass —
    the marketing-analytics primitive the events family lacked: each
    purchase credits (a) the user's latest prior non-purchase event
    and (b) their earliest prior one; purchases with no prior activity
    credit the synthetic 'direct' channel. Determinism: the prior-event
    ordering ties break on event_id in both engines, and attributed
    revenue sums as DECIMAL (house money-math rule) before one rounded
    double. Scale: the conv×history join shuffles on user_id and the
    per-conversion windows are bounded by per-user history — the
    standard attribution shape; no global window, no driver loops."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("cts"),
        "user_id",
        "value",
    )
    hist = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("hid"),
        F.col("ts").alias("hts"),
        F.col("event_type").alias("channel"),
    )
    from pyspark.sql import Window as W

    touch = conv.join(hist, "user_id").filter(
        (F.col("hts") < F.col("cts"))
        | ((F.col("hts") == F.col("cts")) & (F.col("hid") < F.col("conv_id")))
    )
    w_last = W.partitionBy("conv_id").orderBy(F.desc("hts"), F.desc("hid"))
    w_first = W.partitionBy("conv_id").orderBy(F.asc("hts"), F.asc("hid"))
    ranked = touch.withColumn("rn_last", F.row_number().over(w_last)).withColumn(
        "rn_first", F.row_number().over(w_first)
    ).persist()
    lastt = ranked.filter(F.col("rn_last") == 1).select(
        "conv_id", "value", "channel"
    )
    firstt = ranked.filter(F.col("rn_first") == 1).select("conv_id", "channel")
    unattr = conv.join(lastt.select("conv_id"), "conv_id", "left_anti").select(
        "conv_id", "value", F.lit("direct").alias("channel")
    )
    last_all = lastt.unionByName(unattr)
    first_all = firstt.unionByName(unattr.select("conv_id", "channel"))
    lg = last_all.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_last_touch"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
        ).alias("last_touch_value"),
    )
    fg = first_all.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_first")
    )
    out = lg.join(fg, "channel", "left").select(
        "channel",
        "n_last_touch",
        F.coalesce("n_first", F.lit(0)).cast("long").alias("n_first_touch"),
        "last_touch_value",
    )
    out = persist_tracked(out)
    out.count()
    ranked.unpersist()
    return out


@query(
    "events_attribution_linear",
    oracle="""
    WITH conv AS (
      SELECT event_id, ts, user_id, value FROM events
      WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT c.event_id AS conv_id, c.value, e.event_type,
             COUNT(*) OVER (PARTITION BY c.event_id) AS n_touches
      FROM conv c JOIN events e
        ON e.user_id = c.user_id AND e.event_type <> 'purchase'
       AND (e.ts < c.ts OR (e.ts = c.ts AND e.event_id < c.event_id))
    ),
    credit AS (
      SELECT event_type AS channel,
             CAST(ROUND(value / n_touches, 6) AS DECIMAL(18,6)) AS cr
      FROM touch
      UNION ALL
      SELECT 'direct', CAST(ROUND(c.value, 6) AS DECIMAL(18,6))
      FROM conv c LEFT JOIN (SELECT DISTINCT conv_id FROM touch) t
        ON t.conv_id = c.event_id
      WHERE t.conv_id IS NULL
    )
    SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
           ROUND(CAST(SUM(cr) AS DOUBLE), 2) AS linear_value
    FROM credit GROUP BY channel
    """,
)
def events_attribution_linear(spark, sf_dir):
    """LINEAR (multi-touch) ATTRIBUTION — the companion to
    `events_attribution_touch`: every prior non-purchase event of a
    converting user receives an EQUAL share of that purchase's value
    (value / n_touches), so channels that assist mid-journey get
    credit single-touch models erase; cold conversions credit
    'direct' in full. Determinism: the per-touch share is one IEEE
    division of identical doubles rounded to 6 dp, then summed as
    DECIMAL — fractional credits can never drift cross-engine. Same
    user_id-keyed, per-user-history-bounded join shape as the
    single-touch query."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("cts"),
        "user_id",
        "value",
    )
    hist = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("hid"),
        F.col("ts").alias("hts"),
        F.col("event_type").alias("channel"),
    )
    touch = (
        conv.join(hist, "user_id")
        .filter(
            (F.col("hts") < F.col("cts"))
            | (
                (F.col("hts") == F.col("cts"))
                & (F.col("hid") < F.col("conv_id"))
            )
        )
        .withColumn("n_touches", F.count("*").over(W.partitionBy("conv_id")))
    )
    credited = touch.select(
        "channel",
        F.round(F.col("value") / F.col("n_touches"), 6)
        .cast("decimal(18,6)")
        .alias("cr"),
    )
    direct = (
        conv.join(
            touch.select("conv_id").distinct(), "conv_id", "left_anti"
        ).select(
            F.lit("direct").alias("channel"),
            F.round(F.col("value"), 6).cast("decimal(18,6)").alias("cr"),
        )
    )
    return (
        credited.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_credits"),
            F.round(F.sum("cr").cast("double"), 2).alias("linear_value"),
        )
    )


_DECAY_HL_MICROS = 604800000000  # 7-day half-life, in epoch micros
_DECAY_K_CAP = 30  # cap the half-life count so 2^k stays in int range


@query(
    "events_attribution_decay",
    oracle=f"""
    WITH conv AS (
      SELECT event_id, ts, user_id, value FROM events
      WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT c.event_id AS conv_id, c.value, e.event_type,
             1.0 / (CAST(1 AS BIGINT) <<
                    LEAST((epoch_us(c.ts) - epoch_us(e.ts))
                          // {_DECAY_HL_MICROS}, {_DECAY_K_CAP})) AS w
      FROM conv c JOIN events e
        ON e.user_id = c.user_id AND e.event_type <> 'purchase'
       AND (e.ts < c.ts OR (e.ts = c.ts AND e.event_id < c.event_id))
    ),
    shared AS (
      SELECT event_type, value, w,
             SUM(w) OVER (PARTITION BY conv_id) AS sw
      FROM touch
    ),
    credit AS (
      SELECT event_type AS channel,
             CAST(ROUND(value * w / sw, 6) AS DECIMAL(18,6)) AS cr
      FROM shared
      UNION ALL
      SELECT 'direct', CAST(ROUND(c.value, 6) AS DECIMAL(18,6))
      FROM conv c LEFT JOIN (SELECT DISTINCT conv_id FROM touch) t
        ON t.conv_id = c.event_id
      WHERE t.conv_id IS NULL
    )
    SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
           ROUND(CAST(SUM(cr) AS DOUBLE), 2) AS decay_value
    FROM credit GROUP BY channel
    """,
)
def events_attribution_decay(spark, sf_dir):
    """TIME-DECAY multi-touch attribution — completes the attribution
    family (`events_attribution_touch`, `_linear`): each prior touch's
    credit halves for every whole half-life (7 days) between it and the
    conversion, so recent assists out-credit stale ones. Determinism by
    construction: the decay weight is EXACTLY a power of two (k = whole
    half-lives from exact integer epoch-micros division, capped at
    {_DECAY_K_CAP}; w = 1 / (1 << k)), and a per-conversion sum of
    dyadic rationals in [2^-{_DECAY_K_CAP}, 1] is exact in a double
    whatever the partition order — so value·w/sw is one IEEE division
    of identical doubles in both engines, rounded to 6 dp, summed as
    DECIMAL. Same user-keyed join shape as the other attribution ops:
    shuffle on user_id, per-user history only, never a global window."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("cts"),
        "user_id",
        "value",
    )
    hist = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("hid"),
        F.col("ts").alias("hts"),
        F.col("event_type").alias("channel"),
    )
    touch = (
        conv.join(hist, "user_id")
        .filter(
            (F.col("hts") < F.col("cts"))
            | (
                (F.col("hts") == F.col("cts"))
                & (F.col("hid") < F.col("conv_id"))
            )
        )
        .withColumn(
            "dmicros",
            F.unix_micros(F.col("cts").cast("timestamp"))
            - F.unix_micros(F.col("hts").cast("timestamp")),
        )
        .withColumn(
            "k",
            F.expr(
                f"least(dmicros div {_DECAY_HL_MICROS}L, {_DECAY_K_CAP})"
            ).cast("int"),
        )
        # 1.0 (double) / 2^k (long->double, exact for k<=30) — NOT the
        # decimal-typed `1.0 / shiftleft(...)` SQL form, whose
        # DECIMAL(23,22) result can't represent 2^-k for k in 23..30
        # (ADVICE r8): a double-vs-decimal 6-dp drift vs the DuckDB
        # oracle's double on long-horizon fixtures.
        .withColumn("w", F.expr("1.0D / shiftleft(1L, k)"))
        .withColumn("sw", F.sum("w").over(W.partitionBy("conv_id")))
    )
    credited = touch.select(
        "channel",
        F.round(F.col("value") * F.col("w") / F.col("sw"), 6)
        .cast("decimal(18,6)")
        .alias("cr"),
    )
    direct = (
        conv.join(
            touch.select("conv_id").distinct(), "conv_id", "left_anti"
        ).select(
            F.lit("direct").alias("channel"),
            F.round(F.col("value"), 6).cast("decimal(18,6)").alias("cr"),
        )
    )
    return (
        credited.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_credits"),
            F.round(F.sum("cr").cast("double"), 2).alias("decay_value"),
        )
    )


_MKV_G = 1_000_000_000  # probability grid (1e-9) for the integer chain
_MKV_T = 12  # propagation steps: geometric tail < (max cycle prob)^12
_MKV_CHANNELS = ("click", "error", "signup", "view")  # non-conversion states

_MKV_TRANSITIONS_SQL = """
    ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    firstp AS (
      SELECT user_id, MIN(rn) AS pr FROM ranked
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    journey AS (
      SELECT r.user_id, r.rn,
             CASE WHEN r.event_type = 'purchase' THEN 'CONV'
                  ELSE r.event_type END AS state
      FROM ranked r LEFT JOIN firstp f USING (user_id)
      WHERE f.pr IS NULL OR r.rn <= f.pr
    ),
    steps AS (
      SELECT user_id,
             COALESCE(LAG(state) OVER (PARTITION BY user_id ORDER BY rn),
                      'START') AS fs,
             state AS ts_
      FROM journey
    ),
    terminal AS (
      SELECT j.user_id, j.state AS fs, 'NULL' AS ts_
      FROM journey j
      JOIN (SELECT user_id, MAX(rn) AS mr FROM journey GROUP BY user_id) m
        ON m.user_id = j.user_id AND m.mr = j.rn
      LEFT JOIN firstp f ON f.user_id = j.user_id
      WHERE f.pr IS NULL
    ),
    trans AS (
      SELECT fs, ts_, COUNT(*) AS cnt
      FROM (SELECT fs, ts_ FROM steps UNION ALL SELECT fs, ts_ FROM terminal)
      GROUP BY fs, ts_
    )
"""


def _mkv_oracle() -> str:
    """Unrolled DuckDB oracle: quantized transition matrix, then one
    exact-integer propagation per variant (base + one per removed
    channel), T steps each — same integer round-half-away discipline as
    the PCA oracle, so no double ever carries a value either engine
    could round differently."""
    g, g2 = _MKV_G, 2 * _MKV_G
    s = f"""
    WITH {_MKV_TRANSITIONS_SQL},
    tot AS (SELECT fs, SUM(cnt) AS tot FROM trans GROUP BY fs),
    qm_base AS (
      SELECT t.fs, t.ts_,
             (2 * t.cnt * {g} + o.tot) // (2 * o.tot) AS qp
      FROM trans t JOIN tot o USING (fs)
      UNION ALL SELECT 'CONV', 'CONV', {g}
      UNION ALL SELECT 'NULL', 'NULL', {g}
    )"""
    variants = {"base": None}
    for c in _MKV_CHANNELS:
        variants[c] = c
    for name, removed in variants.items():
        if removed is not None:
            # transitions INTO the removed channel are redirected to NULL
            s += f""",
    qm_{name} AS (
      SELECT fs,
             CASE WHEN ts_ = '{removed}' THEN 'NULL' ELSE ts_ END AS ts_,
             SUM(qp) AS qp
      FROM qm_base WHERE fs <> '{removed}' GROUP BY 1, 2
    )"""
        s += f""",
    v_{name}_0 AS (SELECT 'START' AS state, CAST({g} AS BIGINT) AS q)"""
        for t in range(1, _MKV_T + 1):
            s += f""",
    v_{name}_{t} AS MATERIALIZED (
      SELECT m.ts_ AS state,
             CAST((2 * SUM(v.q * m.qp) + {g}) // {g2} AS BIGINT) AS q
      FROM v_{name}_{t - 1} v JOIN qm_{name} m ON m.fs = v.state
      GROUP BY m.ts_
    )"""
        s += f""",
    pc_{name} AS (
      SELECT COALESCE((SELECT q FROM v_{name}_{_MKV_T}
                       WHERE state = 'CONV'), 0) AS q
    )"""
    diffs = " + ".join(
        f"((SELECT q FROM pc_base) - (SELECT q FROM pc_{c}))"
        for c in _MKV_CHANNELS
    )
    rows = " UNION ALL ".join(
        f"""SELECT '{c}' AS channel,
           ROUND((SELECT q FROM pc_{c}) / {float(g)}, 6) AS removal_pconv,
           ROUND(((SELECT q FROM pc_base) - (SELECT q FROM pc_{c}))
                 / CAST((SELECT q FROM pc_base) AS DOUBLE), 6)
             AS removal_effect,
           ROUND(((SELECT q FROM pc_base) - (SELECT q FROM pc_{c}))
                 / CAST(NULLIF({diffs}, 0) AS DOUBLE), 6) AS credit"""
        for c in _MKV_CHANNELS
    )
    return s + "\n    " + rows


@query("events_markov_removal", oracle=_mkv_oracle())
def events_markov_removal(spark, sf_dir):
    """MARKOV-CHAIN (removal-effect) ATTRIBUTION — the data-driven model
    that heuristic attribution (`events_attribution_touch/_linear/
    _decay`) approximates: build the first-order journey chain
    (START -> channels -> CONV/NULL, one journey per user up to the
    first purchase), then credit each channel by how much the
    conversion probability DROPS when that channel is removed
    (transitions into it redirected to NULL) — Anderl et al. 2016's
    removal effect. Two-tier execution, the PCA/`embedding_pca_power`
    pattern: transition COUNTING is the distributed work (two window
    functions and a groupBy over all events — one shuffle on user_id),
    while the chain SOLVE runs on the collected <=36-cell quantized
    matrix — metadata-sized by nature, like a d x d Gram. Determinism:
    probabilities live on an integer 1e-9 grid (exact round-half-away
    division), the {_MKV_T}-step absorbing propagation is pure integer
    arithmetic in BOTH engines (Python ints here, HUGEINT CTEs in the
    oracle), and the final effect/credit ratios divide integers that
    are exact in doubles. Credit denominator is the integer sum of
    removal drops, so no cross-engine float summation order exists."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w))
    firstp = (
        ranked.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("pr"))
    )
    journey = (
        ranked.join(firstp, "user_id", "left")
        .filter(F.col("pr").isNull() | (F.col("rn") <= F.col("pr")))
        .select(
            "user_id",
            "rn",
            "pr",
            F.when(F.col("event_type") == "purchase", "CONV")
            .otherwise(F.col("event_type"))
            .alias("state"),
        )
    )
    wj = W.partitionBy("user_id").orderBy("rn")
    steps = journey.select(
        F.coalesce(F.lag("state").over(wj), F.lit("START")).alias("fs"),
        F.col("state").alias("ts_"),
    )
    last = journey.withColumn(
        "mr", F.max("rn").over(W.partitionBy("user_id"))
    ).filter((F.col("rn") == F.col("mr")) & F.col("pr").isNull())
    terminal = last.select(F.col("state").alias("fs"), F.lit("NULL").alias("ts_"))
    trans = (
        steps.unionByName(terminal)
        .groupBy("fs", "ts_")
        .agg(F.count("*").alias("cnt"))
    )
    # <=36 cells: the chain solve is metadata-sized — collect and run the
    # identical integer recurrence in Python (house two-tier pattern)
    cells = [(r["fs"], r["ts_"], r["cnt"]) for r in trans.collect()]
    tot: dict[str, int] = {}
    for fs, _ts, cnt in cells:
        tot[fs] = tot.get(fs, 0) + cnt
    g = _MKV_G
    qm: dict[tuple[str, str], int] = {
        (fs, ts): (2 * cnt * g + tot[fs]) // (2 * tot[fs])
        for fs, ts, cnt in cells
    }
    qm[("CONV", "CONV")] = g
    qm[("NULL", "NULL")] = g

    def pconv(removed: str | None) -> int:
        m: dict[tuple[str, str], int] = {}
        for (fs, ts), qp in qm.items():
            if fs == removed:
                continue
            key = (fs, "NULL" if ts == removed else ts)
            m[key] = m.get(key, 0) + qp
        v = {"START": g}
        for _ in range(_MKV_T):
            nxt: dict[str, int] = {}
            for (fs, ts), qp in m.items():
                if fs in v:
                    nxt[ts] = nxt.get(ts, 0) + v[fs] * qp
            v = {s: (2 * q + g) // (2 * g) for s, q in nxt.items()}
        return v.get("CONV", 0)

    pc = pconv(None)
    drops = {c: pc - pconv(c) for c in _MKV_CHANNELS}
    sum_drop = sum(drops.values())
    rows = [
        (
            c,
            round((pc - drops[c]) / float(g), 6),
            round(drops[c] / float(pc), 6),
            round(drops[c] / float(sum_drop), 6) if sum_drop else None,
        )
        for c in _MKV_CHANNELS
    ]
    return spark.createDataFrame(
        rows,
        "channel string, removal_pconv double, removal_effect double, "
        "credit double",
    )


_CUPED_SPLIT = "2024-01-16"  # pre-period / experiment-period boundary


@query(
    "events_cuped",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             (CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 2) AS arm,
             CAST(ROUND(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                            THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END)
                        * 100) AS BIGINT) AS xc,
             CAST(ROUND(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                            THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END)
                        * 100) AS BIGINT) AS yc
      FROM events GROUP BY user_id
    ),
    mom AS (
      SELECT COUNT(*) AS n,
             SUM(xc) AS sx, SUM(yc) AS sy,
             SUM(xc * xc) AS sxx, SUM(xc * yc) AS sxy
      FROM per_user
    ),
    theta AS (
      SELECT CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS th,
             CAST(sx AS DOUBLE) / n AS xbar
      FROM mom
    )
    SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(SUM(yc) / COUNT(*) / 100.0, 6) AS mean_post,
           ROUND((SUM(yc) * 1.0 / COUNT(*)
                  - t.th * (SUM(xc) * 1.0 / COUNT(*) - t.xbar)) / 100.0, 6)
             AS mean_adjusted,
           ROUND(t.th, 6) AS theta
    FROM per_user CROSS JOIN theta t
    GROUP BY arm, t.th, t.xbar
    """,
)
def events_cuped(spark, sf_dir):
    """CUPED variance-reduced experiment readout (Deng et al. WSDM
    2013 — the industry-standard A/B variance cut): each user's
    EXPERIMENT-period metric is adjusted by their PRE-period metric,
    y* = y - theta (x - mean x) with theta = cov(x,y)/var(x) pooled, so
    between-user spend variance that existed before the experiment
    stops masking the treatment effect. Companion to `events_ab_test`
    (same md5 arm hashing). Determinism by integer moments: per-user
    pre/post sums accumulate as DECIMAL (order-free), quantize to
    integer cents, and every moment (Sx, Sy, Sxx, Sxy) is an exact
    integer — theta and the adjusted means are IEEE ops on identical
    sub-2^63 operands in both engines, rounded to 6 dp. One shuffle on
    user_id, one tiny moments aggregate broadcast back."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    dec = F.col("value").cast("decimal(18,6)")
    per_user = ev.groupBy("user_id").agg(
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 2
        ).alias("arm"),
        F.round(
            F.sum(F.when(F.col("ts").cast("timestamp") < split, dec).otherwise(F.lit(0).cast("decimal(18,6)"))) * 100
        )
        .cast("long")
        .alias("xc"),
        F.round(
            F.sum(F.when(F.col("ts").cast("timestamp") >= split, dec).otherwise(F.lit(0).cast("decimal(18,6)"))) * 100
        )
        .cast("long")
        .alias("yc"),
    )
    mom = per_user.agg(
        F.count("*").alias("n"),
        F.sum("xc").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("xc") * F.col("xc")).alias("sxx"),
        F.sum(F.col("xc") * F.col("yc")).alias("sxy"),
    ).select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("th"),
        (F.col("sx").cast("double") / F.col("n")).alias("xbar"),
    )
    return (
        per_user.crossJoin(F.broadcast(mom))
        .groupBy("arm", "th", "xbar")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.round(F.sum("yc") / F.count("*") / 100.0, 6).alias("mean_post"),
            F.round(
                (
                    F.sum("yc") * 1.0 / F.count("*")
                    - F.first("th") * (F.sum("xc") * 1.0 / F.count("*") - F.first("xbar"))
                )
                / 100.0,
                6,
            ).alias("mean_adjusted"),
            F.round(F.first("th"), 6).alias("theta"),
        )
        .select("arm", "n_users", "mean_post", "mean_adjusted", "theta")
    )


# -- bot / automated-traffic detection (round 9) --------------------------------

_BOT_RATE_EPH = 100.0  # events-per-hour flag threshold (humans: ~0.1)
_BOT_N = 500  # planted events per synthetic bot
_BOT_USERS = 3  # planted bot accounts


@query(
    "events_bot_detection",
    oracle=f"""
    WITH bots AS (
      SELECT 9000 + b AS user_id,
             TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i) SECOND AS ts,
             'click' AS event_type
      FROM generate_series(0, {_BOT_USERS - 1}) AS g(b),
           generate_series(0, {_BOT_N - 1}) AS s(i)
    ),
    aug AS (
      SELECT user_id, ts, event_type FROM events
      UNION ALL
      SELECT user_id, ts, event_type FROM bots
    ),
    per_user AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
             (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS span_secs,
             CAST(COUNT(*) FILTER (WHERE hour(ts) BETWEEN 0 AND 5)
                  AS BIGINT) AS n_night
      FROM aug GROUP BY user_id
    )
    SELECT user_id, n_events, n_types,
           CAST(span_secs AS BIGINT) AS span_secs,
           ROUND(n_events * 3600.0 / GREATEST(span_secs, 1), 6)
             AS events_per_hour,
           ROUND(CAST(n_night AS DOUBLE) / n_events, 6) AS night_share,
           (n_events * 3600.0 / GREATEST(span_secs, 1) > {_BOT_RATE_EPH}
            OR n_types = 1) AS is_bot
    FROM per_user
    """,
)
def events_bot_detection(spark, sf_dir):
    """BOT / AUTOMATED-TRAFFIC detection — the first scrub a web-events
    corpus runs before any engagement signal is trusted (and the events
    twin of the documents table's quality filters): per-user request
    rate, event-type diversity, and night-hour share, flagged on
    rate > {_BOT_RATE_EPH}/hour or single-type behavior. The fixture has
    no bots (all users ~0.1 events/hour, all 5 types), so {_BOT_USERS}
    synthetic bot accounts are planted — {_BOT_N} single-type events at
    exactly 1-second cadence — which must flag while every organic user
    stays clean. Shape: ONE groupBy(user_id) over the event stream
    (map-side combinable; no windows, no joins), the same aggregate a
    1000-executor run computes per shard and merges. span/counts are
    exact integers; the two ratios are single IEEE divisions, 6 dp."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    bots = (
        spark.range(_BOT_USERS)
        .select(
            (F.lit(9000) + F.col("id")).alias("user_id"),
            F.explode(
                F.sequence(F.lit(0), F.lit(_BOT_N - 1))
            ).alias("i"),
        )
        .select(
            "user_id",
            F.timestamp_micros(
                F.unix_micros(base) + F.col("i") * 1000000
            ).alias("ts"),
            F.lit("click").alias("event_type"),
        )
    )
    aug = ev.unionByName(bots)
    span = (
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
        / F.lit(1000000)
    ).cast("long")
    per_user = aug.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        span.alias("span_secs"),
        F.sum(F.hour("ts").between(0, 5).cast("long")).alias("n_night"),
    )
    eph = F.col("n_events") * 3600.0 / F.greatest(F.col("span_secs"), F.lit(1))
    return per_user.select(
        "user_id",
        "n_events",
        "n_types",
        "span_secs",
        F.round(eph, 6).alias("events_per_hour"),
        F.round(F.col("n_night").cast("double") / F.col("n_events"), 6).alias(
            "night_share"
        ),
        ((eph > _BOT_RATE_EPH) | (F.col("n_types") == 1)).alias("is_bot"),
    )


# -- exact weighted percentiles (round 9) ----------------------------------------


@query(
    "agg_weighted_percentile",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS flag, l_extendedprice AS v,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ),
    cum AS (
      SELECT flag, v, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY v, l_rowid
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY flag) AS tw
      FROM (SELECT *, ROW_NUMBER() OVER () AS l_rowid FROM base)
    )
    SELECT flag,
           CAST(MAX(tw) AS BIGINT) AS total_weight,
           MIN(CASE WHEN cw >= 0.5 * tw THEN v END) AS wp50,
           MIN(CASE WHEN cw >= 0.9 * tw THEN v END) AS wp90
    FROM cum GROUP BY flag
    """,
)
def agg_weighted_percentile(spark, sf_dir):
    """EXACT WEIGHTED percentiles [H→N] — the quantile a WEIGHTED corpus
    needs (soft-dedup weights, mixture weights, row multiplicities):
    the smallest value whose cumulative weight reaches q·W, here p50/p90
    of extendedprice weighted by quantity per returnflag. Determinism by
    construction: weights are exact integers, so the cumulative sums
    and q·W comparisons are identical cross-engine, and the answer is a
    VALUE picked from the data (never interpolated arithmetic) — intra-
    tie ordering cannot change which value first crosses the threshold.
    Shape: one window sort per group (the inherent cost of an exact
    quantile) + one groupBy; a 100 TB run swaps in the approx sketch
    (`agg_percentile_approx`) and keeps this as the auditor."""
    from pyspark.sql import Window as W

    base = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    wcum = (
        W.partitionBy("flag")
        .orderBy("v", "w")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = base.select(
        "flag",
        "v",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(W.partitionBy("flag")).alias("tw"),
    )
    return cum.groupBy("flag").agg(
        F.max("tw").alias("total_weight"),
        F.min(F.when(F.col("cw") >= 0.5 * F.col("tw"), F.col("v"))).alias(
            "wp50"
        ),
        F.min(F.when(F.col("cw") >= 0.9 * F.col("tw"), F.col("v"))).alias(
            "wp90"
        ),
    )


# -- conversion latency (round 9, wave 2) ----------------------------------------


@query(
    "events_time_to_convert",
    oracle="""
    WITH conv AS (
      SELECT event_id AS conv_id, ts AS cts, user_id FROM events
      WHERE event_type = 'purchase'
    ),
    first_touch AS (
      SELECT conv_id, channel, ttc_secs FROM (
        SELECT c.conv_id, e.event_type AS channel,
               (epoch_us(c.cts) - epoch_us(e.ts)) // 1000000 AS ttc_secs,
               ROW_NUMBER() OVER (
                 PARTITION BY c.conv_id
                 ORDER BY e.ts, e.event_id) AS rn
        FROM conv c JOIN events e
          ON e.user_id = c.user_id AND e.event_type <> 'purchase'
         AND (e.ts < c.cts OR (e.ts = c.cts AND e.event_id < c.conv_id))
      ) WHERE rn = 1
    ),
    cum AS (
      SELECT channel, ttc_secs,
             SUM(1) OVER (PARTITION BY channel ORDER BY ttc_secs, conv_id
                          ROWS UNBOUNDED PRECEDING) AS cn,
             COUNT(*) OVER (PARTITION BY channel) AS n
      FROM first_touch
    )
    SELECT channel,
           CAST(MAX(n) AS BIGINT) AS n_conversions,
           CAST(MIN(ttc_secs) AS BIGINT) AS min_secs,
           CAST(MAX(ttc_secs) AS BIGINT) AS max_secs,
           ROUND(CAST(SUM(ttc_secs) AS DOUBLE) / MAX(n), 6) AS avg_secs,
           CAST(MIN(CASE WHEN cn >= 0.5 * n THEN ttc_secs END) AS BIGINT)
             AS p50_secs
    FROM cum GROUP BY channel
    """,
)
def events_time_to_convert(spark, sf_dir):
    """CONVERSION LATENCY by acquiring channel — the funnel-health
    metric beside the attribution family: for each conversion, the time
    from its FIRST prior touch (earliest same-user non-purchase event,
    event_id tiebreak) to purchase, rolled up per first-touch channel
    as min/max/avg and an EXACT p50 (smallest latency whose cumulative
    count reaches half — the `agg_weighted_percentile` value-crossing
    trick, so no interpolation arithmetic can drift cross-engine).
    Latencies are exact integer seconds from epoch-micros division.
    Shape: the same user-keyed history join as `events_attribution_*`
    (shuffle on user_id, per-user history only) + one per-channel
    window for the exact median — at 100 TB the median swaps to the
    approx-percentile sketch and this stays the auditor."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type",
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("cts"),
        "user_id",
    )
    hist = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("hid"),
        F.col("ts").alias("hts"),
        F.col("event_type").alias("channel"),
    )
    touches = conv.join(hist, "user_id").filter(
        (F.col("hts") < F.col("cts"))
        | ((F.col("hts") == F.col("cts")) & (F.col("hid") < F.col("conv_id")))
    )
    wfirst = W.partitionBy("conv_id").orderBy("hts", "hid")
    first = (
        touches.withColumn("rn", F.row_number().over(wfirst))
        .filter(F.col("rn") == 1)
        .select(
            "conv_id",
            "channel",
            (
                (F.unix_micros("cts") - F.unix_micros("hts"))
                / F.lit(1000000)
            ).cast("long").alias("ttc_secs"),
        )
    )
    wcum = (
        W.partitionBy("channel")
        .orderBy("ttc_secs", "conv_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = first.select(
        "channel",
        "ttc_secs",
        F.count("*").over(wcum).alias("cn"),
        F.count("*").over(W.partitionBy("channel")).alias("n"),
    )
    return cum.groupBy("channel").agg(
        F.max("n").alias("n_conversions"),
        F.min("ttc_secs").alias("min_secs"),
        F.max("ttc_secs").alias("max_secs"),
        F.round(F.sum("ttc_secs").cast("double") / F.max("n"), 6).alias(
            "avg_secs"
        ),
        F.min(
            F.when(F.col("cn") >= 0.5 * F.col("n"), F.col("ttc_secs"))
        ).alias("p50_secs"),
    )


# -- churn-model feature table (round 9, wave 6) -----------------------------------


@query(
    "events_churn_features",
    oracle="""
    WITH bounds AS (
      SELECT epoch_us(MIN(ts)) AS lo,
             epoch_us(MIN(ts))
               + ((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) * 4) // 5
               AS cutoff
      FROM events
    ),
    feat AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                  AS BIGINT) AS n_purchases,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 2)
               AS total_value,
             CAST((MAX(b.cutoff) - epoch_us(MAX(ts))) // 86400000000
                  AS BIGINT) AS days_inactive
      FROM events e, bounds b
      WHERE epoch_us(e.ts) < b.cutoff
      GROUP BY user_id
    ),
    future AS (
      SELECT DISTINCT user_id FROM events e, bounds b
      WHERE epoch_us(e.ts) >= b.cutoff
    )
    SELECT f.user_id, f.n_events, f.n_purchases, f.n_types,
           f.total_value, f.days_inactive,
           (fu.user_id IS NULL) AS churned
    FROM feat f LEFT JOIN future fu USING (user_id)
    """,
)
def events_churn_features(spark, sf_dir):
    """CHURN-MODEL FEATURE TABLE — the feature-engineering op a
    training-data pipeline materializes from an event stream, built
    with the one discipline that matters: features come ONLY from
    before the temporal cutoff (80% of the corpus time range) and the
    label ONLY from after it, so the table is leakage-free by
    construction. Per-user: activity counts, purchase counts, type
    diversity, DECIMAL-exact spend, whole-days-inactive at cutoff;
    label = no post-cutoff events. Everything derives from exact
    integer epoch-micros arithmetic — the cutoff is lo + (range*4) div 5,
    pure integer division both engines compute identically (a double
    0.8-multiply would truncate in Spark but round in DuckDB whenever
    frac(range*0.8) >= 0.5); spend rounds after
    an exact DECIMAL sum. Shape: one bounds aggregate (one-row
    broadcast), one pre-cutoff groupBy, one post-cutoff semi-side —
    two corpus passes at any scale."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    # pure INTEGER arithmetic for the 80% cutoff (ADVICE r9 #2): Spark's
    # non-ANSI double->long cast truncates while DuckDB's rounds
    # half-to-even, so (range * 0.8)::long can differ by 1 micro between
    # engines; (range * 4) div 5 is exact and identical in both.
    bounds = ev.agg(
        (
            F.unix_micros(F.min("ts"))
            + F.expr(
                "((unix_micros(max(ts)) - unix_micros(min(ts))) * 4) div 5"
            )
        ).alias("cutoff")
    )
    w = ev.crossJoin(F.broadcast(bounds))
    pre = w.filter(F.unix_micros("ts") < F.col("cutoff"))
    feat = pre.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "n_purchases"
        ),
        F.countDistinct("event_type").alias("n_types"),
        F.round(
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double"), 2
        ).alias("total_value"),
        F.expr("(max(cutoff) - unix_micros(max(ts))) div 86400000000").alias(
            "days_inactive"
        ),
    )
    future = (
        w.filter(F.unix_micros("ts") >= F.col("cutoff"))
        .select("user_id")
        .distinct()
        .withColumn("_active", F.lit(1))
    )
    return feat.join(future, "user_id", "left").select(
        "user_id",
        "n_events",
        "n_purchases",
        "n_types",
        "total_value",
        "days_inactive",
        F.col("_active").isNull().alias("churned"),
    )


# -- sample-ratio-mismatch check (round 9, wave 8) ----------------------------------

_SRM_CRIT = 3.841459  # chi-square 95% critical value, df=1


@query(
    "events_ab_srm_check",
    oracle=f"""
    WITH arms AS (
      SELECT user_id,
             (CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 2) AS arm
      FROM events GROUP BY user_id
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM arms
    )
    SELECT n_a, n_b,
           ROUND((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
                 / ((n_a + n_b) / 2.0)
                 + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
                 / ((n_a + n_b) / 2.0), 6) AS chi2,
           ((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
            / ((n_a + n_b) / 2.0)
            + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
            / ((n_a + n_b) / 2.0)) > {_SRM_CRIT} AS srm_detected
    FROM agg
    """,
)
def events_ab_srm_check(spark, sf_dir):
    """SAMPLE-RATIO-MISMATCH check — the guardrail every experimentation
    platform runs BEFORE reading a scorecard (a biased assignment makes
    `events_ab_test`'s z-test meaningless): chi-square of the observed
    arm sizes against the designed 50/50 split, flagged past the 95%
    critical value (df=1, {_SRM_CRIT}). Uses the SAME md5 arm hash as
    the A/B scorecard, so this row certifies that assignment. All
    inputs are exact integer counts; the statistic is a fixed IEEE
    expression on them, rounded to 6 dp. One groupBy + a one-row
    aggregate — free at any scale."""
    e = load_table(spark, sf_dir, "events").select("user_id")
    arms = e.groupBy("user_id").agg(F.count("*").alias("_n")).withColumn(
        "arm",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        ),
    )
    agg = arms.agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n_a"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n_b"),
    )
    e_half = (F.col("n_a") + F.col("n_b")) / 2.0
    chi2 = (F.col("n_a") - e_half) * (F.col("n_a") - e_half) / e_half + (
        F.col("n_b") - e_half
    ) * (F.col("n_b") - e_half) / e_half
    return agg.select(
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > _SRM_CRIT).alias("srm_detected"),
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q,
             COUNT(*) AS c
      FROM lineitem GROUP BY 1, 2
    )
    SELECT flag, q AS mode_quantity, CAST(c AS BIGINT) AS mode_count
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY flag
                                   ORDER BY c DESC, q) AS rn
      FROM counts
    ) WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark, sf_dir):
    """DETERMINISTIC MODE [H] — the most-frequent value per group with
    an explicit tie policy (highest count, then smallest value). SQL
    `mode()` leaves ties implementation-defined in both engines, so the
    portable formulation is count + rank — which is also the SCALABLE
    one: the count table is map-side combinable and the rank window
    runs over (group, distinct-value) pairs, never rows. Completes the
    §2.4 aggregate battery beside percentile/stddev/collect."""
    from pyspark.sql import Window as W

    counts = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .agg(F.count("*").alias("c"))
    )
    w = W.partitionBy("flag").orderBy(F.desc("c"), F.asc("q"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "flag",
            F.col("q").alias("mode_quantity"),
            F.col("c").alias("mode_count"),
        )
    )


# -- seasonal-baseline anomaly flags (round 9, wave 10) ------------------------------

_SEASONAL_FACTOR = 2.0  # flag cells at > 2x their hour-of-day baseline


@query(
    "events_seasonal_anomaly",
    oracle=f"""
    WITH cells AS (
      SELECT event_type, CAST(ts AS DATE) AS day, hour(ts) AS hod,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    baseline AS (
      SELECT event_type, hod,
             CAST(SUM(n) AS BIGINT) AS total_n,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM cells GROUP BY 1, 2
    )
    SELECT c.event_type, strftime(c.day, '%Y-%m-%d') AS day,
           CAST(c.hod AS BIGINT) AS hod,
           CAST(c.n AS BIGINT) AS n,
           ROUND(CAST(b.total_n AS DOUBLE) / b.n_days, 6) AS baseline,
           (c.n * b.n_days > {_SEASONAL_FACTOR} * b.total_n) AS is_anomaly
    FROM cells c JOIN baseline b USING (event_type, hod)
    WHERE c.n * b.n_days > {_SEASONAL_FACTOR} * b.total_n
    """,
)
def events_seasonal_anomaly(spark, sf_dir):
    """SEASONAL-BASELINE anomaly flags — the deviation detector that
    respects daily rhythm (a 2 AM traffic level normal at 2 PM IS an
    anomaly; the plain z-score `events_anomaly_zscore` can't see that):
    each (event_type, day, hour) cell compares against its OWN
    hour-of-day baseline (mean count over all days at that hour), and
    cells above {_SEASONAL_FACTOR}× baseline surface. The comparison is
    cross-multiplied into pure integer arithmetic (n·n_days >
    {_SEASONAL_FACTOR}·total_n — no float threshold edge can diverge
    cross-engine); the reported baseline is one rounded division.
    Shape: one (type, day, hour) groupBy + one (type, hour) rollup +
    one equi-join — all map-side-combinable, calendar-bounded keys."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    cells = persist_tracked(ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hod"),
    ).agg(F.count("*").alias("n")))
    baseline = cells.groupBy("event_type", "hod").agg(
        F.sum("n").alias("total_n"), F.count("*").alias("n_days")
    )
    j = cells.join(baseline, ["event_type", "hod"])
    anom = F.col("n") * F.col("n_days") > _SEASONAL_FACTOR * F.col("total_n")
    return j.filter(anom).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("hod").cast("long").alias("hod"),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("total_n").cast("double") / F.col("n_days"), 6).alias(
            "baseline"
        ),
        anom.alias("is_anomaly"),
    )


# -- LTV cohort revenue curves (round 9, wave 11) ------------------------------------


@query(
    "events_ltv_cohort_curve",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events
      GROUP BY user_id
    ),
    rev AS (
      SELECT f.cohort_day,
             (CAST(e.ts AS DATE) - f.cohort_day) // 7 AS age_week,
             SUM(CAST(e.value AS DECIMAL(30,6))) AS wk_rev
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    ),
    sized AS (SELECT cohort_day, COUNT(*) AS cohort_n FROM firsts GROUP BY 1)
    SELECT strftime(r.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(r.age_week AS BIGINT) AS age_week,
           CAST(s.cohort_n AS BIGINT) AS cohort_n,
           ROUND(CAST(SUM(r.wk_rev) OVER (
                   PARTITION BY r.cohort_day ORDER BY r.age_week
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS cum_revenue,
           ROUND(CAST(SUM(r.wk_rev) OVER (
                   PARTITION BY r.cohort_day ORDER BY r.age_week
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) / s.cohort_n, 6)
             AS ltv_per_user
    FROM rev r JOIN sized s USING (cohort_day)
    """,
)
def events_ltv_cohort_curve(spark, sf_dir):
    """LTV COHORT CURVES — cumulative revenue per signup cohort by age
    week, the companion to `events_cohort_retention` every growth
    dashboard pairs it with: users cohorted by first-seen day, purchase
    revenue bucketed into whole age-weeks, cumulated along each
    cohort's timeline, normalized per cohort member. Determinism:
    ages are exact integer day arithmetic; revenue sums as DECIMAL
    (order-free) and converts to double once per output cell, ROUND
    2/6. Shape: one first-seen groupBy, one (cohort, age) rollup, one
    window over the tiny (cohort-day × age-week) calendar grid — the
    window never touches raw events."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    sized = firsts.groupBy("cohort_day").agg(F.count("*").alias("cohort_n"))
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.floor(
                F.datediff(F.to_date("ts"), F.col("cohort_day")) / 7
            ).alias("age_week"),
        )
        .agg(F.sum(F.col("value").cast("decimal(30,6)")).alias("wk_rev"))
    )
    wcum = (
        W.partitionBy("cohort_day")
        .orderBy("age_week")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = F.sum("wk_rev").over(wcum).cast("double")
    return rev.join(sized, "cohort_day").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("age_week").cast("long").alias("age_week"),
        "cohort_n",
        F.round(cum, 2).alias("cum_revenue"),
        F.round(cum / F.col("cohort_n"), 6).alias("ltv_per_user"),
    )


# -- exact higher moments (round 9, wave 11) -----------------------------------------


@query(
    "agg_higher_moments",
    oracle="""
    WITH q AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS v
      FROM lineitem
    ),
    sums AS (
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s1,
             CAST(SUM(v * v) AS BIGINT) AS s2,
             CAST(SUM(v * v * v) AS BIGINT) AS s3,
             CAST(SUM(v * v * v * v) AS BIGINT) AS s4
      FROM q GROUP BY flag
    )
    SELECT flag, n,
           ROUND(CAST(s1 AS DOUBLE) / n, 6) AS mean,
           ROUND((CAST(s3 AS DOUBLE) / n
                  - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                  + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n))
                 / POW(CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                       1.5), 6) AS skewness,
           ROUND((CAST(s4 AS DOUBLE) / n
                  - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                  + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s2 AS DOUBLE) / n)
                  - 3.0 * POW(CAST(s1 AS DOUBLE) / n, 4))
                 / POW(CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                       2) - 3.0, 6) AS excess_kurtosis
    FROM sums
    """,
)
def agg_higher_moments(spark, sf_dir):
    """EXACT higher moments [H] — per-group skewness and excess
    kurtosis from explicit integer POWER SUMS (Σv, Σv², Σv³, Σv⁴ over
    the integer-valued quantity column), assembled with one fixed IEEE
    expression per output: built-in skewness()/kurtosis() differ
    between engines on bias correction (sample vs population), so the
    portable formulation IS the population-moment formula both engines
    evaluate on identical exact integers. The power sums are the
    map-side-combinable sufficient statistics a 100 TB profile pass
    ships per shard and merges by addition — the same mergeability
    argument as the CMS/HLL sketches, exact instead of approximate."""
    q = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("v"),
    )
    v = F.col("v")
    sums = q.groupBy("flag").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    m1 = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n")
    m3 = F.col("s3").cast("double") / F.col("n")
    m4 = F.col("s4").cast("double") / F.col("n")
    var = m2 - m1 * m1
    skew = (m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1) / F.pow(var, 1.5)
    kurt = (m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * F.pow(m1, 4)) / F.pow(
        var, 2
    ) - 3.0
    return sums.select(
        "flag",
        "n",
        F.round(m1, 6).alias("mean"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
    )


# -- time-constrained funnel (round 9, wave 13) --------------------------------------

_FUNNEL_STEP1_MICROS = 86400000000  # click within 1 day of first view
_FUNNEL_STEP2_MICROS = 604800000000  # purchase within 7 days of that click


@query(
    "events_funnel_windowed",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id
       AND e.ts > v.t
       AND epoch_us(e.ts) - epoch_us(v.t) <= {_FUNNEL_STEP1_MICROS}
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id
       AND e.ts > c.t
       AND epoch_us(e.ts) - epoch_us(c.t) <= {_FUNNEL_STEP2_MICROS}
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_1d,
           (SELECT COUNT(*) FROM p) AS n_purchase_7d,
           ROUND((SELECT COUNT(*) FROM p) * 1.0
                 / (SELECT COUNT(*) FROM v), 6) AS windowed_conversion
    """,
)
def events_funnel_windowed(spark, sf_dir):
    """TIME-CONSTRAINED funnel — the MATCH_RECOGNIZE-shaped sequence
    query (`events_funnel_conversion` is the unbounded form): a click
    counts only within 1 DAY of the user's first view, a purchase only
    within 7 DAYS of that qualifying click — the attribution-window
    semantics every marketing funnel actually uses, where an unbounded
    funnel silently over-credits. Deltas are exact integer epoch-micros
    comparisons. Shape: the same user-keyed stepwise min-joins as the
    unbounded funnel (shuffle on user_id, per-user history only) plus
    one integer conjunct per step — at 100 TB the time bound also
    PRUNES the join (a range condition AQE can exploit), making the
    windowed form cheaper than the unbounded one, not dearer."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("vt")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("vt"))
            & (
                F.unix_micros("ts") - F.unix_micros("vt")
                <= _FUNNEL_STEP1_MICROS
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("ct"))
            & (
                F.unix_micros("ts") - F.unix_micros("ct")
                <= _FUNNEL_STEP2_MICROS
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    nv = v.agg(F.count("*").alias("n_view"))
    clicks_row = c.agg(F.count("*").alias("n_click_1d"))
    purch_row = p.agg(F.count("*").alias("n_purchase_7d"))
    return (
        nv.crossJoin(F.broadcast(clicks_row))
        .crossJoin(F.broadcast(purch_row))
        .select(
            "n_view",
            "n_click_1d",
            "n_purchase_7d",
            F.round(
                F.col("n_purchase_7d") * 1.0 / F.col("n_view"), 6
            ).alias("windowed_conversion"),
        )
    )


# -- arg-max/arg-min battery (round 10) ---------------------------------------------


@query(
    "agg_argminmax",
    oracle="""
    SELECT source,
           arg_max(doc_id, n_chars * 100000000 + doc_id) AS longest_doc,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           arg_min(doc_id, n_chars * 100000000 + doc_id) AS shortest_doc,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars
    FROM documents GROUP BY source
    """,
)
def agg_argminmax(spark, sf_dir):
    """ARG-MAX / ARG-MIN aggregates (`max_by` / `min_by`) — the
    "which row holds the extreme" aggregate every data audit needs
    (longest/shortest document per source here). Determinism: raw
    max_by/min_by are tie-UNSTABLE in both engines, so the ordering
    key is the exact integer n_chars * 1e8 + doc_id — unique per row,
    identical arithmetic in Spark and DuckDB (`arg_max`/`arg_min`).
    Scale: one source-keyed hash aggregate with map-side partials;
    max_by partials carry one (value, key) pair per group per task."""
    d = load_table(spark, sf_dir, "documents")
    ordk = F.col("n_chars") * F.lit(100000000) + F.col("doc_id")
    return d.groupBy("source").agg(
        F.max_by("doc_id", ordk).alias("longest_doc"),
        F.max("n_chars").alias("max_chars"),
        F.min_by("doc_id", ordk).alias("shortest_doc"),
        F.min("n_chars").alias("min_chars"),
    )


# -- exact-moment OLS regression (round 10) -----------------------------------------


@query(
    "agg_ols_regression",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x,
             CAST(value AS DECIMAL(30,6)) AS y
      FROM events
    ),
    m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(x) AS sx,
             SUM(x * x) AS sxx,
             SUM(y) AS sy,
             SUM(x * y) AS sxy,
             SUM(y * y) AS syy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n, 6)
             AS intercept,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM m
    """,
)
def agg_ols_regression(spark, sf_dir):
    """OLS REGRESSION from exact moments — slope/intercept/R² of event
    value vs hour-of-day per event type, the regression-aggregate
    surface (`regr_slope`-family) built the deterministic way: the five
    sufficient moments Σx, Σx², Σy, Σxy, Σy² are EXACT (x integer, y
    summed as DECIMAL(30,6) — addition order can't drift them), and the
    float math happens once per GROUP on those exact scalars, so both
    engines compute bit-identical results where native regr_* (float
    accumulation in data order) would not. Scale: one event_type-keyed
    aggregate with map-side partials — the moments are the classic
    one-pass distributed-regression shape."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("long").alias("x"),
        F.col("value").cast("decimal(30,6)").alias("y"),
    )
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    den_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    slope = num / den_x
    return m.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"),
            6,
        ).alias("intercept"),
        F.round(num * num / (den_x * den_y), 6).alias("r2"),
    )


# -- experiment power / minimum-detectable-effect (round 10) ------------------------

#: two-sided alpha=0.05 and power=0.80 normal quantiles (fixed literals
#: so both engines compute from identical constants)
_Z_ALPHA = 1.959964
_Z_BETA = 0.841621


@query(
    "events_ab_power_mde",
    oracle=f"""
    WITH arms AS (
      SELECT user_id,
             (CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 2) AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ), agg AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                  AS BIGINT) AS conv_a,
             CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                  AS BIGINT) AS conv_b
      FROM arms
    ), m AS (
      SELECT *,
             (conv_a + conv_b) * 1.0 / (n_a + n_b) AS p,
             ({_Z_ALPHA} + {_Z_BETA})
               * SQRT((conv_a + conv_b) * 1.0 / (n_a + n_b)
                      * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                      * (1.0 / n_a + 1.0 / n_b)) AS mde
      FROM agg
    )
    SELECT n_a, n_b,
           ROUND(p, 6) AS pooled_rate,
           ROUND(mde, 6) AS mde_abs,
           ROUND(mde / p, 6) AS mde_rel,
           (ABS(conv_a * 1.0 / n_a - conv_b * 1.0 / n_b) > mde)
             AS observed_exceeds_mde
    FROM m
    """,
)
def events_ab_power_mde(spark, sf_dir):
    """EXPERIMENT POWER / MDE readout — the question every experiment
    review asks before trusting a flat result: what's the smallest
    conversion lift this sample could have detected at α=0.05 /
    power=0.80? MDE = (z_α/2 + z_β) · sqrt(p(1-p)(1/n_a + 1/n_b)) on
    the same md5 arm split as `events_ab_test`/`events_ab_srm_check`
    (completing the A/B battery: effect, sample-ratio sanity, CUPED
    variance cut, and now sensitivity). The normal quantiles are fixed
    literals; every other input is an exact integer count, so the float
    math runs once on identical operands in both engines. Scale: one
    user-keyed aggregate then a four-number reduction — O(1) state."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    arms = (
        e.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
        .withColumn(
            "arm",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(2),
            ),
        )
    )
    agg = arms.agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n_a"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n_b"),
        F.sum(
            F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)
        ).alias("conv_a"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)
        ).alias("conv_b"),
    )
    p = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    mde = F.lit(_Z_ALPHA + _Z_BETA) * F.sqrt(
        p * (1 - p) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    diff = F.abs(
        F.col("conv_a") / F.col("n_a") - F.col("conv_b") / F.col("n_b")
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(p, 6).alias("pooled_rate"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / p, 6).alias("mde_rel"),
        (diff > mde).alias("observed_exceeds_mde"),
    )


# -- EWMA daily smoothing (round 10) ------------------------------------------------

_EWMA_ALPHA = 0.3     # decay: weight (1-alpha)^age
_EWMA_HORIZON = 14    # days of history per smoothed point


@query(
    "events_ewma_daily",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT t.event_type, t.day, t.n,
             CAST(FLOOR(POWER({1 - _EWMA_ALPHA},
                              date_diff('day', j.day, t.day)) * 1000000)
                  AS BIGINT) AS w,
             j.n AS xj
      FROM daily t JOIN daily j
        ON t.event_type = j.event_type
       AND j.day <= t.day
       AND date_diff('day', j.day, t.day) <= {_EWMA_HORIZON}
    )
    SELECT event_type, STRFTIME(day, '%Y-%m-%d') AS day,
           CAST(MAX(n) AS BIGINT) AS n,
           ROUND(CAST(SUM(w * xj) AS DOUBLE) / SUM(w), 6) AS ewma
    FROM pairs GROUP BY event_type, day
    """,
)
def events_ewma_daily(spark, sf_dir):
    """EWMA-SMOOTHED daily event counts — the monitoring primitive
    behind `events_seasonal_anomaly`'s baseline: per event type, each
    day's exponentially-weighted moving average over a {_EWMA_HORIZON}-
    day horizon with decay (1-α)^age, α={_EWMA_ALPHA}. Determinism:
    each weight quantizes to integer micro-units (FLOOR(pow·1e6)) and
    the weighted sum runs as INTEGER × INTEGER — float summation order
    can't move the hash; one double division closes each point. Scale:
    the corpus collapses to a (type × calendar-day) frame in one keyed
    aggregate; the horizon self-join and the final aggregate run on
    that bounded frame, never on raw events."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("n"))
    t = daily.select(
        "event_type", F.col("day").alias("td"), F.col("n").alias("tn")
    )
    j = daily.select(
        F.col("event_type").alias("event_type_j"),
        F.col("day").alias("jd"),
        F.col("n").alias("xj"),
    )
    age = F.datediff(F.col("td"), F.col("jd"))
    pairs = t.join(
        j,
        (t.event_type == j.event_type_j)
        & (F.col("jd") <= F.col("td"))
        & (age <= _EWMA_HORIZON),
    ).select(
        "event_type",
        "td",
        "tn",
        F.floor(F.pow(F.lit(1 - _EWMA_ALPHA), age) * F.lit(1000000))
        .cast("long")
        .alias("w"),
        "xj",
    )
    return pairs.groupBy("event_type", "td").agg(
        F.max("tn").alias("n"),
        F.round(
            F.sum(F.col("w") * F.col("xj")).cast("double") / F.sum("w"), 6
        ).alias("ewma"),
    ).select(
        "event_type",
        F.date_format("td", "yyyy-MM-dd").alias("day"),
        "n",
        "ewma",
    )


# -- uplift by spend decile (round 10) ----------------------------------------------


@query(
    "events_uplift_deciles",
    oracle="""
    WITH u AS (
      SELECT user_id,
             SUM(CAST(value AS DECIMAL(30,6))) AS spend,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted,
             (CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 2) AS arm
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY spend DESC, user_id) AS rn,
             COUNT(*) OVER () AS nu
      FROM u
    ),
    d AS (SELECT *, (rn * 10 + nu - 1) // nu AS decile FROM r)
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           ROUND(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) * 1.0
                 / NULLIF(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END), 0), 6)
             AS rate_a,
           ROUND(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) * 1.0
                 / NULLIF(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END), 0), 6)
             AS rate_b,
           ROUND(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) * 1.0
                 / NULLIF(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END), 0)
                 - SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) * 1.0
                 / NULLIF(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END), 0), 6)
             AS uplift
    FROM d GROUP BY decile
    """,
)
def events_uplift_deciles(spark, sf_dir):
    """MODEL-FREE UPLIFT CURVE by spend decile — the experiment readout
    that asks WHERE the effect lives, not just whether it exists: users
    decile by total spend (1 = biggest spenders), then per decile the
    A-vs-B conversion gap on the standard md5 arm split. Deciles use
    the exact integer rule ceil(rank·10/n) = (rn·10 + n − 1) div n on
    a DISTRIBUTED rank: `global_positions` over the user-level
    (spend DESC, user_id) order — a user-cardinality frame two-phase
    ranked with one range exchange, never a single-task window (the
    r9-judge anti-pattern this repo pins against registry-wide). Spend
    ranks on the exact DECIMAL sum; rates divide exact counts once per
    3-to-4-row group; an empty arm in a decile yields NULL rate/uplift
    in both engines rather than a crash."""
    from hiveberg_spark.operators.pipeline_ops import global_positions

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    users = persist_tracked(
        ev.groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(30,6)")).alias("spend"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
        .withColumn(
            "arm",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(2),
            ),
        )
    )  # persisted: ranked AND counted below
    pos = global_positions(
        users, [F.desc("spend"), F.asc("user_id")], 8, position_col="rn"
    )
    nu = users.agg(F.count("*").alias("nu"))
    d = pos.crossJoin(F.broadcast(nu)).withColumn(
        "decile", F.expr("cast((rn * 10 + nu - 1) div nu as int)")
    )
    n_a = F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
    n_b = F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
    c_a = F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
    c_b = F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
    rate_a = c_a * 1.0 / F.nullif(n_a, F.lit(0))
    rate_b = c_b * 1.0 / F.nullif(n_b, F.lit(0))
    return d.groupBy("decile").agg(
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(rate_a - rate_b, 6).alias("uplift"),
    )


# -- RFM segmentation (round 10) -----------------------------------------------------


@query(
    "events_rfm_segmentation",
    oracle="""
    WITH b AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events),
    u AS (
      SELECT user_id,
             date_diff('day', MAX(CAST(ts AS DATE)), (SELECT maxd FROM b))
               AS recency,
             COUNT(*) AS freq,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(value AS DECIMAL(30,6))
                      ELSE CAST(0 AS DECIMAL(30,6)) END) AS monetary
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT *,
        ROW_NUMBER() OVER (ORDER BY recency ASC, user_id) AS rr,
        ROW_NUMBER() OVER (ORDER BY freq DESC, user_id) AS fr,
        ROW_NUMBER() OVER (ORDER BY monetary DESC, user_id) AS mr,
        COUNT(*) OVER () AS n
      FROM u
    ),
    s AS (
      SELECT monetary,
             CAST((rr * 5 + n - 1) // n AS INTEGER) AS r_score,
             CAST((fr * 5 + n - 1) // n AS INTEGER) AS f_score,
             CAST((mr * 5 + n - 1) // n AS INTEGER) AS m_score
      FROM r
    )
    SELECT r_score, f_score, m_score, CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(monetary) AS DOUBLE) / COUNT(*), 6) AS avg_monetary
    FROM s GROUP BY 1, 2, 3
    """,
)
def events_rfm_segmentation(spark, sf_dir):
    """RFM SEGMENTATION — the classic marketing cut: each user scores
    1..5 on Recency (days since last event, most recent = 1), Frequency
    (event count, most active = 1), and Monetary (exact DECIMAL purchase
    spend, biggest = 1); the output is the (R,F,M) segment census with
    average spend. Quintiles use ceil(rank*5/n) = (rank*5 + n - 1) div n
    on DISTRIBUTED ranks: three `global_positions` passes over the
    user-cardinality frame (one range exchange each — never a
    single-task ROW_NUMBER window, the r9-judge anti-pattern pinned
    registry-wide by tests/test_single_partition_sweep.py), joined back
    on user_id. Ordering keys are exact (integer days, counts, DECIMAL
    sums) with user_id tiebreaks, so quintile boundaries cannot drift
    cross-engine; the only float is one double division per output
    segment (≤125 rows)."""
    from hiveberg_spark.operators.pipeline_ops import global_positions

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.col("ts").cast("timestamp").cast("date").alias("day"),
    )
    mxday = ev.agg(F.max("day").alias("maxd"))
    users = persist_tracked(
        ev.groupBy("user_id")
        .agg(
            F.max("day").alias("last_day"),
            F.count("*").alias("freq"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(30,6)"),
                ).otherwise(F.lit(0).cast("decimal(30,6)"))
            ).alias("monetary"),
        )
        .crossJoin(F.broadcast(mxday))
        .select(
            "user_id",
            "freq",
            "monetary",
            F.datediff("maxd", "last_day").alias("recency"),
        )
    )  # consumed by three rank passes + the count below
    pr = global_positions(
        users, [F.asc("recency"), F.asc("user_id")], 8, position_col="rr"
    ).select("user_id", "monetary", "rr")
    pf = global_positions(
        users, [F.desc("freq"), F.asc("user_id")], 8, position_col="fr"
    ).select("user_id", "fr")
    pm = global_positions(
        users, [F.desc("monetary"), F.asc("user_id")], 8, position_col="mr"
    ).select("user_id", "mr")
    nu = users.agg(F.count("*").alias("n"))
    scored = (
        pr.join(pf, "user_id")
        .join(pm, "user_id")
        .crossJoin(F.broadcast(nu))
        .select(
            "monetary",
            F.expr("cast((rr * 5 + n - 1) div n as int)").alias("r_score"),
            F.expr("cast((fr * 5 + n - 1) div n as int)").alias("f_score"),
            F.expr("cast((mr * 5 + n - 1) div n as int)").alias("m_score"),
        )
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_users"),
        F.round(
            F.sum("monetary").cast("double") / F.count("*"), 6
        ).alias("avg_monetary"),
    )


# -- Kaplan-Meier survival (round 10) ------------------------------------------------


@query(
    "events_survival_km",
    oracle="""
    WITH b AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events),
    u AS (
      SELECT user_id, event_type,
             MIN(CAST(ts AS DATE)) AS fd, MAX(CAST(ts AS DATE)) AS ld
      FROM events GROUP BY 1, 2
    ),
    lf AS (
      SELECT date_diff('day', fd, ld) AS lifetime_days,
             CASE WHEN ld < (SELECT maxd FROM b) - 3 THEN 1 ELSE 0 END
               AS observed
      FROM u
    ),
    g AS (
      SELECT lifetime_days, SUM(observed) AS d, COUNT(*) AS c
      FROM lf GROUP BY lifetime_days
    ),
    r AS (
      SELECT *, SUM(c) OVER (ORDER BY lifetime_days
                             ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS n_risk
      FROM g
    ),
    death AS (
      SELECT lifetime_days, d, n_risk,
             CASE WHEN d < n_risk
                  THEN CAST(FLOOR(LN(1 - d * 1.0 / n_risk) * 1000000)
                            AS BIGINT)
                  ELSE NULL END AS lnq
      FROM r WHERE d > 0
    ),
    km AS (
      SELECT lifetime_days, d, n_risk,
             SUM(COALESCE(lnq, 0)) OVER w AS s_micro,
             SUM(CASE WHEN lnq IS NULL THEN 1 ELSE 0 END) OVER w AS absorbed
      FROM death
      WINDOW w AS (ORDER BY lifetime_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(lifetime_days AS BIGINT) AS lifetime_days,
           CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS n_deaths,
           CASE WHEN absorbed > 0 THEN 0.0
                ELSE ROUND(EXP(s_micro / 1000000.0), 6) END AS survival
    FROM km
    """,
)
def events_survival_km(spark, sf_dir):
    """KAPLAN-MEIER survival curve over activity episodes: each
    (user, event_type) pair is a subject whose lifetime is last-minus-
    first active day, observed (churned) if its last activity predates
    the corpus end by more than 3 days, else right-censored. Classic KM:
    at each death time t, S(t) *= (1 - d_t/n_t) with n_t = subjects
    still at risk. Determinism: each factor's ln quantizes to integer
    micro-nats (FLOOR(ln·1e6), the sample_perplexity_split trick) so the
    product is an INTEGER prefix sum — float order can't move the hash;
    one EXP + ROUND closes each point, and a d_t = n_t absorbing state
    pins survival to exactly 0 in both engines instead of ln(0). Scale:
    the corpus collapses to a (user,type)-keyed aggregate, then to a
    per-lifetime-day count frame; the two windows (suffix n_risk, prefix
    product) run on that CALENDAR-BOUNDED frame (≤ days-of-history
    rows), never on raw events — allowlisted by that justification in
    the single-partition sweep."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").cast("date").alias("day"),
    )
    mxday = ev.agg(F.max("day").alias("maxd"))
    lf = (
        ev.groupBy("user_id", "event_type")
        .agg(F.min("day").alias("fd"), F.max("day").alias("ld"))
        .crossJoin(F.broadcast(mxday))
        .select(
            F.datediff("ld", "fd").alias("lifetime_days"),
            F.when(
                F.col("ld") < F.date_sub(F.col("maxd"), 3), 1
            ).otherwise(0).alias("observed"),
        )
    )
    g = lf.groupBy("lifetime_days").agg(
        F.sum("observed").alias("d"), F.count("*").alias("c")
    )
    # suffix sum over the calendar-bounded lifetime frame: subjects at
    # risk at t = all with lifetime >= t
    w_suffix = W.orderBy("lifetime_days").rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    r = g.withColumn("n_risk", F.sum("c").over(w_suffix))
    death = r.filter(F.col("d") > 0).withColumn(
        "lnq",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.floor(
                F.log(1 - F.col("d") * 1.0 / F.col("n_risk")) * 1000000
            ).cast("long"),
        ),
    )
    w_prefix = W.orderBy("lifetime_days").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    km = death.select(
        "lifetime_days",
        "d",
        "n_risk",
        F.sum(F.coalesce("lnq", F.lit(0))).over(w_prefix).alias("s_micro"),
        F.sum(F.when(F.col("lnq").isNull(), 1).otherwise(0))
        .over(w_prefix)
        .alias("absorbed"),
    )
    return km.select(
        F.col("lifetime_days").cast("long"),
        F.col("n_risk").cast("long"),
        F.col("d").cast("long").alias("n_deaths"),
        F.when(F.col("absorbed") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("s_micro") / 1000000.0), 6))
        .alias("survival"),
    )


# -- DAU/WAU stickiness (round 10) ---------------------------------------------------


@query(
    "events_dau_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
    wau AS (
      SELECT du.day + CAST(o AS INTEGER) AS day,
             COUNT(DISTINCT user_id) AS wau7
      FROM du, UNNEST(generate_series(0, 6)) AS t(o)
      GROUP BY 1
    )
    SELECT STRFTIME(dau.day, '%Y-%m-%d') AS day, CAST(dau AS BIGINT) AS dau,
           CAST(wau7 AS BIGINT) AS wau7,
           ROUND(dau * 1.0 / wau7, 6) AS stickiness
    FROM dau JOIN wau USING (day)
    """,
)
def events_dau_stickiness(spark, sf_dir):
    """DAU/WAU STICKINESS — for every active day, the ratio of that
    day's distinct users to the trailing-7-day distinct users (the
    product-health metric behind every engagement dashboard). Sliding
    distinct counts don't window: instead each (day, user) row of the
    DISTINCT activity frame is EXPLODED to the 7 target days it serves
    [d, d+6], then one keyed distinct-count per target day — a bounded
    7× expansion of the distinct frame (not of raw events), all keyed
    aggregations, no window at all. At 100 TB the distinct (day, user)
    frame is the users×days grid, orders of magnitude below the event
    log; the explode factor is the window length, a constant."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").cast("date").alias("day"), "user_id"
    )
    du = persist_tracked(ev.distinct())  # consumed by dau AND wau
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    wau = (
        du.withColumn("o", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .select(F.date_add("day", F.col("o")).alias("day"), "user_id")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau7"))
    )
    return dau.join(wau, "day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau7",
        F.round(F.col("dau") * 1.0 / F.col("wau7"), 6).alias("stickiness"),
    )


# -- inter-arrival quantiles (round 10) ----------------------------------------------


@query(
    "events_inter_arrival_stats",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type, CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           CAST(quantile_cont(gap_us, 0.5) AS DOUBLE) AS med_gap_us,
           CAST(quantile_cont(gap_us, 0.9) AS DOUBLE) AS p90_gap_us
    FROM seq GROUP BY event_type
    """,
)
def events_inter_arrival_stats(spark, sf_dir):
    """INTER-ARRIVAL time distribution per event type: consecutive-event
    gaps within each (user, type) stream (exact microsecond integers
    from a user-keyed lag window — keyed, so it scales), then the exact
    interpolated median and p90 per type. Spark's percentile() and
    DuckDB's quantile_cont share the linear-interpolation contract
    (rank = p·(n-1)), proven by agg_median_percentile; gaps are exact
    BIGINTs so interpolation happens on identical inputs. At 100 TB the
    exact percentile becomes percentile_approx (declared contract in
    sketches.py); the gap computation itself is the scale-correct part
    — one keyed window, no global sort."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    seq = ev.withColumn("gap_us", us - F.lag(us).over(w))
    return seq.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.percentile("gap_us", F.lit(0.5)).alias("med_gap_us"),
        F.percentile("gap_us", F.lit(0.9)).alias("p90_gap_us"),
    )


# -- Pareto concentration of activity (round 10, wave 6) -----------------------------


@query(
    "events_pareto_share",
    oracle="""
    WITH u AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rn,
                 COUNT(*) OVER () AS nu, SUM(n) OVER () AS tot FROM u),
    g AS (SELECT (rn*10 + nu - 1) // nu AS decile, COUNT(*) AS n_users,
                 SUM(n) AS n_events, MAX(tot) AS tot FROM r GROUP BY 1)
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_events AS BIGINT) AS n_events,
           ROUND(CAST(SUM(n_events) OVER (ORDER BY decile
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE) / tot, 6) AS cum_share
    FROM g
    """,
)
def events_pareto_share(spark, sf_dir):
    """PARETO / concentration curve of user activity — the 80/20 audit:
    users decile by event count (1 = most active), each decile reporting
    its user count, event count, and the CUMULATIVE share of all events
    produced by deciles 1..d. Reads directly as "the top 10% of users
    produce X% of traffic" — the skew number that sizes salting keys and
    per-user rate limits. Scale: user-cardinality aggregate, distributed
    `global_positions` rank (one range exchange, never a single-task
    window), integer decile rule ceil(rank·10/n); the only unpartitioned
    window is the cumulative sum over the DECILE frame — exactly ≤10
    rows, allowlisted by that justification in the sweep."""
    from pyspark.sql import Window as W

    from hiveberg_spark.operators.pipeline_ops import global_positions

    u = persist_tracked(
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )  # consumed by the rank pass and the totals row
    pos = global_positions(
        u, [F.desc("n"), F.asc("user_id")], 8, position_col="rn"
    )
    nu = u.agg(F.count("*").alias("nu"), F.sum("n").alias("tot"))
    g = (
        pos.crossJoin(F.broadcast(nu))
        .withColumn("decile", F.expr("cast((rn * 10 + nu - 1) div nu as int)"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n").alias("n_events"),
            F.max("tot").alias("tot"),
        )
    )
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return g.select(
        "decile",
        "n_users",
        "n_events",
        F.round(
            F.sum("n_events").over(w).cast("double") / F.col("tot"), 6
        ).alias("cum_share"),
    )


# -- robust anomaly detection via MAD (round 10, wave 6) -----------------------------


@query(
    "events_anomaly_mad",
    oracle="""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
                   FROM events GROUP BY 1, 2),
    med AS (SELECT event_type, CAST(quantile_cont(n, 0.5) AS DOUBLE) AS med
            FROM daily GROUP BY 1),
    dev AS (SELECT d.event_type, d.day, d.n, m.med, ABS(d.n - m.med) AS ad
            FROM daily d JOIN med m USING (event_type)),
    mad AS (SELECT event_type, CAST(quantile_cont(ad, 0.5) AS DOUBLE) AS mad
            FROM dev GROUP BY 1)
    SELECT d.event_type, STRFTIME(d.day, '%Y-%m-%d') AS day,
           CAST(d.n AS BIGINT) AS n,
           ROUND((d.n - d.med) / NULLIF(1.4826 * m.mad, 0), 6) AS robust_z,
           (ABS(d.n - d.med) > 3 * 1.4826 * m.mad) AS is_anomaly
    FROM dev d JOIN mad m USING (event_type)
    """,
)
def events_anomaly_mad(spark, sf_dir):
    """ROBUST anomaly detection on daily volumes: per event type, each
    day's count scores as a MEDIAN/MAD z-score — (n - median) /
    (1.4826·MAD) — instead of mean/stddev, so one traffic spike can't
    inflate the baseline and mask itself (the events_anomaly_zscore
    failure mode this op exists to complement). Exact interpolated
    medians on integer day-counts are identical cross-engine (the
    agg_median_percentile contract); the MAD=0 degenerate case NULLs the
    score in both engines. Scale: the corpus collapses to a
    (type × day) frame in one keyed aggregate; both median passes are
    type-keyed aggregations on that calendar-bounded frame — no windows,
    no single-partition funnels."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
    )
    daily = persist_tracked(
        ev.groupBy("event_type", "day").agg(F.count("*").alias("n"))
    )  # consumed by the median pass and the deviation join
    med = daily.groupBy("event_type").agg(
        F.percentile("n", F.lit(0.5)).alias("med")
    )
    dev = persist_tracked(
        daily.join(med, "event_type").withColumn(
            "ad", F.abs(F.col("n") - F.col("med"))
        )
    )  # consumed by the MAD pass and the final score join
    mad = dev.groupBy("event_type").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad")
    )
    return dev.join(mad, "event_type").select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.round(
            (F.col("n") - F.col("med"))
            / F.nullif(F.lit(1.4826) * F.col("mad"), F.lit(0.0)),
            6,
        ).alias("robust_z"),
        (
            F.abs(F.col("n") - F.col("med"))
            > F.lit(3) * F.lit(1.4826) * F.col("mad")
        ).alias("is_anomaly"),
    )


# -- boolean aggregate battery (round 10, wave 6) ------------------------------------


@query(
    "agg_boolean_funcs",
    oracle="""
    SELECT l_returnflag,
           CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_disc,
           bool_and(l_quantity > 0) AS all_pos_qty,
           bool_or(l_tax > 0.07) AS any_high_tax,
           bool_and(l_extendedprice > 100) AS all_price_gt100
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_boolean_funcs(spark, sf_dir):
    """Boolean aggregate battery (SURVEY §2.4 surface): count_if,
    bool_and (EVERY), bool_or (ANY/SOME) — the predicates-as-aggregates
    analysts reach for before writing CASE pyramids. All JVM built-ins
    with map-side partial aggregation: each partition reduces to one
    (count, and, or) triple per group before the shuffle, so the
    exchange carries O(groups), not O(rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_disc"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_pos_qty"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.bool_and(F.col("l_extendedprice") > 100).alias("all_price_gt100"),
    )


# -- new vs returning users (round 10, wave 8) ---------------------------------------


@query(
    "events_new_vs_returning",
    oracle="""
    WITH fs AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
                FROM events GROUP BY user_id),
    du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events)
    SELECT STRFTIME(du.day, '%Y-%m-%d') AS day,
           CAST(count_if(du.day = fs.first_day) AS BIGINT) AS new_users,
           CAST(count_if(du.day > fs.first_day) AS BIGINT) AS returning_users,
           ROUND(count_if(du.day = fs.first_day) * 1.0 / COUNT(*), 6)
             AS new_share
    FROM du JOIN fs USING (user_id) GROUP BY du.day
    """,
)
def events_new_vs_returning(spark, sf_dir):
    """NEW vs RETURNING daily split — the growth-accounting companion to
    events_dau_stickiness: each active (day, user) classifies as NEW
    (the user's first-ever active day) or RETURNING, giving the daily
    acquisition/retention mix every growth dashboard leads with. Scale:
    a user-keyed first-seen aggregate joined back to the distinct
    (day, user) activity frame — two keyed shuffles on frames already
    orders of magnitude below the event log; exact date equality, one
    double division per day row."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").cast("date").alias("day"), "user_id"
    )
    du = persist_tracked(ev.distinct())  # consumed by first-seen AND join
    fs = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    is_new = F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
    return (
        du.join(fs, "user_id")
        .groupBy("day")
        .agg(
            F.sum(is_new).alias("new_users"),
            F.sum(1 - is_new).alias("returning_users"),
            F.round(F.sum(is_new) * 1.0 / F.count("*"), 6).alias("new_share"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "new_users",
            "returning_users",
            "new_share",
        )
    )


# -- linear-interpolation gap fill (round 10, wave 8) --------------------------------


@query(
    "events_gapfill_linear",
    oracle="""
    WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                           COUNT(*) AS n
                    FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi
          FROM hourly GROUP BY 1),
    spine AS (SELECT event_type,
                     UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
              FROM b),
    j AS (SELECT s.event_type, s.hr, d.n
          FROM spine s LEFT JOIN hourly d USING (event_type, hr)),
    anch AS (
      SELECT *,
        LAST_VALUE(n IGNORE NULLS) OVER w_prev AS prev_n,
        LAST_VALUE(CASE WHEN n IS NOT NULL THEN hr END IGNORE NULLS)
          OVER w_prev AS prev_hr,
        FIRST_VALUE(n IGNORE NULLS) OVER w_next AS next_n,
        FIRST_VALUE(CASE WHEN n IS NOT NULL THEN hr END IGNORE NULLS)
          OVER w_next AS next_hr
      FROM j
      WINDOW w_prev AS (PARTITION BY event_type ORDER BY hr
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_next AS (PARTITION BY event_type ORDER BY hr
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, STRFTIME(hr, '%Y-%m-%d %H:%M:%S') AS hr,
           (n IS NULL) AS was_missing,
           ROUND(CASE WHEN n IS NOT NULL THEN n * 1.0
                      ELSE prev_n + (next_n - prev_n)
                           * (date_diff('hour', prev_hr, hr) * 1.0
                              / date_diff('hour', prev_hr, next_hr)) END, 6)
             AS n_filled
    FROM anch
    """,
)
def events_gapfill_linear(spark, sf_dir):
    """LINEAR-INTERPOLATION gap fill on the hourly series — the
    time-series repair that events_gapfill_locf (step-function
    carry-forward) can't do: each missing (type, hour) cell fills with
    the straight line between its nearest observed neighbors, the
    standard prep before seasonal decomposition or rate-of-change
    alerts. The spine is bounded by each type's own observed [min, max]
    hour so no leading/trailing NULL legs exist. Determinism: anchors
    are exact integer counts and hour timestamps; the interpolation is
    integer-hour ratios in one double expression both engines evaluate
    identically, rounded at 6. Scale: the corpus collapses to a
    (type × hour) frame; the two IGNORE-NULLS windows are TYPE-KEYED
    over calendar-bounded partitions — never a global sort."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hr")
    )
    hourly = persist_tracked(
        ev.groupBy("event_type", "hr").agg(F.count("*").alias("n"))
    )  # consumed by the bounds aggregate and the spine join
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hr"),
        )
    )
    j = spine.join(hourly, ["event_type", "hr"], "left")
    w_prev = W.partitionBy("event_type").orderBy("hr").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_next = W.partitionBy("event_type").orderBy("hr").rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    obs_hr = F.when(F.col("n").isNotNull(), F.col("hr"))
    anch = j.select(
        "event_type",
        "hr",
        "n",
        F.last("n", ignorenulls=True).over(w_prev).alias("prev_n"),
        F.last(obs_hr, ignorenulls=True).over(w_prev).alias("prev_hr"),
        F.first("n", ignorenulls=True).over(w_next).alias("next_n"),
        F.first(obs_hr, ignorenulls=True).over(w_next).alias("next_hr"),
    )
    hours = lambda a, b: (  # noqa: E731 — exact integer hour difference
        (F.unix_micros(b) - F.unix_micros(a)) / F.lit(3600000000)
    ).cast("long")
    interp = F.col("prev_n") + (F.col("next_n") - F.col("prev_n")) * (
        hours(F.col("prev_hr"), F.col("hr")) * 1.0
        / hours(F.col("prev_hr"), F.col("next_hr"))
    )
    return anch.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hr"),
        F.col("n").isNull().alias("was_missing"),
        F.round(
            F.when(F.col("n").isNotNull(), F.col("n") * 1.0).otherwise(interp),
            6,
        ).alias("n_filled"),
    )


# -- CUSUM changepoint detection (round 10, wave 9) ----------------------------------


@query(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
                   FROM events GROUP BY 1, 2),
    st AS (SELECT event_type,
                  (SUM(n) * 1000000) // COUNT(*) AS mean_micro
           FROM daily GROUP BY 1),
    dev AS (SELECT d.event_type, d.day, d.n,
                   d.n * 1000000 - s.mean_micro - s.mean_micro // 10 AS dmicro,
                   s.mean_micro
            FROM daily d JOIN st s USING (event_type)),
    pfx AS (SELECT *, SUM(dmicro) OVER w AS p
            FROM dev
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    pfx2 AS (SELECT *, MIN(p) OVER w AS runmin
             FROM pfx
             WINDOW w AS (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_type, STRFTIME(day, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n,
           ROUND((p - LEAST(runmin, 0)) / 1000000.0, 6) AS cusum,
           (p - LEAST(runmin, 0) > mean_micro) AS is_changepoint
    FROM pfx2
    """,
)
def events_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint detection on daily volumes — the sequential
    upward-shift detector (Page 1954) that accumulates excess over
    baseline+slack and alarms when the sum escapes, catching SUSTAINED
    level shifts the per-day z-score/MAD detectors treat as noise. The
    textbook recursion S_t = max(0, S_{t-1} + d_t) is not window-
    expressible, but its closed form IS: S_t = P_t − min(0, min_{j≤t}
    P_j) over the deviation prefix sums — two type-keyed cumulative
    windows. Determinism: baseline and slack (10% of mean) are INTEGER
    micro-units via integer division, so every prefix sum is exact
    integer arithmetic; one double division renders the output. Scale:
    corpus → (type × day) keyed aggregate; windows partition by type
    over calendar-bounded frames."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
    )
    daily = persist_tracked(
        ev.groupBy("event_type", "day").agg(F.count("*").alias("n"))
    )  # consumed by the baseline aggregate and the deviation join
    st = daily.groupBy("event_type").agg(
        F.expr("(sum(n) * 1000000) div count(*)").alias("mean_micro")
    )
    dev = daily.join(st, "event_type").withColumn(
        "dmicro",
        F.expr("n * 1000000 - mean_micro - mean_micro div 10"),
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    pfx = dev.withColumn("p", F.sum("dmicro").over(w))
    pfx2 = pfx.withColumn("runmin", F.min("p").over(w))
    s = F.col("p") - F.least(F.col("runmin"), F.lit(0))
    return pfx2.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.round(s / 1000000.0, 6).alias("cusum"),
        (s > F.col("mean_micro")).alias("is_changepoint"),
    )


# -- session basket affinity (round 10, wave 10) -------------------------------------


@query(
    "events_basket_affinity",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_type,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (SELECT user_id, event_type,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS session_no
          FROM marked),
    st AS (SELECT DISTINCT user_id, session_no, event_type FROM s),
    tot AS (SELECT COUNT(DISTINCT (user_id, session_no)) AS n_sessions FROM st),
    ind AS (SELECT event_type, COUNT(*) AS n FROM st GROUP BY 1),
    pair AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_ab
      FROM st a JOIN st b ON a.user_id = b.user_id
                         AND a.session_no = b.session_no
                         AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, CAST(n_ab AS BIGINT) AS n_ab,
           ROUND(n_ab * 1.0 * t.n_sessions / (ia.n * ib.n), 6) AS lift
    FROM pair JOIN ind ia ON ia.event_type = type_a
              JOIN ind ib ON ib.event_type = type_b
              CROSS JOIN tot t
    """,
)
def events_basket_affinity(spark, sf_dir):
    """MARKET-BASKET affinity between event types: within each 30-minute
    session (the batch_sessionize assignment), which type PAIRS co-occur
    more than independence predicts — lift = P(a,b)/(P(a)·P(b)) over
    sessions. The co-occurrence complement to events_transition_matrix
    (which is strictly sequential): lift > 1 flags bundled behaviors
    regardless of order. Scale: sessions collapse to a DISTINCT
    (user, session, type) frame; the pair join is keyed on the session
    id and the pair space is |types|² (catalog-sized), with one-row
    session totals broadcast. Exact integer counts; one double division
    per pair."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = W.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    marked = e.select(
        "user_id",
        "ts",
        "event_type",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    cum = W.partitionBy("user_id").orderBy("ts").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    st = persist_tracked(
        marked.withColumn("session_no", F.sum("new_session").over(cum))
        .select("user_id", "session_no", "event_type")
        .distinct()
    )  # consumed by totals, per-type counts, and both pair-join sides
    tot = st.agg(
        F.count_distinct("user_id", "session_no").alias("n_sessions")
    )
    ind = st.groupBy("event_type").agg(F.count("*").alias("n"))
    a = st.select("user_id", "session_no", F.col("event_type").alias("type_a"))
    b = st.select(
        F.col("user_id").alias("u_b"),
        F.col("session_no").alias("s_b"),
        F.col("event_type").alias("type_b"),
    )
    pair = (
        a.join(
            b,
            (F.col("user_id") == F.col("u_b"))
            & (F.col("session_no") == F.col("s_b"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_ab"))
    )
    ia = ind.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    ib = ind.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        pair.join(ia, "type_a")
        .join(ib, "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(
                F.col("n_ab") * 1.0 * F.col("n_sessions")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


# -- daily-count autocorrelation (round 10, wave 10) ---------------------------------


@query(
    "events_lag_autocorr",
    oracle="""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
                   FROM events GROUP BY 1, 2),
    lagd AS (SELECT UNNEST([1, 2, 7]) AS lag),
    pairs AS (
      SELECT t.event_type, l.lag, t.n AS x, j.n AS y
      FROM daily t JOIN lagd l ON TRUE
           JOIN daily j ON j.event_type = t.event_type
                       AND j.day = t.day - CAST(l.lag AS INTEGER)
    ),
    m AS (SELECT event_type, lag, COUNT(*) AS k,
                 SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
                 SUM(x*x) AS sxx, SUM(y*y) AS syy
          FROM pairs GROUP BY 1, 2)
    SELECT event_type, CAST(lag AS INTEGER) AS lag,
           CAST(k AS BIGINT) AS n_pairs,
           ROUND((k*sxy - sx*sy)
                 / NULLIF(SQRT(CAST((k*sxx - sx*sx) AS DOUBLE))
                          * SQRT(CAST((k*syy - sy*sy) AS DOUBLE)), 0), 6)
             AS autocorr
    FROM m
    """,
)
def events_lag_autocorr(spark, sf_dir):
    """AUTOCORRELATION of daily volumes at lags 1, 2, and 7 — the
    seasonality fingerprint (a weekly-rhythmed metric shows an
    autocorrelation spike at lag 7) read before trusting any
    day-over-day alert threshold. Pearson r from the five exact INTEGER
    power sums per (type, lag) — the agg_higher_moments discipline: the
    float expression runs ONCE per 15-row output group on identical
    operands, so cross-engine hashes can't drift on summation order.
    Scale: corpus → (type × day) keyed aggregate; the lag join is a
    self-equi-join of that calendar-bounded frame on (type, day−lag)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
    )
    daily = persist_tracked(
        ev.groupBy("event_type", "day").agg(F.count("*").alias("n"))
    )  # consumed by both sides of the lag join
    lagd = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(7))).alias("lag")
    )
    t = daily.crossJoin(F.broadcast(lagd)).select(
        "event_type", "lag", F.col("n").alias("x"), "day"
    )
    j = daily.select(
        F.col("event_type").alias("et_j"),
        F.col("day").alias("day_j"),
        F.col("n").alias("y"),
    )
    pairs = t.join(
        j,
        (F.col("event_type") == F.col("et_j"))
        & (F.col("day_j") == F.expr("date_sub(day, lag)")),
    )
    m = pairs.groupBy("event_type", "lag").agg(
        F.count("*").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("k") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("k").cast("long").alias("n_pairs"),
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("autocorr"),
    )


# -- attribution window sweep (round 10, wave 11) ------------------------------------


@query(
    "events_attribution_window_sweep",
    oracle="""
    WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS pus FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, epoch_us(ts) AS cus FROM events
          WHERE event_type = 'click'),
    ws AS (SELECT UNNEST([1, 3, 7]) AS w),
    attr AS (
      SELECT ws.w, p.event_id,
             MAX(CASE WHEN c.cus IS NOT NULL THEN 1 ELSE 0 END) AS hit
      FROM p CROSS JOIN ws
      LEFT JOIN c ON c.user_id = p.user_id
                 AND c.cus <= p.pus
                 AND c.cus >= p.pus - ws.w * 86400000000
      GROUP BY 1, 2
    )
    SELECT CAST(w AS INTEGER) AS window_days,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(hit) AS BIGINT) AS n_attributed,
           ROUND(SUM(hit) * 1.0 / COUNT(*), 6) AS attribution_rate
    FROM attr GROUP BY w
    """,
)
def events_attribution_window_sweep(spark, sf_dir):
    """ATTRIBUTION-WINDOW sensitivity sweep: what share of purchases
    have a preceding click within 1, 3, and 7 days — the measurement
    that PICKS the window the attribution family (touch/linear/decay)
    then takes as given, and the first thing an analyst disputes when
    two dashboards disagree. Purchases are keyed by event_id (round-11
    ADVICE fix: grouping by (user, ts) collapsed same-timestamp
    purchases by one user, silently undercounting n_purchases). Scale:
    purchases × 3 literal windows left-join clicks on the USER key with
    the time bound as a pushed residual (the asof_join_tolerance shape
    — the conjunct prunes, never expands); exact integer epoch-micros
    bounds; one double division per output row."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("us").alias("pus")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u_c"), F.col("us").alias("cus")
    )
    ws = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(3), F.lit(7))).alias("w")
    )
    attr = (
        p.crossJoin(F.broadcast(ws))
        .join(
            c,
            (F.col("user_id") == F.col("u_c"))
            & (F.col("cus") <= F.col("pus"))
            & (
                F.col("cus")
                >= F.col("pus") - F.col("w") * F.lit(86400000000)
            ),
            "left",
        )
        .groupBy("w", "event_id")
        .agg(
            F.max(
                F.when(F.col("cus").isNotNull(), 1).otherwise(0)
            ).alias("hit")
        )
    )
    return attr.groupBy("w").agg(
        F.count("*").alias("n_purchases"),
        F.sum("hit").alias("n_attributed"),
        F.round(F.sum("hit") * 1.0 / F.count("*"), 6).alias(
            "attribution_rate"
        ),
    ).select(
        F.col("w").cast("int").alias("window_days"),
        "n_purchases",
        "n_attributed",
        "attribution_rate",
    )


# -- chi-square independence: type x day-of-week (round 10, wave 12) -----------------


@query(
    "events_chisq_type_dow",
    oracle="""
    WITH cells AS (
      SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow, COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    rc AS (SELECT event_type, SUM(o) AS r FROM cells GROUP BY 1),
    cc AS (SELECT dow, SUM(o) AS c FROM cells GROUP BY 1),
    tt AS (SELECT SUM(o) AS t FROM cells),
    terms AS (
      SELECT cells.event_type, cells.dow,
             CAST(FLOOR((cells.o * t.t - rc.r * cc.c)
                        * (cells.o * t.t - rc.r * cc.c) * 1000000.0
                        / (t.t * rc.r * cc.c)) AS BIGINT) AS term_micro
      FROM cells JOIN rc USING (event_type) JOIN cc USING (dow)
                 CROSS JOIN tt t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT dow) - 1) AS BIGINT) AS dof,
           ROUND(SUM(term_micro) / 1000000.0, 6) AS chi2
    FROM terms
    """,
)
def events_chisq_type_dow(spark, sf_dir):
    """CHI-SQUARE independence test on the (event type × day-of-week)
    contingency table — "does traffic mix depend on the weekday?", the
    2-D generalization of events_ab_srm_check's 1-D goodness-of-fit.
    Each cell's term uses the algebraic identity (o−e)²/e =
    (oT − rc)²/(T·r·c), so it's ONE double expression on exact integer
    marginals, FLOOR-quantized to micro-units — the distributed sum is
    integer-exact, immune to float ordering. The dow offset pins the
    scalar_date_parts_funcs convention (Spark dayofweek is 1=Sunday;
    DuckDB 0=Sunday). Scale: corpus → 35-cell keyed aggregate; marginals
    are keyed re-aggregations of the cells, one-row total broadcast.

    Overflow posture (round-11 ADVICE fix): the products run in
    DECIMAL(38,0), exact wherever DuckDB's HUGEINT is, so Spark's
    non-ANSI int64 wraparound can never silently corrupt chi2; past the
    decimal-38 envelope (|oT−rc| > 9.2e18, a ~1e9-count residual) the
    term RAISES instead of drifting. Within the envelope the
    decimal→double conversions are round-to-nearest of the same exact
    integers both engines hold, so parity is bit-stable."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.dayofweek(F.col("ts").cast("timestamp").cast("date")) - 1).alias(
            "dow"
        ),
    )
    cells = persist_tracked(
        ev.groupBy("event_type", "dow").agg(F.count("*").alias("o"))
    )  # consumed by both marginals, the total, and the term join
    rc = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cc = cells.groupBy("dow").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("t"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    x = dec("o") * dec("t") - dec("r") * dec("c")
    trc = dec("t") * dec("r") * dec("c")
    # |x| <= 9.2e18 keeps x*x inside decimal(38,0) exactly; the
    # denominator t*r*c can ALSO exceed decimal(38,0) (it NULLs under
    # the session's non-ANSI config), so both legs gate the raise —
    # beyond either envelope, fail LOUDLY (the old int64 path wrapped
    # silently there; round-12 ADVICE closed the denominator leg)
    x_ok = (
        F.abs(x) <= F.lit(9200000000000000000).cast("decimal(38,0)")
    ) & trc.isNotNull()
    term = F.floor(
        (x * x).cast("double") * F.lit(1000000.0) / trc.cast("double")
    ).cast("long")
    terms = (
        cells.join(rc, "event_type")
        .join(cc, "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            F.when(x_ok, term)
            .otherwise(
                F.raise_error(
                    F.lit(
                        "events_chisq_type_dow: |oT-rc| exceeds the "
                        "decimal(38,0)-exact envelope; re-derive the term "
                        "before trusting chi2 at this scale"
                    )
                ).cast("long")
            )
            .alias("term_micro"),
        )
    )
    return terms.agg(
        F.count("*").alias("n_cells"),
        (
            (F.count_distinct("event_type") - 1)
            * (F.count_distinct("dow") - 1)
        ).alias("dof"),
        F.round(F.sum("term_micro") / 1000000.0, 6).alias("chi2"),
    )


# -- hourly value bands (round 10, wave 12) ------------------------------------------


@query(
    "events_value_bands_by_hour",
    oracle="""
    WITH h AS (SELECT event_type, hour(ts) AS hod, value FROM events)
    SELECT event_type, CAST(hod AS INTEGER) AS hod,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(quantile_cont(value, 0.1) AS DOUBLE) AS p10,
           CAST(quantile_cont(value, 0.5) AS DOUBLE) AS p50,
           CAST(quantile_cont(value, 0.9) AS DOUBLE) AS p90
    FROM h GROUP BY 1, 2
    """,
)
def events_value_bands_by_hour(spark, sf_dir):
    """HOUR-OF-DAY percentile bands of event values — the envelope an
    anomaly monitor draws before alerting on a single reading: per
    (type, hour-of-day), exact interpolated p10/p50/p90 of the value
    distribution. Complements events_seasonal_anomaly (which bands
    COUNTS, not values). Exact percentiles under the
    agg_median_percentile contract (identical raw doubles, identical
    interpolation); percentile_approx replaces them at 100 TB. Scale:
    one (type × 24-hour) keyed aggregate with map-side partials —
    bounded output, no windows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).cast("int").alias("hod"),
        "value",
    )
    return ev.groupBy("event_type", "hod").agg(
        F.count("*").alias("n"),
        F.percentile("value", F.lit(0.1)).alias("p10"),
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
    )


# -- Hill power-law tail estimator (round 10, wave 13) -------------------------------


@query(
    "events_power_law_hill",
    oracle="""
    WITH u AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rn FROM u),
    head AS (SELECT rn, n FROM r WHERE rn <= 11),
    xk AS (SELECT n AS xk FROM head WHERE rn = 11),
    terms AS (
      SELECT CAST(FLOOR(LN(h.n * 1.0 / x.xk) * 1000000) AS BIGINT) AS lnq
      FROM head h CROSS JOIN xk x WHERE h.rn <= 10
    )
    SELECT CAST(10 AS INTEGER) AS k,
           (SELECT CAST(xk AS BIGINT) FROM xk) AS x_tail,
           ROUND(10.0 * 1000000 / NULLIF(SUM(lnq), 0), 6) AS hill_alpha
    FROM terms
    """,
)
def events_power_law_hill(spark, sf_dir):
    """HILL ESTIMATOR of the power-law tail index on user activity —
    α = k / Σᵢ ln(xᵢ/x₍ₖ₊₁₎) over the k=10 most active users: the
    quantitative companion to events_pareto_share (Pareto SHOWS the
    skew; Hill MEASURES its exponent, which decides whether per-key
    salting is a nicety or a necessity — α ≤ 2 means unbounded
    variance). Scale: the user frame reduces via TakeOrderedAndProject
    to an 11-row head (per-partition heaps, the text_zipf_rank
    pattern); ranking, the tail anchor, and the micro-nat-quantized ln
    terms all live on that head. Exact integer counts in, one double
    division out."""
    from pyspark.sql import Window as W

    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    head = persist_tracked(
        u.orderBy(F.desc("n"), F.asc("user_id"))
        .limit(11)
        .withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.desc("n"), F.asc("user_id"))),
        )
    )  # 11 rows: consumed by the tail anchor and the ln terms
    xk_row = head.filter(F.col("rn") == 11).select(
        F.col("n").alias("xk")
    )
    terms = (
        head.filter(F.col("rn") <= 10)
        .crossJoin(F.broadcast(xk_row))
        .select(
            F.floor(F.log(F.col("n") * 1.0 / F.col("xk")) * 1000000)
            .cast("long")
            .alias("lnq"),
            "xk",
        )
    )
    return terms.agg(
        F.lit(10).cast("int").alias("k"),
        F.max("xk").cast("long").alias("x_tail"),
        F.round(
            F.lit(10.0) * 1000000 / F.nullif(F.sum("lnq"), F.lit(0)), 6
        ).alias("hill_alpha"),
    )

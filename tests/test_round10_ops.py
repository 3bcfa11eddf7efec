"""Semantic invariants for the round-10 operators — properties the
oracle hash can't state directly (shares summing to 1, decile balance,
monotone boundaries), pinned as unit tests."""

from __future__ import annotations

import math

from hiveberg_spark import registry

registry.load_all()


def test_upsampling_shares_and_budgets_consistent(spark, sf_dir):
    rows = registry.QUERIES["pipeline_quality_upsampling"](
        spark, sf_dir
    ).collect()
    assert {r.tier for r in rows} == {1, 2, 3}
    assert {r.tier: r.epochs for r in rows} == {1: 1, 2: 2, 3: 4}
    for r in rows:
        assert r.effective_tokens == r.epochs * r.raw_tokens
    assert abs(sum(r.effective_share for r in rows) - 1.0) < 1e-5
    # terciles: doc counts within 1 of each other by the value-crossing
    # rule is NOT guaranteed (ties share a side), but no tier is empty
    assert all(r.n_docs > 0 for r in rows)


def test_nucleus_topmass_boundary_is_exact(spark, sf_dir):
    rows = registry.QUERIES["sample_nucleus_topmass"](spark, sf_dir).collect()
    ordered = sorted(rows, key=lambda r: (-r.score_micro, r.doc_id))
    total = sum(r.score_micro for r in ordered)
    budget = math.floor(0.5 * total)
    cum, expect_kept = 0, set()
    for r in ordered:
        cum += r.score_micro
        if cum <= budget:
            expect_kept.add(r.doc_id)
    got_kept = {r.doc_id for r in rows if r.kept}
    assert got_kept == expect_kept
    # kept is a PREFIX of the quality order: once cum passes the budget
    # nothing later is kept
    seen_drop = False
    for r in ordered:
        if r.doc_id not in got_kept:
            seen_drop = True
        else:
            assert not seen_drop, "kept doc after the cutoff"


def test_uplift_deciles_cover_all_users_evenly(spark, sf_dir):
    rows = registry.QUERIES["events_uplift_deciles"](spark, sf_dir).collect()
    deciles = sorted(r.decile for r in rows)
    assert deciles == list(range(1, 11))
    sizes = {r.decile: r.n_a + r.n_b for r in rows}
    # ceil(rn*10/n) deciles differ in size by at most 1
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_oov_rate_bounds_and_vocab_effect(spark, sf_dir):
    rows = registry.QUERIES["text_oov_rate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.oov_rate <= 1.0
        assert r.oov_tokens <= r.n_tokens


def test_topk_coverage_monotone_in_k(spark, sf_dir):
    rows = {
        r.k: r
        for r in registry.QUERIES["text_topk_coverage"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {10, 100, 1000}
    assert (
        rows[10].coverage <= rows[100].coverage <= rows[1000].coverage
    )
    assert rows[1000].covered_tokens <= rows[1000].total_tokens


def test_kl_drift_nonnegative(spark, sf_dir):
    # KL divergence is >= 0 up to the nano-nat quantization error
    rows = registry.QUERIES["text_source_kl_drift"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.kl_nats >= -1e-6, r


def test_cluster_best_quality_keeps_exactly_one_per_cluster(spark, sf_dir):
    rows = registry.QUERIES["dedup_cluster_best_quality"](
        spark, sf_dir
    ).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_rep, []).append(r)
    for rep, members in by_cluster.items():
        assert sum(1 for m in members if m.is_kept) == 1, rep


def test_asof_nearest_gap_is_minimal_and_tie_prefers_earlier(spark, sf_dir):
    rows = registry.QUERIES["asof_join_nearest"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.nearest_event_us is not None:
            assert r.gap_us is not None and r.gap_us >= 0


def test_ewma_tracks_counts_within_range(spark, sf_dir):
    rows = registry.QUERIES["events_ewma_daily"](spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        lo, hi = min(r.n for r in rs), max(r.n for r in rs)
        for r in rs:
            # a convex-weight average can never leave the observed range
            assert lo - 1e-6 <= r.ewma <= hi + 1e-6, (t, r)


# -- wave-5 invariants ----------------------------------------------------------------


def test_rfm_scores_partition_users_evenly(spark, sf_dir):
    rows = registry.QUERIES["events_rfm_segmentation"](spark, sf_dir).collect()
    n = sum(r.n_users for r in rows)
    assert n > 0
    for axis in ("r_score", "f_score", "m_score"):
        sizes = {}
        for r in rows:
            k = getattr(r, axis)
            assert 1 <= k <= 5
            sizes[k] = sizes.get(k, 0) + r.n_users
        # ceil(rank*5/n) quintiles differ in size by at most 1
        assert max(sizes.values()) - min(sizes.values()) <= 1
        assert sum(sizes.values()) == n


def test_km_survival_is_monotone_nonincreasing(spark, sf_dir):
    rows = sorted(
        registry.QUERIES["events_survival_km"](spark, sf_dir).collect(),
        key=lambda r: r.lifetime_days,
    )
    assert rows, "fixture must contain observed churn episodes"
    prev_s, prev_risk = 1.0, None
    for r in rows:
        assert 0.0 <= r.survival <= prev_s + 1e-9
        assert r.n_deaths >= 1
        assert r.n_deaths <= r.n_risk
        if prev_risk is not None:
            assert r.n_risk < prev_risk  # at-risk set strictly shrinks
        prev_s, prev_risk = r.survival, r.n_risk


def test_stickiness_bounds_and_wau_geq_dau(spark, sf_dir):
    rows = registry.QUERIES["events_dau_stickiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.wau7
        assert 0 < r.stickiness <= 1.0


def test_interval_overlap_matches_naive_theta_join(spark, sf_dir):
    """The bucketed join must equal the naive theta-join it replaces."""
    from pyspark.sql import functions as F

    from hiveberg_spark.catalog import load_table

    got = {
        r.o_custkey: (r.n_pairs, r.max_overlap_days)
        for r in registry.QUERIES["join_interval_overlap"](
            spark, sf_dir
        ).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_shipdate").cast("timestamp").cast("date").alias("sd"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    iv = (
        li.groupBy("l_orderkey")
        .agg(F.min("sd").alias("s"), F.max("sd").alias("e"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", F.col("l_orderkey").alias("okey"), "s", "e")
        .collect()
    )
    by_cust = {}
    for r in iv:
        by_cust.setdefault(r.o_custkey, []).append(r)
    want = {}
    for ck, ivs in by_cust.items():
        pairs = [
            (a, b)
            for i, a in enumerate(ivs)
            for b in ivs[i + 1 :]
            if a.s <= b.e and b.s <= a.e
        ]
        if pairs:
            want[ck] = (
                len(pairs),
                max(
                    (min(a.e, b.e) - max(a.s, b.s)).days + 1
                    for a, b in pairs
                ),
            )
    assert got == want


def test_token_sort_key_groups_are_permutation_closed(spark, sf_dir):
    from pyspark.sql import functions as F

    from hiveberg_spark.catalog import load_table

    rows = registry.QUERIES["dedup_token_sort_key"](spark, sf_dir).collect()
    assert rows, "fixture contains token-set collisions"
    assert sum(r.n_docs for r in rows) >= 2 * len(rows)
    # ground-truth the key: every member of the largest group must have
    # the SAME sorted distinct token set (recomputed in plain Python)
    big = max(rows, key=lambda r: r.n_docs)
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.withColumn(
        "k",
        F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(F.split("text", " "))), " "
            )
        ),
    )
    members = keyed.filter(F.col("k") == big.key_hash).collect()
    assert len(members) == big.n_docs
    assert min(m.doc_id for m in members) == big.survivor_id
    sets = {tuple(sorted(set(m.text.split(" ")))) for m in members}
    assert len(sets) == 1


def test_lateral_topn_matches_window_rank(spark, sf_dir):
    from pyspark.sql import Window as W, functions as F

    from hiveberg_spark.catalog import load_table

    got = {
        (r.c_mktsegment, r.c_custkey)
        for r in registry.QUERIES["subquery_lateral_topn"](
            spark, sf_dir
        ).collect()
    }
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    want = {
        (r.c_mktsegment, r.c_custkey)
        for r in c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .collect()
    }
    assert got == want


def test_hubness_histogram_accounts_for_every_vector_and_edge(spark, sf_dir):
    from hiveberg_spark.catalog import load_table
    from hiveberg_spark.operators.simsearch import knn_graph_blocked_edges

    rows = registry.QUERIES["embedding_hubness_audit"](spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_nodes for r in rows) == n_vecs
    n_edges = knn_graph_blocked_edges(spark, sf_dir).count()
    assert sum(r.in_degree * r.n_nodes for r in rows) == n_edges


def test_inter_arrival_gaps_positive_and_p90_geq_median(spark, sf_dir):
    rows = registry.QUERIES["events_inter_arrival_stats"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r.n_gaps > 0
        assert 0 <= r.med_gap_us <= r.p90_gap_us


# -- wave-6 invariants ----------------------------------------------------------------


def test_pareto_share_monotone_to_one(spark, sf_dir):
    rows = sorted(
        registry.QUERIES["events_pareto_share"](spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == sorted({r.decile for r in rows})
    assert rows[0].decile >= 1 and rows[-1].decile <= 10
    prev = 0.0
    for r in rows:
        assert r.cum_share >= prev - 1e-9
        prev = r.cum_share
    assert abs(rows[-1].cum_share - 1.0) < 1e-6
    sizes = [r.n_users for r in rows]
    assert max(sizes) - min(sizes) <= 1


def test_mad_anomaly_flag_consistent_with_z(spark, sf_dir):
    rows = registry.QUERIES["events_anomaly_mad"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.robust_z is not None:
            assert r.is_anomaly == (abs(r.robust_z) > 3.0) or (
                abs(abs(r.robust_z) - 3.0) < 1e-6
            )


def test_boolean_funcs_match_case_recomputation(spark, sf_dir):
    from pyspark.sql import functions as F

    from hiveberg_spark.catalog import load_table

    got = {
        r.l_returnflag: (r.n_disc, r.all_pos_qty, r.any_high_tax)
        for r in registry.QUERIES["agg_boolean_funcs"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    want = {
        r.l_returnflag: (r.nd, r.ap, r.ah)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("nd"),
            (F.min(F.when(F.col("l_quantity") > 0, 1).otherwise(0)) == 1).alias("ap"),
            (F.max(F.when(F.col("l_tax") > 0.07, 1).otherwise(0)) == 1).alias("ah"),
        )
        .collect()
    }
    assert got == want


def test_bigram_entropy_bounded_by_vocab(spark, sf_dir):
    import math

    from pyspark.sql import functions as F

    from hiveberg_spark.catalog import load_table

    rows = registry.QUERIES["text_bigram_entropy_rate"](spark, sf_dir).collect()
    assert rows
    vocab = {
        r.source: r.v
        for r in load_table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source")
        .agg(F.count_distinct("w").alias("v"))
        .collect()
    }
    for r in rows:
        assert 0.0 <= r.cond_entropy_nats <= math.log(vocab[r.source]) + 1e-6
        assert r.n_bigrams > 0


def test_dim_stats_cover_all_dims_consistently(spark, sf_dir):
    from hiveberg_spark.catalog import load_table

    rows = sorted(
        registry.QUERIES["embedding_dim_stats_audit"](spark, sf_dir).collect(),
        key=lambda r: r.dim,
    )
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert [r.dim for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.n == n_vecs
        assert r.min_val <= r.mean_val <= r.max_val
        assert r.dead_dim == (r.min_val == r.max_val)
        assert r.std_val >= 0


# -- wave-7 invariants ----------------------------------------------------------------


def test_good_turing_mass_bounds(spark, sf_dir):
    rows = registry.QUERIES["text_good_turing_mass"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.unseen_mass <= 1.0
        assert r.n_singletons <= r.n_types <= r.n_bigrams


def test_hashing_collisions_consistent(spark, sf_dir):
    r = registry.QUERIES["text_hashing_trick_collisions"](
        spark, sf_dir
    ).collect()[0]
    assert r.n_buckets_used <= min(4096, r.n_features)
    assert r.max_bucket_load >= -(-r.n_features // 4096)  # >= ceil(avg)
    assert abs(r.collision_rate - (1 - r.n_buckets_used / r.n_features)) < 1e-6


def test_shingle_sensitivity_matches_python_ground_truth(spark, sf_dir):
    from hiveberg_spark.catalog import load_table

    got = {
        r.k: (r.n_shingles, r.n_hot, r.candidate_pairs)
        for r in registry.QUERIES["pipeline_shingle_sensitivity"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == {3, 5, 8}
    texts = [
        r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
    ]
    for k in (3, 5, 8):
        df: dict[str, int] = {}
        for t in texts:
            w = t.split(" ")
            for g in {
                " ".join(w[i : i + k]) for i in range(len(w) - k + 1)
            }:
                df[g] = df.get(g, 0) + 1
        n_hot = sum(1 for v in df.values() if v > 50)
        pairs = sum(v * (v - 1) // 2 for v in df.values() if v <= 50)
        assert got[k] == (len(df), n_hot, pairs)


def test_triangle_count_matches_python_ground_truth(spark, sf_dir):
    from hiveberg_spark.operators.simsearch import knn_graph_blocked_edges

    r = registry.QUERIES["graph_triangle_count"](spark, sf_dir).collect()[0]
    edges = {
        (e.vid, e.nb) for e in knn_graph_blocked_edges(spark, sf_dir).collect()
    }
    und = {(a, b) for (a, b) in edges if (b, a) in edges and a < b}
    assert r.n_edges == len(und)
    adj: dict[int, set] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    assert r.n_wedges == wedges
    tri = 0
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:
                tri += 1
    assert r.n_triangles == tri
    if wedges:
        assert abs(r.global_clustering - 3 * tri / wedges) < 1e-5


# -- wave-8 invariants ----------------------------------------------------------------


def test_new_vs_returning_accounting(spark, sf_dir):
    rows = sorted(
        registry.QUERIES["events_new_vs_returning"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert rows
    # day 1: everyone is new; total new users across days = user count
    assert rows[0].returning_users == 0 and rows[0].new_share == 1.0
    from hiveberg_spark.catalog import load_table

    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.new_users for r in rows) == n_users
    for r in rows:
        assert 0.0 <= r.new_share <= 1.0


def test_gapfill_linear_between_anchors(spark, sf_dir):
    rows = registry.QUERIES["events_gapfill_linear"](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert any(r.was_missing for r in rows), "fixture must contain gaps"
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.hr)
        # spine edges are observed (bounded by min/max observed hour)
        assert not rs[0].was_missing and not rs[-1].was_missing
        obs = [r.n_filled for r in rs if not r.was_missing]
        lo, hi = min(obs), max(obs)
        for i, r in enumerate(rs):
            if r.was_missing:
                # interpolation stays within the neighboring anchors
                prev_obs = next(
                    x.n_filled for x in reversed(rs[:i]) if not x.was_missing
                )
                next_obs = next(
                    x.n_filled for x in rs[i + 1 :] if not x.was_missing
                )
                assert (
                    min(prev_obs, next_obs) - 1e-6
                    <= r.n_filled
                    <= max(prev_obs, next_obs) + 1e-6
                )


# -- wave-9 invariants ----------------------------------------------------------------


def test_cusum_matches_textbook_recursion(spark, sf_dir):
    """The prefix-sum closed form must equal S_t = max(0, S_{t-1}+d_t)."""
    rows = registry.QUERIES["events_cusum_changepoint"](
        spark, sf_dir
    ).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.day)
        counts = [r.n for r in rs]
        total, days = sum(counts), len(counts)
        mean_micro = (total * 1000000) // days
        slack = mean_micro // 10
        s = 0
        for r, n in zip(rs, counts):
            s = max(0, s + n * 1000000 - mean_micro - slack)
            assert abs(r.cusum - s / 1e6) < 1e-5, (t, r.day)
            assert r.is_changepoint == (s > mean_micro)


def test_session_duration_stats_consistent(spark, sf_dir):
    r = registry.QUERIES["events_session_duration_stats"](
        spark, sf_dir
    ).collect()[0]
    assert r.n_sessions > 0
    assert 0 <= r.med_duration_us <= r.p90_duration_us
    assert r.avg_events >= 1.0
    # session count can never exceed event count, and must cover all users
    from hiveberg_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    assert r.n_sessions <= ev.count()
    assert r.n_sessions >= ev.select("user_id").distinct().count()


# -- wave-10 invariants ---------------------------------------------------------------


def test_basket_affinity_matches_python_sessions(spark, sf_dir):
    from hiveberg_spark.catalog import load_table

    got = {
        (r.type_a, r.type_b): (r.n_ab, r.lift)
        for r in registry.QUERIES["events_basket_affinity"](
            spark, sf_dir
        ).collect()
    }
    ev = sorted(
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) AS us",
                    "event_type")
        .collect(),
        key=lambda r: (r.user_id, r.us),
    )
    sessions: dict[tuple, set] = {}
    last_us, sno = {}, {}
    for r in ev:
        u = r.user_id
        if u not in last_us or r.us - last_us[u] > 1800 * 1_000_000:
            sno[u] = sno.get(u, 0) + 1
        last_us[u] = r.us
        sessions.setdefault((u, sno[u]), set()).add(r.event_type)
    n_sessions = len(sessions)
    ind: dict[str, int] = {}
    pair: dict[tuple, int] = {}
    for types in sessions.values():
        ts = sorted(types)
        for t in ts:
            ind[t] = ind.get(t, 0) + 1
        for i, a in enumerate(ts):
            for b in ts[i + 1 :]:
                pair[(a, b)] = pair.get((a, b), 0) + 1
    assert set(got) == set(pair)
    for k, n_ab in pair.items():
        assert got[k][0] == n_ab
        want_lift = round(n_ab * 1.0 * n_sessions / (ind[k[0]] * ind[k[1]]), 6)
        assert abs(got[k][1] - want_lift) < 1e-6


def test_autocorr_matches_python_pearson(spark, sf_dir):
    from hiveberg_spark.catalog import load_table

    got = {
        (r.event_type, r.lag): (r.n_pairs, r.autocorr)
        for r in registry.QUERIES["events_lag_autocorr"](
            spark, sf_dir
        ).collect()
    }
    daily: dict[str, dict] = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .selectExpr("event_type", "cast(cast(ts as timestamp) as date) AS day")
        .groupBy("event_type", "day")
        .count()
        .collect()
    ):
        daily.setdefault(r.event_type, {})[r.day] = r["count"]
    from datetime import timedelta

    for (t, lag), (n_pairs, r_got) in got.items():
        xs, ys = [], []
        for day, x in daily[t].items():
            prev = daily[t].get(day - timedelta(days=lag))
            if prev is not None:
                xs.append(x)
                ys.append(prev)
        assert n_pairs == len(xs)
        k = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
        den = ((k * sxx - sx * sx) ** 0.5) * ((k * syy - sy * sy) ** 0.5)
        if den:
            assert abs(r_got - (k * sxy - sx * sy) / den) < 1e-5
        assert r_got is None or -1.0 - 1e-9 <= r_got <= 1.0 + 1e-9


def test_source_jaccard_matches_python_sets(spark, sf_dir):
    from hiveberg_spark.catalog import load_table

    got = {
        (r.src_a, r.src_b): (r.n_common, r.jaccard)
        for r in registry.QUERIES["text_source_jaccard_matrix"](
            spark, sf_dir
        ).collect()
    }
    vocab: dict[str, set] = {}
    for r in load_table(spark, sf_dir, "documents").select(
        "source", "text"
    ).collect():
        w = r.text.split(" ")
        vocab.setdefault(r.source, set()).update(
            f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)
        )
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter:
                jac = round(inter / len(vocab[a] | vocab[b]), 6)
                assert got[(a, b)][0] == inter
                assert abs(got[(a, b)][1] - jac) < 1e-6


# -- wave-11 invariants ---------------------------------------------------------------


def test_pmi_support_floor_and_order(spark, sf_dir):
    rows = registry.QUERIES["text_collocation_pmi"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    micros = [(r.pmi_micro, r.bigram) for r in rows]
    assert micros == sorted(micros, key=lambda x: (-x[0], x[1]))
    for r in rows:
        assert r.n >= 5
        assert abs(r.pmi_nats - r.pmi_micro / 1e6) < 1e-9


def test_attribution_rate_monotone_in_window(spark, sf_dir):
    rows = {
        r.window_days: r
        for r in registry.QUERIES["events_attribution_window_sweep"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {1, 3, 7}
    n = {r.n_purchases for r in rows.values()}
    assert len(n) == 1  # same purchase population at every window
    assert (
        rows[1].n_attributed <= rows[3].n_attributed <= rows[7].n_attributed
    )
    for r in rows.values():
        assert 0.0 <= r.attribution_rate <= 1.0


def test_neyman_allocation_sums_to_budget(spark, sf_dir):
    rows = registry.QUERIES["sample_neyman_allocation"](
        spark, sf_dir
    ).collect()
    assert sum(r.n_alloc for r in rows) == 1000
    assert all(r.n_alloc >= 0 for r in rows)
    # allocation ordering follows the N_h * S_h weights (strictly
    # monotone up to the +-1 largest-remainder step)
    by_w = sorted(rows, key=lambda r: r.n_docs * r.s_chars)
    allocs = [r.n_alloc for r in by_w]
    for a, b in zip(allocs, allocs[1:]):
        assert b >= a - 1


# -- wave-12 invariants ---------------------------------------------------------------


def test_chisq_matches_python_recomputation(spark, sf_dir):
    import math

    from hiveberg_spark.catalog import load_table

    r = registry.QUERIES["events_chisq_type_dow"](spark, sf_dir).collect()[0]
    cells: dict[tuple, int] = {}
    for row in (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "dayofweek(cast(cast(ts as timestamp) as date)) - 1 AS dow",
        )
        .groupBy("event_type", "dow")
        .count()
        .collect()
    ):
        cells[(row.event_type, row.dow)] = row["count"]
    rows = {}
    cols = {}
    for (t, d), o in cells.items():
        rows[t] = rows.get(t, 0) + o
        cols[d] = cols.get(d, 0) + o
    total = sum(cells.values())
    chi2_micro = sum(
        math.floor(
            (o * total - rows[t] * cols[d]) ** 2
            * 1000000.0
            / (total * rows[t] * cols[d])
        )
        for (t, d), o in cells.items()
    )
    assert r.n_cells == len(cells)
    assert r.dof == (len(rows) - 1) * (len(cols) - 1)
    assert abs(r.chi2 - chi2_micro / 1e6) < 1e-6


def test_value_bands_ordered_and_complete(spark, sf_dir):
    rows = registry.QUERIES["events_value_bands_by_hour"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hod <= 23
        assert r.p10 <= r.p50 <= r.p90
        assert r.n >= 1


# -- wave-13 invariants ---------------------------------------------------------------


def test_hill_alpha_matches_python(spark, sf_dir):
    import math

    from hiveberg_spark.catalog import load_table

    r = registry.QUERIES["events_power_law_hill"](spark, sf_dir).collect()[0]
    counts = sorted(
        (
            row["count"]
            for row in load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .count()
            .collect()
        ),
        reverse=True,
    )
    xk = counts[10]
    s = sum(math.floor(math.log(c / xk) * 1000000) for c in counts[:10])
    assert r.k == 10 and r.x_tail == xk
    if s:
        assert abs(r.hill_alpha - 10.0 * 1000000 / s) < 1e-5
    assert r.hill_alpha is None or r.hill_alpha > 0


def test_cluster_histogram_accounts_for_corpus(spark, sf_dir):
    from hiveberg_spark.catalog import load_table

    rows = registry.QUERIES["dedup_cluster_size_histogram"](
        spark, sf_dir
    ).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters
    # consistency with dedup_token_sort_key: same groups above size 1
    dup_groups = registry.QUERIES["dedup_token_sort_key"](
        spark, sf_dir
    ).count()
    assert sum(r.n_clusters for r in rows if r.cluster_size >= 2) == dup_groups


# -- wave-14 invariants ---------------------------------------------------------------


def test_prefix_key_groups_share_prefix(spark, sf_dir):
    from pyspark.sql import functions as F

    from hiveberg_spark.catalog import load_table

    rows = registry.QUERIES["dedup_prefix_key"](spark, sf_dir).collect()
    assert rows, "fixture contains truncation-style prefix collisions"
    big = max(rows, key=lambda r: r.n_docs)
    docs = load_table(spark, sf_dir, "documents")
    members = docs.filter(
        F.md5(F.substring("text", 1, 256)) == big.prefix_hash
    ).collect()
    assert len(members) == big.n_docs
    assert min(m.doc_id for m in members) == big.survivor_id
    prefixes = {m.text[:256] for m in members}
    assert len(prefixes) == 1


# -- chained-stateful streaming invariant ----------------------------------------------


def test_hourly_unique_users_matches_batch_within_cutoff(spark, sf_dir):
    """Stream (dedup -> windowed count, append mode) must equal the
    batch distinct count for every window the final watermark closed."""
    from pyspark.sql import functions as F

    from hiveberg_spark.catalog import load_table

    got = {
        r.window_start: r.uniq_users
        for r in registry.QUERIES["stream_hourly_unique_users"](
            spark, sf_dir
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )
    mx = ev.agg(F.max("ts")).collect()[0][0]
    batch = {
        r.ws: r.u
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("ws")
        )
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    }
    from datetime import timedelta

    cutoff = mx - timedelta(minutes=10)
    expected = {
        ws: u
        for ws, u in batch.items()
        if __import__("datetime").datetime.strptime(ws, "%Y-%m-%d %H:%M:%S")
        + timedelta(hours=1)
        <= cutoff
    }
    assert got == expected
    assert got, "at least one closed window must emit"


# -- wave-15 invariant ------------------------------------------------------------------


def test_quality_tradeoff_frontier_monotone(spark, sf_dir):
    rows = {
        r.pct: r
        for r in registry.QUERIES["pipeline_quality_token_tradeoff"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {25, 50, 75, 100}
    # docs kept and tokens kept grow with the fraction; mean quality falls
    for lo, hi in [(25, 50), (50, 75), (75, 100)]:
        assert rows[lo].n_docs_kept <= rows[hi].n_docs_kept
        assert rows[lo].tokens_kept <= rows[hi].tokens_kept
        assert rows[lo].mean_score >= rows[hi].mean_score - 1e-9
    assert abs(rows[100].token_share - 1.0) < 1e-9
    from hiveberg_spark.catalog import load_table

    n = load_table(spark, sf_dir, "documents").count()
    assert rows[100].n_docs_kept == n
    assert rows[25].n_docs_kept == -(-n * 25 // 100)  # ceil


# -- wave-16 invariant ------------------------------------------------------------------


def _py_band_sweep_ground_truth(docs, sweep, n=3, threshold=0.8):
    """Pure-Python replica of the shingle → 64-perm minhash → banding →
    exact-verify pipeline (VERDICT r10 #3: pin the per-config hit counts
    against an independent ground truth, not just monotonicity). Uses
    the repo's spec-implemented XXH64 so the hash family matches Spark's
    xxhash64 exactly (seed 42, chained for multi-column band hashes)."""
    from hiveberg_spark.sources.xxh64 import (
        _to_signed,
        hash_bytes,
        xxhash64_chain,
    )

    M = (1 << 64) - 1

    def i64(x):
        x &= M
        return x - (1 << 64) if x >= (1 << 63) else x

    sh = {}
    for doc_id, text in docs:
        w = text.split(" ")
        sh[doc_id] = (
            {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}
            if len(w) >= n
            else set()
        )
    # truth: exact all-pairs jaccard >= threshold (round-6, the oracle's
    # semantics)
    ids = sorted(sh)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sh[a], sh[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union and round(inter / union, 6) >= threshold:
                truth.add((a, b))
    # signatures: affine 64-bit wraparound family over one xxhash64 base
    shingle_hash = {}
    for s in set().union(*sh.values()) if sh else set():
        shingle_hash[s] = _to_signed(hash_bytes(s.encode("utf-8"), 42))
    consts = [i64((p + 1) * -7046029254386353131) for p in range(64)]
    sig = {}
    for d, shingles in sh.items():
        if not shingles:
            continue  # no exploded rows -> no signature row in Spark
        hs = [shingle_hash[s] for s in shingles]
        sig[d] = [
            min(i64(h * (2 * p + 1) + consts[p]) for h in hs)
            for p in range(64)
        ]
    hits = {}
    for n_bands, n_rows in sweep:
        buckets = {}
        for d, s in sig.items():
            for b in range(n_bands):
                key = (
                    b,
                    xxhash64_chain(
                        [(s[b * n_rows + r], "bigint") for r in range(n_rows)]
                    ),
                )
                buckets.setdefault(key, []).append(d)
        cands = set()
        for members in buckets.values():
            members.sort()
            for i, a in enumerate(members):
                for b in members[i + 1 :]:
                    cands.add((a, b))
        # verified-hit count: candidates whose exact jaccard >= threshold
        # that are also truth pairs (== candidates ∩ truth by definition)
        hits[(n_bands, n_rows)] = len(cands & truth)
    return truth, hits


def test_band_sweep_contract_holds(spark, sf_dir):
    q = registry.QUERIES["dedup_minhash_band_sweep"]
    r = q(spark, sf_dir).collect()[0]
    assert r.monotone_ok and r.widest_exact
    # truth must equal the registered exact pair count
    exact = registry.QUERIES["dedup_ngram_jaccard"](spark, sf_dir).count()
    assert r.n_truth == exact
    assert r.hits_widest == r.n_truth  # the widest config is exact


def test_band_sweep_counts_match_python_ground_truth(spark, sf_dir):
    """VERDICT r10 #3: the per-config verified-hit counts (including the
    two narrow configs that can't appear in the driver row) must equal
    an independent pure-Python MinHash pipeline bit-for-bit."""
    from hiveberg_spark.catalog import load_table
    from hiveberg_spark.operators.dedup import (
        _BAND_SWEEP,
        dedup_minhash_band_sweep,
    )

    r = registry.QUERIES["dedup_minhash_band_sweep"](spark, sf_dir).collect()[0]
    spark_hits = dedup_minhash_band_sweep.last_hits
    docs = [
        (row.doc_id, row.text)
        for row in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    truth, py_hits = _py_band_sweep_ground_truth(docs, _BAND_SWEEP)
    assert len(truth) == r.n_truth
    assert spark_hits == py_hits, f"spark {spark_hits} != python {py_hits}"
    assert r.hits_widest == py_hits[_BAND_SWEEP[-1]]

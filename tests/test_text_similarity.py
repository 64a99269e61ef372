"""Oracle-parity tests for §2.10 text/dedup/similarity/multimodal/skyline."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.operators import similarity, text

from .parity import assert_parity

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("key", sorted(text.ORACLES) + sorted(similarity.ORACLES))
def test_parity(spark, key):
    assert_parity(spark, key)


def test_lsh_recall_vs_exact(spark):
    """sim_ann_lsh is approximate by design; recall@100 vs the exact top-100
    must still clear a floor (identical-signature buckets catch the densest
    near-duplicate pairs)."""
    exact = {
        (r.id1, r.id2)
        for r in similarity.QUERIES["sim_topk_cosine"](spark, SF).collect()
    }
    approx = {
        (r.id1, r.id2) for r in similarity.QUERIES["sim_ann_lsh"](spark, SF).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall collapsed: {recall}"


def test_near_dup_pairs_exist(spark):
    """The corpus is built to contain dense near-duplicates (SURVEY §1.2)."""
    n = text.QUERIES["dedup_near_jaccard"](spark, SF).count()
    assert n > 0


def test_skyline_is_pareto(spark):
    """Property: no skyline row dominates another skyline row."""
    rows = similarity.QUERIES["skyline_pareto"](spark, SF).collect()
    assert rows
    for a in rows:
        for b in rows:
            if a.o_orderkey == b.o_orderkey:
                continue
            dominates = (
                b.o_totalprice >= a.o_totalprice
                and b.o_orderdate <= a.o_orderdate
                and (b.o_totalprice > a.o_totalprice or b.o_orderdate < a.o_orderdate)
            )
            assert not dominates

"""Oracle-parity + semantic tests for the pattern-mining workloads."""

from __future__ import annotations

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


def test_item_neighbors_topk_shape(spark):
    """Every brand gets at most 3 neighbors, ranks are dense from 1, and
    the integer cosine² surrogate is a valid ppm (co² ≤ nₐ·n_b ⇒ ≤ 1e6)."""
    pdf = mining.QUERIES["sim_item_neighbors"](spark, SF_DIR).toPandas()
    assert pdf.cos2_ppm.between(0, 1_000_000).all()
    by_brand = pdf.groupby("brand")["rnk"]
    assert (by_brand.max() <= 3).all()
    assert (by_brand.apply(lambda s: sorted(s) == list(range(1, len(s) + 1)))).all()
    assert (pdf.brand != pdf.neighbor).all()

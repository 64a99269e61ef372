"""Oracle parity + invariants for the behavioral analytics workloads."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.operators import behavioral

from .parity import assert_parity

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("key", sorted(behavioral.ORACLES))
def test_parity(spark, key):
    assert_parity(spark, key)


def test_funnel_is_monotone(spark):
    row = behavioral.QUERIES["events_funnel"](spark, SF).collect()[0]
    assert row.n_signup >= row.n_signup_view >= row.n_signup_view_purchase
    assert row.n_signup_view_purchase >= 0


def test_retention_week0_equals_cohort_sizes(spark):
    """Offset-0 cell of each cohort = number of users whose first week is
    that cohort week; total across cohorts = distinct users."""
    from data_integration_exercise_spark.io import load_table

    pdf = behavioral.QUERIES["events_retention_cohorts"](spark, SF).toPandas()
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert pdf[pdf.week_offset == 0].n_active.sum() == n_users
    assert (pdf.week_offset >= 0).all()

"""Oracle-parity tests for §2.2 projection/filter operators."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.operators import projections

from .parity import assert_parity


@pytest.mark.parametrize("key", sorted(projections.ORACLES))
def test_parity(spark, key):
    assert_parity(spark, key)


def test_sql_interface_runs_the_oracle_text_verbatim(spark):
    """The compatibility claim: the EXACT SQL string the oracle runs on
    DuckDB is what spark.sql() executes — assert the registered oracle
    text appears verbatim inside the operator source."""
    import inspect
    import textwrap

    from data_integration_exercise_spark.operators import projections

    src = inspect.getsource(projections.sql_adhoc_interface)
    oracle = projections.ORACLES["sql_adhoc_interface"]
    norm = lambda s: " ".join(textwrap.dedent(s).split())  # noqa: E731
    assert norm(oracle) in norm(src)

"""Oracle-parity tests for §2.11 UDF/UDAF/UDTF surface."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.operators import udfs

from .parity import assert_parity


@pytest.mark.parametrize("key", sorted(udfs.ORACLES))
def test_parity(spark, key):
    assert_parity(spark, key)


def test_udtf_matches_posexplode(spark):
    """Property: the UDTF output equals fn_explode's posexplode on the same
    doc subset (two implementations, one semantics)."""
    from data_integration_exercise_spark.functions import scalar

    sf = "/root/testdata/sf0.01"
    via_udtf = {
        (r.doc_id, r.pos, r.token)
        for r in udfs.QUERIES["udtf_python"](spark, sf).collect()
    }
    via_builtin = {
        (r.doc_id, r.pos, r.token)
        for r in scalar.QUERIES["fn_explode"](spark, sf).collect()
        if r.doc_id < 50
    }
    assert via_udtf == via_builtin

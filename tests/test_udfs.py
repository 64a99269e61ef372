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


def test_grouped_train_matches_exact_closed_form(spark):
    """The per-nation fit must equal an exact-integer closed-form refit of
    the same per-order frame, one model per nation (the synthetic
    o_totalprice is independent of basket size, so slopes are mixed-sign
    noise around zero — which the exact refit reproduces regardless)."""
    from data_integration_exercise_spark.operators import udfs

    pdf = udfs.QUERIES["udf_grouped_train"](spark, "/root/testdata/sf0.01").toPandas()
    assert len(pdf) == 25 and pdf.n_name.is_unique
    import duckdb

    per = duckdb.sql(
        """
        SELECT n.n_name, o.o_orderkey, count(*) AS x,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS y
        FROM '/root/testdata/sf0.01/lineitem.parquet' l
        JOIN '/root/testdata/sf0.01/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        JOIN '/root/testdata/sf0.01/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '/root/testdata/sf0.01/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2, o.o_totalprice
        """
    ).df()
    row = pdf[pdf.n_name == pdf.n_name.iloc[0]].iloc[0]
    g = per[per.n_name == row.n_name]
    xs, ys = [int(v) for v in g.x], [int(v) for v in g.y]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    num = n * sum(a * b for a, b in zip(xs, ys)) - sx * sy
    den = n * sum(a * a for a in xs) - sx * sx
    assert row.n_orders == n

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    assert row.slope_microcents_per_item == tdiv(1_000_000 * num, den)

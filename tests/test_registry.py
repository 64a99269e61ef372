"""Registry-level invariants: the driver-contract surface must stay sane."""

from __future__ import annotations

import re

from data_integration_exercise_spark.registry import oracle_sql, queries
from data_integration_exercise_spark.schemas import TABLES

ROWS_ONLY_ALLOWED = {
    # approximate or trigger-dependent by design (SURVEY §2 / §8)
    "agg_approx_distinct",
    "agg_hll_sketch_merge",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "stream_watermark_late",
    "stream_foreachbatch",
}


def test_every_oracle_has_a_query():
    assert set(oracle_sql()) <= set(queries())


def test_rows_only_set_is_closed():
    """No query silently loses its oracle: the rows-only set is exactly the
    documented approximate/trigger-dependent ops."""
    assert set(queries()) - set(oracle_sql()) == ROWS_ONLY_ALLOWED


def test_keys_are_well_formed():
    assert all(re.fullmatch(r"[a-z0-9_]+", k) for k in queries())


def test_oracles_reference_known_tables():
    """Every oracle reads at least one pre-registered view (guards against
    typo'd table names the driver's DuckDB would reject)."""
    for k, sql in oracle_sql().items():
        assert any(
            re.search(rf"\b{t}\b", sql) for t in TABLES
        ), f"{k}: oracle references no known table"


def test_no_unrounded_float_aggregates_in_oracles():
    """Float-hash discipline: any avg(/stddev/corr/covar) in an oracle must
    sit inside a round() — raw float aggregates are summation-order traps."""
    for k, sql in oracle_sql().items():
        for m in re.finditer(r"(?<!_)(avg|stddev_samp|var_samp|corr|covar_samp)\(", sql):
            prefix = sql[: m.start()]
            # crude but effective: a round( must be open at this point
            assert prefix.count("round(") > prefix.count(")") - prefix.count("("), (
                f"{k}: unrounded float aggregate near …{sql[m.start():m.start() + 40]!r}"
            )


def test_queries_count_matches_survey_addendum():
    """SURVEY §8 documents the registry totals; keep them in sync."""
    survey = open("/root/repo/SURVEY.md").read()
    m = re.search(r"Registry totals: \*\*(\d+) queries, (\d+) hash-oracled\*\*", survey)
    assert m, "SURVEY §8 registry-totals line missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(queries()), len(oracle_sql()))

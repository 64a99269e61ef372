"""Per-module query registries.

Each operator module declares::

    QUERIES, ORACLES, register = new_registry()

    @register("agg_pricing_summary", oracle="SELECT ...")
    def pricing_summary(spark, sf_dir): ...

``register`` keys are the SURVEY.md §2 inventory keys; ``oracle`` is the
DuckDB-SQL equivalent (omit for rows-only-verified ops). The driver contract
(__spark_entry__.py) requires identical output column names between the two —
alias every computed column on BOTH sides.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def new_registry():
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}

    def register(key: str, oracle: str | None = None):
        def deco(fn: QueryFn) -> QueryFn:
            if key in queries:
                raise ValueError(f"duplicate query key {key!r}")
            queries[key] = fn
            if oracle is not None:
                oracles[key] = textwrap.dedent(oracle).strip()
            return fn

        return deco

    return queries, oracles, register


def merge(modules) -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Merge module registries, refusing duplicate keys."""
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        for k, v in m.QUERIES.items():
            if k in queries:
                raise ValueError(f"duplicate query key {k!r} from {m.__name__}")
            queries[k] = v
        oracles.update(m.ORACLES)
    extra = set(oracles) - set(queries)
    if extra:
        raise ValueError(f"oracle without query: {sorted(extra)}")
    return queries, oracles

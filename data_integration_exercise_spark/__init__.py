"""data_integration_exercise_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and data-processing
capabilities of the reference repo ``tamara-glazer/data_integration_exercise``
(a single-node pandas ETL/integration exercise; the read-only checkout at
/root/reference is EMPTY — see SURVEY.md §0 — so capability parity is defined
by SURVEY.md §2's operator inventory, not by file:line citations).

Architecture (SURVEY.md §1/§3):
  - DataFrame/SQL only; lazy Catalyst plans; no RDDs.
  - Explicit StructType schemas (``schemas.py``) over driver-generated parquet.
  - One shared SparkSession (``session.py``) tuned for local[32] testing but
    configured so every operator scales to a multi-executor cluster
    (AQE, broadcast thresholds, partitioned sinks, no collect-based logic).
  - Operator surface is exposed as a registry of named queries
    (``registry.queries()``) with matching DuckDB oracle SQL
    (``registry.oracle_sql()``) per the driver contract in __spark_entry__.py.

Subpackages:
  operators/  — relational operators (§2.1-2.7, §2.10)
  sources/    — ingest/sink connectors (§2.1)
  functions/  — scalar function families (§2.8)
  streaming/  — Structured Streaming surface (§2.9)
  plans/      — plan-inspection helpers (explain/pushdown/broadcast asserts, §4)
"""

__version__ = "0.1.0"

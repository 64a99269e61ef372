#!/usr/bin/env python
"""Synthesize a larger scale factor by key-shifted replication of sf0.1.

VERDICT r12 item 4: every 100x-scale claim in this repo rests on audited
plan SHAPE plus sf0.1 measurements; this tool buys measured evidence at
sf1 (or any multiple) without touching the read-only /root/testdata.

Usage:
    python tools/make_scaled_sf.py [--src /root/testdata/sf0.1] \
        [--dst /tmp/sf1] [--replicas 10]

Construction (deterministic, no RNG):
- region/nation copy through unchanged (fixed dimensions, as in TPC-H).
- Fact/dim surrogate keys shift by replica*OFFSET, with the SAME shift
  applied to every foreign-key column that references them, so
  referential integrity — and therefore join selectivity per key — is
  preserved exactly: each replica is an independent shard of the same
  universe, which is how a real 10x corpus grows (more entities, same
  per-entity density), not hotter keys.
- documents: replica i>0 suffixes every whitespace token with _r{i}, so
  token sets are DISJOINT across replicas: within-replica near-dup
  structure is preserved verbatim (token renaming is a bijection; the
  md5 shingle hashes differ but their order statistics are exchangeable)
  while no artificial cross-replica duplicate pairs appear — replicating
  text verbatim would grow the true near-dup pair count quadratically
  and distort any dedup probe. n_chars is recomputed from the new text.
- embeddings: replica i adds i*1e-3 to every component — vectors stay
  near their originals (realistic cluster growth) without exact-dup
  degeneracy in ANN probes.
- events keep their timestamps (10x concurrency per window — volume
  growth a streaming pipeline actually sees) with shifted event/user ids.

Output is written by Spark (multi-file parquet), so scans of the scaled
dir are parallel — the honest input layout for a scale probe.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_OFFSET = 10_000_000

#: table -> columns shifted by replica * KEY_OFFSET (PKs and their FKs)
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def scale_table(spark, src: str, dst: str, table: str, replicas: int) -> int:
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{src}/{table}.parquet")
    if table in ("region", "nation"):
        out = base
    else:
        parts = []
        for i in range(replicas):
            rep = base
            for c in SHIFTS[table]:
                rep = rep.withColumn(c, F.col(c) + F.lit(i * KEY_OFFSET))
            if table == "documents" and i > 0:
                rep = rep.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1_r{i}")
                ).withColumn("n_chars", F.length("text").cast("long"))
            if table == "embeddings" and i > 0:
                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        "embedding", lambda x: x + F.lit(i * 1e-3)
                    ).cast("array<float>"),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
    return spark.read.parquet(f"{dst}/{table}.parquet").count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    from data_integration_exercise_spark.session import get_session

    spark = get_session()
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        n = scale_table(spark, args.src, args.dst, t, args.replicas)
        print(f"{t}: {n} rows -> {args.dst}/{t}.parquet", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

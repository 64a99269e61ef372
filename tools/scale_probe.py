#!/usr/bin/env python
"""One-off scale probe (VERDICT r12 item 4): time a key set at two scale
factors and diff the physical plan shape (shuffle/broadcast exchange
counts), converting the "this plan survives a scale-up" argument from
audited-shape to measured.

Usage:
    python tools/scale_probe.py --big /tmp/sf1 [--small /root/testdata/sf0.1]
        [--keys k1,k2,...]

Prints one JSON line per key:
    {"key": ..., "small_s": ..., "big_s": ..., "ratio": ...,
     "small_plan": [shuffles, broadcasts], "big_plan": [...],
     "plan_drift": bool}
and a final SUMMARY line. Single timed run per (key, sf) after one
discarded warm-up of the SMALL sf only (JIT/codegen warmth; the big run
stays cold-cache on data, which is the honest posture for a scale probe).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = [
    # BASELINE.md headline six
    "agg_pricing_summary",
    "join_multiway_star",
    "win_topn_per_group",
    "stream_tumbling",
    "agg_count_distinct",
    "sim_topk_cosine",
    # the five slowest extended keys per BENCH_r12 / VERDICT r12
    "dedup_minhash_openvocab",
    "graph_ppr",
    "sim_ann_graph",
    "graph_neighborhood_function",
    "plan_ivf_probe_geometry",
]

_SHUFFLE_RE = re.compile(
    r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition)"
)


def plan_shape(df) -> list[int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [len(_SHUFFLE_RE.findall(plan)), plan.count("BroadcastExchange")]


def timed(fn, spark, sf_dir: str) -> tuple[float, int, list[int]]:
    df = fn(spark, sf_dir)
    t0 = time.monotonic()
    n = len(df.collect())
    dt = round(time.monotonic() - t0, 3)
    # plan AFTER execution: with AQE on, executedPlan() before the collect
    # is the initial AdaptiveSparkPlan — reading it post-run captures the
    # FINAL runtime plan (isFinalPlan=true), which is exactly where
    # scale-dependent join-strategy changes appear (round-13 review
    # finding).
    return dt, n, plan_shape(df)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sf1")
    ap.add_argument("--keys", default=",".join(DEFAULT_KEYS))
    args = ap.parse_args()
    keys = [k for k in args.keys.split(",") if k]

    from data_integration_exercise_spark.registry import queries
    from data_integration_exercise_spark.session import get_session

    spark = get_session()
    qs = queries()
    results = []
    for k in keys:
        fn = qs[k]
        try:
            fn(spark, args.small).collect()  # warm-up, discarded
            small_s, small_n, small_plan = timed(fn, spark, args.small)
            big_s, big_n, big_plan = timed(fn, spark, args.big)
        except Exception as e:  # record and continue — one degenerate key
            # (e.g. a closed-vocab op fed an out-of-dictionary synthetic
            # corpus) must not kill the whole probe
            print(json.dumps({"key": k, "error": str(e)[:200]}), flush=True)
            continue
        rec = {
            "key": k,
            "small_s": small_s,
            "big_s": big_s,
            "ratio": round(big_s / small_s, 2) if small_s else None,
            "small_rows": small_n,
            "big_rows": big_n,
            "small_plan": small_plan,
            "big_plan": big_plan,
            "plan_drift": small_plan != big_plan,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    drifted = [r["key"] for r in results if r["plan_drift"]]
    print(
        "SUMMARY: "
        + json.dumps(
            {
                "n": len(results),
                "small_total_s": round(sum(r["small_s"] for r in results), 2),
                "big_total_s": round(sum(r["big_s"] for r in results), 2),
                "plan_drift": drifted,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

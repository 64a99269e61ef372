#!/usr/bin/env python
"""End-to-end check of the Catalyst cosine→LSH extension (run standalone:
it must own JVM startup, because spark.sql.extensions and the driver
classpath are fixed at session-JVM launch — tests/test_catalyst_ext.py
invokes this as a subprocess).

Asserts, against $SPARK_GRAFT_SF_DIR/embeddings.parquet (default sf0.001):
  1. The naive `join(id1 < id2).filter(cosine_sim(v1, v2) >= τ)` plan is
     rewritten: no CartesianProduct / BroadcastNestedLoopJoin; the join is
     an equi-join on the injected __lsh_band keys (8 bands × 4 bits).
  2. The rewrite honors the bucket-conjunct contract exactly: results
     equal the EXPLICIT band-explode + band-equality + cosine-threshold +
     distinct query built from the same expressions by hand (deterministic
     equality — hash-derived hyperplanes, no randomness).
  3. Recall vs the exact ε-join: printed, and asserted ≥ 0.5 (the 8×4
     band geometry's deterministic floor at τ=0.35 on this data).
  4. In a fresh JVM WITHOUT the extension (subprocess --no-ext), the same
     query fails: cosine_sim is extension-only — no behavior change
     elsewhere. (Must be a separate process: Spark configs leak into JVM
     system properties, so an in-process second session would silently
     inherit the extension.)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JAR = os.path.join(
    REPO, "data_integration_exercise_spark", "ext", "dies-catalyst-ext.jar"
)
TAU = 0.35
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# The same band-key expression the Scala rule injects (kept in sync with
# Templates.bandArray — the hand-built contract oracle).
def bands_sql(v: str, bands: int, rows: int) -> str:
    return f"""
transform(sequence(0, {bands - 1}), b ->
  b * {1 << rows}L + aggregate(sequence(0, {rows - 1}), 0L, (acc, k) ->
    acc * 2L + IF(
      aggregate(
        zip_with({v}, sequence(0, size({v}) - 1),
          (x, i) -> CAST(x AS DOUBLE) * IF(pmod(hash(b * {rows} + k, i), 2) = 0, 1D, -1D)),
        0D, (acc2, x2) -> acc2 + x2) >= 0D, 1L, 0L)))
"""
COSINE_SQL = """
aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)
 / (sqrt(aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
    * sqrt(aggregate({b}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
"""


def build_session(with_extension: bool):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[8]")
        .appName("catalyst-ext-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    )
    if with_extension:
        b = (
            b.config("spark.jars", JAR)
            .config("spark.driver.extraClassPath", JAR)
            .config("spark.sql.extensions", "dies.ext.CosineLshExtensions")
        )
    return b.getOrCreate()


def naive_query(spark):
    from pyspark.sql import functions as F

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    e1 = e.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("v1"))
    e2 = e.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("v2"))
    return (
        e1.join(e2, F.col("id1") < F.col("id2"))
        .filter(F.expr(f"cosine_sim(v1, v2) >= {TAU}D"))
        .select("id1", "id2")
    )


def no_ext_probe() -> int:
    """Fresh JVM without the extension: cosine_sim must NOT resolve."""
    spark = build_session(with_extension=False)
    try:
        naive_query(spark).collect()
        print("ERROR: cosine_sim resolved without the extension", file=sys.stderr)
        return 1
    except Exception:
        print("isolation check ok: cosine_sim is extension-only")
        return 0
    finally:
        spark.stop()


def contract_pairs(spark, bands: int, rows: int):
    """Hand-built contract oracle: band explode + band equality + exact
    cosine re-rank + distinct, same expressions, no extension magic."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    b1 = (
        e.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("v1"))
        .withColumn("band1", F.explode(F.expr(bands_sql("v1", bands, rows))))
    )
    b2 = (
        e.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("v2"))
        .withColumn("band2", F.explode(F.expr(bands_sql("v2", bands, rows))))
    )
    expected_df = (
        b1.join(b2, (F.col("id1") < F.col("id2")) & (F.col("band1") == F.col("band2")))
        .filter(F.expr(COSINE_SQL.format(a="v1", b="v2") + f" >= {TAU}D"))
        .select("id1", "id2")
        .distinct()
    )
    return sorted(map(tuple, expected_df.collect()))


def main() -> int:
    from pyspark.sql import functions as F

    spark = build_session(with_extension=True)

    # Opt-in contract (default OFF since round 11, ADVICE r10): with the
    # extension loaded but the rewrite conf unset, cosine_sim evaluates
    # exactly and the plan is left alone — no band keys injected.
    default_plan = naive_query(spark)._jdf.queryExecution().executedPlan().toString()
    assert "__lsh_band" not in default_plan, (
        "rewrite fired without spark.dies.lsh.rewrite.enabled=true — it "
        "must be opt-in"
    )
    print("opt-in check ok: rewrite off by default, cosine_sim stays exact")
    spark.conf.set("spark.dies.lsh.rewrite.enabled", "true")

    rewritten = naive_query(spark)
    plan = rewritten._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, "rewrite failed: CartesianProduct"
    assert "BroadcastNestedLoopJoin" not in plan, (
        "rewrite failed: BroadcastNestedLoopJoin"
    )
    assert "__lsh_band" in plan, "rewrite failed: no band keys in plan"
    print("plan check ok: equi-join on __lsh_band keys, no nested-loop join")

    got = sorted(map(tuple, rewritten.collect()))
    expected = contract_pairs(spark, bands=8, rows=4)
    assert got == expected, (
        f"rewrite output != band+rerank contract: {len(got)} vs {len(expected)}"
    )
    print(f"contract check ok: {len(got)} pairs == hand-built band+rerank")

    # Session-tunable geometry: the rule must honor spark.dies.lsh.* confs
    # (pick the config from plan_lsh_band_geometry's table in practice).
    spark.conf.set("spark.dies.lsh.bands", "16")
    spark.conf.set("spark.dies.lsh.rowsPerBand", "2")
    got_162 = sorted(map(tuple, naive_query(spark).collect()))
    expected_162 = contract_pairs(spark, bands=16, rows=2)
    assert got_162 == expected_162, (
        f"16x2 rewrite != 16x2 contract: {len(got_162)} vs {len(expected_162)}"
    )
    assert len(got_162) >= len(got), "coarser geometry lost candidates"
    print(
        f"conf check ok: 16x2 geometry honored "
        f"({len(got_162)} pairs >= {len(got)} at 8x4)"
    )
    spark.conf.unset("spark.dies.lsh.bands")
    spark.conf.unset("spark.dies.lsh.rowsPerBand")

    # Cosine threshold written INSIDE the join condition (the other common
    # user formulation) must rewrite identically.
    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    e1 = e.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("v1"))
    e2 = e.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("v2"))
    injoin = (
        e1.join(
            e2,
            (F.col("id1") < F.col("id2"))
            & F.expr(f"cosine_sim(v1, v2) >= {TAU}D"),
        )
        .select("id1", "id2")
    )
    injoin_plan = injoin._jdf.queryExecution().executedPlan().toString()
    assert "__lsh_band" in injoin_plan and "BroadcastNestedLoopJoin" not in injoin_plan
    got_ij = sorted(map(tuple, injoin.collect()))
    assert got_ij == expected, (
        f"join-condition form != filter form: {len(got_ij)} vs {len(expected)}"
    )
    print("join-condition form ok: same plan shape and result set")

    # Kill switch: disabling the rewrite must leave the naive plan alone
    # (nested-loop join, no band keys) while cosine_sim still evaluates.
    spark.conf.set("spark.dies.lsh.rewrite.enabled", "false")
    off = naive_query(spark)
    off_plan = off._jdf.queryExecution().executedPlan().toString()
    assert "__lsh_band" not in off_plan, "kill switch ignored"
    off_n = off.count()
    spark.conf.set("spark.dies.lsh.rewrite.enabled", "true")
    print(f"kill-switch ok: naive plan preserved ({off_n} exact pairs)")

    # τ-floor guard (VERDICT r11 item 7): with the rewrite opted IN, a
    # threshold below spark.dies.lsh.minThreshold (default 0.2) must NOT
    # band — low τ collapses band-collision recall, so the exact naive
    # plan stands. Lowering the floor re-enables banding. Rebuild the
    # DataFrame under each conf (analysis-time rule, same as the sweeps).
    def low_tau_q():
        return (
            e1.join(e2, F.col("id1") < F.col("id2"))
            .filter(F.expr("cosine_sim(v1, v2) >= 0.05D"))
            .select("id1", "id2")
        )

    floor_plan = low_tau_q()._jdf.queryExecution().executedPlan().toString()
    assert "__lsh_band" not in floor_plan, (
        "rewrite fired at τ=0.05 < default floor 0.2 — the τ-floor guard "
        "is broken"
    )
    spark.conf.set("spark.dies.lsh.minThreshold", "0.01")
    floor_plan_low = low_tau_q()._jdf.queryExecution().executedPlan().toString()
    assert "__lsh_band" in floor_plan_low, (
        "rewrite did not fire at τ=0.05 with the floor lowered to 0.01"
    )
    spark.conf.unset("spark.dies.lsh.minThreshold")
    print("τ-floor guard ok: no banding below the floor, conf-tunable")

    # Malformed floor conf (ADVICE r12 item 2): an unparsable
    # minThreshold must not throw during analysis — the rule falls back
    # to the 0.2 default, so the low-τ query still refuses to band and a
    # high-τ query still bands. Correctness is unaffected either way
    # (the rule only chooses between two correct plans).
    spark.conf.set("spark.dies.lsh.minThreshold", "not-a-number")
    bad_floor_low = low_tau_q()._jdf.queryExecution().executedPlan().toString()
    assert "__lsh_band" not in bad_floor_low, (
        "malformed floor conf must fall back to 0.2 (τ=0.05 banded)"
    )
    bad_floor_hi = naive_query(spark)
    bad_floor_hi_plan = (
        bad_floor_hi._jdf.queryExecution().executedPlan().toString()
    )
    assert "__lsh_band" in bad_floor_hi_plan, (
        "malformed floor conf broke banding above the fallback floor"
    )
    spark.conf.unset("spark.dies.lsh.minThreshold")
    print("malformed-floor fallback ok: analysis never throws, 0.2 default")

    # Non-finite floor conf (round-13 review finding): "NaN" PARSES via
    # toDouble but every `x >= NaN` comparison is false, which would
    # silently disable banding session-wide; the finite-filter must fall
    # back to 0.2 so a high-τ query still bands. Same for a malformed
    # band-geometry conf: analysis must not throw and the default 8×4
    # geometry stands.
    spark.conf.set("spark.dies.lsh.minThreshold", "NaN")
    nan_hi = naive_query(spark)._jdf.queryExecution().executedPlan().toString()
    assert "__lsh_band" in nan_hi, (
        "NaN floor conf silently disabled banding (finite-filter missing)"
    )
    spark.conf.unset("spark.dies.lsh.minThreshold")
    spark.conf.set("spark.dies.lsh.bands", "eight")
    spark.conf.set("spark.dies.lsh.rowsPerBand", "-3")
    bad_geo = naive_query(spark)._jdf.queryExecution().executedPlan().toString()
    assert "__lsh_band" in bad_geo, (
        "malformed band-geometry conf broke the rewrite instead of "
        "falling back to 8x4"
    )
    spark.conf.unset("spark.dies.lsh.bands")
    spark.conf.unset("spark.dies.lsh.rowsPerBand")
    print("non-finite floor + malformed geometry fallback ok")

    # Recall vs the exact ε-join (deterministic: hash-derived hyperplanes).
    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    exact_df = (
        e.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("v1"))
        .join(
            e.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("v2")),
            F.col("id1") < F.col("id2"),
        )
        .filter(F.expr(COSINE_SQL.format(a="v1", b="v2") + f" >= {TAU}D"))
        .select("id1", "id2")
    )
    exact = set(map(tuple, exact_df.collect()))
    recall = len(set(got) & exact) / len(exact) if exact else 1.0
    print(f"recall vs exact ε-join: {len(got)}/{len(exact)} = {recall:.3f}")
    assert set(got) <= exact, "rewrite produced pairs below the threshold"
    assert recall >= 0.5, f"recall {recall:.3f} below the 8x4 band floor"

    # --- Second rule: levenshtein(a,b) <= k → length-banded equi-join ---
    # EXACT rewrite (bag semantics, no Distinct, no recall loss), so it is
    # default-ON — the deliberate contrast with the approximate cosine rule.
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    d1 = d.select(
        F.col("doc_id").alias("doc1"),
        F.col("lang").alias("l1"),
        F.col("text").alias("t1"),
    )
    d2 = d.select(
        F.col("doc_id").alias("doc2"),
        F.col("lang").alias("l2"),
        F.col("text").alias("t2"),
    )

    def lev_query():
        return (
            d1.join(d2, (F.col("l1") == F.col("l2")) & (F.col("doc1") < F.col("doc2")))
            .filter(F.expr("levenshtein(t1, t2) <= 10"))
            .select("doc1", "doc2", F.expr("levenshtein(t1, t2)").alias("lev"))
        )

    lev_plan = lev_query()._jdf.queryExecution().executedPlan().toString()
    assert "__lev_bkt" in lev_plan, "lev rewrite (default-ON) did not fire"
    assert "BroadcastNestedLoopJoin" not in lev_plan
    assert ", 10) >= 0" in lev_plan.replace("\n", " ") or "levenshtein" in lev_plan, (
        "banded re-rank kernel missing from plan"
    )
    lev_got = sorted(map(tuple, lev_query().collect()))
    spark.conf.set("spark.dies.lev.rewrite.enabled", "false")
    lev_plan_off = lev_query()._jdf.queryExecution().executedPlan().toString()
    assert "__lev_bkt" not in lev_plan_off, "lev kill switch ignored"
    lev_exp = sorted(map(tuple, lev_query().collect()))
    spark.conf.set("spark.dies.lev.rewrite.enabled", "true")
    assert lev_got == lev_exp, (
        f"lev rewrite changed results: {len(lev_got)} vs {len(lev_exp)} — "
        "it must be EXACT"
    )
    print(f"lev band-join ok: exact result equality ({len(lev_got)} pairs), "
          "kill switch honored")

    # Pure theta form (lev predicate inside the join condition, no equi
    # key): the naive plan is a nested-loop join; rewritten must be an
    # equi-join on the bucket keys and still result-identical.
    theta = d1.join(
        d2, (F.col("doc1") < F.col("doc2")) & F.expr("levenshtein(t1, t2) <= 10")
    ).select("doc1", "doc2")
    theta_plan = theta._jdf.queryExecution().executedPlan().toString()
    assert "__lev_bkt" in theta_plan and "BroadcastNestedLoopJoin" not in theta_plan
    theta_got = sorted(map(tuple, theta.collect()))
    spark.conf.set("spark.dies.lev.rewrite.enabled", "false")
    theta_exp = sorted(map(tuple, theta.collect()))
    spark.conf.set("spark.dies.lev.rewrite.enabled", "true")
    assert theta_got == theta_exp, "theta-form lev rewrite changed results"
    print(f"lev theta-form ok: equi-join plan, exact ({len(theta_got)} pairs)")

    # Randomized (seeded) equality sweep: 200 random strings of wildly
    # varying lengths (including duplicates, empties, and NULLs), rewrite
    # on vs off across several thresholds — bag-semantics equality every
    # time. This is the property the rule claims: result-identical always.
    import random

    rng = random.Random(11)
    alphabet = "abcde"
    pool = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
        for _ in range(180)
    ] + [""] * 10 + [None] * 10
    rng.shuffle(pool)
    ra = spark.createDataFrame([(s,) for s in pool], "s1: string")
    rb = spark.createDataFrame([(s,) for s in pool], "s2: string")
    # NOTE: analysis (and thus the resolution-rule rewrite) happens EAGERLY
    # at Dataset construction — a conf toggle after construction does not
    # re-analyze, so each arm must rebuild the DataFrame under its conf.
    def lev_rand_q(k):
        return ra.join(rb).filter(F.expr(f"levenshtein(s1, s2) <= {k}"))

    for k in (0, 1, 3, 7):
        on_plan = lev_rand_q(k)._jdf.queryExecution().executedPlan().toString()
        assert "__lev_bkt" in on_plan, f"k={k}: rewrite did not fire"
        got_r = sorted(map(tuple, lev_rand_q(k).collect()), key=str)
        spark.conf.set("spark.dies.lev.rewrite.enabled", "false")
        off_q = lev_rand_q(k)
        off_plan2 = off_q._jdf.queryExecution().executedPlan().toString()
        assert "__lev_bkt" not in off_plan2, f"k={k}: off-arm still rewritten"
        exp_r = sorted(map(tuple, off_q.collect()), key=str)
        spark.conf.set("spark.dies.lev.rewrite.enabled", "true")
        assert got_r == exp_r, (
            f"k={k}: randomized sweep mismatch ({len(got_r)} vs {len(exp_r)})"
        )
    print("lev randomized sweep ok: exact at k=0/1/3/7 over 200 seeded strings")

    # --- Third rule: abs(a - b) <= k → bucketed numeric band equi-join ---
    # EXACT rewrite (bag semantics, no Distinct), default-ON; fires only
    # when no equality conjunct already bridges the sides (with an equi key
    # the join is already hashed and banding would just 3x the left side).
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    ea = ev.select(F.col("event_id").alias("ida"), F.col("user_id").alias("ua"))
    eb = ev.select(F.col("event_id").alias("idb"), F.col("user_id").alias("ub"))

    def band_query():
        return (
            ea.join(eb, F.expr("abs(ua - ub) <= 2") & (F.col("ida") < F.col("idb")))
            .filter(F.col("ida") % 100 == 0)
            .select("ida", "idb")
        )

    band_plan = band_query()._jdf.queryExecution().executedPlan().toString()
    assert "__band_bkt" in band_plan, "band rewrite (default-ON) did not fire"
    assert "BroadcastNestedLoopJoin" not in band_plan
    assert "CartesianProduct" not in band_plan
    band_got = sorted(map(tuple, band_query().collect()))
    spark.conf.set("spark.dies.band.rewrite.enabled", "false")
    band_plan_off = band_query()._jdf.queryExecution().executedPlan().toString()
    assert "__band_bkt" not in band_plan_off, "band kill switch ignored"
    assert ("BroadcastNestedLoopJoin" in band_plan_off
            or "CartesianProduct" in band_plan_off), (
        "naive plan unexpectedly not nested-loop — the rewrite claim is stale"
    )
    band_exp = sorted(map(tuple, band_query().collect()))
    spark.conf.set("spark.dies.band.rewrite.enabled", "true")
    assert band_got == band_exp, (
        f"band rewrite changed results: {len(band_got)} vs {len(band_exp)}"
    )
    print(f"numeric band-join ok: equi-join plan, exact result equality "
          f"({len(band_got)} pairs), kill switch honored")

    # Guard: an existing equality bridge must suppress the rewrite.
    guarded = ea.join(
        eb, (F.col("ua") == F.col("ub")) & F.expr("abs(ida - idb) <= 5")
    )
    g_plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "__band_bkt" not in g_plan, (
        "band rule fired despite an existing equi key — the guard is broken"
    )
    print("band equi-bridge guard ok: already-hashed joins are untouched")

    # Randomized (seeded) equality sweep: 200 integers spanning negatives,
    # duplicates, and NULLs; <= and < forms; rewrite on vs off at several
    # widths — bag-semantics equality every time.
    rng2 = random.Random(13)
    ipool = [rng2.randint(-50, 50) for _ in range(160)] + [0] * 20 + [None] * 20
    rng2.shuffle(ipool)
    ia = spark.createDataFrame([(v,) for v in ipool], "x1: long")
    ib = spark.createDataFrame([(v,) for v in ipool], "x2: long")
    # Same eager-analysis rule as the lev sweep: rebuild under each conf.
    def band_rand_q(pred):
        return ia.join(ib).filter(F.expr(pred))

    for pred in ("abs(x1 - x2) <= 0", "abs(x1 - x2) <= 1",
                 "abs(x1 - x2) <= 5", "abs(x1 - x2) < 4"):
        on_plan2 = band_rand_q(pred)._jdf.queryExecution().executedPlan().toString()
        assert "__band_bkt" in on_plan2, f"{pred!r}: rewrite did not fire"
        got_n = sorted(map(tuple, band_rand_q(pred).collect()), key=str)
        spark.conf.set("spark.dies.band.rewrite.enabled", "false")
        off_qn = band_rand_q(pred)
        off_plan3 = off_qn._jdf.queryExecution().executedPlan().toString()
        assert "__band_bkt" not in off_plan3, f"{pred!r}: off-arm still rewritten"
        exp_n = sorted(map(tuple, off_qn.collect()), key=str)
        spark.conf.set("spark.dies.band.rewrite.enabled", "true")
        assert got_n == exp_n, (
            f"{pred!r}: randomized sweep mismatch "
            f"({len(got_n)} vs {len(exp_n)})"
        )
    print("band randomized sweep ok: exact at k=0/1/5 and strict-< "
          "over 200 seeded ints with negatives and NULLs")

    # Long-extreme operands (ADVICE r11): with k=0 and a value at
    # Long.MaxValue the neighbor bucket bl+1 overflows; plain Add would
    # make the REWRITTEN plan throw under ANSI where the naive plan
    # succeeds. The TRY-mode neighbors must keep the rewrite green and
    # result-identical. (No MinValue operand here: abs(Max - Min) also
    # overflows in the NAIVE predicate, which is the documented shared
    # boundary, not this rule's.)
    jmax = (1 << 63) - 1
    xa = spark.createDataFrame([(jmax,), (jmax - 1,), (5,), (None,)], "x1: long")
    xb = spark.createDataFrame([(jmax,), (jmax - 1,), (5,), (None,)], "x2: long")
    ansi_prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    extreme = xa.join(xb).filter(F.expr("abs(x1 - x2) <= 0"))
    ex_plan = extreme._jdf.queryExecution().executedPlan().toString()
    assert "__band_bkt" in ex_plan, "extreme-operand query did not rewrite"
    ex_got = sorted(map(tuple, extreme.collect()), key=str)
    spark.conf.set("spark.dies.band.rewrite.enabled", "false")
    ex_exp = sorted(
        map(tuple, xa.join(xb).filter(F.expr("abs(x1 - x2) <= 0")).collect()),
        key=str,
    )
    spark.conf.set("spark.dies.band.rewrite.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", ansi_prev)
    assert ex_got == ex_exp, (
        f"Long-extreme mismatch: {ex_got} vs {ex_exp}"
    )
    print("band Long-extreme ok: TRY-mode neighbors, ANSI-safe, "
          f"result-identical ({len(ex_got)} pairs)")

    spark.stop()

    # Isolation must run in a FRESH JVM (configs leak via system props).
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--no-ext"],
        timeout=300,
    ).returncode
    if rc != 0:
        return rc
    print("ALL CHECKS PASSED")
    return 0


if __name__ == "__main__":
    if "--no-ext" in sys.argv:
        sys.exit(no_ext_probe())
    sys.exit(main())

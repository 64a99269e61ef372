"""Catalyst extension (SURVEY §4 showcase / §14): cosine_sim(a,b) >= τ
filters over inner joins rewrite to banded-LSH equi-joins.

The check MUST run in a subprocess: spark.sql.extensions and the driver
classpath are fixed at session-JVM launch, and Spark configs leak into JVM
system properties — an in-process session built after the suite's shared
session would neither load the jar nor isolate the no-extension probe.
tools/catalyst_ext_check.py asserts, in its own JVMs:

  1. plan shape — no CartesianProduct / BroadcastNestedLoopJoin; the join
     keys include the injected __lsh_band columns;
  2. the bucket-conjunct contract — rewritten output equals the explicit
     band-explode + band-equality + cosine-re-rank + distinct query built
     from the same expressions by hand (deterministic: hash-derived
     hyperplanes);
  3. recall ≥ 0.5 vs the exact ε-join at τ=0.35 (deterministic floor of
     the 8-band × 4-bit geometry on this data);
  4. a fresh JVM without the extension cannot resolve cosine_sim at all —
     no behavior change outside the opt-in session.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAR = os.path.join(
    REPO, "data_integration_exercise_spark", "ext", "dies-catalyst-ext.jar"
)
CHECK = os.path.join(REPO, "tools", "catalyst_ext_check.py")


def _class_hashes(jar_path):
    import hashlib
    import zipfile

    with zipfile.ZipFile(jar_path) as z:
        return {
            n: hashlib.sha256(z.read(n)).hexdigest()
            for n in z.namelist()
            if n.endswith(".class")
        }


def test_cosine_lsh_extension_end_to_end():
    # ALWAYS rebuild from source (ADVICE r10: a stale or tampered committed
    # binary must not pass while the Scala source says otherwise). The build
    # uses pyspark's bundled scalac (~20 s) and is byte-deterministic, so
    # the rebuilt class files must match the committed jar exactly; the
    # behavior checks below then run against the fresh build either way.
    committed = _class_hashes(JAR) if os.path.exists(JAR) else None
    subprocess.run(
        ["bash", os.path.join(REPO, "tools", "build_catalyst_ext.sh")],
        check=True,
        capture_output=True,
        timeout=300,
    )
    rebuilt = _class_hashes(JAR)
    assert rebuilt, "build produced no classes"
    if committed is not None:
        assert rebuilt == committed, (
            "committed dies-catalyst-ext.jar does not match a fresh build of "
            "CosineLshExtensions.scala — re-run tools/build_catalyst_ext.sh "
            "and commit the jar alongside the source change"
        )
    proc = subprocess.run(
        [sys.executable, CHECK],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"catalyst_ext_check failed (rc={proc.returncode}):\n"
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )
    assert "ALL CHECKS PASSED" in proc.stdout

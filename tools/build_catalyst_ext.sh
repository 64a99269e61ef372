#!/usr/bin/env bash
# Build the Catalyst extension jar using the Scala compiler that SHIPS WITH
# pyspark (no external toolchain): scala-compiler-2.13.x.jar is in
# pyspark/jars, and the JDK provides `jar`. Output:
#   data_integration_exercise_spark/ext/dies-catalyst-ext.jar
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
SPARK_JARS="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
SRC="$REPO/data_integration_exercise_spark/ext/src/CosineLshExtensions.scala"
OUT="$REPO/data_integration_exercise_spark/ext"
CLASSES="$OUT/build/classes"

rm -rf "$CLASSES"
mkdir -p "$CLASSES"

# Resolve the bundled Scala toolchain by glob so a pyspark patch bump
# doesn't break the build (exactly one of each ships with pyspark).
SCALA_COMPILER=$(ls "$SPARK_JARS"/scala-compiler-*.jar)
SCALA_LIBRARY=$(ls "$SPARK_JARS"/scala-library-*.jar)
SCALA_REFLECT=$(ls "$SPARK_JARS"/scala-reflect-*.jar)

java -cp "$SCALA_COMPILER:$SCALA_LIBRARY:$SCALA_REFLECT" \
  scala.tools.nsc.Main \
  -classpath "$SPARK_JARS/*" \
  -d "$CLASSES" \
  "$SRC"

# Deterministic archive (VERDICT r11 item 4): `jar cf` stamps each entry
# with the build wall-clock, so byte-identical classes still produced a
# byte-DIFFERENT jar and every test-run rebuild dirtied the working tree.
# Write the zip ourselves with sorted entries and a fixed timestamp —
# identical class bytes now reproduce the identical committed jar.
"${PYTHON:-python3}" - "$CLASSES" "$OUT/dies-catalyst-ext.jar" <<'EOF'
import os
import sys
import zipfile

classes, jar = sys.argv[1], sys.argv[2]
entries = []
for root, _dirs, files in os.walk(classes):
    for f in files:
        full = os.path.join(root, f)
        entries.append((os.path.relpath(full, classes), full))
entries.sort()
with zipfile.ZipFile(jar, "w", zipfile.ZIP_DEFLATED) as z:
    mf = zipfile.ZipInfo("META-INF/MANIFEST.MF", (2020, 1, 1, 0, 0, 0))
    mf.external_attr = 0o644 << 16
    z.writestr(mf, "Manifest-Version: 1.0\r\n\r\n")
    for rel, full in entries:
        zi = zipfile.ZipInfo(rel.replace(os.sep, "/"), (2020, 1, 1, 0, 0, 0))
        zi.external_attr = 0o644 << 16
        zi.compress_type = zipfile.ZIP_DEFLATED
        with open(full, "rb") as fh:
            z.writestr(zi, fh.read())
EOF
echo "built $OUT/dies-catalyst-ext.jar"

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

"${JAVA_HOME:-/usr}/bin/jar" cf "$OUT/dies-catalyst-ext.jar" -C "$CLASSES" dies
echo "built $OUT/dies-catalyst-ext.jar"

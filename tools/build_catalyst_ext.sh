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

java -cp "$SPARK_JARS/scala-compiler-2.13.17.jar:$SPARK_JARS/scala-library-2.13.17.jar:$SPARK_JARS/scala-reflect-2.13.17.jar" \
  scala.tools.nsc.Main \
  -classpath "$SPARK_JARS/*" \
  -d "$CLASSES" \
  "$SRC"

"${JAVA_HOME:-/usr}/bin/jar" cf "$OUT/dies-catalyst-ext.jar" -C "$CLASSES" dies
echo "built $OUT/dies-catalyst-ext.jar"

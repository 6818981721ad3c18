#!/usr/bin/env bash
# Oracle sweep at an arbitrary SF (r11 VERDICT #2): run graft.Verify over
# every declared query at the given sfDir, then replay every oracle SQL in
# DuckDB via tools/check.py and compare. The driver's per-round gate runs
# only at sf0.01; q126's .005 tie-break bug (commit 284cd92) was invisible
# there and only caught by a voluntary sf0.1 sweep — this makes that sweep
# a one-command, once-per-round artifact (SWEEP_r<N>.md).
#
# Usage: tools/sweep.sh <sfDir> <outDir> [cpus]
# Runs outside sbt (plain java against target/scala-2.13/classes) so it
# can execute while an sbt test session holds the build lock; run
# `sbt compile` first.
set -euo pipefail
SF_DIR=$1
OUT_DIR=$2
CPUS=${3:-16}
REPO=$(cd "$(dirname "$0")/.." && pwd)
CLASSES="$REPO/target/scala-2.13/classes"
[ -d "$CLASSES" ] || { echo "run sbt compile first ($CLASSES missing)"; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=$CPUS java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.Verify "$SF_DIR" "$OUT_DIR"
python3 "$REPO/tools/check.py" "$SF_DIR" "$OUT_DIR"

#!/usr/bin/env bash
# North-rule deployment probes beyond the N-vs-4N scaling pair
# (VERDICT r4 "Next round #6 and #7"):
#
#   leg A — multi-core-executor HEADLINE twin: 2 workers x 8 cores
#           (2 executor JVMs, 16 total cores — the host's physical core
#           count) on the bench's 1M-geom headline input, vs the same
#           probe under --master local[16] in one JVM. Equal `fp`
#           fingerprints = byte-identical relations across the JVM
#           fan-out; sec within the documented noise band = the multi-JVM
#           twin of the local headline figure.
#
#   leg B — SKEW under the real cluster: the continent-polygon + 1M-point
#           probe at 4 executors x 4 cores. `spread` reports per-executor
#           total task-time max/median — the straggler signal for the
#           level-native/visitor cover split (target: <= 2.0).
#
# Usage: scripts/submit_cluster_bench.sh [<nGeoms>] [<reps>]
# All cluster state lives under target/; nothing outside the repo is
# touched. Requires the jar: sbt -batch package.
set -euo pipefail
cd "$(dirname "$0")/.."

N_GEOMS="${1:-1000000}"
REPS="${2:-2}"
export SPARK_HOME=/opt/spark
BASE="$PWD/target/spark-standalone"
export SPARK_LOG_DIR="$BASE/logs"
export SPARK_WORKER_DIR="$BASE/work"
export SPARK_PID_DIR="$BASE/pids"
export SPARK_MASTER_HOST=127.0.0.1
export SPARK_LOCAL_IP=127.0.0.1
export SPARK_IDENT_STRING=graft
mkdir -p "$SPARK_LOG_DIR" "$SPARK_WORKER_DIR" "$SPARK_PID_DIR"

JAR=$(ls target/scala-2.13/spatialjoinspark_2.13-*.jar | grep -v tests | head -1)
SCRATCH="${GRAFT_LOCAL_DIR:-/dev/shm/graft-spark}"
INPUT="$SCRATCH/submit_in_${N_GEOMS}"
SKEWIN="$SCRATCH/submit_skew_${N_GEOMS}"
MASTER=spark://127.0.0.1:7077

ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

cleanup() {
  for i in "" 2 3 4; do
    SPARK_IDENT_STRING=graft$i "$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  done
  "$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1 || true
}
trap cleanup EXIT
cleanup

echo "== inputs: $N_GEOMS geoms -> $INPUT (headline), $SKEWIN (skew)"
[ -d "$INPUT" ] || sbt -batch "runMain graft.WriteInput $N_GEOMS $INPUT" >/dev/null
[ -d "$SKEWIN" ] || sbt -batch "runMain graft.WriteInput $N_GEOMS $SKEWIN skew" >/dev/null

"$SPARK_HOME/sbin/start-master.sh" >/dev/null
sleep 3

REPLOG="$BASE/cluster_bench.log"
: > "$REPLOG"

submit() { # $1 exec-cores, $2 total-cores, $3 input, $4 tag, $5 shuffle
  for rep in $(seq 1 "$REPS"); do
    "$SPARK_HOME/bin/spark-submit" \
      --master "$MASTER" \
      --class graft.SubmitProbe \
      --driver-memory 4g \
      --conf spark.executor.cores="$1" \
      --conf spark.executor.memory=8g \
      --conf "spark.executor.extraJavaOptions=$ADD_OPENS" \
      --conf spark.ui.enabled=false \
      --total-executor-cores "$2" \
      "$JAR" "$3" "$5" 2>/dev/null | grep '\[submit\]' \
      | sed "s/^/[$4 rep$rep] /" | tee -a "$REPLOG"
  done
}

echo "== leg A: headline twin, 2 executors x 8 cores (multi-JVM)"
for i in "" 2; do
  SPARK_IDENT_STRING=graft$i "$SPARK_HOME/sbin/start-worker.sh" -c 8 -m 9g "$MASTER" >/dev/null
done
sleep 3
submit 8 16 "$INPUT" "2x8" 32

echo "== leg A': headline twin, --master local[16] (single JVM, same cores)"
for rep in $(seq 1 "$REPS"); do
  "$SPARK_HOME/bin/spark-submit" \
    --master "local[16]" \
    --class graft.SubmitProbe \
    --driver-memory 12g \
    --conf spark.ui.enabled=false \
    "$JAR" "$INPUT" 32 2>/dev/null | grep '\[submit\]' \
    | sed "s/^/[local16 rep$rep] /" | tee -a "$REPLOG"
done

echo "== leg B: skew probe, 4 executors x 4 cores"
for i in "" 2; do
  SPARK_IDENT_STRING=graft$i "$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
done
for i in "" 2 3 4; do
  SPARK_IDENT_STRING=graft$i "$SPARK_HOME/sbin/start-worker.sh" -c 4 -m 9g "$MASTER" >/dev/null
done
sleep 3
submit 4 16 "$SKEWIN" "skew4x4" 32

echo "== log: $REPLOG"

#!/usr/bin/env bash
# North-rule deployment probe: the engine jar driven by spark-submit
# against a REAL standalone cluster (separate master/worker/executor JVMs)
# at N and 4N executors on the same input, reporting throughput at both
# levels plus the scaling efficiency.
#
#   N  = 1 executor  x 4 cores  (1 worker)
#   4N = 4 executors x 4 cores  (4 workers)
#
# Usage: scripts/submit_scaling.sh [<nGeoms>] [<reps>]
# All cluster state (logs, work dirs, pids) lives under target/; nothing
# outside the repo is touched. Requires the jar: sbt -batch package.
set -euo pipefail
cd "$(dirname "$0")/.."

N_GEOMS="${1:-4000000}"
REPS="${2:-3}"
# cores per executor: 1 by default — the 1-vs-4 TOTAL core span measures the
# ENGINE's parallel efficiency instead of this host's shared memory-bandwidth
# ceiling (16 physical cores, wall variance 1.5-4x; the bench's thread-based
# scaling pair picks the same span for the same reason, see BASELINE.md).
# GRAFT_EXEC_CORES=4 reproduces the 4-vs-16-core bandwidth-limited variant.
EC="${GRAFT_EXEC_CORES:-1}"
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
INPUT="${GRAFT_LOCAL_DIR:-/dev/shm/graft-spark}/submit_in_${N_GEOMS}"
MASTER=spark://127.0.0.1:7077

ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

cleanup() {
  "$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  for i in 2 3 4; do
    SPARK_IDENT_STRING=graft$i "$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  done
  "$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1 || true
}
trap cleanup EXIT
cleanup

echo "== input: $N_GEOMS geoms -> $INPUT"
if [ ! -d "$INPUT" ]; then
  sbt -batch "runMain graft.WriteInput $N_GEOMS $INPUT" >/dev/null
fi

"$SPARK_HOME/sbin/start-master.sh" >/dev/null
sleep 3

REPLOG="$BASE/reps.log"
: > "$REPLOG"

submit() { # $1 = total-executor-cores, $2 = tag
  local best=""
  for rep in $(seq 1 "$REPS"); do
    local out
    out=$("$SPARK_HOME/bin/spark-submit" \
      --master "$MASTER" \
      --class graft.SubmitProbe \
      --driver-memory 4g \
      --conf spark.executor.cores=$EC \
      --conf spark.executor.memory=8g \
      --conf "spark.executor.extraJavaOptions=$ADD_OPENS" \
      --conf spark.ui.enabled=false \
      --total-executor-cores "$1" \
      "$JAR" "$INPUT" "$1" 2>/dev/null | grep '\[submit\]')
    echo "$out" | sed "s/^/[$2 rep$rep] /" >> "$REPLOG"
    # rep 2 of each submit is the warmed measurement; keep the best
    local s
    s=$(echo "$out" | awk -F'sec=' 'END{split($2,a," ");print a[1]}')
    if [ -z "$best" ] || awk "BEGIN{exit !($s < $best)}"; then best="$s"; fi
  done
  echo "$best"
}

echo "== N: 1 worker (1 executor x $EC cores)"
"$SPARK_HOME/sbin/start-worker.sh" -c "$EC" -m 9g "$MASTER" >/dev/null
sleep 3
T1=$(submit "$EC" "N" | tail -1)

echo "== 4N: 4 workers (4 executors x $EC cores)"
for i in 2 3 4; do
  SPARK_IDENT_STRING=graft$i "$SPARK_HOME/sbin/start-worker.sh" -c "$EC" -m 9g "$MASTER" >/dev/null
done
sleep 3
T4=$(submit $((4 * EC)) "4N" | tail -1)

EFF=$(awk "BEGIN{printf \"%.3f\", $T1 / (4.0 * $T4)}")
TP1=$(awk "BEGIN{printf \"%.0f\", $N_GEOMS / $T1}")
TP4=$(awk "BEGIN{printf \"%.0f\", $N_GEOMS / $T4}")
cat "$REPLOG"
echo "== RESULT n=$N_GEOMS t_N=${T1}s (${TP1} geoms/s) t_4N=${T4}s (${TP4} geoms/s) scaling_efficiency=$EFF"

#!/usr/bin/env bash
# Multi-JVM executor-scaling protocol: N = 1 executor JVM (local[8]) over
# the full input; 4N = 4 concurrent executor JVMs (local[8] each) over
# disjoint quarters of the SAME input. Each JVM has its own heap/GC/state
# stores — the faithful stand-in for a 4N-executor cluster.
#
# Usage: tools/executor_scaling.sh <srcDir-with-256-parquet-files> <totalRows>
set -euo pipefail
SRC=$1
ROWS=$2
CORES=${3:-8}
SHARDS=${4:-4}
REPO=$(cd "$(dirname "$0")/.." && pwd)
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JVMFLAGS="-Xms12g -Xmx12g -XX:+AlwaysPreTouch -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

WORK=$(mktemp -d /tmp/exec-scaling-XXXX)
echo "work: $WORK"

# split the source files into SHARDS disjoint dirs (symlinks, zero copy)
i=0
for s in $(seq 0 $((SHARDS-1))); do mkdir -p "$WORK/shard$s"; done
for f in "$SRC"/part-*.parquet; do
  ln -s "$f" "$WORK/shard$((i % SHARDS))/$(basename "$f")"
  i=$((i+1))
done
echo "split $i files into $SHARDS shards"

run_one() { # dir rows log
  java $ADDOPENS $JVMFLAGS -cp "$CP" graft.tools.ShardRunner "$1" "$2" "$CORES" > "$3" 2>&1
}

# --- N: one executor, full input ---
t0=$(date +%s.%N)
run_one "$SRC" "$ROWS" "$WORK/n.log"
tN=$(python3 -c "import time,sys; print(time.time()-float(sys.argv[1]))" "$t0")
grep -h '^SHARD' "$WORK/n.log"

# --- 4N: SHARDS concurrent executors, quarter each ---
t0=$(date +%s.%N)
pids=()
for s in $(seq 0 $((SHARDS-1))); do
  run_one "$WORK/shard$s" "$((ROWS / SHARDS))" "$WORK/s$s.log" &
  pids+=($!)
done
for p in "${pids[@]}"; do wait "$p"; done
t4=$(python3 -c "import time,sys; print(time.time()-float(sys.argv[1]))" "$t0")
grep -h '^SHARD' "$WORK"/s*.log

python3 - "$tN" "$t4" "$ROWS" "$SHARDS" <<'EOF'
import sys
tn, t4, rows, shards = float(sys.argv[1]), float(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
ppsn, pps4 = rows/tn, rows/t4
eff = (pps4/ppsn)/shards
print(f'{{"protocol":"multi-jvm","t_n":{tn:.1f},"t_4n":{t4:.1f},"pps_n":{ppsn:.0f},"pps_4n":{pps4:.0f},"efficiency":{eff:.3f}}}')
EOF

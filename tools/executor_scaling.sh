#!/usr/bin/env bash
# Multi-JVM executor-scaling protocol: N = 1 executor JVM (local[C]) over
# the full input; 4N = SHARDS concurrent executor JVMs (local[C] each) over
# disjoint shards of the SAME input. Each JVM has its own heap/GC/state
# stores — the faithful sandbox stand-in for a 4N-executor cluster
# (unlike local[4C], which runs 4C threads inside ONE heap and measures
# GC coupling no real cluster has).
#
# Fairness rules (each mirrors a property of a real long-running cluster):
#  - -XX:ActiveProcessorCount=C: each executor JVM sizes GC/JIT/common
#    pools for ITS core share, not the whole box;
#  - JIT warm-up stream before the measured run (long-running executors
#    are warm; without it each 4N JVM pays its compile tax on a 4x
#    smaller slice);
#  - throughput = rows / measured STREAM wall (SHARD line), excluding
#    JVM boot + heap pre-touch (cluster start-up, not throughput);
#    4N aggregate = total rows / max concurrent shard stream-wall;
#  - scratch (checkpoints, RocksDB working dirs, sink) on tmpfs per JVM:
#    executors on a real cluster have independent local disks, while
#    this sandbox's single virtual disk serializes fsyncs across JVMs.
#
# Two modes:
#   shard (strong scaling): the 4N JVMs split the input into contiguous
#     quarters — total work fixed. Each JVM then runs only 1/4 of the
#     micro-batches, so per-QUERY start cost (planning, state-store
#     bring-up) weighs 4x more on the 4N side: a protocol artifact.
#   same (weak scaling, the headline): each 4N JVM runs the FULL N
#     workload concurrently — identical per-JVM work and amortization,
#     aggregate throughput = 4 x rows / max wall. This is how streaming
#     cluster ingest is sized: per-executor workload constant, executors
#     added. Efficiency = per-JVM throughput retained under concurrency.
#
# Usage: tools/executor_scaling.sh <srcDir-with-part-files> <totalRows> [cores] [shards] [warmupDir] [mode=shard|same]
set -euo pipefail
SRC=$1
ROWS=$2
CORES=${3:-8}
SHARDS=${4:-4}
WARM=${5:-}
MODE=${6:-shard}
REPO=$(cd "$(dirname "$0")/.." && pwd)
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JVMFLAGS="-Xms12g -Xmx12g -XX:+AlwaysPreTouch -XX:ActiveProcessorCount=$CORES -XX:+UseParallelGC -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

WORK=$(mktemp -d /tmp/exec-scaling-XXXX)
echo "work: $WORK"

# split the source files into SHARDS disjoint dirs (symlinks, zero copy).
# CONTIGUOUS time slices, not round-robin: the files are range-partitioned
# on event time, and round-robin would hand each shard every 4th time
# slice — fragmenting every host session ~4x and inflating the 4N side's
# stateful work per row. Contiguous slices keep per-row work identical.
total=$(ls "$SRC"/part-*.parquet | wc -l)
per=$(( (total + SHARDS - 1) / SHARDS ))
i=0
for s in $(seq 0 $((SHARDS-1))); do mkdir -p "$WORK/shard$s"; done
if [ "$MODE" = "same" ]; then
  for s in $(seq 0 $((SHARDS-1))); do
    for f in "$SRC"/part-*.parquet; do ln -s "$f" "$WORK/shard$s/$(basename "$f")"; done
  done
  SHARD_ROWS=$ROWS
  echo "mode=same: each of $SHARDS JVMs streams all $total files"
else
  for f in $(ls "$SRC"/part-*.parquet | sort); do
    ln -s "$f" "$WORK/shard$((i / per))/$(basename "$f")"
    i=$((i+1))
  done
  SHARD_ROWS=$((ROWS / SHARDS))
  echo "mode=shard: split $i files into $SHARDS contiguous shards of $per"
fi

run_one() { # dir rows log scratch
  mkdir -p "$4"
  java $ADDOPENS $JVMFLAGS -Djava.io.tmpdir="$4" -cp "$CP" \
    graft.tools.ShardRunner "$1" "$2" "$CORES" ${WARM:+"$WARM"} > "$3" 2>&1
}

wall_of() { grep -h '^SHARD' "$1" | sed 's/.*"wall":\([0-9.]*\).*/\1/'; }

# --- N: one executor, full input ---
run_one "$SRC" "$ROWS" "$WORK/n.log" "/dev/shm/exsc-n"
grep -h '^SHARD' "$WORK/n.log"
TN=$(wall_of "$WORK/n.log")

# --- 4N: SHARDS concurrent executors, a disjoint slice each ---
pids=()
for s in $(seq 0 $((SHARDS-1))); do
  run_one "$WORK/shard$s" "$SHARD_ROWS" "$WORK/s$s.log" "/dev/shm/exsc-$s" &
  pids+=($!)
done
for p in "${pids[@]}"; do wait "$p"; done
grep -h '^SHARD' "$WORK"/s*.log
T4=$(for s in $(seq 0 $((SHARDS-1))); do wall_of "$WORK/s$s.log"; done | sort -rn | head -1)
rm -rf /dev/shm/exsc-*

python3 - "$TN" "$T4" "$ROWS" "$SHARDS" "$CORES" "$MODE" <<'EOF'
import sys
tn, t4, rows, shards, cores, mode = float(sys.argv[1]), float(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]), sys.argv[6]
ppsn = rows/tn
# shard mode: 4N JVMs together process `rows`; same mode: rows EACH
pps4 = (rows if mode == 'shard' else rows*shards)/t4
eff = (pps4/ppsn)/shards
print(f'{{"protocol":"multi-jvm","mode":"{mode}","cores_per_jvm":{cores},"jvms_4n":{shards},"stream_wall_n":{tn:.1f},"stream_wall_4n":{t4:.1f},"pps_n":{ppsn:.0f},"pps_4n":{pps4:.0f},"efficiency":{eff:.3f}}}')
EOF

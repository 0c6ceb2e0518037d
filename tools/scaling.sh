#!/bin/bash
# N-vs-4N scaling protocol (north rule): emulates executors as separate
# pinned JVMs with separate heaps — the resource shape of a real cluster.
#   N  = 1 executor (EC cores) processing the WHOLE corpus
#   4N = 4 executors (EC cores each, disjoint cpu sets) processing
#        disjoint quarters concurrently; wall = slowest executor
# Usage: tools/scaling.sh [turns] [reps]   (env: EC=cores/executor, MODE=weak)
# Prereq: sbt -batch compile (classes under target/scala-2.13/classes)
#
# Measurement-hygiene notes (learned the hard way):
# - Heaps are -Xms=-Xmx + AlwaysPreTouch: page-zeroing happens at JVM
#   startup (untimed), not inside another executor's timed rep — unstaggered
#   concurrent heap growth showed up as a kernel-time storm (70%+ sys) that
#   halved every shard's throughput.
# - EC=4 (the default) uses 16 of the 32 host cpus for the 4N side. The
#   sandbox box is a shared VM whose effective capacity fluctuates when all
#   32 vcpus are hot; an emulation that needs the whole box measures the
#   neighbor, not the engine. 4-core executors keep every JVM's resource
#   shape identical across N and 4N while staying inside reliably-available
#   capacity. EC=8 reproduces the whole-box variant.
set -e
TURNS=${1:-2000000}
REPS=${2:-2}
EC=${EC:-4}
HEAP=${HEAP:-10g}
AO="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# CP must be ABSOLUTE: the weak-mode block cd's to /tmp before launching,
# and a relative classpath there means instant ClassNotFoundException —
# this (hidden by the shared, self-truncating stderr logs) was the round-2
# "executor died silently right after startup" mystery
CP="$(cd "$(dirname "$0")/.." && pwd)/target/scala-2.13/classes:/opt/spark/jars/*"

# disjoint cpu sets: executor i gets cpus [i*EC, (i+1)*EC)
cpuset() { echo "$(($1 * EC))-$(($1 * EC + EC - 1))"; }

BARRIER=$(mktemp -d /tmp/scale_barrier.XXXX)

run_shard() { # cpuset idx nshards outfile barrierName barrierCount
  # discriminator unique per LAUNCH, derived from the output file — NOT per
  # shard idx: weak mode launches its 4 concurrent shards all with idx=0,
  # which used to share one stderr log (each open truncated it) and one
  # spark.local.dir. The shared local dir + clobbered log is the best
  # explanation for round-2's "executor died silently, stderr clean"
  # episodes: an exiting JVM's shutdown cleanup racing a starter on the
  # same local dir kills the starter right after BlockManager init, and
  # the sibling's log truncation hid the evidence.
  local disc rc
  disc=$(basename "$4" .json)
  set +e
  taskset -c "$1" java $AO -Xms$HEAP -Xmx$HEAP -XX:+AlwaysPreTouch \
    -XX:+ExitOnOutOfMemoryError \
    -XX:ErrorFile="/tmp/scale_hs_err_${disc}.log" \
    -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -Dspark.local.dir="$BARRIER/local-$disc" \
    -cp "$CP" graft.ScalingMain shard "$EC" "$TURNS" "$2" "$3" "$REPS" \
    "$BARRIER/${5:-solo$2}:${6:-$3}" \
    2>"/tmp/scale_err_${disc}.log" | grep '^{' > "$4"
  rc=${PIPESTATUS[0]}
  set -e
  if [ "$rc" != 0 ] || [ ! -s "$4" ]; then
    # a dead shard is never silent: name it, surface its exit code + log
    echo "## SHARD FAILED disc=$disc cpuset=$1 java_rc=$rc out=$4" >&2
    tail -5 "/tmp/scale_err_${disc}.log" >&2 || true
    return 1
  fi
}

if [ "${MODE:-strong}" = weak ]; then
  # weak scaling: per-executor throughput retention when 4 executors run
  # concurrently, each over the FULL corpus (the predictor for a real 4N
  # cluster where data volume scales with executors)
  echo "# weak N: 1 executor, full corpus" >&2
  run_shard "$(cpuset 0)" 0 1 /tmp/scale_n.json
  cat /tmp/scale_n.json
  echo "# weak 4N: 4 executors, full corpus EACH, concurrent" >&2
  # NOTE: this block used to be `( cd /tmp && run_shard ... & ... )`.
  # Bash binds `cd /tmp && run_shard A` as ONE background job, so only
  # shard 0 ran with cwd=/tmp — where the (then-relative) classpath did
  # not resolve ⇒ instant ClassNotFoundException. That asymmetry is why
  # round-2 weak runs lost exactly the cpuset-0-3 executor, twice.
  # per-pid wait: a bare `wait` always returns 0, which would let a dead
  # shard slide through to a confusing python crash (or worse, a silent
  # pass if its JSON line was already flushed) — reap each pid and fail
  run_shard "$(cpuset 0)" 0 1 /tmp/weak_0.json weak 4 & W0=$!
  run_shard "$(cpuset 1)" 0 1 /tmp/weak_1.json weak 4 & W1=$!
  run_shard "$(cpuset 2)" 0 1 /tmp/weak_2.json weak 4 & W2=$!
  run_shard "$(cpuset 3)" 0 1 /tmp/weak_3.json weak 4 & W3=$!
  WRC=0
  for p in $W0 $W1 $W2 $W3; do wait "$p" || WRC=1; done
  [ "$WRC" = 0 ] || { echo "## WEAK RUN FAILED: a shard died" >&2; exit 1; }
  cat /tmp/weak_*.json
  python3 - <<'EOF'
import json
n = json.load(open('/tmp/scale_n.json'))
ws = [json.load(open(f'/tmp/weak_{i}.json')) for i in range(4)]
wall = max(w['sec'] for w in ws)
# 4 executors completed 4 full corpora in `wall` ⇒ aggregate thr = 4·turns/wall
eff = (4 * n['turns'] / wall) / (n['turns'] / n['sec']) / 4
calib = [c for w in ws + [n]
         for c in (w.get('calib_pre_sec'), w.get('calib_post_sec')) if c]
print(json.dumps({'turns_each': n['turns'], 'sec_solo': n['sec'],
                  'sec_concurrent_max': wall,
                  'weak_scaling_efficiency': round(eff, 3),
                  'calib_max_sec': max(calib) if calib else None}))
EOF
  exit 0
fi

echo "# N: 1 executor ($EC cores), full corpus" >&2
run_shard "$(cpuset 0)" 0 1 /tmp/scale_n.json
cat /tmp/scale_n.json

echo "# 4N: 4 executors ($EC cores each), disjoint quarters, concurrent" >&2
run_shard "$(cpuset 0)" 0 4 /tmp/scale_4n_0.json strong 4 & S0=$!
run_shard "$(cpuset 1)" 1 4 /tmp/scale_4n_1.json strong 4 & S1=$!
run_shard "$(cpuset 2)" 2 4 /tmp/scale_4n_2.json strong 4 & S2=$!
run_shard "$(cpuset 3)" 3 4 /tmp/scale_4n_3.json strong 4 & S3=$!
SRC=0
for p in $S0 $S1 $S2 $S3; do wait "$p" || SRC=1; done
[ "$SRC" = 0 ] || { echo "## STRONG RUN FAILED: a shard died" >&2; exit 1; }
cat /tmp/scale_4n_*.json

python3 - <<'EOF'
import json
n = json.load(open('/tmp/scale_n.json'))
shards = [json.load(open(f'/tmp/scale_4n_{i}.json')) for i in range(4)]
total = sum(s['turns'] for s in shards)
assert total == n['turns'], (total, n['turns'])
wall = max(s['sec'] for s in shards)
thr_n = n['turns'] / n['sec']
thr_4n = total / wall
calib = [c for s in shards + [n]
         for c in (s.get('calib_pre_sec'), s.get('calib_post_sec')) if c]
print(json.dumps({
    'turns': n['turns'],
    'sec_N': round(n['sec'], 3), 'thr_N': round(thr_n),
    'wall_4N': round(wall, 3), 'thr_4N': round(thr_4n),
    'scaling_efficiency': round(thr_4n / thr_n / 4, 3),
    'calib_max_sec': max(calib) if calib else None}))
EOF

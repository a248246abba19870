#!/bin/bash
# Round-15 follow-up: clean third trial per incremental arm (persist_t1 was
# polluted by a concurrent verify session — its 729 s wall is 2x every other
# persist-arm wall) and a second stages100_spread line on a quiet machine
# (the first immediately followed six encode trials; its t2/t3 walls show
# the same-JVM degradation r14 documented, while t1 beat the r14 mins).
set -u
cd /root/repo
OUT=/root/repo/.benchdata/r15_probes.jsonl
ERR=/root/repo/.benchdata/r15_probes.err

run() {
  local t="$1" cmd="$2"; shift 2
  rm -rf /dev/shm/spark-bench-local
  echo "=== $cmd start $(date +%T) ===" >&2
  env "$@" SPARK_GRAFT_DRIVER_MEM=48g timeout "$t" \
    python tools/bench_r15.py "$cmd" 2>>"$ERR" >> "$OUT"
  echo "=== $cmd done $(date +%T) rc=$? ===" >&2
}

run 10800 inc_seam_attrib SPARK_GRAFT_INC_PERSIST=1 SPARK_GRAFT_TRIAL_TAG=persist_t3
run 10800 inc_seam_attrib SPARK_GRAFT_INC_PERSIST=0 SPARK_GRAFT_TRIAL_TAG=r14plan_t3
run 10800 stages100_spread
rm -rf /dev/shm/spark-bench-local
echo DONE2

#!/bin/bash
# Round-15 fourth phase: one more PLAIN interleaved incremental pair on
# the (apparently recovered) host — the 23:46 r14plan_seams trial ran
# 368 s, faster than every plain r14plan trial taken during the measured
# degradation window, so a clean-window pair is the decisive ratio.
set -u
cd /root/repo
OUT=/root/repo/.benchdata/r15_probes.jsonl
ERR=/root/repo/.benchdata/r15_probes.err
run() {
  local t="$1" cmd="$2"; shift 2
  rm -rf /dev/shm/spark-bench-local
  echo "=== $cmd ${!#} start $(date +%T) ===" >&2
  env "$@" SPARK_GRAFT_DRIVER_MEM=48g timeout "$t" \
    python tools/bench_r15.py "$cmd" 2>>"$ERR" >> "$OUT"
  echo "=== $cmd done $(date +%T) rc=$? ===" >&2
}
run 10800 inc_seam_attrib SPARK_GRAFT_INC_PERSIST=1 SPARK_GRAFT_TRIAL_TAG=persist_t4
run 10800 inc_seam_attrib SPARK_GRAFT_INC_PERSIST=0 SPARK_GRAFT_TRIAL_TAG=r14plan_t4
rm -rf /dev/shm/spark-bench-local
echo DONE4

#!/bin/bash
# Round-15 third phase:
#  - the per-stage ladder under the fresh-JVM-per-trial methodology
#    (three one-trial JVMs) — the forward-looking r16 baseline;
#  - one interleaved incremental pair with the NEW sub-seam attribution
#    (screen_verdict_mat/write, index shingle/slice splits — the r14
#    judge's "no attribution below stage level" on the two swinging
#    stages), tagged as separate arms (persist_seams / r14plan_seams) so
#    the instrumented walls don't mix into the t1-t3 A/B spreads; the
#    assembler's survivor-fingerprint identity gate covers all four arms.
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

for trial in 1 2 3; do
  run 7200 stage_trial SPARK_GRAFT_TRIAL_TAG="t$trial"
done

run 10800 inc_seam_attrib SPARK_GRAFT_INC_PERSIST=1 SPARK_GRAFT_TRIAL_TAG=persist_seams_t1
run 10800 inc_seam_attrib SPARK_GRAFT_INC_PERSIST=0 SPARK_GRAFT_TRIAL_TAG=r14plan_seams_t1

rm -rf /dev/shm/spark-bench-local
echo DONE3

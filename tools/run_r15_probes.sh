#!/bin/bash
# Serial round-15 sf100/1M probe run. Two methodology changes vs r14
# (both VERDICT r14 items):
#   - the A/B probes (incremental funnel arms, encode arms) run ONE JVM
#     PER TRIAL, arms interleaved, so the same-JVM monotonic wall
#     degradation that buried the r14 encode effect (18-85 s spread)
#     cannot correlate with an arm;
#   - stages100_spread output is diffed by the assembler against the r14
#     post-flip baseline and any stage median past its published max is
#     FLAGGED.
# Heavy probes keep the 48g driver (r11 incremental100 posture); tmpfs
# hygiene between phases (r9 postmortem).
set -u
cd /root/repo
OUT=/root/repo/.benchdata/r15_probes.jsonl
ERR=/root/repo/.benchdata/r15_probes.err
: > "$OUT"
: > "$ERR"

run() { # run <timeout> <cmd> [env pairs...]
  local t="$1" cmd="$2"; shift 2
  rm -rf /dev/shm/spark-bench-local
  echo "=== $cmd ${SPARK_GRAFT_TRIAL_TAG:-} start $(date +%T) ===" >&2
  env "$@" SPARK_GRAFT_DRIVER_MEM=48g timeout "$t" \
    python tools/bench_r15.py "$cmd" 2>>"$ERR" >> "$OUT"
  echo "=== $cmd done $(date +%T) rc=$? ===" >&2
}

# --- incremental funnel A/B: 2 trials per arm, interleaved, fresh JVM each
for trial in 1 2; do
  run 10800 inc_seam_attrib SPARK_GRAFT_INC_PERSIST=1 SPARK_GRAFT_TRIAL_TAG="persist_t$trial"
  run 10800 inc_seam_attrib SPARK_GRAFT_INC_PERSIST=0 SPARK_GRAFT_TRIAL_TAG="r14plan_t$trial"
done

# --- encode A/B: 3 trials per arm, interleaved, fresh JVM each
for trial in 1 2 3; do
  run 7200 encode_trial SPARK_GRAFT_ENCODE_FUSED=1 SPARK_GRAFT_TRIAL_TAG="fused_t$trial"
  run 7200 encode_trial SPARK_GRAFT_ENCODE_FUSED=0 SPARK_GRAFT_TRIAL_TAG="staged_t$trial"
done

# --- per-stage ladder re-run (assembler diffs vs the r14 baseline)
run 10800 stages100_spread

# --- gates
run 7200 funnel_guard
run 600 connect_probe

rm -rf /dev/shm/spark-bench-local
echo DONE

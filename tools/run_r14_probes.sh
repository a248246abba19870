#!/bin/bash
# Serial round-14 sf100/1M probe run — one JVM per subcommand, tmpfs
# hygiene between phases (r9 postmortem). Heavy probes get the 48g driver
# (the r11 incremental100 posture).
set -u
cd /root/repo
OUT=/root/repo/.benchdata/r14_probes.jsonl
: > "$OUT"
for cmd in encode_fuse_ab fit_resfuse_ab funnel_gap_attrib inc_shipped100 \
           ann_overlap_knee2 ann_escalation_sweep funnel_guard connect_probe; do
  rm -rf /dev/shm/spark-bench-local
  echo "=== $cmd start $(date +%T) ===" >&2
  case "$cmd" in
    funnel_gap_attrib|inc_shipped100|encode_fuse_ab|fit_resfuse_ab|ann_escalation_sweep|ann_overlap_knee2)
      SPARK_GRAFT_DRIVER_MEM=48g timeout 10800 python tools/bench_r14.py "$cmd" \
        2>>/root/repo/.benchdata/r14_probes.err >> "$OUT" ;;
    *)
      timeout 7200 python tools/bench_r14.py "$cmd" \
        2>>/root/repo/.benchdata/r14_probes.err >> "$OUT" ;;
  esac
  echo "=== $cmd done $(date +%T) rc=$? ===" >&2
done
rm -rf /dev/shm/spark-bench-local
echo DONE

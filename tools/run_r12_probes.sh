#!/bin/bash
# Serial round-12 sf100 probe run — one JVM per subcommand, tmpfs hygiene
# between phases (r9 postmortem). Heavy funnel probes get the 48g driver
# (the r11 incremental100 posture); the headline A/B and guard run with
# bench defaults so the numbers stay comparable to BENCH_r*.json.
set -u
cd /root/repo
OUT=/root/repo/.benchdata/r12_probes.jsonl
: > "$OUT"
for cmd in funnel_ab100 stages100 ann_clustered1m headline_ab shipped100 cc_distributed100 funnel_guard connect_probe; do
  rm -rf /dev/shm/spark-bench-local
  echo "=== $cmd start $(date +%T) ===" >&2
  case "$cmd" in
    funnel_ab100|stages100|ann_clustered1m|shipped100|cc_distributed100)
      SPARK_GRAFT_DRIVER_MEM=48g timeout 10800 python tools/bench_r12.py "$cmd" \
        2>>/root/repo/.benchdata/r12_probes.err >> "$OUT" ;;
    *)
      timeout 7200 python tools/bench_r12.py "$cmd" \
        2>>/root/repo/.benchdata/r12_probes.err >> "$OUT" ;;
  esac
  echo "=== $cmd done $(date +%T) rc=$? ===" >&2
done
rm -rf /dev/shm/spark-bench-local
echo DONE

#!/bin/bash
# Serial round-12 sf100 probe run — one JVM per subcommand, tmpfs hygiene
# between phases (r9 postmortem).
set -u
cd /root/repo
OUT=/root/repo/.benchdata/r12_probes.jsonl
: > "$OUT"
for cmd in funnel_ab100 stages100 connect_probe; do
  rm -rf /dev/shm/spark-bench-local
  echo "=== $cmd start $(date +%T) ===" >&2
  timeout 7200 python tools/bench_r12.py "$cmd" 2>>/root/repo/.benchdata/r12_probes.err >> "$OUT"
  echo "=== $cmd done $(date +%T) rc=$? ===" >&2
done
rm -rf /dev/shm/spark-bench-local
echo DONE

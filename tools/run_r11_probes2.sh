#!/bin/bash
set -u
cd /root/repo
OUT=/root/repo/.benchdata/r11_probes.jsonl
for cmd in sharp_pairs100 incremental100; do
  rm -rf /dev/shm/spark-bench-local
  echo "=== $cmd start $(date +%T) ===" >&2
  SPARK_GRAFT_DRIVER_MEM=48g timeout 7200 python tools/bench_r11.py "$cmd" 2>>/root/repo/.benchdata/r11_probes2.err >> "$OUT"
  echo "=== $cmd done $(date +%T) rc=$? ===" >&2
done
rm -rf /dev/shm/spark-bench-local
echo DONE

#!/bin/bash
set -u
cd /root/repo
rm -rf /dev/shm/spark-bench-local
echo "=== ann100_sweep start $(date +%T) ===" >&2
SPARK_GRAFT_DRIVER_MEM=48g timeout 7200 python tools/bench_r11.py ann100_sweep 2>>/root/repo/.benchdata/r11_probes4.err >> /root/repo/.benchdata/r11_probes.jsonl
echo "=== ann100_sweep done rc=$? $(date +%T) ===" >&2
rm -rf /dev/shm/spark-bench-local

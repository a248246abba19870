#!/bin/bash
# Serial round-13 sf100/1M probe run — one JVM per subcommand, tmpfs
# hygiene between phases (r9 postmortem). Heavy probes get the 48g driver
# (the r11 incremental100 posture). fit_opt_ab and ann_overlap_sweep run
# separately (tools/bench_r13.py; their outputs are appended to the same
# jsonl by this script when already produced, else run here).
set -u
cd /root/repo
OUT=/root/repo/.benchdata/r13_probes.jsonl
: > "$OUT"
# fold in the already-measured fit A/Bs + overlap sweep (+knee point) if present
for f in r13_fit_opt_ab.json r13_ann_overlap.json r13_ann_overlap_knee.json r13_fit_matmul_ab.json; do
  [ -s "/root/repo/.benchdata/$f" ] && grep '^{' "/root/repo/.benchdata/$f" >> "$OUT"
done
for cmd in inc_attrib100 stages100_spread cand_join_ab funnel_guard connect_probe; do
  rm -rf /dev/shm/spark-bench-local
  echo "=== $cmd start $(date +%T) ===" >&2
  case "$cmd" in
    inc_attrib100|stages100_spread|cand_join_ab)
      SPARK_GRAFT_DRIVER_MEM=48g timeout 10800 python tools/bench_r13.py "$cmd" \
        2>>/root/repo/.benchdata/r13_probes.err >> "$OUT" ;;
    *)
      timeout 7200 python tools/bench_r13.py "$cmd" \
        2>>/root/repo/.benchdata/r13_probes.err >> "$OUT" ;;
  esac
  echo "=== $cmd done $(date +%T) rc=$? ===" >&2
done
rm -rf /dev/shm/spark-bench-local
echo DONE

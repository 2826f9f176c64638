#!/bin/bash
# Round-4 queue #3: compose-bench rerun (dtype fix) after queue #2.
set -x
cd /root/repo
B=benchmarks

while ! grep -q DONE_R4_QUEUE2 $B/run_r4_queue2.log 2>/dev/null; do
  sleep 60
done

timeout 2400 python scripts/bench_int8_compose.py \
  > $B/int8_compose_r4.jsonl 2> $B/int8_compose_r4.log
echo "== q3 job1 compose rc=$? =="

echo DONE_R4_QUEUE3

#!/bin/bash
# Round-4 queue #2: waits for queue #1's DONE marker (one TPU job at a
# time), then runs the follow-up probes.
set -x
cd /root/repo
B=benchmarks

while ! grep -q DONE_R4_QUEUE $B/run_r4_queue.log 2>/dev/null; do
  sleep 60
done

# ds8-tail conv formulations (PERF.md §5 attempt-or-dead-end)
timeout 2400 python scripts/bench_ds8_conv.py --geoms ds8 ds4 \
  > $B/ds8_conv_r4.jsonl 2> $B/ds8_conv_r4.log
echo "== q2 job1 ds8conv rc=$? =="

echo DONE_R4_QUEUE2

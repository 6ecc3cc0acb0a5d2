#!/bin/bash
# Round-5 TPU measurement session: wait for the parity queue to drain,
# then run the train-step breakdown probe and the full benchmark serially.
cd /root/repo
while ! grep -q QUEUE_DONE runs/frp5/queue.log 2>/dev/null; do sleep 30; done
echo "queue drained at $(date)" > runs/tpu_session.log
python tools/probe_step_breakdown.py >> runs/tpu_session.log 2>&1
echo "probe done at $(date)" >> runs/tpu_session.log
python bench.py > runs/bench_r5.log 2>&1
echo "bench done at $(date)" >> runs/tpu_session.log

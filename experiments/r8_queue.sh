#!/bin/bash
# Round-5 follow-up 5: (1) STEVE --fp16 convergence A/B (identical-budget
# twins on the synth-Physion corpus), (2) uncontended bench preflight so
# the end-of-round BENCH_r05 conditions are verified ahead of time.
# bench.py takes the chip lock itself, so it runs AFTER the flock scope.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=experiments/logs
echo $$ > /tmp/r8queue.pid
trap 'rm -f /tmp/r8queue.pid' EXIT

(
  flock 9
  timeout 120 python -c "import jax; print(jax.devices())" || exit 9
  timeout 4500 python experiments/steve_amp_ab.py \
    > $L/steve_amp_ab_r5.log 2>&1 || echo "STEVE AMP AB FAILED"
) 9>/tmp/tpu.lock

timeout 5400 python bench.py > $L/bench_r5_preflight.log 2>&1 \
  || echo "BENCH PREFLIGHT FAILED"
echo "R8 QUEUE DONE"

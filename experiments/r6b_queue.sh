#!/bin/bash
# Round-5 follow-up: custom-backward frozen-decoder probe (waits for r6).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=experiments/logs
echo $$ > /tmp/r6bqueue.pid
trap 'rm -f /tmp/r6bqueue.pid' EXIT
exec 9>/tmp/tpu.lock
flock 9
timeout 120 python -c "import jax; print(jax.devices())" || exit 9
timeout 3000 python experiments/custom_bwd_probe.py \
  > $L/custom_bwd_probe_r5.log 2>&1 || echo "CUSTOM BWD PROBE FAILED"
echo "R6B QUEUE DONE"

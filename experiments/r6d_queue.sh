#!/bin/bash
# Round-5 follow-up 3: chunked custom-backward probe (v2 — whole-batch lost).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=experiments/logs
echo $$ > /tmp/r6dqueue.pid
trap 'rm -f /tmp/r6dqueue.pid' EXIT
exec 9>/tmp/tpu.lock
flock 9
timeout 120 python -c "import jax; print(jax.devices())" || exit 9
timeout 3600 python experiments/custom_bwd_probe.py \
  > $L/custom_bwd_probe_r5b.log 2>&1 || echo "CUSTOM BWD PROBE V2 FAILED"
echo "R6D QUEUE DONE"

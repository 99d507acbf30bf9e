#!/bin/bash
# Round-5 follow-up 4: AMP coverage matrix for STEVE / dVAE / Aloe.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=experiments/logs
echo $$ > /tmp/r7queue.pid
trap 'rm -f /tmp/r7queue.pid' EXIT
exec 9>/tmp/tpu.lock
flock 9
timeout 120 python -c "import jax; print(jax.devices())" || exit 9
timeout 3600 python experiments/amp_matrix_probe.py \
  > $L/amp_matrix_probe_r5.log 2>&1 || echo "AMP MATRIX PROBE FAILED"
echo "R7 QUEUE DONE"

#!/bin/bash
# Round-5 follow-up 4c: complete the AMP coverage matrix — the r7 run was
# killed after the dVAE/Aloe legs (amp_matrix_probe_r5.log); this re-runs
# ONLY the STEVE leg via SF_PROBE_LEGS.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=experiments/logs
echo $$ > /tmp/r7cqueue.pid
trap 'rm -f /tmp/r7cqueue.pid' EXIT
exec 9>/tmp/tpu.lock
flock 9
timeout 120 python -c "import jax; print(jax.devices())" || exit 9
SF_PROBE_LEGS=steve timeout 3600 python experiments/amp_matrix_probe.py \
  > $L/amp_matrix_probe_r5_steve2.log 2>&1 || echo "AMP MATRIX STEVE LEG FAILED"
echo "R7C QUEUE DONE"

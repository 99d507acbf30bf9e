#!/bin/bash
# Round-4 stage C: Physion branch end to end on the TPU (last downstream
# branch without on-chip evidence). Waits for the master queue to release
# the chip, then runs experiments/physion_synth_pipeline.py.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=experiments/logs

if [ -f /tmp/r4queue.pid ]; then
  while kill -0 "$(cat /tmp/r4queue.pid)" 2>/dev/null; do sleep 60; done
fi

timeout 120 python -c "import jax; print(jax.devices())" || exit 9

timeout 7200 python experiments/physion_synth_pipeline.py \
  > $L/physion_synth_r4.log 2>&1 || echo "PHYSION FAILED"
echo "R4C DONE"

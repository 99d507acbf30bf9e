#!/bin/bash
# Round-4 stage B: finish the PHYRE planning eval after the f32 in_proj fix.
#
# The r3b run trained every stage but died at the fold-verification assert:
# the TPU's default bf16 MXU matmul injects ~0.11 abs error into the folded
# in_proj on raw slots (vs 1.3e-5 at f32) — fixed by pinning
# jax.lax.Precision.HIGHEST on the slot-consuming first projections
# (models/readout.py). The folded ckpt itself is host-numpy math and is
# correct; delete it so the (now f32) verification re-runs, then the
# pipeline continues into the planning eval + AUCCESS report.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export SF_PHASE_DECONV=0
L=experiments/logs

# wait for the r4 queue to release the chip
if [ -f /tmp/r4queue.pid ]; then
  while kill -0 "$(cat /tmp/r4queue.pid)" 2>/dev/null; do sleep 60; done
fi

timeout 120 python -c "import jax; print(jax.devices())" || exit 9

# re-probe with the custom_vjp (phase fwd + dense bwd) routing
timeout 1800 python experiments/phase_deconv_probe.py \
  > $L/phase_deconv_probe_vjp.log 2>&1 || echo "PHASE PROBE2 FAILED"

rm -f experiments/out_phyre_fake/ckpts/readout_phyre_fake/latest_folded.ckpt.pkl
timeout 3600 python experiments/phyre_fake_pipeline.py \
  > $L/phyre_fake_r4.log 2>&1 || echo "PHYRE RERUN FAILED"
echo "R4B DONE"

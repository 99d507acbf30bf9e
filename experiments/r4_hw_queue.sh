#!/bin/bash
# Round-4 hardware queue.
#
# The round-3 queue's stage 1 (timed test_vp) and stage 3 (Aloe VQA) need
# the synth64 SAVi/SlotFormer checkpoints, which do NOT survive round
# boundaries (only git-tracked files persist). This queue waits for the
# in-flight round-3 PHYRE stage, regenerates the synth64 pipeline, then
# runs the two pending evidence runs and a bench smoke.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
# pin the measured round-3 deconv lowering: the phase-deconv path lands this
# round and is A/B-probed separately before its default is trusted
export SF_PHASE_DECONV=0
L=experiments/logs

# ---- 0. wait for the r3 queue (PHYRE stage) to release the chip
if [ -f /tmp/r3queue.pid ]; then
  while kill -0 "$(cat /tmp/r3queue.pid)" 2>/dev/null; do sleep 60; done
fi

# ---- 1. tunnel probe
timeout 120 python -c "import jax; print(jax.devices())" || exit 9

# ---- 1.5 phase-deconv A/B probe (short; decides the SF_PHASE_DECONV default)
timeout 1800 python experiments/phase_deconv_probe.py \
  > $L/phase_deconv_probe.log 2>&1 || echo "PHASE PROBE FAILED"

# ---- 2. regenerate the synth64 pipeline (SAVi -> extract -> SF -> test_vp)
timeout 9000 bash experiments/run_synth64.sh \
  > $L/run_synth64_r4.log 2>&1 || echo "SYNTH64 FAILED"

# ---- 3. val-128 extraction + timed test_vp (VERDICT r2 #6)
if [ ! -f experiments/out_synth64/synth_slots_val128.pkl ]; then
  timeout 1800 python -m slotformer_tpu.cli.extract_slots \
    --params experiments/synth64_savi_val128_params.py \
    --weight experiments/out_synth64/savi/latest.ckpt.pkl \
    --save_path experiments/out_synth64/synth_slots_val128.pkl \
    --batch_size 16 --chunk_len 20 --subset val \
    > $L/extract_val128_r3.log 2>&1 || echo "EXTRACT FAILED"
fi
timeout 3000 python -m slotformer_tpu.cli.test_vp \
  --params experiments/synth64_sf_eval128_params.py \
  --weight experiments/out_synth64/sf/latest.ckpt.pkl \
  --batch_size 8 --vis_dir experiments/out_synth64/vis_r3 \
  > $L/test_vp_timing_r3.log 2>&1 || echo "TEST_VP FAILED"

# ---- 4. Aloe VQA on rolled-out slots (VERDICT r2 #5a)
timeout 3600 python experiments/synth_vqa_aloe.py 20 \
  > $L/synth_vqa_aloe_r3.log 2>&1 || echo "ALOE FAILED"

# ---- 5. bench smoke (driver runs this at round end; verify it works now)
timeout 4200 python bench.py > $L/bench_r4_smoke.log 2>&1 || echo "BENCH FAILED"

echo "QUEUE DONE"

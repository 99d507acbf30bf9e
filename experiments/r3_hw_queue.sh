#!/bin/bash
# Round-3 hardware queue: runs the three pending TPU jobs sequentially.
# Each stage bounded by timeout; logs under experiments/logs/.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=experiments/logs

# ---- 0. tunnel probe
timeout 120 python -c "import jax; print(jax.devices())" || exit 9

# ---- 1. val-128 extraction + timed test_vp (VERDICT r2 #6)
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

# ---- 2. PHYRE fake-sim pipeline rerun (sparse solves + standardized readout)
rm -rf experiments/out_phyre_fake/splits experiments/out_phyre_fake/data \
       experiments/out_phyre_fake/ckpts
timeout 3600 python experiments/phyre_fake_pipeline.py \
  > $L/phyre_fake_r3b.log 2>&1 || echo "PHYRE FAILED"

# ---- 3. Aloe VQA on rolled-out slots (VERDICT r2 #5a)
timeout 3600 python experiments/synth_vqa_aloe.py 20 \
  > $L/synth_vqa_aloe_r3.log 2>&1 || echo "ALOE FAILED"

echo "QUEUE DONE"

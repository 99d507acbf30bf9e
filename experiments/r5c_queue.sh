#!/bin/bash
# Round-4 reordered follow-up queue (replaces r5b, which was stopped while
# still waiting on the chip lock): decision-critical probes FIRST so the
# default-flip decisions (SF_PHASE_DECONV=2, dec_recon_bf16) can be made,
# benched, and committed before the round ends. Serialized on /tmp/tpu.lock
# behind the master queue's reference-LR sweep.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=experiments/logs
echo $$ > /tmp/r5cqueue.pid
trap 'rm -f /tmp/r5cqueue.pid' EXIT

exec 9>/tmp/tpu.lock
flock 9

timeout 120 python -c "import jax; print(jax.devices())" || exit 9

# ---- 1. depth-to-space deconv A/B (decision input: SF_PHASE_DECONV=2)
timeout 3000 python experiments/dts_deconv_probe.py \
  > $L/dts_deconv_probe_r4.log 2>&1 || echo "DTS PROBE FAILED"

# ---- 2. decoder-backward probe v2 (LICM-proof; bf16 full-step A/B)
timeout 3000 python experiments/dec_bwd_probe_r4.py \
  > $L/dec_bwd_probe_r4b.log 2>&1 || echo "DEC PROBE FAILED"

# ---- 3. timed test_vp rerun (device-resident loop, uint8 vs f32 wire);
#         val128 slots re-extracted against the regenerated SAVi ckpt
timeout 1800 python -m slotformer_tpu.cli.extract_slots \
  --params experiments/synth64_savi_val128_params.py \
  --weight experiments/out_synth64/savi/latest.ckpt.pkl \
  --save_path experiments/out_synth64/synth_slots_val128.pkl \
  --batch_size 16 --chunk_len 20 --subset val \
  > $L/extract_val128_r5.log 2>&1 || echo "EXTRACT VAL128 FAILED"
timeout 3000 python -m slotformer_tpu.cli.test_vp \
  --params experiments/synth64_sf_eval128_params.py \
  --weight experiments/out_synth64/sf/latest.ckpt.pkl \
  --batch_size 8 --vis_dir experiments/out_synth64/vis_r5 \
  > $L/test_vp_timing_r5.log 2>&1 || echo "TEST_VP U8 FAILED"
timeout 3000 python -m slotformer_tpu.cli.test_vp \
  --params experiments/synth64_sf_eval128_params.py \
  --weight experiments/out_synth64/sf/latest.ckpt.pkl \
  --batch_size 8 --wire f32 --vis_dir experiments/out_synth64/vis_r5_f32 \
  > $L/test_vp_timing_r5_f32.log 2>&1 || echo "TEST_VP F32 FAILED"

# ---- 4. bf16 frozen-decoder convergence A/B (same slots + grafted
#         decoder as the f32 synth64 SF; compare val slot/img MSE)
timeout 3600 python -m slotformer_tpu.cli.train \
  --params experiments/synth64_sf_bf16_params.py \
  --ckp_path experiments/out_synth64/sf_bf16 --auto_resume \
  --san_check_val_step 1 \
  > $L/sf_bf16_ab_r4.log 2>&1 || echo "SF BF16 AB FAILED"

# ---- 5. SAVi AMP convergence A/B (--fp16 = trainer bf16-compute path)
timeout 3600 python -m slotformer_tpu.cli.train \
  --params experiments/synth64_savi_params.py --fp16 \
  --ckp_path experiments/out_synth64/savi_amp --auto_resume \
  --san_check_val_step 1 \
  > $L/savi_amp_ab_r4.log 2>&1 || echo "SAVI AMP AB FAILED"

# ---- 6. Physion pipeline resume (no-op when stages are marker-complete)
grep -q "PIPELINE DONE" experiments/logs/physion_synth_r4.log 2>/dev/null || \
timeout 7200 python experiments/physion_synth_pipeline.py \
  >> experiments/logs/physion_synth_r4.log 2>&1 || echo "PHYSION RESUME FAILED"

echo "R5C QUEUE DONE"

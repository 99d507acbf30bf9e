#!/bin/bash
# Round-4 follow-up queue: waits for the in-flight Physion pipeline (started
# by r5_master_queue.sh before its driver was stopped), then runs the fixed
# decoder-backward probe v2 (LICM-proof timing + full-step bf16 A/B),
# synth64 regen with tracked ckpt copies, and the reference-LR stochastic
# sweep.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=experiments/logs
echo $$ > /tmp/r5queue.pid
trap 'rm -f /tmp/r5queue.pid' EXIT

# wait for the running Physion pipeline to release the chip (max ~2.6h)
for i in $(seq 1 320); do
  pgrep -f "physion_synth_pipeline" > /dev/null || break
  sleep 30
done

exec 9>/tmp/tpu.lock
flock 9

timeout 120 python -c "import jax; print(jax.devices())" || exit 9

# ---- 1. decoder-backward probe v2 (carry-threaded, full-step bf16 A/B)
timeout 3000 python experiments/dec_bwd_probe_r4.py \
  > $L/dec_bwd_probe_r4b.log 2>&1 || echo "DEC PROBE FAILED"

# ---- 2. synth64 regen; keep the tiny ckpts in a tracked dir
timeout 10800 bash experiments/run_synth64.sh \
  > $L/run_synth64_r5.log 2>&1 || echo "SYNTH64 FAILED"
mkdir -p experiments/ckpts_r4/synth64
for m in savi sf; do
  cp experiments/out_synth64/$m/latest.ckpt.pkl \
     experiments/ckpts_r4/synth64/$m.ckpt.pkl 2>/dev/null
done

# ---- 2b. bf16 frozen-decoder convergence A/B (same slots + grafted
#          decoder as the f32 run above; compare val slot/img MSE)
timeout 3600 python -m slotformer_tpu.cli.train \
  --params experiments/synth64_sf_bf16_params.py \
  --ckp_path experiments/out_synth64/sf_bf16 --san_check_val_step 1 \
  > $L/sf_bf16_ab_r4.log 2>&1 || echo "SF BF16 AB FAILED"

# ---- 3. reference-LR stochastic sweep (51 epochs ~ 24k steps)
timeout 12600 python experiments/savi_sweep_r3.py \
  --variants sto_ref_lr1e-4 \
  > $L/savi_sweep_lr1e-4_r4.log 2>&1 || echo "SWEEP FAILED"

echo "R5B QUEUE DONE"

# ---- 4. SAVi AMP convergence A/B (appended while queue ran: bash reads
#          sequentially, appends are safe). Same params as the f32 synth64
#          SAVi, --fp16 turns on the trainer's bf16-compute path.
timeout 3600 python -m slotformer_tpu.cli.train \
  --params experiments/synth64_savi_params.py --fp16 \
  --ckp_path experiments/out_synth64/savi_amp --san_check_val_step 1 \
  > $L/savi_amp_ab_r4.log 2>&1 || echo "SAVI AMP AB FAILED"

echo "R5B QUEUE DONE (incl. appended stages)"

# ---- 5. Physion pipeline resume (no-op if it completed; stages are
#          skip-if-done with durable markers)
grep -q "PIPELINE DONE" experiments/logs/physion_synth_r4.log 2>/dev/null || \
timeout 7200 python experiments/physion_synth_pipeline.py \
  >> experiments/logs/physion_synth_r4.log 2>&1 || echo "PHYSION RESUME FAILED"

echo "R5B QUEUE DONE (all appended stages)"

# ---- 6. timed test_vp rerun with the device-resident eval loop
#         (minimal fwd payload + uint8 GT wire vs f32 A/B); val128 slots
#         must be re-extracted: the synth64 regen replaced the SAVi ckpt
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

echo "R5B QUEUE DONE (incl. test_vp timing rerun)"

# ---- 7. depth-to-space deconv A/B (SF_PHASE_DECONV=2): one s^2*co-channel
#         conv + depth_to_space instead of XLA's input-dilated lowering;
#         decision input for the default flip (committed default follows
#         the measurement)
timeout 3000 python experiments/dts_deconv_probe.py \
  > $L/dts_deconv_probe_r4.log 2>&1 || echo "DTS PROBE FAILED"

echo "R5B QUEUE DONE (incl. dts probe)"

#!/bin/bash
# Round-5 hardware queue. Order: decision-critical first (VERDICT r4 #1),
# then the stochastic reference-recipe pipeline (VERDICT r4 #7).
# Serialized on /tmp/tpu.lock; every TPU run bounded by timeout (CLAUDE.md).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=experiments/logs
EXP=experiments/out_synth64
echo $$ > /tmp/r6queue.pid
trap 'rm -f /tmp/r6queue.pid' EXIT

exec 9>/tmp/tpu.lock
flock 9

timeout 120 python -c "import jax; print(jax.devices())" || exit 9

# ---- 1. decoder-backward probe (bf16 AMP crash fixed this round): the
#         dec_recon_bf16 + SAVi-AMP speed numbers the default-flip needs
timeout 3000 python experiments/dec_bwd_probe_r4.py \
  > $L/dec_bwd_probe_r5.log 2>&1 || echo "DEC PROBE FAILED"

# ---- 2. finish the SF dec_recon_bf16 convergence A/B (at 2808/3120 steps
#         from round 4; --auto_resume picks up the latest ckpt)
timeout 3000 python -m slotformer_tpu.cli.train \
  --params experiments/synth64_sf_bf16_params.py \
  --ckp_path $EXP/sf_bf16 --auto_resume --san_check_val_step 0 \
  > $L/sf_bf16_ab_r5.log 2>&1 || echo "SF BF16 AB FAILED"

# ---- 3. stochastic reference-recipe pipeline (reuses the round-3
#         sto_ref_lr1e-4 SAVi: ARI 0.973 / FG-ARI 0.687 at 23.9k steps)
if [ ! -f $EXP/synth_slots_sto.pkl ]; then
timeout 2400 python -m slotformer_tpu.cli.extract_slots \
  --params experiments/sweep_r3/sto_ref_lr1e-4_params.py \
  --weight experiments/out_sweep_r3/sto_ref_lr1e-4/latest.ckpt.pkl \
  --save_path $EXP/synth_slots_sto.pkl \
  --batch_size 16 --chunk_len 20 \
  > $L/extract_sto_r5.log 2>&1 || echo "EXTRACT STO FAILED"
fi
timeout 5400 python -m slotformer_tpu.cli.train \
  --params experiments/synth64_sf_sto_params.py \
  --ckp_path $EXP/sf_sto --auto_resume --san_check_val_step 1 \
  > $L/sf_sto_train_r5.log 2>&1 || echo "SF STO TRAIN FAILED"
timeout 3000 python -m slotformer_tpu.cli.test_vp \
  --params experiments/synth64_sf_sto_params.py \
  --weight $EXP/sf_sto/latest.ckpt.pkl \
  --batch_size 8 --vis_dir $EXP/vis_sto \
  > $L/test_vp_sto_r5.log 2>&1 || echo "TEST_VP STO FAILED"

echo "R6 QUEUE DONE"

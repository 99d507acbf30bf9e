#!/bin/bash
# STEVE-family pipeline on the real TPU chip (synthetic 64x64 data):
# dVAE -> STEVE (frozen dVAE, dual LR) -> extract -> STEVESlotFormer
# (frozen dVAE + token-decoder grafts, token-CE img recon) -> rollout.
set -e
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
EXP=experiments/out_steve64
mkdir -p $EXP
python -m slotformer_tpu.cli.train --params experiments/synth64_dvae_params.py \
    --ckp_path $EXP/dvae --san_check_val_step 1 2>&1 | tail -20
python -m slotformer_tpu.cli.train --params experiments/synth64_steve_params.py \
    --ckp_path $EXP/steve --san_check_val_step 1 2>&1 | tail -30
python -m slotformer_tpu.cli.extract_slots --params experiments/synth64_steve_params.py \
    --weight $EXP/steve/latest.ckpt.pkl --save_path $EXP/steve_slots.pkl \
    --batch_size 8 --chunk_len 20
python -m slotformer_tpu.cli.train --params experiments/synth64_ssf_params.py \
    --ckp_path $EXP/ssf --san_check_val_step 1 2>&1 | tail -30
python -m slotformer_tpu.cli.rollout_slots --task synthetic \
    --params experiments/synth64_ssf_params.py --weight $EXP/ssf/latest.ckpt.pkl \
    --save_path $EXP/rollout_slots.pkl --batch_size 8 \
    --obs_frames 10 --target_len 20
echo "[run_steve_synth] done"

#!/bin/bash
# Full-pipeline convergence run on the real TPU chip (synthetic 64x64 data).
set -e
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
EXP=experiments/out_synth64
mkdir -p $EXP
# --auto_resume makes re-invocations (queue retries, watchdog restarts)
# no-ops once each stage hit its step budget, instead of retraining
python -m slotformer_tpu.cli.train --params experiments/synth64_savi_params.py \
    --ckp_path $EXP/savi --auto_resume --san_check_val_step 1 2>&1 | tail -40
if [ ! -f $EXP/synth_slots.pkl ] || \
   [ $EXP/savi/latest.ckpt.pkl -nt $EXP/synth_slots.pkl ]; then
python -m slotformer_tpu.cli.extract_slots --params experiments/synth64_savi_params.py \
    --weight $EXP/savi/latest.ckpt.pkl --save_path $EXP/synth_slots.pkl \
    --batch_size 16 --chunk_len 20
fi
python -m slotformer_tpu.cli.train --params experiments/synth64_sf_params.py \
    --ckp_path $EXP/sf --auto_resume --san_check_val_step 1 2>&1 | tail -30
python -m slotformer_tpu.cli.test_vp --params experiments/synth64_sf_params.py \
    --weight $EXP/sf/latest.ckpt.pkl --batch_size 8 --vis_dir $EXP/vis

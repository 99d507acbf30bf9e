#!/bin/bash
# Round-5 follow-up 2: finish the sto-pipeline SF train (auto_resume no-op
# when complete) and run its test_vp; waits on the chip lock behind r6/r6b.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=experiments/logs
EXP=experiments/out_synth64
echo $$ > /tmp/r6cqueue.pid
trap 'rm -f /tmp/r6cqueue.pid' EXIT
exec 9>/tmp/tpu.lock
flock 9
timeout 120 python -c "import jax; print(jax.devices())" || exit 9
timeout 5400 python -m slotformer_tpu.cli.train \
  --params experiments/synth64_sf_sto_params.py \
  --ckp_path $EXP/sf_sto --auto_resume --san_check_val_step 0 \
  >> $L/sf_sto_train_r5.log 2>&1 || echo "SF STO RESUME FAILED"
timeout 3000 python -m slotformer_tpu.cli.test_vp \
  --params experiments/synth64_sf_sto_params.py \
  --weight $EXP/sf_sto/latest.ckpt.pkl \
  --batch_size 8 --vis_dir $EXP/vis_sto \
  > $L/test_vp_sto_r5.log 2>&1 || echo "TEST_VP STO FAILED"
echo "R6C QUEUE DONE"

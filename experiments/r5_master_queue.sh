#!/bin/bash
# Round-4 (build round 4, files suffixed r5 to not clobber the r4 logs the
# round-3 queue already produced) master hardware queue.
#
# Order = evidence-per-minute, front-loaded against tunnel outages:
#   1. decoder-backward probe (VERDICT r3 #7) — short; also captures a
#      jax.profiler trace of the SlotFormer train step
#   2. PHYRE pipeline rerun (VERDICT r3 #4) — the r4 run trained every
#      stage and died only at the abs fold assert, now relative+warn
#   3. Physion synthetic pipeline (VERDICT r3 #10) — never yet executed
#   4. synth64 regen (VERDICT r3 #9) + ckpt copy into a tracked dir so
#      hardware evidence survives round boundaries
#   5. reference-LR (1e-4) stochastic StoSAVi sweep (VERDICT r3 #8)
#
# Serialized against any other TPU user via flock on /tmp/tpu.lock
# (single-client tunnel: concurrent clients have wedged it for 30+ min).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=experiments/logs
echo $$ > /tmp/r5queue.pid
trap 'rm -f /tmp/r5queue.pid' EXIT

exec 9>/tmp/tpu.lock
flock 9

timeout 120 python -c "import jax; print(jax.devices())" || exit 9

# ---- 1. decoder-backward probe + profile trace
SF_TRACE_DIR=$L/trace_sf_train_r4 timeout 2700 \
  python experiments/dec_bwd_probe_r4.py \
  > $L/dec_bwd_probe_r4.log 2>&1 || echo "DEC PROBE FAILED"

# ---- 2. PHYRE fake-sim pipeline -> AUCCESS (relative fold check landed)
rm -rf experiments/out_phyre_fake
timeout 5400 python experiments/phyre_fake_pipeline.py \
  > $L/phyre_fake_r5.log 2>&1 || echo "PHYRE FAILED"

# ---- 3. Physion synthetic pipeline (dVAE -> STEVE -> SF -> readout)
timeout 9000 python experiments/physion_synth_pipeline.py \
  > $L/physion_synth_r4.log 2>&1 || echo "PHYSION FAILED"

# ---- 4. synth64 regen; keep the tiny ckpts in a tracked dir
timeout 10800 bash experiments/run_synth64.sh \
  > $L/run_synth64_r5.log 2>&1 || echo "SYNTH64 FAILED"
mkdir -p experiments/ckpts_r4/synth64
for m in savi sf; do
  cp experiments/out_synth64/$m/latest.ckpt.pkl \
     experiments/ckpts_r4/synth64/$m.ckpt.pkl 2>/dev/null
done
cp experiments/out_phyre_fake/ckpts/savi_phyre_fake/latest.ckpt.pkl \
   experiments/ckpts_r4/phyre_savi.ckpt.pkl 2>/dev/null
cp experiments/out_phyre_fake/ckpts/sf_phyre_fake/latest.ckpt.pkl \
   experiments/ckpts_r4/phyre_sf.ckpt.pkl 2>/dev/null
cp experiments/out_phyre_fake/ckpts/readout_phyre_fake/latest_folded.ckpt.pkl \
   experiments/ckpts_r4/phyre_readout_folded.ckpt.pkl 2>/dev/null

# ---- 5. reference-LR stochastic sweep (51 epochs ~ 24k steps)
timeout 12600 python experiments/savi_sweep_r3.py \
  --variants sto_ref_lr1e-4 \
  > $L/savi_sweep_lr1e-4_r4.log 2>&1 || echo "SWEEP FAILED"

echo "QUEUE DONE"

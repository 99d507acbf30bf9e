#!/bin/bash
# Round-4 master hardware queue (tunnel back up 2026-08-18).
#
# Order = evidence-per-minute: (1) re-probe the phase-deconv custom_vjp
# routing (decides SF_PHASE_DECONV for the rest of the queue), (2) PHYRE
# pipeline rerun — the r3b run trained every stage and died only at the
# fold-verification assert, fixed by the f32 in_proj pin in
# models/readout.py, (3) synth64 regen (ckpts don't survive rounds),
# (4) timed 128-video test_vp (VERDICT r2 #6), (5) Aloe VQA on rolled-out
# slots (VERDICT r2 #5a), (6) bench smoke.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=experiments/logs

timeout 120 python -c "import jax; print(jax.devices())" || exit 9

# ---- 1. phase-deconv A/B with the custom_vjp (phase fwd / dense bwd) routing
timeout 2400 python experiments/phase_deconv_probe.py \
  > $L/phase_deconv_probe_vjp.log 2>&1 || echo "PROBE FAILED"
SF_PHASE_DECONV=$(python - <<'EOF'
import json
try:
    lines = [l for l in open("experiments/logs/phase_deconv_probe_vjp.log")
             if l.startswith("{")]
    d = json.loads(lines[-1])
    ok = (d.get("savi_train_speedup", 0) >= 0.97
          and d.get("sf_train_speedup", 0) >= 0.97
          and d.get("decode_fwd_speedup", 0) >= 1.0)
    print(1 if ok else 0)
except Exception:
    print(0)
EOF
)
export SF_PHASE_DECONV
echo "queue: SF_PHASE_DECONV=$SF_PHASE_DECONV for remaining stages"

# ---- 2. PHYRE fake-sim pipeline end to end (f32 in_proj fold fix landed)
rm -rf experiments/out_phyre_fake
timeout 4500 python experiments/phyre_fake_pipeline.py \
  > $L/phyre_fake_r4.log 2>&1 || echo "PHYRE FAILED"

# ---- 3. synth64 regen (SAVi -> extract -> SF -> test_vp vis)
timeout 9000 bash experiments/run_synth64.sh \
  > $L/run_synth64_r4.log 2>&1 || echo "SYNTH64 FAILED"

# ---- 4. val-128 extraction + timed test_vp (VERDICT r2 #6)
if [ ! -f experiments/out_synth64/synth_slots_val128.pkl ]; then
  timeout 1800 python -m slotformer_tpu.cli.extract_slots \
    --params experiments/synth64_savi_val128_params.py \
    --weight experiments/out_synth64/savi/latest.ckpt.pkl \
    --save_path experiments/out_synth64/synth_slots_val128.pkl \
    --batch_size 16 --chunk_len 20 --subset val \
    > $L/extract_val128_r4.log 2>&1 || echo "EXTRACT FAILED"
fi
timeout 3000 python -m slotformer_tpu.cli.test_vp \
  --params experiments/synth64_sf_eval128_params.py \
  --weight experiments/out_synth64/sf/latest.ckpt.pkl \
  --batch_size 8 --vis_dir experiments/out_synth64/vis_r4 \
  > $L/test_vp_timing_r4.log 2>&1 || echo "TEST_VP FAILED"

# ---- 5. Aloe VQA on rolled-out slots (VERDICT r2 #5a)
timeout 3600 python experiments/synth_vqa_aloe.py 20 \
  > $L/synth_vqa_aloe_r4.log 2>&1 || echo "ALOE FAILED"

# ---- 6. bench smoke (driver runs the real one at round end)
timeout 4200 python bench.py > $L/bench_r4_smoke.log 2>&1 || echo "BENCH FAILED"

echo "QUEUE DONE"

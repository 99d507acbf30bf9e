"""Stochastic-pipeline SlotFormer (VERDICT r4 #7): identical to
synth64_sf_params but trained on slots extracted by the STOCHASTIC
reference-recipe StoSAVi (kld var-0.01, lr 1e-4 — the reference's exact
hyperparameters, sweep_r3/sto_ref_lr1e-4_params.py) and decoding through
that run's checkpoint. Makes the flagship pipeline evidence use the
reference recipe end-to-end instead of the deterministic lr-4e-4
workaround."""

from experiments.synth64_sf_params import SlotFormerParams as _Det


class SlotFormerParams(_Det):
    slots_root = 'experiments/out_synth64/synth_slots_sto.pkl'
    dec_dict = dict(dec_channels=(128, 64, 64, 64, 64), dec_resolution=(8, 8),
                    dec_ks=5, dec_norm='',
                    dec_ckp_path='experiments/out_sweep_r3/sto_ref_lr1e-4/latest.ckpt.pkl')

"""bf16 frozen-decoder convergence A/B: identical to synth64_sf_params
except loss_dict.dec_recon_bf16=True — decides whether the bf16 img-recon
decode (probe-measured speedup) can become the SlotFormer default without
hurting convergence. Compare final val slot/img MSE vs the f32 twin
trained in the same synth64 regen."""

from experiments.synth64_sf_params import SlotFormerParams as _F32


class SlotFormerParams(_F32):
    loss_dict = dict(rollout_len=10, use_img_recon_loss=True,
                     dec_recon_bf16=True)

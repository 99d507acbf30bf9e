#!/usr/bin/env python
"""Generate model-level golden fixtures by RUNNING the reference torch code.

Loads the reference's actual model modules from /root/reference (read-only;
executed, never copied) with a minimal in-memory ``nerv`` stub, seeds their
weights, runs forward passes, and records {state_dict, inputs, outputs} into
``model_goldens.npz``. ``tests/test_golden_parity.py`` then asserts the flax
models reproduce the outputs bit-tightly after converting the weights with
``slotformer_tpu.runtime.torch_compat`` — numerical parity evidence per
SURVEY.md §4.

Components:
  g_sa      SlotAttention.forward, 2 iterations       (savi.py:16-110)
  g_tp      TransformerPredictor.forward              (predictor.py:20-44)
  g_mlp     ResidualMLPPredictor.forward              (predictor.py:47-73)
  g_kd      kernel_dist_layer + _sample_dist, fixed eps (savi.py:190-200,355-365)
  g_roll    SlotRollouter.forward, pred_len=3         (slotformer.py:48-134)
  g_ssroll  SingleStepSlotRollouter iterative-overlap  (single_step_slotformer.py)
  g_steve   STEVETransformerDecoder fwd + greedy generate (steve_transformer.py)
  g_dvae    dVAE encode logits / token ids / detokenize (dVAE.py:12-100)
  g_savi    StoSAVi.encode, T=4 video, RNN predictor  (savi.py:367-415)
  g_aloe    CLEVRERTransformerModel cls+mc forward    (clevrer_vqa/models/transformer.py)

Run from the repo root:  python tests/golden/gen_model_goldens.py
(needs /root/reference checked out; the committed .npz does not)
"""

import importlib.util
import os
import sys
import types

import numpy as np
import torch
from torch import nn

HERE = os.path.dirname(os.path.abspath(__file__))
REF = os.environ.get("SLOTFORMER_REF", "/root/reference")


# --------------------------------------------------------------- nerv stub
def _install_nerv_stub():
    """The reference imports the external `nerv` runtime; its model files only
    need BaseModel (an nn.Module) and the conv builders. Builders follow
    nerv's documented surface: Sequential(Conv, [norm], [act])."""
    nerv = types.ModuleType("nerv")
    training = types.ModuleType("nerv.training")
    training.BaseModel = nn.Module
    models = types.ModuleType("nerv.models")

    def conv_norm_act(in_ch, out_ch, kernel_size=3, stride=1, norm="", act="relu"):
        layers = [
            nn.Conv2d(in_ch, out_ch, kernel_size, stride, padding=kernel_size // 2)
        ]
        assert norm in ("", None), "goldens only use norm=''"
        if act == "relu":
            layers.append(nn.ReLU())
        else:
            assert act in ("", None)
        return nn.Sequential(*layers)

    def deconv_norm_act(in_ch, out_ch, kernel_size=3, stride=1, norm="", act="relu"):
        layers = [
            nn.ConvTranspose2d(
                in_ch, out_ch, kernel_size, stride,
                padding=kernel_size // 2, output_padding=stride - 1,
            )
        ]
        assert norm in ("", None)
        if act == "relu":
            layers.append(nn.ReLU())
        else:
            assert act in ("", None)
        return nn.Sequential(*layers)

    def deconv_out_shape(in_size, stride, padding, kernel_size, out_padding):
        return (in_size - 1) * stride - 2 * padding + kernel_size + out_padding

    models.conv_norm_act = conv_norm_act
    models.deconv_norm_act = deconv_norm_act
    models.deconv_out_shape = deconv_out_shape

    # nerv.utils helpers the VQA transformer imports
    # (clevrer_vqa/models/transformer.py:5): concat a fixed tag vector onto
    # the last dim / gather one row per batch element.
    utils = types.ModuleType("nerv.utils")

    def batch_cat_vec(x, vec, dim=-1):
        assert dim == -1, "reference only uses dim=-1"
        v = vec.view(*([1] * (x.dim() - 1)), -1)
        v = v.expand(*x.shape[:-1], vec.shape[0])
        return torch.cat([x, v], dim=-1)

    def batch_gather(x, idx):
        return x[torch.arange(x.shape[0], device=x.device), idx.long()]

    utils.batch_cat_vec = batch_cat_vec
    utils.batch_gather = batch_gather

    nerv.training = training
    nerv.models = models
    nerv.utils = utils
    sys.modules["nerv"] = nerv
    sys.modules["nerv.training"] = training
    sys.modules["nerv.models"] = models
    sys.modules["nerv.utils"] = utils


def _load(name, relpath, pkg_dir):
    """Import a reference module file under a synthetic package so its
    relative imports resolve, without executing package __init__ files."""
    pkg_name = name.rsplit(".", 1)[0]
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [pkg_dir]
        sys.modules[pkg_name] = pkg
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _sd_np(module):
    return {k: v.detach().numpy().copy() for k, v in module.state_dict().items()}


def _pack(store, tag, sd, inputs, outputs):
    for k, v in sd.items():
        store[f"{tag}/sd/{k}"] = v
    for k, v in inputs.items():
        store[f"{tag}/in/{k}"] = v
    for k, v in outputs.items():
        store[f"{tag}/out/{k}"] = v


def main() -> None:
    _install_nerv_stub()
    base_dir = os.path.join(REF, "slotformer/base_slots/models")
    vp_dir = os.path.join(REF, "slotformer/video_prediction/models")
    savi_mod = _load("refbase.savi", "slotformer/base_slots/models/savi.py", base_dir)
    pred_mod = sys.modules["refbase.predictor"]
    stt_mod = _load(
        "refbase.steve_transformer",
        "slotformer/base_slots/models/steve_transformer.py",
        base_dir,
    )
    # vp/slotformer.py imports `from slotformer.base_slots.models import StoSAVi`
    shim = types.ModuleType("slotformer.base_slots.models")
    shim.StoSAVi = savi_mod.StoSAVi
    sys.modules["slotformer"] = types.ModuleType("slotformer")
    sys.modules["slotformer.base_slots"] = types.ModuleType("slotformer.base_slots")
    sys.modules["slotformer.base_slots.models"] = shim
    sf_mod = _load(
        "refvp.slotformer", "slotformer/video_prediction/models/slotformer.py", vp_dir
    )

    store = {}
    rng = np.random.RandomState(0)

    # ---- g_sa: SlotAttention, 2 iterations
    torch.manual_seed(1)
    sa = savi_mod.SlotAttention(
        in_features=12, num_iterations=2, num_slots=4, slot_size=16,
        mlp_hidden_size=32,
    ).eval()
    with torch.no_grad():
        inputs = rng.randn(2, 20, 12).astype(np.float32)
        slots0 = rng.randn(2, 4, 16).astype(np.float32)
        out = sa(torch.from_numpy(inputs), torch.from_numpy(slots0))
    _pack(store, "g_sa", _sd_np(sa), {"inputs": inputs, "slots": slots0},
          {"slots": out.numpy()})

    # ---- g_tp: TransformerPredictor
    torch.manual_seed(2)
    tp = pred_mod.TransformerPredictor(
        d_model=16, num_layers=2, num_heads=4, ffn_dim=32, norm_first=True
    ).eval()
    with torch.no_grad():
        x = rng.randn(2, 5, 16).astype(np.float32)
        out = tp(torch.from_numpy(x))
    _pack(store, "g_tp", _sd_np(tp), {"x": x}, {"out": out.numpy()})

    # ---- g_mlp: ResidualMLPPredictor
    torch.manual_seed(3)
    mp = pred_mod.ResidualMLPPredictor([16, 32, 16], norm_first=True).eval()
    with torch.no_grad():
        x = rng.randn(2, 5, 16).astype(np.float32)
        out = mp(torch.from_numpy(x))
    _pack(store, "g_mlp", _sd_np(mp), {"x": x}, {"out": out.numpy()})

    # ---- g_kd: kernel-dist head + sampling with fixed noise
    torch.manual_seed(4)
    D = 16
    kd = nn.Sequential(
        nn.Linear(D, D * 2), nn.LayerNorm(D * 2), nn.ReLU(), nn.Linear(D * 2, D * 2)
    ).eval()  # structure: savi.py:191-197 (kernel_mlp=True)
    with torch.no_grad():
        x = rng.randn(2, 4, D).astype(np.float32)
        eps = rng.randn(2, 4, D).astype(np.float32)
        dist = kd(torch.from_numpy(x))
        mu, log_var = dist[..., :D], dist[..., D:]
        kernels = mu + torch.from_numpy(eps) * torch.exp(log_var * 0.5)
    _pack(store, "g_kd", _sd_np(kd), {"x": x, "eps": eps},
          {"dist": dist.numpy(), "kernels": kernels.numpy()})

    # ---- g_roll: SlotRollouter, pred_len=3
    torch.manual_seed(5)
    roll = sf_mod.SlotRollouter(
        num_slots=3, slot_size=8, history_len=4, t_pe="sin", slots_pe="",
        d_model=16, num_layers=2, num_heads=2, ffn_dim=32, norm_first=True,
    ).eval()
    with torch.no_grad():
        x = rng.randn(2, 4, 3, 8).astype(np.float32)
        out = roll(torch.from_numpy(x), pred_len=3)
    _pack(store, "g_roll", _sd_np(roll), {"x": x}, {"pred": out.numpy()})

    # ---- g_ssroll: SingleStepSlotRollouter — iterative-overlap rollout
    # (growing context 1 -> cond_len, then sliding); pred_len exercises both
    sss_mod = _load(
        "refvp.single_step_slotformer",
        "slotformer/video_prediction/models/single_step_slotformer.py",
        vp_dir,
    )
    torch.manual_seed(9)
    ss = sss_mod.SingleStepSlotRollouter(
        num_slots=3, slot_size=8, history_len=1, cond_len=4, t_pe="sin",
        slots_pe="", d_model=16, num_layers=2, num_heads=2, ffn_dim=32,
        norm_first=True,
    ).eval()
    with torch.no_grad():
        x = rng.randn(2, 1, 3, 8).astype(np.float32)
        out = ss(torch.from_numpy(x), pred_len=6)
    _pack(store, "g_ssroll", _sd_np(ss), {"x": x}, {"pred": out.numpy()})

    # ---- g_steve: STEVE transformer decoder, teacher-forced + greedy generate
    torch.manual_seed(6)
    steve = stt_mod.STEVETransformerDecoder(
        vocab_size=12, d_model=16, n_head=2, max_len=15, num_slots=3,
        num_layers=2, dropout=0.1,
    ).eval()
    with torch.no_grad():
        slots = rng.randn(2, 3, 16).astype(np.float32)
        idx = rng.randint(0, 12, size=(2, 10)).astype(np.int64)
        logits = steve(torch.from_numpy(slots), torch.from_numpy(idx))
        gen_ids, gen_logits = steve.generate(
            torch.from_numpy(slots), steps=6, sample=False
        )
    _pack(
        store, "g_steve", _sd_np(steve), {"slots": slots, "idx": idx},
        {"logits": logits.numpy(), "gen_ids": gen_ids.numpy(),
         "gen_logits": gen_logits.numpy()},
    )

    # ---- g_dvae: tokenizer encode logits + detokenize (deterministic paths;
    # gumbel sampling uses framework-specific noise and is excluded)
    dvae_mod = _load("refbase.dVAE", "slotformer/base_slots/models/dVAE.py",
                     base_dir)
    torch.manual_seed(8)
    dv = dvae_mod.dVAE(vocab_size=16, img_channels=3).eval()
    with torch.no_grad():
        img = rng.uniform(-1, 1, size=(2, 3, 16, 16)).astype(np.float32)
        logits = dv.encoder(torch.from_numpy(img))
        token_ids = dv.tokenize(torch.from_numpy(img), one_hot=False)
        z = rng.uniform(0, 1, size=(2, 16, 4, 4)).astype(np.float32)
        z = z / z.sum(1, keepdims=True)
        recon = dv.detokenize(torch.from_numpy(z))
    _pack(
        store, "g_dvae", _sd_np(dv), {"img": img, "z": z},
        {"logits": logits.numpy(), "token_ids": token_ids.numpy(),
         "recon": recon.numpy()},
    )

    # ---- g_savi: StoSAVi.encode on a T=4 video (deterministic, RNN predictor)
    torch.manual_seed(7)
    savi = savi_mod.StoSAVi(
        resolution=(64, 64),
        clip_len=4,
        slot_dict=dict(
            num_slots=4, slot_size=16, slot_mlp_size=32, num_iterations=2,
            kernel_mlp=True,
        ),
        enc_dict=dict(
            enc_channels=(3, 8, 8), enc_ks=5, enc_norm="", enc_out_channels=16
        ),
        dec_dict=dict(
            dec_channels=(16, 8, 8), dec_resolution=(16, 16), dec_ks=5, dec_norm=""
        ),
        pred_dict=dict(
            pred_type="transformer", pred_rnn=True, pred_norm_first=True,
            pred_num_layers=1, pred_num_heads=4, pred_ffn_dim=32,
            pred_sg_every=None,
        ),
        loss_dict=dict(use_post_recon_loss=True, kld_method="none"),
    ).eval()
    with torch.no_grad():
        img = rng.uniform(-1, 1, size=(2, 4, 3, 64, 64)).astype(np.float32)
        savi._reset_rnn()
        kernel_dist, post_slots, encoder_out = savi.encode(torch.from_numpy(img))
        # decode path too: the spatial-broadcast decoder (savi.py:504-525)
        dec_slots = rng.randn(3, 4, 16).astype(np.float32)
        recon_combined, recons, masks, _ = savi.decode(
            torch.from_numpy(dec_slots))
    _pack(
        store, "g_savi", _sd_np(savi), {"img": img, "dec_slots": dec_slots},
        {"kernel_dist": kernel_dist.numpy(), "post_slots": post_slots.numpy(),
         "encoder_out": encoder_out.numpy(),
         "recon_combined": recon_combined.numpy(), "recons": recons.numpy(),
         "masks": masks.numpy()},
    )

    # ---- g_stevefull: reference STEVE.encode (deterministic SA cell, no
    # kernel head; predictor seeds each frame's latents from prev slots)
    steve_mod = _load(
        "refbase.steve", "slotformer/base_slots/models/steve.py", base_dir
    )
    import tempfile

    torch.manual_seed(13)
    dvae_for_steve = dvae_mod.dVAE(vocab_size=16, img_channels=3)
    dvae_ckp = os.path.join(tempfile.mkdtemp(), "dvae.pth")
    torch.save({"state_dict": dvae_for_steve.state_dict()}, dvae_ckp)
    torch.manual_seed(12)
    steve = steve_mod.STEVE(
        resolution=(64, 64),
        clip_len=2,
        slot_dict=dict(num_slots=3, slot_size=16, slot_mlp_size=32,
                       num_iterations=2),
        dvae_dict=dict(down_factor=4, vocab_size=16, dvae_ckp_path=dvae_ckp),
        enc_dict=dict(enc_channels=(3, 8, 8), enc_ks=5, enc_norm="",
                      enc_out_channels=16),
        dec_dict=dict(dec_num_layers=1, dec_num_heads=2, dec_d_model=16),
        pred_dict=dict(pred_type="transformer", pred_rnn=True,
                       pred_norm_first=True, pred_num_layers=1,
                       pred_num_heads=2, pred_ffn_dim=32, pred_sg_every=None),
        loss_dict=dict(use_img_recon_loss=False),
    ).eval()
    with torch.no_grad():
        img = rng.uniform(-1, 1, size=(2, 2, 3, 64, 64)).astype(np.float32)
        steve._reset_rnn()
        slots, masks, encoder_out = steve.encode(torch.from_numpy(img))
    _pack(
        store, "g_stevefull", _sd_np(steve), {"img": img},
        {"slots": slots.numpy(), "masks": masks.numpy(),
         "encoder_out": encoder_out.numpy()},
    )

    # ---- g_stevesf: reference STEVESlotFormer — full-model key mapping
    # (rollouter + frozen dvae + `decoder`-named token decoder) + rollout
    steve_ckp = os.path.join(tempfile.mkdtemp(), "steve.pth")
    torch.save({"state_dict": steve.state_dict()}, steve_ckp)
    shim = sys.modules["slotformer.base_slots.models"]
    shim.STEVE = steve_mod.STEVE
    shim.gumbel_softmax = sys.modules["refbase.steve_utils"].gumbel_softmax
    shim.make_one_hot = sys.modules["refbase.steve_utils"].make_one_hot
    ssf_mod = _load(
        "refvp.steve_slotformer",
        "slotformer/video_prediction/models/steve_slotformer.py", vp_dir,
    )
    torch.manual_seed(14)
    ssf = ssf_mod.STEVESlotFormer(
        resolution=(64, 64),
        clip_len=2,
        slot_dict=dict(num_slots=3, slot_size=16),
        dvae_dict=dict(down_factor=4, vocab_size=16, dvae_ckp_path=dvae_ckp),
        dec_dict=dict(dec_num_layers=1, dec_num_heads=2, dec_d_model=16,
                      dec_ckp_path=steve_ckp),
        rollout_dict=dict(num_slots=3, slot_size=16, history_len=2, t_pe="sin",
                          slots_pe="", d_model=16, num_layers=1, num_heads=2,
                          ffn_dim=32, norm_first=True),
        loss_dict=dict(rollout_len=3, use_img_recon_loss=False),
    ).eval()
    with torch.no_grad():
        past = rng.randn(2, 2, 3, 16).astype(np.float32)
        pred = ssf.rollout(torch.from_numpy(past), pred_len=3)
    _pack(store, "g_stevesf", _sd_np(ssf), {"past": past},
          {"pred": pred.numpy()})

    # ---- g_physro: PhysionReadout — C(N,2) pairs -> agg -> max over time
    ro_mod = _load(
        "refphys.readout", "slotformer/physion_vqa/models/readout.py",
        os.path.join(REF, "slotformer/physion_vqa/models"),
    )
    torch.manual_seed(10)
    physro = ro_mod.PhysionReadout(
        readout_dict=dict(num_slots=5, slot_size=16, agg_func="max",
                          feats_dim=24)
    ).eval()
    with torch.no_grad():
        slots = rng.randn(3, 4, 5, 16).astype(np.float32)
        out = physro({"slots": torch.from_numpy(slots)})
    _pack(store, "g_physro", _sd_np(physro), {"slots": slots},
          {"logits": out["logits"].numpy()})

    # ---- g_phyrero: PHYREReadout — CLS + temporal-PE transformer readout
    # (its `from nerv.models.transformer import build_pos_enc` resolves to
    # the identical in-reference impl at vp/slotformer.py:19-33)
    trans_stub = types.ModuleType("nerv.models.transformer")
    trans_stub.build_pos_enc = sf_mod.build_pos_enc
    sys.modules["nerv.models.transformer"] = trans_stub
    sys.modules["nerv.models"].transformer = trans_stub
    pr_mod = _load(
        "refphyre.readout", "slotformer/phyre_planning/models/readout.py",
        os.path.join(REF, "slotformer/phyre_planning/models"),
    )
    torch.manual_seed(11)
    phyrero = pr_mod.PHYREReadout(
        readout_dict=dict(num_slots=3, slot_size=8, t_pe="sin", d_model=16,
                          num_layers=2, num_heads=2, ffn_dim=32,
                          norm_first=True, sel_slots=[0, 2, 3]),
    ).eval()
    with torch.no_grad():
        slots = rng.randn(2, 5, 3, 8).astype(np.float32)
        out = phyrero({"slots": torch.from_numpy(slots)})
    _pack(store, "g_phyrero", _sd_np(phyrero), {"slots": slots},
          {"logits": out["logits"].numpy()})

    # ---- g_aloe: CLEVRER VQA transformer (Aloe) — cls + mc forward.
    # nerv's build_transformer_encoder surface: learnable/sin PE (built by
    # build_pos_enc, registered as attribute ``pos_enc``) added to the input,
    # then a standard torch nn.TransformerEncoder (batch_first, pre-LN when
    # norm_first, final LN only when norm_last) — exactly what the reference
    # configures with norm_last=False (clevrer_vqa/models/transformer.py:23-32).
    def build_transformer_encoder(input_len, pos_enc, d_model, num_heads,
                                  ffn_dim, num_layers, norm_first=True,
                                  norm_last=True):
        class _Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.pos_enc = sf_mod.build_pos_enc(pos_enc, input_len, d_model)
                layer = nn.TransformerEncoderLayer(
                    d_model, num_heads, dim_feedforward=ffn_dim, dropout=0.1,
                    norm_first=norm_first, batch_first=True,
                )
                self.transformer_encoder = nn.TransformerEncoder(
                    layer, num_layers,
                    norm=nn.LayerNorm(d_model) if norm_last else None,
                )

            def forward(self, x, src_key_padding_mask=None):
                if self.pos_enc is not None:
                    x = x + self.pos_enc
                return self.transformer_encoder(
                    x, src_key_padding_mask=src_key_padding_mask)

        return _Enc()

    trans_stub.build_transformer_encoder = build_transformer_encoder
    vqa_mod = _load(
        "refvqa.transformer", "slotformer/clevrer_vqa/models/transformer.py",
        os.path.join(REF, "slotformer/clevrer_vqa/models"),
    )
    torch.manual_seed(15)
    T, N, QL, CL = 2, 3, 4, 3
    L = QL + CL
    aloe = vqa_mod.CLEVRERTransformerModel(
        transformer_dict=dict(
            input_len=T * N + L, input_dim=16, pos_enc="learnable",
            num_layers=2, num_heads=2, ffn_dim=32, norm_first=True,
            cls_mlp_size=8,
        ),
        lang_dict=dict(question_len=QL, question_vocab_size=20,
                       answer_vocab_size=5),
        vision_dict=dict(vision_dim=16),
        loss_dict=dict(use_mask_obj_loss=False),
    ).eval()
    with torch.no_grad():
        # CLS and the learnable PE are zero-init; randomize so the golden
        # actually exercises their conversion paths
        aloe.CLS.normal_(std=0.5)
        aloe.transformer_encoder.pos_enc.normal_(std=0.5)
        cls_v = rng.randn(2, T, N, 16).astype(np.float32)
        cls_q = rng.randint(0, 20, size=(2, L)).astype(np.int64)
        cls_pad = np.zeros((2, L), bool)
        cls_pad[:, QL + 1:] = True  # cls rows: (most of) choice part padded
        mc_v = rng.randn(2, T, N, 16).astype(np.float32)
        mc_q = rng.randint(0, 20, size=(3, L)).astype(np.int64)
        mc_pad = np.zeros((3, L), bool)
        mc_pad[0, L - 1:] = True
        mc_flag = np.array([0, 1, 1], np.int64)
        out = aloe({
            "cls_video_emb": torch.from_numpy(cls_v),
            "cls_q_tokens": torch.from_numpy(cls_q),
            "cls_q_pad_mask": torch.from_numpy(cls_pad),
            "mc_video_emb": torch.from_numpy(mc_v),
            "mc_q_tokens": torch.from_numpy(mc_q),
            "mc_q_pad_mask": torch.from_numpy(mc_pad),
            "mc_flag": torch.from_numpy(mc_flag),
        })
    _pack(
        store, "g_aloe", _sd_np(aloe),
        {"cls_video_emb": cls_v, "cls_q_tokens": cls_q,
         "cls_q_pad_mask": cls_pad, "mc_video_emb": mc_v, "mc_q_tokens": mc_q,
         "mc_q_pad_mask": mc_pad, "mc_flag": mc_flag},
        {"cls_logits": out["cls_answer_logits"].numpy(),
         "mc_logits": out["mc_answer_logits"].numpy()},
    )

    # ---- g_savitraj: 20-step noise-matched Adam TRAINING trajectory of the
    # stochastic StoSAVi recipe (kld_method='var-0.01', reference loss
    # weights kld_loss_w=1e-4 — stosavi_clevrer_params.py:17,79). Pins the
    # KLD weighting and sampling scale over actual optimization, not just a
    # single forward. The MLP predictor is used because it is dropout-free
    # (noise matching across frameworks would otherwise need matched
    # dropout masks); the kernel-sampling eps is prescribed per (step, t).
    torch.manual_seed(16)
    traj = savi_mod.StoSAVi(
        resolution=(64, 64),  # reference hardcodes 64x64 visual resolution
        clip_len=3,
        slot_dict=dict(num_slots=3, slot_size=16, slot_mlp_size=32,
                       num_iterations=2, kernel_mlp=True),
        enc_dict=dict(enc_channels=(3, 8), enc_ks=3, enc_norm="",
                      enc_out_channels=16),
        dec_dict=dict(dec_channels=(16, 8, 8), dec_resolution=(16, 16),
                      dec_ks=3, dec_norm=""),
        pred_dict=dict(pred_type="mlp", pred_rnn=False, pred_norm_first=True,
                       pred_num_layers=1, pred_num_heads=4, pred_ffn_dim=32,
                       pred_sg_every=None),
        loss_dict=dict(use_post_recon_loss=True, kld_method="var-0.01"),
    ).train()
    sd0 = _sd_np(traj)
    N_STEPS, TB, TT, TS, TD = 20, 2, 3, 3, 16
    img = rng.uniform(-1, 1, size=(TB, TT, 3, 64, 64)).astype(np.float32)
    eps_all = rng.randn(N_STEPS, TT, TB, TS, TD).astype(np.float32)
    qi = {"i": 0}

    def fixed_sample(dist):
        mu, log_var = dist[..., :TD], dist[..., TD:]
        s_i, t_i = divmod(qi["i"], TT)
        qi["i"] += 1
        e = torch.from_numpy(eps_all[s_i, t_i])
        return mu + e * torch.exp(log_var * 0.5)

    traj._sample_dist = fixed_sample  # instance attr shadows the method
    opt = torch.optim.Adam(traj.parameters(), lr=3e-4)
    kld_w = 1e-4
    timg = torch.from_numpy(img)
    kld_losses, recon_losses = [], []
    for _ in range(N_STEPS):
        out = traj({"img": timg})
        loss_dict = traj.calc_train_loss({"img": timg}, out)
        loss = loss_dict["post_recon_loss"] + kld_w * loss_dict["kld_loss"]
        opt.zero_grad()
        loss.backward()
        opt.step()
        kld_losses.append(float(loss_dict["kld_loss"]))
        recon_losses.append(float(loss_dict["post_recon_loss"]))
    assert qi["i"] == N_STEPS * TT
    _pack(
        store, "g_savitraj", sd0, {"img": img, "eps": eps_all},
        {"kld": np.array(kld_losses, np.float32),
         "recon": np.array(recon_losses, np.float32)},
    )

    out_path = os.path.join(HERE, "model_goldens.npz")
    np.savez_compressed(out_path, **store)
    print(f"wrote {out_path}: {len(store)} arrays")
    for tag in ("g_sa", "g_tp", "g_mlp", "g_kd", "g_roll", "g_ssroll", "g_steve",
                "g_dvae", "g_savi", "g_stevefull", "g_stevesf", "g_physro",
                "g_phyrero", "g_aloe", "g_savitraj"):
        n = sum(1 for k in store if k.startswith(tag + "/"))
        print(f"  {tag}: {n} arrays")


if __name__ == "__main__":
    main()

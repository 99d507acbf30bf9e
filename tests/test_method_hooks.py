"""Method-level hooks: val-epoch media sampling (dVAE/STEVE/readout), the
gumbel-tau schedule, async checkpointing, and fused-step remainder handling.

Reference behaviors: base_slots/method.py:165-231 (dVAE recon videos + tau),
:285-391 (STEVE decomposition videos), phyre_planning/method.py:21-46
(readout GT/pred-captioned samples).
"""

import pytest

import os

import jax
import numpy as np

from slotformer_tpu.methods import build_method
from slotformer_tpu.models import build_model
from slotformer_tpu.runtime import BaseDataModule, BaseParams, save_checkpoint


class _Videos:
    """Synthetic video dataset with the get_video/files surface the
    media-sampling hooks need."""

    def __init__(self, n=8, t=2, res=16, seed=0):
        rng = np.random.default_rng(seed)
        self.v = rng.uniform(-1, 1, (n, t, res, res, 3)).astype(np.float32)
        self.files = [f"video_{i:05d}.mp4" for i in range(n)]

    def __len__(self):
        return len(self.v)

    def __getitem__(self, i):
        return {"img": self.v[i], "data_idx": i}

    def get_video(self, i):
        return {"video": self.v[i], "data_idx": i}


@pytest.mark.slow
def test_dvae_training_tau_anneal_and_sample_video(tmp_path):
    class P(BaseParams):
        model = "dVAE"
        max_epochs = 1
        eval_interval = 1
        print_iter = 1
        optimizer = "Adam"
        lr = 1e-3
        warmup_steps_pct = 0.1
        train_batch_size = 4
        val_batch_size = 4
        num_workers = 0
        resolution = (16, 16)
        input_frames = 2
        vocab_size = 16
        down_factor = 4
        init_tau = 1.0
        final_tau = 0.1
        tau_decay_pct = 0.5
        n_samples = 2
        recon_loss_w = 1.0

    params = P()
    dm = BaseDataModule(params, _Videos(8), _Videos(4, seed=1))
    model = build_model(params)
    method = build_method(model=model, datamodule=dm, params=params,
                          ckp_path=str(tmp_path / "ckp"))
    method.setup_state()
    # tau schedule: starts at init_tau, anneals toward final_tau
    tau0 = float(method.train_loss_kwargs(np.int32(0))["tau"])
    tau_end = float(method.train_loss_kwargs(np.int32(method.total_steps))["tau"])
    assert abs(tau0 - 1.0) < 1e-5 and abs(tau_end - 0.1) < 1e-5
    method.fit(san_check_val_step=0)
    vids = [f for f in os.listdir(tmp_path / "ckp" / "vis") if f.startswith("recon_")]
    assert vids, "dVAE _sample_video produced no output"


@pytest.mark.slow
def test_steve_sample_video(tmp_path):
    from slotformer_tpu.models.dvae import dVAE

    dvae = dVAE(vocab_size=16)
    rng = jax.random.PRNGKey(0)
    dvae_vars = dvae.init(
        {"params": rng, "sample": rng}, {"img": np.zeros((1, 16, 16, 3), np.float32)}
    )
    dvae_ckp = str(tmp_path / "dvae.ckpt.pkl")
    save_checkpoint(dvae_ckp, dvae_vars["params"], step=0)

    class P(BaseParams):
        model = "STEVE"
        max_epochs = 1
        eval_interval = 1
        print_iter = 1
        optimizer = "Adam"
        lr = 1e-4
        dec_lr = 3e-4
        dec_lr_prefixes = ("trans_decoder",)
        clip_grad = 0.05
        warmup_steps_pct = 0.1
        train_batch_size = 4
        val_batch_size = 4
        num_workers = 0
        resolution = (16, 16)
        input_frames = 2
        n_samples = 2
        slot_dict = dict(num_slots=3, slot_size=16, slot_mlp_size=32,
                         num_iterations=2)
        dvae_dict = dict(down_factor=4, vocab_size=16, dvae_ckp_path=dvae_ckp)
        enc_dict = dict(enc_channels=(3, 8, 8), enc_ks=3, enc_out_channels=16)
        dec_dict = dict(dec_num_layers=1, dec_num_heads=2, dec_d_model=16)
        pred_dict = dict(pred_type="transformer", pred_rnn=True,
                         pred_norm_first=True, pred_num_layers=1,
                         pred_num_heads=2, pred_ffn_dim=32, pred_sg_every=None)
        loss_dict = dict(use_img_recon_loss=False)
        token_recon_loss_w = 1.0

    params = P()
    dm = BaseDataModule(params, _Videos(4), _Videos(4, seed=1))
    model = build_model(params)
    method = build_method(model=model, datamodule=dm, params=params,
                          ckp_path=str(tmp_path / "ckp"))
    method.setup_state()
    method.validation_epoch()
    vids = [f for f in os.listdir(tmp_path / "ckp" / "vis") if f.startswith("decomp_")]
    assert vids, "STEVE _sample_video produced no output"


def test_readout_sample_video(tmp_path):
    class _SlotsLabelsImg:
        load_img = False

        def __init__(self, n=8, seed=0):
            rng = np.random.default_rng(seed)
            self.slots = rng.normal(size=(n, 5, 3, 8)).astype(np.float32)
            self.labels = rng.integers(0, 2, size=n)
            self.v = rng.uniform(-1, 1, (n, 5, 16, 16, 3)).astype(np.float32)

        def __len__(self):
            return len(self.labels)

        def __getitem__(self, i):
            item = {"slots": self.slots[i], "label": int(self.labels[i]),
                    "data_idx": i}
            if self.load_img:
                item["img"] = self.v[i]
            return item

    class P(BaseParams):
        model = "PHYREReadout"
        max_epochs = 1
        eval_interval = 1
        print_iter = 1
        optimizer = "Adam"
        lr = 1e-3
        warmup_steps_pct = 0.1
        train_batch_size = 4
        val_batch_size = 4
        num_workers = 0
        n_samples = 2
        readout_dict = dict(num_slots=3, slot_size=8, t_pe="sin", d_model=16,
                            num_layers=1, num_heads=2, ffn_dim=32,
                            norm_first=True, sel_slots=[0, 3])
        vqa_loss_w = 1.0

    params = P()
    val_set = _SlotsLabelsImg(4, seed=1)
    dm = BaseDataModule(params, _SlotsLabelsImg(8), val_set)
    model = build_model(params)
    method = build_method(model=model, datamodule=dm, params=params,
                          ckp_path=str(tmp_path / "ckp"))
    method.setup_state()
    method.validation_epoch()
    vis = os.listdir(tmp_path / "ckp" / "vis")
    assert any(f.startswith("readout_") and f.endswith(".mp4") for f in vis)
    assert any(f.startswith("readout_") and f.endswith(".json") for f in vis)
    # the toggle must be restored so val batches stay slots-only
    assert val_set.load_img is False

"""STEVE training through the trainer: frozen dVAE graft + dual-LR groups."""

import pytest

pytestmark = pytest.mark.slow

import jax
import numpy as np

from slotformer_tpu.methods import STEVEMethod, build_method
from slotformer_tpu.models import build_model
from slotformer_tpu.runtime import BaseDataModule, BaseParams, save_checkpoint


class _Videos:
    def __init__(self, n=8, t=2, res=16, seed=0):
        rng = np.random.default_rng(seed)
        self.v = rng.uniform(-1, 1, (n, t, res, res, 3)).astype(np.float32)

    def __len__(self):
        return len(self.v)

    def __getitem__(self, i):
        return {"img": self.v[i], "data_idx": i}


def test_steve_training_with_frozen_dvae(tmp_path):
    # 1) a pretrained dVAE ckpt to graft
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
        train_batch_size = 8
        val_batch_size = 8
        num_workers = 0
        resolution = (16, 16)
        input_frames = 2
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
    dm = BaseDataModule(params, _Videos(8), _Videos(4, seed=1))
    model = build_model(params)
    method = build_method(model=model, datamodule=dm, params=params,
                          ckp_path=str(tmp_path / "ckp"))
    assert isinstance(method, STEVEMethod)
    method.setup_state()

    # dVAE grafted from the ckpt
    g = jax.device_get(method.state["params"]["dvae"])
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(g)[0]),
        np.asarray(jax.tree.leaves(dvae_vars["params"])[0]),
    )
    dvae_before = jax.tree.leaves(g)
    trans_before = jax.tree.leaves(
        jax.device_get(method.state["params"]["trans_decoder"])
    )

    method.fit(san_check_val_step=1)

    # frozen dVAE unchanged; trans_decoder (dual-LR group) trained
    dvae_after = jax.tree.leaves(jax.device_get(method.state["params"]["dvae"]))
    for a, b in zip(dvae_before, dvae_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    trans_after = jax.tree.leaves(
        jax.device_get(method.state["params"]["trans_decoder"])
    )
    moved = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(trans_before, trans_after)
    )
    assert moved > 1e-6, "trans_decoder did not train"

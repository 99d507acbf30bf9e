"""Model zoo + per-task ``build_model`` dispatch.

Mirrors the reference's dispatchers
(/root/reference/slotformer/*/models/__init__.py): a single ``build_model``
keyed on ``params.model``.
"""

from .nn import (
    ConvNormAct,
    DeconvNormAct,
    MLP,
    PosEnc,
    SoftPositionEmbed,
    TransformerEncoder,
    TransformerEncoderLayer,
    build_grid,
    clip_tensor_norm,
    get_sin_pos_enc,
    to_rgb_from_tensor,
)
from .slot_attention import SlotAttention, SlotAttentionWMask
from .predictor import (
    ResidualMLPPredictor,
    RNNPredictorWrapper,
    TransformerPredictor,
    build_predictor,
)
from .savi import KernelDistLayer, SpatialBroadcastDecoder, StoSAVi
from .slotformer import (
    SingleStepSlotFormer,
    SingleStepSlotRollouter,
    SlotFormer,
    SlotRollouter,
)


def build_model(params):
    """Instantiate the model named by ``params.model`` from its config dicts."""
    name = params.model
    if name == "StoSAVi":
        return StoSAVi(
            resolution=tuple(params.resolution),
            clip_len=params.input_frames,
            slot_dict=params.slot_dict,
            enc_dict=params.enc_dict,
            dec_dict=params.dec_dict,
            pred_dict=params.pred_dict,
            loss_dict=params.loss_dict,
        )
    if name in ("SlotFormer", "SingleStepSlotFormer"):
        cls = SlotFormer if name == "SlotFormer" else SingleStepSlotFormer
        return cls(
            resolution=tuple(params.resolution),
            clip_len=params.get("n_sample_frames", 16),
            slot_dict=params.slot_dict,
            dec_dict=params.dec_dict,
            rollout_dict=params.rollout_dict,
            loss_dict=params.loss_dict,
        )
    if name == "dVAE":
        from .dvae import dVAE

        return dVAE(vocab_size=params.vocab_size, img_channels=3)
    if name == "STEVE":
        from .steve import STEVE

        return STEVE(
            resolution=tuple(params.resolution),
            clip_len=params.input_frames,
            slot_dict=params.slot_dict,
            dvae_dict=params.dvae_dict,
            enc_dict=params.enc_dict,
            dec_dict=params.dec_dict,
            pred_dict=params.pred_dict,
            loss_dict=params.loss_dict,
        )
    if name == "STEVESlotFormer":
        from .steve_slotformer import STEVESlotFormer

        return STEVESlotFormer(
            resolution=tuple(params.resolution),
            clip_len=params.get("n_sample_frames", 16),
            slot_dict=params.slot_dict,
            dvae_dict=params.dvae_dict,
            dec_dict=params.dec_dict,
            rollout_dict=params.rollout_dict,
            loss_dict=params.loss_dict,
        )
    if name == "CLEVRERAloe":
        from ..runtime.io import load_obj
        from .aloe import CLEVRERAloe

        vocab = load_obj(params.vocab_file)
        lang_dict = dict(
            question_vocab_size=len(vocab["q_vocab"]),
            answer_vocab_size=len(vocab["a_vocab"]),
            question_len=params.max_question_len,
        )
        return CLEVRERAloe(
            transformer_dict=params.transformer_dict,
            lang_dict=lang_dict,
            vision_dict=params.vision_dict,
            loss_dict=params.loss_dict,
        )
    if name == "PHYREReadout":
        from .readout import PHYREReadout

        return PHYREReadout(readout_dict=params.readout_dict)
    if name == "PhysionReadout":
        from .readout import PhysionReadout

        return PhysionReadout(readout_dict=params.readout_dict)
    raise NotImplementedError(f"unknown model {name}")

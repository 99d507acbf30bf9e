"""Dataset dispatcher.

Mirrors /root/reference/slotformer/base_slots/datasets/__init__.py: name-based
``build_<dataset>_dataset`` dispatch, with physion names carrying a subset
suffix (``physion_slots_label_readout`` etc.).
"""

from .clevrer import (
    CLEVRERDataset,
    CLEVRERSlotsDataset,
    build_clevrer_dataset,
    build_clevrer_slots_dataset,
)
from .obj3d import (
    Obj3DDataset,
    Obj3DSlotsDataset,
    build_obj3d_dataset,
    build_obj3d_slots_dataset,
)
from .synthetic import (
    SyntheticSlotsDataset,
    SyntheticVideoDataset,
    build_synthetic_dataset,
    build_synthetic_slots_dataset,
)
from .utils import BaseTransforms, anno2mask, masks_to_boxes_pad, rle_decode

_BUILDERS = {
    "obj3d": build_obj3d_dataset,
    "obj3d_slots": build_obj3d_slots_dataset,
    "clevrer": build_clevrer_dataset,
    "clevrer_slots": build_clevrer_slots_dataset,
    "synthetic": build_synthetic_dataset,
    "synthetic_slots": build_synthetic_slots_dataset,
}


def register_dataset(name, builder):
    _BUILDERS[name] = builder


def build_dataset(params, val_only=False):
    dst = params.dataset
    if "physion" in dst:
        # physion dataset names look like 'physion_xxx_$SUBSET'
        dst = dst[: dst.rindex("_")]
    return _BUILDERS[dst](params, val_only=val_only)


# register the remaining task datasets (each module calls register_dataset)
from . import clevrer_vqa, physion, phyre  # noqa: E402,F401

from .params import BaseParams, load_params
from .io import (
    VideoReader,
    atomic_write_npy,
    dump_obj,
    glob_all,
    load_obj,
    mkdir_or_exist,
    read_all_lines,
    read_img,
    save_img,
    save_video,
    strip_suffix,
    symlink_force,
)
from .meters import AverageMeter, MeanMetric, MeterBank
from .schedules import build_optimizer, cosine_anneal, cosine_annealing_warmup
from .checkpoint import (
    graft,
    latest_checkpoint,
    load_checkpoint,
    load_state_dict,
    save_checkpoint,
)
from .datamodule import BaseDataModule, DataLoader, Dataset, default_collate
from .method import BaseMethod, RestartForMemory, to_bf16
from . import torch_compat

__all__ = [
    "BaseParams",
    "load_params",
    "VideoReader",
    "atomic_write_npy",
    "dump_obj",
    "glob_all",
    "load_obj",
    "mkdir_or_exist",
    "read_all_lines",
    "read_img",
    "save_img",
    "save_video",
    "strip_suffix",
    "symlink_force",
    "AverageMeter",
    "MeanMetric",
    "MeterBank",
    "build_optimizer",
    "cosine_anneal",
    "cosine_annealing_warmup",
    "graft",
    "latest_checkpoint",
    "load_checkpoint",
    "load_state_dict",
    "save_checkpoint",
    "BaseDataModule",
    "DataLoader",
    "Dataset",
    "default_collate",
    "BaseMethod",
    "RestartForMemory",
    "to_bf16",
    "torch_compat",
]

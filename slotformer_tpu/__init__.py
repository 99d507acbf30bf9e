"""slotformer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) object-centric video
dynamics framework with the capabilities of pairlab/SlotFormer.

Subpackages
-----------
runtime   : trainer, config/params system, data module, IO, meters, schedules,
            checkpointing (replaces the external ``nerv`` dependency of the
            reference, see SURVEY.md §2.1).
parallel  : device-mesh / sharding utilities (ICI data parallelism replacing
            the reference's NCCL DDP, SURVEY.md §2.6).
models    : flax model zoo — SAVi/StoSAVi, SlotFormer, STEVE/dVAE, VQA heads.
ops       : Pallas TPU kernels for the hot ops (slot attention, decoding).
datasets  : host-side data pipelines (CLEVRER / OBJ3D / Physion / PHYRE / VQA).
metrics   : video-prediction & segmentation metrics (PSNR/SSIM/ARI/mIoU/...).
cli       : entry points (train / extract_slots / rollout / test_*).
configs   : per-task params files mirroring the reference's 13 configs.
"""

__version__ = "0.1.0"

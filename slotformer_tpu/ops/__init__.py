from .slot_attention_kernel import (
    fused_reference,
    fused_slot_attention,
    slot_attention_update,
)

__all__ = [
    "fused_reference",
    "fused_slot_attention",
    "slot_attention_update",
]

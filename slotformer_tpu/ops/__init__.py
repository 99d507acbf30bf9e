from .slot_attention_kernel import slot_attention_update

__all__ = ["slot_attention_update"]

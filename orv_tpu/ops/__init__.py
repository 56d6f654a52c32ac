from orv_tpu.ops.attention import flash_attention, mha_reference

__all__ = ["flash_attention", "mha_reference"]

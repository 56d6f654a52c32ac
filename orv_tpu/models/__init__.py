from orv_tpu.models.dit import ControlDiT, DiTConfig

__all__ = ["ControlDiT", "DiTConfig"]

from orv_tpu.ops.native.build import load_native

__all__ = ["load_native"]

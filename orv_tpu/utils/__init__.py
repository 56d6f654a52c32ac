from orv_tpu.utils.logging import CONSOLE, log

__all__ = ["CONSOLE", "log"]

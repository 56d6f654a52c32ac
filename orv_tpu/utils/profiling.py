"""Profiling / observability helpers (reference utils.py:166-331 parity,
TPU-native: jax device memory stats and profiler traces replace the CUDA
memory probes)."""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Iterator, Optional

import jax

from orv_tpu.utils.logging import CONSOLE


def device_memory_stats(device=None) -> Dict[str, float]:
    """HBM usage in GB (reference print_memory equivalent)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)() or {}
    gb = 1024**3
    return {
        "bytes_in_use_gb": stats.get("bytes_in_use", 0) / gb,
        "peak_bytes_in_use_gb": stats.get("peak_bytes_in_use", 0) / gb,
        "bytes_limit_gb": stats.get("bytes_limit", 0) / gb,
    }


def print_memory(device=None, tag: str = ""):
    s = device_memory_stats(device)
    CONSOLE.log(
        f"[mem{':' + tag if tag else ''}] in_use={s['bytes_in_use_gb']:.3f}GB "
        f"peak={s['peak_bytes_in_use_gb']:.3f}GB limit={s['bytes_limit_gb']:.3f}GB"
    )


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax_trace") -> Iterator[None]:
    """jax.profiler trace context (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        CONSOLE.log(f"profiler trace -> {log_dir}")


def flatten_dict(d: Dict[str, Any], parent: str = "", sep: str = "/") -> Dict[str, Any]:
    """Nested dict -> flat {a/b/c: v} (reference utils.flatten_dict)."""
    out = {}
    for k, v in d.items():
        key = f"{parent}{sep}{k}" if parent else str(k)
        if isinstance(v, dict):
            out.update(flatten_dict(v, key, sep))
        else:
            out[key] = v
    return out


def global_grad_norm(grads) -> float:
    """Host-side gradient-norm probe (reference get_gradient_norm)."""
    import jax.numpy as jnp

    total = 0.0
    for leaf in jax.tree_util.tree_leaves(grads):
        total += float(jnp.sum(jnp.square(leaf.astype(jnp.float32))))
    return total**0.5

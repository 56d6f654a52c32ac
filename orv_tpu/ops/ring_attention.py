"""Ring (sequence-parallel) attention over an `sp` mesh axis.

Capability beyond the reference (SURVEY.md §5.7: the reference has no
SP/CP and tames sequence length with VAE compression + cascaded chunks).
For clips longer than one chip's HBM, shard the token axis over `sp`:
each device keeps its query chunk resident and the K/V chunks rotate
around the ring via `jax.lax.ppermute`, combining partial attention with
logsumexp weights — exact attention, O(S/n) memory per chip, and the
rotation rides ICI neighbor links.

Per-chunk attention uses the fused kernel (Pallas on TPU) through
`attention_with_lse`; the ring loop is a `lax.scan` whose step index is a
scan input (never a carried counter — axon backend constraint).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from orv_tpu.ops.attention import attention_with_lse


def _ring_body(q_blk, k_blk, v_blk, axis: str, scale: float, impl: str):
    n = jax.lax.axis_size(axis)
    perm = [(j, (j + 1) % n) for j in range(n)]

    out0, lse0 = attention_with_lse(q_blk, k_blk, v_blk, scale, impl)
    out0 = out0.astype(jnp.float32)

    def step(carry, _):
        out_acc, lse_acc, k_cur, v_cur = carry
        # rotate KV one hop around the ring, then attend to the new chunk
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        out_i, lse_i = attention_with_lse(q_blk, k_nxt, v_nxt, scale, impl)
        lse_new = jnp.logaddexp(lse_acc, lse_i)
        w_acc = jnp.exp(lse_acc - lse_new)[..., None]
        w_i = jnp.exp(lse_i - lse_new)[..., None]
        out_acc = out_acc * w_acc + out_i.astype(jnp.float32) * w_i
        return (out_acc, lse_new, k_nxt, v_nxt), None

    (out, _, _, _), _ = jax.lax.scan(
        step, (out0, lse0, k_blk, v_blk), None, length=n - 1
    )
    return out.astype(q_blk.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "sp",
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Exact attention over [B, H, S, D] with S sharded on `axis`.

    S must divide by the axis size. Bidirectional (no causal mask) — the
    DiT's joint text-video attention is full attention, so every query
    chunk must see every KV chunk; the ring delivers them one hop at a
    time while compute overlaps the next transfer.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    spec = P(None, None, axis, None)
    fn = shard_map(
        functools.partial(_ring_body, axis=axis, scale=float(scale), impl=impl),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    return fn(q, k, v)

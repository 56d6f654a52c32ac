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


def _ring_body(q_blk, k_blk, v_blk, axis: str, scale: float, impl: str,
               static_max=None):
    n = jax.lax.axis_size(axis)
    perm = [(j, (j + 1) % n) for j in range(n)]

    out0, lse0 = attention_with_lse(q_blk, k_blk, v_blk, scale, impl, static_max)
    out0 = out0.astype(jnp.float32)

    def step(carry, _):
        out_acc, lse_acc, k_cur, v_cur = carry
        # rotate KV one hop around the ring, then attend to the new chunk
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        out_i, lse_i = attention_with_lse(q_blk, k_nxt, v_nxt, scale, impl, static_max)
        lse_new = jnp.logaddexp(lse_acc, lse_i)
        w_acc = jnp.exp(lse_acc - lse_new)[..., None]
        w_i = jnp.exp(lse_i - lse_new)[..., None]
        out_acc = out_acc * w_acc + out_i.astype(jnp.float32) * w_i
        return (out_acc, lse_new, k_nxt, v_nxt), None

    (out, _, _, _), _ = jax.lax.scan(
        step, (out0, lse0, k_blk, v_blk), None, length=n - 1
    )
    return out.astype(q_blk.dtype)


def _lse_combine(out_a, lse_a, out_b, lse_b):
    """Merge two partial attention results (f32 out, f32 lse) exactly."""
    lse = jnp.logaddexp(lse_a, lse_b)
    w_a = jnp.exp(lse_a - lse)[..., None]
    w_b = jnp.exp(lse_b - lse)[..., None]
    return out_a * w_a + out_b * w_b, lse


def _joint_ring_body(q_t, k_t, v_t, q_v, k_v, v_v, axis: str, scale: float,
                     impl: str, static_max=None):
    """Per-device body: text tokens replicated, video tokens sharded on
    `axis`. Exact joint [text|video] attention via logsumexp merging:

      video queries: attend text KV (resident) + every video KV chunk
                     (rotating ring, ppermute over ICI neighbors);
      text queries:  attend text KV (resident) + the local video chunk,
                     then a psum in probability space merges the per-device
                     partials (text is ~226 tokens — the collective is tiny).
    """
    n = jax.lax.axis_size(axis)
    perm = [(j, (j + 1) % n) for j in range(n)]

    # --- video queries ---
    out_a, lse_a = attention_with_lse(q_v, k_t, v_t, scale, impl, static_max)
    out_b, lse_b = attention_with_lse(q_v, k_v, v_v, scale, impl, static_max)
    out_acc, lse_acc = _lse_combine(out_a.astype(jnp.float32), lse_a,
                                    out_b.astype(jnp.float32), lse_b)

    def step(carry, _):
        acc, lse, k_cur, v_cur = carry
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        out_i, lse_i = attention_with_lse(q_v, k_nxt, v_nxt, scale, impl, static_max)
        acc, lse = _lse_combine(acc, lse, out_i.astype(jnp.float32), lse_i)
        return (acc, lse, k_nxt, v_nxt), None

    (out_vid, _, _, _), _ = jax.lax.scan(
        step, (out_acc, lse_acc, k_v, v_v), None, length=n - 1
    )

    # --- text queries ---
    out_tt, lse_tt = attention_with_lse(q_t, k_t, v_t, scale, impl, static_max)
    out_tv, lse_tv = attention_with_lse(q_t, k_v, v_v, scale, impl, static_max)
    # m only stabilizes the exponentials — num/den is invariant to it, so
    # its gradient is exactly zero; stop_gradient keeps the ring
    # differentiable (pmax has no AD rule) without changing any derivative
    m = jnp.maximum(
        jax.lax.pmax(jax.lax.stop_gradient(lse_tv), axis),
        jax.lax.stop_gradient(lse_tt))
    num = jax.lax.psum(
        jnp.exp(lse_tv - m)[..., None] * out_tv.astype(jnp.float32), axis
    ) + jnp.exp(lse_tt - m)[..., None] * out_tt.astype(jnp.float32)
    den = jax.lax.psum(jnp.exp(lse_tv - m), axis) + jnp.exp(lse_tt - m)
    out_txt = num / den[..., None]

    return out_txt.astype(q_t.dtype), out_vid.astype(q_v.dtype)


def joint_ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    text_len: int,
    mesh: Mesh,
    axis: str = "sp",
    scale: Optional[float] = None,
    impl: str = "auto",
    batch_axes=None,
    static_max: Optional[float] = None,
) -> jnp.ndarray:
    """Exact joint [text|video] attention over [B, H, T+S, D] with the
    video token range sequence-sharded on `axis` and the text range
    replicated (text is 226 tokens — sharding it would leave ragged
    chunks; replicating it costs one tiny psum instead).

    This is the sequence-parallel path of the DiT's JointAttention: the
    reference has no SP at all (SURVEY.md §5.7); here longer clips shard
    their ~8k video tokens over the ICI ring while every device keeps its
    query chunk resident. S must divide by the axis size.

    `batch_axes` (mesh axis name or tuple) shards the leading batch dim —
    on a multi-axis training mesh this carries the dp batch sharding
    through the shard_map instead of forcing an all-gather at its boundary.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    t_spec = P(batch_axes, None, None, None)
    v_spec = P(batch_axes, None, axis, None)
    fn = shard_map(
        functools.partial(_joint_ring_body, axis=axis, scale=float(scale),
                          impl=impl, static_max=static_max),
        mesh=mesh,
        in_specs=(t_spec, t_spec, t_spec, v_spec, v_spec, v_spec),
        out_specs=(t_spec, v_spec),
        check_rep=False,
    )
    out_t, out_v = fn(q[:, :, :text_len], k[:, :, :text_len], v[:, :, :text_len],
                      q[:, :, text_len:], k[:, :, text_len:], v[:, :, text_len:])
    return jnp.concatenate([out_t, out_v], axis=2)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "sp",
    scale: Optional[float] = None,
    impl: str = "auto",
    batch_axes=None,
    static_max: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention over [B, H, S, D] with S sharded on `axis`.

    S must divide by the axis size. Bidirectional (no causal mask) — the
    DiT's joint text-video attention is full attention, so every query
    chunk must see every KV chunk; the ring delivers them one hop at a
    time while compute overlaps the next transfer. `batch_axes` optionally
    shards the leading batch dim (see joint_ring_attention).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    spec = P(batch_axes, None, axis, None)
    fn = shard_map(
        functools.partial(_ring_body, axis=axis, scale=float(scale), impl=impl,
                          static_max=static_max),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    return fn(q, k, v)

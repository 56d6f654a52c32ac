"""Fused adaLN modulate: LayerNorm + (1+scale)·x̂ + shift in one Pallas pass.

The DiT applies per-frame adaLN modulation before every attention and FF
call (reference CogVideoXLayerNormZero, cogvideox_control.py:41-150). The
XLA lowering runs the f32 norm reductions and the modulation as separate
fusions with an f32 intermediate round-tripping HBM; at the flagship shape
(S≈7.8k tokens × D=1920 × 30 layers × 2 norms) that is ~60 ms of
elementwise/HBM work per step. This kernel reads the bf16 hidden tile
once, computes mean/var/normalize/modulate in f32 VMEM, and writes bf16
once — one HBM round trip.

Inference-only (no VJP): the training path keeps the XLA lowering, which
autodiffs. Wired behind the model's `quant` serving flag.

Layout: x [R, S, D] with per-row modulation scale/shift [R, D] — the
caller folds (batch, frame) into R so per-frame vectors broadcast over
each frame's patch rows for free (R = B·F, S = patches/frame).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orv_tpu.ops.attention import _interpret


def _kernel(x_ref, scale_ref, shift_ref, ns_ref, nb_ref, o_ref, *, eps):
    x = x_ref[0].astype(jnp.float32)  # [bs, D]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * ns_ref[0].astype(jnp.float32) + nb_ref[0].astype(jnp.float32)
    y = y * (1.0 + scale_ref[0].astype(jnp.float32)) + shift_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def modulate_norm(x, scale, shift, norm_scale, norm_bias, eps: float = 1e-5,
                  block_s: int = 512):
    """x [R, S, D]; scale/shift [R, D]; norm_scale/bias [D] -> [R, S, D].

    Equivalent to `_layer_norm(x, ns, nb, eps) * (1+scale[:,None]) +
    shift[:,None]` with f32 math and a bf16 result, in one fused pass."""
    R, S, D = x.shape
    # pick the block split that minimizes padding: capping at block_s and
    # padding S up to a multiple of it can waste whole blocks (flagship
    # S=600 -> pad 1024 at block 512 = 41% dead rows); instead split S into
    # ceil(S/block_s) near-equal 8-aligned blocks (600 -> 2x304, 1.3% pad)
    s8 = max(8, pl.cdiv(S, 8) * 8)
    nblocks = pl.cdiv(s8, block_s)
    block_s = pl.cdiv(pl.cdiv(s8, nblocks), 8) * 8
    S_pad = nblocks * block_s
    if S_pad != S:
        x = jnp.pad(x, ((0, 0), (0, S_pad - S), (0, 0)))
    ns = jnp.broadcast_to(norm_scale.astype(jnp.float32)[None], (1, D))
    nb = jnp.broadcast_to(norm_bias.astype(jnp.float32)[None], (1, D))
    out = pl.pallas_call(
        functools.partial(_kernel, eps=float(eps)),
        grid=(R, S_pad // block_s),
        in_specs=[
            pl.BlockSpec((1, block_s, D), lambda r, si: (r, si, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (r, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (r, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (0, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_s, D), lambda r, si: (r, si, 0)),
        out_shape=jax.ShapeDtypeStruct((R, S_pad, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(x, scale[:, None, :], shift[:, None, :], ns[None], nb[None])
    return out[:, :S]

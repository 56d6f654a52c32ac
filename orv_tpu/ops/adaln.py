"""Fused adaLN modulate: LayerNorm + (1+scale)·x̂ + shift in one Pallas pass.

The DiT applies per-frame adaLN modulation before every attention and FF
call (reference CogVideoXLayerNormZero, cogvideox_control.py:41-150). The
XLA lowering runs the f32 norm reductions and the modulation as separate
fusions with an f32 intermediate round-tripping HBM; at the flagship shape
(S≈7.8k tokens × D=1920 × 30 layers × 2 norms) that is ~60 ms of
elementwise/HBM work per step. This kernel reads the bf16 hidden tile
once, computes mean/var/normalize/modulate in f32 VMEM, and writes bf16
once — one HBM round trip.

`modulate_norm` and `gated_residual` carry custom VJPs with Pallas
backward kernels (one HBM round trip each, per-row reductions accumulated
in VMEM across sequence blocks), so the training path uses the fused
lowering too; `modulate_norm_q8` stays inference-only (quantization is not
differentiable).

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


def _split_s(S: int, block_s: int):
    """Split S into nblocks near-equal 8-aligned blocks, minimizing padding.

    Capping at block_s and padding S up to a multiple can waste whole rows
    (flagship S=600 at block 512 -> 2x304 = pad 8, an extra 30MB pad
    materialization per call); searching a few split counts finds exact
    divisions when they exist (600 -> 3x200, zero pad)."""
    s8 = max(8, pl.cdiv(S, 8) * 8)
    n0 = pl.cdiv(s8, block_s)
    cand = []
    for n in range(n0, n0 + 4):
        bs = pl.cdiv(pl.cdiv(s8, n), 8) * 8
        cand.append((n * bs - s8, -bs, n, bs))
    _, _, nblocks, bs = min(cand)
    return nblocks, bs, nblocks * bs


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
    shift[:,None]` with f32 math and a bf16 result, in one fused pass.
    Differentiable (custom VJP with a fused Pallas backward)."""
    return _modulate_norm(x, scale, shift, norm_scale, norm_bias,
                          float(eps), int(block_s))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _modulate_norm(x, scale, shift, norm_scale, norm_bias, eps, block_s):
    return _mn_fwd_impl(x, scale, shift, norm_scale, norm_bias, eps, block_s)


def _mn_fwd_impl(x, scale, shift, norm_scale, norm_bias, eps, block_s):
    R, S, D = x.shape
    nblocks, block_s, S_pad = _split_s(S, block_s)
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


def _mn_bwd_kernel(x_ref, do_ref, scale_ref, ns_ref, dx_ref, a_ref, b_ref,
                   *, eps):
    """Fused adaLN backward tile. With w = ns·(1+scale) the forward is
    out = x̂·w + const(x), so dx is the standard LayerNorm input gradient
    with elementwise weight w; the parameter gradients all derive from two
    per-row reductions A = Σ_S dout and B = Σ_S dout·x̂ (accumulated here
    across sequence blocks), leaving only [R, D]-sized algebra to XLA."""
    si = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    w = ns_ref[0].astype(jnp.float32) * (1.0 + scale_ref[0].astype(jnp.float32))
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * inv
    g = do * w
    gm = jnp.mean(g, axis=-1, keepdims=True)
    gxm = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx_ref[0] = (inv * (g - gm - xhat * gxm)).astype(dx_ref.dtype)
    a_part = jnp.sum(do, axis=0, keepdims=True)
    b_part = jnp.sum(do * xhat, axis=0, keepdims=True)

    @pl.when(si == 0)
    def _init():
        a_ref[0] = a_part
        b_ref[0] = b_part

    @pl.when(si != 0)
    def _acc():
        a_ref[0] += a_part
        b_ref[0] += b_part


def _mn_fwd(x, scale, shift, norm_scale, norm_bias, eps, block_s):
    out = _mn_fwd_impl(x, scale, shift, norm_scale, norm_bias, eps, block_s)
    return out, (x, scale, norm_scale, norm_bias)


def _mn_bwd(eps, block_s, res, dout):
    x, scale, norm_scale, norm_bias = res
    R, S, D = x.shape
    nblocks, bs, S_pad = _split_s(S, block_s)
    if S_pad != S:
        pad = ((0, 0), (0, S_pad - S), (0, 0))
        x = jnp.pad(x, pad)
        dout = jnp.pad(dout, pad)
    ns = jnp.broadcast_to(norm_scale.astype(jnp.float32)[None], (1, D))
    dx, a, b = pl.pallas_call(
        functools.partial(_mn_bwd_kernel, eps=float(eps)),
        grid=(R, S_pad // bs),
        in_specs=[
            pl.BlockSpec((1, bs, D), lambda r, si: (r, si, 0)),
            pl.BlockSpec((1, bs, D), lambda r, si: (r, si, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (r, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bs, D), lambda r, si: (r, si, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (r, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (r, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, S_pad, D), x.dtype),
            jax.ShapeDtypeStruct((R, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((R, 1, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, dout, scale[:, None, :], ns[None])
    a, b = a[:, 0], b[:, 0]  # [R, D] f32
    one_p = 1.0 + scale.astype(jnp.float32)
    ns32, nb32 = (norm_scale.astype(jnp.float32)[None],
                  norm_bias.astype(jnp.float32)[None])
    dscale = (ns32 * b + nb32 * a).astype(scale.dtype)
    dshift = a.astype(scale.dtype)
    dns = jnp.sum(one_p * b, axis=0).astype(norm_scale.dtype)
    dnb = jnp.sum(one_p * a, axis=0).astype(norm_bias.dtype)
    return dx[:, :S], dscale, dshift, dns, dnb


_modulate_norm.defvjp(_mn_fwd, _mn_bwd)


def _kernel_q8(x_ref, scale_ref, shift_ref, ns_ref, nb_ref, oq_ref, os_ref,
               *, eps):
    x = x_ref[0].astype(jnp.float32)  # [bs, D]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * ns_ref[0].astype(jnp.float32) + nb_ref[0].astype(jnp.float32)
    y = y * (1.0 + scale_ref[0].astype(jnp.float32)) + shift_ref[0].astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True), 1e-6)
    oq_ref[0] = jnp.round(y * (127.0 / amax)).astype(jnp.int8)
    os_ref[0] = (amax * (1.0 / 127.0)).astype(jnp.float32)  # [bs, 1]


def modulate_norm_q8(x, scale, shift, norm_scale, norm_bias,
                     eps: float = 1e-5, block_s: int = 512):
    """Like `modulate_norm` but emits the W8A8 activation quantization
    directly: returns (xq int8 [R, S, D], xscale f32 [R, S]) with
    xscale = per-token absmax/127 — exactly what `Int8Dense` computes from
    a bf16 input. In the serving DiT block the adaLN output feeds ONLY
    int8 projections (attention to_q/k/v, FF net_0_proj), so emitting int8
    here removes the separate per-token amax pass + round pass over the
    [S, D] activation (~90MB of HBM traffic per norm at the flagship
    shape, 60 norms/step). Inference-only (no VJP)."""
    R, S, D = x.shape
    nblocks, block_s, S_pad = _split_s(S, block_s)
    if S_pad != S:
        x = jnp.pad(x, ((0, 0), (0, S_pad - S), (0, 0)))
    ns = jnp.broadcast_to(norm_scale.astype(jnp.float32)[None], (1, D))
    nb = jnp.broadcast_to(norm_bias.astype(jnp.float32)[None], (1, D))
    xq, xs = pl.pallas_call(
        functools.partial(_kernel_q8, eps=float(eps)),
        grid=(R, nblocks),
        in_specs=[
            pl.BlockSpec((1, block_s, D), lambda r, si: (r, si, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (r, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (r, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (0, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_s, D), lambda r, si: (r, si, 0)),
            # the per-token scale emits as [R, S, 1] — a 2D [R, S] output
            # block (1, block_s) would violate the TPU lowering's
            # last-dim-divisible-by-128 rule
            pl.BlockSpec((1, block_s, 1), lambda r, si: (r, si, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, S_pad, D), jnp.int8),
            jax.ShapeDtypeStruct((R, S_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(x, scale[:, None, :], shift[:, None, :], ns[None], nb[None])
    return xq[:, :S], xs[:, :S, 0]


def _gate_kernel(x_ref, y_ref, g_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)
    y = y_ref[0].astype(jnp.float32)
    o_ref[0] = (x + y * g_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def gated_residual(x, y, gate, block_s: int = 512):
    """x [R, S, D] + gate [R, D] · y [R, S, D] in one fused pass.

    The adaLN-Zero gated residual (`hidden + gate * attn_out`, reference
    CogVideoXBlock forward, cogvideox_control.py:394-445) with a per-frame
    gate lowers in XLA to a *materialized* f32 [R, S, D] broadcast of the
    gate (~60MB at the flagship shape) that the residual-add fusion then
    re-reads — ~8 ms/step of pure HBM traffic across 60 gate applications.
    This kernel keeps the broadcast in VMEM: reads x and y once, writes
    the result once, f32 math throughout. Differentiable (custom VJP with
    a fused backward: dy = gate·dout and dgate = Σ_S dout·y in one pass)."""
    return _gated_residual(x, y, gate, int(block_s))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gated_residual(x, y, gate, block_s):
    return _gr_fwd_impl(x, y, gate, block_s)


def _gr_fwd_impl(x, y, gate, block_s):
    R, S, D = x.shape
    nblocks, block_s, S_pad = _split_s(S, block_s)
    if S_pad != S:
        pad = ((0, 0), (0, S_pad - S), (0, 0))
        x = jnp.pad(x, pad)
        y = jnp.pad(y, pad)
    out = pl.pallas_call(
        _gate_kernel,
        grid=(R, nblocks),
        in_specs=[
            pl.BlockSpec((1, block_s, D), lambda r, si: (r, si, 0)),
            pl.BlockSpec((1, block_s, D), lambda r, si: (r, si, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (r, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_s, D), lambda r, si: (r, si, 0)),
        out_shape=jax.ShapeDtypeStruct((R, S_pad, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(x, y, gate[:, None, :])
    return out[:, :S]


def _gr_bwd_kernel(do_ref, y_ref, g_ref, dy_ref, dg_ref):
    si = pl.program_id(1)
    do = do_ref[0].astype(jnp.float32)
    y = y_ref[0].astype(jnp.float32)
    dy_ref[0] = (do * g_ref[0].astype(jnp.float32)).astype(dy_ref.dtype)
    part = jnp.sum(do * y, axis=0, keepdims=True)

    @pl.when(si == 0)
    def _init():
        dg_ref[0] = part

    @pl.when(si != 0)
    def _acc():
        dg_ref[0] += part


def _gr_fwd(x, y, gate, block_s):
    return _gr_fwd_impl(x, y, gate, block_s), (y, gate)


def _gr_bwd(block_s, res, dout):
    y, gate = res
    R, S, D = y.shape
    nblocks, bs, S_pad = _split_s(S, block_s)
    if S_pad != S:
        pad = ((0, 0), (0, S_pad - S), (0, 0))
        y = jnp.pad(y, pad)
        dout_p = jnp.pad(dout, pad)
    else:
        dout_p = dout
    dy, dg = pl.pallas_call(
        _gr_bwd_kernel,
        grid=(R, S_pad // bs),
        in_specs=[
            pl.BlockSpec((1, bs, D), lambda r, si: (r, si, 0)),
            pl.BlockSpec((1, bs, D), lambda r, si: (r, si, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (r, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bs, D), lambda r, si: (r, si, 0)),
            pl.BlockSpec((1, 1, D), lambda r, si: (r, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, S_pad, D), y.dtype),
            jax.ShapeDtypeStruct((R, 1, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(dout_p, y, gate[:, None, :])
    return dout, dy[:, :S], dg[:, 0].astype(gate.dtype)


_gated_residual.defvjp(_gr_fwd, _gr_bwd)

"""DiT building blocks (Flax linen), TPU-native.

Re-implements the *semantics* of the reference model components
(reference file:line cited per class) with JAX-idiomatic internals:
space-to-depth + matmul patch embedding instead of conv2d, fused flash
attention, f32 normalization/modulation math with bf16 activations.

Weight-mapping notes for loading PyTorch checkpoints are in each class
docstring (torch Linear kernels transpose to [in, out]; the patch-embed
conv kernel flattens as (c, ph, pw)).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange, repeat

from orv_tpu.ops.attention import attention

# qk-LayerNorm bounds attention logits (|s| <= |q||k|/sqrt(d) with unit-var
# rows times learned gains); 24.0 leaves ample headroom while enabling the
# cheaper static-max flash kernel.
QK_NORM_LOGIT_BOUND = 24.0
from orv_tpu.utils.embeddings import apply_rotary_emb, get_3d_sincos_pos_embed

Dtype = Any

# torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(±sqrt(1/fan_in))
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _layer_norm(x: jnp.ndarray, scale: Optional[jnp.ndarray], bias: Optional[jnp.ndarray],
                eps: float) -> jnp.ndarray:
    """LayerNorm over the last axis, computed in f32, cast back."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


class LayerNorm(nn.Module):
    """Affine LayerNorm with f32 math."""

    dim: int
    eps: float = 1e-5
    elementwise_affine: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = bias = None
        if self.elementwise_affine:
            scale = self.param("scale", nn.initializers.ones, (self.dim,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (self.dim,), self.param_dtype)
        return _layer_norm(x, scale, bias, self.eps)


class AdaLNZero(nn.Module):
    """Action-aware adaLN-Zero (reference CogVideoXLayerNormZero,
    cogvideox_control.py:41-150).

    Two regimes:
      * 3-chunk (`modulate_enc=False`): text stream is only normed; video
        gets (shift, scale, gate). ORV scratch models.
      * 6-chunk (`modulate_enc=True`): CogVideoX default — text gets its own
        (shift, scale, gate). With actions, a *split linear* modulates video
        by silu(temb + action) and text by silu(temb) only, sharing one
        weight matrix (rows [:3D] video / [3D:] text).

    With `action_emb` [B, F, D_cond], per-frame modulation vectors are
    repeated over the spatial patches of each frame (frame-major sequence).
    """

    conditioning_dim: int
    embedding_dim: int
    modulate_enc: bool = False
    eps: float = 1e-5
    # fused=True routes the video-stream norm+modulate through the Pallas
    # one-pass kernel (ops/adaln.py, differentiable via custom VJP) — set
    # from the model's `quant` flag or `_fused_adaln_ok()` (TPU backend)
    fused: bool = False
    # emit_q8=True (requires fused) makes the kernel emit the W8A8 per-token
    # int8 quantization directly: the video stream returns as a
    # (xq int8, scale f32) tuple that Int8Dense consumes without re-reading
    # the activation for amax/round
    emit_q8: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, enc, temb, action_emb=None, gates_only: bool = False):
        # gates_only: skip the (expensive) token-stream norm+modulate and
        # return (None, None, gate, enc_gate) — the PAB attention-broadcast
        # path (pipelines/sample.py) reuses cached attention outputs but
        # still needs the step-dependent residual gates
        dim = self.embedding_dim
        n_chunks = 6 if self.modulate_enc else 3
        kernel = self.param(
            "linear_kernel", torch_linear_init, (self.conditioning_dim, n_chunks * dim),
            self.param_dtype,
        )
        lbias = self.param("linear_bias", nn.initializers.zeros, (n_chunks * dim,), self.param_dtype)
        norm_scale = self.param("norm_scale", nn.initializers.ones, (dim,), self.param_dtype)
        norm_bias = self.param("norm_bias", nn.initializers.zeros, (dim,), self.param_dtype)

        kernel = kernel.astype(self.dtype)
        lbias = lbias.astype(self.dtype)

        def norm(x):
            return _layer_norm(x, norm_scale, norm_bias, self.eps)

        def mod(x, scale, shift):
            return (norm(x).astype(jnp.float32) * (1.0 + scale.astype(jnp.float32))
                    + shift.astype(jnp.float32)).astype(x.dtype)

        def mod_rows(x, scale, shift):
            """Video-stream modulate: x [R, S, D], per-row scale/shift
            [R, D]. The fused path does norm+modulate in ONE Pallas pass
            (keeps f32 through the modulation; the XLA path rounds the
            normed value to bf16 in between — fused is the more exact)."""
            if self.fused:
                from orv_tpu.ops.adaln import modulate_norm, modulate_norm_q8

                if self.emit_q8:
                    return modulate_norm_q8(x, scale, shift, norm_scale,
                                            norm_bias, self.eps)
                return modulate_norm(x, scale, shift, norm_scale, norm_bias,
                                     self.eps)
            return mod(x, scale[:, None, :], shift[:, None, :])

        enc_gate = None
        if gates_only:
            # compute ONLY the gate column-slices of the modulation linear
            # (gate = chunk 3 of the video split, enc_gate = chunk 6): a
            # broadcast step discards shift/scale and XLA cannot prune
            # partial output columns of one matmul
            g_k = kernel[:, 2 * dim : 3 * dim]
            g_b = lbias[2 * dim : 3 * dim]
            if action_emb is not None:
                temb_f = nn.silu(temb[:, None, :].astype(jnp.float32)
                                 + action_emb.astype(jnp.float32)).astype(self.dtype)
                gate = (temb_f @ g_k + g_b)[:, :, None, :]  # [B, F, 1, D]
            else:
                gate = (nn.silu(temb.astype(jnp.float32)).astype(self.dtype)
                        @ g_k + g_b)[:, None, :]
            if self.modulate_enc:
                eg_k = kernel[:, 5 * dim : 6 * dim]
                eg_b = lbias[5 * dim : 6 * dim]
                enc_gate = (nn.silu(temb.astype(jnp.float32)).astype(self.dtype)
                            @ eg_k + eg_b)[:, None, :]
            return None, None, gate, enc_gate
        if action_emb is not None:
            # frame-level video modulation: temb [B, D] + action [B, F, D].
            # Per-frame vectors broadcast over each frame's patches via a
            # [B,F,P,D] reshape — never materializing S-length repeats
            # (the reference's repeat_interleave, semantically identical).
            temb_f = nn.silu(temb[:, None, :].astype(jnp.float32) + action_emb.astype(jnp.float32))
            temb_f = temb_f.astype(self.dtype)
            vid = temb_f @ kernel[:, : 3 * dim] + lbias[: 3 * dim]  # [B, F, 3D]
            shift, scale, gate = jnp.split(vid, 3, axis=-1)
            B, S, D = hidden.shape
            num_frames = action_emb.shape[1]
            hidden_f = hidden.reshape(B * num_frames, S // num_frames, D)
            hidden = mod_rows(hidden_f, scale.reshape(B * num_frames, D),
                              shift.reshape(B * num_frames, D))
            if isinstance(hidden, tuple):  # emit_q8: (xq, per-token scale)
                hidden = (hidden[0].reshape(B, S, D), hidden[1].reshape(B, S))
            else:
                hidden = hidden.reshape(B, S, D)
            gate = gate[:, :, None, :]  # [B, F, 1, D] — applied frame-blocked
            if self.modulate_enc:
                txt = nn.silu(temb.astype(jnp.float32)).astype(self.dtype) @ kernel[:, 3 * dim :] \
                    + lbias[3 * dim :]
                enc_shift, enc_scale, enc_gate = jnp.split(txt, 3, axis=-1)
                enc = mod(enc, enc_scale[:, None, :], enc_shift[:, None, :])
                enc_gate = enc_gate[:, None, :]
            else:
                enc = norm(enc)
        else:
            out = nn.silu(temb.astype(jnp.float32)).astype(self.dtype) @ kernel + lbias
            if self.modulate_enc:
                shift, scale, gate, enc_shift, enc_scale, enc_gate = jnp.split(out, 6, axis=-1)
                enc = mod(enc, enc_scale[:, None, :], enc_shift[:, None, :])
                enc_gate = enc_gate[:, None, :]
            else:
                shift, scale, gate = jnp.split(out, 3, axis=-1)
                enc = norm(enc)
            hidden = mod_rows(hidden, scale, shift)
            gate = gate[:, None, :]

        return hidden, enc, gate, enc_gate


_FUSED_ADALN_OVERRIDE: Optional[bool] = None


@contextmanager
def fused_adaln_override(enabled: bool):
    """Trace-time override of the fused-adaLN auto dispatch. The train-step
    builders wrap their traced bodies in `fused_adaln_override(False)`:
    on-chip A/B (2026-08-19, v5e) measured the fused custom-VJP training
    step at 0.4344 s/step vs 0.4197 for XLA's autodiff of the unfused
    lowering — the fused backward is a net regression under grad, while the
    forward-only serving path keeps a measured win. `enabled=True`
    force-enables the kernels regardless of backend (interpret mode
    off-TPU). Env knobs still take precedence (`ORV_TPU_FUSED_ADALN=0` →
    XLA everywhere, `=force` → Pallas everywhere incl. off-TPU interpret
    mode and training)."""
    global _FUSED_ADALN_OVERRIDE
    prev = _FUSED_ADALN_OVERRIDE
    _FUSED_ADALN_OVERRIDE = enabled
    try:
        yield
    finally:
        _FUSED_ADALN_OVERRIDE = prev


def _fused_adaln_ok() -> bool:
    """Use the fused Pallas adaLN/gated-residual kernels on the TPU backend
    for forward-only (serving) traces; XLA elsewhere — mirroring
    `ops.attention.attention`'s auto dispatch so CPU test meshes never pay
    interpreter-mode Pallas. Training traces run under
    `fused_adaln_override(False)` (fused backward measured slower than
    XLA's — see the contextmanager docstring). `ORV_TPU_FUSED_ADALN=0`
    restores the XLA lowering everywhere; `=force` enables Pallas
    everywhere (interpreter mode off-TPU, used by tests and on-chip A/B)."""
    import os

    v = os.environ.get("ORV_TPU_FUSED_ADALN", "1")
    if v == "0":
        return False
    if v == "force":
        return True
    if _FUSED_ADALN_OVERRIDE is not None:
        # honor BOTH directions: override(False) is the train-step path;
        # override(True) force-enables the kernels regardless of backend
        # (interpret mode off-TPU) — previously silently a no-op
        return _FUSED_ADALN_OVERRIDE
    return jax.default_backend() == "tpu"


def apply_gate(x: jnp.ndarray, gate: jnp.ndarray) -> jnp.ndarray:
    """x + gate * y residual helper: gate is [B,1,D] (global) or [B,F,1,D]
    (per-frame; x reshaped to frame blocks so the gate broadcasts without
    materializing an S-length repeat)."""
    if gate.ndim == 4:
        B, S, D = x.shape
        F = gate.shape[1]
        y = x.reshape(B, F, S // F, D).astype(jnp.float32) * gate.astype(jnp.float32)
        return y.reshape(B, S, D)
    return x.astype(jnp.float32) * gate.astype(jnp.float32)


def gate_residual_add(base: jnp.ndarray, y: jnp.ndarray, gate: jnp.ndarray,
                      fused: bool = False) -> jnp.ndarray:
    """`base + gate * y` (f32 math, base.dtype result). `fused=True` routes
    through the one-pass Pallas kernel (ops/adaln.gated_residual) — the XLA
    lowering materializes the f32 gate broadcast to HBM. Differentiable
    (custom VJP in ops/adaln.py); wired from the model's `quant` flag or
    `_fused_adaln_ok()` (TPU backend, training included)."""
    if fused:
        from orv_tpu.ops.adaln import gated_residual

        B, S, D = base.shape
        if gate.ndim == 4:
            F = gate.shape[1]
            out = gated_residual(base.reshape(B * F, S // F, D),
                                 y.reshape(B * F, S // F, D),
                                 gate.reshape(B * F, D))
            return out.reshape(B, S, D)
        return gated_residual(base, y, gate.reshape(B, D))
    return base + apply_gate(y, gate).astype(base.dtype)


class AdaLayerNormOut(nn.Module):
    """Output AdaLN (reference AdaLayerNorm, cogvideox_control.py:153-197;
    chunk order is (shift, scale) — CogVideoX-specific)."""

    embedding_dim: int  # conditioning dim (time_embed_dim)
    inner_dim: int
    eps: float = 1e-5
    elementwise_affine: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, action_emb=None):
        kernel = self.param(
            "linear_kernel", torch_linear_init, (self.embedding_dim, 2 * self.inner_dim),
            self.param_dtype,
        ).astype(self.dtype)
        lbias = self.param(
            "linear_bias", nn.initializers.zeros, (2 * self.inner_dim,), self.param_dtype
        ).astype(self.dtype)
        scale_p = bias_p = None
        if self.elementwise_affine:
            scale_p = self.param("norm_scale", nn.initializers.ones, (self.inner_dim,), self.param_dtype)
            bias_p = self.param("norm_bias", nn.initializers.zeros, (self.inner_dim,), self.param_dtype)

        if action_emb is not None:
            temb = temb[:, None, :].astype(jnp.float32) + action_emb.astype(jnp.float32)
        out = nn.silu(temb.astype(jnp.float32)).astype(self.dtype) @ kernel + lbias
        shift, scale = jnp.split(out, 2, axis=-1)
        y = _layer_norm(x, scale_p, bias_p, self.eps).astype(jnp.float32)
        if action_emb is not None:
            # per-frame (shift, scale) broadcast over each frame's patches
            B, S, D = x.shape
            F = action_emb.shape[1]
            y = y.reshape(B, F, S // F, D)
            y = y * (1.0 + scale[:, :, None, :].astype(jnp.float32)) \
                + shift[:, :, None, :].astype(jnp.float32)
            return y.reshape(B, S, D).astype(x.dtype)
        y = y * (1.0 + scale[:, None, :].astype(jnp.float32)) + shift[:, None, :].astype(jnp.float32)
        return y.astype(x.dtype)


def quantize_tokens(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token int8 activation quantization (the same math `Int8Dense`
    applies to a bf16 input): returns (xq int8 [..., D], scale f32 [...])
    with scale = absmax/127."""
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-6)
    xq = jnp.round(xf * (127.0 / amax[..., None])).astype(jnp.int8)
    return xq, amax * (1.0 / 127.0)


def concat_q8(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequence-concatenate two token streams into one pre-quantized
    (xq, scale) pair; bf16 inputs are quantized first."""
    aq, ascale = a if isinstance(a, tuple) else quantize_tokens(a)
    bq, bscale = b if isinstance(b, tuple) else quantize_tokens(b)
    return (jnp.concatenate([aq, bq], axis=1),
            jnp.concatenate([ascale, bscale], axis=1))


class Int8Dense(nn.Module):
    """W8A8 dynamically-quantized linear for inference.

    Weights are stored int8 with per-output-channel scales (absmax/127,
    produced by `orv_tpu.models.quantize.quantize_linear_params`);
    activations quantize per token at run time (one VPU pass, fused by XLA
    into the surrounding elementwise work). The matmul runs int8xint8->int32
    on the MXU — 2x the bf16 MACs/cycle on v5e — and int8 weights halve the
    HBM weight stream. Inference-only: `jnp.round` has no useful gradient.

    Param tree: {kernel_q8 [in, out] int8, kernel_scale [out] f32, bias}.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if isinstance(x, tuple):
            # pre-quantized (xq int8, xscale f32 per token) — emitted by the
            # fused adaLN kernel (ops/adaln.modulate_norm_q8), skipping the
            # separate amax + round passes over the activation
            xq, xscale = x
            in_features = xq.shape[-1]
            scale_last = xscale[..., None]
        else:
            in_features = x.shape[-1]
            xq, xscale = quantize_tokens(x)
            scale_last = xscale[..., None]
        kq = self.param(
            "kernel_q8", nn.initializers.zeros, (in_features, self.features), jnp.int8
        )
        ks = self.param("kernel_scale", nn.initializers.ones, (self.features,), jnp.float32)
        y = jax.lax.dot_general(
            xq, kq, (((xq.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        y = y * scale_last * ks
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            y = y + b.astype(jnp.float32)
        return y.astype(self.dtype)


class JointAttention(nn.Module):
    """Joint [text, video] self-attention with per-head qk LayerNorm and
    RoPE on the video token range only (reference CogVideoXAttnProcessor2_0,
    cogvideox_control.py:200-270).

    Torch mapping: to_q/to_k/to_v/to_out.0 kernels transpose; norm_q/norm_k
    are LayerNorm(head_dim, eps=1e-6)."""

    heads: int
    head_dim: int
    qk_norm: bool = True
    bias: bool = True
    out_bias: bool = True
    attn_impl: str = "auto"
    quant: bool = False  # Int8Dense projections (inference-only)
    sp_mesh: Optional[Any] = None  # jax.sharding.Mesh with an `sp` axis
    sp_axis: str = "sp"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, enc=None, rope=None):
        inner = self.heads * self.head_dim
        text_len = 0 if enc is None else enc.shape[1]
        if isinstance(hidden, tuple):
            # pre-quantized video stream from the fused adaLN kernel; the
            # (short) text stream quantizes here and concatenates in int8
            x = hidden if enc is None else concat_q8(enc, hidden)
            B, S, _ = x[0].shape
        else:
            x = hidden if enc is None else jnp.concatenate([enc, hidden], axis=1)
            B, S, _ = x.shape

        if self.quant:
            dense = lambda name: Int8Dense(
                inner, use_bias=self.bias, dtype=self.dtype,
                param_dtype=self.param_dtype, name=name,
            )
        else:
            dense = lambda name: nn.Dense(
                inner, use_bias=self.bias, kernel_init=torch_linear_init,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name,
            )
        q = dense("to_q")(x).reshape(B, S, self.heads, self.head_dim)
        k = dense("to_k")(x).reshape(B, S, self.heads, self.head_dim)
        v = dense("to_v")(x).reshape(B, S, self.heads, self.head_dim)

        if self.qk_norm:
            norm_q = LayerNorm(self.head_dim, eps=1e-6, param_dtype=self.param_dtype, name="norm_q")
            norm_k = LayerNorm(self.head_dim, eps=1e-6, param_dtype=self.param_dtype, name="norm_k")
            q = norm_q(q)
            k = norm_k(k)

        q = q.transpose(0, 2, 1, 3)  # [B, H, S, Dh]
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        if rope is not None:
            cos, sin = rope
            q_vid = apply_rotary_emb(q[:, :, text_len:], cos, sin)
            k_vid = apply_rotary_emb(k[:, :, text_len:], cos, sin)
            if text_len > 0:
                q = jnp.concatenate([q[:, :, :text_len], q_vid], axis=2)
                k = jnp.concatenate([k[:, :, :text_len], k_vid], axis=2)
            else:
                q, k = q_vid, k_vid

        sp_size = self.sp_mesh.shape[self.sp_axis] if self.sp_mesh is not None else 1
        if sp_size > 1:
            # sequence-parallel: video tokens ring over the `sp` axis,
            # text replicated (ops/ring_attention.py). On a multi-axis
            # train mesh the specs carry the dp batch sharding through the
            # shard_map so dp x sp composes without a gather.
            if (S - text_len) % sp_size != 0:
                raise ValueError(
                    f"sequence-parallel sp={sp_size} needs the video token "
                    f"count ({S - text_len}) divisible by sp — pick frame/"
                    f"resolution so (F*H*W/patch^2) % sp == 0")
            from orv_tpu.ops.ring_attention import joint_ring_attention, ring_attention
            batch_axes = tuple(
                a for a in ("dp", "fsdp")
                if self.sp_mesh.shape.get(a, 1) > 1
            ) or None
            sm = QK_NORM_LOGIT_BOUND if self.qk_norm else None
            if text_len > 0:
                out = joint_ring_attention(q, k, v, text_len, self.sp_mesh,
                                           self.sp_axis, impl=self.attn_impl,
                                           batch_axes=batch_axes, static_max=sm)
            else:
                out = ring_attention(q, k, v, self.sp_mesh, self.sp_axis,
                                     impl=self.attn_impl, batch_axes=batch_axes,
                                     static_max=sm)
        else:
            out = attention(
                q, k, v, impl=self.attn_impl,
                static_max=QK_NORM_LOGIT_BOUND if self.qk_norm else None,
            )  # [B, H, S, Dh]
        out = out.transpose(0, 2, 1, 3).reshape(B, S, inner)
        if self.quant:
            out = Int8Dense(inner, use_bias=self.out_bias, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="to_out")(out)
        else:
            out = nn.Dense(
                inner, use_bias=self.out_bias, kernel_init=torch_linear_init,
                dtype=self.dtype, param_dtype=self.param_dtype, name="to_out",
            )(out)
        if enc is None:
            return out, None
        return out[:, text_len:], out[:, :text_len]


class FeedForward(nn.Module):
    """gelu(tanh) MLP, 4x expansion (torch mapping: ff.net.0.proj, ff.net.2)."""

    dim: int
    mult: int = 4
    quant: bool = False  # Int8Dense matmuls (inference-only)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.quant:
            dense = lambda feats, name: Int8Dense(
                feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        else:
            dense = lambda feats, name: nn.Dense(
                feats, kernel_init=torch_linear_init,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        h = dense(self.dim * self.mult, "net_0_proj")(x)
        h = nn.gelu(h, approximate=True)
        return dense(self.dim, "net_2")(h)


class DiTBlock(nn.Module):
    """Attention + FF block with action-aware adaLN gates (reference
    CogVideoXBlock, cogvideox_control.py:351-445). In the 3-chunk regime
    attention and FF see video tokens only; in the 6-chunk regime text and
    video jointly attend and jointly pass the FF."""

    dim: int
    heads: int
    head_dim: int
    time_embed_dim: int
    modulate_enc: bool = False
    attention_bias: bool = True
    qk_norm: bool = True
    norm_eps: float = 1e-5
    attn_impl: str = "auto"
    quant: bool = False  # int8 attention projections + FF (inference-only)
    sp_mesh: Optional[Any] = None
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, enc, temb, rope=None, action_emb=None,
                 cached_attn=None, return_attn: bool = False):
        # cached_attn / return_attn: PAB attention broadcast (Pyramid
        # Attention Broadcast, arxiv 2408.12588; pipelines/sample.py).
        # cached_attn=(attn_h, attn_e) substitutes a previous step's
        # pre-gate attention outputs — norm1 then runs gates_only and the
        # whole QKV/attention/out-proj is skipped statically. return_attn
        # additionally returns this block's (attn_h, attn_e) for caching.
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        fused = self.quant or _fused_adaln_ok()
        norm1 = AdaLNZero(self.time_embed_dim, self.dim, self.modulate_enc,
                          self.norm_eps, fused=fused, emit_q8=self.quant,
                          name="norm1", **kw)
        norm2 = AdaLNZero(self.time_embed_dim, self.dim, self.modulate_enc,
                          self.norm_eps, fused=fused, emit_q8=self.quant,
                          name="norm2", **kw)
        attn = JointAttention(self.heads, self.head_dim, self.qk_norm,
                              self.attention_bias, True, self.attn_impl,
                              quant=self.quant, sp_mesh=self.sp_mesh, name="attn1", **kw)
        ff = FeedForward(self.dim, quant=self.quant, name="ff", **kw)

        if cached_attn is not None:
            _, _, gate, enc_gate = norm1(hidden, enc, temb, action_emb,
                                         gates_only=True)
            attn_h, attn_e = cached_attn
        else:
            n_hidden, n_enc, gate, enc_gate = norm1(hidden, enc, temb, action_emb)
            attn_h, attn_e = attn(n_hidden, n_enc if self.modulate_enc else None, rope)
        hidden = gate_residual_add(hidden, attn_h, gate, fused=fused)
        if self.modulate_enc:
            enc = gate_residual_add(enc, attn_e, enc_gate, fused=fused)

        n_hidden, n_enc, gate_ff, enc_gate_ff = norm2(hidden, enc, temb, action_emb)
        if not self.modulate_enc:
            ff_out = ff(n_hidden)
            hidden = gate_residual_add(hidden, ff_out, gate_ff, fused=fused)
        else:
            text_len = enc.shape[1]
            if isinstance(n_hidden, tuple):
                ff_out = ff(concat_q8(n_enc, n_hidden))
            else:
                ff_out = ff(jnp.concatenate([n_enc, n_hidden], axis=1))
            hidden = gate_residual_add(hidden, ff_out[:, text_len:], gate_ff, fused=fused)
            enc = gate_residual_add(enc, ff_out[:, :text_len], enc_gate_ff, fused=fused)
        if return_attn:
            return hidden, enc, (attn_h, attn_e)
        return hidden, enc


class MVBlock(nn.Module):
    """Cross-view attention before each DiT block (reference MVBlock,
    cogvideox_control.py:273-348): rearrange (b v)(f s) -> (b f)(v s),
    attend across views per frame, zero-init proj_out gated residual.
    `cam_encoder` is a zero-init Linear(12, dim) that the reference defines
    but never calls — kept for checkpoint parity."""

    dim: int
    heads: int
    head_dim: int
    time_embed_dim: int
    modulate_enc: bool = False
    attention_bias: bool = False
    norm_eps: float = 1e-5
    attn_impl: str = "auto"
    quant: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, enc, temb, rope_view=None, n_view: int = 1, n_frame: int = 1):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        fused = self.quant or _fused_adaln_ok()
        norm1 = AdaLNZero(self.time_embed_dim, self.dim, self.modulate_enc,
                          self.norm_eps, fused=fused, name="norm1", **kw)
        attn = JointAttention(self.heads, self.head_dim, True, self.attention_bias,
                              True, self.attn_impl, quant=self.quant, name="attn1", **kw)
        # dead-but-checkpointed params
        self.param("cam_encoder_kernel", nn.initializers.zeros, (12, self.dim), self.param_dtype)
        self.param("cam_encoder_bias", nn.initializers.zeros, (self.dim,), self.param_dtype)

        n_hidden, n_enc, gate, _ = norm1(hidden, enc, temb, None)
        n_hidden = rearrange(n_hidden, "(b v) (f s) d -> (b f) (v s) d", v=n_view, f=n_frame)
        if self.modulate_enc:
            n_enc = rearrange(n_enc, "(b v) n d -> b (v n) d", v=n_view)
            n_enc = repeat(n_enc, "b n d -> (b f) n d", f=n_frame)
        attn_h, _ = attn(n_hidden, n_enc if self.modulate_enc else None, rope_view)
        attn_h = nn.Dense(
            self.dim, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out",
        )(attn_h)
        attn_h = rearrange(attn_h, "(b f) (v s) d -> (b v) (f s) d", v=n_view, f=n_frame)
        return gate_residual_add(hidden, attn_h, gate, fused=fused)


class PatchEmbed(nn.Module):
    """Shared text+video patch embedding (diffusers CogVideoXPatchEmbed
    semantics; used for both latents and visual-control maps — reference
    cogvideox_control.py:531-547, 827-858).

    Video patches flatten (c, ph, pw) [or (c, pt, ph, pw) for 1.5] so a
    torch conv kernel [D, C, ph, pw] maps to ours via
    rearrange('d c ph pw -> (c ph pw) d').

    The 2b-family sin-cos positional table is computed on the fly for the
    actual (T, H, W) grid — equal to the reference's precomputed-slice when
    shapes match its sample grid (they must, for pretrained weights).
    """

    embed_dim: int
    patch_size: int = 2
    patch_size_t: Optional[int] = None
    patch_bias: bool = True
    use_positional_embeddings: bool = True
    spatial_interpolation_scale: float = 1.875
    temporal_interpolation_scale: float = 1.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text_embeds, image_embeds):
        # image_embeds: [B, F, H, W, C] channels-last
        text = nn.Dense(
            self.embed_dim, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="text_proj",
        )(text_embeds)

        p, pt = self.patch_size, self.patch_size_t
        if pt is None:
            patches = rearrange(
                image_embeds, "b f (h p1) (w p2) c -> b (f h w) (c p1 p2)", p1=p, p2=p
            )
            grid_t = image_embeds.shape[1]
        else:
            patches = rearrange(
                image_embeds, "b (f pt) (h p1) (w p2) c -> b (f h w) (c pt p1 p2)",
                pt=pt, p1=p, p2=p,
            )
            grid_t = image_embeds.shape[1] // pt
        video = nn.Dense(
            self.embed_dim, use_bias=self.patch_bias, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="proj",
        )(patches)

        if self.use_positional_embeddings:
            grid_h = image_embeds.shape[2] // p
            grid_w = image_embeds.shape[3] // p
            pos = get_3d_sincos_pos_embed(
                self.embed_dim, (grid_w, grid_h), grid_t,
                self.spatial_interpolation_scale, self.temporal_interpolation_scale,
            ).reshape(1, -1, self.embed_dim)
            video = video + jnp.asarray(pos, dtype=video.dtype)

        return jnp.concatenate([text, video], axis=1)


class TimestepEmbedding(nn.Module):
    """Sinusoidal proj -> 2-layer MLP (diffusers TimestepEmbedding; torch
    mapping: time_embedding.linear_1/linear_2)."""

    in_dim: int
    time_embed_dim: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        h = nn.Dense(
            self.time_embed_dim, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="linear_1",
        )(t_emb.astype(self.dtype))
        h = nn.silu(h)
        return nn.Dense(
            self.time_embed_dim, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="linear_2",
        )(h)


class ActionEmbed(nn.Module):
    """7-DoF action sequence -> per-latent-frame embedding (reference
    components.py:20-71). Pads the first frame, groups `compress_ratio`
    (x patch_size_t) consecutive frames, MLP to hidden_size. During
    training, 10% of the batch is replaced with a learned mask embedding
    (action-CFG); the mask uses the 'action_mask' rng stream."""

    state_dim: int
    hidden_size: int
    compress_ratio: int = 4
    patch_size_t: Optional[int] = None
    mask_prob: float = 0.1
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, F, sd = x.shape
        if sd != self.state_dim:
            raise ValueError(f"action dim {sd} != {self.state_dim}")
        pt = self.patch_size_t or 1
        x = jnp.concatenate([jnp.zeros_like(x[:, :1]), x], axis=1)  # pad first frame
        if self.compress_ratio > 1:
            x = x.reshape(B, (F + 1) // self.compress_ratio, -1)
        if pt > 1:
            x = x.reshape(B, x.shape[1] // pt, -1)
        h = nn.Dense(
            self.hidden_size * 4, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="fc1",
        )(x.astype(self.dtype))
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(
            self.hidden_size, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="fc2",
        )(h)

        mask_embed = self.param(
            "mask_embed", nn.initializers.normal(1.0), (self.hidden_size,), self.param_dtype
        )
        if deterministic:
            is_mask = jnp.zeros((B,), dtype=bool)
        else:
            rng = self.make_rng("action_mask")
            is_mask = jax.random.uniform(rng, (B,)) < self.mask_prob
            h = jnp.where(is_mask[:, None, None], mask_embed.astype(h.dtype)[None, None, :], h)
        return h, is_mask


class ActionRecon(nn.Module):
    """Inverse-dynamics head (reference components.py:74-104): per-frame
    hidden -> 7-DoF x compress_ratio actions, first padded frame dropped."""

    state_dim: int
    hidden_size: int
    compress_ratio: int = 4
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, F, _ = x.shape
        h = nn.Dense(
            self.hidden_size * 4, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="fc1",
        )(x)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(
            self.state_dim * self.compress_ratio, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="fc2",
        )(h)
        if self.compress_ratio > 1:
            h = h.reshape(B, F * self.compress_ratio, self.state_dim)
        return h[:, 1:]  # drop the padded first frame


class FloatGroupNorm(nn.Module):
    """GroupNorm computed in the param dtype then cast back (reference
    components.py:107-109). Aux module for the Fuser."""

    groups: int
    channels: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), self.param_dtype)
        orig = x.dtype
        xf = x.astype(jnp.float32)
        g = xf.reshape(*xf.shape[:-1], self.groups, self.channels // self.groups)
        mean = g.mean(axis=(-3, -1), keepdims=True) if xf.ndim >= 3 else g.mean(-1, keepdims=True)
        var = g.var(axis=(-3, -1), keepdims=True) if xf.ndim >= 3 else g.var(-1, keepdims=True)
        g = (g - mean) * jax.lax.rsqrt(var + 1e-5)
        y = g.reshape(xf.shape) * scale + bias
        return y.astype(orig)


class Fuser(nn.Module):
    """Spatio-temporal FiLM over action hidden states (reference
    components.py:121-162). Defined by the reference but UNREFERENCED by
    its main training/inference path — provided for inventory parity and
    experimentation; zero-init temporal projections make it an identity
    at init."""

    action_in_channel: int = 128
    out_channels: int = 1152
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, action_hidden_states):
        # h: [B, F, P, D]; action_hidden_states: [B, F, P, action_in_channel]
        B, F, P, D = action_hidden_states.shape
        dense = lambda feats, name, zero=False: nn.Dense(
            feats, kernel_init=nn.initializers.zeros if zero else torch_linear_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        gamma = dense(self.out_channels // 4, "gamma_spatial")(action_hidden_states)
        beta = dense(self.out_channels // 4, "beta_spatial")(action_hidden_states)
        # temporal mixing over F, zero-init (identity at init)
        gamma = rearrange(gamma, "b f p d -> (b p) f d")
        beta = rearrange(beta, "b f p d -> (b p) f d")
        gamma = dense(self.out_channels, "gamma_temporal", zero=True)(gamma)
        beta = dense(self.out_channels, "beta_temporal", zero=True)(beta)
        gamma = rearrange(gamma, "(b p) f d -> b f p d", p=P)
        beta = rearrange(beta, "(b p) f d -> b f p d", p=P)
        normed = FloatGroupNorm(min(32, h.shape[-1]), h.shape[-1], self.param_dtype,
                                name="traj_cond_norm")(h)
        return h + normed * gamma + beta


class ConditioningEmbedding(nn.Module):
    """ControlNet-style conv encoder for raw condition images (reference
    components.py:165-197; defined but unused on the reference main path).
    x: [B, H, W, C] -> [B, H/8, W/8, embed_channels]."""

    embedding_channels: int
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda feats, stride, name: nn.Conv(
            feats, (3, 3), strides=(stride, stride), padding=1,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        h = nn.silu(conv(self.block_out_channels[0], 1, "conv_in")(x))
        for i in range(len(self.block_out_channels) - 1):
            h = nn.silu(conv(self.block_out_channels[i], 1, f"block_{2*i}")(h))
            h = nn.silu(conv(self.block_out_channels[i + 1], 2, f"block_{2*i+1}")(h))
        return conv(self.embedding_channels, 1, "conv_out")(h)

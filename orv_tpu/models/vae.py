"""Causal 3D VAE (CogVideoX family), TPU-native.

Re-implementation of the AutoencoderKLCogVideoX architecture the reference
depends on for all latent IO (SURVEY.md L3; reference loads it via
diffusers at train_…sft.py:331-339 and encodes offline in
encode_dataset.py:793-927). Semantics reproduced:

  * causal conv3d: temporal front-pad replicates the FIRST frame
    (k_t - 1 copies) — this is why clips obey the 8n+1 frame rule and the
    first latent frame is "single" (dataset.py vae_has_first_single_frame)
  * temporal compression x4 via two "keep-first-frame, avg-pool-pairs"
    downsamples; spatial x8 via three stride-2 convs
  * decoder resnets normalize with SpatialNorm3D conditioned on the latent
    (zq), nearest-upsampled per the odd-first-frame split
  * encode returns MOMENTS [B, 2C, T', H', W'] (mean ‖ logvar), matching
    the on-disk latent convention (train_…sft.py:890-898)

Layouts: public API is [B, C, T, H, W] (reference convention); internals
are channels-last [B, T, H, W, C] for TPU conv efficiency. Weight mapping
from torch: conv3d [O, I, kT, kH, kW] -> transpose(2, 3, 4, 1, 0).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """CogVideoX-2b VAE config (HF vae/config.json values)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    temporal_compression_ratio: int = 4
    scaling_factor: float = 1.15258426
    invert_scale_latents: bool = False

    @property
    def temporal_compress_level(self) -> int:
        import math

        return int(math.log2(self.temporal_compression_ratio))


def _group_norm(x, scale, bias, groups, eps):
    """GroupNorm over channels-last [..., C], f32 math."""
    orig = x.dtype
    x = x.astype(jnp.float32)
    C = x.shape[-1]
    g = x.reshape(x.shape[0], -1, groups, C // groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    x = g.reshape(x.shape)
    x = x * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return x.astype(orig)


class GroupNorm(nn.Module):
    channels: int
    groups: int = 32
    eps: float = 1e-6
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), self.param_dtype)
        return _group_norm(x, scale, bias, self.groups, self.eps)


class _TapConv(nn.Module):
    """3D conv computed as kt accumulated 2D convs over the temporal taps
    (y_t = sum_k w[k] *2d* x_{t+k}), T folded into the conv batch dim.

    Mathematically identical to one conv3d call, but v5e runs XLA's 2D
    convolutions ~25% faster than 3D at the decoder's shapes (measured:
    44.5 -> 55.2 TF/s at [24, 320, 480, 128]x128). Param layout matches
    nn.Conv exactly (kernel [kt, kh, kw, I, O] + bias) so torch checkpoint
    mapping and existing orbax trees are unaffected."""

    features: int
    kernel_size: Tuple[int, int, int]
    padding_hw: Tuple[int, int]
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        Cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kt, kh, kw, Cin, self.features), self.param_dtype,
        ).astype(self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype).astype(self.dtype)
        B, T, H, W, _ = x.shape
        T_out = T - (kt - 1)
        ph, pw = self.padding_hw
        dn = jax.lax.conv_dimension_numbers(
            (B * T_out, H, W, Cin), (kh, kw, Cin, self.features),
            ("NHWC", "HWIO", "NHWC"),
        )
        y = None
        for k in range(kt):
            xk = x[:, k:k + T_out].reshape(B * T_out, H, W, Cin)
            part = jax.lax.conv_general_dilated(
                xk, kernel[k], (1, 1), [(ph, ph), (pw, pw)], dimension_numbers=dn,
            )
            y = part if y is None else y + part
        y = y + bias
        return y.reshape(B, T_out, y.shape[1], y.shape[2], self.features)


class CausalConv3d(nn.Module):
    """conv3d with first-frame-replicate temporal front pad + zero spatial
    SAME pad. x: [B, T, H, W, C].

    Streaming mode (the reference's fake_context_parallel_forward conv
    cache): when called with `first_chunk=False` under a mutable "cache"
    collection, the temporal front pad comes from the previous chunk's last
    kt-1 frames instead of first-frame replication, so frame-chunked
    encode/decode is causally continuous across chunks."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, first_chunk: bool = True):
        kt, kh, kw = self.kernel
        if kt > 1:
            # streaming only when the caller explicitly opened a mutable
            # "cache" collection at apply time (init must stay cache-free)
            streaming = self.is_mutable_collection("cache") and not self.is_initializing()
            if first_chunk:
                pad = jnp.repeat(x[:, :1], kt - 1, axis=1)
            else:
                cache = self.get_variable("cache", "conv_cache")
                if cache is None:
                    raise ValueError("first_chunk=False requires a primed cache")
                pad = cache.astype(x.dtype)
            padded = jnp.concatenate([pad, x], axis=1)
            if streaming:
                self.put_variable("cache", "conv_cache", padded[:, -(kt - 1):])
            x = padded
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        import os

        if (kt > 1 and self.strides == (1, 1, 1)
                and os.environ.get("ORV_TPU_CONV3D_TAPS", "1") != "0"):
            # hot path: per-tap 2D decomposition (see _TapConv)
            return _TapConv(self.features, self.kernel, (ph, pw),
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name="conv")(x)
        return nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=((0, 0), (ph, ph), (pw, pw)),
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)


class SpatialNorm3D(nn.Module):
    """Decoder norm conditioned on the latent zq (GroupNorm(f) * conv_y(zq)
    + conv_b(zq)), zq nearest-resized with the odd-first-frame split."""

    f_channels: int
    zq_channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, f, zq, first_chunk: bool = True):
        def resize(z, t, h, w):
            # nearest-neighbor to (t, h, w)
            B, zt, zh, zw, C = z.shape
            if (zt, zh, zw) != (t, h, w):
                z = jax.image.resize(z, (B, t, h, w, C), method="nearest")
            return z

        T, H, W = f.shape[1], f.shape[2], f.shape[3]
        if first_chunk and T > 1 and T % 2 == 1:
            # the leading single frame resizes separately (full-clip layout)
            z_first = resize(zq[:, :1], 1, H, W)
            z_rest = resize(zq[:, 1:], T - 1, H, W)
            zq = jnp.concatenate([z_first, z_rest], axis=1)
        else:
            zq = resize(zq, T, H, W)
        conv = lambda name: CausalConv3d(
            self.f_channels, (1, 1, 1), dtype=self.dtype, param_dtype=self.param_dtype,
            name=name,
        )
        norm_f = GroupNorm(self.f_channels, self.groups, self.eps,
                           param_dtype=self.param_dtype, name="norm_layer")(f)
        return norm_f * conv("conv_y")(zq) + conv("conv_b")(zq)


class ResnetBlock3D(nn.Module):
    in_channels: int
    out_channels: int
    spatial_norm_zq: bool = False
    zq_channels: int = 16
    groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq=None, first_chunk: bool = True):
        def norm(name, ch, h):
            if self.spatial_norm_zq:
                return SpatialNorm3D(ch, self.zq_channels, self.groups, self.eps,
                                     self.dtype, self.param_dtype, name=name)(h, zq, first_chunk)
            return GroupNorm(ch, self.groups, self.eps, self.param_dtype, name=name)(h)

        h = norm("norm1", self.in_channels, x)
        h = CausalConv3d(self.out_channels, (3, 3, 3), dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv1")(nn.silu(h), first_chunk)
        h = norm("norm2", self.out_channels, h)
        h = CausalConv3d(self.out_channels, (3, 3, 3), dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv2")(nn.silu(h), first_chunk)
        if self.in_channels != self.out_channels:
            x = CausalConv3d(self.out_channels, (1, 1, 1), dtype=self.dtype,
                             param_dtype=self.param_dtype, name="conv_shortcut")(x)
        return x + h


class Downsample3D(nn.Module):
    """Spatial stride-2 conv (asymmetric (0,1) pad); optional temporal
    keep-first + avg-pool-pairs compression."""

    channels: int
    compress_time: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, first_chunk: bool = True):
        if self.compress_time:
            T = x.shape[1]
            if first_chunk and T % 2 == 1 and T > 1:
                first, rest = x[:, :1], x[:, 1:]
                rest = 0.5 * (rest[:, 0::2] + rest[:, 1::2])
                x = jnp.concatenate([first, rest], axis=1)
            elif T > 1:
                x = 0.5 * (x[:, 0::2] + x[:, 1::2])
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.channels, (1, 3, 3), strides=(1, 2, 2), padding="VALID",
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)


class _PhaseUpConv(nn.Module):
    """Nearest-2x-spatial-upsample + 3x3 conv, computed WITHOUT the
    upsample: on a nearest-upsampled grid every 3x3 window touches at most
    2x2 distinct source pixels, so the conv decomposes exactly into four
    phase convs with collapsed 2x2 kernels at the LOW resolution plus a
    pixel interleave — 16 taps/low-res pixel instead of 9 taps x 4
    high-res pixels = 2.25x fewer MACs, and the 4x-size upsampled
    intermediate never materializes. Phase (a, b) of the output,
    out[2i+a, 2j+b], sees source rows {i-1, i} (a=0, weights
    [w0, w1+w2]) or {i, i+1} (a=1, [w0+w1, w2]) and likewise columns;
    boundary zero-pads mirror the original SAME padding. Param layout
    matches nn.Conv's (1,3,3) kernel exactly ([1,3,3,I,O] + bias) so torch
    checkpoint mapping and orbax trees are unaffected."""

    features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, Cin = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 3, 3, Cin, self.features), self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype).astype(self.dtype)
        k = kernel[0]  # [3, 3, I, O]; collapse in f32, cast once
        rows = {0: jnp.stack([k[0], k[1] + k[2]], 0),
                1: jnp.stack([k[0] + k[1], k[2]], 0)}  # [2, 3, I, O]

        def cols(r, b):
            if b == 0:
                return jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], 1)
            return jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], 1)  # [2, 2, I, O]

        x2 = x.reshape(B * T, H, W, Cin)
        dn = jax.lax.conv_dimension_numbers(
            x2.shape, (2, 2, Cin, self.features), ("NHWC", "HWIO", "NHWC"))
        phases = []
        for a in (0, 1):
            for b in (0, 1):
                kab = cols(rows[a], b).astype(self.dtype)
                y = jax.lax.conv_general_dilated(
                    x2, kab, (1, 1), [(1 - a, a), (1 - b, b)],
                    dimension_numbers=dn)
                phases.append(y)
        y = jnp.stack(phases, axis=-2)  # [BT, H, W, (a b), O]
        y = y.reshape(B * T, H, W, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, T, 2 * H, 2 * W, self.features)
        return y + bias


class Upsample3D(nn.Module):
    """Nearest 2x spatial upsample + 3x3 conv; with compress_time, the
    first frame upsamples spatially only and the rest also duplicate in
    time (odd-length convention).

    `ORV_TPU_UPSAMPLE_PHASE=1` opts into the phase-decomposed conv
    (_PhaseUpConv) with the temporal duplication applied AFTER it — the
    conv has no temporal taps, so nearest frame duplication commutes with
    it exactly, halving the conv work again on compress_time stages. It is
    exact (tests/test_vae.py) but OFF by default: XLA cost analysis says
    it removes only ~5% of decode FLOPs, and the one on-chip A/B landed so
    far (chunk 2, contended window, 2026-08-19) had it 2.4x SLOWER — the
    4-phase stack+transpose interleave is the same VPU-relayout-bound op
    class as the conv3d shifted-window and int8-PV dead ends. Default
    stays the literal upsample-then-conv lowering until a quiet-window A/B
    proves the phase path wins."""

    channels: int
    compress_time: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, first_chunk: bool = True):
        import os

        B, T, H, W, C = x.shape
        phase = os.environ.get("ORV_TPU_UPSAMPLE_PHASE", "0") == "1"

        def up(z, t_scale):
            b, t, h, w, c = z.shape
            return jax.image.resize(z, (b, t * t_scale, h * 2, w * 2, c), method="nearest")

        if phase:
            y = _PhaseUpConv(self.channels, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="conv")(x)
            rep = lambda z: jnp.repeat(z, 2, axis=1)
            if self.compress_time:
                if first_chunk and T > 1 and T % 2 == 1:
                    y = jnp.concatenate([y[:, :1], rep(y[:, 1:])], axis=1)
                elif T > 1 or not first_chunk:
                    y = rep(y)
            return y

        if self.compress_time:
            if first_chunk and T > 1 and T % 2 == 1:
                x = jnp.concatenate([up(x[:, :1], 1), up(x[:, 1:], 2)], axis=1)
            elif T > 1:
                x = up(x, 2)
            elif first_chunk:
                x = up(x, 1)
            else:
                x = up(x, 2)
        else:
            x = up(x, 1)
        return nn.Conv(
            self.channels, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)


class Encoder3D(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, first_chunk: bool = True):
        c = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ch = c.block_out_channels[0]
        h = CausalConv3d(ch, (3, 3, 3), name="conv_in", **kw)(x, first_chunk)

        for i, out_ch in enumerate(c.block_out_channels):
            for j in range(c.layers_per_block):
                h = ResnetBlock3D(
                    ch if j == 0 else out_ch, out_ch, groups=c.norm_num_groups,
                    eps=c.norm_eps, name=f"down_{i}_res_{j}", **kw,
                )(h, first_chunk=first_chunk)
            ch = out_ch
            if i < len(c.block_out_channels) - 1:
                h = Downsample3D(
                    out_ch, compress_time=i < c.temporal_compress_level,
                    name=f"down_{i}_downsample", **kw,
                )(h, first_chunk)

        for j in range(2):
            h = ResnetBlock3D(ch, ch, groups=c.norm_num_groups, eps=c.norm_eps,
                              name=f"mid_res_{j}", **kw)(h, first_chunk=first_chunk)
        h = GroupNorm(ch, c.norm_num_groups, c.norm_eps, self.param_dtype, name="norm_out")(h)
        return CausalConv3d(2 * c.latent_channels, (3, 3, 3), name="conv_out", **kw)(
            nn.silu(h), first_chunk
        )


class Decoder3D(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, first_chunk: bool = True):
        c = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        reversed_ch = tuple(reversed(c.block_out_channels))  # (512, 256, 256, 128)
        ch = reversed_ch[0]
        h = CausalConv3d(ch, (3, 3, 3), name="conv_in", **kw)(z, first_chunk)

        for j in range(2):
            h = ResnetBlock3D(ch, ch, spatial_norm_zq=True, zq_channels=c.latent_channels,
                              groups=c.norm_num_groups, eps=c.norm_eps,
                              name=f"mid_res_{j}", **kw)(h, z, first_chunk)

        for i, out_ch in enumerate(reversed_ch):
            for j in range(c.layers_per_block + 1):
                h = ResnetBlock3D(
                    ch if j == 0 else out_ch, out_ch, spatial_norm_zq=True,
                    zq_channels=c.latent_channels, groups=c.norm_num_groups,
                    eps=c.norm_eps, name=f"up_{i}_res_{j}", **kw,
                )(h, z, first_chunk)
            ch = out_ch
            if i < len(reversed_ch) - 1:
                h = Upsample3D(
                    out_ch, compress_time=i < c.temporal_compress_level,
                    name=f"up_{i}_upsample", **kw,
                )(h, first_chunk)

        h = SpatialNorm3D(ch, c.latent_channels, c.norm_num_groups, c.norm_eps,
                          self.dtype, self.param_dtype, name="norm_out")(h, z, first_chunk)
        return CausalConv3d(c.out_channels, (3, 3, 3), name="conv_out", **kw)(nn.silu(h), first_chunk)


class CausalVAE(nn.Module):
    """encode(video [B,C,T,H,W] in [-1,1]) -> moments [B,2C_lat,T',H',W'];
    decode(latents [B,C_lat,T',H',W']) -> video. T must be 8n+1 (or a
    multiple of the compression with the first-frame rule)."""

    config: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder3D(self.config, self.dtype, self.param_dtype)
        self.decoder = Decoder3D(self.config, self.dtype, self.param_dtype)

    def encode(self, video, first_chunk: bool = True):
        x = jnp.transpose(video, (0, 2, 3, 4, 1)).astype(self.dtype)  # -> BTHWC
        moments = self.encoder(x, first_chunk)
        return jnp.transpose(moments, (0, 4, 1, 2, 3)).astype(jnp.float32)

    def decode(self, latents, first_chunk: bool = True):
        z = jnp.transpose(latents, (0, 2, 3, 4, 1)).astype(self.dtype)
        video = self.decoder(z, first_chunk)
        return jnp.transpose(video, (0, 4, 1, 2, 3)).astype(jnp.float32)

    def __call__(self, video, rng=None):
        """encode -> sample -> decode roundtrip (for tests)."""
        moments = self.encode(video)
        mean, logvar = jnp.split(moments, 2, axis=1)
        if rng is not None:
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * jax.random.normal(
                rng, mean.shape
            )
        else:
            z = mean
        return self.decode(z), moments


def tiled_decode(
    decode_fn,
    latents,
    tile_latent_h: int = 24,
    tile_latent_w: int = 32,
    overlap: int = 8,
    out_channels: int = 3,
    temporal_expand: int = 4,
):
    """Spatially tiled VAE decode with normalized linear-ramp overlap-add.

    The reference enables diffusers' enable_tiling for exactly this reason:
    the 128-channel full-resolution decoder activations do not fit HBM for
    49x320x480 clips. Tiles are uniform (the latent is zero-padded) and the
    tile loop is a `lax.scan`, so ONE decoder trace/compile serves every
    tile. Pairwise-overlap blending matches the reference's blend_h/blend_v
    cross-fade.

    decode_fn: pure fn, latent tile [B, C, T, th, tw] -> video
    [B, out_channels, T_out, th*8, tw*8] (e.g. closes over vae params).
    """
    import numpy as np

    B, C, T, H, W = latents.shape
    sf = 8
    th = min(tile_latent_h, H)
    tw = min(tile_latent_w, W)
    overlap = min(overlap, max(0, min(th, tw) - 1))
    if H <= th and W <= tw:
        overlap = 0  # single tile: no seams to blend
    step_h = max(1, th - overlap)
    step_w = max(1, tw - overlap)
    n_th = 1 if H <= th else -(-(H - th) // step_h) + 1
    n_tw = 1 if W <= tw else -(-(W - tw) // step_w) + 1
    pad_h = (n_th - 1) * step_h + th - H
    pad_w = (n_tw - 1) * step_w + tw - W
    z = jnp.pad(latents, ((0, 0), (0, 0), (0, 0), (0, pad_h), (0, pad_w)))

    def ramp(n_px, ov_px):
        w = np.ones(n_px)
        if ov_px > 0:
            r = (np.arange(ov_px) + 1.0) / (ov_px + 1.0)  # strictly > 0
            w[:ov_px] = r
            w[-ov_px:] = r[::-1]
        return w

    ov_px = overlap * sf
    w2d = np.outer(ramp(th * sf, ov_px), ramp(tw * sf, ov_px))
    w_tile = jnp.asarray(w2d, dtype=jnp.float32)[None, None, None]

    positions = np.array(
        [(ti * step_h, tj * step_w) for ti in range(n_th) for tj in range(n_tw)],
        dtype=np.int32,
    )
    T_out = (T - 1) * temporal_expand + 1 if T > 1 else 1
    Hp, Wp = z.shape[3] * sf, z.shape[4] * sf
    tile_out_shape = (B, out_channels, T_out, th * sf, tw * sf)

    def body(carry, pos):
        canvas, weight = carry
        i, j = pos[0] * sf, pos[1] * sf
        tile = jax.lax.dynamic_slice(z, (0, 0, 0, pos[0], pos[1]), (B, C, T, th, tw))
        dec = decode_fn(tile).astype(jnp.float32) * w_tile
        cur = jax.lax.dynamic_slice(canvas, (0, 0, 0, i, j), tile_out_shape)
        canvas = jax.lax.dynamic_update_slice(canvas, cur + dec, (0, 0, 0, i, j))
        wcur = jax.lax.dynamic_slice(weight, (0, 0, 0, i, j), (1, 1, 1, th * sf, tw * sf))
        weight = jax.lax.dynamic_update_slice(weight, wcur + w_tile, (0, 0, 0, i, j))
        return (canvas, weight), None

    canvas0 = jnp.zeros((B, out_channels, T_out, Hp, Wp), jnp.float32)
    weight0 = jnp.zeros((1, 1, 1, Hp, Wp), jnp.float32)
    (canvas, weight), _ = jax.lax.scan(body, (canvas0, weight0), jnp.asarray(positions))
    return (canvas / weight)[:, :, :, : H * sf, : W * sf]


@functools.cache
def _encode_jits(vae: "CausalVAE"):
    """Per-module jitted encode callables (cached so repeated chunked /
    short encodes across samples reuse one traced program per shape)."""
    one = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode))
    first = jax.jit(lambda p, x: vae.apply(
        {"params": p}, x, first_chunk=True, method=vae.encode,
        mutable=["cache"]))
    rest = jax.jit(lambda p, x, c: vae.apply(
        {"params": p, "cache": c}, x, first_chunk=False, method=vae.encode,
        mutable=["cache"]))
    return one, first, rest


def encode_auto(vae: "CausalVAE", params, video, chunk_frames: int = 8):
    """Encode [B,C,T,H,W], streaming through `encode_chunked` when the clip
    is longer than one chunk (full-clip encoder activations at the flagship
    49x320x480 exceed a 16GB chip) and the one-shot `vae.encode` otherwise.
    The single dispatch point for every raw-pixel caller (offline encoding
    and `load_tensors: false` evaluation)."""
    if video.shape[2] > chunk_frames + 1:
        return encode_chunked(vae, params, video, chunk_frames=chunk_frames)
    return _encode_jits(vae)[0](params, video)


def encode_chunked(vae: "CausalVAE", params, video, chunk_frames: int = 8):
    """Frame-chunked streaming encode with conv caches: video [B,C,T,H,W]
    (T = 8n+1) processed as [1, chunk, chunk, ...] raw-frame chunks — memory
    scales with the chunk, enabling arbitrarily long clips. Conv caches make
    the causal convs exact across chunk boundaries; GroupNorm statistics are
    per-chunk (same approximation the reference's frame-batched vae._encode
    makes)."""
    T = video.shape[2]
    bounds = [(0, 1)] + [(i, min(i + chunk_frames, T)) for i in range(1, T, chunk_frames)]
    _, enc_first, enc_rest = _encode_jits(vae)
    cache = None
    outs = []
    for ci, (s, e) in enumerate(bounds):
        if ci == 0:
            out, mut = enc_first(params["params"], video[:, :, s:e])
        else:
            out, mut = enc_rest(params["params"], video[:, :, s:e], cache)
        cache = mut["cache"]
        outs.append(out)
    return jnp.concatenate(outs, axis=2)


def decode_chunked(vae: "CausalVAE", params, latents, chunk_latent_frames: int = 2,
                   fused: bool = False):
    """Frame-chunked streaming decode (latents [B,C,T',H,W], T' odd):
    chunks [1, k, k, ...] latent frames with conv caches; the first chunk
    carries the single leading frame so temporal upsampling matches the
    full-clip layout.

    `fused=True` traces ALL chunks into one jitted program (one device
    dispatch for the whole decode, chunk lifetimes serialized with
    optimization_barrier). CAUTION measured on v5e-1 at the flagship
    49x320x480 shape: the fused program compiles right at the HBM limit
    (15.9G of 15.75G) and the runtime thrashes — use it only when the
    working set leaves headroom (smaller resolutions / bigger chips)."""
    if fused:
        return _decode_chunked_fused(vae, chunk_latent_frames, latents.shape)(
            params, latents)
    T = latents.shape[2]
    bounds = [(0, 1)] + [(i, min(i + chunk_latent_frames, T))
                         for i in range(1, T, chunk_latent_frames)]
    cache = {}
    outs = []
    for ci, (s, e) in enumerate(bounds):
        variables = {"params": params["params"], **({"cache": cache} if cache else {})}
        out, mut = vae.apply(
            variables, latents[:, :, s:e], first_chunk=(ci == 0),
            method=vae.decode, mutable=["cache"],
        )
        cache = mut["cache"]
        outs.append(out)
    return jnp.concatenate(outs, axis=2)


@functools.lru_cache(maxsize=8)
def _decode_chunked_fused(vae: "CausalVAE", chunk_latent_frames: int, shape):
    """Build (and cache) the single-dispatch chunked decode for a latent
    shape: the chunk loop unrolls at trace time, conv caches thread
    functionally between chunks inside one jit."""
    import jax as _jax

    T = shape[2]
    bounds = [(0, 1)] + [(i, min(i + chunk_latent_frames, T))
                         for i in range(1, T, chunk_latent_frames)]

    @_jax.jit
    def run(params, latents):
        cache = {}
        outs = []
        for ci, (s, e) in enumerate(bounds):
            variables = {"params": params["params"],
                         **({"cache": cache} if cache else {})}
            out, mut = vae.apply(
                variables, latents[:, :, s:e], first_chunk=(ci == 0),
                method=vae.decode, mutable=["cache"],
            )
            # barrier: without it XLA overlaps chunk lifetimes and the
            # fused program's peak HBM exceeds the chip (16.8G > 15.75G);
            # serialized, each chunk's intermediates free before the next
            out, cache = _jax.lax.optimization_barrier((out, mut["cache"]))
            outs.append(out)
        return jnp.concatenate(outs, axis=2)

    return run

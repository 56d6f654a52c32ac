"""Positional / timestep / rotary embedding builders (JAX, TPU-native).

These reproduce the *semantics* of the embedding builders the reference
model depends on (diffusers `get_timestep_embedding`,
`get_3d_sincos_pos_embed`, `get_3d_rotary_pos_embed`, and the RoPE wiring
in reference orv/utils.py:196-239), re-derived from the published math so
that pretrained CogVideoX weights remain compatible. Everything is pure
jnp with static shapes — safe under jit; the builders themselves are
usually called once at trace time (positions are compile-time constants).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Timestep (diffusion noise level) embedding
# ---------------------------------------------------------------------------

def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [B] -> [B, embedding_dim].

    Matches the DDPM convention used by CogVideoX's `time_proj`
    (flip_sin_to_cos=True, freq_shift=0): frequencies
    exp(-ln(max_period) * i / (half - shift)), sin block then cos block,
    flipped to cos-first when `flip_sin_to_cos`.
    """
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# ---------------------------------------------------------------------------
# Sin-cos absolute positional embeddings (CogVideoX-2b uses these, not RoPE)
# ---------------------------------------------------------------------------

def _sincos_1d_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[S] -> [S, embed_dim]; first half sin, second half cos."""
    if embed_dim % 2 != 0:
        raise ValueError("embed_dim must be even")
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("s,d->sd", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def _sincos_2d_from_grid(embed_dim: int, grid: np.ndarray) -> np.ndarray:
    """grid [2, ...] -> [N, embed_dim]; h-embedding first, then w."""
    emb_h = _sincos_1d_from_grid(embed_dim // 2, grid[0])
    emb_w = _sincos_1d_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def get_3d_sincos_pos_embed(
    embed_dim: int,
    spatial_size: Tuple[int, int],
    temporal_size: int,
    spatial_interpolation_scale: float = 1.0,
    temporal_interpolation_scale: float = 1.0,
) -> np.ndarray:
    """3D (t, h, w) sin-cos table -> [T, H*W, D].

    Layout: temporal sin-cos occupies the leading D/4 channels, spatial 2D
    sin-cos the trailing 3D/4, matching the table the pretrained CogVideoX
    patch embedding was trained with (see reference cogvideox_control.py:659
    for the multiview variant built from the same helper).

    spatial_size is (W, H) following the call convention of the reference.
    """
    if embed_dim % 4 != 0:
        raise ValueError("embed_dim must be divisible by 4")
    embed_dim_spatial = 3 * embed_dim // 4
    embed_dim_temporal = embed_dim // 4

    # spatial grid: meshgrid(w_coords, h_coords) -> grid[0] varies along w
    grid_h = np.arange(spatial_size[1], dtype=np.float64) / spatial_interpolation_scale
    grid_w = np.arange(spatial_size[0], dtype=np.float64) / spatial_interpolation_scale
    grid = np.meshgrid(grid_w, grid_h)  # here w goes first
    grid = np.stack(grid, axis=0).reshape(2, 1, spatial_size[1], spatial_size[0])
    pos_embed_spatial = _sincos_2d_from_grid(embed_dim_spatial, grid)  # [H*W, 3D/4]

    grid_t = np.arange(temporal_size, dtype=np.float64) / temporal_interpolation_scale
    pos_embed_temporal = _sincos_1d_from_grid(embed_dim_temporal, grid_t)  # [T, D/4]

    pos_embed_temporal = np.repeat(
        pos_embed_temporal[:, np.newaxis, :], spatial_size[0] * spatial_size[1], axis=1
    )
    pos_embed_spatial = np.repeat(
        pos_embed_spatial[np.newaxis, :, :], temporal_size, axis=0
    )
    pos = np.concatenate([pos_embed_temporal, pos_embed_spatial], axis=-1)
    return pos.astype(np.float32)  # [T, H*W, D]


# ---------------------------------------------------------------------------
# 3D rotary embeddings (CogVideoX 1.0 "linspace crop grid" + 1.5 "slice")
# ---------------------------------------------------------------------------

def get_resize_crop_region_for_grid(src: Tuple[int, int], tgt_width: int, tgt_height: int):
    """Aspect-preserving center-crop region of the (h, w) grid inside the
    base grid — reference orv/utils.py:178-193 semantics."""
    th, tw = tgt_height, tgt_width
    h, w = src
    r = h / w
    if r > (th / tw):
        resize_height = th
        resize_width = int(round(th / h * w))
    else:
        resize_width = tw
        resize_height = int(round(tw / w * h))
    crop_top = int(round((th - resize_height) / 2.0))
    crop_left = int(round((tw - resize_width) / 2.0))
    return (crop_top, crop_left), (crop_top + resize_height, crop_left + resize_width)


def _rotary_1d(dim: int, pos: np.ndarray, theta: float = 10000.0):
    """cos/sin tables for 1D RoPE, interleave-repeated to [S, dim]."""
    freqs = 1.0 / theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim)
    freqs = np.einsum("s,d->sd", pos.astype(np.float64), freqs)  # [S, dim/2]
    cos = np.repeat(np.cos(freqs), 2, axis=1)  # interleaved pair layout
    sin = np.repeat(np.sin(freqs), 2, axis=1)
    return cos, sin


def get_3d_rotary_pos_embed(
    embed_dim: int,
    crops_coords: Optional[Tuple[Tuple[int, int], Tuple[int, int]]],
    grid_size: Tuple[int, int],
    temporal_size: int,
    theta: float = 10000.0,
    grid_type: str = "linspace",
    max_size: Optional[Tuple[int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3D RoPE cos/sin tables -> each [T*H*W, embed_dim].

    Per-axis split: dim_t = D/4, dim_h = dim_w = 3D/8 (head_dim 64 ->
    16/24/24). Frequencies for each axis are concatenated per position in
    (t, h, w) order. `linspace` mode samples the (h, w) grid inside the
    base-resolution crop region; `slice` mode (CogVideoX 1.5) takes integer
    positions and slices the table.
    """
    if grid_type == "linspace":
        start, stop = crops_coords  # ((top, left), (bottom, right))
        grid_size_h, grid_size_w = grid_size
        grid_t = np.linspace(0, temporal_size, temporal_size, endpoint=False)
        grid_h = np.linspace(start[0], stop[0], grid_size_h, endpoint=False)
        grid_w = np.linspace(start[1], stop[1], grid_size_w, endpoint=False)
    elif grid_type == "slice":
        if max_size is None:
            raise ValueError("slice grid_type needs max_size")
        max_h, max_w = max_size
        grid_size_h, grid_size_w = grid_size
        grid_t = np.arange(temporal_size, dtype=np.float64)
        grid_h = np.arange(max_h, dtype=np.float64)
        grid_w = np.arange(max_w, dtype=np.float64)
    else:
        raise ValueError(f"unknown grid_type {grid_type}")

    dim_t = embed_dim // 4
    dim_h = embed_dim // 8 * 3
    dim_w = embed_dim // 8 * 3

    t_cos, t_sin = _rotary_1d(dim_t, grid_t, theta)
    h_cos, h_sin = _rotary_1d(dim_h, grid_h, theta)
    w_cos, w_sin = _rotary_1d(dim_w, grid_w, theta)

    if grid_type == "slice":
        t_cos, t_sin = t_cos[:temporal_size], t_sin[:temporal_size]
        h_cos, h_sin = h_cos[:grid_size_h], h_sin[:grid_size_h]
        w_cos, w_sin = w_cos[:grid_size_w], w_sin[:grid_size_w]

    def combine(ft, fh, fw):
        T, H, W = temporal_size, grid_size_h, grid_size_w
        ft = np.broadcast_to(ft[:, None, None, :], (T, H, W, ft.shape[-1]))
        fh = np.broadcast_to(fh[None, :, None, :], (T, H, W, fh.shape[-1]))
        fw = np.broadcast_to(fw[None, None, :, :], (T, H, W, fw.shape[-1]))
        return np.concatenate([ft, fh, fw], axis=-1).reshape(T * H * W, -1)

    cos = combine(t_cos, h_cos, w_cos).astype(np.float32)
    sin = combine(t_sin, h_sin, w_sin).astype(np.float32)
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rotary_emb(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs: x[..., (0,1),(2,3),...] treated as complex.

    x: [..., S, D]; cos/sin: [S, D] (interleave-repeated). Computed in f32
    then cast back, matching the reference's mixed-precision behavior.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_pairs = xf.reshape(*xf.shape[:-1], -1, 2)
    x_real, x_imag = x_pairs[..., 0], x_pairs[..., 1]
    x_rotated = jnp.stack([-x_imag, x_real], axis=-1).reshape(xf.shape)
    out = xf * cos.astype(jnp.float32) + x_rotated * sin.astype(jnp.float32)
    return out.astype(orig_dtype)


def prepare_rotary_positional_embeddings(
    height: int,
    width: int,
    num_frames: int,
    vae_scale_factor_spatial: int = 8,
    patch_size: int = 2,
    patch_size_t: Optional[int] = None,
    attention_head_dim: int = 64,
    base_height: int = 480,
    base_width: int = 720,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (cos, sin) for the video token grid — reference
    orv/utils.py:196-239 wiring (1.0 crop-grid vs 1.5 slice modes)."""
    grid_height = height // (vae_scale_factor_spatial * patch_size)
    grid_width = width // (vae_scale_factor_spatial * patch_size)
    base_size_width = base_width // (vae_scale_factor_spatial * patch_size)
    base_size_height = base_height // (vae_scale_factor_spatial * patch_size)

    if patch_size_t is None:
        grid_crops_coords = get_resize_crop_region_for_grid(
            (grid_height, grid_width), base_size_width, base_size_height
        )
        return get_3d_rotary_pos_embed(
            embed_dim=attention_head_dim,
            crops_coords=grid_crops_coords,
            grid_size=(grid_height, grid_width),
            temporal_size=num_frames,
        )
    base_num_frames = (num_frames + patch_size_t - 1) // patch_size_t
    return get_3d_rotary_pos_embed(
        embed_dim=attention_head_dim,
        crops_coords=None,
        grid_size=(grid_height, grid_width),
        temporal_size=base_num_frames,
        grid_type="slice",
        max_size=(base_size_height, base_size_width),
    )

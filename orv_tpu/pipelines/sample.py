"""Sampling pipeline — the jitted CFG denoise loop.

TPU-native re-design of the reference's
CogVideoXImageToVideoPipelineTraj.__call__ (cogvideox_control.py:1227-1489):
instead of a Python loop of 50 device round-trips, the whole denoise runs
as ONE `lax.scan` under jit (per-step timestep/flag tables are scan inputs
— never carried counters, see memory `axon-scan-carry-bug`). Matching
semantics:

  * latent prep: reference images VAE-encoded (or moments sampled),
    scaled, zero-padded to the full latent length (prepare_latents
    :1115-1225)
  * control latents (depth/label moments) sampled, scaled, duplicated to
    2C on the channel dim (:1331-1364)
  * CFG: uncond/cond batched on device; dynamic-CFG cosine schedule
    (:1436-1443); guidance_scale <= 1 skips the uncond half entirely
  * scheduler: CogVideoX DPM (stochastic, old-pred threading) or DDIM
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orv_tpu.schedulers import DiffusionSchedule, get_inference_timesteps
from orv_tpu.schedulers.scheduling import ddim_step, dpm_step_scan
from orv_tpu.parallel.train_step import sample_from_moments


@dataclasses.dataclass
class SamplerConfig:
    num_inference_steps: int = 50
    guidance_scale: float = 1.0  # reference eval configs run CFG off
    use_dynamic_cfg: bool = False
    scheduler: str = "dpm"  # "dpm" | "ddim"
    stochastic_dpm: bool = True  # reference DPM step always injects noise
    vae_scaling_factor: float = 1.15258426
    invert_scale_latents: bool = False
    # PAB attention broadcast (Pyramid Attention Broadcast, arxiv
    # 2408.12588): attention outputs drift little between adjacent denoise
    # steps in the middle of the trajectory, so full attention is computed
    # every (pab_skip+1)-th step inside [pab_start, pab_end)·n and the
    # cached per-layer outputs are reused in between (gates/FF/projection
    # stay exact per step). pab_skip=0 (default) disables it — this is an
    # opt-in APPROXIMATION for serving; bench.py's headline number never
    # uses it. Broadcast steps skip the QKV/attention/out-proj entirely
    # (statically, via lax.cond over two model variants). HBM note: the
    # per-layer cache rides the scan carry (~0.9 GB bf16 at the flagship
    # shape per CFG-batch unit) — PAB trades HBM headroom for step time.
    pab_skip: int = 0
    pab_start: float = 0.1
    pab_end: float = 0.85


def preprocess_video(
    image,  # [B, C, F, H, W] / [B, C, H, W] tensors, or [F, H, W, 3] frames
    height: Optional[int] = None,
    width: Optional[int] = None,
    vae_latent_channels: int = 16,
) -> jnp.ndarray:
    """The reference VideoProcessor.preprocess semantics (components.py
    :234-386) on jnp arrays:

      * channel == vae_latent_channels (or 2x -> unsampled moments):
        input IS latents — passthrough untouched;
      * otherwise raw pixels: resize to (height, width) bilinear and
        normalize [0, 1] -> [-1, 1] (already-[-1,1] input left alone).

    Accepts 4D [B, C, H, W], 5D [B, C, F, H, W] (F = n_view * n_frame, as
    the dataset lays out), or channels-last uint8/float frames [F, H, W, 3].
    """
    x = jnp.asarray(image)
    if x.ndim == 4 and x.shape[-1] in (1, 3):  # [F, H, W, C] frames
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        x = x.transpose(3, 0, 1, 2)[None]  # -> [1, C, F, H, W]
    if x.ndim == 4:
        x = x[:, :, None]  # [B, C, H, W] -> single frame
    C = x.shape[1]
    if C in (vae_latent_channels, 2 * vae_latent_channels):
        return x  # latents / moments: no pixel preprocess
    if height is not None and width is not None and x.shape[-2:] != (height, width):
        B, C, F, H, W = x.shape
        x = jax.image.resize(x, (B, C, F, height, width), method="bilinear")
    if float(x.min()) >= 0.0:
        x = x * 2.0 - 1.0  # normalize [0,1] -> [-1,1]
    return x


def encode_reference_pixels(vae_apply, vae_params, image, height=None, width=None,
                            latent_channels: int = 16) -> jnp.ndarray:
    """Raw reference frames -> VAE moments [B, 2C, F', h, w] (the pipeline
    branch the reference takes when the caller passes pixels instead of
    precomputed latents, cogvideox_control.py:1115-1168)."""
    pixels = preprocess_video(image, height, width, latent_channels)
    if pixels.shape[1] in (latent_channels, 2 * latent_channels):
        return pixels
    return vae_apply(vae_params, pixels)


def prepare_image_latents(
    image_moments_or_latents: jnp.ndarray,  # [B, 2C or C, F_img, H, W]
    num_latent_frames: int,
    rng: jax.Array,
    latent_channels: int = 16,
    num_views: int = 1,
    scaling_factor: float = 1.15258426,
    invert_scale_latents: bool = False,
) -> jnp.ndarray:
    """Reference prepare_latents image branch (cogvideox_control.py:1169-1216):
    sample moments if 2C, scale, zero-pad per view to num_latent_frames.
    Returns [B, V*F_lat, C, H, W]."""
    x = image_moments_or_latents
    if x.shape[1] == 2 * latent_channels:
        x = sample_from_moments(x, rng)
    if invert_scale_latents:
        x = x / scaling_factor
    else:
        x = x * scaling_factor
    x = x.transpose(0, 2, 1, 3, 4)  # [B, F, C, H, W]
    B, VF = x.shape[0], x.shape[1]
    f_img = VF // num_views
    x = x.reshape(B, num_views, f_img, *x.shape[2:])
    pad = jnp.zeros((B, num_views, num_latent_frames - f_img, *x.shape[3:]), x.dtype)
    x = jnp.concatenate([x, pad], axis=2)
    return x.reshape(B, num_views * num_latent_frames, *x.shape[3:])


def prepare_control_latents(
    moments: jnp.ndarray, rng: jax.Array, latent_channels: int = 16,
    scaling_factor: float = 1.15258426, invert_scale_latents: bool = False,
) -> jnp.ndarray:
    """Depth/label moments -> sampled + scaled + channel-duplicated 2C input
    (reference :1331-1364)."""
    x = moments
    if x.shape[1] == 2 * latent_channels:
        x = sample_from_moments(x, rng)
    x = x / scaling_factor if invert_scale_latents else x * scaling_factor
    x = x.transpose(0, 2, 1, 3, 4)
    return jnp.concatenate([x, x], axis=2)


def pab_full_flags(n: int, skip: int, start_frac: float, end_frac: float):
    """Per-step full-attention flags for PAB: outside [w0, w1) every step
    is full; inside, full every (skip+1)-th step. Step 0 is always full
    (the cache must be populated before the first reuse)."""
    w0 = max(1, int(round(start_frac * n)))
    w1 = min(n, int(round(end_frac * n)))
    flags = np.ones(n, dtype=bool)
    for i in range(w0, w1):
        flags[i] = (i - w0) % (skip + 1) == 0
    flags[0] = True
    return flags


def make_sampler(
    model_apply: Callable,
    schedule: DiffusionSchedule,
    config: SamplerConfig = SamplerConfig(),
):
    """Returns a jittable `sample(params, latents_init, image_latents,
    prompt_embeds, neg_prompt_embeds, rng, actions=..., depths=...,
    labels=..., image_rotary_emb=..., num_views=1)` that runs the full
    denoise scan and returns clean latents [B, V*F, C, H, W]."""
    ts = get_inference_timesteps(schedule, config.num_inference_steps)
    n = len(ts)
    ts_arr = jnp.asarray(ts)
    prev_arr = jnp.asarray(np.append(ts[1:], -1))
    back_arr = jnp.asarray(np.concatenate([[ts[0]], ts[:-1]]))
    have_old = jnp.arange(n) > 0  # scan input, never a carried counter
    do_cfg = config.guidance_scale > 1.0

    # dynamic CFG multiplier per step (reference :1436-1439), precomputed
    if config.use_dynamic_cfg:
        gs = 1.0 + config.guidance_scale * (
            (1.0 - np.cos(np.pi * ((n - ts.astype(np.float64)) / n) ** 5.0)) / 2.0
        )
    else:
        gs = np.full((n,), config.guidance_scale)
    gs_arr = jnp.asarray(gs, dtype=jnp.float32)

    pab = config.pab_skip > 0
    if pab:
        pab_flags = jnp.asarray(pab_full_flags(
            n, config.pab_skip, config.pab_start, config.pab_end))

    def sample(
        params,
        latents: jnp.ndarray,  # [B, V*F, C, H, W] init noise
        image_latents: jnp.ndarray,  # [B, V*F, C, H, W]
        prompt_embeds: jnp.ndarray,  # [B, S, D]
        rng: jax.Array,
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        actions: Optional[jnp.ndarray] = None,
        depths: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        image_rotary_emb=None,
        num_views: int = 1,
    ):
        if do_cfg:
            if negative_prompt_embeds is None:
                negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
            prompt_in = jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
            dup = lambda x: None if x is None else jnp.concatenate([x, x], axis=0)
            image_in, actions_in = dup(image_latents), dup(actions)
            depths_in, labels_in = dup(depths), dup(labels)
        else:
            prompt_in, image_in = prompt_embeds, image_latents
            actions_in, depths_in, labels_in = actions, depths, labels

        # the visual-control patch embeds depend only on (depths, labels) —
        # compute them ONCE and feed the cache to all scan steps instead of
        # re-embedding the controls 50x (the model's controls_only path
        # skips the block stack, so this costs a fraction of one step)
        control_cache = None
        if depths_in is not None or labels_in is not None:
            probe = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            probe = jnp.concatenate([probe.astype(image_in.dtype), image_in], axis=2)
            t_probe = jnp.broadcast_to(ts_arr[0], (probe.shape[0],))
            control_cache = model_apply(
                params, probe, prompt_in, t_probe,
                actions=actions_in, depths=depths_in, labels=labels_in,
                image_rotary_emb=image_rotary_emb, num_views=num_views,
                deterministic=True, controls_only=True,
            )

        def body(carry, inp):
            if pab:
                lat, old, attn_cache = carry
                t, t_back, t_prev, ho, g, step_rng, full_step = inp
            else:
                lat, old = carry
                t, t_back, t_prev, ho, g, step_rng = inp
            model_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
            model_in = jnp.concatenate([model_in, image_in], axis=2)
            t_b = jnp.broadcast_to(t, (model_in.shape[0],))
            apply_kwargs = dict(
                actions=actions_in,
                depths=None if control_cache is not None else depths_in,
                labels=None if control_cache is not None else labels_in,
                control_cache=control_cache,
                image_rotary_emb=image_rotary_emb, num_views=num_views,
                deterministic=True,
            )
            if pab:
                # two statically distinct model variants under lax.cond:
                # full steps recompute attention and refresh the per-layer
                # cache; broadcast steps consume it and skip attention
                def _full(cache):
                    v, _, _, ys = model_apply(
                        params, model_in.astype(image_in.dtype), prompt_in,
                        t_b, collect_attn=True, **apply_kwargs)
                    return v, ys

                def _reuse(cache):
                    v, _, _ = model_apply(
                        params, model_in.astype(image_in.dtype), prompt_in,
                        t_b, attn_cache=cache, **apply_kwargs)
                    return v, cache

                v_pred, attn_cache = jax.lax.cond(full_step, _full, _reuse,
                                                  attn_cache)
            else:
                v_pred, _, _ = model_apply(
                    params, model_in.astype(image_in.dtype), prompt_in, t_b,
                    **apply_kwargs,
                )
            v_pred = v_pred.astype(jnp.float32)
            if do_cfg:
                v_uncond, v_text = jnp.split(v_pred, 2, axis=0)
                v_pred = v_uncond + g * (v_text - v_uncond)

            if config.scheduler == "dpm":
                noise = (
                    jax.random.normal(step_rng, lat.shape, dtype=jnp.float32)
                    if config.stochastic_dpm else None
                )
                new_lat, x0 = dpm_step_scan(
                    schedule, v_pred, old, ho, t, t_back, t_prev, lat, noise=noise
                )
            else:
                new_lat = ddim_step(schedule, v_pred, t, t_prev, lat)
                x0 = old  # unused carry slot
            if pab:
                return (new_lat, x0, attn_cache), None
            return (new_lat, x0), None

        step_rngs = jax.random.split(rng, n)
        lat0 = latents.astype(jnp.float32)
        carry0 = (lat0, jnp.zeros_like(lat0))
        xs = (ts_arr, back_arr, prev_arr, have_old, gs_arr, step_rngs)
        if pab:
            if num_views > 1:
                raise NotImplementedError("PAB attention broadcast is "
                                          "single-view (MVBlock not covered)")
            # zero-initialized per-layer attention cache with the collect
            # variant's structure (step 0 is always a full step, so the
            # zeros are never consumed)
            mi0 = jnp.concatenate([lat0, lat0], axis=0) if do_cfg else lat0
            mi0 = jnp.concatenate([mi0, image_in], axis=2).astype(image_in.dtype)
            t0 = jnp.broadcast_to(ts_arr[0], (mi0.shape[0],))
            cache_shapes = jax.eval_shape(
                lambda p, mi, tt: model_apply(
                    p, mi, prompt_in, tt, collect_attn=True,
                    actions=actions_in,
                    depths=None if control_cache is not None else depths_in,
                    labels=None if control_cache is not None else labels_in,
                    control_cache=control_cache,
                    image_rotary_emb=image_rotary_emb, num_views=num_views,
                    deterministic=True,
                )[3], params, mi0, t0)
            cache0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes)
            carry0 = carry0 + (cache0,)
            xs = xs + (pab_flags,)
        (lat, *_), _ = jax.lax.scan(body, carry0, xs)
        return lat

    return sample


def decode_latents(vae_apply, vae_params, latents, scaling_factor=1.15258426):
    """[B or BV, F, C, H, W] latents -> video [B, C, T, H, W] in [-1, 1]
    (reference decode_latents: unscale then VAE decode)."""
    z = latents.transpose(0, 2, 1, 3, 4) / scaling_factor
    return vae_apply(vae_params, z)

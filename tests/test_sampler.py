"""End-to-end sampler tests (tiny DiT, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orv_tpu.models import ControlDiT, DiTConfig
from orv_tpu.pipelines.sample import (
    SamplerConfig, make_sampler, prepare_control_latents, prepare_image_latents,
)
from orv_tpu.schedulers import make_schedule

CFG = DiTConfig(
    num_attention_heads=4, attention_head_dim=16, num_layers=2,
    in_channels=32, out_channels=16, text_embed_dim=32, time_embed_dim=64,
    max_text_seq_length=8, sample_width=16, sample_height=8,
)


@pytest.fixture(scope="module")
def setup():
    model = ControlDiT(CFG, dtype=jnp.float32)
    B, F, C, H, W = 1, 3, 16, 8, 16
    x = jnp.zeros((B, F, 2 * C, H, W))
    enc = jnp.zeros((B, 8, 32))
    acts = jnp.zeros((B, 8, 7))
    params = model.init(jax.random.PRNGKey(0), x, enc, jnp.zeros((B,), jnp.int32),
                        actions=acts)
    return model, params


def test_prepare_image_latents_pads_and_scales():
    moments = jnp.ones((2, 32, 1, 8, 16))  # [B, 2C, F_img=1, H, W]
    out = prepare_image_latents(moments, num_latent_frames=3,
                                rng=jax.random.PRNGKey(0), scaling_factor=2.0)
    assert out.shape == (2, 3, 16, 8, 16)
    # frames beyond the reference image are zero
    np.testing.assert_array_equal(np.asarray(out[:, 1:]), 0.0)
    assert np.abs(np.asarray(out[:, 0])).max() > 0


def test_prepare_control_latents_duplicates_channels():
    moments = jnp.ones((2, 32, 3, 8, 16))
    out = prepare_control_latents(moments, jax.random.PRNGKey(0))
    assert out.shape == (2, 3, 32, 8, 16)
    np.testing.assert_allclose(np.asarray(out[:, :, :16]), np.asarray(out[:, :, 16:]))


@pytest.mark.parametrize("scheduler", ["dpm", "ddim"])
def test_full_denoise_runs(setup, scheduler):
    model, params = setup
    sched = make_schedule()
    sampler = make_sampler(
        model.apply, sched,
        SamplerConfig(num_inference_steps=4, scheduler=scheduler, guidance_scale=1.0),
    )
    B, F, C, H, W = 1, 3, 16, 8, 16
    rng = jax.random.PRNGKey(0)
    lat = jax.random.normal(rng, (B, F, C, H, W))
    img = jnp.zeros((B, F, C, H, W))
    enc = jnp.zeros((B, 8, 32))
    acts = jnp.zeros((B, 8, 7))
    out = jax.jit(sampler, static_argnames=("num_views",))(
        params, lat, img, enc, jax.random.PRNGKey(1), actions=acts
    )
    assert out.shape == (B, F, C, H, W)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_cfg_doubles_batch_and_differs():
    # 6-chunk regime: text participates in attention, so CFG must matter.
    # (In the 3-chunk scratch regime text is inert by design and CFG on
    # text is a no-op — reference behavior.)
    import dataclasses
    cfg6 = dataclasses.replace(CFG, modulate_encoder_hidden_states=True)
    model = ControlDiT(cfg6, dtype=jnp.float32)
    sched = make_schedule()
    B, F, C, H, W = 1, 3, 16, 8, 16
    lat = jax.random.normal(jax.random.PRNGKey(0), (B, F, C, H, W))
    img = jnp.zeros((B, F, C, H, W))
    enc = jax.random.normal(jax.random.PRNGKey(2), (B, 8, 32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((B, F, 2 * C, H, W)), enc,
                        jnp.zeros((B,), jnp.int32))
    common = dict(num_inference_steps=3, scheduler="ddim")
    s_cfg = make_sampler(model.apply, sched, SamplerConfig(guidance_scale=6.0, **common))
    s_plain = make_sampler(model.apply, sched, SamplerConfig(guidance_scale=1.0, **common))
    o1 = s_cfg(params, lat, img, enc, jax.random.PRNGKey(1))
    o2 = s_plain(params, lat, img, enc, jax.random.PRNGKey(1))
    assert o1.shape == o2.shape == (B, F, C, H, W)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6


def test_dynamic_cfg_schedule_matches_reference_formula():
    """Precomputed per-step guidance matches the reference's cosine ramp
    (cogvideox_control.py:1436-1439): 1 + g*(1-cos(pi*((n-t)/n)^5))/2."""
    import math

    from orv_tpu.schedulers import get_inference_timesteps

    sched = make_schedule()
    n = 50
    g = 6.0
    ts = get_inference_timesteps(sched, n)
    sampler_cfg = SamplerConfig(num_inference_steps=n, guidance_scale=g,
                                use_dynamic_cfg=True)
    # re-derive the table the sampler builds internally
    import numpy as np
    gs = 1.0 + g * ((1.0 - np.cos(np.pi * ((n - ts.astype(np.float64)) / n) ** 5.0)) / 2.0)
    for i in (0, 10, 25, 49):
        expected = 1 + g * ((1 - math.cos(math.pi * ((n - ts[i]) / n) ** 5.0)) / 2)
        assert abs(gs[i] - expected) < 1e-9
    # NOTE: the reference plugs RAW timesteps (999..19) into a formula shaped
    # for step indices, so the schedule oscillates for t > n — we replicate
    # that behavior bit-for-bit rather than "fixing" it.


def test_preprocess_video_latent_passthrough_and_pixels():
    """VideoProcessor semantics (reference components.py:234-386): latent
    channels pass through untouched; pixels resize + normalize."""
    import jax.numpy as jnp
    import numpy as np

    from orv_tpu.pipelines.sample import preprocess_video

    # 16-channel -> latents passthrough
    lat = jnp.ones((1, 16, 2, 8, 8))
    out = preprocess_video(lat, height=16, width=16)
    assert out.shape == (1, 16, 2, 8, 8)
    # 32-channel -> unsampled moments passthrough
    mom = jnp.ones((1, 32, 2, 8, 8))
    assert preprocess_video(mom, height=16, width=16).shape == mom.shape
    # RGB pixels in [0,1] -> resized + normalized to [-1,1]
    pix = jnp.full((1, 3, 2, 8, 8), 0.5)
    out = preprocess_video(pix, height=16, width=16)
    assert out.shape == (1, 3, 2, 16, 16)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    # channels-last uint8 frames
    frames = (np.ones((4, 8, 8, 3)) * 255).astype(np.uint8)
    out = preprocess_video(frames, height=8, width=8)
    assert out.shape == (1, 3, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_full_denoise_fused_adaln_matches_xla(setup):
    """The bf16-serving path on TPU routes every block norm/gated residual
    through the fused Pallas kernels (_fused_adaln_ok) — the full jitted
    denoise scan under ORV_TPU_FUSED_ADALN=force (interpret mode off-TPU)
    must match the XLA lowering closely in f32."""
    import os

    model, params = setup
    sampler = make_sampler(model.apply, make_schedule(),
                           SamplerConfig(num_inference_steps=2))
    B, F, C, H, W = 1, 3, 16, 8, 16
    lat = jax.random.normal(jax.random.PRNGKey(0), (B, F, C, H, W))
    img = jnp.zeros((B, F, C, H, W))
    enc = jax.random.normal(jax.random.PRNGKey(2), (B, 8, 32))
    acts = jnp.zeros((B, 8, 7))

    def run():
        return jax.jit(sampler)(params, lat, img, enc, jax.random.PRNGKey(1),
                                actions=acts)

    try:
        os.environ["ORV_TPU_FUSED_ADALN"] = "0"
        ref = run()
        os.environ["ORV_TPU_FUSED_ADALN"] = "force"
        fus = run()
    finally:
        os.environ.pop("ORV_TPU_FUSED_ADALN", None)
    assert bool(jnp.all(jnp.isfinite(fus)))
    np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# PAB attention broadcast (arxiv 2408.12588) — opt-in serving approximation
# ---------------------------------------------------------------------------

def test_pab_full_flags_schedule():
    from orv_tpu.pipelines.sample import pab_full_flags

    f = pab_full_flags(10, 2, 0.1, 0.85)
    # outside the window every step is full; inside, every 3rd
    np.testing.assert_array_equal(
        f.astype(int), [1, 1, 0, 0, 1, 0, 0, 1, 1, 1])
    assert pab_full_flags(10, 2, 0.0, 1.0)[0]  # step 0 always full
    # empty window -> all full
    assert pab_full_flags(10, 3, 1.0, 1.0).all()


def test_pab_model_cache_is_exact(setup):
    """With identical inputs, consuming the collected attention cache must
    reproduce the full forward bit-for-bit (gates_only adaLN + cached
    attention == full computation)."""
    model, params = setup
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 8, 16))
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    t = jnp.array([500], jnp.int32)
    acts = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 7)) * 0.1
    ref, _, _ = model.apply(params, x, enc, t, actions=acts)
    full, _, _, ys = model.apply(params, x, enc, t, actions=acts,
                                 collect_attn=True)
    assert float(jnp.max(jnp.abs(full - ref))) == 0.0
    cached, _, _ = model.apply(params, x, enc, t, actions=acts, attn_cache=ys)
    assert float(jnp.max(jnp.abs(cached - ref))) == 0.0


def test_pab_empty_window_matches_baseline(setup):
    """pab_skip > 0 with an empty broadcast window runs the PAB machinery
    (cond + cache carry) but every step is full -> exact baseline output."""
    model, params = setup
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 16, 8, 16))
    img = jax.random.normal(jax.random.PRNGKey(5), lat.shape) * 0.1
    enc = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 32))
    sched = make_schedule()
    ref = jax.jit(make_sampler(model.apply, sched,
                               SamplerConfig(num_inference_steps=5)))(
        params, lat, img, enc, jax.random.PRNGKey(7))
    out = jax.jit(make_sampler(model.apply, sched,
                               SamplerConfig(num_inference_steps=5, pab_skip=2,
                                             pab_start=1.0)))(
        params, lat, img, enc, jax.random.PRNGKey(7))
    assert float(jnp.max(jnp.abs(out - ref))) == 0.0


def test_pab_active_sampler_runs_and_reuses(setup):
    """Active broadcasting: finite output that differs from the exact
    sampler (attention reused on the skip steps)."""
    model, params = setup
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 16, 8, 16))
    img = jax.random.normal(jax.random.PRNGKey(5), lat.shape) * 0.1
    enc = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 32))
    sched = make_schedule()
    ref = jax.jit(make_sampler(model.apply, sched,
                               SamplerConfig(num_inference_steps=6)))(
        params, lat, img, enc, jax.random.PRNGKey(7))
    out = jax.jit(make_sampler(model.apply, sched,
                               SamplerConfig(num_inference_steps=6, pab_skip=2,
                                             pab_start=0.2, pab_end=0.9)))(
        params, lat, img, enc, jax.random.PRNGKey(7))
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.max(jnp.abs(out - ref))) > 0.0


def test_pab_reuse_step_semantics(setup):
    """flags=[full, full, reuse]: the sampler's reuse step must equal a
    manual replay that feeds the last full step's collected attention."""
    from orv_tpu.pipelines.sample import pab_full_flags
    from orv_tpu.schedulers.scheduling import dpm_step_scan, get_inference_timesteps

    model, params = setup
    lat0 = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 16, 8, 16))
    img = jax.random.normal(jax.random.PRNGKey(5), lat0.shape) * 0.1
    enc = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 32))
    sched = make_schedule()
    flags = pab_full_flags(3, 2, 1 / 3, 1.0)
    np.testing.assert_array_equal(flags.astype(int), [1, 1, 0])
    cfgs = SamplerConfig(num_inference_steps=3, pab_skip=2, pab_start=1 / 3,
                         pab_end=1.0, stochastic_dpm=False)
    out = jax.jit(make_sampler(model.apply, sched, cfgs))(
        params, lat0, img, enc, jax.random.PRNGKey(7))

    # manual replay mirroring the flags
    ts = get_inference_timesteps(sched, 3)
    lat = lat0.astype(jnp.float32)
    old = jnp.zeros_like(lat)
    cache = None
    for i, t in enumerate(ts):
        mi = jnp.concatenate([lat, img.astype(lat.dtype)], axis=2).astype(img.dtype)
        tb = jnp.full((1,), t, jnp.int32)
        if flags[i]:
            v, _, _, cache = model.apply(params, mi, enc, tb, collect_attn=True)
        else:
            v, _, _ = model.apply(params, mi, enc, tb, attn_cache=cache)
        t_prev = ts[i + 1] if i + 1 < len(ts) else -1
        t_back = ts[i - 1] if i > 0 else ts[0]
        lat, old = dpm_step_scan(sched, v.astype(jnp.float32), old,
                                 jnp.asarray(i > 0), jnp.asarray(t),
                                 jnp.asarray(t_back), jnp.asarray(t_prev), lat)
    assert float(jnp.max(jnp.abs(out - lat))) < 1e-5


def test_pab_composes_with_sequence_parallel(setup):
    """PAB attention broadcast + sequence-parallel serving on one model:
    the per-layer attention cache rides the denoise-scan carry while every
    full step's attention rings over the sp mesh — output must equal the
    resident PAB run exactly (the ring is exact attention; the cache holds
    the same pre-gate outputs either way)."""
    from orv_tpu.parallel import MeshConfig, make_mesh, param_shardings

    model, params = setup
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 16, 8, 16))
    img = jax.random.normal(jax.random.PRNGKey(5), lat.shape) * 0.1
    enc = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 32))
    sched = make_schedule()
    cfgs = SamplerConfig(num_inference_steps=6, pab_skip=2,
                         pab_start=0.2, pab_end=0.9)
    ref = jax.jit(make_sampler(model.apply, sched, cfgs))(
        params, lat, img, enc, jax.random.PRNGKey(7))

    mesh = make_mesh(MeshConfig(dp=1, sp=2), devices=jax.devices("cpu")[:2])
    sp_model = ControlDiT(CFG, dtype=jnp.float32, sp_mesh=mesh)
    sp_params = jax.device_put(params, param_shardings(params, mesh))
    out = jax.jit(make_sampler(sp_model.apply, sched, cfgs))(
        sp_params, lat, img, enc, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

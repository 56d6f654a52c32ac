"""Causal 3D VAE: shape laws, causality, and roundtrip (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orv_tpu.models.vae import CausalVAE, VAEConfig

TINY = VAEConfig(
    block_out_channels=(8, 16, 16, 32), layers_per_block=1,
    norm_num_groups=4, latent_channels=4,
)


@pytest.fixture(scope="module")
def vae_and_params():
    vae = CausalVAE(TINY, dtype=jnp.float32)
    x = jnp.zeros((1, 3, 9, 32, 32))
    params = vae.init(jax.random.PRNGKey(0), x)
    return vae, params


def test_encode_shape_8n_plus_1(vae_and_params):
    vae, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 9, 32, 32))
    moments = vae.apply(params, x, method=vae.encode)
    # 9 frames -> (9-1)/4+1 = 3 latent frames; 32 -> 4 spatial; 2*latent ch
    assert moments.shape == (1, 8, 3, 4, 4)


def test_decode_shape(vae_and_params):
    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 3, 4, 4))
    video = vae.apply(params, z, method=vae.decode)
    assert video.shape == (1, 3, 9, 32, 32)


def test_single_frame(vae_and_params):
    """Reference images are encoded as single frames (8n+1 with n=0)."""
    vae, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 1, 32, 32))
    m = vae.apply(params, x, method=vae.encode)
    assert m.shape == (1, 8, 1, 4, 4)
    y = vae.apply(params, m[:, :4], method=vae.decode)
    assert y.shape == (1, 3, 1, 32, 32)


def test_causal_conv_is_causal():
    """CausalConv3d: output frame i must not depend on input frames > i.
    (The full VAE is only conv-causal — GroupNorm statistics are global,
    matching the reference architecture.)"""
    from orv_tpu.models.vae import CausalConv3d

    conv = CausalConv3d(4, (3, 3, 3), dtype=jnp.float32)
    x1 = jax.random.normal(jax.random.PRNGKey(4), (1, 6, 8, 8, 3))
    params = conv.init(jax.random.PRNGKey(0), x1)
    x2 = x1.at[:, 4:].set(jax.random.normal(jax.random.PRNGKey(5), (1, 2, 8, 8, 3)))
    y1 = conv.apply(params, x1)
    y2 = conv.apply(params, x2)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]), atol=1e-6)
    # and the first frame sees only itself (replicate front pad)
    x3 = x1.at[:, 1:].set(0.0)
    y3 = conv.apply(params, x3)
    np.testing.assert_allclose(np.asarray(y3[:, 0]), np.asarray(conv.apply(params, x1[:, :1])[:, 0]), atol=1e-6)


def test_roundtrip_runs_and_is_finite(vae_and_params):
    vae, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 9, 32, 32)) * 0.5
    y, moments = vae.apply(params, x, rngs=None)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
    assert bool(jnp.all(jnp.isfinite(moments)))


def test_chunked_encode_matches_conv_causality(vae_and_params):
    """Chunked streaming encode: shapes + cross-chunk continuity. GroupNorm
    stats are per-chunk (reference frame-batching makes the same
    approximation), so we check shape law + finiteness + that conv caches
    give DIFFERENT (continuous) results than naive independent chunks."""
    from orv_tpu.models.vae import encode_chunked

    vae, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 3, 17, 32, 32)) * 0.5
    m_chunked = encode_chunked(vae, params, x, chunk_frames=8)
    assert m_chunked.shape == (1, 8, 5, 4, 4)
    assert bool(jnp.all(jnp.isfinite(m_chunked)))
    # naive independent chunks (first-frame pad everywhere) must differ:
    # proves the caches actually carry temporal context across chunks
    m_naive = jnp.concatenate([
        vae.apply(params, x[:, :, :1], method=vae.encode),
        vae.apply(params, x[:, :, 1:9], method=vae.encode, first_chunk=True),
        vae.apply(params, x[:, :, 9:17], method=vae.encode, first_chunk=True),
    ], axis=2)
    assert np.abs(np.asarray(m_chunked) - np.asarray(m_naive)).max() > 1e-3


def test_chunked_decode_shape_law(vae_and_params):
    from orv_tpu.models.vae import decode_chunked

    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 5, 4, 4))
    video = decode_chunked(vae, params, z, chunk_latent_frames=2)
    assert video.shape == (1, 3, 17, 32, 32)
    assert bool(jnp.all(jnp.isfinite(video)))


def test_conv_cache_exactness():
    """A pure conv stack (no norms) chunked with caches must EXACTLY match
    the full-clip forward — pins the cache threading."""
    import flax.linen as nn
    from orv_tpu.models.vae import CausalConv3d

    class ConvStack(nn.Module):
        @nn.compact
        def __call__(self, x, first_chunk: bool = True):
            x = CausalConv3d(8, (3, 3, 3), dtype=jnp.float32, name="c1")(x, first_chunk)
            x = nn.silu(x)
            return CausalConv3d(4, (3, 3, 3), dtype=jnp.float32, name="c2")(x, first_chunk)

    model = ConvStack()
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 10, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    full = model.apply(params, x)
    cache = {}
    outs = []
    for ci, (s, e) in enumerate([(0, 4), (4, 7), (7, 10)]):
        variables = {"params": params["params"], **({"cache": cache} if cache else {})}
        out, mut = model.apply(variables, x[:, s:e], first_chunk=(ci == 0),
                               mutable=["cache"])
        cache = mut["cache"]
        outs.append(out)
    chunked = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-5)


def test_decode_chunked_fused_matches_streaming():
    """Single-dispatch fused decode == chunk-at-a-time streaming decode."""
    import jax
    import jax.numpy as jnp

    from orv_tpu.models.vae import CausalVAE, VAEConfig, decode_chunked

    cfg = VAEConfig(block_out_channels=(8, 16, 16, 32), layers_per_block=1,
                    norm_num_groups=4, latent_channels=16)
    vae = CausalVAE(cfg, dtype=jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 5, 6, 8))
    p = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, 32, 32)))
    a = decode_chunked(vae, p, z, chunk_latent_frames=2)
    b = decode_chunked(vae, p, z, chunk_latent_frames=2, fused=True)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-5


def test_upsample_phase_decomposition_matches_literal():
    """Upsample3D's phase-decomposed conv (no upsampled intermediate, 2.25x
    fewer MACs) must equal the literal nearest-upsample-then-conv lowering
    on every temporal branch (odd first chunk / streaming chunk / single
    frame), up to f32-collapse-vs-f32-accumulate rounding."""
    import os

    from orv_tpu.models.vae import Upsample3D

    key = jax.random.PRNGKey
    for compress_time, T, first_chunk in [
        (True, 5, True),   # odd first chunk: first frame x1, rest x2
        (True, 4, False),  # streaming chunk: all frames x2
        (True, 1, True),   # single first frame: spatial only
        (True, 1, False),  # single streaming frame: x2
        (False, 3, True),  # spatial-only upsampler
    ]:
        m = Upsample3D(12, compress_time=compress_time, dtype=jnp.float32)
        x = jax.random.normal(key(T + 7 * compress_time), (1, T, 8, 10, 6))
        os.environ["ORV_TPU_UPSAMPLE_PHASE"] = "0"
        try:
            params = m.init(key(0), x, first_chunk=first_chunk)
            ref = m.apply(params, x, first_chunk=first_chunk)
            os.environ["ORV_TPU_UPSAMPLE_PHASE"] = "1"
            got = m.apply(params, x, first_chunk=first_chunk)
        finally:
            os.environ.pop("ORV_TPU_UPSAMPLE_PHASE", None)
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

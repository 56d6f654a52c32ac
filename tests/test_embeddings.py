import jax.numpy as jnp
import numpy as np
import pytest

from orv_tpu.utils.embeddings import (
    apply_rotary_emb,
    get_3d_rotary_pos_embed,
    get_3d_sincos_pos_embed,
    get_resize_crop_region_for_grid,
    get_timestep_embedding,
    prepare_rotary_positional_embeddings,
)


def test_timestep_embedding_shape_and_flip():
    t = jnp.array([0, 10, 999])
    emb = get_timestep_embedding(t, 64, flip_sin_to_cos=True, downscale_freq_shift=0.0)
    assert emb.shape == (3, 64)
    # t=0: sin block is 0, cos block is 1. flip => cos first.
    np.testing.assert_allclose(np.asarray(emb[0, :32]), np.ones(32), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 32:]), np.zeros(32), atol=1e-6)


def test_timestep_embedding_freqs():
    # lowest frequency channel equals raw sin(t) in the sin block
    t = jnp.array([3.0])
    emb = get_timestep_embedding(t, 8, flip_sin_to_cos=False)
    np.testing.assert_allclose(float(emb[0, 0]), np.sin(3.0), atol=1e-6)
    np.testing.assert_allclose(float(emb[0, 4]), np.cos(3.0), atol=1e-6)


def test_3d_sincos_layout():
    D = 64
    pos = get_3d_sincos_pos_embed(D, (6, 4), 3, 1.875, 1.0)  # (W=6, H=4), T=3
    assert pos.shape == (3, 24, D)
    # temporal part (leading D/4) identical across spatial positions
    np.testing.assert_allclose(pos[1, 0, : D // 4], pos[1, 13, : D // 4])
    # spatial part (trailing 3D/4) identical across time
    np.testing.assert_allclose(pos[0, 5, D // 4 :], pos[2, 5, D // 4 :])
    # t=0 temporal embedding: sin part zero, cos part one
    dt = D // 4
    np.testing.assert_allclose(pos[0, 0, : dt // 2], np.zeros(dt // 2), atol=1e-7)
    np.testing.assert_allclose(pos[0, 0, dt // 2 : dt], np.ones(dt // 2), atol=1e-7)


def test_crop_region_matches_aspect():
    # 20x30 grid into 45x30 base (north-star 320x480 into 480x720 base)
    (top, left), (bottom, right) = get_resize_crop_region_for_grid((20, 30), 45, 30)
    assert (top, left) == (0, 0)
    assert (bottom, right) == (30, 45)


def test_rotary_tables():
    cos, sin = get_3d_rotary_pos_embed(64, ((0, 0), (30, 45)), (20, 30), 13)
    assert cos.shape == (13 * 20 * 30, 64)
    assert sin.shape == cos.shape
    # position (t=0,h=0,w=0): all-zero phase -> cos=1, sin=0
    np.testing.assert_allclose(np.asarray(cos[0]), np.ones(64), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin[0]), np.zeros(64), atol=1e-6)
    # interleaved repeat: even/odd channels share phase
    np.testing.assert_allclose(np.asarray(cos[5, 0::2]), np.asarray(cos[5, 1::2]))


def test_apply_rotary_is_norm_preserving_rotation():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 10, 64)).astype(np.float32))
    cos, sin = get_3d_rotary_pos_embed(64, ((0, 0), (2, 5)), (1, 5), 2)
    out = apply_rotary_emb(x, cos, sin)
    assert out.shape == x.shape
    # rotation preserves the norm of each interleaved pair
    xp = np.asarray(x).reshape(2, 3, 10, 32, 2)
    op = np.asarray(out).reshape(2, 3, 10, 32, 2)
    np.testing.assert_allclose(
        np.linalg.norm(op, axis=-1), np.linalg.norm(xp, axis=-1), rtol=1e-5
    )
    # zero phase at first position -> identity
    np.testing.assert_allclose(np.asarray(out[:, :, 0]), np.asarray(x[:, :, 0]), atol=1e-6)


def test_prepare_rope_north_star_shapes():
    cos, sin = prepare_rotary_positional_embeddings(
        height=320, width=480, num_frames=13, attention_head_dim=64
    )
    assert cos.shape == (13 * 20 * 30, 64)

    cos15, _ = prepare_rotary_positional_embeddings(
        height=320, width=480, num_frames=14, patch_size_t=2, attention_head_dim=64
    )
    assert cos15.shape == (7 * 20 * 30, 64)

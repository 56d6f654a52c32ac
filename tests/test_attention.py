"""Flash attention parity vs the jnp reference (Pallas interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orv_tpu.ops.attention import flash_attention, mha_reference


@pytest.mark.parametrize("seq", [128, 200])  # 200 exercises tail-key masking
def test_flash_forward_parity(seq):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 2, seq, 64), dtype=jnp.float32) * 0.5
    k = jax.random.normal(jax.random.PRNGKey(1), q.shape, dtype=jnp.float32) * 0.5
    v = jax.random.normal(jax.random.PRNGKey(2), q.shape, dtype=jnp.float32)
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_grad_parity():
    key = jax.random.PRNGKey(3)
    shape = (1, 1, 160, 64)  # non-multiple of block: masked rows exercise bwd
    q = jax.random.normal(key, shape, dtype=jnp.float32) * 0.5
    k = jax.random.normal(jax.random.PRNGKey(4), shape, dtype=jnp.float32) * 0.5
    v = jax.random.normal(jax.random.PRNGKey(5), shape, dtype=jnp.float32)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_cross_attention_shapes():
    # kv length != q length (MVBlock joint view attention has text+video kv)
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 130, 64)) * 0.3
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 260, 64)) * 0.3
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 260, 64))
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_q8_close_to_reference():
    """int8-QK^T inference kernel: per-token q scales + smoothed block-scaled
    k keep the output within ~4x bf16 rounding of the exact result."""
    from orv_tpu.ops.attention import flash_attention_q8

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 300, 64)) * 0.7
    k = jax.random.normal(jax.random.PRNGKey(1), q.shape) * 0.7 + 0.4  # nonzero mean
    v = jax.random.normal(jax.random.PRNGKey(2), q.shape)
    out = flash_attention_q8(q, k, v, block_q=128, block_k=128)
    ref = mha_reference(q, k, v)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 8e-3, err


def test_flash_lse_grad_parity():
    """attention_with_lse must be differentiable on the flash path with
    gradients flowing through BOTH outputs — the ring combines partial
    (out, lse) pairs, so the lse cotangent is nonzero in sequence-parallel
    training. The lse cotangent folds into the backward's delta term
    (dS = P*(dP - delta + dlse))."""
    from orv_tpu.ops.attention import attention_with_lse

    k = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(k, 3)
    q = jax.random.normal(kq, (1, 2, 192, 64), jnp.float32)
    kk_ = jax.random.normal(kk, (1, 2, 256, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 256, 64), jnp.float32)

    def loss(impl, static_max=None):
        def f(q, k, v):
            out, lse = attention_with_lse(q, k, v, impl=impl,
                                          static_max=static_max)
            # both outputs contribute, with distinct nonlinearities
            return jnp.sum(out.astype(jnp.float32) ** 2) + jnp.sum(
                jnp.sin(lse) * jnp.arange(lse.shape[-1]))
        return f

    ref_val = loss("xla")(q, kk_, v)
    g_ref = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, kk_, v)
    # flash_q8 must map to the bf16 flash kernel here (the int8 kernel has
    # no lse; falling to the einsum path would defeat the ring), and the
    # static-max kernel's lse is exact so the shared backward matches too
    for impl, sm in (("flash", None), ("flash", 24.0), ("flash_q8", 24.0)):
        got_val = loss(impl, sm)(q, kk_, v)
        np.testing.assert_allclose(float(got_val), float(ref_val), rtol=2e-5)
        g_flash = jax.grad(loss(impl, sm), argnums=(0, 1, 2))(q, kk_, v)
        for a, b in zip(g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-3)

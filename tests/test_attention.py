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

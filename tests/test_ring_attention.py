"""Ring (sequence-parallel) attention vs full attention on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orv_tpu.ops.attention import attention_with_lse, mha_reference
from orv_tpu.ops.ring_attention import ring_attention


def _mesh(n=4):
    devs = np.array(jax.devices("cpu")[:n])
    return Mesh(devs.reshape(n), ("sp",))


def test_attention_with_lse_matches_reference():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 64, 16)) * 0.5
    k = jax.random.normal(jax.random.PRNGKey(1), q.shape) * 0.5
    v = jax.random.normal(jax.random.PRNGKey(2), q.shape)
    out, lse = attention_with_lse(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(mha_reference(q, k, v)),
                               atol=1e-5)
    assert lse.shape == (1, 2, 64)


@pytest.mark.parametrize("seq", [128, 256])
def test_ring_attention_exact(seq):
    mesh = _mesh(4)
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 2, seq, 16)) * 0.5
    k = jax.random.normal(jax.random.PRNGKey(1), q.shape) * 0.5
    v = jax.random.normal(jax.random.PRNGKey(2), q.shape)
    spec = NamedSharding(mesh, P(None, None, "sp", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    out = ring_attention(qs, ks, vs, mesh, impl="xla")
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # output stays sequence-sharded
    assert out.sharding.spec == P(None, None, "sp", None)


def test_ring_attention_under_jit():
    mesh = _mesh(4)
    q = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 128, 16)) * 0.5
    spec = NamedSharding(mesh, P(None, None, "sp", None))
    qs = jax.device_put(q, spec)
    f = jax.jit(lambda q: ring_attention(q, q, q, mesh, impl="xla"))
    out = f(qs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(mha_reference(q, q, q)),
                               atol=2e-5)


def test_joint_ring_attention_exact():
    """Text replicated + video sequence-sharded matches full joint attention."""
    from orv_tpu.ops.ring_attention import joint_ring_attention

    mesh = _mesh(4)
    T, S = 12, 128  # text 12 tokens (not divisible by 4 — that's the point)
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 2, T + S, 16)) * 0.5
    k = jax.random.normal(jax.random.PRNGKey(1), q.shape) * 0.5
    v = jax.random.normal(jax.random.PRNGKey(2), q.shape)
    out = joint_ring_attention(q, k, v, T, mesh, impl="xla")
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sequence_parallel_dit_forward_matches_resident():
    """Full ControlDiT forward with sp_mesh == the sequence-resident forward."""
    from orv_tpu.models import ControlDiT, DiTConfig

    mesh = _mesh(4)
    cfg = DiTConfig(
        num_attention_heads=2, attention_head_dim=16, num_layers=2,
        in_channels=16, out_channels=16, text_embed_dim=32, time_embed_dim=64,
        max_text_seq_length=8, sample_width=16, sample_height=8,
        modulate_encoder_hidden_states=True,
    )
    B, F, H, W = 1, 2, 8, 16  # video tokens = 2*4*8 = 64, divisible by 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, F, 16, H, W))
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 32))
    t = jnp.array([500], jnp.int32)

    resident = ControlDiT(cfg, dtype=jnp.float32, attn_impl="xla")
    params = resident.init(jax.random.PRNGKey(0), x, enc, t)
    ref, _, _ = resident.apply(params, x, enc, t)

    sp_model = ControlDiT(cfg, dtype=jnp.float32, attn_impl="xla", sp_mesh=mesh)
    out, _, _ = jax.jit(
        lambda p, x, e, t: sp_model.apply(p, x, e, t)
    )(params, x, enc, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

def test_joint_ring_attention_flash_grad():
    """Gradients through the joint ring on the FLASH path (Pallas interpret
    on CPU) — the exact composition context-parallel training uses on TPU:
    custom-VJP flash (out, lse) partials merged by logsumexp weights, text
    merge stabilizer stop_gradient'ed."""
    from orv_tpu.ops.ring_attention import joint_ring_attention

    mesh = _mesh(2)
    T, S = 12, 128
    q = jax.random.normal(jax.random.PRNGKey(4), (1, 2, T + S, 16)) * 0.5
    k = jax.random.normal(jax.random.PRNGKey(5), q.shape) * 0.5
    v = jax.random.normal(jax.random.PRNGKey(6), q.shape)

    def ring_loss(q, k, v):
        return jnp.sum(joint_ring_attention(q, k, v, T, mesh, impl="flash"
                                            ).astype(jnp.float32) ** 2)

    def ref_loss(q, k, v):
        return jnp.sum(mha_reference(q, k, v).astype(jnp.float32) ** 2)

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)

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

"""CAME optimizer (orv_tpu/parallel/came.py) vs an independent numpy
transcription of the published algorithm (arXiv 2307.02047, Algorithm 1 /
the came-pytorch step the reference factory instantiates,
/root/reference/orv/utils.py:150-163)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orv_tpu.parallel import make_optimizer
from orv_tpu.parallel.came import came


def _numpy_came_step(p, g, state, lr, b1, b2, b3, eps1=1e-30, eps2=1e-16,
                     clip=1.0, wd=0.0):
    """One CAME step, written straight from the paper's update rules."""
    g = g.astype(np.float64)
    u2 = g * g + eps1
    if g.ndim >= 2:
        state["row"] = b2 * state["row"] + (1 - b2) * u2.mean(-1)
        state["col"] = b2 * state["col"] + (1 - b2) * u2.mean(-2)
        r = 1.0 / np.sqrt(state["row"] / state["row"].mean(-1, keepdims=True))
        c = 1.0 / np.sqrt(state["col"])
        u = g * (r[..., None] * c[..., None, :])
    else:
        state["sq"] = b2 * state["sq"] + (1 - b2) * u2
        u = g / np.sqrt(state["sq"])
    rms = np.sqrt((u * u).mean())
    u = u / max(1.0, rms / clip)
    state["m"] = b1 * state["m"] + (1 - b1) * u
    if g.ndim >= 2:
        res = (u - state["m"]) ** 2 + eps2
        state["rrow"] = b3 * state["rrow"] + (1 - b3) * res.mean(-1)
        state["rcol"] = b3 * state["rcol"] + (1 - b3) * res.mean(-2)
        r = 1.0 / np.sqrt(state["rrow"] / state["rrow"].mean(-1, keepdims=True))
        c = 1.0 / np.sqrt(state["rcol"])
        out = state["m"] * (r[..., None] * c[..., None, :])
    else:
        out = state["m"]
    return p - lr * (out + wd * p)


@pytest.mark.parametrize("shape", [(6, 4), (5,), (3, 6, 4)])
def test_came_matches_published_step_math(shape):
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=shape).astype(np.float32)
    b1, b2, b3, lr, wd = 0.9, 0.95, 0.98, 1e-2, 0.01

    tx = came(lr, b1=b1, b2=b2, b3=b3, weight_decay=wd)
    params = {"w": jnp.asarray(p0)}
    opt_state = tx.init(params)

    st = {"m": np.zeros(shape), "row": np.zeros(shape[:-1]),
          "col": np.zeros(shape[:-2] + shape[-1:]) if len(shape) >= 2 else None,
          "sq": np.zeros(shape), "rrow": np.zeros(shape[:-1]),
          "rcol": np.zeros(shape[:-2] + shape[-1:]) if len(shape) >= 2 else None}
    p_np = p0.astype(np.float64)

    step = jax.jit(lambda g, s, p: tx.update(g, s, p))
    for t in range(5):
        g_np = rng.normal(size=shape).astype(np.float32) * (10.0 if t == 2 else 1.0)
        # t==2 uses a large gradient so the clip_threshold path is exercised
        updates, opt_state = step({"w": jnp.asarray(g_np)}, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        p_np = _numpy_came_step(p_np, g_np, st, lr, b1, b2, b3, wd=wd)
        np.testing.assert_allclose(np.asarray(params["w"]), p_np, rtol=2e-5,
                                   atol=2e-6)


def test_came_factored_state_memory():
    """ndim>=2 leaves carry O(n+m) second moments, not O(n*m)."""
    tx = came(1e-3)
    params = {"w": jnp.zeros((64, 32)), "b": jnp.zeros((64,))}
    st = tx.init(params)
    w = st.leaves["w"]
    assert w.row.shape == (64,) and w.col.shape == (32,)
    assert w.sq is None  # no buffer at all: None placeholders, not arrays —
    # the axon TPU backend rejects donated pytrees that alias one buffer
    b = st.leaves["b"]
    assert b.sq.shape == (64,) and b.row is None


def test_came_via_factory_trains():
    """`optimizer: came` through make_optimizer converges on a toy
    least-squares problem (the factory wraps it in global-norm clipping)."""
    tx = make_optimizer(lambda _: 0.05, "came", beta3=0.98, weight_decay=0.0)
    key = jax.random.PRNGKey(0)
    target = jax.random.normal(key, (8, 4))
    params = {"w": jnp.zeros((8, 4)), "b": jnp.zeros((4,))}

    def loss_fn(p):
        return jnp.mean((p["w"] + p["b"] - target) ** 2)

    state = tx.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = tx.update(g, s, p)
        return jax.tree_util.tree_map(lambda a, b: a + b, p, u), s, l

    losses = []
    for _ in range(60):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert losses[-1] < 0.25 * losses[0]
    assert np.isfinite(losses[-1])

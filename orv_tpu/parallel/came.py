"""CAME optimizer (Confidence-guided Adaptive Memory Efficient, arXiv
2307.02047) as an optax GradientTransformation.

The reference optimizer factory exposes `optimizer: came` via the
came-pytorch package (/root/reference/orv/utils.py:16-163, `came` branch
with eps=(1e-30, 1e-16) and betas=(beta1, beta2, beta3)); this is the
TPU-native equivalent. Per-leaf state:

- tensors with ndim >= 2 keep Adafactor-style FACTORED second moments
  (row/col means over the last two axes) for both the gradient-square EMA
  and the confidence (instability) EMA — O(n+m) memory instead of O(n*m);
- 1-D tensors keep a full second moment and skip the confidence step
  (matching the published algorithm);
- the first moment (exp_avg) is always full-size.

Update math per step, all in float32:

    u   = g^2 + eps1                       (second-moment target)
    R   = b2*R + (1-b2)*mean(u, -1);  C = b2*C + (1-b2)*mean(u, -2)
    u   = g * rsqrt(R/mean(R,-1)) x rsqrt(C)        (factored rms approx)
    u   = u / max(1, rms(u)/clip_threshold)
    m   = b1*m + (1-b1)*u
    res = (u - m)^2 + eps2                 (instability)
    Rr  = b3*Rr + (1-b3)*mean(res, -1); Cr = b3*Cr + (1-b3)*mean(res, -2)
    out = m * rsqrt(Rr/mean(Rr,-1)) x rsqrt(Cr)
    p  -= lr * (out + weight_decay * p)    (decoupled decay)
"""

from typing import NamedTuple, Optional, Union, Callable

import jax
import jax.numpy as jnp
import optax


class _CameLeaf(NamedTuple):
    """Per-parameter CAME state. Fields the leaf's branch doesn't use are
    None (an empty pytree node — no buffer exists, nothing to shard or
    donate). Array placeholders are a trap here: the axon TPU backend
    rejects a donated pytree that references the SAME buffer object more
    than once (INVALID_ARGUMENT at dispatch, isolated 2026-08-19), and a
    shared `zeros((0,))`/`zeros((1,))` placeholder is exactly that."""

    m: jnp.ndarray                 # first moment, full shape
    row: Optional[jnp.ndarray]     # E[g^2] row means   (factored only)
    col: Optional[jnp.ndarray]     # E[g^2] col means   (factored only)
    sq: Optional[jnp.ndarray]      # E[g^2] full        (1-D only)
    res_row: Optional[jnp.ndarray]  # instability row means (factored only)
    res_col: Optional[jnp.ndarray]  # instability col means (factored only)


class CameState(NamedTuple):
    count: jnp.ndarray
    leaves: any


def _factored(shape) -> bool:
    return len(shape) >= 2


def _approx_sq_grad(row: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
    """Rank-1 rsqrt reconstruction of the second moment: the row factor is
    normalized by its own mean so the product has the right scale
    (Adafactor eq. 4; identical to came_pytorch _approx_sq_grad)."""
    r = jax.lax.rsqrt(row / jnp.mean(row, axis=-1, keepdims=True))
    c = jax.lax.rsqrt(col)
    return r[..., None] * c[..., None, :]


def _rms(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean(jnp.square(x)))


def came(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    b3: float = 0.9999,
    eps1: float = 1e-30,
    eps2: float = 1e-16,
    clip_threshold: float = 1.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """CAME. Defaults follow came-pytorch; the reference passes
    betas=(0.9, 0.95, 0.98) from its config surface."""

    def init(params):
        def leaf(p):
            shape = p.shape
            m = jnp.zeros(shape, jnp.float32)
            if _factored(shape):
                row = jnp.zeros(shape[:-1], jnp.float32)
                col = jnp.zeros(shape[:-2] + shape[-1:], jnp.float32)
                return _CameLeaf(m, row, col, None, jnp.zeros_like(row),
                                 jnp.zeros_like(col))
            return _CameLeaf(m, None, None, jnp.zeros(shape, jnp.float32),
                             None, None)

        return CameState(
            count=jnp.zeros((), jnp.int32),
            leaves=jax.tree_util.tree_map(leaf, params),
        )

    def update(updates, state, params=None):
        if weight_decay and params is None:
            raise ValueError("came(weight_decay>0) requires params")
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate

        def leaf(g, s, p):
            out_dtype = g.dtype
            g = g.astype(jnp.float32)
            u2 = jnp.square(g) + eps1
            if _factored(g.shape):
                row = b2 * s.row + (1 - b2) * jnp.mean(u2, axis=-1)
                col = b2 * s.col + (1 - b2) * jnp.mean(u2, axis=-2)
                u = g * _approx_sq_grad(row, col)
                sq = s.sq
            else:
                sq = b2 * s.sq + (1 - b2) * u2
                u = g * jax.lax.rsqrt(sq)
                row, col = s.row, s.col
            u = u / jnp.maximum(1.0, _rms(u) / clip_threshold)
            m = b1 * s.m + (1 - b1) * u
            if _factored(g.shape):
                res = jnp.square(u - m) + eps2
                res_row = b3 * s.res_row + (1 - b3) * jnp.mean(res, axis=-1)
                res_col = b3 * s.res_col + (1 - b3) * jnp.mean(res, axis=-2)
                out = m * _approx_sq_grad(res_row, res_col)
            else:
                res_row, res_col = s.res_row, s.res_col
                out = m
            if weight_decay:
                out = out + weight_decay * p.astype(jnp.float32)
            new_s = _CameLeaf(m, row, col, sq, res_row, res_col)
            return (-lr * out).astype(out_dtype), new_s

        flat_u, tree = jax.tree_util.tree_flatten(updates)
        flat_s = tree.flatten_up_to(state.leaves)
        flat_p = tree.flatten_up_to(params) if params is not None else [None] * len(flat_u)
        outs = [leaf(g, s, p) for g, s, p in zip(flat_u, flat_s, flat_p)]
        new_updates = tree.unflatten([o[0] for o in outs])
        new_leaves = tree.unflatten([o[1] for o in outs])
        return new_updates, CameState(count=state.count + 1, leaves=new_leaves)

    return optax.GradientTransformation(init, update)

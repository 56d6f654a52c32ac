"""int8 W8A8 inference path: Int8Dense + quantize_linear_params.

The quantized serving configuration (ControlDiT(quant=True)) must (a) have
exactly the param tree `quantize_linear_params` produces from a trained
model, and (b) stay numerically close to the bf16/f32 model — W8A8 dynamic
PTQ with per-token activation scales and per-channel weight scales.
"""

import flax
import jax
import jax.numpy as jnp
import pytest

from orv_tpu.models import ControlDiT, DiTConfig
from orv_tpu.models.layers import Int8Dense
from orv_tpu.models.quantize import QUANT_LAYER_NAMES, quantize_linear_params


def test_int8_dense_matches_fp():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (4, 64, 96))
    kernel = jax.random.normal(jax.random.PRNGKey(1), (96, 128)) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    ref = x @ kernel + bias

    scale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=0), 1e-8) / 127.0
    kq = jnp.round(kernel / scale[None, :]).astype(jnp.int8)
    m = Int8Dense(128, dtype=jnp.float32)
    out = m.apply({"params": {"kernel_q8": kq, "kernel_scale": scale, "bias": bias}}, x)
    # int8 x int8 with dynamic ranges: ~1% relative error is the expected scale
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.02, rel


@pytest.fixture(scope="module")
def small_dit_inputs():
    cfg = DiTConfig(
        num_attention_heads=4, attention_head_dim=16, num_layers=2,
        in_channels=32, out_channels=16, text_embed_dim=32, time_embed_dim=64,
        max_text_seq_length=8, sample_width=16, sample_height=8,
        modulate_encoder_hidden_states=True, visual_guidance=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 8, 16))
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    acts = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 7)) * 0.1
    d = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    l = jax.random.normal(jax.random.PRNGKey(4), x.shape)
    t = jnp.array([500], jnp.int32)
    return cfg, (x, enc, t, acts, d, l)


def test_quantized_param_tree_matches_init(small_dit_inputs):
    cfg, (x, enc, t, acts, d, l) = small_dit_inputs
    m = ControlDiT(cfg, dtype=jnp.float32, attn_impl="xla")
    mq = ControlDiT(cfg, dtype=jnp.float32, attn_impl="xla", quant=True)
    p = m.init(jax.random.PRNGKey(0), x, enc, t, actions=acts, depths=d, labels=l)
    pq = quantize_linear_params(p)
    expect = jax.eval_shape(
        lambda: mq.init(jax.random.PRNGKey(0), x, enc, t, actions=acts, depths=d, labels=l)
    )
    f_expect = flax.traverse_util.flatten_dict(expect)
    f_got = flax.traverse_util.flatten_dict(pq)
    assert set(f_expect) == set(f_got)
    for key in f_expect:
        assert f_expect[key].shape == f_got[key].shape, key
        assert f_expect[key].dtype == f_got[key].dtype, key
    # every hot linear actually got quantized (stacked over the scan axis)
    q8 = [k for k in f_got if k[-1] == "kernel_q8"]
    assert {k[-2] for k in q8} == set(QUANT_LAYER_NAMES)


def test_quantized_forward_close_to_fp(small_dit_inputs):
    cfg, (x, enc, t, acts, d, l) = small_dit_inputs
    m = ControlDiT(cfg, dtype=jnp.float32, attn_impl="xla")
    mq = ControlDiT(cfg, dtype=jnp.float32, attn_impl="xla", quant=True)
    p = m.init(jax.random.PRNGKey(0), x, enc, t, actions=acts, depths=d, labels=l)
    pq = quantize_linear_params(p)
    o_ref, _, _ = m.apply(p, x, enc, t, actions=acts, depths=d, labels=l)
    o_q, _, _ = mq.apply(pq, x, enc, t, actions=acts, depths=d, labels=l)
    rel = float(jnp.max(jnp.abs(o_q - o_ref)) / jnp.max(jnp.abs(o_ref)))
    assert rel < 0.02, rel


def test_multiview_quant_tree_matches():
    """quantize_linear_params also covers MVBlock attention projections."""
    cfg = DiTConfig(
        num_attention_heads=4, attention_head_dim=16, num_layers=2,
        in_channels=32, out_channels=16, text_embed_dim=32, time_embed_dim=64,
        max_text_seq_length=8, sample_width=16, sample_height=8,
        modulate_encoder_hidden_states=True, multiview=True,
    )
    m = ControlDiT(cfg, dtype=jnp.float32, attn_impl="xla")
    mq = ControlDiT(cfg, dtype=jnp.float32, attn_impl="xla", quant=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 32, 8, 16))  # 2 views x 2 frames
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    t = jnp.array([500], jnp.int32)
    p = m.init(jax.random.PRNGKey(0), x, enc, t, num_views=2)
    pq = quantize_linear_params(p)
    expect = jax.eval_shape(lambda: mq.init(jax.random.PRNGKey(0), x, enc, t, num_views=2))
    f_expect = set(flax.traverse_util.flatten_dict(expect))
    f_got = set(flax.traverse_util.flatten_dict(pq))
    assert f_expect == f_got
    # mv attention projections quantized too
    assert any("mv_block" in str(k) and k[-1] == "kernel_q8" for k in f_got)
    o_ref, _, _ = m.apply(p, x, enc, t, num_views=2)
    o_q, _, _ = mq.apply(pq, x, enc, t, num_views=2)
    rel = float(jnp.max(jnp.abs(o_q - o_ref)) / jnp.max(jnp.abs(o_ref)))
    assert rel < 0.02, rel


def test_fused_adaln_matches_xla():
    """ops/adaln.modulate_norm (one-pass Pallas norm+modulate, serving path)
    must match the XLA lowering within bf16 rounding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from orv_tpu.models.layers import _layer_norm
    from orv_tpu.ops.adaln import modulate_norm

    R, S, D = 6, 50, 256
    k = jax.random.PRNGKey(0)
    x = (jax.random.normal(k, (R, S, D)) * 2.0).astype(jnp.bfloat16)
    scale = jax.random.normal(jax.random.PRNGKey(1), (R, D)).astype(jnp.bfloat16)
    shift = jax.random.normal(jax.random.PRNGKey(2), (R, D)).astype(jnp.bfloat16)
    ns = jax.random.normal(jax.random.PRNGKey(3), (D,)) * 0.1 + 1.0
    nb = jax.random.normal(jax.random.PRNGKey(4), (D,)) * 0.1

    got = modulate_norm(x, scale, shift, ns, nb)
    ref = (_layer_norm(x, ns, nb, 1e-5).astype(jnp.float32)
           * (1.0 + scale[:, None, :].astype(jnp.float32))
           + shift[:, None, :].astype(jnp.float32)).astype(x.dtype)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=0.06, rtol=0.05)


def test_modulate_norm_q8_matches_separate_quantize():
    """modulate_norm_q8 (adaLN kernel emitting int8 + per-token scale) must
    match modulate_norm followed by Int8Dense's activation quantization up
    to the one-rounding-step difference (the fused kernel quantizes the f32
    modulated value; the two-step path quantizes after a bf16 round)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from orv_tpu.models.layers import quantize_tokens
    from orv_tpu.ops.adaln import modulate_norm, modulate_norm_q8

    R, S, D = 4, 50, 256
    k = jax.random.PRNGKey
    x = (jax.random.normal(k(0), (R, S, D)) * 2.0).astype(jnp.bfloat16)
    scale = jax.random.normal(k(1), (R, D)).astype(jnp.bfloat16)
    shift = jax.random.normal(k(2), (R, D)).astype(jnp.bfloat16)
    ns = jax.random.normal(k(3), (D,)) * 0.1 + 1.0
    nb = jax.random.normal(k(4), (D,)) * 0.1

    xq, xs = modulate_norm_q8(x, scale, shift, ns, nb)
    assert xq.shape == (R, S, D) and xq.dtype == jnp.int8
    assert xs.shape == (R, S) and xs.dtype == jnp.float32
    ref_q, ref_s = quantize_tokens(modulate_norm(x, scale, shift, ns, nb))
    # dequantized values must agree within int8 step + bf16 rounding
    got = np.asarray(xq, np.float32) * np.asarray(xs)[..., None]
    ref = np.asarray(ref_q, np.float32) * np.asarray(ref_s)[..., None]
    np.testing.assert_allclose(got, ref, atol=0.2, rtol=0.1)


def test_fused_gated_residual_matches_xla():
    """gate_residual_add(fused=True) (one-pass Pallas x + gate·y, serving
    path) must match the XLA lowering within bf16 rounding — both the
    per-frame [B,F,1,D] and the global [B,1,D] gate forms."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from orv_tpu.models.layers import apply_gate, gate_residual_add

    B, F, P, D = 2, 5, 60, 256
    S = F * P
    k = jax.random.PRNGKey
    base = jax.random.normal(k(0), (B, S, D)).astype(jnp.bfloat16)
    y = jax.random.normal(k(1), (B, S, D)).astype(jnp.bfloat16)
    for gate_shape in [(B, F, 1, D), (B, 1, D)]:
        gate = (jax.random.normal(k(2), gate_shape) * 0.5).astype(jnp.float32)
        got = gate_residual_add(base, y, gate, fused=True)
        ref = base + apply_gate(y, gate).astype(base.dtype)
        assert got.shape == ref.shape and got.dtype == ref.dtype
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=0.06, rtol=0.05)


def test_fused_adaln_grads_match_xla():
    """modulate_norm's custom VJP (fused Pallas backward) must match
    jax.grad of the XLA lowering for every input: x, per-row scale/shift,
    and the shared norm scale/bias. f32 end-to-end so the only error is
    kernel math, not dtype rounding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from orv_tpu.models.layers import _layer_norm
    from orv_tpu.ops.adaln import modulate_norm

    R, S, D = 4, 37, 256
    k = jax.random.PRNGKey
    x = jax.random.normal(k(0), (R, S, D)) * 2.0
    scale = jax.random.normal(k(1), (R, D))
    shift = jax.random.normal(k(2), (R, D))
    ns = jax.random.normal(k(3), (D,)) * 0.1 + 1.0
    nb = jax.random.normal(k(4), (D,)) * 0.1
    ct = jax.random.normal(k(5), (R, S, D))

    def ref_fn(x, scale, shift, ns, nb):
        out = (_layer_norm(x, ns, nb, 1e-5).astype(jnp.float32)
               * (1.0 + scale[:, None, :]) + shift[:, None, :])
        return jnp.sum(out * ct)

    def fused_fn(x, scale, shift, ns, nb):
        return jnp.sum(modulate_norm(x, scale, shift, ns, nb) * ct)

    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2, 3, 4))(x, scale, shift, ns, nb)
    g_fus = jax.grad(fused_fn, argnums=(0, 1, 2, 3, 4))(x, scale, shift, ns, nb)
    for name, a, b in zip(("dx", "dscale", "dshift", "dns", "dnb"), g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_fused_gated_residual_grads_match_xla():
    """gated_residual's custom VJP (fused dy/dgate backward) must match
    jax.grad of the XLA lowering for x, y, and gate."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from orv_tpu.ops.adaln import gated_residual

    R, S, D = 6, 41, 256
    k = jax.random.PRNGKey
    x = jax.random.normal(k(0), (R, S, D))
    y = jax.random.normal(k(1), (R, S, D))
    gate = jax.random.normal(k(2), (R, D)) * 0.5
    ct = jax.random.normal(k(3), (R, S, D))

    def ref_fn(x, y, gate):
        return jnp.sum((x + y * gate[:, None, :]) * ct)

    def fused_fn(x, y, gate):
        return jnp.sum(gated_residual(x, y, gate) * ct)

    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2))(x, y, gate)
    g_fus = jax.grad(fused_fn, argnums=(0, 1, 2))(x, y, gate)
    for name, a, b in zip(("dx", "dy", "dgate"), g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5, err_msg=name)


def test_quant_pab_cache_exact(small_dit_inputs):
    """PAB attention broadcast on the int8 serving model: with identical
    inputs the cached path (gates_only adaLN, no q8 emission, attention
    skipped) must reproduce the quantized full forward exactly."""
    cfg, (x, enc, t, acts, d, l) = small_dit_inputs
    mq = ControlDiT(cfg, dtype=jnp.float32, attn_impl="xla", quant=True)
    m = ControlDiT(cfg, dtype=jnp.float32, attn_impl="xla")
    p = m.init(jax.random.PRNGKey(0), x, enc, t, actions=acts, depths=d, labels=l)
    pq = quantize_linear_params(p)
    ref, _, _ = mq.apply(pq, x, enc, t, actions=acts, depths=d, labels=l)
    full, _, _, ys = mq.apply(pq, x, enc, t, actions=acts, depths=d, labels=l,
                              collect_attn=True)
    assert float(jnp.max(jnp.abs(full - ref))) == 0.0
    cached, _, _ = mq.apply(pq, x, enc, t, actions=acts, depths=d, labels=l,
                            attn_cache=ys)
    assert float(jnp.max(jnp.abs(cached - ref))) == 0.0

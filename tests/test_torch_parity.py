"""Numeric parity vs torch for every weight-mapping convention.

These pin the exact conventions the checkpoint converter relies on
(SURVEY.md §7 hard-part #1): conv kernel layouts, linear transposes,
patch-embed conv<->matmul equivalence, normalization math, and SDPA.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def _np(x):
    return x.detach().cpu().numpy()


def test_linear_transpose_convention():
    from orv_tpu.models.weights import _t

    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 5)).astype(np.float32)  # torch [out, in]
    b = rng.normal(size=(8,)).astype(np.float32)
    x = rng.normal(size=(3, 5)).astype(np.float32)
    ref = _np(torch.nn.functional.linear(torch.from_numpy(x), torch.from_numpy(w),
                                         torch.from_numpy(b)))
    ours = x @ _t(w) + b
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_causal_conv3d_matches_torch():
    from orv_tpu.models.vae import CausalConv3d
    from orv_tpu.models.weights import _conv3d

    rng = np.random.default_rng(1)
    Cin, Cout, T, H, W = 3, 5, 6, 8, 8
    w = rng.normal(size=(Cout, Cin, 3, 3, 3)).astype(np.float32) * 0.2
    b = rng.normal(size=(Cout,)).astype(np.float32)
    x = rng.normal(size=(1, Cin, T, H, W)).astype(np.float32)

    # torch: replicate-first-frame front pad (k_t-1), zero spatial SAME pad
    xt = torch.from_numpy(x)
    first = xt[:, :, :1].repeat(1, 1, 2, 1, 1)
    xt_pad = torch.cat([first, xt], dim=2)
    ref = torch.nn.functional.conv3d(xt_pad, torch.from_numpy(w),
                                     torch.from_numpy(b), padding=(0, 1, 1))

    conv = CausalConv3d(Cout, (3, 3, 3), dtype=jnp.float32)
    params = {"params": {"conv": {"kernel": jnp.asarray(_conv3d(w)),
                                  "bias": jnp.asarray(b)}}}
    ours = conv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))  # BTHWC
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 4, 1, 2, 3), _np(ref), atol=2e-5
    )


def test_patch_embed_conv_equivalence():
    """space-to-depth + matmul == torch Conv2d(k=2, s=2) with the converted
    kernel (the DiT patch-embed mapping)."""
    from orv_tpu.models.weights import _patch_conv

    rng = np.random.default_rng(2)
    C, D, H, W = 16, 12, 8, 10
    w = rng.normal(size=(D, C, 2, 2)).astype(np.float32) * 0.2
    b = rng.normal(size=(D,)).astype(np.float32)
    x = rng.normal(size=(2, C, H, W)).astype(np.float32)
    ref = torch.nn.functional.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                                     torch.from_numpy(b), stride=2)
    ref = _np(ref).reshape(2, D, -1).transpose(0, 2, 1)  # [B, hw, D]

    from einops import rearrange

    patches = rearrange(jnp.asarray(x.transpose(0, 2, 3, 1)),
                        "b (h p1) (w p2) c -> b (h w) (c p1 p2)", p1=2, p2=2)
    ours = np.asarray(patches @ _patch_conv(w) + b)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_group_norm_matches_torch():
    from orv_tpu.models.vae import _group_norm

    rng = np.random.default_rng(3)
    C, G = 8, 4
    x = rng.normal(size=(2, 4, 6, 6, C)).astype(np.float32)  # BTHWC
    scale = rng.normal(size=(C,)).astype(np.float32)
    bias = rng.normal(size=(C,)).astype(np.float32)
    ours = np.asarray(_group_norm(jnp.asarray(x), jnp.asarray(scale),
                                  jnp.asarray(bias), G, 1e-6))
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # BCTHW
    ref = torch.nn.functional.group_norm(xt, G, torch.from_numpy(scale),
                                         torch.from_numpy(bias), 1e-6)
    np.testing.assert_allclose(ours.transpose(0, 4, 1, 2, 3), _np(ref), atol=2e-5)


def test_layer_norm_matches_torch():
    from orv_tpu.models.layers import _layer_norm

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 7, 16)).astype(np.float32)
    scale = rng.normal(size=(16,)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32)
    ours = np.asarray(_layer_norm(jnp.asarray(x), jnp.asarray(scale),
                                  jnp.asarray(bias), 1e-5))
    ref = torch.nn.functional.layer_norm(torch.from_numpy(x), (16,),
                                         torch.from_numpy(scale),
                                         torch.from_numpy(bias), 1e-5)
    np.testing.assert_allclose(ours, _np(ref), atol=2e-5)


def test_sdpa_matches_reference_attention():
    from orv_tpu.ops.attention import mha_reference

    rng = np.random.default_rng(5)
    q = rng.normal(size=(2, 3, 10, 16)).astype(np.float32) * 0.5
    k = rng.normal(size=(2, 3, 10, 16)).astype(np.float32) * 0.5
    v = rng.normal(size=(2, 3, 10, 16)).astype(np.float32)
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v))
    ours = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(ours, _np(ref), atol=2e-5)


def test_gelu_tanh_matches_torch():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(64,)).astype(np.float32) * 3
    import flax.linen as nn

    ours = np.asarray(nn.gelu(jnp.asarray(x), approximate=True))
    ref = _np(torch.nn.functional.gelu(torch.from_numpy(x), approximate="tanh"))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_adaln_zero_6chunk_matches_torch_math():
    """6-chunk regime incl. the split-linear action path vs an explicit
    torch computation (reference CogVideoXLayerNormZero.forward :117-145)."""
    from orv_tpu.models.layers import AdaLNZero

    rng = np.random.default_rng(7)
    B, F_, P_, D, TE = 2, 3, 4, 8, 16
    S = F_ * P_
    hidden = rng.normal(size=(B, S, D)).astype(np.float32)
    enc = rng.normal(size=(B, 5, D)).astype(np.float32)
    temb = rng.normal(size=(B, TE)).astype(np.float32)
    action = rng.normal(size=(B, F_, TE)).astype(np.float32)
    w = rng.normal(size=(6 * D, TE)).astype(np.float32) * 0.3  # torch [out, in]
    b = rng.normal(size=(6 * D,)).astype(np.float32)
    g = rng.normal(size=(D,)).astype(np.float32)
    be = rng.normal(size=(D,)).astype(np.float32)

    mod = AdaLNZero(TE, D, modulate_enc=True, dtype=jnp.float32)
    params = {"params": {
        "linear_kernel": jnp.asarray(w.T), "linear_bias": jnp.asarray(b),
        "norm_scale": jnp.asarray(g), "norm_bias": jnp.asarray(be),
    }}
    h_o, e_o, gate_o, egate_o = mod.apply(
        params, jnp.asarray(hidden), jnp.asarray(enc), jnp.asarray(temb),
        jnp.asarray(action))

    # torch reference math
    th, te_, tt, ta = map(torch.from_numpy, (hidden, enc, temb, action))
    tw, tb = torch.from_numpy(w), torch.from_numpy(b)
    norm = lambda x: torch.nn.functional.layer_norm(
        x, (D,), torch.from_numpy(g), torch.from_numpy(be), 1e-5)
    vid = torch.nn.functional.linear(
        torch.nn.functional.silu(tt[:, None] + ta), tw[: 3 * D], tb[: 3 * D])
    shift, scale, gate = vid.chunk(3, dim=-1)
    scale = scale.repeat_interleave(P_, dim=1)
    shift = shift.repeat_interleave(P_, dim=1)
    gate = gate.repeat_interleave(P_, dim=1)
    h_ref = norm(th) * (1 + scale) + shift
    txt = torch.nn.functional.linear(
        torch.nn.functional.silu(tt), tw[3 * D :], tb[3 * D :])
    e_shift, e_scale, e_gate = txt.chunk(3, dim=-1)
    e_ref = norm(te_) * (1 + e_scale)[:, None] + e_shift[:, None]

    np.testing.assert_allclose(np.asarray(h_o), _np(h_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(e_o), _np(e_ref), atol=3e-5)
    # our gate is [B, F, 1, D]; torch's is repeat_interleaved [B, S, D]
    gate_full = np.broadcast_to(np.asarray(gate_o), (B, F_, P_, D)).reshape(B, S, D)
    np.testing.assert_allclose(gate_full, _np(gate), atol=3e-5)
    np.testing.assert_allclose(np.asarray(egate_o)[:, 0], _np(e_gate), atol=3e-5)


def test_timestep_embedding_matches_diffusers_convention():
    """flip_sin_to_cos + freq_shift 0 against an explicit torch port of the
    DDPM sinusoid (diffusers get_timestep_embedding math)."""
    from orv_tpu.utils.embeddings import get_timestep_embedding

    t = np.array([0, 17, 999], dtype=np.float32)
    dim = 32
    half = dim // 2
    exponent = -np.log(10000) * torch.arange(half, dtype=torch.float64) / half
    emb = torch.from_numpy(t).double()[:, None] * exponent.exp()[None]
    ref = torch.cat([emb.sin(), emb.cos()], dim=-1)
    ref = torch.cat([ref[:, half:], ref[:, :half]], dim=-1)  # flip
    ours = get_timestep_embedding(jnp.asarray(t), dim)
    np.testing.assert_allclose(np.asarray(ours), _np(ref.float()), atol=1e-5)

"""ControlDiT forward-path tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orv_tpu.models import ControlDiT, DiTConfig
from orv_tpu.utils.embeddings import prepare_rotary_positional_embeddings

TINY = dict(
    num_attention_heads=4, attention_head_dim=16, num_layers=2,
    text_embed_dim=32, time_embed_dim=64, max_text_seq_length=8,
    sample_width=16, sample_height=8,
)


def _data(B=2, F=3, C=32, H=8, W=16, text=8, text_dim=32):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, F, C, H, W))
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, text, text_dim))
    t = jnp.array([100] * B)
    return x, enc, t


def test_scratch_3chunk_forward():
    """3-chunk regime (scratch models): text not modulated, video-only attn."""
    cfg = DiTConfig(in_channels=32, out_channels=16,
                    modulate_encoder_hidden_states=False, **TINY)
    model = ControlDiT(cfg, dtype=jnp.float32)
    x, enc, t = _data()
    acts = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 7))
    params = model.init(jax.random.PRNGKey(0), x, enc, t, actions=acts)
    out, mask, recon = model.apply(params, x, enc, t, actions=acts)
    assert out.shape == (2, 3, 16, 8, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_finetune_6chunk_with_rope():
    cfg = DiTConfig(in_channels=32, out_channels=16,
                    modulate_encoder_hidden_states=True,
                    use_rotary_positional_embeddings=True, **TINY)
    model = ControlDiT(cfg, dtype=jnp.float32)
    x, enc, t = _data()
    rope = prepare_rotary_positional_embeddings(
        height=8 * 8, width=16 * 8, num_frames=3, attention_head_dim=16
    )
    params = model.init(jax.random.PRNGKey(0), x, enc, t, image_rotary_emb=rope)
    out, _, _ = model.apply(params, x, enc, t, image_rotary_emb=rope)
    assert out.shape == (2, 3, 16, 8, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_visual_guidance_zero_init_noop():
    """Control injection is zero-gated at init (reference _set_zeros)."""
    cfg = DiTConfig(in_channels=32, out_channels=16, visual_guidance=True,
                    num_control_keys=2, modulate_encoder_hidden_states=True, **TINY)
    model = ControlDiT(cfg, dtype=jnp.float32)
    x, enc, t = _data()
    d = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    l = jax.random.normal(jax.random.PRNGKey(4), x.shape)
    params = model.init(jax.random.PRNGKey(0), x, enc, t, depths=d, labels=l)
    with_ctrl, _, _ = model.apply(params, x, enc, t, depths=d, labels=l)
    without, _, _ = model.apply(params, x, enc, t)
    np.testing.assert_allclose(np.asarray(with_ctrl), np.asarray(without), atol=1e-6)


def test_control_cache_matches_direct():
    """controls_only + control_cache (the sampler's hoist of the
    step-invariant control patch embeds out of the denoise scan) must
    reproduce the direct depths/labels path bit-for-bit. To see a nonzero
    injection, perturb the zero-init combine kernel."""
    cfg = DiTConfig(in_channels=32, out_channels=16, visual_guidance=True,
                    num_control_keys=2, modulate_encoder_hidden_states=True, **TINY)
    model = ControlDiT(cfg, dtype=jnp.float32)
    x, enc, t = _data()
    d = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    l = jax.random.normal(jax.random.PRNGKey(4), x.shape)
    params = model.init(jax.random.PRNGKey(0), x, enc, t, depths=d, labels=l)
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.01 if "initial_combine_linear" in str(p) and v.ndim == 2 else v,
        params)
    cache = model.apply(params, x, enc, t, depths=d, labels=l, controls_only=True)
    assert cache is not None and cache.shape[-1] == 2 * cfg.inner_dim
    direct, _, _ = model.apply(params, x, enc, t, depths=d, labels=l)
    cached, _, _ = model.apply(params, x, enc, t, control_cache=cache)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(direct), atol=0)
    # and the injection is actually live (perturbed kernel => nonzero)
    without, _, _ = model.apply(params, x, enc, t)
    assert float(np.abs(np.asarray(direct) - np.asarray(without)).max()) > 0


def test_control_count_mismatch_raises():
    cfg = DiTConfig(in_channels=32, out_channels=16, visual_guidance=True,
                    num_control_keys=2, **TINY)
    model = ControlDiT(cfg, dtype=jnp.float32)
    x, enc, t = _data()
    d = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), x, enc, t, depths=d)  # only 1 of 2


def test_multiview_forward():
    cfg = DiTConfig(in_channels=32, out_channels=16, multiview=True, max_n_view=2,
                    modulate_encoder_hidden_states=True, **TINY)
    model = ControlDiT(cfg, dtype=jnp.float32)
    V, F = 2, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (2, V * F, 32, 8, 16))
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
    t = jnp.array([100, 200])
    params = model.init(jax.random.PRNGKey(0), x, enc, t, num_views=V)
    out, _, _ = model.apply(params, x, enc, t, num_views=V)
    assert out.shape == (2, V * F, 16, 8, 16)
    # mv params exist and proj_out is zero-init
    mv = params["params"]["blocks"]["mv_block"]
    assert float(jnp.abs(mv["proj_out"]["kernel"]).max()) == 0.0


def test_action_mask_and_recon_training_mode():
    cfg = DiTConfig(in_channels=32, out_channels=16, recon_action=True, **TINY)
    model = ControlDiT(cfg, dtype=jnp.float32)
    B = 16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 3, 32, 8, 16))
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 32))
    t = jnp.array([100] * B)
    acts = jax.random.normal(jax.random.PRNGKey(2), (B, 8, 7))
    params = model.init(jax.random.PRNGKey(0), x, enc, t, actions=acts)
    out, mask, recon = model.apply(
        params, x, enc, t, actions=acts, deterministic=False,
        rngs={"action_mask": jax.random.PRNGKey(7)},
    )
    assert mask.shape == (B,)
    assert recon is not None and recon.shape == (B, 8, 7)
    # deterministic mode: no masking, no recon
    _, mask_d, recon_d = model.apply(params, x, enc, t, actions=acts)
    assert not bool(mask_d.any())
    assert recon_d is None


def test_patch_size_t_path():
    cfg = DiTConfig(in_channels=32, out_channels=16, patch_size_t=2,
                    use_rotary_positional_embeddings=True, **TINY)
    model = ControlDiT(cfg, dtype=jnp.float32)
    F = 4  # divisible by patch_size_t
    x = jax.random.normal(jax.random.PRNGKey(0), (2, F, 32, 8, 16))
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
    t = jnp.array([100, 200])
    rope = prepare_rotary_positional_embeddings(
        height=64, width=128, num_frames=F, patch_size_t=2, attention_head_dim=16
    )
    params = model.init(jax.random.PRNGKey(0), x, enc, t, image_rotary_emb=rope)
    out, _, _ = model.apply(params, x, enc, t, image_rotary_emb=rope)
    assert out.shape == (2, F, 16, 8, 16)


def test_scanned_blocks_have_stacked_params():
    cfg = DiTConfig(in_channels=16, out_channels=16, **TINY)
    model = ControlDiT(cfg, dtype=jnp.float32)
    x, enc, t = _data(C=16)
    params = model.init(jax.random.PRNGKey(0), x, enc, t)
    k = params["params"]["blocks"]["block"]["attn1"]["to_q"]["kernel"]
    assert k.shape[0] == cfg.num_layers  # stacked along layer axis


def test_grad_flows():
    cfg = DiTConfig(in_channels=16, out_channels=16, **TINY)
    model = ControlDiT(cfg, dtype=jnp.float32, remat=True)
    x, enc, t = _data(C=16)
    params = model.init(jax.random.PRNGKey(0), x, enc, t)

    def loss(p):
        out, _, _ = model.apply(p, x, enc, t)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b.astype(jnp.float32) ** 2), g, 0.0
    )
    assert bool(jnp.isfinite(gnorm)) and float(gnorm) > 0


def test_remat_dots_policy_forward_matches():
    """remat_policy='dots' must be numerically identical to plain remat."""
    import jax
    import jax.numpy as jnp

    from orv_tpu.models import ControlDiT, DiTConfig

    cfg = DiTConfig(
        num_attention_heads=2, attention_head_dim=16, num_layers=2,
        in_channels=16, out_channels=16, text_embed_dim=32, time_embed_dim=64,
        max_text_seq_length=8, sample_width=16, sample_height=8,
        modulate_encoder_hidden_states=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 8, 16))
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    t = jnp.array([100], jnp.int32)
    m0 = ControlDiT(cfg, dtype=jnp.float32, attn_impl="xla", remat=True)
    m1 = ControlDiT(cfg, dtype=jnp.float32, attn_impl="xla", remat=True,
                    remat_policy="dots")
    p = m0.init(jax.random.PRNGKey(0), x, enc, t)

    def loss(m, p):
        out, _, _ = m.apply(p, x, enc, t)
        return (out ** 2).mean()

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(p)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(p)
    assert abs(float(l0) - float(l1)) < 1e-6
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5


def test_fused_adaln_train_path_matches_xla():
    """With ORV_TPU_FUSED_ADALN=force the DiTBlock routes norms and gated
    residuals through the Pallas kernels (interpret mode off-TPU) INCLUDING
    their custom-VJP backward; loss and parameter gradients must match the
    XLA lowering. Covers the per-frame (action) and global gate forms and
    both adaLN regimes."""
    import os

    from orv_tpu.models.layers import DiTBlock

    B, F, P, D = 2, 3, 16, 128
    heads, head_dim = 2, 64
    S, text = F * P, 8
    k = jax.random.PRNGKey
    hidden = jax.random.normal(k(0), (B, S, D), jnp.float32)
    enc = jax.random.normal(k(1), (B, text, D), jnp.float32)
    temb = jax.random.normal(k(2), (B, 32), jnp.float32)
    action = jax.random.normal(k(3), (B, F, 32), jnp.float32)
    ct_h = jax.random.normal(k(4), (B, S, D), jnp.float32)

    for modulate_enc, act in [(True, action), (False, action), (True, None)]:
        blk = DiTBlock(dim=D, heads=heads, head_dim=head_dim,
                       time_embed_dim=32, modulate_enc=modulate_enc,
                       dtype=jnp.float32)

        def loss_fn(params):
            h, e = blk.apply(params, hidden, enc, temb, action_emb=act)
            return jnp.sum(h * ct_h) + jnp.sum(e)

        # one enclosing finally so an exception in EITHER phase can never
        # leak the env var (='force' would flip every later test in the
        # process onto interpreter-mode Pallas kernels)
        try:
            os.environ["ORV_TPU_FUSED_ADALN"] = "0"
            params = blk.init(k(5), hidden, enc, temb, action_emb=act)
            l_ref, g_ref = jax.value_and_grad(loss_fn)(params)
            os.environ["ORV_TPU_FUSED_ADALN"] = "force"
            l_fus, g_fus = jax.value_and_grad(loss_fn)(params)
        finally:
            os.environ.pop("ORV_TPU_FUSED_ADALN", None)

        assert abs(float(l_fus) - float(l_ref)) < 1e-3 * max(1.0, abs(float(l_ref)))
        from jax.flatten_util import ravel_pytree
        flat_r, _ = ravel_pytree(g_ref)
        flat_f, _ = ravel_pytree(g_fus)
        np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_r),
                                   atol=5e-3, rtol=5e-3)

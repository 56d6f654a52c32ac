"""Torch->flax weight conversion and checkpoint save/restore tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orv_tpu.models import ControlDiT, DiTConfig
from orv_tpu.models.vae import CausalVAE, VAEConfig
from orv_tpu.models.weights import convert_dit_state_dict, convert_vae_state_dict
from orv_tpu.utils.checkpoint import (
    TrainCheckpointer, export_pretrained, load_pretrained,
)

CFG = DiTConfig(
    num_attention_heads=2, attention_head_dim=8, num_layers=2,
    in_channels=32, out_channels=16, text_embed_dim=16, time_embed_dim=32,
    max_text_seq_length=4, modulate_encoder_hidden_states=True,
    recon_action=True, visual_guidance=True,
)


def _torch_style_dit_sd(cfg: DiTConfig, in_ch=None):
    """Random tensors shaped per the diffusers/reference naming convention."""
    rng = np.random.default_rng(0)
    D = cfg.inner_dim
    TE = cfg.time_embed_dim
    in_ch = in_ch if in_ch is not None else cfg.in_channels
    n_chunks = 6 if cfg.modulate_encoder_hidden_states else 3
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(D, in_ch, 2, 2)).astype(np.float32),
        "patch_embed.proj.bias": rng.normal(size=(D,)).astype(np.float32),
        "patch_embed.text_proj.weight": rng.normal(size=(D, cfg.text_embed_dim)).astype(np.float32),
        "patch_embed.text_proj.bias": rng.normal(size=(D,)).astype(np.float32),
        "time_embedding.linear_1.weight": rng.normal(size=(TE, D)).astype(np.float32),
        "time_embedding.linear_1.bias": rng.normal(size=(TE,)).astype(np.float32),
        "time_embedding.linear_2.weight": rng.normal(size=(TE, TE)).astype(np.float32),
        "time_embedding.linear_2.bias": rng.normal(size=(TE,)).astype(np.float32),
        "norm_final.weight": np.ones(D, np.float32),
        "norm_final.bias": np.zeros(D, np.float32),
        "norm_out.linear.weight": rng.normal(size=(2 * D, TE)).astype(np.float32),
        "norm_out.linear.bias": rng.normal(size=(2 * D,)).astype(np.float32),
        "norm_out.norm.weight": np.ones(D, np.float32),
        "norm_out.norm.bias": np.zeros(D, np.float32),
        "proj_out.weight": rng.normal(size=(cfg.out_channels * 4, D)).astype(np.float32),
        "proj_out.bias": rng.normal(size=(cfg.out_channels * 4,)).astype(np.float32),
        "action_embed.mlp.0.weight": rng.normal(size=(TE * 4, 28)).astype(np.float32),
        "action_embed.mlp.0.bias": rng.normal(size=(TE * 4,)).astype(np.float32),
        "action_embed.mlp.3.weight": rng.normal(size=(TE, TE * 4)).astype(np.float32),
        "action_embed.mlp.3.bias": rng.normal(size=(TE,)).astype(np.float32),
        "action_embed.mask_embed.weight": rng.normal(size=(1, TE)).astype(np.float32),
        "action_recon.mlp.0.weight": rng.normal(size=(TE * 4, TE)).astype(np.float32),
        "action_recon.mlp.0.bias": rng.normal(size=(TE * 4,)).astype(np.float32),
        "action_recon.mlp.2.weight": rng.normal(size=(28, TE * 4)).astype(np.float32),
        "action_recon.mlp.2.bias": rng.normal(size=(28,)).astype(np.float32),
        "initial_combine_linear.weight": np.zeros((D, 2 * D), np.float32),
        "initial_combine_linear.bias": np.zeros((D,), np.float32),
    }
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        for norm in ("norm1", "norm2"):
            sd[f"{b}.{norm}.linear.weight"] = rng.normal(size=(n_chunks * D, TE)).astype(np.float32)
            sd[f"{b}.{norm}.linear.bias"] = rng.normal(size=(n_chunks * D,)).astype(np.float32)
            sd[f"{b}.{norm}.norm.weight"] = np.ones(D, np.float32)
            sd[f"{b}.{norm}.norm.bias"] = np.zeros(D, np.float32)
        for proj in ("to_q", "to_k", "to_v"):
            sd[f"{b}.attn1.{proj}.weight"] = rng.normal(size=(D, D)).astype(np.float32)
            sd[f"{b}.attn1.{proj}.bias"] = rng.normal(size=(D,)).astype(np.float32)
        sd[f"{b}.attn1.to_out.0.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[f"{b}.attn1.to_out.0.bias"] = rng.normal(size=(D,)).astype(np.float32)
        for qk in ("norm_q", "norm_k"):
            sd[f"{b}.attn1.{qk}.weight"] = np.ones(cfg.attention_head_dim, np.float32)
            sd[f"{b}.attn1.{qk}.bias"] = np.zeros(cfg.attention_head_dim, np.float32)
        sd[f"{b}.ff.net.0.proj.weight"] = rng.normal(size=(4 * D, D)).astype(np.float32)
        sd[f"{b}.ff.net.0.proj.bias"] = rng.normal(size=(4 * D,)).astype(np.float32)
        sd[f"{b}.ff.net.2.weight"] = rng.normal(size=(D, 4 * D)).astype(np.float32)
        sd[f"{b}.ff.net.2.bias"] = rng.normal(size=(D,)).astype(np.float32)
    return sd


def _tree_shapes(t):
    return jax.tree_util.tree_map(lambda x: tuple(x.shape), t)


def test_dit_conversion_matches_init_structure():
    model = ControlDiT(CFG, dtype=jnp.float32)
    B, F, H, W = 1, 3, 8, 8
    x = jnp.zeros((B, F, 32, H, W))
    enc = jnp.zeros((B, 4, 16))
    acts = jnp.zeros((B, 8, 7))
    d = jnp.zeros((B, F, 32, H, W))
    init = model.init(
        {"params": jax.random.PRNGKey(0), "action_mask": jax.random.PRNGKey(1)},
        x, enc, jnp.zeros((B,), jnp.int32), actions=acts, depths=d, labels=d,
        deterministic=False,
    )
    converted = convert_dit_state_dict(_torch_style_dit_sd(CFG), CFG)
    assert _tree_shapes(init) == _tree_shapes(converted)
    # converted params must actually run
    out, _, recon = model.apply(
        converted, x, enc, jnp.zeros((B,), jnp.int32), actions=acts, depths=d,
        labels=d, deterministic=False, rngs={"action_mask": jax.random.PRNGKey(2)},
    )
    assert out.shape == (B, F, 16, H, W)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_t2v_surgery_zero_pads_input_channels():
    sd = _torch_style_dit_sd(CFG, in_ch=16)
    converted = convert_dit_state_dict(sd, CFG, from_t2v=True)
    k = converted["params"]["patch_embed"]["proj"]["kernel"]  # [(c p p), D]
    assert k.shape[0] == 32 * 4
    k4 = k.reshape(32, 2, 2, -1)  # (c ph pw) flatten order
    np.testing.assert_array_equal(k4[16:], 0.0)
    assert np.abs(k4[:16]).max() > 0


def test_vae_conversion_structure():
    cfg = VAEConfig(block_out_channels=(8, 16, 16, 32), layers_per_block=1,
                    norm_num_groups=4, latent_channels=4)
    vae = CausalVAE(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 3, 9, 16, 16))  # 8n+1: odd latent count roundtrips
    init = vae.init(jax.random.PRNGKey(0), x)

    rng = np.random.default_rng(0)
    sd = {}

    def add_conv3(prefix, o, i, k):
        sd[f"{prefix}.conv.weight"] = rng.normal(size=(o, i) + k).astype(np.float32)
        sd[f"{prefix}.conv.bias"] = rng.normal(size=(o,)).astype(np.float32)

    def add_gn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)

    def add_sn(prefix, f_ch, zq):
        add_gn(f"{prefix}.norm_layer", f_ch)
        add_conv3(f"{prefix}.conv_y", f_ch, zq, (1, 1, 1))
        add_conv3(f"{prefix}.conv_b", f_ch, zq, (1, 1, 1))

    def add_resnet(prefix, cin, cout, spatial, zq=4):
        if spatial:
            add_sn(f"{prefix}.norm1", cin, zq)
            add_sn(f"{prefix}.norm2", cout, zq)
        else:
            add_gn(f"{prefix}.norm1", cin)
            add_gn(f"{prefix}.norm2", cout)
        add_conv3(f"{prefix}.conv1", cout, cin, (3, 3, 3))
        add_conv3(f"{prefix}.conv2", cout, cout, (3, 3, 3))
        if cin != cout:
            add_conv3(f"{prefix}.conv_shortcut", cout, cin, (1, 1, 1))

    chs = cfg.block_out_channels
    add_conv3("encoder.conv_in", chs[0], 3, (3, 3, 3))
    cin = chs[0]
    for i, cout in enumerate(chs):
        add_resnet(f"encoder.down_blocks.{i}.resnets.0", cin, cout, False)
        cin = cout
        if i < 3:
            sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = (
                rng.normal(size=(cout, cout, 3, 3)).astype(np.float32))
            sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = (
                rng.normal(size=(cout,)).astype(np.float32))
    for j in range(2):
        add_resnet(f"encoder.mid_block.resnets.{j}", chs[-1], chs[-1], False)
    add_gn("encoder.norm_out", chs[-1])
    add_conv3("encoder.conv_out", 8, chs[-1], (3, 3, 3))

    rev = tuple(reversed(chs))
    add_conv3("decoder.conv_in", rev[0], 4, (3, 3, 3))
    for j in range(2):
        add_resnet(f"decoder.mid_block.resnets.{j}", rev[0], rev[0], True)
    cin = rev[0]
    for i, cout in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            add_resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else cout,
                       cout, True)
        cin = cout
        if i < 3:
            sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"] = (
                rng.normal(size=(cout, cout, 3, 3)).astype(np.float32))
            sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"] = (
                rng.normal(size=(cout,)).astype(np.float32))
    add_sn("decoder.norm_out", rev[-1], 4)
    add_conv3("decoder.conv_out", 3, rev[-1], (3, 3, 3))

    converted = convert_vae_state_dict(sd, cfg)
    assert _tree_shapes(init) == _tree_shapes(converted)
    out, moments = vae.apply(converted, x)
    assert out.shape == x.shape


def test_checkpoint_roundtrip(tmp_path):
    from orv_tpu.parallel import TrainState, make_optimizer, make_lr_schedule

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    tx = make_optimizer(make_lr_schedule(total_steps=10, warmup_steps=0))
    state = TrainState(step=jnp.asarray(5), params=params, opt_state=tx.init(params))
    ckpt = TrainCheckpointer(str(tmp_path / "ckpts"), max_to_keep=2)
    ckpt.save(5, state)
    ckpt.save(10, state)
    ckpt.save(15, state)  # rotation drops step 5
    assert ckpt.latest_step() == 15
    restored = ckpt.restore(state)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.asarray(params["w"]))
    ckpt2 = TrainCheckpointer(str(tmp_path / "ckpts"))
    assert ckpt2.latest_step() == 15
    assert 5 not in ckpt2.manager.all_steps()


def test_export_load_pretrained(tmp_path):
    params = {"params": {"layer": {"kernel": np.ones((3, 4), np.float32)}}}
    export_pretrained(str(tmp_path / "pre"), params, CFG)
    cfg, loaded = load_pretrained(str(tmp_path / "pre"), DiTConfig)
    assert cfg.num_layers == CFG.num_layers
    assert cfg.modulate_encoder_hidden_states is True
    np.testing.assert_array_equal(
        loaded["params"]["layer"]["kernel"], params["params"]["layer"]["kernel"]
    )


def test_mv_blocks_initialization_surgery(tmp_path):
    """Stage-3 recipe (VERDICT r2 #2): loading a stage-1/2 (non-multiview)
    export into a multiview: true model must copy the main blocks' attn/norm
    into fresh mv_blocks with a zero proj_out (reference
    cogvideox_control.py:1043-1050), and a frozen-except-mv train step must
    run and leave the main blocks untouched."""
    from orv_tpu.models.weights import ensure_mv_blocks
    from orv_tpu.parallel import (
        TrainState, make_lr_schedule, make_optimizer, make_train_step,
    )
    from orv_tpu.schedulers import make_schedule

    # stage-2 model: same dims, no multiview
    base_cfg = dataclasses.replace(CFG, multiview=False)
    model2 = ControlDiT(base_cfg, dtype=jnp.float32)
    B, F, H, W = 1, 3, 8, 8
    x = jnp.zeros((B, F, 32, H, W))
    enc = jnp.zeros((B, 4, 16))
    acts = jnp.zeros((B, 8, 7))
    p2 = model2.init(
        {"params": jax.random.PRNGKey(0), "action_mask": jax.random.PRNGKey(1)},
        x, enc, jnp.zeros((B,), jnp.int32), actions=acts, depths=x, labels=x,
        deterministic=False,
    )
    export_pretrained(str(tmp_path / "stage2"), p2, base_cfg)

    # stage-3 model: multiview — load + surgery
    mv_cfg = dataclasses.replace(CFG, multiview=True, max_n_view=2)
    _, loaded = load_pretrained(str(tmp_path / "stage2"), DiTConfig)
    params = ensure_mv_blocks(loaded, mv_cfg)
    mv = params["params"]["blocks"]["mv_block"]
    blk = params["params"]["blocks"]["block"]
    np.testing.assert_array_equal(mv["attn1"]["to_q"]["kernel"],
                                  blk["attn1"]["to_q"]["kernel"])
    np.testing.assert_array_equal(mv["norm1"]["linear_kernel"],
                                  blk["norm1"]["linear_kernel"])
    np.testing.assert_array_equal(mv["proj_out"]["kernel"], 0.0)

    # structure matches a fresh multiview init (multiview batch layout:
    # B leading, V*F frames — see test_train_step multiview tests)
    model3 = ControlDiT(mv_cfg, dtype=jnp.float32)
    V = 2
    xv = jnp.zeros((B, V * F, 32, H, W))
    init3 = model3.init(
        {"params": jax.random.PRNGKey(0), "action_mask": jax.random.PRNGKey(1)},
        xv, enc, jnp.zeros((B,), jnp.int32), actions=acts, depths=xv,
        labels=xv, deterministic=False, num_views=V,
    )
    assert (jax.tree_util.tree_structure(init3)
            == jax.tree_util.tree_structure(params))
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.shape(a) == np.shape(b), init3, params))

    # frozen-except-mv train step: only mv_block moves
    tx = make_optimizer(make_lr_schedule(warmup_steps=0, total_steps=10),
                        trainable_predicate=lambda path: "mv_block" in path)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    C = 16
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(2), (B, 2 * C, V * F, H, W)),
        "image_latents": jax.random.normal(jax.random.PRNGKey(3), (B, 2 * C, V, H, W)),
        "prompt_embeds": jax.random.normal(jax.random.PRNGKey(4), (B, 4, 16)),
        "actions": jax.random.normal(jax.random.PRNGKey(5), (B, 8, 7)) * 0.1,
        "latents_depth": jax.random.normal(jax.random.PRNGKey(6), (B, 2 * C, V * F, H, W)),
        "latents_label": jax.random.normal(jax.random.PRNGKey(7), (B, 2 * C, V * F, H, W)),
    }
    step = make_train_step(model3.apply, tx, make_schedule(), num_views=V)
    p0 = jax.device_get(state.params)  # snapshot: the step donates state
    new_state, metrics = step(state, batch, jax.random.PRNGKey(8))
    assert np.isfinite(float(metrics["loss"]))
    p1 = jax.device_get(new_state.params)
    # main block untouched, mv params updated
    np.testing.assert_array_equal(
        p1["params"]["blocks"]["block"]["attn1"]["to_q"]["kernel"],
        p0["params"]["blocks"]["block"]["attn1"]["to_q"]["kernel"])
    moved = np.abs(p1["params"]["blocks"]["mv_block"]["attn1"]["to_q"]["kernel"]
                   - p0["params"]["blocks"]["mv_block"]["attn1"]["to_q"]["kernel"]).max()
    assert moved > 0


def test_export_dit_state_dict_roundtrip(tmp_path):
    """ours -> torch layout -> ours must be the identity, leaf for leaf —
    an orv_tpu-trained model can go back to the reference stack (its
    save_pretrained folder format, cogvideox_control.py:1056-1087)."""
    from orv_tpu.models.weights import (
        export_dit_state_dict, export_torch_pretrained, load_torch_state_dict,
    )

    sd0 = _torch_style_dit_sd(CFG)
    params = convert_dit_state_dict(sd0, CFG)
    sd = export_dit_state_dict(params, CFG)
    assert set(sd.keys()) == set(sd0.keys())
    for k in sd0:
        np.testing.assert_array_equal(sd[k], sd0[k], err_msg=k)

    # full folder write/read: safetensors + diffusers-style config.json
    out = tmp_path / "torch_export"
    export_torch_pretrained(out, params, CFG)
    back = load_torch_state_dict(str(out))
    assert set(back.keys()) == set(sd0.keys())
    for k in sd0:
        np.testing.assert_array_equal(back[k], sd0[k], err_msg=k)
    import json as _json

    cfg = _json.loads((out / "config.json").read_text())
    assert cfg["_class_name"] == "CogVideoXTransformer3DModelTraj"
    assert cfg["num_layers"] == CFG.num_layers
    assert cfg["activation_fn"] == "gelu-approximate"

    # round-trip through the converter again: identical param tree
    params2 = convert_dit_state_dict(back, CFG)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_dit_state_dict_multiview_roundtrip():
    """Multiview trees export mv_blocks.* too (stage-3 checkpoints)."""
    from orv_tpu.models.weights import export_dit_state_dict

    mv_cfg = dataclasses.replace(CFG, multiview=True, max_n_view=2)
    # ensure_mv_blocks path: a non-mv sd loaded into an mv config grows
    # mv_blocks — the export must emit them
    params = convert_dit_state_dict(_torch_style_dit_sd(CFG), mv_cfg)
    sd = export_dit_state_dict(params, mv_cfg)
    assert "mv_blocks.0.attn1.to_q.weight" in sd
    assert "mv_blocks.1.cam_encoder.weight" in sd
    params2 = convert_dit_state_dict(sd, mv_cfg)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_refuses_int8_trees():
    from orv_tpu.models.quantize import quantize_linear_params
    from orv_tpu.models.weights import export_dit_state_dict

    params = convert_dit_state_dict(_torch_style_dit_sd(CFG), CFG)
    qparams = quantize_linear_params(params)
    with pytest.raises(ValueError, match="int8"):
        export_dit_state_dict(qparams, CFG)

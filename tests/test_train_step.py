"""Sharded train-step tests on the 8-device CPU mesh (dp x fsdp x tp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orv_tpu.models import ControlDiT, DiTConfig
from orv_tpu.parallel import (
    MeshConfig, TrainState, make_mesh, make_optimizer, make_lr_schedule,
    make_train_step, param_shardings,
)
from orv_tpu.parallel.mesh import batch_sharding
from orv_tpu.schedulers import make_schedule

CFG = DiTConfig(
    num_attention_heads=4, attention_head_dim=16, num_layers=2,
    in_channels=32, out_channels=16, text_embed_dim=32, time_embed_dim=64,
    max_text_seq_length=8, sample_width=16, sample_height=8, recon_action=True,
)


def _batch(B=8, F=3, C=16, H=8, W=16):
    k = jax.random.PRNGKey(0)
    return {
        "latents": jax.random.normal(k, (B, 2 * C, F, H, W)),
        "image_latents": jax.random.normal(k, (B, 2 * C, 1, H, W)),
        "prompt_embeds": jax.random.normal(k, (B, 8, 32)),
        "actions": jax.random.normal(k, (B, F * 4 - 4, 7)) * 0.1,
    }


def _setup(mesh=None, accum=1):
    model = ControlDiT(CFG, dtype=jnp.float32)
    sched = make_schedule()
    b = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "action_mask": jax.random.PRNGKey(1)},
        b["latents"][:, :32].transpose(0, 2, 1, 3, 4),
        b["prompt_embeds"], jnp.zeros((8,), jnp.int32), actions=b["actions"],
        deterministic=False,
    )
    lr = make_lr_schedule(total_steps=100, warmup_steps=0)
    tx = make_optimizer(lr, grad_accum_steps=accum)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    step = make_train_step(model.apply, tx, sched, mesh=mesh, recon_action=True,
                           fold_rng=False)
    return state, step, b


def test_single_device_step_decreases_loss():
    state, step, batch = _setup()
    rng = jax.random.PRNGKey(42)
    losses = []
    for _ in range(4):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # same batch: must overfit quickly
    assert float(m["grad_norm"]) > 0


def test_mesh_sharded_step():
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2), backend="cpu")
    state, step, batch = _setup(mesh=mesh)
    shardings = param_shardings(state.params, mesh)
    state = TrainState(
        step=jax.device_put(state.step),
        params=jax.device_put(state.params, shardings),
        opt_state=state.opt_state,
    )
    batch = jax.device_put(batch, batch_sharding(mesh))
    rng = jax.random.PRNGKey(0)
    state, m1 = step(state, batch, rng)
    state, m2 = step(state, batch, rng)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])


def test_tp_shards_attention_kernels():
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2), backend="cpu")
    model = ControlDiT(CFG, dtype=jnp.float32)
    b = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "action_mask": jax.random.PRNGKey(1)},
        b["latents"][:, :32].transpose(0, 2, 1, 3, 4), b["prompt_embeds"],
        jnp.zeros((8,), jnp.int32), actions=b["actions"], deterministic=False,
    )
    sh = param_shardings(params, mesh)

    def axes(spec):  # flatten (possibly stacked) PartitionSpec entries
        out = []
        for e in tuple(spec):
            out.extend(e if isinstance(e, tuple) else [e])
        return out

    qk = sh["params"]["blocks"]["block"]["attn1"]["to_q"]["kernel"].spec
    # round-5 rule: scanned kernels ZeRO-shard the OUT dim, stacked on tp
    assert tuple(qk) == (None, None, ("tp", "fsdp")), qk
    assert "tp" in axes(qk)
    out = sh["params"]["blocks"]["block"]["attn1"]["to_out"]["kernel"].spec
    assert out[-2] == "tp" or out[1] == "tp"


def test_grad_accumulation():
    state, step, batch = _setup(accum=2)
    rng = jax.random.PRNGKey(1)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, _ = step(state, batch, rng)
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))  # not applied yet
    state, _ = step(state, batch, rng)
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    assert np.abs(np.asarray(p2) - np.asarray(p0)).max() > 0  # applied after 2


def test_lr_schedule_shapes():
    lr = make_lr_schedule("cosine_with_restarts", 2e-4, 10, 100)
    assert float(lr(0)) == 0.0
    assert abs(float(lr(10)) - 2e-4) < 1e-9
    assert float(lr(100)) == 0.0
    assert float(lr(55)) > 0  # mid-cycle


def test_trainable_predicate_freezes_params():
    """multiview stage: only mv_block params update (reference
    _set_trainable_parameters)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, multiview=True, max_n_view=2, recon_action=False)
    model = ControlDiT(cfg, dtype=jnp.float32)
    V, F = 2, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (4, V * F, 32, 8, 16))
    enc = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 32))
    params = model.init(jax.random.PRNGKey(0), x, enc, jnp.zeros((4,), jnp.int32),
                        num_views=V)
    from orv_tpu.schedulers import make_schedule

    lr = make_lr_schedule(total_steps=100, warmup_steps=0)
    tx = make_optimizer(lr, trainable_predicate=lambda p: "mv_block" in p)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(2), (4, 32, V * F, 8, 16)),
        "image_latents": jax.random.normal(jax.random.PRNGKey(3), (4, 32, V, 8, 16)),
        "prompt_embeds": jax.random.normal(jax.random.PRNGKey(4), (4, 8, 32)),
    }
    step = make_train_step(model.apply, tx, make_schedule(), num_views=V,
                           fold_rng=False)
    p0 = jax.device_get(state.params)
    state, m = step(state, batch, jax.random.PRNGKey(5))
    p1 = jax.device_get(state.params)
    frozen = np.abs(p1["params"]["blocks"]["block"]["attn1"]["to_q"]["kernel"]
                    - p0["params"]["blocks"]["block"]["attn1"]["to_q"]["kernel"]).max()
    moved = np.abs(p1["params"]["blocks"]["mv_block"]["attn1"]["to_q"]["kernel"]
                   - p0["params"]["blocks"]["mv_block"]["attn1"]["to_q"]["kernel"]).max()
    assert frozen == 0.0
    assert moved > 0.0


def test_patch_size_t_frame_padding():
    """CogVideoX-1.5 path: F not divisible by patch_size_t -> latents and
    actions zero-pad, padded frames masked out of the loss (reference train
    loop :943-964)."""
    import jax
    import jax.numpy as jnp

    from orv_tpu.models import ControlDiT, DiTConfig
    from orv_tpu.parallel.train_step import diffusion_loss
    from orv_tpu.schedulers import make_schedule

    cfg = DiTConfig(
        num_attention_heads=2, attention_head_dim=16, num_layers=1,
        in_channels=32, out_channels=16, text_embed_dim=16, time_embed_dim=32,
        max_text_seq_length=4, sample_width=8, sample_height=8,
        patch_size_t=2, use_rotary_positional_embeddings=False,
        use_learned_positional_embeddings=False,
        modulate_encoder_hidden_states=True,
    )
    model = ControlDiT(cfg, dtype=jnp.float32, attn_impl="xla")
    B, F, C, H, W = 1, 3, 16, 8, 8  # F=3 not divisible by pt=2 -> pad to 4
    k = jax.random.PRNGKey(0)
    batch = {
        "latents": jax.random.normal(k, (B, 2 * C, F, H, W)),
        "image_latents": jax.random.normal(k, (B, 2 * C, 1, H, W)),
        "prompt_embeds": jax.random.normal(k, (B, 4, 16)),
        "actions": jax.random.normal(k, (B, F * 4 - 4, 7)) * 0.1,
    }
    params = model.init(
        {"params": k, "action_mask": jax.random.PRNGKey(1)},
        jnp.zeros((B, 4, 32, H, W)), batch["prompt_embeds"],
        jnp.zeros((B,), jnp.int32),
        actions=jnp.zeros((B, 4 * 4 - 4 + 3, 7)), deterministic=False,
    )
    loss, metrics = diffusion_loss(
        model.apply, params, batch, make_schedule(),
        jax.random.PRNGKey(2), patch_size_t=2,
    )
    assert jnp.isfinite(loss)


def test_initialize_distributed_bad_coordinator_raises():
    """VERDICT r2 weak #6: an explicit multi-host bring-up failure must
    surface, not silently degrade to process_count()==1."""
    import pytest

    from orv_tpu.parallel.mesh import initialize_distributed

    with pytest.raises(RuntimeError, match="distributed bring-up failed"):
        initialize_distributed("definitely-not-a-host:1234", 2, 0)


def test_tp_sharded_sampler_matches_single_device():
    """Sharded serving: Megatron tp param shardings through the jitted
    sampler scan (GSPMD inserts the collectives) must reproduce the
    single-device denoise exactly."""
    import dataclasses

    from orv_tpu.parallel import MeshConfig, make_mesh, param_shardings
    from orv_tpu.pipelines.sample import SamplerConfig, make_sampler
    from orv_tpu.schedulers import make_schedule

    cfg = dataclasses.replace(CFG, recon_action=False)
    model = ControlDiT(cfg, dtype=jnp.float32)
    B, F, C, H, W = 1, 3, 16, 8, 16
    k = jax.random.PRNGKey
    lat = jax.random.normal(k(0), (B, F, C, H, W))
    img = jax.random.normal(k(1), (B, F, C, H, W)) * 0.1
    enc = jax.random.normal(k(2), (B, 8, 32))
    params = model.init(k(3), jnp.concatenate([lat, lat], 2), enc,
                        jnp.zeros((B,), jnp.int32))
    sampler = make_sampler(model.apply, make_schedule(),
                           SamplerConfig(num_inference_steps=3))
    ref = jax.jit(sampler)(params, lat, img, enc, k(9))

    mesh = make_mesh(MeshConfig(dp=-1, fsdp=1, tp=2), backend="cpu")  # tp=2 over 2 heads
    sharded = jax.device_put(params, param_shardings(params, mesh))
    got = jax.jit(sampler)(sharded, lat, img, enc, k(9))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_adaln_train_step_matches_xla_under_remat():
    """One full jitted train step (remat'd scanned blocks, adamw) with the
    fused Pallas adaLN/gated-residual kernels forced on (interpret mode off-
    TPU) must produce the same loss and grad norm as the XLA lowering —
    de-risks the custom-VJP kernels inside nn.remat + lax.scan + jit, the
    exact composition the on-chip training path runs."""
    import os

    model = ControlDiT(CFG, dtype=jnp.float32, remat=True)
    sched = make_schedule()
    b = _batch(B=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "action_mask": jax.random.PRNGKey(1)},
        b["latents"][:2, :32].transpose(0, 2, 1, 3, 4),
        b["prompt_embeds"][:2], jnp.zeros((2,), jnp.int32),
        actions=b["actions"][:2], deterministic=False,
    )
    tx = make_optimizer(make_lr_schedule(total_steps=100, warmup_steps=0))
    step = make_train_step(model.apply, tx, sched, recon_action=True,
                           fold_rng=False)
    rng = jax.random.PRNGKey(7)

    def run():
        # fresh buffer copies: the jitted step donates the TrainState, so
        # reusing `params` across runs would pass deleted buffers
        p = jax.tree_util.tree_map(jnp.array, params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=p,
                           opt_state=tx.init(p))
        state, m = step(state, b, rng)
        return float(m["loss"]), float(m["grad_norm"])

    try:
        os.environ["ORV_TPU_FUSED_ADALN"] = "0"
        l_ref, g_ref = run()
        os.environ["ORV_TPU_FUSED_ADALN"] = "force"
        l_fus, g_fus = run()
    finally:
        os.environ.pop("ORV_TPU_FUSED_ADALN", None)

    assert abs(l_fus - l_ref) < 1e-4 * max(1.0, abs(l_ref)), (l_fus, l_ref)
    assert abs(g_fus - g_ref) < 1e-3 * max(1.0, g_ref), (g_fus, g_ref)


def test_fused_adaln_default_off_under_training_trace(monkeypatch):
    """Training traces run under fused_adaln_override(False) because the
    fused custom-VJP backward is a measured on-chip regression (0.4344 vs
    0.4197 s/step, 1.4B, 2026-08-19). Precedence: env `0` < env `force` <
    override < backend auto-detect."""
    import os

    from orv_tpu.models import layers

    monkeypatch.delenv("ORV_TPU_FUSED_ADALN", raising=False)
    # simulate running on the TPU backend: auto-detect says fused...
    monkeypatch.setattr(layers.jax, "default_backend", lambda: "tpu")
    assert layers._fused_adaln_ok() is True
    # ...but a training trace (the override the step builders install)
    # falls back to the XLA lowering
    with layers.fused_adaln_override(False):
        assert layers._fused_adaln_ok() is False
        # env knobs still win over the override, both ways
        monkeypatch.setenv("ORV_TPU_FUSED_ADALN", "force")
        assert layers._fused_adaln_ok() is True
        monkeypatch.setenv("ORV_TPU_FUSED_ADALN", "0")
        assert layers._fused_adaln_ok() is False
    monkeypatch.delenv("ORV_TPU_FUSED_ADALN", raising=False)
    assert layers._fused_adaln_ok() is True  # override restored on exit


def test_dp_batch_sharded_sampler_matches_single_device():
    """Data-parallel batched serving (evaluation.mesh.dp): batch sharded
    over the dp axis through the jitted sampler scan must reproduce the
    replicated run exactly (GSPMD shards every per-clip computation)."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from orv_tpu.parallel import MeshConfig, make_mesh, param_shardings
    from orv_tpu.pipelines.sample import SamplerConfig, make_sampler
    from orv_tpu.schedulers import make_schedule

    cfg = dataclasses.replace(CFG, recon_action=False)
    model = ControlDiT(cfg, dtype=jnp.float32)
    B, F, C, H, W = 4, 3, 16, 8, 16
    k = jax.random.PRNGKey
    lat = jax.random.normal(k(0), (B, F, C, H, W))
    img = jax.random.normal(k(1), (B, F, C, H, W)) * 0.1
    enc = jax.random.normal(k(2), (B, 8, 32))
    params = model.init(k(3), jnp.concatenate([lat, lat], 2), enc,
                        jnp.zeros((B,), jnp.int32))
    sampler = make_sampler(model.apply, make_schedule(),
                           SamplerConfig(num_inference_steps=3))
    ref = jax.jit(sampler)(params, lat, img, enc, k(9))

    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=1),
                     devices=jax.devices("cpu")[:2])
    bsh = NamedSharding(mesh, P("dp"))
    sharded_params = jax.device_put(params, param_shardings(params, mesh))
    got = jax.jit(sampler)(sharded_params, jax.device_put(lat, bsh),
                           jax.device_put(img, bsh),
                           jax.device_put(enc, bsh), k(9))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_sp_train_step_matches_single_device():
    """Context-parallel training (train.mesh.sp): the DiT built with an
    sp_mesh rings every block's joint attention over the sp axis
    (ops/ring_attention.py) and AD flows back through the shard_map ring.
    One step must match the resident single-device step (float32; ring
    logsumexp merging reorders reductions -> small tolerance). Also pins
    the dp x sp composition: batch sharded over dp while sequences ring
    over sp."""
    state, step, batch = _setup()
    rng = jax.random.PRNGKey(7)
    ref_state, ref_m = step(state, batch, rng)
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)

    for axes in ({"dp": 1, "sp": 2}, {"dp": 2, "sp": 2},
                 {"dp": 1, "fsdp": 2, "sp": 2}):
        n = axes["dp"] * axes.get("fsdp", 1) * axes["sp"]
        mesh = make_mesh(MeshConfig(dp=axes["dp"], fsdp=axes.get("fsdp", 1),
                                    sp=axes["sp"]),
                         devices=jax.devices("cpu")[:n])
        model_sp = ControlDiT(CFG, dtype=jnp.float32, sp_mesh=mesh)
        sched = make_schedule()
        lr = make_lr_schedule(total_steps=100, warmup_steps=0)
        tx = make_optimizer(lr)
        # the ref step donated its state — _setup() re-inits identically
        fresh, _, _ = _setup()
        sp_state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=jax.device_put(fresh.params,
                                  param_shardings(fresh.params, mesh)),
            opt_state=tx.init(fresh.params),
        )
        sp_step = make_train_step(model_sp.apply, tx, sched, mesh=mesh,
                                  recon_action=True, fold_rng=False)
        sp_batch = jax.device_put(batch, batch_sharding(mesh))
        sp_state, m = sp_step(sp_state, sp_batch, rng)
        np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                                   atol=1e-5, rtol=1e-5)
        got_leaves = jax.tree_util.tree_leaves(sp_state.params)
        for a, b in zip(got_leaves, ref_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=5e-4)


def test_sp_train_grad_joint_text_regime():
    """The 6-chunk regime routes text through the joint ring
    (joint_ring_attention's text-query psum merge) — its logsumexp
    stabilizer uses pmax, which has no AD rule unless stop_gradient'ed.
    Pin that gradients through the joint ring match the resident ones
    (the stabilizer is mathematically gradient-free)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, modulate_encoder_hidden_states=True,
                              recon_action=False)
    model = ControlDiT(cfg, dtype=jnp.float32)
    B, F, C, H, W = 2, 3, 16, 8, 16
    k = jax.random.PRNGKey
    x = jax.random.normal(k(0), (B, F, 2 * C, H, W))
    enc = jax.random.normal(k(1), (B, 8, 32))
    t = jnp.zeros((B,), jnp.int32)
    params = model.init(k(2), x, enc, t)

    def loss_fn(m):
        def f(p):
            out, _, _ = m.apply(p, x, enc, t)
            return (out.astype(jnp.float32) ** 2).mean()
        return f

    ref_loss, ref_grads = jax.value_and_grad(loss_fn(model))(params)

    mesh = make_mesh(MeshConfig(dp=1, sp=2), devices=jax.devices("cpu")[:2])
    model_sp = ControlDiT(cfg, dtype=jnp.float32, sp_mesh=mesh)
    sp_loss, sp_grads = jax.jit(jax.value_and_grad(loss_fn(model_sp)))(
        jax.device_put(params, param_shardings(params, mesh)))
    np.testing.assert_allclose(float(sp_loss), float(ref_loss),
                               atol=1e-6, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(sp_grads),
                    jax.tree_util.tree_leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_sp_non_divisible_sequence_raises():
    """sp_mesh with a video token count not divisible by sp must refuse
    loudly (a silent resident fallback would OOM the long-context run the
    user asked sp for)."""
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices("cpu")[:2]), ("sp",))
    import dataclasses

    # 6x2 latents, patch 2 -> 3 patches/frame, F=3 -> 9 video tokens: odd
    cfg = dataclasses.replace(CFG, sample_width=6, sample_height=2,
                              recon_action=False)
    model = ControlDiT(cfg, dtype=jnp.float32, sp_mesh=mesh)
    B, F, C = 2, 3, 16
    lat = jax.random.normal(jax.random.PRNGKey(0), (B, F, 2 * C, 2, 6))
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 32))
    with pytest.raises(ValueError, match="divisible by sp"):
        model.init(jax.random.PRNGKey(2), lat, enc, jnp.zeros((B,), jnp.int32))


def test_pp_refuses_sp_mesh():
    from orv_tpu.parallel.pp import make_pp_train_step

    mesh = make_mesh(MeshConfig(dp=2, pp=2, sp=2), backend="cpu")
    model = ControlDiT(CFG, dtype=jnp.float32)
    tx = make_optimizer(make_lr_schedule())
    with pytest.raises(ValueError, match="composes with dp, fsdp and tp"):
        make_pp_train_step(model, tx, make_schedule(), mesh)


def test_prodigy_config_surface():
    """Reference prodigy yaml knobs (base_train.yaml:151-156):
    safeguard_warmup maps onto optax.contrib.prodigy; the decouple /
    bias-correction variants have no optax analog and must raise rather
    than silently train a different optimizer."""
    import pytest

    tx = make_optimizer(make_lr_schedule(total_steps=10), "prodigy",
                        prodigy_safeguard_warmup=True)
    p = {"w": jnp.ones((4, 4))}
    state = tx.init(p)
    updates, _ = tx.update({"w": jnp.full((4, 4), 0.1)}, state, p)
    assert jnp.all(jnp.isfinite(updates["w"]))
    with pytest.raises(ValueError, match="prodigy_decouple"):
        make_optimizer(make_lr_schedule(total_steps=10), "prodigy",
                       prodigy_decouple=True)
    with pytest.raises(ValueError, match="prodigy_decouple"):
        make_optimizer(make_lr_schedule(total_steps=10), "prodigy",
                       prodigy_use_bias_correction=True)


def test_params_ema_tracks_and_extracts():
    """EMA transform: ema <- d*ema + (1-d)*(params+updates), updated once
    per APPLIED step (inside MultiSteps), extractable through the nested
    optimizer state (chain + multi_transform + MultiSteps)."""
    from orv_tpu.parallel import ema_params
    from orv_tpu.parallel.train_step import params_ema

    d = 0.5
    # plain: two steps of constant updates
    import optax

    tx = optax.chain(optax.sgd(0.1), params_ema(d))
    p = {"w": jnp.ones((3,))}
    s = tx.init(p)
    g = {"w": jnp.full((3,), 1.0)}
    u, s = tx.update(g, s, p)
    p1 = optax.apply_updates(p, u)
    ema1 = ema_params(s)
    np.testing.assert_allclose(np.asarray(ema1["w"]),
                               d * 1.0 + (1 - d) * np.asarray(p1["w"]),
                               rtol=1e-6)
    u, s = tx.update(g, s, p1)
    p2 = optax.apply_updates(p1, u)
    ema2 = ema_params(s)
    np.testing.assert_allclose(
        np.asarray(ema2["w"]),
        d * np.asarray(ema1["w"]) + (1 - d) * np.asarray(p2["w"]), rtol=1e-6)

    # through the full factory nesting: accum=2 -> EMA moves only on the
    # applied (2nd) micro-step; extraction walks MultiSteps+multi_transform
    tx = make_optimizer(make_lr_schedule(total_steps=10, warmup_steps=0),
                        grad_accum_steps=2, ema_decay=0.9,
                        trainable_predicate=lambda path: True)
    p = {"w": jnp.ones((3,))}
    s = tx.init(p)
    ema0 = np.asarray(ema_params(s)["w"])
    u, s = tx.update(g, s, p)
    np.testing.assert_array_equal(np.asarray(ema_params(s)["w"]), ema0)
    p = optax.apply_updates(p, u)
    u, s = tx.update(g, s, p)
    assert np.abs(np.asarray(ema_params(s)["w"]) - ema0).max() > 0
    # no-EMA optimizer: extractor returns None
    tx = make_optimizer(make_lr_schedule(total_steps=10))
    assert ema_params(tx.init(p)) is None


def test_train_step_with_ema_runs_and_lags_params():
    """Full train step with ema_decay: the EMA tree stays a valid param
    pytree (validation can denoise with it) and lags the raw params."""
    from orv_tpu.parallel import ema_params

    model = ControlDiT(CFG, dtype=jnp.float32)
    sched = make_schedule()
    b = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "action_mask": jax.random.PRNGKey(1)},
        b["latents"][:, :32].transpose(0, 2, 1, 3, 4),
        b["prompt_embeds"], jnp.zeros((8,), jnp.int32), actions=b["actions"],
        deterministic=False,
    )
    tx = make_optimizer(make_lr_schedule(total_steps=100, warmup_steps=0),
                        ema_decay=0.9)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    step = make_train_step(model.apply, tx, sched, recon_action=True,
                           fold_rng=False)
    rng = jax.random.PRNGKey(42)
    for _ in range(3):
        state, m = step(state, b, rng)
    assert np.isfinite(float(m["loss"]))
    ema = ema_params(state.opt_state)
    leaf = lambda t: jax.tree_util.tree_leaves(t)[0]
    assert leaf(ema).shape == leaf(state.params).shape
    diff = float(jnp.abs(leaf(ema) - leaf(state.params)).max())
    assert diff > 0  # EMA lags the moving params


def test_head_kernel_fsdp_shards_input_dim():
    """proj_out's kernel must never be ZeRO-sharded on its OUTPUT dim: that
    makes GSPMD demand a feature-sharded cotangent at the unpatchify reshape
    in the backward, which it satisfies with "Involuntary full
    rematerialization" (a replicate-everything cliff). Fires when
    out_features > inner_dim — exactly the tiny-config regime (observed
    2026-08-19 on a [B,12,64] head under dp2 x fsdp2 x tp2)."""
    from orv_tpu.parallel.mesh import _spec_for

    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2), backend="cpu")

    class K:  # stand-in for a jax.tree path key
        def __init__(self, key):
            self.key = key

    # tiny regime: inner 16 -> out_features 64 (both fsdp-divisible)
    spec = _spec_for((K("proj_out"), K("kernel")), (16, 64), mesh)
    assert tuple(spec) == ("fsdp", None), spec
    # flagship regime unchanged: inner 1920 -> 64
    spec = _spec_for((K("proj_out"), K("kernel")), (1920, 64), mesh)
    assert tuple(spec) == ("fsdp", None), spec
    # non-head kernels keep the largest-free-axis rule (tp out, then fsdp)
    spec = _spec_for((K("to_q"), K("kernel")), (16, 64), mesh)
    assert tuple(spec) == ("fsdp", "tp"), spec


def test_scanned_kernel_fsdp_shards_out_dim():
    """Scanned block kernels [L, in, out] ZeRO-shard the OUT dim (stacking
    on 'tp' when tp already owns it): an in-dim-sharded kernel forces the
    weight-grad dot inside the backward scan to demand a feature-sharded
    copy of the layer-stacked saved activation, which GSPMD satisfies with
    "Involuntary full rematerialization" (round-5 VERDICT #2 root cause;
    the seeded regression lives in tests/test_dryrun_gate.py)."""
    from orv_tpu.parallel.mesh import _spec_for
    from orv_tpu.parallel.pp import _fsdp_axis

    class K:
        def __init__(self, key):
            self.key = key

    path = (K("blocks"), K("block"), K("attn1"), K("to_k"), K("kernel"))
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2), backend="cpu")
    # tp owns the out dim -> fsdp stacks onto it, in dim stays unsharded
    spec = _spec_for(path, (2, 64, 64), mesh)
    assert tuple(spec) == (None, None, ("tp", "fsdp")), spec
    # row-parallel net_2 [L, in(tp), out]: fsdp takes the free out dim
    p2 = (K("blocks"), K("block"), K("ff"), K("net_2"), K("kernel"))
    spec = _spec_for(p2, (2, 256, 64), mesh)
    assert tuple(spec) == (None, "tp", "fsdp"), spec
    # no tp: fsdp alone lands on the out dim
    mesh1 = make_mesh(MeshConfig(dp=4, fsdp=2), backend="cpu")
    spec = _spec_for(path, (2, 64, 64), mesh1)
    assert tuple(spec) == (None, None, "fsdp"), spec
    # under sp the ring's batch-only specs veto the out-dim shard (it would
    # land on the heads dim of q/k/v) — the in-dim rule applies instead
    mesh_sp = make_mesh(MeshConfig(dp=2, fsdp=2, sp=2), backend="cpu")
    spec = _spec_for(path, (2, 64, 64), mesh_sp)
    assert tuple(spec) == (None, "fsdp", None), spec
    # pp's in-shard_map gather axis agrees with the at-rest rule
    assert _fsdp_axis((2, 64, 64), 2, kernel=True) == 2
    assert _fsdp_axis((2, 64, 256), 2, kernel=True) == 2
    assert _fsdp_axis((2, 64), 2, kernel=False) == 1

"""Pipeline-parallel train step (parallel/pp.py) on the CPU mesh.

The load-bearing property is EXACTNESS: the GPipe schedule must compute
the same loss and the same parameter updates as the resident
`make_train_step` on identical params/batch/rng — the pipeline only
re-orders per-sample work, and no op in the blocks couples samples.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orv_tpu.models import ControlDiT, DiTConfig
from orv_tpu.parallel import (
    MeshConfig, TrainState, make_mesh, make_optimizer, make_lr_schedule,
    make_pp_train_step, make_train_step, param_shardings,
)
from orv_tpu.parallel.mesh import batch_sharding
from orv_tpu.schedulers import make_schedule

CFG = DiTConfig(
    num_attention_heads=4, attention_head_dim=16, num_layers=2,
    in_channels=32, out_channels=16, text_embed_dim=32, time_embed_dim=64,
    max_text_seq_length=8, sample_width=16, sample_height=8, recon_action=True,
)


def _batch(B=8, F=3, C=16, H=8, W=16):
    k = jax.random.PRNGKey(3)
    ks = jax.random.split(k, 4)
    return {
        "latents": jax.random.normal(ks[0], (B, 2 * C, F, H, W)),
        "image_latents": jax.random.normal(ks[1], (B, 2 * C, 1, H, W)),
        "prompt_embeds": jax.random.normal(ks[2], (B, 8, 32)),
        "actions": jax.random.normal(ks[3], (B, F * 4 - 4, 7)) * 0.1,
    }


def _model_state():
    model = ControlDiT(CFG, dtype=jnp.float32)
    b = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "action_mask": jax.random.PRNGKey(1)},
        b["latents"][:, :32].transpose(0, 2, 1, 3, 4),
        b["prompt_embeds"], jnp.zeros((8,), jnp.int32), actions=b["actions"],
        deterministic=False,
    )
    tx = make_optimizer(make_lr_schedule(total_steps=100, warmup_steps=0))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    return model, tx, state, b


def _max_leaf_err(a, b):
    errs = jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)
    return max(jax.tree_util.tree_leaves(errs))


def test_pp_step_matches_resident_step():
    model, tx, state, batch = _model_state()
    sched = make_schedule()
    rng = jax.random.PRNGKey(42)

    ref_step = make_train_step(model.apply, tx, sched, recon_action=True,
                               fold_rng=False, donate=False)
    ref_state, ref_m = ref_step(state, batch, rng)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=1, pp=2),
                     devices=jax.devices("cpu")[:2])
    pp_step = make_pp_train_step(model, tx, sched, mesh, n_micro=2,
                                 recon_action=True, fold_rng=False,
                                 donate=False)
    pp_state_in = TrainState(
        step=state.step,
        params=jax.device_put(state.params, param_shardings(state.params, mesh)),
        opt_state=state.opt_state,
    )
    pbatch = jax.device_put(batch, batch_sharding(mesh))
    pp_state, pp_m = pp_step(pp_state_in, pbatch, rng)

    assert abs(float(pp_m["loss"]) - float(ref_m["loss"])) < 1e-5, (
        float(pp_m["loss"]), float(ref_m["loss"]))
    assert abs(float(pp_m["grad_norm"]) - float(ref_m["grad_norm"])) < 1e-4
    err = _max_leaf_err(jax.device_get(pp_state.params),
                        jax.device_get(ref_state.params))
    assert err < 1e-5, f"pp updated params diverge from resident: {err}"


def test_pp_composes_with_dp():
    """pp=2 x dp=2 must equal dp=2 alone (pp=1 degenerates to microbatched
    execution inside the same shard_map step, so rng folding matches)."""
    model, tx, state, batch = _model_state()
    sched = make_schedule()
    rng = jax.random.PRNGKey(7)

    mesh_dp = make_mesh(MeshConfig(dp=2, fsdp=1, tp=1, pp=1),
                        devices=jax.devices("cpu")[:2])
    step_dp = make_pp_train_step(model, tx, sched, mesh_dp, n_micro=2,
                                 recon_action=True, fold_rng=False,
                                 donate=False)
    s_dp, m_dp = step_dp(
        TrainState(step=state.step,
                   params=jax.device_put(state.params,
                                         param_shardings(state.params, mesh_dp)),
                   opt_state=state.opt_state),
        jax.device_put(batch, batch_sharding(mesh_dp)), rng)

    mesh_both = make_mesh(MeshConfig(dp=2, fsdp=1, tp=1, pp=2),
                          devices=jax.devices("cpu")[:4])
    step_both = make_pp_train_step(model, tx, sched, mesh_both, n_micro=2,
                                   recon_action=True, fold_rng=False,
                                   donate=False)
    s_both, m_both = step_both(
        TrainState(step=state.step,
                   params=jax.device_put(state.params,
                                         param_shardings(state.params, mesh_both)),
                   opt_state=state.opt_state),
        jax.device_put(batch, batch_sharding(mesh_both)), rng)

    assert abs(float(m_both["loss"]) - float(m_dp["loss"])) < 1e-5
    err = _max_leaf_err(jax.device_get(s_both.params),
                        jax.device_get(s_dp.params))
    assert err < 1e-5, f"pp+dp params diverge from dp-only: {err}"


def test_pp_overfits_same_batch():
    model, tx, state, batch = _model_state()
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=1, pp=2),
                     devices=jax.devices("cpu")[:4])
    step = make_pp_train_step(model, tx, make_schedule(), mesh, n_micro=4,
                              recon_action=True, fold_rng=False)
    state = TrainState(
        step=state.step,
        params=jax.device_put(state.params, param_shardings(state.params, mesh)),
        opt_state=state.opt_state,
    )
    batch = jax.device_put(batch, batch_sharding(mesh))
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_pp_remat_matches_no_remat():
    """model.remat routes the pipeline's local stack through jax.checkpoint;
    rematerialization must not change the computed update."""
    model, tx, state, batch = _model_state()
    sched = make_schedule()
    rng = jax.random.PRNGKey(11)
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=1, pp=2),
                     devices=jax.devices("cpu")[:2])
    sharded = TrainState(
        step=state.step,
        params=jax.device_put(state.params, param_shardings(state.params, mesh)),
        opt_state=state.opt_state,
    )
    pbatch = jax.device_put(batch, batch_sharding(mesh))

    plain = make_pp_train_step(model, tx, sched, mesh, n_micro=2,
                               recon_action=True, fold_rng=False, donate=False)
    _, m_plain = plain(sharded, pbatch, rng)

    model_r = ControlDiT(CFG, dtype=jnp.float32, remat=True)
    rstep = make_pp_train_step(model_r, tx, sched, mesh, n_micro=2,
                               recon_action=True, fold_rng=False, donate=False)
    s_r, m_r = rstep(sharded, pbatch, rng)

    assert abs(float(m_r["loss"]) - float(m_plain["loss"])) < 1e-6
    assert abs(float(m_r["grad_norm"]) - float(m_plain["grad_norm"])) < 1e-4


def test_pp_joint_final_norm_matches_resident():
    """joint_final_norm (5b family) makes the head consume the final enc
    tokens — the pipeline must collect and broadcast them (collect_enc)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, joint_final_norm=True, recon_action=False)
    model = ControlDiT(cfg, dtype=jnp.float32)
    batch = {k: v for k, v in _batch().items() if k != "actions"}
    params = model.init(
        jax.random.PRNGKey(0),
        batch["latents"][:, :32].transpose(0, 2, 1, 3, 4),
        batch["prompt_embeds"], jnp.zeros((8,), jnp.int32),
    )
    tx = make_optimizer(make_lr_schedule(total_steps=100, warmup_steps=0))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    sched = make_schedule()
    rng = jax.random.PRNGKey(13)

    ref_step = make_train_step(model.apply, tx, sched, fold_rng=False,
                               donate=False)
    _, ref_m = ref_step(state, batch, rng)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=1, pp=2),
                     devices=jax.devices("cpu")[:2])
    pp_step = make_pp_train_step(model, tx, sched, mesh, n_micro=2,
                                 fold_rng=False, donate=False)
    _, pp_m = pp_step(
        TrainState(step=state.step,
                   params=jax.device_put(state.params,
                                         param_shardings(state.params, mesh)),
                   opt_state=state.opt_state),
        jax.device_put(batch, batch_sharding(mesh)), rng)

    assert abs(float(pp_m["loss"]) - float(ref_m["loss"])) < 1e-5
    assert abs(float(pp_m["grad_norm"]) - float(ref_m["grad_norm"])) < 1e-4


def test_pp_multiview_matches_resident():
    """MVBlock couples rows WITHIN a (b v) group, so microbatch boundaries
    must never split a sample's views — pinned by exact match against the
    resident multiview step (B=4, V=2, n_micro=2 -> 2 samples/microbatch)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, multiview=True, max_n_view=2,
                              recon_action=False)
    model = ControlDiT(cfg, dtype=jnp.float32)
    V, F, B = 2, 3, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, V * F, 32, 8, 16))
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 32))
    params = model.init(jax.random.PRNGKey(0), x, enc,
                        jnp.zeros((B,), jnp.int32), num_views=V)
    tx = make_optimizer(make_lr_schedule(total_steps=100, warmup_steps=0))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(2), (B, 32, V * F, 8, 16)),
        "image_latents": jax.random.normal(jax.random.PRNGKey(3), (B, 32, V, 8, 16)),
        "prompt_embeds": enc,
    }
    sched = make_schedule()
    rng = jax.random.PRNGKey(5)

    ref_step = make_train_step(model.apply, tx, sched, num_views=V,
                               fold_rng=False, donate=False)
    ref_state, ref_m = ref_step(state, batch, rng)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=1, pp=2),
                     devices=jax.devices("cpu")[:2])
    pp_step = make_pp_train_step(model, tx, sched, mesh, n_micro=2,
                                 num_views=V, fold_rng=False, donate=False)
    pp_state, pp_m = pp_step(
        TrainState(step=state.step,
                   params=jax.device_put(state.params,
                                         param_shardings(state.params, mesh)),
                   opt_state=state.opt_state),
        jax.device_put(batch, batch_sharding(mesh)), rng)

    assert abs(float(pp_m["loss"]) - float(ref_m["loss"])) < 1e-5
    err = _max_leaf_err(jax.device_get(pp_state.params),
                        jax.device_get(ref_state.params))
    assert err < 1e-5, f"multiview pp params diverge: {err}"


def test_pp_checkpoint_restore(tmp_path):
    """A checkpoint written unsharded must restore onto a pp-sharded
    template (orbax places each stage's layer slice) and train."""
    from orv_tpu.utils.checkpoint import TrainCheckpointer

    model, tx, state, batch = _model_state()
    ckpt = TrainCheckpointer(str(tmp_path / "ck"), max_to_keep=1)
    ckpt.save(0, state)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=1, pp=2),
                     devices=jax.devices("cpu")[:2])
    # every template leaf mesh-committed (scalars replicated), like
    # pipelines/train.py builds it — orbax restores with the template's
    # placement, and a single-device scalar would clash with mesh params
    from orv_tpu.parallel.mesh import replicated

    template = TrainState(
        step=jax.device_put(state.step, replicated(mesh)),
        params=jax.device_put(state.params, param_shardings(state.params, mesh)),
        opt_state=jax.device_put(state.opt_state,
                                 param_shardings(state.opt_state, mesh)),
    )
    restored = ckpt.restore(template)
    err = _max_leaf_err(jax.device_get(restored.params),
                        jax.device_get(state.params))
    assert err == 0.0, f"restore changed params: {err}"

    step = make_pp_train_step(model, tx, make_schedule(), mesh, n_micro=2,
                              recon_action=True, fold_rng=False)
    _, m = step(restored, jax.device_put(batch, batch_sharding(mesh)),
                jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_pp_composes_with_fsdp():
    """fsdp2 x pp2 must equal dp2 x pp2 bit-for-bit: fsdp acts as extra
    data parallelism (same linearized rng fold, same combined batch
    sharding) — only the block params' at-rest layout differs (ZeRO
    shards, gathered over 'fsdp' inside the step)."""
    model, tx, state, batch = _model_state()
    sched = make_schedule()
    rng = jax.random.PRNGKey(11)

    def run(cfg, n_dev):
        mesh = make_mesh(cfg, devices=jax.devices("cpu")[:n_dev])
        step = make_pp_train_step(model, tx, sched, mesh, n_micro=2,
                                  recon_action=True, fold_rng=False,
                                  donate=False)
        st = TrainState(
            step=state.step,
            params=jax.device_put(state.params,
                                  param_shardings(state.params, mesh)),
            opt_state=state.opt_state)
        return step(st, jax.device_put(batch, batch_sharding(mesh)), rng)

    s_dp, m_dp = run(MeshConfig(dp=2, fsdp=1, tp=1, pp=2), 4)
    s_fs, m_fs = run(MeshConfig(dp=1, fsdp=2, tp=1, pp=2), 4)
    assert abs(float(m_fs["loss"]) - float(m_dp["loss"])) < 1e-5
    err = _max_leaf_err(jax.device_get(s_fs.params), jax.device_get(s_dp.params))
    assert err < 1e-5, f"fsdp x pp params diverge from dp x pp: {err}"

    # 3-axis: dp2 x fsdp2 x pp2 == dp4 x pp2 (8 devices)
    s_4dp, m_4dp = run(MeshConfig(dp=4, fsdp=1, tp=1, pp=2), 8)
    s_mix, m_mix = run(MeshConfig(dp=2, fsdp=2, tp=1, pp=2), 8)
    assert abs(float(m_mix["loss"]) - float(m_4dp["loss"])) < 1e-5
    err = _max_leaf_err(jax.device_get(s_mix.params), jax.device_get(s_4dp.params))
    assert err < 1e-5, f"dp x fsdp x pp diverges from dp-only x pp: {err}"


def test_pp_composes_with_tp():
    """pp2 x tp2 must equal the resident step: 'tp' stays a GSPMD auto
    axis through the partial-manual shard_map, so the Megatron kernel
    shardings (mesh._spec_for column/row rules) produce the same math
    with the collectives inserted inside each pipeline stage."""
    model, tx, state, batch = _model_state()
    sched = make_schedule()
    rng = jax.random.PRNGKey(42)

    ref_step = make_train_step(model.apply, tx, sched, recon_action=True,
                               fold_rng=False, donate=False)
    ref_state, ref_m = ref_step(state, batch, rng)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=2, pp=2),
                     devices=jax.devices("cpu")[:4])
    pp_step = make_pp_train_step(model, tx, sched, mesh, n_micro=2,
                                 recon_action=True, fold_rng=False,
                                 donate=False)
    pp_state, pp_m = pp_step(
        TrainState(step=state.step,
                   params=jax.device_put(state.params,
                                         param_shardings(state.params, mesh)),
                   opt_state=state.opt_state),
        jax.device_put(batch, batch_sharding(mesh)), rng)

    assert abs(float(pp_m["loss"]) - float(ref_m["loss"])) < 1e-5
    assert abs(float(pp_m["grad_norm"]) - float(ref_m["grad_norm"])) < 1e-4
    err = _max_leaf_err(jax.device_get(pp_state.params),
                        jax.device_get(ref_state.params))
    assert err < 1e-5, f"pp x tp params diverge from resident: {err}"


def test_pp_tp_composes_with_dp():
    """dp2 x pp2 x tp2 (8 devices) must equal dp2 x pp2: tp only changes
    the kernel layout, never the math or the rng folding (which is on the
    linearized (dp, fsdp) index — tp replicas share draws)."""
    model, tx, state, batch = _model_state()
    sched = make_schedule()
    rng = jax.random.PRNGKey(7)

    def run(cfg, n_dev):
        mesh = make_mesh(cfg, devices=jax.devices("cpu")[:n_dev])
        step = make_pp_train_step(model, tx, sched, mesh, n_micro=2,
                                  recon_action=True, fold_rng=False,
                                  donate=False)
        st = TrainState(
            step=state.step,
            params=jax.device_put(state.params,
                                  param_shardings(state.params, mesh)),
            opt_state=state.opt_state)
        return step(st, jax.device_put(batch, batch_sharding(mesh)), rng)

    s_dp, m_dp = run(MeshConfig(dp=2, fsdp=1, tp=1, pp=2), 4)
    s_tp, m_tp = run(MeshConfig(dp=2, fsdp=1, tp=2, pp=2), 8)
    assert abs(float(m_tp["loss"]) - float(m_dp["loss"])) < 1e-5
    err = _max_leaf_err(jax.device_get(s_tp.params), jax.device_get(s_dp.params))
    assert err < 1e-5, f"dp x pp x tp diverges from dp x pp: {err}"


def test_pp_rejects_sp_and_tp_fsdp():
    model, tx, state, _ = _model_state()
    mesh = make_mesh(MeshConfig(dp=4, fsdp=1, tp=1, pp=1, sp=2),
                     backend="cpu")
    with pytest.raises(ValueError, match="pp composes with dp, fsdp and tp"):
        make_pp_train_step(model, tx, make_schedule(), mesh)
    # tp x fsdp under pp: the ('tp','fsdp')-stacked kernel dim cannot be
    # split into a manual 'fsdp' + auto 'tp' factor on one dim
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2, pp=1), backend="cpu")
    with pytest.raises(ValueError, match="pp x tp requires fsdp=1"):
        make_pp_train_step(model, tx, make_schedule(), mesh)


def test_pp_rejects_indivisible_layers():
    model, tx, state, _ = _model_state()  # num_layers=2
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=1, pp=3),
                     devices=jax.devices("cpu")[:3])
    with pytest.raises(ValueError, match="not divisible by pp"):
        make_pp_train_step(model, tx, make_schedule(), mesh)

"""Sharded training step: v-prediction diffusion loss + action recon.

Loss semantics replicate the reference train loop exactly
(train_cogvideox_control_to_video_sft.py:844-1107):

  latents   = sample(moments) * vae_scaling_factor
  x_t       = add_noise(latents, eps, t)
  model_in  = concat([x_t, image_latents], channel)     (image-CFG dropout 5%)
  v_pred    = model(model_in, ...)
  x0_pred   = sqrt(abar)*x_t - sqrt(1-abar)*v_pred       (== get_velocity swap)
  loss      = mean_b[ mean_tokens( w_t * (x0_pred - latents)^2 [frame_mask] ) ]
              + 0.4*rot + 5*pos + 1*grip action-recon losses over ~action_mask

The step is one jitted function over the mesh: batch sharded on
(dp, fsdp), params sharded per `param_shardings`, gradient reduction and
FSDP gathers inserted by XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from orv_tpu.schedulers.scheduling import DiffusionSchedule, add_noise, loss_weights, pred_x0_from_v


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_lr_schedule(
    name: str = "cosine_with_restarts",
    learning_rate: float = 2e-4,
    warmup_steps: int = 1000,
    total_steps: int = 20000,
    num_cycles: int = 1,
    power: float = 1.0,
):
    """HF-diffusers-compatible LR schedules (reference train config
    base_train.yaml: cosine_with_restarts, warmup 1000)."""
    warmup = optax.linear_schedule(0.0, learning_rate, max(1, warmup_steps))
    decay_steps = max(1, total_steps - warmup_steps)
    if name == "constant":
        main = optax.constant_schedule(learning_rate)
    elif name == "linear":
        main = optax.linear_schedule(learning_rate, 0.0, decay_steps)
    elif name == "cosine":
        main = optax.cosine_decay_schedule(learning_rate, decay_steps)
    elif name == "cosine_with_restarts":
        # HF get_cosine_with_hard_restarts_schedule_with_warmup semantics:
        # restarts at cycle boundaries, exactly 0 at/after the end.
        def main(step):
            progress = step / decay_steps
            cyc = jnp.cos(jnp.pi * ((num_cycles * progress) % 1.0))
            val = jnp.maximum(0.0, 0.5 * (1.0 + cyc))
            return learning_rate * jnp.where(progress >= 1.0, 0.0, val)
    elif name == "polynomial":
        main = optax.polynomial_schedule(learning_rate, 0.0, power, decay_steps)
    else:
        raise ValueError(f"unknown lr scheduler {name}")
    return optax.join_schedules([warmup, main], [warmup_steps])


def make_optimizer(
    learning_rate_schedule,
    optimizer: str = "adamw",
    beta1: float = 0.9,
    beta2: float = 0.95,
    epsilon: float = 1e-8,
    weight_decay: float = 1e-3,
    max_grad_norm: float = 1.0,
    grad_accum_steps: int = 1,
    trainable_predicate: Optional[Callable[[tuple], bool]] = None,
    beta3: float = 0.98,
    prodigy_safeguard_warmup: bool = False,
    prodigy_decouple: bool = False,
    prodigy_use_bias_correction: bool = False,
    ema_decay: Optional[float] = None,
):
    """trainable_predicate(path_keys) -> bool selectively freezes params
    (reference _set_trainable_parameters: multiview stage trains only
    mv_blocks, cogvideox_control.py:641-656)."""
    if optimizer in ("adam", "adamw"):
        inner = optax.adamw(
            learning_rate_schedule, b1=beta1, b2=beta2, eps=epsilon,
            weight_decay=weight_decay if optimizer == "adamw" else 0.0,
        )
    elif optimizer == "prodigy":
        # reference optimizer factory supports prodigy (utils.py:16-163;
        # yaml surface prodigy_{decouple,use_bias_correction,
        # safeguard_warmup}, all default false). optax.contrib.prodigy
        # exposes safeguard_warmup; decouple/bias-correction variants have
        # no optax analog — fail loudly rather than silently train a
        # different optimizer.
        if prodigy_decouple or prodigy_use_bias_correction:
            raise ValueError(
                "prodigy_decouple / prodigy_use_bias_correction are not "
                "supported by the optax prodigy implementation (reference "
                "defaults are false — leave them unset)")
        inner = optax.contrib.prodigy(
            learning_rate=1.0, betas=(beta1, beta2), eps=epsilon,
            weight_decay=weight_decay,
            safeguard_warmup=prodigy_safeguard_warmup,
        )
    elif optimizer == "came":
        # reference `came` branch (utils.py:150-163): came-pytorch with
        # eps=(1e-30, 1e-16), betas=(beta1, beta2, beta3) — factored second
        # moments + confidence-guided first-moment scaling (arXiv 2307.02047)
        from .came import came as _came

        inner = _came(
            learning_rate_schedule, b1=beta1, b2=beta2, b3=beta3,
            weight_decay=weight_decay,
        )
    else:
        raise ValueError(
            f"unsupported optimizer {optimizer} (adam/adamw/prodigy/came); "
            "the reference's bnb-8bit/torchao-4bit variants are CUDA-only "
            "and have no TPU analog (see PARITY.md)")
    tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), inner)
    if trainable_predicate is not None:
        def labels(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "train" if trainable_predicate(
                    tuple(getattr(p, "key", str(p)) for p in path)) else "freeze",
                params,
            )

        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    if ema_decay is not None:
        # AFTER multi_transform (frozen leaves carry zero updates, so the
        # EMA still sees the full tree) and INSIDE MultiSteps (one EMA
        # update per APPLIED step, not per accumulation micro-step)
        tx = optax.chain(tx, params_ema(float(ema_decay)))
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


class EmaState(NamedTuple):
    """State for `params_ema`: the exponential moving average of params."""
    ema: Any


def params_ema(decay: float) -> optax.GradientTransformation:
    """Terminal chain element tracking an EMA of the POST-update params
    (`ema <- decay*ema + (1-decay)*(params + updates)`). Beyond-reference:
    the reference trainer keeps no EMA, but it is standard practice for
    diffusion weights; serving/validation read it via `ema_params`.
    Updates pass through unchanged. EMA leaves inherit the param
    shardings (tree_map of sharded params), so fsdp/tp runs keep the
    EMA sharded at rest like the params themselves."""

    def init_fn(params):
        # fresh buffers (never alias params: the train step donates its
        # input state, and aliased leaves in a donated pytree fail at
        # dispatch on the axon backend)
        return EmaState(ema=jax.tree_util.tree_map(jnp.array, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("params_ema requires params")
        ema = jax.tree_util.tree_map(
            lambda e, p, u: (decay * e + (1.0 - decay) * (p + u)).astype(e.dtype),
            state.ema, params, updates)
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init_fn, update_fn)


def ema_params(opt_state):
    """Extract the EMA param tree from a (possibly nested) optimizer state
    — walks chain tuples, MultiSteps and multi_transform wrappers. Returns
    None when the optimizer was built without `ema_decay`."""
    found = []

    def walk(s):
        if isinstance(s, EmaState):
            found.append(s.ema)
        elif isinstance(s, optax.MultiStepsState):
            walk(s.inner_opt_state)
        elif isinstance(s, dict):
            for v in s.values():
                walk(v)
        elif isinstance(s, (tuple, list)):
            for v in s:
                walk(v)
        elif hasattr(s, "inner_states"):  # optax.MultiTransformState
            walk(s.inner_states)

    walk(opt_state)
    return found[0] if found else None


def sample_from_moments(moments: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """DiagonalGaussianDistribution.sample(): moments [B, 2C, ...] ->
    latents [B, C, ...] (logvar clamped to [-30, 20])."""
    mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=jnp.float32)


def _smooth_l1(x, y):
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def compute_action_loss(actions, recon, mask, weights=(0.4, 5.0, 1.0)):
    """Reference compute_action_loss (cogvideox_control.py:690-713):
    rot = 1 - mean cos(delta euler); pos/grip smooth-L1; grip through
    sigmoid. `mask` selects batch entries whose actions were NOT CFG-masked.
    Implemented with weighted means so masking stays shape-static."""
    mask_f = mask.astype(jnp.float32)
    denom = jnp.maximum(mask_f.sum(), 1.0)
    actions = actions.astype(jnp.float32)
    recon = recon.astype(jnp.float32)

    def masked_mean(x):  # x: [B, F, K]
        per_b = jnp.mean(x, axis=tuple(range(1, x.ndim)))
        return (per_b * mask_f).sum() / denom

    rot = 1.0 - masked_mean(jnp.cos(recon[..., 3:6] - actions[..., 3:6]))
    pos = masked_mean(_smooth_l1(recon[..., :3], actions[..., :3]))
    grip = masked_mean(_smooth_l1(jax.nn.sigmoid(recon[..., -1]), actions[..., -1]))
    return weights[0] * rot, weights[1] * pos, weights[2] * grip


def diffusion_loss(
    model_apply: Callable,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    schedule: DiffusionSchedule,
    rng: jax.Array,
    vae_scaling_factor: float = 1.15258426,
    noised_image_dropout: float = 0.05,
    recon_action: bool = False,
    num_views: int = 1,
    image_rotary_emb=None,
    patch_size_t: Optional[int] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One loss evaluation. batch keys (all [B, ...], layouts match the
    reference collate): 'latents' (moments [B,2C,F,H,W]), 'image_latents'
    (moments, F_img frames), 'prompt_embeds', optional 'actions',
    'latents_depth'/'latents_label' (moments), optional 'frame_mask' [F].

    `patch_size_t` (CogVideoX-1.5 family): frame counts not divisible by
    the temporal patch are zero-padded (actions by 4 raw frames per padded
    latent frame) and the padded tail is masked out of the loss via
    frame_mask — reference train loop :943-964."""
    r_lat, r_img, r_noise, r_t, r_drop, r_mask, r_cond = jax.random.split(rng, 7)

    lat = sample_from_moments(batch["latents"], r_lat) * vae_scaling_factor
    lat = lat.transpose(0, 2, 1, 3, 4)  # [B, F, C, H, W]
    img = sample_from_moments(batch["image_latents"], r_img) * vae_scaling_factor
    img = img.transpose(0, 2, 1, 3, 4)

    batch = dict(batch)
    pad_frames = 0
    if patch_size_t and lat.shape[1] % patch_size_t != 0:
        if num_views > 1:
            raise ValueError("patch_size_t frame padding is single-view only "
                             "(matches the reference train loop)")
        pad_frames = patch_size_t - lat.shape[1] % patch_size_t
        lat = jnp.concatenate(
            [lat, jnp.zeros((lat.shape[0], pad_frames, *lat.shape[2:]), lat.dtype)], 1)
        if batch.get("actions") is not None:
            a = batch["actions"]
            batch["actions"] = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], pad_frames * 4, a.shape[2]), a.dtype)], 1)
        fm = jnp.ones((lat.shape[1],), bool).at[-pad_frames:].set(False)
        prev = batch.get("frame_mask")
        batch["frame_mask"] = fm if prev is None else jnp.concatenate(
            [prev.astype(bool), fm[prev.shape[0]:]])

    B, F = lat.shape[0], lat.shape[1]
    # zero-pad image latents to video length
    pad = jnp.zeros((B, F - img.shape[1], *img.shape[2:]), img.dtype)
    img = jnp.concatenate([img, pad], axis=1)
    # image-CFG dropout (whole-batch, like the reference's python-level rand)
    drop = jax.random.uniform(r_drop, ()) < noised_image_dropout
    img = jnp.where(drop, jnp.zeros_like(img), img)

    noise = jax.random.normal(r_noise, lat.shape, dtype=lat.dtype)
    t = jax.random.randint(r_t, (B,), 0, schedule.num_train_timesteps)
    noisy = add_noise(schedule, lat, noise, t)
    model_in = jnp.concatenate([noisy, img], axis=2)  # [B, F, 2C, H, W]

    depths = labels = None
    def pad_f(x):  # zero-pad control latents to the padded frame count
        if pad_frames and x.shape[1] < F:
            x = jnp.concatenate(
                [x, jnp.zeros((x.shape[0], F - x.shape[1], *x.shape[2:]), x.dtype)], 1)
        return x

    if batch.get("latents_depth") is not None:
        d = sample_from_moments(batch["latents_depth"], r_cond) * vae_scaling_factor
        d = pad_f(d.transpose(0, 2, 1, 3, 4))
        depths = jnp.concatenate([d, d], axis=2)
    if batch.get("latents_label") is not None:
        l = sample_from_moments(batch["latents_label"], jax.random.fold_in(r_cond, 1))
        l = pad_f((l * vae_scaling_factor).transpose(0, 2, 1, 3, 4))
        labels = jnp.concatenate([l, l], axis=2)

    actions = batch.get("actions")
    v_pred, is_action_mask, actions_recon = model_apply(
        params,
        model_in,
        batch["prompt_embeds"],
        t,
        actions=actions,
        depths=depths,
        labels=labels,
        image_rotary_emb=image_rotary_emb,
        num_views=num_views,
        deterministic=False,
        rngs={"action_mask": r_mask},
    )

    x0_pred = pred_x0_from_v(schedule, v_pred.astype(jnp.float32), noisy, t)
    w = loss_weights(schedule, t).reshape(B, *([1] * (lat.ndim - 1)))
    sq = w * (x0_pred - lat) ** 2
    frame_mask = batch.get("frame_mask")
    if frame_mask is not None:
        fm = frame_mask.reshape(1, -1, 1, 1, 1).astype(jnp.float32)
        per_b = (sq * fm).reshape(B, -1).sum(1) / (fm.sum() * sq[0].size / F)
    else:
        per_b = sq.reshape(B, -1).mean(1)
    loss = per_b.mean()

    metrics = {"diffusion_loss": loss}
    if recon_action and actions is not None and actions_recon is not None:
        rot, pos, grip = compute_action_loss(actions, actions_recon, ~is_action_mask)
        loss = loss + rot + pos + grip
        metrics.update({"rot_loss": rot, "pos_loss": pos, "grip_loss": grip})
    metrics["loss"] = loss
    return loss, metrics


def make_train_step(
    model_apply: Callable,
    tx: optax.GradientTransformation,
    schedule: DiffusionSchedule,
    mesh=None,
    donate: bool = True,
    fold_rng: bool = True,
    **loss_kwargs,
):
    """Build the jitted sharded train step. With a mesh, batch shards over
    (dp, fsdp) and params/opt-state follow `param_shardings`; XLA inserts
    the gradient psum (reference: DDP all-reduce) and FSDP all-gathers.
    `fold_rng=False` keeps the per-step noise fixed (deterministic-descent
    tests)."""

    from orv_tpu.models.layers import fused_adaln_override

    def step_fn(state: TrainState, batch, rng):
        if fold_rng:
            rng = jax.random.fold_in(rng, state.step)
        # fused_adaln_override(False): on-chip A/B measured the fused
        # custom-VJP backward slower than XLA's autodiff of the unfused
        # lowering (0.4344 vs 0.4197 s/step, 1.4B) — training traces use
        # the XLA path; ORV_TPU_FUSED_ADALN=force re-enables for A/B.
        with fused_adaln_override(False):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: diffusion_loss(model_apply, p, batch, schedule, rng, **loss_kwargs),
                has_aux=True,
            )(state.params)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = gnorm
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from orv_tpu.parallel.mesh import batch_sharding, param_shardings, replicated

    def wrapped(state, batch, rng):
        bs = batch_sharding(mesh)
        batch = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, bs), batch
        )
        return step_fn(state, batch, rng)

    return jax.jit(wrapped, donate_argnums=(0,) if donate else ())

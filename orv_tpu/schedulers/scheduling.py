"""CogVideoX diffusion schedules (DDIM + DPM-solver++ variants), JAX-native.

Functional re-derivation of the schedulers the reference training/sampling
stack relies on (reference call sites: train_…sft.py:1042 `add_noise`,
:1067 `get_velocity`; cogvideox_control.py:1446-1457 DDIM/DPM step with
`old_pred_original_sample`). Instead of a stateful scheduler object, the
schedule is a pytree of precomputed tables and the step functions are pure
— so the whole 50-step denoise loop jits as one `lax.scan`.

Conventions (CogVideoX-2b checkpoint schedule):
  betas: "scaled_linear" — linspace(sqrt(b0), sqrt(bT), T)^2,
         b0=0.00085, bT=0.012, T=1000
  SNR shift: abar <- abar / (s + (1-s)·abar), s=3.0
  zero-terminal-SNR rescale of sqrt(abar)
  prediction_type: v_prediction; timestep_spacing: "trailing"
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed noise-schedule tables. A pytree — safe to close over or
    pass through jit boundaries."""

    alphas_cumprod: jnp.ndarray  # [num_train_timesteps] f32
    final_alpha_cumprod: jnp.ndarray  # scalar f32
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    init_noise_sigma: float = dataclasses.field(metadata=dict(static=True))
    prediction_type: str = dataclasses.field(metadata=dict(static=True))


def _rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Shift/scale sqrt(abar) so the terminal step has exactly zero SNR."""
    abar_sqrt = np.sqrt(alphas_cumprod)
    a0, aT = abar_sqrt[0], abar_sqrt[-1]
    abar_sqrt = abar_sqrt - aT
    abar_sqrt = abar_sqrt * a0 / (a0 - aT)
    return abar_sqrt**2


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    snr_shift_scale: float = 3.0,
    rescale_betas_zero_snr: bool = True,
    set_alpha_to_one: bool = True,
    prediction_type: str = "v_prediction",
) -> DiffusionSchedule:
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(f"unsupported beta_schedule {beta_schedule}")

    alphas_cumprod = np.cumprod(1.0 - betas)
    # SNR shift: lowers SNR at every t (video data has higher inter-frame
    # redundancy, so CogVideoX trains at shifted noise levels).
    alphas_cumprod = alphas_cumprod / (snr_shift_scale + (1 - snr_shift_scale) * alphas_cumprod)
    if rescale_betas_zero_snr:
        alphas_cumprod = _rescale_zero_terminal_snr(alphas_cumprod)
        # exact zero at the terminal step makes 1/(1-abar) & logSNR blow up;
        # clamp like the reference implementation family does implicitly via
        # float32 rounding. Keep a tiny epsilon for numerical safety.
        alphas_cumprod = np.clip(alphas_cumprod, 1e-8, 1.0)

    final_alpha = np.float32(1.0) if set_alpha_to_one else np.float32(alphas_cumprod[0])
    return DiffusionSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        final_alpha_cumprod=jnp.asarray(final_alpha),
        num_train_timesteps=num_train_timesteps,
        init_noise_sigma=1.0,
        prediction_type=prediction_type,
    )


def get_inference_timesteps(
    schedule: DiffusionSchedule,
    num_inference_steps: int,
    timestep_spacing: str = "trailing",
) -> np.ndarray:
    """Descending int timesteps for sampling (static, host-side)."""
    T = schedule.num_train_timesteps
    if timestep_spacing == "trailing":
        step = T / num_inference_steps
        ts = np.round(np.arange(T, 0, -step)).astype(np.int64) - 1
    elif timestep_spacing == "linspace":
        ts = np.linspace(0, T - 1, num_inference_steps).round().astype(np.int64)[::-1]
    elif timestep_spacing == "leading":
        step = T // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step).round().astype(np.int64)[::-1]
    else:
        raise ValueError(f"unknown timestep_spacing {timestep_spacing}")
    return ts.copy()


# ---------------------------------------------------------------------------
# Forward process + v-parameterization
# ---------------------------------------------------------------------------

def _gather_abar(schedule: DiffusionSchedule, timesteps: jnp.ndarray, ndim: int):
    abar = schedule.alphas_cumprod[timesteps]
    shape = abar.shape + (1,) * (ndim - abar.ndim)
    sqrt_abar = jnp.sqrt(abar).reshape(shape)
    sqrt_1m = jnp.sqrt(1.0 - abar).reshape(shape)
    return sqrt_abar, sqrt_1m


def add_noise(schedule, sample, noise, timesteps):
    """x_t = sqrt(abar)·x0 + sqrt(1-abar)·eps."""
    sa, sm = _gather_abar(schedule, timesteps, sample.ndim)
    return sa * sample + sm * noise


def get_velocity(schedule, sample, noise, timesteps):
    """v = sqrt(abar)·eps - sqrt(1-abar)·x0.

    NOTE the reference train loop calls get_velocity(model_output, x_t, t)
    to *reconstruct x0* from a v prediction: sqrt(abar)·x_t −
    sqrt(1−abar)·v — same bilinear form, swapped operands
    (train_…sft.py:1067)."""
    sa, sm = _gather_abar(schedule, timesteps, sample.ndim)
    return sa * noise - sm * sample


def pred_x0_from_v(schedule, v, x_t, timesteps):
    """x0 = sqrt(abar)·x_t − sqrt(1−abar)·v."""
    sa, sm = _gather_abar(schedule, timesteps, x_t.ndim)
    return sa * x_t - sm * v


def loss_weights(schedule, timesteps):
    """Reference v-pred training weights: 1/(1-abar_t) (train_…sft.py:1069)."""
    return 1.0 / (1.0 - schedule.alphas_cumprod[timesteps])


# ---------------------------------------------------------------------------
# DDIM step (CogVideoX formulation)
# ---------------------------------------------------------------------------

def _pred_x0(schedule: DiffusionSchedule, model_output, sample, alpha_prod_t):
    beta_prod_t = 1.0 - alpha_prod_t
    if schedule.prediction_type == "v_prediction":
        return (alpha_prod_t**0.5) * sample - (beta_prod_t**0.5) * model_output
    if schedule.prediction_type == "epsilon":
        return (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
    if schedule.prediction_type == "sample":
        return model_output
    raise ValueError(schedule.prediction_type)


def _abar_at(schedule: DiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """abar[t] with t < 0 mapping to final_alpha_cumprod."""
    safe_t = jnp.clip(t, 0, schedule.num_train_timesteps - 1)
    return jnp.where(t >= 0, schedule.alphas_cumprod[safe_t], schedule.final_alpha_cumprod)


def ddim_step(
    schedule: DiffusionSchedule,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """One deterministic CogVideoX-DDIM update x_t -> x_{t_prev}.

    Uses the variance-preserving interpolation
      x_prev = a_t·x_t + b_t·x0  with
      a_t = sqrt((1-abar_prev)/(1-abar_t)),
      b_t = sqrt(abar_prev) - sqrt(abar_t)·a_t
    (the formulation the CogVideoX family samples with, distinct from
    vanilla DDIM epsilon re-injection)."""
    alpha_prod_t = _abar_at(schedule, timestep)
    alpha_prod_t_prev = _abar_at(schedule, prev_timestep)

    x0 = _pred_x0(schedule, model_output, sample, alpha_prod_t)

    a_t = ((1.0 - alpha_prod_t_prev) / (1.0 - alpha_prod_t)) ** 0.5
    b_t = alpha_prod_t_prev**0.5 - alpha_prod_t**0.5 * a_t
    return a_t * sample + b_t * x0


# ---------------------------------------------------------------------------
# DPM-solver++ (2M) step, CogVideoX formulation with old_pred threading
# ---------------------------------------------------------------------------

def _dpm_variables(alpha_prod_t, alpha_prod_t_prev, alpha_prod_t_back=None):
    lamb = jnp.log((alpha_prod_t / (1.0 - alpha_prod_t)) ** 0.5)
    lamb_next = jnp.log((alpha_prod_t_prev / (1.0 - alpha_prod_t_prev)) ** 0.5)
    h = lamb_next - lamb
    if alpha_prod_t_back is not None:
        lamb_previous = jnp.log((alpha_prod_t_back / (1.0 - alpha_prod_t_back)) ** 0.5)
        h_last = lamb - lamb_previous
        r = h_last / h
        return h, r, lamb, lamb_next
    return h, None, lamb, lamb_next


def _dpm_mult(h, r, alpha_prod_t, alpha_prod_t_prev, alpha_prod_t_back=None):
    mult1 = ((1.0 - alpha_prod_t_prev) / (1.0 - alpha_prod_t)) ** 0.5 * jnp.exp(-h)
    mult2 = jnp.expm1(-2.0 * h) * alpha_prod_t_prev**0.5
    if alpha_prod_t_back is not None:
        mult3 = 1.0 + 1.0 / (2.0 * r)
        mult4 = 1.0 / (2.0 * r)
        return mult1, mult2, mult3, mult4
    return mult1, mult2


def dpm_step(
    schedule: DiffusionSchedule,
    model_output: jnp.ndarray,
    old_pred_original_sample: Optional[jnp.ndarray],
    timestep: jnp.ndarray,
    back_timestep: Optional[jnp.ndarray],
    prev_timestep: jnp.ndarray,
    sample: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One SDE-DPM-solver++(2M) update. Returns (x_prev, pred_x0).

    Threads `old_pred_original_sample` between steps exactly like the
    reference denoise loop (cogvideox_control.py:1449-1457): the first step
    (old is None) is first-order; later steps apply the multistep (2M)
    correction. `noise` enables the stochastic variant; pass None for the
    deterministic ODE limit used in batch eval."""
    alpha_prod_t = _abar_at(schedule, timestep)
    alpha_prod_t_prev = _abar_at(schedule, prev_timestep)
    x0 = _pred_x0(schedule, model_output, sample, alpha_prod_t)

    first_order = old_pred_original_sample is None

    if first_order:
        h, _, _, _ = _dpm_variables(alpha_prod_t, alpha_prod_t_prev)
        m1, m2 = _dpm_mult(h, None, alpha_prod_t, alpha_prod_t_prev)
        denoised = x0
    else:
        alpha_prod_t_back = _abar_at(schedule, back_timestep)
        h, r, _, _ = _dpm_variables(alpha_prod_t, alpha_prod_t_prev, alpha_prod_t_back)
        # At the terminal step abar_prev == 1 -> h = inf -> r = 0 and the 2M
        # coefficients diverge; the reference falls back to first order there
        # (prev_timestep < 0 branch of the CogVideoX DPM step).
        r_safe = jnp.where(jnp.isfinite(h), r, 1.0)
        m1, m2, m3, m4 = _dpm_mult(h, r_safe, alpha_prod_t, alpha_prod_t_prev, alpha_prod_t_back)
        use_multi = jnp.logical_and(prev_timestep >= 0, jnp.isfinite(h))
        denoised = jnp.where(use_multi, m3 * x0 - m4 * old_pred_original_sample, x0)

    mult_noise = (1.0 - alpha_prod_t_prev) ** 0.5 * (1.0 - jnp.exp(-2.0 * h)) ** 0.5
    prev_sample = m1 * sample - m2 * denoised
    if noise is not None:
        prev_sample = prev_sample + mult_noise * noise
    return prev_sample, x0


def dpm_step_scan(
    schedule: DiffusionSchedule,
    model_output: jnp.ndarray,
    old_pred_original_sample: jnp.ndarray,
    have_old: jnp.ndarray,
    timestep: jnp.ndarray,
    back_timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    sample: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan-friendly DPM step: `have_old` is a traced bool selecting between
    the first-order and multistep branches with identical shapes, so the
    whole sampler is a single compiled loop body."""
    alpha_prod_t = _abar_at(schedule, timestep)
    alpha_prod_t_prev = _abar_at(schedule, prev_timestep)
    x0 = _pred_x0(schedule, model_output, sample, alpha_prod_t)

    # Multistep branch; back_timestep only read when have_old. Falls back to
    # first order on the terminal step (abar_prev == 1 -> h = inf), matching
    # the reference's prev_timestep < 0 early-return.
    alpha_prod_t_back = _abar_at(schedule, back_timestep)
    h, r, _, _ = _dpm_variables(alpha_prod_t, alpha_prod_t_prev, alpha_prod_t_back)
    use_multi = jnp.logical_and(have_old, jnp.logical_and(prev_timestep >= 0, jnp.isfinite(h)))
    # Keep BOTH select branches finite: when the multistep branch is unused
    # (step 0: r == 0; terminal step: h == inf) its coefficients would be
    # inf and `inf * 0` NaNs can leak through fused selects on TPU.
    r_safe = jnp.where(use_multi, r, 1.0)
    m1, m2, m3, m4 = _dpm_mult(h, r_safe, alpha_prod_t, alpha_prod_t_prev, alpha_prod_t_back)
    denoised = jnp.where(use_multi, m3 * x0 - m4 * old_pred_original_sample, x0)

    prev_sample = m1 * sample - m2 * denoised
    if noise is not None:
        mult_noise = (1.0 - alpha_prod_t_prev) ** 0.5 * (1.0 - jnp.exp(-2.0 * h)) ** 0.5
        prev_sample = prev_sample + mult_noise * noise
    return prev_sample, x0

from orv_tpu.schedulers.scheduling import (
    DiffusionSchedule,
    make_schedule,
    ddim_step,
    dpm_step,
    get_inference_timesteps,
)

__all__ = [
    "DiffusionSchedule",
    "make_schedule",
    "ddim_step",
    "dpm_step",
    "get_inference_timesteps",
]

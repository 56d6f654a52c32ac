from orv_tpu.parallel.mesh import make_mesh, param_shardings, MeshConfig
from orv_tpu.parallel.pp import make_pp_train_step
from orv_tpu.parallel.train_step import (
    TrainState, ema_params, make_train_step, make_optimizer, make_lr_schedule,
)

__all__ = [
    "make_mesh",
    "param_shardings",
    "MeshConfig",
    "TrainState",
    "make_train_step",
    "make_pp_train_step",
    "make_optimizer",
    "make_lr_schedule",
    "ema_params",
]

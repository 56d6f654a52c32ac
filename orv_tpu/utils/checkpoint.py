"""Checkpointing: orbax-backed training state + pretrained-folder export.

Reference parity (SURVEY.md §5.4): step-indexed checkpoints with
total-limit rotation (reference accelerator.save_state + manual rotation,
train_…sft.py:1114-1143), `latest` resume discovery, and a final exported
"pretrained" folder (config.json + weights) analogous to diffusers
save_pretrained (train_…sft.py:1184-1199).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization

from orv_tpu.utils.logging import CONSOLE


class TrainCheckpointer:
    """Step-indexed orbax checkpoints with rotation."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            str(self.directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False,
            ),
        )

    def save(self, step: int, state: Any):
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()
        CONSOLE.log(f"saved checkpoint step {step} -> {self.directory}")

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self.manager.restore(step, args=ocp.args.StandardRestore(state_template))


# ---------------------------------------------------------------------------
# Pretrained-folder export/load (inference artifact)
# ---------------------------------------------------------------------------

def export_pretrained(folder: str, params: Any, config: Any, name: str = "model"):
    """Write config.json + msgpack weights; the load-side mirror of the
    reference's save_pretrained folder."""
    folder = Path(folder)
    folder.mkdir(parents=True, exist_ok=True)
    cfg = dataclasses.asdict(config) if dataclasses.is_dataclass(config) else dict(config)
    with open(folder / "config.json", "w") as f:
        json.dump(cfg, f, indent=2, default=str)
    params = jax.device_get(params)
    with open(folder / f"{name}.msgpack", "wb") as f:
        f.write(serialization.to_bytes(params))
    CONSOLE.log(f"exported pretrained folder: {folder}")


def load_pretrained(folder: str, config_cls, name: str = "model"):
    """-> (config, params)."""
    folder = Path(folder)
    with open(folder / "config.json") as f:
        cfg_dict = json.load(f)
    fields = {f.name for f in dataclasses.fields(config_cls)}
    cfg_kwargs = {}
    for k, v in cfg_dict.items():
        if k not in fields:
            continue
        if isinstance(v, str) and v in ("None", "null"):
            v = None
        if isinstance(v, list):
            v = tuple(v)
        cfg_kwargs[k] = v
    config = config_cls(**cfg_kwargs)
    with open(folder / f"{name}.msgpack", "rb") as f:
        params = serialization.msgpack_restore(bytearray(f.read()))
    return config, params

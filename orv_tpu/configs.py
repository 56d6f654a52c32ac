"""Layered YAML config system.

Same merge semantics as the reference's OmegaConf stack
(train_…sft.py:1273-1292): base yaml -> experiment yaml -> per-dataset-type
sub-block -> optional debug overlay -> CLI dotted overrides; the `runtime`
block merges into every section via standard YAML anchors (pyyaml handles
`<<: *runtime` natively). No OmegaConf dependency — plain dict deep-merge
with attribute access.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """dict with attribute access, recursive."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Config(v) if isinstance(v, dict) and not isinstance(v, Config) else v

    def __setattr__(self, k, v):
        self[k] = v

    def get_path(self, dotted: str, default=None):
        cur: Any = self
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur


def deep_merge(base: Dict, override: Dict) -> Dict:
    """Recursive dict merge; override wins; lists replace wholesale."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _parse_value(s: str):
    try:
        v = yaml.safe_load(s)
    except yaml.YAMLError:
        return s
    # YAML 1.1 leaves '1e-5' (no dot) as a string; accept scientific floats
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return v
    return v


def apply_dotted_overrides(cfg: Dict, overrides: List[str]) -> Dict:
    """['train.learning_rate=1e-4', ...] CLI overrides, YAML-typed."""
    cfg = copy.deepcopy(cfg)
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override '{item}' must be key.path=value")
        key, val = item.split("=", 1)
        cur = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = _parse_value(val)
    return cfg


def load_config(
    base_yaml: str,
    experiment_yaml: Optional[str] = None,
    dataset_type: Optional[str] = None,
    debug_yaml: Optional[str] = None,
    overrides: Optional[List[str]] = None,
) -> Config:
    """Reference-compatible layered load:
      cfg = base <- experiment; cfg.dataset <- cfg.dataset[dataset_type];
      cfg <- debug; cfg <- CLI overrides; cfg <- cfg.runtime (root merge).
    """
    with open(base_yaml) as f:
        cfg = yaml.safe_load(f) or {}
    if experiment_yaml:
        with open(experiment_yaml) as f:
            cfg = deep_merge(cfg, yaml.safe_load(f) or {})
    if dataset_type:
        ds = cfg.get("dataset", {})
        if dataset_type not in ds:
            raise KeyError(f"dataset type '{dataset_type}' not in config")
        block = ds[dataset_type]
        merged = deep_merge({k: v for k, v in ds.items() if not isinstance(v, dict)
                             or k in ("start_frame_interval", "video_size", "ori_size",
                                      "sample_size")}, {})
        # keep scalar dataset keys, overlay the chosen type block
        scalars = {k: v for k, v in ds.items()
                   if not (isinstance(v, dict) and "data_root" in v)}
        cfg["dataset"] = deep_merge(scalars, block)
        cfg["dataset"]["type"] = dataset_type
    if debug_yaml:
        with open(debug_yaml) as f:
            cfg = deep_merge(cfg, yaml.safe_load(f) or {})
    if overrides:
        cfg = apply_dotted_overrides(cfg, overrides)
    if "runtime" in cfg:
        cfg = deep_merge(cfg, cfg["runtime"])
    return Config(cfg)


def default_config_dir() -> Path:
    return Path(__file__).parent / "config"

"""Device mesh + sharding rules.

TPU-native replacement for the reference's NCCL/Accelerate stack
(SURVEY.md §2.3): instead of DDP wrappers and DeepSpeed ZeRO, we lay the
devices out as a `jax.sharding.Mesh` with axes

    dp    — data parallel (gradient psum over ICI)
    fsdp  — parameter/optimizer-state sharding (ZeRO-3-style; XLA
            inserts all-gathers around layers automatically)
    tp    — tensor parallel (Megatron-style attention-head / FFN sharding
            via kernel PartitionSpecs; absent in the reference, added
            because >1-chip-per-replica is free on an ICI mesh)

and let pjit/XLA place the collectives. Batch shards over (dp, fsdp).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up (replaces the reference's torchrun/accelerate
    launchers + NCCL process groups): one call per host, then jax.devices()
    spans the whole slice and every jit in this module shards globally.
    No-ops on single-process runs and when already initialized."""
    import jax

    if jax.process_count() > 1:
        return
    if coordinator_address:
        # explicit multi-host request: a failure here MUST surface — every
        # process silently proceeding with process_count()==1 makes
        # work-list sharding duplicate all work per host (or corrupt it)
        try:
            jax.distributed.initialize(coordinator_address, num_processes, process_id)
        except Exception as e:
            raise RuntimeError(
                f"distributed bring-up failed (coordinator "
                f"{coordinator_address!r}, num_processes={num_processes}, "
                f"process_id={process_id}): {e}"
            ) from e
        return
    try:
        jax.distributed.initialize()  # TPU auto-bootstrap
    except Exception as e:
        # benign on single-process / CPU runs, but never silent
        import warnings

        warnings.warn(f"jax.distributed auto-bootstrap unavailable "
                      f"({type(e).__name__}: {e}) — single-process run",
                      stacklevel=2)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = -1  # -1: all remaining devices
    fsdp: int = 1
    tp: int = 1
    # pipeline parallel (parallel/pp.py): DiT block stack split into pp
    # stages, GPipe microbatch schedule over ppermute. Composes with dp
    # only (pp train step raises on fsdp/tp > 1). Placed between fsdp and
    # tp in the device layout so tp keeps the innermost (fastest-ICI)
    # axis: tp collectives fire every layer, pipeline transfers once per
    # microbatch tick.
    pp: int = 1
    # sequence/context parallel: every DiT block's joint attention rings
    # the video tokens over `sp` (ops/ring_attention.py) — long-context
    # training for clips whose activations exceed one chip's HBM. Composes
    # with dp AND fsdp (the ring's shard_map specs carry the (dp, fsdp)
    # batch sharding through; params never enter the shard_map, so ZeRO
    # gathers stay outside it); exclusive with tp/pp. Innermost axis: KV
    # chunks hop every layer, so the ring rides nearest-neighbor ICI links.
    sp: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        dp = self.dp
        if dp == -1:
            dp = n_devices // (self.fsdp * self.tp * self.pp * self.sp)
        if dp * self.fsdp * self.tp * self.pp * self.sp != n_devices:
            raise ValueError(
                f"mesh {dp}x{self.fsdp}x{self.pp}x{self.tp}x{self.sp} != "
                f"{n_devices} devices"
            )
        return MeshConfig(dp=dp, fsdp=self.fsdp, tp=self.tp, pp=self.pp,
                          sp=self.sp)


def make_mesh(config: MeshConfig = MeshConfig(), devices=None, backend: Optional[str] = None) -> Mesh:
    if devices is None:
        devices = jax.devices(backend) if backend else jax.devices()
    cfg = config.resolve(len(devices))
    arr = np.asarray(devices).reshape(cfg.dp, cfg.fsdp, cfg.pp, cfg.tp, cfg.sp)
    return Mesh(arr, axis_names=("dp", "fsdp", "pp", "tp", "sp"))


# ---------------------------------------------------------------------------
# Parameter sharding rules
# ---------------------------------------------------------------------------

_TP_SHARD_OUT = ("to_q", "to_k", "to_v", "net_0_proj")  # column parallel
_TP_SHARD_IN = ("to_out", "net_2")  # row parallel


def _spec_for(path: tuple, shape: tuple, mesh: Mesh) -> P:
    """Choose a PartitionSpec for one parameter.

    - tp: attention qkv + ff-in kernels column-parallel, out-projections
      row-parallel (their matmuls then produce partial sums that XLA
      reduces over 'tp').
    - fsdp: shard the largest remaining axis divisible by the fsdp size.
    - scanned ('blocks') params have a leading layer axis — never sharded
      by fsdp (it is scanned over), so the fsdp axis search starts at 1
      for those; with pp > 1 the layer axis IS the pipeline-stage axis
      (parallel/pp.py holds L/pp consecutive layers per stage).
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    tp_size = mesh.shape["tp"]
    fsdp_size = mesh.shape["fsdp"]
    pp_size = mesh.shape.get("pp", 1)
    spec = [None] * len(shape)
    start = 1 if "blocks" in names and len(shape) > 1 else 0
    if pp_size > 1 and start == 1 and shape[0] % pp_size == 0:
        spec[0] = "pp"

    if tp_size > 1 and "kernel" in names and len(shape) >= 2:
        parent = names[-2] if len(names) >= 2 else ""
        if any(t in parent for t in _TP_SHARD_OUT) and shape[-1] % tp_size == 0:
            spec[-1] = "tp"
        elif any(t in parent for t in _TP_SHARD_IN) and shape[-2] % tp_size == 0:
            spec[-2] = "tp"

    if fsdp_size > 1:
        # largest free axis divisible by fsdp — except:
        # - the output head: an output-dim-sharded proj_out kernel makes
        #   GSPMD demand a feature-sharded cotangent at the unpatchify
        #   reshape in the backward, which it can only satisfy by
        #   "Involuntary full rematerialization" (fires when out_features >
        #   inner_dim, e.g. tiny test configs; at flagship shapes the size
        #   rule already picks the input dim). Head kernels ZeRO-shard
        #   input-dim only.
        # - scanned block kernels [L, in, out]: ZeRO-shard the OUT dim
        #   (stacking on 'tp' when tp already owns it). An in-dim-sharded
        #   kernel forces the weight-grad dot inside the backward scan to
        #   demand a feature-sharded copy of the layer-stacked saved
        #   activation, which GSPMD satisfies with "Involuntary full
        #   rematerialization" (observed on the joint [B,104,64] block
        #   input under dp x fsdp, 2026-08-19 — to_k weight grad, XLA
        #   b/433785288); the out-dim demand lands on the cotangent, which
        #   is PRODUCED inside the loop, so propagation shards it cleanly.
        # EXCEPT under sp: out-dim fsdp puts the shard on the heads dim of
        # q/k/v, which collides with the ring shard_map's batch-only specs
        # (GSPMD halo-exchange full-remat at the ring boundary, observed
        # 2026-08-19 under dp x fsdp x sp); the ring restructures the
        # backward such that the in-dim rule is full-remat-clean there.
        sp_active = mesh.shape.get("sp", 1) > 1
        scanned_kernel = (start == 1 and "kernel" in names and len(shape) >= 3
                          and not sp_active)
        if "proj_out" in names and "kernel" in names and len(shape) >= 2:
            order = [len(shape) - 2]
        elif scanned_kernel:
            order = [len(shape) - 1, len(shape) - 2]
        else:
            order = sorted(range(start, len(shape)), key=lambda i: -shape[i])
        for i in order:
            if spec[i] is None and shape[i] % fsdp_size == 0 and shape[i] >= fsdp_size:
                spec[i] = "fsdp"
                break
            if (scanned_kernel and spec[i] == "tp" and i == len(shape) - 1
                    and shape[i] % (tp_size * fsdp_size) == 0):
                spec[i] = ("tp", "fsdp")
                break
    return P(*spec)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for a param (or optimizer-state) pytree."""

    def assign(path, leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _spec_for(path, leaf.shape, mesh))

    return jax.tree_util.tree_map_with_path(assign, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch shards over the combined (dp, fsdp) axes."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

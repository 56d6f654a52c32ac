"""orv_tpu — a TPU-native (JAX/XLA/Pallas) robot-video generation framework.

Re-designed from scratch with the capabilities of the ORV reference
(occupancy-centric robot video generation): an action/trajectory +
image + 4D-occupancy conditioned CogVideoX-style video diffusion
transformer, a causal 3D VAE, multiview cross-view attention, cascaded
long-horizon rollout, a data factory (voxelization + splat rendering),
and SPMD training/eval over a `jax.sharding.Mesh`.

Layer map (mirrors reference layer map in SURVEY.md §1):
  L0  orv_tpu.ops        — Pallas kernels + native (C++) offline ops
  L2  orv_tpu.data       — datasets / bucketing / collate
  L3  orv_tpu.models     — DiT, VAE, text encoder, schedulers
  L4  orv_tpu.pipelines  — train / sample / eval / metrics entry points
  L5  orv_tpu.config     — layered YAML experiment surface
  L7  orv_tpu.parallel   — mesh, sharding rules, distributed step
"""

__version__ = "0.1.0"

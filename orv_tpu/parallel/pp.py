"""Pipeline-parallel training: the DiT block stack split into `pp` stages.

Capability beyond the reference (its distributed story is DDP/ZeRO only,
SURVEY.md §2.3) — added because on a TPU pod slice pipeline parallelism is
the standard way to scale a model past one chip's HBM without paying
fsdp's per-layer all-gathers: each stage holds `num_layers/pp` consecutive
blocks resident, and only the [microbatch, S, D] activations cross the ICI
once per tick.

Design (GPipe schedule, TPU-idiomatic):

- The scanned blocks' stacked params [L, ...] are split along the layer
  axis over the mesh's `pp` axis via `jax.shard_map` — each device sees a
  local [L/pp, ...] slice and runs it with `lax.scan` (the same single
  compiled block as the resident path).
- The batch is split into M microbatches; a `lax.scan` over
  T = M + pp - 1 ticks moves activations stage-to-stage with
  `lax.ppermute` (nearest-neighbour ICI). Bubble fraction is
  (pp-1)/T — raise `n_micro` to amortize it.
- Embeddings ("pre") and the output head ("post", `models/dit.py`
  stage="pre"/"post") run replicated on every stage: they are <1% of the
  FLOPs and replicating them avoids extra transfers. The pipeline output
  is taken from the LAST stage (masked psum broadcast), so the loss is
  replicated and AD through shard_map produces the reversed backward
  pipeline automatically — per-stage block grads stay local, replicated
  params get exact grads from the psum/where transposes.
- Per-tick step indices feed through scan `xs` (never the carry) — the
  axon backend miscompiles comparisons on carried integers (CLAUDE.md).

Composes with dp (grads pmean over 'dp') AND fsdp (ZeRO: the local
[L/pp, ...] block slice is additionally sharded over 'fsdp' at rest —
params AND optimizer state — and all-gathered over 'fsdp' just before the
block scan; AD's transpose of that gather is a psum_scatter, i.e. the
gradients reduce-scatter back to shards for free). fsdp acts as extra
data parallelism (batch shards over the combined (dp, fsdp) axes, rng
folds on the linearized (dp, fsdp) index), so dp4 x pp2 and
dp2 x fsdp2 x pp2 compute bit-identical steps — only the memory layout
differs.

Composes with tp via PARTIAL-MANUAL shard_map (jax 0.9 `axis_names`):
the pipeline body is manual over (dp, fsdp, pp) only, and 'tp' stays a
GSPMD auto axis — the Megatron column/row kernel shardings from
`mesh._spec_for` ride through the shard_map boundary untouched and the
partitioner inserts the per-layer tp collectives inside each stage
exactly as in the resident step (no hand-written per-layer psums
needed). Activations entering the manual collectives (ppermute/psum
over 'pp') are tp-replicated, which partial-manual mode handles. The
tp x fsdp stacked kernel dim (('tp','fsdp') on qkv out dims) cannot be
split into a manual 'fsdp' factor + auto 'tp' factor on one dim, so
pp x tp requires fsdp=1 (raises otherwise). sp under pp still raises.

Exactness: the pipelined forward/backward computes the same math as the
resident step (no batch-coupled ops in the blocks), verified to ~1e-5 in
tests/test_pp.py against `make_train_step` on identical params/batch/rng
at dp=1. With dp>1 the rng is folded per dp shard, so noise/timestep
draws (and the whole-batch image-CFG dropout, which becomes per-shard)
differ from the resident global-batch step — same training distribution,
not bit-identical steps.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from orv_tpu.parallel.train_step import TrainState, diffusion_loss


def _is_blocks(path) -> bool:
    return any(getattr(p, "key", getattr(p, "name", str(p))) == "blocks"
               for p in path)


def _fsdp_axis(shape: tuple, fsdp_size: int, kernel: bool = False) -> int:
    """ZeRO shard axis for one stacked block leaf [L, ...]: kernels
    [L, in, out] shard the OUT dim first, everything else the largest
    non-layer axis divisible by the fsdp size (same selection rule as
    mesh._spec_for — see the full-remat rationale there — so the outer
    param shardings and the shard_map in_specs agree and no resharding
    happens at the boundary). -1 = replicate."""
    if fsdp_size <= 1 or len(shape) < 2:
        return -1
    if kernel and len(shape) >= 3:
        order = [len(shape) - 1, len(shape) - 2]
    else:
        order = sorted(range(1, len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp_size == 0 and shape[i] >= fsdp_size:
            return i
    return -1


def _is_kernel(path) -> bool:
    return any(getattr(p, "key", getattr(p, "name", str(p))) == "kernel"
               for p in path)


def _pp_specs(params: Any, fsdp_size: int = 1):
    """shard_map PartitionSpecs: blocks' layer axis over 'pp' (+ ZeRO
    'fsdp' on their largest free axis), everything else replicated (the
    small pre/post params stay GSPMD-managed outside the shard_map)."""

    def assign(path, leaf):
        if not (_is_blocks(path) and leaf.ndim >= 1):
            return P()
        spec = [None] * leaf.ndim
        spec[0] = "pp"
        ax = _fsdp_axis(leaf.shape, fsdp_size, kernel=_is_kernel(path))
        if ax >= 0:
            spec[ax] = "fsdp"
        return P(*spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def _pipeline(cell, block_params, hidden, enc, temb, rope, action_emb,
              rope_view, *, n_micro: int, pp_size: int, remat: bool,
              collect_enc: bool = True):
    """Run the block stack over the 'pp' axis with a GPipe microbatch
    schedule. Per-device code (inside shard_map); `block_params` is the
    local [L/pp, ...] stacked slice.

    collect_enc=False skips the encoder-token output stack (scan carry +
    cross-stage psum) and returns enc=None — the head only reads the
    final enc tokens under joint_final_norm (5b family); the inter-stage
    enc handoff itself always happens (each block updates both streams)."""
    M = n_micro
    B = hidden.shape[0]
    if B % M != 0:
        raise ValueError(f"pipeline batch {B} not divisible by n_micro={M}")
    mb = B // M
    p = jax.lax.axis_index("pp")

    def stack_fn(h, e, tmb, aemb):
        def body(carry, layer_params):
            out, _ = cell.apply({"params": layer_params}, carry, tmb, rope,
                                aemb, rope_view)
            return out, None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        (h, e), _ = jax.lax.scan(body, (h, e), block_params)
        return h, e

    def split(a):
        return a.reshape(M, mb, *a.shape[1:])

    h_in, e_in, t_in = split(hidden), split(enc), split(temb)
    a_in = split(action_emb) if action_emb is not None else None

    def at(stack, i):
        return jax.lax.dynamic_index_in_dim(stack, i, 0, keepdims=False)

    def tick(carry, t):
        cur_h, cur_e, out_h, out_e = carry
        i = jnp.clip(t - p, 0, M - 1)  # this stage's microbatch this tick
        first = p == 0
        in_h = jnp.where(first, at(h_in, i), cur_h)
        in_e = jnp.where(first, at(e_in, i), cur_e)
        y_h, y_e = stack_fn(in_h, in_e, at(t_in, i),
                            at(a_in, i) if a_in is not None else None)
        # last stage writes finished microbatches into the output stacks
        write = (p == pp_size - 1) & (t - p >= 0) & (t - p < M)
        out_h = jax.lax.dynamic_update_index_in_dim(
            out_h, jnp.where(write, y_h, at(out_h, i)), i, 0)
        if collect_enc:
            out_e = jax.lax.dynamic_update_index_in_dim(
                out_e, jnp.where(write, y_e, at(out_e, i)), i, 0)
        if pp_size > 1:  # hand to the next stage (bubble ticks carry zeros)
            perm = [(s, s + 1) for s in range(pp_size - 1)]
            y_h = jax.lax.ppermute(y_h, "pp", perm)
            y_e = jax.lax.ppermute(y_e, "pp", perm)
        return (y_h, y_e, out_h, out_e), None

    init = (
        jnp.zeros((mb,) + hidden.shape[1:], hidden.dtype),
        jnp.zeros((mb,) + enc.shape[1:], enc.dtype),
        jnp.zeros((M, mb) + hidden.shape[1:], hidden.dtype),
        (jnp.zeros((M, mb) + enc.shape[1:], enc.dtype) if collect_enc
         else jnp.zeros((), enc.dtype)),
    )
    ticks = jnp.arange(M + pp_size - 1)
    (_, _, out_h, out_e), _ = jax.lax.scan(tick, init, ticks)

    # broadcast the last stage's outputs to every stage for the replicated
    # head (psum of a masked buffer == select-from-last-stage)
    is_last = p == pp_size - 1
    out_h = jax.lax.psum(jnp.where(is_last, out_h, jnp.zeros_like(out_h)), "pp")
    out_h = out_h.reshape(B, *hidden.shape[1:])
    if not collect_enc:
        return out_h, None
    out_e = jax.lax.psum(jnp.where(is_last, out_e, jnp.zeros_like(out_e)), "pp")
    return out_h, out_e.reshape(B, *enc.shape[1:])


def make_pp_apply(model, pp_size: int, n_micro: int, remat: bool = False) -> Callable:
    """A drop-in `model.apply` replacement whose block stack runs as a
    `pp_size`-stage pipeline. Must be called inside shard_map over a mesh
    with a 'pp' axis; params carry the LOCAL blocks slice."""
    from orv_tpu.models.dit import _BlockCell

    def apply_fn(params, hidden_states, encoder_hidden_states, timestep,
                 actions=None, depths=None, labels=None,
                 image_rotary_emb=None, num_views: int = 1,
                 deterministic: bool = True, rngs=None):
        c = model.config
        if num_views > 1 and (hidden_states.shape[0] % n_micro != 0):
            raise ValueError("multiview pp needs n_micro to divide the "
                             "sample batch so views stay in one microbatch")
        hidden, enc, temb, action_emb, is_mask, act_recon = model.apply(
            params, hidden_states, encoder_hidden_states, timestep,
            actions=actions, depths=depths, labels=labels,
            image_rotary_emb=image_rotary_emb, num_views=num_views,
            deterministic=deterministic, rngs=rngs, stage="pre",
        )
        num_frames = hidden_states.shape[1] // num_views
        cell = _BlockCell(
            cfg=c, n_view=num_views, n_frame=num_frames,
            attn_impl=model.attn_impl, dtype=model.dtype,
            param_dtype=model.param_dtype, quant=model.quant, sp_mesh=None,
        )
        hidden, enc_out = _pipeline(
            cell, params["params"]["blocks"], hidden, enc, temb,
            image_rotary_emb, action_emb, None,
            n_micro=n_micro, pp_size=pp_size, remat=remat,
            # the head reads the final enc tokens only under
            # joint_final_norm (5b family) — skip their collection
            # bookkeeping and cross-stage psum otherwise
            collect_enc=c.joint_final_norm,
        )
        out = model.apply(
            # pre-stack enc as a placeholder when the head ignores it
            params, hidden, enc_out if enc_out is not None else enc,
            timestep, num_views=num_views,
            stage="post", temb_in=temb, action_emb_in=action_emb,
            post_dims=(num_frames, hidden_states.shape[3], hidden_states.shape[4]),
        )
        return out, is_mask, act_recon

    return apply_fn


def make_pp_train_step(
    model,
    tx: optax.GradientTransformation,
    schedule,
    mesh,
    n_micro: Optional[int] = None,
    donate: bool = True,
    fold_rng: bool = True,
    **loss_kwargs,
):
    """Pipeline-parallel counterpart of `make_train_step`: same loss, same
    TrainState protocol, blocks split over the mesh's 'pp' axis. Shard
    params with `param_shardings(params, mesh)` (layer axis lands on 'pp')
    and the batch with `batch_sharding(mesh)` as usual.

    `n_micro` (default: pp size) microbatches per dp shard; bubble
    fraction (pp-1)/(n_micro+pp-1)."""
    pp_size = mesh.shape["pp"]
    dp_size = mesh.shape["dp"]
    fsdp_size = mesh.shape.get("fsdp", 1)
    tp_size = mesh.shape.get("tp", 1)
    if mesh.shape.get("sp", 1) != 1:
        # the sp ring is itself a shard_map and is not nested inside pp's
        # manual region. See PARITY.md "Parallelism composition matrix".
        raise ValueError(
            "pp composes with dp, fsdp and tp (sp=1); got mesh "
            f"{dict(mesh.shape)}. For long sequences use train.mesh.sp "
            "(composes with dp/fsdp, not pp)")
    if tp_size > 1 and fsdp_size > 1:
        # mesh._spec_for stacks ('tp','fsdp') on one kernel dim; a
        # partial-manual shard_map cannot split one dim into a manual
        # 'fsdp' factor plus an auto 'tp' factor.
        raise ValueError(
            "pp x tp requires fsdp=1 (the ('tp','fsdp')-stacked kernel "
            f"dim cannot cross the shard_map boundary); got mesh "
            f"{dict(mesh.shape)}. Use dp x pp x tp, or dp x fsdp x pp")
    if getattr(model, "act_mesh", None) is not None:
        # the pp step runs the model INSIDE shard_map (all axes manual),
        # where with_sharding_constraint on mesh axes is illegal — and
        # pointless: sharding is explicit here. Drop the pin.
        model = model.clone(act_mesh=None)
    L = model.config.num_layers
    if L % pp_size != 0:
        raise ValueError(f"num_layers={L} not divisible by pp={pp_size}")
    n_micro = int(n_micro or pp_size)
    remat = bool(getattr(model, "remat", False))
    apply_fn = make_pp_apply(model, pp_size, n_micro, remat=remat)

    def loss_fn(params, batch, rng):
        pspecs = _pp_specs(params, fsdp_size)
        # static per-leaf gather axes, decided on GLOBAL shapes (inside the
        # shard_map leaves are local and the largest-axis rule could pick a
        # different axis)
        gather_axes = jax.tree_util.tree_map_with_path(
            lambda path, leaf: (_fsdp_axis(leaf.shape, fsdp_size,
                                           kernel=_is_kernel(path))
                                if _is_blocks(path) and leaf.ndim >= 1
                                else -1),
            params,
        )

        def device_loss(params, batch, rng):
            if dp_size * fsdp_size > 1:
                # per-data-shard noise/timesteps; fsdp acts as extra data
                # parallelism, so fold on the linearized (dp, fsdp) index —
                # dp4 and dp2 x fsdp2 draw identical per-shard keys. At
                # dp=fsdp=1 the key stays untouched so the step matches the
                # resident one bit-for-bit.
                idx = (jax.lax.axis_index("dp") * fsdp_size
                       + jax.lax.axis_index("fsdp"))
                rng = jax.random.fold_in(rng, idx)
            if fsdp_size > 1:
                # ZeRO-3: materialize the full local [L/pp, ...] block slice
                # from the fsdp shards; AD's transpose of the tiled gather is
                # a psum_scatter, so grads reduce-scatter back for free
                params = jax.tree_util.tree_map(
                    lambda leaf, ax: leaf if ax < 0 else jax.lax.all_gather(
                        leaf, "fsdp", axis=ax, tiled=True),
                    params, gather_axes)
            loss, metrics = diffusion_loss(apply_fn, params, batch, schedule,
                                           rng, **loss_kwargs)
            loss = jax.lax.pmean(loss, ("dp", "fsdp"))
            metrics = jax.tree_util.tree_map(
                lambda m: jax.lax.pmean(m, ("dp", "fsdp")), metrics)
            return loss, metrics

        bspecs = jax.tree_util.tree_map(lambda _: P(("dp", "fsdp")), batch)
        kwargs = {}
        if tp_size > 1:
            # partial-manual: 'tp' stays auto so GSPMD shards the kernels
            # and inserts the Megatron collectives inside each stage
            kwargs["axis_names"] = {a for a in mesh.axis_names if a != "tp"}
        sharded = jax.shard_map(
            device_loss, mesh=mesh,
            in_specs=(pspecs, bspecs, P()),
            out_specs=(P(), P()),
            # the masked-psum broadcast + partial ppermutes confuse the
            # varying-axes checker; correctness is pinned by test_pp.py's
            # exact match against the resident step
            check_vma=False,
            **kwargs,
        )
        return sharded(params, batch, rng)

    from orv_tpu.models.layers import fused_adaln_override

    def step_fn(state: TrainState, batch, rng):
        if fold_rng:
            rng = jax.random.fold_in(rng, state.step)
        # training traces use the XLA adaLN lowering (fused backward is a
        # measured regression — see make_train_step / layers.py)
        with fused_adaln_override(False):
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch, rng)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state), metrics)

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

"""ControlDiT — the action/image/occupancy-conditioned video diffusion
transformer (TPU-native re-design of the reference's
CogVideoXTransformer3DModelTraj, cogvideox_control.py:448-948).

Architecture (matching reference semantics):
  patch_embed(text, video latents) -> [text | video] token sequence
  + multiview positional embedding (per-frame across views)
  + ActionEmbed conditioning (adds to temb per frame inside adaLN)
  + visual-control injection: depth/label latents through the *shared*
    patch_embed, zero-init combine linear, single residual add
  -> num_layers x [MVBlock? -> DiTBlock]   (scanned, optionally remat)
  -> final LayerNorm -> AdaLN out -> proj_out -> unpatchify

TPU-native choices: blocks run under `nn.scan` (single compiled block,
stacked params — fast compile, layer-sliceable for pipeline sharding),
patch embed is space-to-depth + matmul, attention is the Pallas flash
kernel, activations bf16 with f32 modulation math.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange

from orv_tpu.models.layers import (
    ActionEmbed,
    ActionRecon,
    AdaLayerNormOut,
    DiTBlock,
    LayerNorm,
    MVBlock,
    PatchEmbed,
    TimestepEmbedding,
    torch_linear_init,
)
from orv_tpu.utils.embeddings import get_3d_sincos_pos_embed, get_timestep_embedding

Dtype = Any


def _act_pin(x: jnp.ndarray, act_mesh) -> jnp.ndarray:
    """Pin a [B, S, D] activation to the (dp, fsdp)-batch sharding with
    everything else replicated (Megatron convention — tp shards kernels,
    not block inputs/outputs). No-op without a mesh. See ControlDiT.act_mesh."""
    if act_mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    axes = tuple(a for a in ("dp", "fsdp")
                 if a in act_mesh.axis_names and act_mesh.shape[a] > 1)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(act_mesh, PartitionSpec(axes if axes else None)))


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """Mirrors the reference model config surface
    (cogvideox_control.py:452-494); field names preserved."""

    num_attention_heads: int = 30
    attention_head_dim: int = 64
    in_channels: int = 16
    out_channels: int = 16
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    time_embed_dim: int = 512
    text_embed_dim: int = 4096
    num_layers: int = 30
    attention_bias: bool = True
    sample_width: int = 90
    sample_height: int = 60
    sample_frames: int = 49
    patch_size: int = 2
    patch_size_t: Optional[int] = None
    temporal_compression_ratio: int = 4
    max_text_seq_length: int = 226
    norm_eps: float = 1e-5
    spatial_interpolation_scale: float = 1.875
    temporal_interpolation_scale: float = 1.0
    use_rotary_positional_embeddings: bool = False
    use_learned_positional_embeddings: bool = False
    patch_bias: bool = True
    # conditioning extensions (reference additional arguments)
    modulate_encoder_hidden_states: bool = False
    recon_action: bool = False
    visual_guidance: bool = False
    num_control_keys: int = 2
    multiview: bool = False
    max_n_view: int = 3
    joint_final_norm: bool = False  # 5b family norms [text|video] jointly
    action_dim: int = 7

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


class _BlockCell(nn.Module):
    """One scan step: optional MVBlock then DiTBlock.

    use_attn_cache / collect_attn (static): PAB attention broadcast — the
    cell consumes a per-layer cached attention output (extra scan input,
    in_axes=0) or emits its own as scan ys (see DiTBlock.cached_attn)."""

    cfg: DiTConfig
    n_view: int
    n_frame: int
    attn_impl: str
    dtype: Dtype
    param_dtype: Dtype
    quant: bool = False
    sp_mesh: Optional[Any] = None
    use_attn_cache: bool = False
    collect_attn: bool = False

    @nn.compact
    def __call__(self, carry, temb, rope, action_emb, rope_view, attn_cache=None):
        hidden, enc = carry
        c = self.cfg
        kw = dict(attn_impl=self.attn_impl, dtype=self.dtype, param_dtype=self.param_dtype)
        if c.multiview:
            # cross-view attention stays sequence-resident (v*s tokens per
            # frame is small); only the main joint attention rings over sp
            hidden = MVBlock(
                dim=c.inner_dim, heads=c.num_attention_heads, head_dim=c.attention_head_dim,
                time_embed_dim=c.time_embed_dim, modulate_enc=c.modulate_encoder_hidden_states,
                attention_bias=c.attention_bias, norm_eps=c.norm_eps,
                quant=self.quant, name="mv_block", **kw,
            )(hidden, enc, temb, rope_view, self.n_view, self.n_frame)
        block = DiTBlock(
            dim=c.inner_dim, heads=c.num_attention_heads, head_dim=c.attention_head_dim,
            time_embed_dim=c.time_embed_dim, modulate_enc=c.modulate_encoder_hidden_states,
            attention_bias=c.attention_bias, norm_eps=c.norm_eps,
            quant=self.quant, sp_mesh=self.sp_mesh, name="block", **kw,
        )
        out = block(hidden, enc, temb, rope, action_emb,
                    cached_attn=attn_cache if self.use_attn_cache else None,
                    return_attn=self.collect_attn)
        if self.collect_attn:
            hidden, enc, attn_out = out
            return (hidden, enc), attn_out
        hidden, enc = out
        return (hidden, enc), None


class ControlDiT(nn.Module):
    config: DiTConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    # int8 W8A8 linears in every block (attention projections + FF) — the
    # inference-serving configuration; pair with params from
    # orv_tpu.models.quantize.quantize_linear_params. Inference-only.
    quant: bool = False
    remat: bool = False
    # nn.remat policy: None recomputes everything in the block (min memory);
    # "dots" saves matmul outputs and recomputes only elementwise/norm work
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) — faster
    # backward when HBM allows
    remat_policy: Optional[str] = None
    # sequence-parallel: a jax.sharding.Mesh with an `sp` axis routes every
    # block's joint attention through ring attention (video tokens sharded,
    # text replicated); all other ops are token-elementwise so XLA keeps
    # them sharded for free. Capability beyond the reference (SURVEY §5.7).
    sp_mesh: Optional[Any] = None
    # activation-sharding mesh: when set, embed-boundary activations are
    # pinned to the (dp, fsdp)-batch sharding with tp replicated. Without
    # the pin, GSPMD back-propagates the tp kernel sharding of block 0's
    # qkv into the patch-embed reshape/adds and, unable to reshard a
    # batch-sharded [B,S,D] into the transposed tp layout, falls back to
    # "Involuntary full rematerialization" (replicate-then-repartition) at
    # every embed — an all-gather-shaped cliff on real multi-chip meshes.
    act_mesh: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, V*F, C, H, W] latents (+image latents on C)
        encoder_hidden_states: jnp.ndarray,  # [B, S_txt, text_embed_dim]
        timestep: jnp.ndarray,  # [B]
        actions: Optional[jnp.ndarray] = None,  # [B, F_raw, action_dim]
        depths: Optional[jnp.ndarray] = None,  # [B, V*F, C_in, H, W]
        labels: Optional[jnp.ndarray] = None,
        image_rotary_emb: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        image_rotary_emb_view: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        num_views: int = 1,
        deterministic: bool = True,
        control_cache: Optional[jnp.ndarray] = None,
        controls_only: bool = False,
        stage: Optional[str] = None,
        temb_in: Optional[jnp.ndarray] = None,
        action_emb_in: Optional[jnp.ndarray] = None,
        post_dims: Optional[Tuple[int, int, int]] = None,
        attn_cache: Optional[Any] = None,
        collect_attn: bool = False,
    ):
        # control_cache / controls_only: the visual-control patch embeds
        # depend only on (depths, labels) — not the denoised latents or the
        # timestep — so a sampler scanning 50 steps can compute them ONCE
        # (controls_only=True returns the concatenated control embeds and
        # skips the block stack) and feed them back per step via
        # control_cache. On-chip A/B (2026-08-19): NEUTRAL at the flagship
        # shape (11.009 vs 11.01 s/50 steps) — XLA's loop-invariant code
        # motion already hoists the embed out of the scan; this path keeps
        # the hoist guaranteed (sharded/scan-carry variants where LICM may
        # not fire) and is what the tp-serve dryrun leg exercises. The
        # reference re-embeds controls every step
        # (cogvideox_control.py:827-858).
        #
        # stage ("pre"/"post"/None): pipeline-parallel split points
        # (parallel/pp.py). "pre" runs embeddings + conditioning (steps 1-4)
        # and returns (hidden, enc, temb, action_emb, is_action_mask,
        # actions_recon); "post" takes the block-stack outputs as
        # hidden_states/encoder_hidden_states token tensors plus
        # temb_in/action_emb_in and post_dims=(frames, height, width), runs
        # the output head (steps 6-7) and returns the sample alone. The
        # submodule names match the full path, so one param tree serves all
        # three modes.
        c = self.config
        inner_dim = c.inner_dim

        def act_pin(x):
            # pin [B, S, D] activations at the embed/head boundaries (the
            # scan cell additionally pins its carry per layer). See
            # act_mesh docstring and _act_pin.
            return _act_pin(x, self.act_mesh)

        def _head(hidden, enc, temb, action_emb, num_frames, height, width):
            # 6. final norm (5b family norms text+video jointly)
            norm_final = LayerNorm(inner_dim, eps=c.norm_eps, param_dtype=self.param_dtype,
                                   name="norm_final")
            if c.joint_final_norm:
                joint = norm_final(jnp.concatenate([enc, hidden], axis=1))
                hidden = joint[:, enc.shape[1]:]
            else:
                hidden = norm_final(hidden)

            # 7. AdaLN out + projection + unpatchify
            hidden = AdaLayerNormOut(
                embedding_dim=c.time_embed_dim, inner_dim=inner_dim, eps=c.norm_eps,
                dtype=self.dtype, param_dtype=self.param_dtype, name="norm_out",
            )(hidden, temb, action_emb)
            p, pt = c.patch_size, c.patch_size_t
            out_features = c.out_channels * p * p * (pt or 1)
            # the pin between proj_out and the unpatchify rearrange keeps
            # the BACKWARD cotangent batch-sharded across the reshape: the
            # tp-sharded proj_out kernel otherwise back-propagates a
            # feature-dim tp sharding into the reshape transpose, which
            # GSPMD can only satisfy by "Involuntary full rematerialization"
            # (observed on [B,S,p*p*C_out] under dp x fsdp x tp, 2026-08-19)
            hidden = act_pin(nn.Dense(
                out_features, kernel_init=torch_linear_init, dtype=self.dtype,
                param_dtype=self.param_dtype, name="proj_out",
            )(hidden))

            h_p, w_p = height // p, width // p
            if pt is None:
                output = rearrange(
                    hidden, "b (f h w) (c p1 p2) -> b f c (h p1) (w p2)",
                    f=num_frames, h=h_p, w=w_p, p1=p, p2=p,
                )
            else:
                output = rearrange(
                    hidden, "b (f h w) (c pt p1 p2) -> b (f pt) c (h p1) (w p2)",
                    f=num_frames // pt, h=h_p, w=w_p, pt=pt, p1=p, p2=p,
                )
            return rearrange(output, "(b v) f c h w -> b (v f) c h w", v=num_views)

        if stage == "post":
            f_post, h_post, w_post = post_dims
            return _head(hidden_states, encoder_hidden_states, temb_in,
                         action_emb_in, f_post, h_post, w_post)

        if num_views > 1:
            hidden_states = rearrange(hidden_states, "b (v f) c h w -> (b v) f c h w", v=num_views)
            encoder_hidden_states = jnp.repeat(encoder_hidden_states, num_views, axis=0)
        batch_size, num_frames = hidden_states.shape[0], hidden_states.shape[1]
        height, width = hidden_states.shape[3], hidden_states.shape[4]

        # 1. time embedding
        t_proj = get_timestep_embedding(
            timestep, inner_dim, flip_sin_to_cos=c.flip_sin_to_cos,
            downscale_freq_shift=float(c.freq_shift),
        )
        temb = TimestepEmbedding(
            inner_dim, c.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="time_embedding",
        )(t_proj)
        if num_views > 1:
            temb = jnp.repeat(temb, num_views, axis=0)  # views share the noise level

        # 2. patch embedding (channels-last internally)
        patch_embed = PatchEmbed(
            embed_dim=inner_dim, patch_size=c.patch_size, patch_size_t=c.patch_size_t,
            patch_bias=c.patch_bias,
            use_positional_embeddings=not c.use_rotary_positional_embeddings,
            spatial_interpolation_scale=c.spatial_interpolation_scale,
            temporal_interpolation_scale=c.temporal_interpolation_scale,
            dtype=self.dtype, param_dtype=self.param_dtype, name="patch_embed",
        )
        raw_text = encoder_hidden_states.astype(self.dtype)
        video_cl = rearrange(hidden_states, "b f c h w -> b f h w c").astype(self.dtype)
        embeds = act_pin(patch_embed(raw_text, video_cl))
        text_len = encoder_hidden_states.shape[1]
        enc = embeds[:, :text_len]
        hidden = embeds[:, text_len:]

        # 2.1 multiview positional embedding (added per frame across views)
        if num_views > 1:
            hidden = rearrange(hidden, "(b v) (f s) d -> (b f) (v s) d", v=num_views, f=num_frames)
            pos_v = get_3d_sincos_pos_embed(
                inner_dim,
                (width // c.patch_size, height // c.patch_size),
                num_views,
                c.spatial_interpolation_scale, 1.0,
            ).reshape(1, -1, inner_dim)
            hidden = hidden + jnp.asarray(pos_v, dtype=hidden.dtype)
            hidden = rearrange(hidden, "(b f) (v s) d -> (b v) (f s) d", v=num_views, f=num_frames)

        # 3. action conditioning
        action_emb = is_action_mask = actions_recon = None
        if actions is not None:
            pad_frames = (4 - (actions.shape[1] + 1) % 4) % 4
            if pad_frames > 0:
                actions = jnp.concatenate(
                    [jnp.zeros_like(actions[:, :pad_frames]), actions], axis=1
                )
            action_emb, is_action_mask = ActionEmbed(
                state_dim=c.action_dim, hidden_size=c.time_embed_dim, compress_ratio=4,
                patch_size_t=c.patch_size_t, dtype=self.dtype, param_dtype=self.param_dtype,
                name="action_embed",
            )(actions, deterministic=deterministic)
            if num_views > 1:
                action_emb = jnp.repeat(action_emb, num_views, axis=0)
            if c.recon_action:
                # params must exist regardless of mode; output only used in training
                actions_recon = ActionRecon(
                    state_dim=c.action_dim, hidden_size=c.time_embed_dim, compress_ratio=4,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="action_recon",
                )(action_emb)
                if pad_frames > 0:
                    actions_recon = actions_recon[:, pad_frames:]
                if deterministic:
                    actions_recon = None

        # 4. visual-control injection (shared patch embed, zero-init combine)
        if c.visual_guidance:
            controls_cat = control_cache
            if controls_cat is None:
                controls = []
                for ctrl in (depths, labels):
                    if ctrl is None:
                        continue
                    if num_views > 1:
                        ctrl = rearrange(ctrl, "b (v f) c h w -> (b v) f c h w", v=num_views)
                    ctrl_cl = rearrange(ctrl, "b f c h w -> b f h w c").astype(self.dtype)
                    ctrl_embeds = act_pin(patch_embed(raw_text, ctrl_cl))
                    controls.append(ctrl_embeds[:, text_len:])
                if controls:
                    if len(controls) != c.num_control_keys:
                        raise ValueError(
                            f"got {len(controls)} controls but num_control_keys={c.num_control_keys}"
                        )
                    controls_cat = jnp.concatenate(controls, axis=-1)
            if controls_only:
                return controls_cat
            if controls_cat is not None:
                combined = nn.Dense(
                    inner_dim, kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="initial_combine_linear",
                )(jnp.tile(hidden, (1, 1, c.num_control_keys)) + controls_cat)
                hidden = act_pin(hidden + combined)
        elif controls_only:
            return None

        if stage == "pre":
            return hidden, enc, temb, action_emb, is_action_mask, actions_recon

        # 5. block stack (scanned; optional per-block remat)
        if (attn_cache is not None or collect_attn) and c.multiview:
            raise NotImplementedError("PAB attention broadcast does not "
                                      "cover the multiview MVBlock path")
        cell = _BlockCell
        if self.remat:
            policy = None
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            cell = nn.remat(cell, prevent_cse=False, policy=policy)
        in_axes = (nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast)
        scan_args = [temb, image_rotary_emb, action_emb, image_rotary_emb_view]
        if attn_cache is not None:
            # per-layer cached attention outputs ride the scan (in_axes=0)
            in_axes = in_axes + (0,)
            scan_args.append(attn_cache)
        stack = nn.scan(
            cell,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=in_axes,
            length=c.num_layers,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )(
            cfg=c, n_view=num_views, n_frame=num_frames, attn_impl=self.attn_impl,
            dtype=self.dtype, param_dtype=self.param_dtype, quant=self.quant,
            sp_mesh=self.sp_mesh, use_attn_cache=attn_cache is not None,
            collect_attn=collect_attn, name="blocks",
        )
        (hidden, enc), attn_stack = stack((hidden, enc), *scan_args)

        output = _head(hidden, enc, temb, action_emb, num_frames, height, width)
        if collect_attn:
            return output, is_action_mask, actions_recon, attn_stack
        return output, is_action_mask, actions_recon

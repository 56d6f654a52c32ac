"""PyTorch (HF diffusers layout) -> orv_tpu parameter conversion.

Maps CogVideoX checkpoint tensors (transformer + VAE safetensors) onto our
Flax param trees, including the reference's T2V->I2V checkpoint surgery
(zero-initializing the extra 16 input channels of the patch embedding —
reference cogvideox_control.py:1016-1030) and stacking per-layer block
tensors along the scan axis.

Conventions:
  torch Linear weight [out, in]      -> kernel = W.T            [in, out]
  torch Conv2d patch embed [D,C,p,p] -> kernel = (c ph pw) x d
  torch Conv3d [O,I,kt,kh,kw]        -> kernel = [kt,kh,kw,I,O]
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from orv_tpu.models.dit import DiTConfig


def _t(w):  # torch linear -> flax kernel
    return np.ascontiguousarray(np.asarray(w).T)


def _conv3d(w):  # [O, I, kt, kh, kw] -> [kt, kh, kw, I, O]
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))


def _patch_conv(w):  # [D, C, p, p] -> [(c p p), D]
    w = np.asarray(w)
    D = w.shape[0]
    return np.ascontiguousarray(w.reshape(D, -1).T)


def load_torch_state_dict(folder: str) -> Dict[str, np.ndarray]:
    """Read a diffusers model folder (safetensors, possibly sharded)."""
    from safetensors import safe_open

    folder = Path(folder)
    files = sorted(folder.glob("*.safetensors"))
    index = folder / "diffusion_pytorch_model.safetensors.index.json"
    if index.exists():
        with open(index) as f:
            idx = json.load(f)
        files = sorted({folder / v for v in idx["weight_map"].values()})
    sd: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(str(f), framework="np") as fo:
            for k in fo.keys():
                sd[k] = fo.get_tensor(k)
    return sd


# ---------------------------------------------------------------------------
# DiT conversion
# ---------------------------------------------------------------------------

def _adaln_params(sd, prefix):
    return {
        "linear_kernel": _t(sd[f"{prefix}.linear.weight"]),
        "linear_bias": np.asarray(sd[f"{prefix}.linear.bias"]),
        "norm_scale": np.asarray(sd[f"{prefix}.norm.weight"]),
        "norm_bias": np.asarray(sd[f"{prefix}.norm.bias"]),
    }


def _attn_params(sd, prefix):
    out = {}
    for name in ("to_q", "to_k", "to_v"):
        out[name] = {
            "kernel": _t(sd[f"{prefix}.{name}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.{name}.bias"]),
        }
    out["to_out"] = {
        "kernel": _t(sd[f"{prefix}.to_out.0.weight"]),
        "bias": np.asarray(sd[f"{prefix}.to_out.0.bias"]),
    }
    for qk in ("norm_q", "norm_k"):
        if f"{prefix}.{qk}.weight" in sd:
            out[qk] = {
                "scale": np.asarray(sd[f"{prefix}.{qk}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.{qk}.bias"]),
            }
    return out


def _block_params(sd, prefix):
    return {
        "norm1": _adaln_params(sd, f"{prefix}.norm1"),
        "norm2": _adaln_params(sd, f"{prefix}.norm2"),
        "attn1": _attn_params(sd, f"{prefix}.attn1"),
        "ff": {
            "net_0_proj": {
                "kernel": _t(sd[f"{prefix}.ff.net.0.proj.weight"]),
                "bias": np.asarray(sd[f"{prefix}.ff.net.0.proj.bias"]),
            },
            "net_2": {
                "kernel": _t(sd[f"{prefix}.ff.net.2.weight"]),
                "bias": np.asarray(sd[f"{prefix}.ff.net.2.bias"]),
            },
        },
    }


def _mv_block_params(sd, prefix):
    return {
        "norm1": _adaln_params(sd, f"{prefix}.norm1"),
        "attn1": _attn_params(sd, f"{prefix}.attn1"),
        "proj_out": {
            "kernel": _t(sd[f"{prefix}.proj_out.weight"]),
            "bias": np.asarray(sd[f"{prefix}.proj_out.bias"]),
        },
        "cam_encoder_kernel": _t(sd[f"{prefix}.cam_encoder.weight"]),
        "cam_encoder_bias": np.asarray(sd[f"{prefix}.cam_encoder.bias"]),
    }


def _stack(trees):
    """List of identical param trees -> one tree with leading layer axis."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *trees)


def convert_dit_state_dict(
    sd: Dict[str, np.ndarray],
    config: DiTConfig,
    from_t2v: bool = False,
) -> Dict[str, Any]:
    """torch state dict (reference CogVideoXTransformer3DModelTraj or plain
    CogVideoX) -> our {'params': ...} tree."""
    p: Dict[str, Any] = {}

    proj_w = sd["patch_embed.proj.weight"]
    if proj_w.ndim == 4:  # CogVideoX 1.0 conv
        in_ch = proj_w.shape[1]
        if from_t2v and in_ch * 2 == config.in_channels:
            # T2V -> I2V surgery: extra input channels zero-initialized
            proj_w = np.concatenate([proj_w, np.zeros_like(proj_w)], axis=1)
        kernel = _patch_conv(proj_w)
    else:  # 1.5 linear
        kernel = _t(proj_w)
    p["patch_embed"] = {
        "proj": {"kernel": kernel},
        "text_proj": {
            "kernel": _t(sd["patch_embed.text_proj.weight"]),
            "bias": np.asarray(sd["patch_embed.text_proj.bias"]),
        },
    }
    if "patch_embed.proj.bias" in sd:
        p["patch_embed"]["proj"]["bias"] = np.asarray(sd["patch_embed.proj.bias"])

    p["time_embedding"] = {
        "linear_1": {
            "kernel": _t(sd["time_embedding.linear_1.weight"]),
            "bias": np.asarray(sd["time_embedding.linear_1.bias"]),
        },
        "linear_2": {
            "kernel": _t(sd["time_embedding.linear_2.weight"]),
            "bias": np.asarray(sd["time_embedding.linear_2.bias"]),
        },
    }

    blocks = [
        _block_params(sd, f"transformer_blocks.{i}") for i in range(config.num_layers)
    ]
    p["blocks"] = {"block": _stack(blocks)}
    if config.multiview and "mv_blocks.0.attn1.to_q.weight" in sd:
        mv = [_mv_block_params(sd, f"mv_blocks.{i}") for i in range(config.num_layers)]
        p["blocks"]["mv_block"] = _stack(mv)

    p["norm_final"] = {
        "scale": np.asarray(sd["norm_final.weight"]),
        "bias": np.asarray(sd["norm_final.bias"]),
    }
    p["norm_out"] = {
        "linear_kernel": _t(sd["norm_out.linear.weight"]),
        "linear_bias": np.asarray(sd["norm_out.linear.bias"]),
    }
    if "norm_out.norm.weight" in sd:
        p["norm_out"]["norm_scale"] = np.asarray(sd["norm_out.norm.weight"])
        p["norm_out"]["norm_bias"] = np.asarray(sd["norm_out.norm.bias"])
    p["proj_out"] = {
        "kernel": _t(sd["proj_out.weight"]),
        "bias": np.asarray(sd["proj_out.bias"]),
    }

    if "action_embed.mlp.0.weight" in sd:
        p["action_embed"] = {
            "fc1": {"kernel": _t(sd["action_embed.mlp.0.weight"]),
                    "bias": np.asarray(sd["action_embed.mlp.0.bias"])},
            "fc2": {"kernel": _t(sd["action_embed.mlp.3.weight"]),
                    "bias": np.asarray(sd["action_embed.mlp.3.bias"])},
            "mask_embed": np.asarray(sd["action_embed.mask_embed.weight"])[0],
        }
    if "action_recon.mlp.0.weight" in sd:
        p["action_recon"] = {
            "fc1": {"kernel": _t(sd["action_recon.mlp.0.weight"]),
                    "bias": np.asarray(sd["action_recon.mlp.0.bias"])},
            "fc2": {"kernel": _t(sd["action_recon.mlp.2.weight"]),
                    "bias": np.asarray(sd["action_recon.mlp.2.bias"])},
        }
    if "initial_combine_linear.weight" in sd:
        p["initial_combine_linear"] = {
            "kernel": _t(sd["initial_combine_linear.weight"]),
            "bias": np.asarray(sd["initial_combine_linear.bias"]),
        }
    return ensure_mv_blocks({"params": p}, config)


def ensure_mv_blocks(params: Dict[str, Any], config: DiTConfig) -> Dict[str, Any]:
    """Stage-3 initialization surgery: fine-tuning a non-multiview (stage-1/2)
    checkpoint into the multiview stage copies the main 3D blocks' attention
    and norm weights into the fresh mv_blocks, exactly like the reference
    `from_pretrained` (cogvideox_control.py:1043-1050). The gated `proj_out`
    and the dead `cam_encoder` start at zero, so the new cross-view path is
    an identity at step 0. No-op when the tree already has mv_blocks or the
    config is not multiview."""
    if not config.multiview:
        return params
    p = params.get("params", params)
    blocks = p.get("blocks")
    if blocks is None or "block" not in blocks or "mv_block" in blocks:
        return params
    import copy

    blk = blocks["block"]
    norm1 = copy.deepcopy(blk["norm1"])
    attn1 = copy.deepcopy(blk["attn1"])
    # leading axis = stacked layer count (scan convention)
    L = np.asarray(attn1["to_q"]["kernel"]).shape[0]
    D = config.inner_dim
    dt = np.asarray(attn1["to_q"]["kernel"]).dtype
    blocks["mv_block"] = {
        "norm1": norm1,
        "attn1": attn1,
        "proj_out": {"kernel": np.zeros((L, D, D), dt),
                     "bias": np.zeros((L, D), dt)},
        "cam_encoder_kernel": np.zeros((L, 12, D), dt),
        "cam_encoder_bias": np.zeros((L, D), dt),
    }
    return params


# ---------------------------------------------------------------------------
# DiT export (ours -> torch/diffusers layout)
# ---------------------------------------------------------------------------

def _t_inv(kernel):  # flax kernel -> torch linear weight
    return np.ascontiguousarray(np.asarray(kernel).T)


def _adaln_export(sd, prefix, p):
    sd[f"{prefix}.linear.weight"] = _t_inv(p["linear_kernel"])
    sd[f"{prefix}.linear.bias"] = np.asarray(p["linear_bias"])
    sd[f"{prefix}.norm.weight"] = np.asarray(p["norm_scale"])
    sd[f"{prefix}.norm.bias"] = np.asarray(p["norm_bias"])


def _attn_export(sd, prefix, p):
    for name in ("to_q", "to_k", "to_v"):
        if "kernel_q8" in p[name]:
            raise ValueError(
                "int8 serving params cannot export to a torch checkpoint — "
                "export the bf16 params the quantized tree was derived from")
        sd[f"{prefix}.{name}.weight"] = _t_inv(p[name]["kernel"])
        sd[f"{prefix}.{name}.bias"] = np.asarray(p[name]["bias"])
    sd[f"{prefix}.to_out.0.weight"] = _t_inv(p["to_out"]["kernel"])
    sd[f"{prefix}.to_out.0.bias"] = np.asarray(p["to_out"]["bias"])
    for qk in ("norm_q", "norm_k"):
        if qk in p:
            sd[f"{prefix}.{qk}.weight"] = np.asarray(p[qk]["scale"])
            sd[f"{prefix}.{qk}.bias"] = np.asarray(p[qk]["bias"])


def _index(tree, i):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x)[i], tree)


def export_dit_state_dict(params: Dict[str, Any], config: DiTConfig) -> Dict[str, np.ndarray]:
    """Our {'params': ...} tree -> torch state dict in the reference's key
    layout (exact inverse of `convert_dit_state_dict`; verified by the
    round-trip test). Lets an orv_tpu-trained model load back into the
    reference stack via its `from_pretrained`
    (cogvideox_control.py:950-1054)."""
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}

    kernel = np.asarray(p["patch_embed"]["proj"]["kernel"])
    if config.patch_size_t is None:
        # inverse of _patch_conv: [(c p p), D] -> [D, C, p, p]
        D = kernel.shape[1]
        ps = config.patch_size
        c = kernel.shape[0] // (ps * ps)
        sd["patch_embed.proj.weight"] = np.ascontiguousarray(
            kernel.T.reshape(D, c, ps, ps))
    else:  # CogVideoX-1.5 linear patch embed
        sd["patch_embed.proj.weight"] = _t_inv(kernel)
    if "bias" in p["patch_embed"]["proj"]:
        sd["patch_embed.proj.bias"] = np.asarray(p["patch_embed"]["proj"]["bias"])
    sd["patch_embed.text_proj.weight"] = _t_inv(p["patch_embed"]["text_proj"]["kernel"])
    sd["patch_embed.text_proj.bias"] = np.asarray(p["patch_embed"]["text_proj"]["bias"])

    for lin in ("linear_1", "linear_2"):
        sd[f"time_embedding.{lin}.weight"] = _t_inv(p["time_embedding"][lin]["kernel"])
        sd[f"time_embedding.{lin}.bias"] = np.asarray(p["time_embedding"][lin]["bias"])

    for i in range(config.num_layers):
        blk = _index(p["blocks"]["block"], i)
        prefix = f"transformer_blocks.{i}"
        _adaln_export(sd, f"{prefix}.norm1", blk["norm1"])
        _adaln_export(sd, f"{prefix}.norm2", blk["norm2"])
        _attn_export(sd, f"{prefix}.attn1", blk["attn1"])
        sd[f"{prefix}.ff.net.0.proj.weight"] = _t_inv(blk["ff"]["net_0_proj"]["kernel"])
        sd[f"{prefix}.ff.net.0.proj.bias"] = np.asarray(blk["ff"]["net_0_proj"]["bias"])
        sd[f"{prefix}.ff.net.2.weight"] = _t_inv(blk["ff"]["net_2"]["kernel"])
        sd[f"{prefix}.ff.net.2.bias"] = np.asarray(blk["ff"]["net_2"]["bias"])
        if "mv_block" in p["blocks"]:
            mv = _index(p["blocks"]["mv_block"], i)
            mp = f"mv_blocks.{i}"
            _adaln_export(sd, f"{mp}.norm1", mv["norm1"])
            _attn_export(sd, f"{mp}.attn1", mv["attn1"])
            sd[f"{mp}.proj_out.weight"] = _t_inv(mv["proj_out"]["kernel"])
            sd[f"{mp}.proj_out.bias"] = np.asarray(mv["proj_out"]["bias"])
            sd[f"{mp}.cam_encoder.weight"] = _t_inv(mv["cam_encoder_kernel"])
            sd[f"{mp}.cam_encoder.bias"] = np.asarray(mv["cam_encoder_bias"])

    sd["norm_final.weight"] = np.asarray(p["norm_final"]["scale"])
    sd["norm_final.bias"] = np.asarray(p["norm_final"]["bias"])
    sd["norm_out.linear.weight"] = _t_inv(p["norm_out"]["linear_kernel"])
    sd["norm_out.linear.bias"] = np.asarray(p["norm_out"]["linear_bias"])
    if "norm_scale" in p["norm_out"]:
        sd["norm_out.norm.weight"] = np.asarray(p["norm_out"]["norm_scale"])
        sd["norm_out.norm.bias"] = np.asarray(p["norm_out"]["norm_bias"])
    sd["proj_out.weight"] = _t_inv(p["proj_out"]["kernel"])
    sd["proj_out.bias"] = np.asarray(p["proj_out"]["bias"])

    if "action_embed" in p:
        sd["action_embed.mlp.0.weight"] = _t_inv(p["action_embed"]["fc1"]["kernel"])
        sd["action_embed.mlp.0.bias"] = np.asarray(p["action_embed"]["fc1"]["bias"])
        sd["action_embed.mlp.3.weight"] = _t_inv(p["action_embed"]["fc2"]["kernel"])
        sd["action_embed.mlp.3.bias"] = np.asarray(p["action_embed"]["fc2"]["bias"])
        sd["action_embed.mask_embed.weight"] = np.asarray(
            p["action_embed"]["mask_embed"])[None]
    if "action_recon" in p:
        sd["action_recon.mlp.0.weight"] = _t_inv(p["action_recon"]["fc1"]["kernel"])
        sd["action_recon.mlp.0.bias"] = np.asarray(p["action_recon"]["fc1"]["bias"])
        sd["action_recon.mlp.2.weight"] = _t_inv(p["action_recon"]["fc2"]["kernel"])
        sd["action_recon.mlp.2.bias"] = np.asarray(p["action_recon"]["fc2"]["bias"])
    if "initial_combine_linear" in p:
        sd["initial_combine_linear.weight"] = _t_inv(p["initial_combine_linear"]["kernel"])
        sd["initial_combine_linear.bias"] = np.asarray(p["initial_combine_linear"]["bias"])
    return sd


def export_torch_pretrained(folder: str, params: Dict[str, Any],
                            config: DiTConfig) -> None:
    """Write a diffusers-loadable transformer folder: config.json (the
    reference's registered field surface incl. its constant defaults,
    class-name fixup like save_pretrained cogvideox_control.py:1078-1087)
    + diffusion_pytorch_model.safetensors in torch layout."""
    import dataclasses

    from safetensors.numpy import save_file

    out = Path(folder)
    out.mkdir(parents=True, exist_ok=True)
    cfg = dataclasses.asdict(config)
    cfg.pop("action_dim", None)  # ours only; reference hardcodes 7
    cfg.pop("joint_final_norm", None)  # ours: explicit; reference: 5b class
    cfg.update({
        "_class_name": "CogVideoXTransformer3DModelTraj",
        # constants the reference registers but we don't vary
        "ofs_embed_dim": None,
        "dropout": 0.0,
        "activation_fn": "gelu-approximate",
        "timestep_activation_fn": "silu",
        "norm_elementwise_affine": True,
        "num_control_blocks": 12,
    })
    with open(out / "config.json", "w") as f:
        json.dump(cfg, f, indent=2)
    sd = export_dit_state_dict(params, config)
    # safetensors requires contiguous, owned buffers
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    save_file(sd, str(out / "diffusion_pytorch_model.safetensors"))


# ---------------------------------------------------------------------------
# VAE conversion
# ---------------------------------------------------------------------------

def _causal_conv(sd, prefix):
    return {"conv": {
        "kernel": _conv3d(sd[f"{prefix}.conv.weight"]),
        "bias": np.asarray(sd[f"{prefix}.conv.bias"]),
    }}


def _gn(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _spatial_norm(sd, prefix):
    return {
        "norm_layer": _gn(sd, f"{prefix}.norm_layer"),
        "conv_y": _causal_conv(sd, f"{prefix}.conv_y"),
        "conv_b": _causal_conv(sd, f"{prefix}.conv_b"),
    }


def _resnet(sd, prefix, spatial: bool):
    norm = _spatial_norm if spatial else _gn
    out = {
        "norm1": norm(sd, f"{prefix}.norm1"),
        "norm2": norm(sd, f"{prefix}.norm2"),
        "conv1": _causal_conv(sd, f"{prefix}.conv1"),
        "conv2": _causal_conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.conv_shortcut.conv.weight" in sd:
        out["conv_shortcut"] = _causal_conv(sd, f"{prefix}.conv_shortcut")
    return out


def _conv2d_over_frames(sd, prefix):
    # torch Conv2d [O, I, kh, kw] -> our (1, kh, kw) conv3d kernel
    w = np.asarray(sd[f"{prefix}.weight"])[:, :, None]  # [O, I, 1, kh, kw]
    return {"conv": {"kernel": _conv3d(w), "bias": np.asarray(sd[f"{prefix}.bias"])}}


def convert_vae_state_dict(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    nb = len(config.block_out_channels)
    enc: Dict[str, Any] = {"conv_in": _causal_conv(sd, "encoder.conv_in")}
    for i in range(nb):
        for j in range(config.layers_per_block):
            enc[f"down_{i}_res_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", spatial=False)
        if i < nb - 1:
            enc[f"down_{i}_downsample"] = _conv2d_over_frames(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
    for j in range(2):
        enc[f"mid_res_{j}"] = _resnet(sd, f"encoder.mid_block.resnets.{j}", spatial=False)
    enc["norm_out"] = _gn(sd, "encoder.norm_out")
    enc["conv_out"] = _causal_conv(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _causal_conv(sd, "decoder.conv_in")}
    for j in range(2):
        dec[f"mid_res_{j}"] = _resnet(sd, f"decoder.mid_block.resnets.{j}", spatial=True)
    for i in range(nb):
        for j in range(config.layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", spatial=True)
        if i < nb - 1:
            dec[f"up_{i}_upsample"] = _conv2d_over_frames(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
    dec["norm_out"] = _spatial_norm(sd, "decoder.norm_out")
    dec["conv_out"] = _causal_conv(sd, "decoder.conv_out")

    return {"params": {"encoder": enc, "decoder": dec}}

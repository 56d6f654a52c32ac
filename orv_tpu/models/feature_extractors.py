"""FID / FVD feature extractors, TPU-native (JAX/Flax).

Re-implements the two feature networks the reference metric harness loads
as external torch artifacts (reference orv/pipeline/compute_metrics.py):

  * InceptionV3 "pool3" (2048-d) for FID — reference :207-275 builds
    pytorch-fid's InceptionV3 wrapper around torchvision weights.
  * I3D (Kinetics-400 logits, 400-d) for FVD — reference :297-376 loads the
    StyleGAN-V `i3d_torchscript.pt`.

Both are full architectures here with torch state-dict converters; actual
pretrained weights remain external artifacts (no network egress in this
environment), so the public entry points `inception_pool3_features` /
`i3d_features` gate on a local weights file exactly like the T5 text
encoder (models/text_encoder.py). Architecture is standard/public
(Szegedy et al. 2015; Carreira & Zisserman 2017).

Layouts are channels-last; batch norm is folded into conv at load time
(inference-only networks — folding removes the BN memory passes).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


# ---------------------------------------------------------------------------
# shared: conv + (folded) BN + ReLU
# ---------------------------------------------------------------------------

class ConvBN(nn.Module):
    """conv (no bias) + folded-BN bias/scale + ReLU. The converter folds
    BN's (gamma, beta, mean, var) into (kernel_scale, bias), so at run time
    this is conv+bias+relu. Works for 2D and 3D kernels."""

    features: int
    kernel: Tuple[int, ...]
    strides: Tuple[int, ...] = None  # type: ignore[assignment]
    padding: Any = "SAME"
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = len(self.kernel)
        strides = self.strides or (1,) * nd
        y = nn.Conv(self.features, self.kernel, strides=strides, padding=self.padding,
                    use_bias=True, dtype=self.dtype, name="conv")(x)
        return nn.relu(y) if self.relu else y


def fold_bn(kernel: np.ndarray, gamma, beta, mean, var, eps: float = 1e-3):
    """Fold BN into the conv kernel/bias: k' = k * g/sqrt(v+eps) (per out
    channel), b' = beta - g*mean/sqrt(v+eps)."""
    s = gamma / np.sqrt(var + eps)
    return kernel * s.reshape((1,) * (kernel.ndim - 1) + (-1,)), beta - mean * s


# ---------------------------------------------------------------------------
# InceptionV3 (pool3 / 2048-d, the FID network)
# ---------------------------------------------------------------------------

class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), name="branch3x3dbl_3")(b3)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME", count_include_pad=False)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), padding="VALID", name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), padding="VALID", name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), name="branch7x7dbl_5")(bd)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME", count_include_pad=False)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), padding="VALID", name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), padding="VALID", name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # pytorch-fid's FIDInceptionE_2 uses max pool

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            ConvBN(384, (1, 3), name="branch3x3_2a")(b3),
            ConvBN(384, (3, 1), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            ConvBN(384, (1, 3), name="branch3x3dbl_3a")(bd),
            ConvBN(384, (3, 1), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool == "avg":
            bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME", count_include_pad=False)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """torchvision InceptionV3 up to the global average pool (2048-d),
    pytorch-fid pooling variants included. Input [N, 299, 299, 3] in
    [-1, 1] (pytorch-fid scales [0,1] inputs by 2x-1)."""

    @nn.compact
    def __call__(self, x):
        x = ConvBN(32, (3, 3), strides=(2, 2), padding="VALID", name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), padding="VALID", name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = ConvBN(80, (1, 1), padding="VALID", name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), padding="VALID", name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # global average pool -> [N, 2048]


# ---------------------------------------------------------------------------
# I3D (Kinetics-400, the FVD network)
# ---------------------------------------------------------------------------

class I3DMixed(nn.Module):
    """Inflated Inception module: [b0, (b1a->b1b), (b2a->b2b), (pool->b3)]."""

    ch: Tuple[int, int, int, int, int, int]  # b0, b1a, b1b, b2a, b2b, b3

    @nn.compact
    def __call__(self, x):
        c = self.ch
        b0 = ConvBN(c[0], (1, 1, 1), name="b0")(x)
        b1 = ConvBN(c[1], (1, 1, 1), name="b1a")(x)
        b1 = ConvBN(c[2], (3, 3, 3), name="b1b")(b1)
        b2 = ConvBN(c[3], (1, 1, 1), name="b2a")(x)
        b2 = ConvBN(c[4], (3, 3, 3), name="b2b")(b2)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        b3 = ConvBN(c[5], (1, 1, 1), name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class I3D(nn.Module):
    """I3D (InceptionV1 inflated to 3D), Kinetics-400 logits head — the FVD
    feature network. Input [N, T, 224, 224, 3] in [-1, 1], T >= 9."""

    num_classes: int = 400

    @nn.compact
    def __call__(self, x):
        x = ConvBN(64, (7, 7, 7), strides=(2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = ConvBN(64, (1, 1, 1), name="Conv3d_2b_1x1")(x)
        x = ConvBN(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = I3DMixed((64, 96, 128, 16, 32, 32), name="Mixed_3b")(x)
        x = I3DMixed((128, 128, 192, 32, 96, 64), name="Mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        x = I3DMixed((192, 96, 208, 16, 48, 64), name="Mixed_4b")(x)
        x = I3DMixed((160, 112, 224, 24, 64, 64), name="Mixed_4c")(x)
        x = I3DMixed((128, 128, 256, 24, 64, 64), name="Mixed_4d")(x)
        x = I3DMixed((112, 144, 288, 32, 64, 64), name="Mixed_4e")(x)
        x = I3DMixed((256, 160, 320, 32, 128, 128), name="Mixed_4f")(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = I3DMixed((256, 160, 320, 32, 128, 128), name="Mixed_5b")(x)
        x = I3DMixed((384, 192, 384, 48, 128, 128), name="Mixed_5c")(x)
        # global spatial avg pool, keep temporal, then logits conv + t-mean
        x = x.mean(axis=(2, 3), keepdims=True)
        x = nn.Conv(self.num_classes, (1, 1, 1), use_bias=True, name="logits")(x)
        return x.mean(axis=(1, 2, 3))  # [N, 400]


# ---------------------------------------------------------------------------
# torch state-dict converters (BN folded into conv)
# ---------------------------------------------------------------------------

def _conv_bn_from_torch(sd: Dict[str, np.ndarray], conv_key: str, bn_key: str,
                        nd: int) -> Dict[str, np.ndarray]:
    """torch conv [O, I, *k] + BN -> folded flax {kernel [*k, I, O], bias}."""
    k = np.asarray(sd[f"{conv_key}.weight"], np.float32)
    perm = tuple(range(2, 2 + nd)) + (1, 0)
    k = k.transpose(perm)
    k, b = fold_bn(
        k,
        np.asarray(sd[f"{bn_key}.weight"], np.float32),
        np.asarray(sd[f"{bn_key}.bias"], np.float32),
        np.asarray(sd[f"{bn_key}.running_mean"], np.float32),
        np.asarray(sd[f"{bn_key}.running_var"], np.float32),
    )
    return {"conv": {"kernel": k, "bias": b}}


def convert_inception_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision/pytorch-fid InceptionV3 state dict -> InceptionV3Pool3
    params (BN folded). Keys follow torchvision naming
    (`Mixed_5b.branch1x1.conv.weight`, ...)."""
    params: Dict[str, Any] = {}

    def cv(flax_name, torch_prefix):
        params[flax_name] = _conv_bn_from_torch(sd, f"{torch_prefix}.conv", f"{torch_prefix}.bn", 2)

    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        cv(stem, stem)

    def block(name, branches):
        sub = {}
        for br in branches:
            sub[br] = _conv_bn_from_torch(sd, f"{name}.{br}.conv", f"{name}.{br}.bn", 2)
        params[name] = sub

    a_branches = ("branch1x1", "branch5x5_1", "branch5x5_2",
                  "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool")
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        block(n, a_branches)
    block("Mixed_6a", ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"))
    c_branches = ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                  "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                  "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool")
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        block(n, c_branches)
    block("Mixed_7a", ("branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                       "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"))
    e_branches = ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                  "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                  "branch3x3dbl_3b", "branch_pool")
    for n in ("Mixed_7b", "Mixed_7c"):
        block(n, e_branches)
    return {"params": params}


# pytorch-i3d naming: module.submodule b0/b1a/... -> Unit3D with .conv3d and .bn
_I3D_BRANCH = {"b0": "b0", "b1a": "b1a", "b1b": "b1b", "b2a": "b2a",
               "b2b": "b2b", "b3b": "b3b"}


def convert_i3d_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """pytorch-i3d (piergiaj) state dict -> I3D params (BN folded).
    torch names: `Conv3d_1a_7x7.conv3d.weight`, `Mixed_3b.b0.conv3d.weight`,
    `logits.conv3d.{weight,bias}`."""
    params: Dict[str, Any] = {}
    for stem in ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"):
        params[stem] = _conv_bn_from_torch(sd, f"{stem}.conv3d", f"{stem}.bn", 3)
    for mixed in ("Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d",
                  "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c"):
        sub = {}
        for fl, tr in _I3D_BRANCH.items():
            sub[fl] = _conv_bn_from_torch(sd, f"{mixed}.{tr}.conv3d", f"{mixed}.{tr}.bn", 3)
        params[mixed] = sub
    k = np.asarray(sd["logits.conv3d.weight"], np.float32).transpose(2, 3, 4, 1, 0)
    params["logits"] = {"kernel": k,
                        "bias": np.asarray(sd["logits.conv3d.bias"], np.float32)}
    return {"params": params}


# ---------------------------------------------------------------------------
# gated public entry points (metrics.py features_fn factories)
# ---------------------------------------------------------------------------

def inception_pool3_features(weights_path: str, batch: int = 32) -> Callable:
    """-> features_fn for compute_fid: frames [N, H, W, 3] in [0,1] ->
    [N, 2048]. `weights_path`: a torch .pt/.pth InceptionV3 state dict
    (torchvision or pytorch-fid naming)."""
    from orv_tpu.models.weights import load_torch_state_dict

    model = InceptionV3Pool3()
    params = convert_inception_state_dict(load_torch_state_dict(weights_path))
    apply = jax.jit(lambda x: model.apply(params, x))

    def features_fn(frames: np.ndarray) -> np.ndarray:
        import cv2

        out = []
        for i in range(0, len(frames), batch):
            blk = frames[i:i + batch]
            rs = np.stack([cv2.resize(f, (299, 299), interpolation=cv2.INTER_LINEAR)
                           for f in blk])
            out.append(np.asarray(apply(jnp.asarray(rs * 2.0 - 1.0, jnp.float32))))
        return np.concatenate(out)

    return features_fn


def i3d_features(weights_path: str, batch: int = 8) -> Callable:
    """-> features_fn for compute_fvd: videos [N, T, 224, 224, 3] in [0,1]
    -> [N, 400]. `weights_path`: a torch state dict in pytorch-i3d naming
    (the TorchScript artifact's state_dict() has the same keys)."""
    from orv_tpu.models.weights import load_torch_state_dict

    model = I3D()
    params = convert_i3d_state_dict(load_torch_state_dict(weights_path))
    apply = jax.jit(lambda x: model.apply(params, x))

    def features_fn(videos: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(videos), batch):
            blk = jnp.asarray(videos[i:i + batch] * 2.0 - 1.0, jnp.float32)
            out.append(np.asarray(apply(blk)))
        return np.concatenate(out)

    return features_fn

"""Post-training int8 quantization of the DiT's hot linears.

`quantize_linear_params` converts a trained (or converted-from-torch)
ControlDiT param tree into the tree `ControlDiT(..., quant=True)` expects:
every block-internal Dense kernel (attention q/k/v/out projections and both
feed-forward matmuls — ~95% of the step FLOPs) becomes an int8 kernel with
per-output-channel absmax/127 scales. Everything outside the blocks
(patch/time/action embeds, adaLN modulation, final projection) stays in the
original dtype: those layers are a rounding error in FLOPs and the most
numerically sensitive.

At apply time `Int8Dense` (models/layers.py) quantizes activations per
token dynamically, so the full recipe is standard W8A8 dynamic PTQ. On the
v5e MXU the int8 path doubles MACs/cycle and halves the weight HBM stream.

The reference has no quantized-serving path; this is a TPU-native serving
optimization (same role TensorRT int8 plays for the CUDA stack).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

# Dense modules inside the scanned blocks that carry the step's FLOPs.
QUANT_LAYER_NAMES = ("to_q", "to_k", "to_v", "to_out", "net_0_proj", "net_2")


def quantize_linear_params(params):
    """Return a new param tree with block Dense kernels int8-quantized.

    Handles scan-stacked kernels ([L, in, out]) and plain ones ([in, out]):
    scales are per (layer,) output channel. Non-kernel leaves (biases,
    norms, embeds) pass through unchanged.
    """
    flat = flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        if len(path) >= 2 and path[-1] == "kernel" and path[-2] in QUANT_LAYER_NAMES:
            k = jnp.asarray(leaf, jnp.float32)
            scale = jnp.maximum(jnp.max(jnp.abs(k), axis=-2), 1e-8) / 127.0
            kq = jnp.round(k / scale[..., None, :]).astype(jnp.int8)
            out[path[:-1] + ("kernel_q8",)] = kq
            out[path[:-1] + ("kernel_scale",)] = scale
        else:
            out[path] = leaf
    return unflatten_dict(out)

"""FID/FVD feature networks: architecture shapes, BN folding, and torch
state-dict converter mechanics (real pretrained weights are external
artifacts — the converters are validated with identity-BN synthetic state
dicts whose fold must reproduce the flax kernels exactly)."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orv_tpu.models.feature_extractors import (
    I3D, InceptionV3Pool3, convert_i3d_state_dict, convert_inception_state_dict,
    fold_bn,
)
from orv_tpu.pipelines.metrics import compute_fid, fid_from_features


def test_fold_bn_math():
    rng = np.random.default_rng(0)
    k = rng.normal(size=(3, 3, 4, 8)).astype(np.float32)
    g, b = rng.normal(size=8).astype(np.float32), rng.normal(size=8).astype(np.float32)
    m, v = rng.normal(size=8).astype(np.float32), rng.uniform(0.5, 2, 8).astype(np.float32)
    x = rng.normal(size=(2, 5, 5, 4)).astype(np.float32)
    kf, bf = fold_bn(k, g, b, m, v, eps=1e-3)
    y_folded = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kf), (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, kf.shape, ("NHWC", "HWIO", "NHWC"))) + bf
    y_conv = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")))
    y_bn = (y_conv - m) / np.sqrt(v + 1e-3) * g + b
    np.testing.assert_allclose(np.asarray(y_folded), np.asarray(y_bn), atol=1e-4)


def _identity_torch_sd(params, nd):
    """flax params -> torch-named state dict with identity BN (var=1-eps so
    folding is exactly the identity). Inverse of the converter's mapping."""
    eps = 1e-3
    sd = {}
    flat = flax.traverse_util.flatten_dict(params["params"])
    for path, leaf in flat.items():
        if path[-1] != "kernel":
            continue
        if path[-2] == "conv":  # ConvBN module
            prefix = ".".join(path[:-2])
            k = np.asarray(leaf)
            O = k.shape[-1]
            perm = (nd + 1, nd) + tuple(range(nd))
            if prefix.startswith(("Conv3d", "Mixed")) and nd == 3:
                sd[f"{prefix}.conv3d.weight"] = k.transpose(perm)
            else:
                sd[f"{prefix}.conv.weight"] = k.transpose(perm)
            bn = f"{prefix}.bn" if nd == 2 else f"{prefix}.bn"
            sd[f"{bn}.weight"] = np.ones(O, np.float32)
            sd[f"{bn}.bias"] = np.zeros(O, np.float32)
            sd[f"{bn}.running_mean"] = np.zeros(O, np.float32)
            sd[f"{bn}.running_var"] = np.full(O, 1.0 - eps, np.float32)
        elif path[-2] == "logits":
            k = np.asarray(leaf)
            sd["logits.conv3d.weight"] = k.transpose(4, 3, 0, 1, 2)
            sd["logits.conv3d.bias"] = np.asarray(flat[path[:-1] + ("bias",)])
    return sd


def test_inception_shapes_and_converter():
    model = InceptionV3Pool3()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 299, 299, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats.shape == (2, 2048)
    assert bool(jnp.isfinite(feats).all())
    # converter roundtrip: identity-BN torch sd folds back to the same params
    sd = _identity_torch_sd(params, nd=2)
    conv = convert_inception_state_dict(sd)
    feats2 = model.apply(conv, x)
    np.testing.assert_allclose(np.asarray(feats2), np.asarray(feats), atol=1e-3)


def test_i3d_shapes_and_converter():
    model = I3D()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 16, 112, 112, 3)),
                    jnp.float32)  # smaller spatial for CPU speed; arch is fully conv
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats.shape == (1, 400)
    assert bool(jnp.isfinite(feats).all())
    sd = _identity_torch_sd(params, nd=3)
    conv = convert_i3d_state_dict(sd)
    feats2 = model.apply(conv, x)
    np.testing.assert_allclose(np.asarray(feats2), np.asarray(feats), atol=1e-3)


def test_frechet_closed_form():
    # two Gaussians with known means/covs: FID = |mu|^2 + tr(S1+S2-2(S1 S2)^1/2)
    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, (4000, 8))
    b = rng.normal(1, 1, (4000, 8)) * 2.0
    fid = fid_from_features(a, b)
    # analytic: mu diff = 2*1 per dim? b has mean 2, std 2 -> |mu|^2 = 8*4 = 32
    # trace term = sum_d (1 + 4 - 2*sqrt(4)) = 8 * 1 = 8 -> total ~40
    assert abs(fid - 40.0) < 4.0


def test_compute_fid_with_custom_extractor():
    rng = np.random.default_rng(3)
    vids_a = [rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32) for _ in range(3)]
    vids_b = [rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32) for _ in range(3)]
    fn = lambda frames: frames.reshape(len(frames), -1)[:, :32]
    fid_same = compute_fid(vids_a, vids_a, features_fn=fn, num_frames=4)
    fid_diff = compute_fid(vids_a, vids_b, features_fn=fn, num_frames=4)
    assert fid_same < 1e-6
    assert fid_diff > fid_same


# ---------------------------------------------------------------------------
# Golden-value drift tests (round-5 VERDICT #7): fixed-seed synthetic
# weights + fixed input -> recorded activations. The FID/FVD extractors
# have no in-environment pretrained weights to validate against
# (scripts/check_real_weights.py --metrics runs the torchvision /
# pytorch-i3d diff the moment weights appear); until then these goldens
# catch silent refactor drift — any pooling/padding/stride change shifts
# every value. Recorded 2026-08-19 (jax 0.7.x CPU); tolerance absorbs
# cross-version conv FP noise, not structural change.
# ---------------------------------------------------------------------------


def test_inception_pool3_golden_activations():
    net = InceptionV3Pool3()
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 96, 3),
                           jnp.float32, -1, 1)
    params = net.init(jax.random.PRNGKey(0), x)
    out = np.asarray(net.apply(params, x))
    assert out.shape == (1, 2048)
    np.testing.assert_allclose(out.mean(), 0.000151, atol=2e-5)
    np.testing.assert_allclose(out.std(), 0.000311, atol=3e-5)
    np.testing.assert_allclose(
        out.reshape(-1)[:8],
        [0.001466, 0.000631, 0.0, 0.0, 0.000999, 0.0, 0.0, 0.001338],
        atol=5e-5)


def test_i3d_golden_activations():
    net = I3D()
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 9, 64, 64, 3),
                           jnp.float32, -1, 1)
    params = net.init(jax.random.PRNGKey(0), x)
    out = np.asarray(net.apply(params, x))
    assert out.shape == (1, 400)
    np.testing.assert_allclose(out.mean(), 0.000251, atol=5e-5)
    np.testing.assert_allclose(out.std(), 0.006101, atol=3e-4)
    np.testing.assert_allclose(
        out.reshape(-1)[:8],
        [-0.000259, -0.011148, -0.001247, 0.005969, 0.001787, -0.004675,
         0.003396, -0.003201],
        atol=3e-4)

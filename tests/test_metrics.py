"""Metric harness tests."""

import numpy as np
import pytest

from orv_tpu.pipelines.metrics import (
    center_crop_resize, compute_fid, fid_from_features, frechet_distance,
    gaussian_stats, psnr, ssim, video_psnr_ssim,
)


def test_psnr_identity_and_known_value():
    a = np.random.default_rng(0).uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert psnr(a, a) == float("inf")
    b = np.clip(a + 0.1, 0, 1)
    mse = np.mean((a.astype(np.float64) - b) ** 2)
    assert abs(psnr(a, b) - 10 * np.log10(1.0 / mse)) < 1e-9


def test_ssim_identity():
    a = np.random.default_rng(1).uniform(0, 1, (64, 64, 3)).astype(np.float64)
    assert ssim(a, a) == pytest.approx(1.0)
    assert ssim(a, np.clip(a + 0.3, 0, 1)) < 0.9


def test_video_metrics_resize_path():
    rng = np.random.default_rng(2)
    gt = rng.uniform(0, 1, (4, 48, 64, 3)).astype(np.float32)
    ps, ss = video_psnr_ssim(gt, gt)
    assert ps == float("inf") and ss == pytest.approx(1.0)
    ps2, ss2 = video_psnr_ssim(np.clip(gt + 0.05, 0, 1), gt)
    assert 20 < ps2 < 40 and ss2 < 1.0


def test_frechet_distance_properties():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2000, 8))
    y = rng.normal(loc=1.0, size=(2000, 8))
    same = fid_from_features(x, x)
    diff = fid_from_features(x, y)
    assert same == pytest.approx(0.0, abs=1e-6)
    # mean shift of 1 in 8 dims -> FD ~ ||diff||^2 = 8
    assert 6 < diff < 10


def test_center_crop_resize():
    v = np.random.default_rng(4).uniform(0, 1, (3, 100, 160, 3)).astype(np.float32)
    out = center_crop_resize(v, 64)
    assert out.shape == (3, 64, 64, 3)


def test_fid_requires_extractor():
    with pytest.raises(RuntimeError, match="feature extractor"):
        compute_fid([np.zeros((16, 8, 8, 3))], [np.zeros((16, 8, 8, 3))])


def test_fid_with_plugged_extractor():
    rng = np.random.default_rng(5)
    real = [rng.uniform(0, 1, (16, 16, 16, 3)).astype(np.float32) for _ in range(4)]
    fake = [np.clip(v + 0.2, 0, 1) for v in real]
    feat = lambda frames: frames.reshape(frames.shape[0], -1)[:, :32]
    assert compute_fid(real, real, features_fn=feat) == pytest.approx(0.0, abs=1e-6)
    assert compute_fid(real, fake, features_fn=feat) > 0.01

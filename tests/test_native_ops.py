"""Native C++ ops vs numpy references."""

import math

import numpy as np
import pytest

from orv_tpu.ops.voxelize import voxelization, voxelization_np

VS = (0.05, 0.05, 0.1)
CR = (0.0, -2.0, -1.0, 4.0, 2.0, 3.0)


@pytest.fixture(scope="module")
def points():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 5, size=(5000, 4)).astype(np.float32)  # xyz + 1 feature
    return pts


def test_dynamic_voxelize_parity(points):
    c_native = voxelization(points, VS, CR, max_points=-1)
    c_np = voxelization_np(points, VS, CR, max_points=-1)
    np.testing.assert_array_equal(c_native, c_np)
    # out-of-range points are -1
    out = points[:, 0] < 0
    assert np.all(c_native[out] == -1)


def test_hard_voxelize_parity(points):
    v1, c1, n1 = voxelization(points, VS, CR, max_points=8, max_voxels=2000)
    v2, c2, n2 = voxelization_np(points, VS, CR, max_points=8, max_voxels=2000)
    assert v1.shape == v2.shape
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_allclose(v1, v2)


def test_hard_voxelize_respects_limits(points):
    v, c, n = voxelization(points, VS, CR, max_points=2, max_voxels=50)
    assert v.shape[0] <= 50
    assert n.max() <= 2
    # coors are (z, y, x) within grid bounds
    grid = np.round((np.array(CR[3:]) - np.array(CR[:3])) / np.array(VS)).astype(int)
    assert np.all(c[:, 0] < grid[2]) and np.all(c[:, 1] < grid[1]) and np.all(c[:, 2] < grid[0])


def test_voxel_coords_roundtrip():
    # a single point lands in the exact voxel containing it
    pt = np.array([[0.26, 0.01, 0.55]], dtype=np.float32)
    coors = voxelization(pt, VS, CR, max_points=-1)
    x = int((0.26 - CR[0]) / VS[0])
    y = int((0.01 - CR[1]) / VS[1])
    z = int((0.55 - CR[2]) / VS[2])
    np.testing.assert_array_equal(coors[0], [z, y, x])


# ---------------------------------------------------------------------------
# rasterizer
# ---------------------------------------------------------------------------

def _scene(n=30, seed=0):
    from orv_tpu.ops.gaussian_raster import GaussianRasterizationSettings

    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.3, 0.3, (n, 3))
    means[:, 2] += 2.0  # in front of the camera
    colors = rng.uniform(0, 1, (n, 3))
    feats = rng.uniform(0, 1, (n, 12))
    opac = rng.uniform(0.4, 1.0, n)
    scales = np.full((n, 3), 0.05)
    rots = np.zeros((n, 4))
    rots[:, 0] = 1.0
    H = W = 16
    f = 20.0
    view = np.eye(4)
    from orv_tpu.ops.gaussian_raster import get_projection_matrix_from_intrinsics

    proj = get_projection_matrix_from_intrinsics(f, f, W / 2, H / 2, W, H)
    settings = GaussianRasterizationSettings(
        image_height=H, image_width=W,
        tanfovx=W / (2 * f), tanfovy=H / (2 * f),
        bg=np.array([0.1, 0.2, 0.3], np.float32), scale_modifier=1.0,
        viewmatrix=view, projmatrix=proj @ view,
    )
    return settings, means, colors, feats, opac, scales, rots


def test_rasterizer_parity_single_tile():
    from orv_tpu.ops.gaussian_raster import rasterize, rasterize_np

    settings, means, colors, feats, opac, scales, rots = _scene()
    c1, f1, radii, d1, a1 = rasterize(settings, means, colors, opac, scales, rots, feats)
    c2, f2, _, d2, a2 = rasterize_np(settings, means, colors, opac, scales, rots, feats)
    np.testing.assert_allclose(c1, c2, atol=2e-4)
    np.testing.assert_allclose(f1, f2, atol=2e-4)
    np.testing.assert_allclose(d1, d2, atol=2e-3)
    np.testing.assert_allclose(a1, a2, atol=2e-4)
    assert radii.max() > 0


def test_rasterizer_background_and_empty():
    from orv_tpu.ops.gaussian_raster import rasterize

    settings, means, colors, feats, opac, scales, rots = _scene(n=3)
    means[:, 2] = -5.0  # all behind the camera -> culled
    c, f, radii, d, a = rasterize(settings, means, colors, opac, scales, rots, feats)
    np.testing.assert_allclose(c[0], 0.1, atol=1e-6)
    np.testing.assert_allclose(c[2], 0.3, atol=1e-6)
    np.testing.assert_array_equal(a, 0.0)
    np.testing.assert_array_equal(radii, 0)


def test_render_occupancy_view_api():
    from orv_tpu.ops.gaussian_raster import render_occupancy_view

    rng = np.random.default_rng(1)
    n = 50
    pts = rng.uniform(-0.1, 0.1, (n, 3))
    pts[:, 2] += 0.3
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
    out = render_occupancy_view(
        np.eye(4), K, (48, 64), pts, rng.uniform(0, 1, (n, 3)),
        rng.uniform(0, 1, (n, 12)), np.tile([1, 0, 0, 0.0], (n, 1)),
        np.full((n, 3), 0.01), np.ones(n),
    )
    assert out["render_color"].shape == (3, 48, 64)
    assert out["render_feat"].shape == (12, 48, 64)
    assert out["render_depth"].shape == (48, 64)
    assert out["render_alpha"].max() > 0.5  # something rendered
    # depth where alpha is high should be ~0.3 (expected depth ~ alpha * z)
    m = out["render_alpha"] > 0.9
    assert m.any()
    d = out["render_depth"][m] / out["render_alpha"][m]
    assert abs(float(np.median(d)) - 0.3) < 0.1


class TestRasterizerBackward:
    """Analytic backward vs central finite differences on a tiny scene."""

    def _scene(self):
        rng = np.random.default_rng(7)
        n = 6
        means = np.stack([
            rng.uniform(-0.06, 0.06, n), rng.uniform(-0.06, 0.06, n),
            rng.uniform(0.28, 0.42, n),
        ], 1).astype(np.float32)
        colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
        feats = rng.uniform(0, 1, (n, 12)).astype(np.float32)
        opac = rng.uniform(0.3, 0.8, n).astype(np.float32)
        scales = rng.uniform(0.01, 0.03, (n, 3)).astype(np.float32)
        rots = rng.normal(size=(n, 4)).astype(np.float32)
        rots /= np.linalg.norm(rots, axis=1, keepdims=True)
        H, W = 24, 32
        fx = fy = 40.0
        from orv_tpu.ops.gaussian_raster import (
            GaussianRasterizationSettings, focal2fov,
            get_projection_matrix_from_intrinsics,
        )
        import math
        w2c = np.eye(4)
        proj = get_projection_matrix_from_intrinsics(fx, fy, W / 2, H / 2, W, H)
        settings = GaussianRasterizationSettings(
            image_height=H, image_width=W,
            tanfovx=math.tan(focal2fov(fx, W) * 0.5),
            tanfovy=math.tan(focal2fov(fy, H) * 0.5),
            bg=np.array([0.2, 0.1, 0.3], np.float32), scale_modifier=1.0,
            viewmatrix=w2c, projmatrix=proj @ w2c,
        )
        return settings, means, colors, opac, scales, rots, feats

    def _loss_and_grads(self, settings, means, colors, opac, scales, rots, feats):
        """Scalar loss = fixed random projections of all four outputs."""
        from orv_tpu.ops.gaussian_raster import rasterize, rasterize_backward

        rng = np.random.default_rng(11)
        H, W = settings.image_height, settings.image_width
        wc = rng.normal(size=(3, H, W)).astype(np.float32)
        wf = rng.normal(size=(12, H, W)).astype(np.float32)
        wd = rng.normal(size=(H, W)).astype(np.float32)
        wa = rng.normal(size=(H, W)).astype(np.float32)

        def loss(m=means, c=colors, o=opac, s=scales, r=rots, f=feats):
            col, feat, _, dep, alp = rasterize(settings, m, c, o, s, r, f)
            return float((col * wc).sum() + (feat * wf).sum()
                         + (dep * wd).sum() + (alp * wa).sum())

        grads = rasterize_backward(settings, means, colors, opac, scales, rots,
                                   grad_color=wc, grad_depth=wd, grad_alpha=wa,
                                   features=feats, grad_feature=wf)
        return loss, grads

    def _fd(self, loss, arr, eps):
        num = np.zeros_like(arr, dtype=np.float64)
        it = np.nditer(arr, flags=["multi_index"])
        while not it.finished:
            i = it.multi_index
            orig = arr[i]
            arr[i] = orig + eps
            lp = loss()
            arr[i] = orig - eps
            lm = loss()
            arr[i] = orig
            num[i] = (lp - lm) / (2 * eps)
            it.iternext()
        return num

    def _check(self, loss, analytic, arr, name, eps=2e-4, rtol=0.08):
        """Central differences at two step sizes; elements where the two FD
        estimates disagree sit on the rasterizer's discrete boundaries
        (pixel rects, 1/255 alpha cutoff, T break — non-differentiable in
        the CUDA fork too) and are excluded. The analytic gradient must
        match the stable elements."""
        num1 = self._fd(loss, arr, eps)
        num2 = self._fd(loss, arr, 2 * eps)
        scale = np.maximum(np.abs(num1), np.maximum(np.abs(num2), 1.0))
        stable = np.abs(num1 - num2) < 0.03 * scale
        assert stable.mean() >= 0.5, f"{name}: too few FD-stable elements"
        err = np.abs(analytic - num1)
        tol = rtol * scale + 0.05 * max(float(np.abs(num1).max()), 1.0)
        bad = (err > tol) & stable
        assert not bad.any(), (
            f"{name}: analytic/numeric mismatch at {np.argwhere(bad)[:4]}: "
            f"analytic {analytic[bad][:4]} vs numeric {num1[bad][:4]}"
        )

    def test_color_feature_opacity_grads(self):
        settings, means, colors, opac, scales, rots, feats = self._scene()
        loss, grads = self._loss_and_grads(settings, means, colors, opac, scales, rots, feats)
        self._check(loss, grads["colors"], colors, "colors")
        self._check(loss, grads["features"], feats, "features")
        self._check(loss, grads["opacities"], opac, "opacities")

    def test_geometry_grads(self):
        settings, means, colors, opac, scales, rots, feats = self._scene()
        loss, grads = self._loss_and_grads(settings, means, colors, opac, scales, rots, feats)
        self._check(loss, grads["means3d"], means, "means3d", eps=5e-5)
        # scales sit closest to the discrete ceil(3*sigma) radius — smaller
        # step keeps more elements on the smooth side
        self._check(loss, grads["scales"], scales, "scales", eps=2e-5)
        self._check(loss, grads["rotations"], rots, "rotations", eps=5e-5)

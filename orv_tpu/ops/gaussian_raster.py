"""Gaussian splat rasterizer — native C++ forward + backward + numpy ref.

API mirrors the reference fork's surface
(diff_gaussian_rasterization/__init__.py:184-236): a settings dataclass +
`rasterize(...)` returning (color, feature, radii, depth, alpha), and
`rasterize_backward(...)` returning gradients w.r.t. every gaussian input
(the reference fork's backward.cu capability — ORV's own data-factory path
never uses it, gs_render.py discards gradients, but the component is part
of the inventory). Semantics notes:

  * depth output is the alpha-weighted expected view-space depth
  * 12 semantic feature channels (reference config.h NUM_CHANNELS_language_feature)
  * EWA projection with the standard 0.3 low-pass and 3-sigma tile extent
  * backward covers blend -> (conic, means2D) -> EWA -> cov3D ->
    (quaternion, scale, means3D); discrete choices (radius, tile extent,
    the 0.99 alpha clamp, culling) are non-differentiable as in the CUDA fork
"""

from __future__ import annotations

import ctypes
import dataclasses
import math
from typing import Optional, Sequence, Tuple

import numpy as np

NUM_FEATURE_CHANNELS = 12

_lib = None


def _native():
    global _lib
    if _lib is None:
        from orv_tpu.ops.native import load_native

        _lib = load_native("gaussian_raster")
    return _lib


@dataclasses.dataclass
class GaussianRasterizationSettings:
    image_height: int
    image_width: int
    tanfovx: float
    tanfovy: float
    bg: np.ndarray  # [3]
    scale_modifier: float
    viewmatrix: np.ndarray  # [4,4] world->camera (row-major)
    projmatrix: np.ndarray  # [4,4] world->clip (view @ proj, row-major)
    sh_degree: int = 3
    campos: Optional[np.ndarray] = None
    prefiltered: bool = False
    debug: bool = False
    include_feature: bool = True


def rasterize(
    settings: GaussianRasterizationSettings,
    means3d: np.ndarray,  # [N, 3]
    colors: np.ndarray,  # [N, 3]
    opacities: np.ndarray,  # [N] or [N, 1]
    scales: np.ndarray,  # [N, 3]
    rotations: np.ndarray,  # [N, 4] (w, x, y, z)
    features: Optional[np.ndarray] = None,  # [N, 12]
):
    """-> (color [3,H,W], feature [12,H,W], radii [N], depth [H,W], alpha [H,W])."""
    n = means3d.shape[0]
    H, W = settings.image_height, settings.image_width
    f32 = lambda x: np.ascontiguousarray(x, dtype=np.float32)
    means3d, colors = f32(means3d), f32(colors)
    opacities = f32(opacities).reshape(-1)
    scales, rotations = f32(scales), f32(rotations)
    feats = f32(features) if features is not None else None
    view = f32(settings.viewmatrix).reshape(16)
    proj = f32(settings.projmatrix).reshape(16)
    bg = f32(settings.bg).reshape(3)

    out_color = np.zeros((3, H, W), dtype=np.float32)
    out_feature = np.zeros((NUM_FEATURE_CHANNELS, H, W), dtype=np.float32)
    out_depth = np.zeros((H, W), dtype=np.float32)
    out_alpha = np.zeros((H, W), dtype=np.float32)
    radii = np.zeros((n,), dtype=np.int32)

    cptr = lambda a: a.ctypes.data_as(ctypes.c_void_p) if a is not None else None
    _native().rasterize_gaussians(
        cptr(means3d), cptr(colors), cptr(feats), cptr(opacities), cptr(scales),
        cptr(rotations), ctypes.c_int(n), cptr(view), cptr(proj), cptr(bg),
        ctypes.c_float(settings.tanfovx), ctypes.c_float(settings.tanfovy),
        ctypes.c_int(H), ctypes.c_int(W), ctypes.c_float(settings.scale_modifier),
        cptr(out_color), cptr(out_feature), cptr(out_depth), cptr(out_alpha),
        cptr(radii),
    )
    return out_color, out_feature, radii, out_depth, out_alpha


def rasterize_backward(
    settings: GaussianRasterizationSettings,
    means3d: np.ndarray,
    colors: np.ndarray,
    opacities: np.ndarray,
    scales: np.ndarray,
    rotations: np.ndarray,
    grad_color: np.ndarray,  # [3, H, W]
    grad_depth: Optional[np.ndarray] = None,  # [H, W]
    grad_alpha: Optional[np.ndarray] = None,  # [H, W]
    features: Optional[np.ndarray] = None,  # [N, 12]
    grad_feature: Optional[np.ndarray] = None,  # [12, H, W]
):
    """-> dict of gradients {means3d [N,3], colors [N,3], features [N,12],
    opacities [N], scales [N,3], rotations [N,4]}."""
    n = means3d.shape[0]
    H, W = settings.image_height, settings.image_width
    f32 = lambda x: np.ascontiguousarray(x, dtype=np.float32)
    means3d, colors = f32(means3d), f32(colors)
    opacities = f32(opacities).reshape(-1)
    scales, rotations = f32(scales), f32(rotations)
    feats = f32(features) if features is not None else None
    gfeat = f32(grad_feature) if grad_feature is not None else None
    view = f32(settings.viewmatrix).reshape(16)
    proj = f32(settings.projmatrix).reshape(16)
    bg = f32(settings.bg).reshape(3)
    gc = f32(grad_color)
    gd = f32(grad_depth) if grad_depth is not None else np.zeros((H, W), np.float32)
    ga = f32(grad_alpha) if grad_alpha is not None else np.zeros((H, W), np.float32)

    g_means = np.zeros((n, 3), np.float32)
    g_colors = np.zeros((n, 3), np.float32)
    g_feats = np.zeros((n, NUM_FEATURE_CHANNELS), np.float32)
    g_opac = np.zeros((n,), np.float32)
    g_scales = np.zeros((n, 3), np.float32)
    g_rots = np.zeros((n, 4), np.float32)

    cptr = lambda a: a.ctypes.data_as(ctypes.c_void_p) if a is not None else None
    _native().rasterize_gaussians_backward(
        cptr(means3d), cptr(colors), cptr(feats), cptr(opacities), cptr(scales),
        cptr(rotations), ctypes.c_int(n), cptr(view), cptr(proj), cptr(bg),
        ctypes.c_float(settings.tanfovx), ctypes.c_float(settings.tanfovy),
        ctypes.c_int(H), ctypes.c_int(W), ctypes.c_float(settings.scale_modifier),
        cptr(gc), cptr(gfeat), cptr(gd), cptr(ga),
        cptr(g_means), cptr(g_colors), cptr(g_feats), cptr(g_opac),
        cptr(g_scales), cptr(g_rots),
    )
    return dict(means3d=g_means, colors=g_colors, features=g_feats,
                opacities=g_opac, scales=g_scales, rotations=g_rots)


# ---------------------------------------------------------------------------
# camera helpers (reference gs_render.py:97-221 semantics)
# ---------------------------------------------------------------------------

def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def get_projection_matrix_from_intrinsics(
    fx: float, fy: float, cx: float, cy: float, width: int, height: int,
    near: float = 0.1, far: float = 200.0,
) -> np.ndarray:
    """OpenGL-style projection from pinhole intrinsics (row-major, not
    transposed — our rasterizer takes row-major matrices directly)."""
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = 2 * fx / width
    P[1, 1] = 2 * fy / height
    P[0, 2] = 2 * (cx / width) - 1
    P[1, 2] = 2 * (cy / height) - 1
    P[2, 2] = far / (far - near)
    P[2, 3] = -(far * near) / (far - near)
    P[3, 2] = 1.0
    return P


def render_occupancy_view(
    extrinsics: np.ndarray,  # [4,4] camera->world
    intrinsics: np.ndarray,  # [3,3]
    image_shape: Tuple[int, int],
    pts_xyz: np.ndarray,
    pts_rgb: np.ndarray,
    feat: np.ndarray,
    rotations: np.ndarray,
    scales: np.ndarray,
    opacity: np.ndarray,
    bg_color: Sequence[float] = (0, 0, 0),
):
    """One occupancy condition-map render (reference gs_render.render)."""
    height, width = image_shape
    fx, fy = float(intrinsics[0][0]), float(intrinsics[1][1])
    cx, cy = float(intrinsics[0][2]), float(intrinsics[1][2])
    w2c = np.linalg.inv(np.asarray(extrinsics, dtype=np.float64))
    proj = get_projection_matrix_from_intrinsics(fx, fy, cx, cy, width, height)
    settings = GaussianRasterizationSettings(
        image_height=height, image_width=width,
        tanfovx=math.tan(focal2fov(fx, width) * 0.5),
        tanfovy=math.tan(focal2fov(fy, height) * 0.5),
        bg=np.asarray(bg_color, dtype=np.float32), scale_modifier=1.0,
        viewmatrix=w2c, projmatrix=proj @ w2c,
    )
    color, feature, radii, depth, alpha = rasterize(
        settings, pts_xyz, pts_rgb, opacity, scales, rotations, feat
    )
    return dict(render_color=color, render_feat=feature, radii=radii,
                render_depth=depth, render_alpha=alpha)


# ---------------------------------------------------------------------------
# numpy reference (tiny scenes only; O(N * H * W))
# ---------------------------------------------------------------------------

def rasterize_np(settings, means3d, colors, opacities, scales, rotations, features=None):
    H, W = settings.image_height, settings.image_width
    V = np.asarray(settings.viewmatrix, dtype=np.float64)
    P = np.asarray(settings.projmatrix, dtype=np.float64)
    n = means3d.shape[0]
    fx = W / (2 * settings.tanfovx)
    fy = H / (2 * settings.tanfovy)

    splats = []
    for i in range(n):
        p = np.append(means3d[i], 1.0)
        t = V @ p
        if t[2] < 0.2:
            continue
        c = P @ p
        ndc = c[:2] / (c[3] + 1e-7)
        pix = ((ndc + 1) * np.array([W, H]) - 1) * 0.5
        q = rotations[i] / (np.linalg.norm(rotations[i]) + 1e-12)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        M = R * (scales[i] * settings.scale_modifier)[None, :]
        S = M @ M.T
        limx, limy = 1.3 * settings.tanfovx, 1.3 * settings.tanfovy
        ctx = np.clip(t[0] / t[2], -limx, limx) * t[2]
        cty = np.clip(t[1] / t[2], -limy, limy) * t[2]
        J = np.array([[fx / t[2], 0, -(fx * ctx) / t[2] ** 2],
                      [0, fy / t[2], -(fy * cty) / t[2] ** 2]])
        Wm = V[:3, :3]
        cov2 = J @ Wm @ S @ Wm.T @ J.T + np.eye(2) * 0.3
        det = np.linalg.det(cov2)
        if det <= 0:
            continue
        conic = np.linalg.inv(cov2)
        mid = 0.5 * np.trace(cov2)
        lam = mid + math.sqrt(max(0.1, mid * mid - det))
        radius = math.ceil(3 * math.sqrt(lam))
        splats.append((t[2], pix, conic, radius, i))
    splats.sort(key=lambda s: s[0])

    nf = NUM_FEATURE_CHANNELS
    out_c = np.zeros((3, H, W))
    out_f = np.zeros((nf, H, W))
    out_d = np.zeros((H, W))
    out_a = np.zeros((H, W))
    for yy in range(H):
        for xx in range(W):
            T = 1.0
            for tz, pix, conic, radius, i in splats:
                d = pix - np.array([xx, yy])
                power = -0.5 * (conic[0, 0] * d[0] ** 2 + conic[1, 1] * d[1] ** 2) \
                    - conic[0, 1] * d[0] * d[1]
                if power > 0:
                    continue
                alpha = min(0.99, float(opacities.reshape(-1)[i]) * math.exp(power))
                if alpha < 1 / 255:
                    continue
                wgt = alpha * T
                out_c[:, yy, xx] += wgt * colors[i]
                if features is not None:
                    out_f[:, yy, xx] += wgt * features[i]
                out_d[yy, xx] += wgt * tz
                T *= 1 - alpha
                if T < 1e-4:
                    break
            out_c[:, yy, xx] += T * np.asarray(settings.bg)
            out_a[yy, xx] = 1 - T
    return out_c, out_f, None, out_d, out_a

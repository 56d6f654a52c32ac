"""Voxelization op — native C++ fast path + numpy reference.

API mirrors the reference wrapper (orv/ops/voxelize/voxelization.py:42-122):
voxelization(points, voxel_size, coors_range, max_points, max_voxels)
-> (voxels, coors(z,y,x), num_points_per_voxel) truncated to the filled
voxel count; max_points == -1 switches to dynamic mode (per-point coords).
Deterministic (input-order) semantics — the reference's deterministic=True.
"""

from __future__ import annotations

import ctypes
from typing import Sequence, Tuple, Union

import numpy as np

_lib = None


def _native():
    global _lib
    if _lib is None:
        from orv_tpu.ops.native import load_native

        _lib = load_native("voxelize")
        _lib.hard_voxelize.restype = ctypes.c_int
    return _lib


def _as_f32(x):
    return np.ascontiguousarray(x, dtype=np.float32)


def voxelization(
    points: np.ndarray,
    voxel_size: Sequence[float],
    coors_range: Sequence[float],
    max_points: int = 35,
    max_voxels: int = 20000,
):
    """points [N, F>=3] -> see module docstring."""
    points = _as_f32(points)
    vs = _as_f32(voxel_size)
    cr = _as_f32(coors_range)
    n, nf = points.shape
    lib = _native()
    if max_points == -1:
        coors = np.empty((n, 3), dtype=np.int32)
        lib.dynamic_voxelize(
            points.ctypes.data_as(ctypes.c_void_p), coors.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int(n), ctypes.c_int(nf),
            vs.ctypes.data_as(ctypes.c_void_p), cr.ctypes.data_as(ctypes.c_void_p),
        )
        return coors
    voxels = np.zeros((max_voxels, max_points, nf), dtype=np.float32)
    coors = np.zeros((max_voxels, 3), dtype=np.int32)
    nppv = np.zeros((max_voxels,), dtype=np.int32)
    voxel_num = lib.hard_voxelize(
        points.ctypes.data_as(ctypes.c_void_p), voxels.ctypes.data_as(ctypes.c_void_p),
        coors.ctypes.data_as(ctypes.c_void_p), nppv.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(n), ctypes.c_int(nf),
        vs.ctypes.data_as(ctypes.c_void_p), cr.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(max_points), ctypes.c_int(max_voxels),
    )
    return voxels[:voxel_num], coors[:voxel_num], nppv[:voxel_num]


def voxelization_np(
    points: np.ndarray,
    voxel_size: Sequence[float],
    coors_range: Sequence[float],
    max_points: int = 35,
    max_voxels: int = 20000,
):
    """Pure-numpy reference with identical semantics (parity tests)."""
    points = _as_f32(points)
    vs = np.asarray(voxel_size, dtype=np.float64)
    cr = np.asarray(coors_range, dtype=np.float64)
    grid = np.round((cr[3:] - cr[:3]) / vs).astype(np.int64)
    c = np.floor((points[:, :3].astype(np.float64) - cr[:3]) / vs).astype(np.int64)
    ok = np.all((c >= 0) & (c < grid), axis=1)
    coors_pp = np.where(ok[:, None], c[:, ::-1], -1).astype(np.int32)  # (z, y, x)
    if max_points == -1:
        return coors_pp

    nf = points.shape[1]
    voxels = np.zeros((max_voxels, max_points, nf), dtype=np.float32)
    coors = np.zeros((max_voxels, 3), dtype=np.int32)
    nppv = np.zeros((max_voxels,), dtype=np.int32)
    vox_of = {}
    voxel_num = 0
    for i in np.nonzero(ok)[0]:
        key = tuple(coors_pp[i])
        vid = vox_of.get(key, -1)
        if vid == -1:
            if voxel_num >= max_voxels:
                continue
            vid = voxel_num
            voxel_num += 1
            vox_of[key] = vid
            coors[vid] = coors_pp[i]
        if nppv[vid] < max_points:
            voxels[vid, nppv[vid]] = points[i]
            nppv[vid] += 1
    return voxels[:voxel_num], coors[:voxel_num], nppv[:voxel_num]

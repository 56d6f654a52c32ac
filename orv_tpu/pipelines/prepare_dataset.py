"""4D occupancy data factory (reference prepare_dataset.py, re-designed).

Stages (reference --action surface preserved):

  reconstruction  raw video -> per-frame point clouds -> filtered dense
                  points -> labeled occupancy grid (voxel top-label vote)
  cameras         multiview camera estimation + monocular/metric depth
                  scale alignment
  labeling        per-episode object captions -> canonical label vocab
                  (embedding clustering) -> mask tracks
  render          occupancy -> isotropic gaussians -> per-frame depth +
                  semantic condition maps (.npz consumed by encode_dataset)

Third-party perception models (MonST3R, VGGT, NKSR, GroundingDINO, SAM2,
QwenVL) are external checkpoints the reference shells out to; here they
are pluggable `Backend` callables registered by name — the framework owns
everything downstream of their outputs (filtering, voxel fusion, label
voting, depth alignment, splat rendering, the restartable stage pipeline).
Every stage is skip-if-exists idempotent and runs in its own process with
queues between stages and SIGTERM partial-output cleanup (reference
reconstruction_multi_task :2243-2376).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import signal
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from orv_tpu.ops.voxelize import voxelization
from orv_tpu.utils.logging import CONSOLE

# reference occupancy volume: [-0.2,-0.2,0] .. [0.2,0.2,0.4] @ 1mm voxels
POINT_CLOUD_RANGE = (-0.2, -0.2, 0.0, 0.2, 0.2, 0.4)
VOXEL_SIZE = (0.001, 0.001, 0.001)
NUM_SEMANTIC_CHANNELS = 12
DEPTH_CLAMP = (0.01, 0.4)  # reference render depth clamp


# ---------------------------------------------------------------------------
# pluggable perception backends
# ---------------------------------------------------------------------------

_BACKENDS: Dict[str, Callable] = {}


def register_backend(name: str):
    def deco(fn):
        _BACKENDS[name] = fn
        return fn
    return deco


def get_backend(name: str) -> Callable:
    if name not in _BACKENDS:
        raise KeyError(
            f"perception backend '{name}' is not registered. Available: "
            f"{sorted(_BACKENDS)}. External models (MonST3R/VGGT/SAM2/...) "
            f"plug in via orv_tpu.pipelines.prepare_dataset.register_backend."
        )
    return _BACKENDS[name]


@register_backend("depth_unproject")
def depth_unproject_backend(episode_dir: str) -> Dict[str, np.ndarray]:
    """Built-in reconstruction backend for episodes that ship depth maps:
    {episode_dir}/depth/*.npy [H,W] metric + intrinsics.json + poses.npy
    [F,4,4] cam->world -> per-frame world-space points."""
    ep = Path(episode_dir)
    K = np.asarray(json.loads((ep / "intrinsics.json").read_text())["K"])
    poses = np.load(ep / "poses.npy")
    depth_files = sorted((ep / "depth").glob("*.npy"))
    pts_per_frame = []
    for i, df in enumerate(depth_files):
        d = np.load(df)
        H, W = d.shape
        v, u = np.mgrid[0:H, 0:W]
        z = d.reshape(-1)
        ok = z > 0
        x = (u.reshape(-1) - K[0, 2]) / K[0, 0] * z
        y = (v.reshape(-1) - K[1, 2]) / K[1, 1] * z
        cam = np.stack([x, y, z, np.ones_like(z)], 1)[ok]
        world = (poses[i] @ cam.T).T[:, :3]
        pts_per_frame.append(world.astype(np.float32))
    return {"points": pts_per_frame, "poses": poses, "intrinsics": K}


# ---------------------------------------------------------------------------
# geometry utilities (fully owned, no external deps)
# ---------------------------------------------------------------------------

def statistical_outlier_removal(points: np.ndarray, k: int = 16,
                                std_ratio: float = 2.0) -> np.ndarray:
    """Drop points whose mean k-NN distance exceeds mean + std_ratio*std
    (reference uses open3d's filter before NKSR; same algorithm)."""
    from scipy.spatial import cKDTree

    if len(points) <= k + 1:
        return points
    tree = cKDTree(points)
    d, _ = tree.query(points, k=k + 1)
    mean_d = d[:, 1:].mean(axis=1)
    thr = mean_d.mean() + std_ratio * mean_d.std()
    return points[mean_d < thr]


def align_depth_scale(mono_depth: np.ndarray, metric_points: np.ndarray,
                      mask: Optional[np.ndarray] = None) -> float:
    """Least-squares scale between a monocular depth map and metric values:
    scale = sum(m*p*t) / sum(m*p^2) (reference :1801-2020 alignment)."""
    m = np.ones_like(mono_depth, dtype=bool) if mask is None else mask.astype(bool)
    p = mono_depth[m].astype(np.float64)
    t = metric_points[m].astype(np.float64)
    denom = float((p * p).sum())
    return float((p * t).sum() / denom) if denom > 0 else 1.0


def points_to_voxels(
    points: np.ndarray,  # [N, 3]
    labels: np.ndarray,  # [N] int
    point_cloud_range=POINT_CLOUD_RANGE,
    voxel_size=VOXEL_SIZE,
    max_points: int = 16,
    max_voxels: int = 2_000_000,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (coors [M,3] zyx, voxel_labels [M]) with the reference's
    top-label majority vote per voxel (prepare_dataset.py:137-198)."""
    cloud = np.concatenate([points.astype(np.float32),
                            labels.astype(np.float32)[:, None]], 1)
    voxels, coors, nppv = voxelization(cloud, voxel_size, point_cloud_range,
                                       max_points=max_points, max_voxels=max_voxels)
    M = len(coors)
    out = np.zeros(M, dtype=np.int32)
    for i in range(M):
        lab = voxels[i, : nppv[i], 3].astype(np.int64)
        out[i] = np.bincount(lab).argmax()
    return coors, out


def occupancy_from_frames(
    frame_points: Sequence[np.ndarray],
    frame_labels: Sequence[np.ndarray],
    **kwargs,
) -> List[Dict[str, np.ndarray]]:
    """Per-frame labeled occupancy (the 4D sequence)."""
    out = []
    for pts, labs in zip(frame_points, frame_labels):
        coors, vl = points_to_voxels(pts, labs, **kwargs)
        out.append({"coors": coors, "labels": vl})
    return out


# ---------------------------------------------------------------------------
# render stage (fully owned — uses the native rasterizer)
# ---------------------------------------------------------------------------

def occupancy_to_gaussians(coors: np.ndarray, labels: np.ndarray,
                           point_cloud_range=POINT_CLOUD_RANGE,
                           voxel_size=VOXEL_SIZE,
                           base_scale: float = 0.00023,
                           exp_scale: float = 3.7):
    """Voxel centers -> isotropic gaussians with depth-bin-scaled radii
    (reference get_render :2063-2077: scale = base*(bin^3.7) over z bins)."""
    lo = np.asarray(point_cloud_range[:3])
    vs = np.asarray(voxel_size)
    grid_z = int(round((point_cloud_range[5] - point_cloud_range[2]) / vs[2]))
    centers = np.stack([
        lo[0] + (coors[:, 2] + 0.5) * vs[0],
        lo[1] + (coors[:, 1] + 0.5) * vs[1],
        lo[2] + (coors[:, 0] + 0.5) * vs[2],
    ], 1).astype(np.float32)
    zbin = coors[:, 0].astype(np.float64) + 1
    zbin = (zbin - 1) / max(grid_z - 1, 1) + 1  # normalize to [1, 2]
    scales = (base_scale * zbin**exp_scale).astype(np.float32)
    n = len(centers)
    feat = np.zeros((n, NUM_SEMANTIC_CHANNELS), np.float32)
    feat[np.arange(n), np.clip(labels, 0, NUM_SEMANTIC_CHANNELS - 1)] = 1.0
    rot = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    return centers, feat, rot, np.repeat(scales[:, None], 3, 1), np.ones(n, np.float32)


def render_episode(
    occupancy: Sequence[Dict[str, np.ndarray]],
    extrinsics: Sequence[np.ndarray],  # per view cam->world [4,4]
    intrinsics: Sequence[np.ndarray],  # per view [3,3]
    image_shape: Tuple[int, int],
    out_path: Optional[str] = None,
    alpha_threshold: float = 0.1,
) -> Dict[str, np.ndarray]:
    """Occupancy sequence -> {semantics uint8 [F,V,H,W], depths f32
    [F,V,H,W], is_labeled} (reference get_render output, :2228-2235).
    Depth clamped to [0.01, 0.4]; alpha<0.1 -> background label/0 depth."""
    from orv_tpu.ops.gaussian_raster import render_occupancy_view

    F, V = len(occupancy), len(extrinsics)
    H, W = image_shape
    semantics = np.zeros((F, V, H, W), np.uint8)
    depths = np.zeros((F, V, H, W), np.float32)
    for f, occ in enumerate(occupancy):
        centers, feat, rot, scales, opac = occupancy_to_gaussians(
            occ["coors"], occ["labels"])
        rgb = np.zeros((len(centers), 3), np.float32)
        for v in range(V):
            out = render_occupancy_view(
                extrinsics[v], intrinsics[v], image_shape,
                centers, rgb, feat, rot, scales, opac)
            alpha = out["render_alpha"]
            sem = out["render_feat"].argmax(0).astype(np.uint8)
            sem[alpha < alpha_threshold] = NUM_SEMANTIC_CHANNELS - 1  # background
            d = np.where(alpha > alpha_threshold,
                         out["render_depth"] / np.maximum(alpha, 1e-6), 0.0)
            depths[f, v] = np.clip(d, *DEPTH_CLAMP)
            semantics[f, v] = sem
    result = {"semantics": semantics, "depths": depths,
              "is_labeled": np.ones(F, bool)}
    if out_path:
        np.savez(out_path, **result)
    return result


# ---------------------------------------------------------------------------
# label vocabulary clustering (reference :1582-1798, embeddings supplied)
# ---------------------------------------------------------------------------

def cluster_label_vocab(
    caption_embeddings: np.ndarray,  # [N, D] (e.g. MiniLM sentence embs)
    captions: Sequence[str],
    n_labels: int = 51,
    pca_dim: int = 128,
    seed: int = 0,
) -> Dict[str, int]:
    """caption -> canonical label id via PCA + KMeans (the text-embedding
    model itself is an external backend; the clustering is owned here)."""
    from sklearn.cluster import KMeans
    from sklearn.decomposition import PCA

    X = caption_embeddings
    if X.shape[1] > pca_dim and X.shape[0] > pca_dim:
        X = PCA(n_components=pca_dim, random_state=seed).fit_transform(X)
    k = min(n_labels, len(captions))
    km = KMeans(n_clusters=k, random_state=seed, n_init=10).fit(X)
    return {c: int(l) for c, l in zip(captions, km.labels_)}


# ---------------------------------------------------------------------------
# restartable multi-stage pipeline (reference reconstruction_multi_task)
# ---------------------------------------------------------------------------

@dataclass
class Stage:
    name: str
    fn: Callable[[str], Optional[str]]  # episode key -> output path (or None)
    output_of: Callable[[str], str]  # episode key -> expected output path


def _stage_worker(stage: Stage, in_q: mp.Queue, out_q: Optional[mp.Queue]):
    current_output: List[str] = []

    def cleanup(signum, frame):
        # delete partial outputs so a restart redoes the episode cleanly
        for p in current_output:
            try:
                os.remove(p)
            except OSError:
                pass
        os._exit(1)

    signal.signal(signal.SIGTERM, cleanup)
    while True:
        key = in_q.get()
        if key is None:
            if out_q is not None:
                out_q.put(None)
            return
        expected = stage.output_of(key)
        if os.path.exists(expected):  # skip-if-exists idempotency
            if out_q is not None:
                out_q.put(key)
            continue
        current_output = [expected]
        try:
            stage.fn(key)
        except Exception as e:  # noqa: BLE001
            CONSOLE.log(f"[red]stage {stage.name} failed on {key}: {e}")
            cleanupable = [p for p in current_output if os.path.exists(p)]
            for p in cleanupable:
                os.remove(p)
            continue
        current_output = []
        if out_q is not None:
            out_q.put(key)


def run_stage_pipeline(stages: List[Stage], episode_keys: List[str]):
    """Chain stages as concurrent processes with queues between them; each
    episode flows stage1 -> stage2 -> ... as soon as its predecessor is
    done (reference's Process+Queue structure)."""
    queues = [mp.Queue() for _ in range(len(stages) + 1)]
    procs = [
        mp.Process(target=_stage_worker, args=(s, queues[i], queues[i + 1]))
        for i, s in enumerate(stages)
    ]
    for p in procs:
        p.start()
    for k in episode_keys:
        queues[0].put(k)
    queues[0].put(None)
    # drain the final queue
    done = []
    while True:
        k = queues[-1].get()
        if k is None:
            break
        done.append(k)
    for p in procs:
        p.join()
    return done


def _episode_dirs(data_root: str) -> List[str]:
    root = Path(data_root)
    return sorted(str(p.parent) for p in root.glob("*/intrinsics.json"))


def _labels_for(ep_dir: str, n_points_per_frame: List[int]) -> List[np.ndarray]:
    """Per-frame point labels: {ep}/labels/*.npy if present, else zeros
    (single 'scene' class) — the labeling stage is a pluggable backend."""
    lab_dir = Path(ep_dir) / "labels"
    files = sorted(lab_dir.glob("*.npy")) if lab_dir.exists() else []
    if len(files) == len(n_points_per_frame):
        return [np.load(f) for f in files]
    return [np.zeros(n, dtype=np.int64) for n in n_points_per_frame]


def run_reconstruction(data_root: str, backend: str = "depth_unproject",
                       **voxel_kwargs):
    """Built-in reconstruction: per-episode depth unprojection -> filtered
    points -> labeled occupancy .npz (restartable, skip-if-exists)."""
    recon = get_backend(backend)

    def stage_fn(ep_dir: str):
        out = Path(ep_dir) / "occupancy.npz"
        result = recon(ep_dir)
        pts = [statistical_outlier_removal(p) for p in result["points"]]
        labels = _labels_for(ep_dir, [len(p) for p in pts])
        occ = occupancy_from_frames(pts, labels, **voxel_kwargs)
        np.savez(out,
                 coors=np.concatenate([o["coors"] for o in occ]),
                 labels=np.concatenate([o["labels"] for o in occ]),
                 frame_sizes=np.array([len(o["coors"]) for o in occ]))

    stages = [Stage("reconstruction", stage_fn,
                    lambda k: str(Path(k) / "occupancy.npz"))]
    return run_stage_pipeline(stages, _episode_dirs(data_root))


def run_render(data_root: str, image_shape=(240, 320), **kwargs):
    """Built-in render: occupancy.npz + poses/intrinsics -> per-episode
    render.npz {semantics, depths, is_labeled} (reference get_render
    output layout)."""

    def stage_fn(ep_dir: str):
        ep = Path(ep_dir)
        data = np.load(ep / "occupancy.npz")
        sizes = data["frame_sizes"]
        occ, off = [], 0
        for n in sizes:
            occ.append({"coors": data["coors"][off:off + n],
                        "labels": data["labels"][off:off + n]})
            off += n
        K = np.asarray(json.loads((ep / "intrinsics.json").read_text())["K"])
        poses = np.load(ep / "poses.npy")
        render_episode(occ, [poses[0]], [K], image_shape,
                       out_path=str(ep / "render.npz"), **kwargs)

    stages = [Stage("render", stage_fn, lambda k: str(Path(k) / "render.npz"))]
    return run_stage_pipeline(stages, _episode_dirs(data_root))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--action", required=True,
                   choices=["reconstruction", "cameras", "labeling", "render"])
    p.add_argument("--data_root", required=True)
    p.add_argument("--backend", default="depth_unproject")
    p.add_argument("--split", default="train")
    args = p.parse_args(argv)
    if args.action == "reconstruction":
        done = run_reconstruction(args.data_root, args.backend)
    elif args.action == "render":
        done = run_render(args.data_root)
    else:
        raise SystemExit(
            f"action '{args.action}' wraps external perception models "
            "(VGGT / QwenVL / SAM2): register a backend via "
            "orv_tpu.pipelines.prepare_dataset.register_backend and compose "
            "cluster_label_vocab / align_depth_scale with run_stage_pipeline."
        )
    CONSOLE.log(f"{args.action}: {len(done)} episodes done")


if __name__ == "__main__":
    main()

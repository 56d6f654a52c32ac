"""Raw-frame dataset path, raw condition maps, multi-ref conditioning, and
(ref_num, n_view) bucketing — reference dataset.py:609-925, 1972-2050."""

import json
from pathlib import Path

import numpy as np
import pytest

from orv_tpu.data.dataset import (
    BucketSampler,
    COLORS60,
    DatasetConfig,
    MultiViewRobotDataset,
    RobotDataset,
    apply_semantic_colormap,
    collate_control,
    video_transform,
)

N_FRAMES = 24
SEQ = 8
H, W = 32, 48  # target video_size
SRC_H, SRC_W = 40, 64  # raw video size


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw_data")
    rng = np.random.default_rng(0)
    ann_dir = root / "annotations" / "train"
    ann_dir.mkdir(parents=True)
    vid_dir = root / "videos"
    vid_dir.mkdir()
    rend = root / "renderings" / "render" / "train"
    rend.mkdir(parents=True)

    from orv_tpu.utils.video import write_video

    for ep in range(2):
        frames = rng.integers(0, 255, (N_FRAMES, SRC_H, SRC_W, 3), dtype=np.uint8)
        vp = write_video(str(vid_dir / f"{ep:05d}.mp4"), frames, fps=8)
        ann = dict(
            episode_id=f"{ep:05d}",
            texts=["pick"],
            videos=[{"video_path": str(Path(vp).relative_to(root))}],
            state=rng.uniform(-1, 1, (N_FRAMES, 7)).tolist(),
            continuous_gripper_state=rng.uniform(0, 1, N_FRAMES).tolist(),
        )
        (ann_dir / f"{ep:05d}.json").write_text(json.dumps(ann))
        # factory render output: per-frame depth + semantics, single view
        np.savez(
            rend / f"{ep:05d}.npz",
            depths=rng.uniform(0, 0.6, (N_FRAMES, 1, 24, 32)).astype(np.float32),
            semantics=rng.integers(0, 12, (N_FRAMES, 1, 24, 32)).astype(np.uint8),
            is_labeled=np.array(True),
        )
    return str(root)


def _cfg(root, **kw):
    base = dict(data_root=root, sequence_length=SEQ, sequence_interval=1,
                start_frame_interval=8, video_size=(H, W),
                ori_size=(SRC_H, SRC_W), load_tensors=False)
    base.update(kw)
    return DatasetConfig(**base)


def test_raw_frames_shape_and_range(raw_root):
    ds = RobotDataset(_cfg(raw_root))
    item = ds[0]
    vids = item["videos"]
    assert vids.shape == (SEQ + 1, 3, H, W)
    assert vids.min() >= -1.0 and vids.max() <= 1.0
    assert item["image"].shape == (1, 3, H, W)  # ref_num=1 default


def test_raw_cond_maps(raw_root):
    ds = RobotDataset(_cfg(raw_root, use_cond=True, ori_size=(24, 32)))
    item = ds[0]
    d = item["depths"]
    assert d.shape == (SEQ + 1, 1, H, W)
    # reference clamp [0.01, 0.4] * 2.5 -> [0.025, 1.0]
    assert d.min() >= 0.025 - 1e-6 and d.max() <= 1.0 + 1e-6
    lab = item["labels"]
    assert lab.shape == (SEQ + 1, 3, H, W)
    assert lab.min() >= 0.0 and lab.max() <= 1.0


def test_semantic_colormap_matches_reference_palette():
    sem = np.array([[[0, 1], [59, 5]]])
    col = apply_semantic_colormap(sem)
    assert col.shape == (1, 3, 2, 2)
    np.testing.assert_allclose(col[0, :, 0, 0] * 255.0, COLORS60[0])
    np.testing.assert_allclose(col[0, :, 1, 0], 0.0)  # label 59 = black


def test_multi_ref_raw(raw_root):
    ds = RobotDataset(_cfg(raw_root, ref_num=[5]))
    item = ds[0]
    assert item["image"].shape == (5, 3, H, W)
    assert item["metainfo"]["ref_num"] == 5
    # sampler-provided tuple index wins over the config draw
    item = ds[(0, 1, 1)]
    assert item["image"].shape == (1, 3, H, W)


def test_video_transform_aspect_and_crop():
    frames = np.zeros((2, 40, 64, 3), dtype=np.uint8)
    frames[:, :, 32:] = 255  # right half white
    out = video_transform(frames, (40, 64), (32, 48))
    assert out.shape == (2, 3, 32, 48)
    # normalize to [-1, 1]
    assert out.min() == -1.0 and out.max() == 1.0


def test_bucket_sampler_ref_view_keys(raw_root):
    ds = RobotDataset(_cfg(raw_root, ref_num=[1, 5]))
    sampler = BucketSampler(ds, batch_size=2, seed=0, infinite=False)
    batches = list(sampler)
    assert batches, "sampler yielded nothing"
    for batch in batches:
        refs = {r for (_, r, _) in batch}
        views = {v for (_, _, v) in batch}
        assert len(refs) == 1 and len(views) == 1  # homogeneous buckets
    # items load through the tuple protocol and collate cleanly
    items = [ds[t] for t in batches[0]]
    out = collate_control(items)
    assert out["videos"].shape[0] == len(batches[0])


def test_multiview_rebalancing():
    class Fake(MultiViewRobotDataset):
        def __init__(self):  # bypass disk scan
            self.config = DatasetConfig(seed=0)
            self.samples = (
                [{"n_view": 1} for _ in range(80)] + [{"n_view": 2} for _ in range(20)]
            )
            self._rebalance_views()

    ds = Fake()
    n1 = sum(1 for s in ds.samples if s["n_view"] == 1)
    n2 = sum(1 for s in ds.samples if s["n_view"] == 2)
    assert n2 == 20  # ratio -1: untouched
    # single-view share capped at 0.4 of the ORIGINAL total (reference
    # view_data_ratio {1: 0.4, 2: -1, 3: -1})
    assert n1 == 40


def test_demo_dataset_full_frames(tmp_path):
    """DemoRobotDataset loads the full GT rgb clip when load_video is set
    (reference demo dataset :1512-1711)."""
    import imageio.v2 as imageio

    from orv_tpu.data.dataset import DatasetConfig, DemoRobotDataset

    ep = tmp_path / "demo0"
    (ep / "rgb").mkdir(parents=True)
    F = 10
    rng = np.random.default_rng(0)
    for i in range(F):
        imageio.imwrite(ep / "rgb" / f"{i:04d}.png",
                        rng.integers(0, 255, (32, 48, 3), dtype=np.uint8))
    ann = {"state": rng.normal(size=(F, 6)).tolist(),
           "continuous_gripper_state": rng.uniform(0, 1, F).tolist(),
           "texts": ["demo"]}
    (ep / "annotations.json").write_text(json.dumps(ann))

    cfg = DatasetConfig(data_root=str(tmp_path), sequence_length=4,
                        sample_frames=5, sequence_interval=1,
                        start_frame_interval=4, video_size=(32, 48),
                        ori_size=(32, 48), load_video=True,
                        vae_has_first_single_frame=True)
    ds = DemoRobotDataset(cfg)
    assert len(ds) >= 1
    item = ds[0]
    assert item["ref_image"].shape == (32, 48, 3)
    assert item["videos"].shape == (5, 3, 32, 48)  # full GT clip, [-1,1]
    assert item["videos"].min() >= -1.0 and item["videos"].max() <= 1.0
    assert item["actions"].shape[1] == 7

"""Grain input pipeline: batch layout parity with the threaded loader."""

import json
from pathlib import Path

import numpy as np
import pytest

from orv_tpu.data.dataset import BucketSampler, DatasetConfig, RobotDataset, collate_control


@pytest.fixture(scope="module")
def latents_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("grain")
    ann_dir = root / "annotations" / "train"
    ann_dir.mkdir(parents=True)
    emb = root / "embeddings_full" / "train"
    for sub in ("latents", "image_latents", "prompt_embeds"):
        (emb / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    F = 17
    for ep in range(2):
        ann = {"episode_id": f"{ep:05d}", "texts": ["x"],
               "state": rng.normal(size=(40, 6)).tolist(),
               "continuous_gripper_state": rng.uniform(0, 1, 40).tolist(),
               "videos": [f"videos/{ep:05d}.mp4"]}
        (ann_dir / f"{ep:05d}.json").write_text(json.dumps(ann))
        for start in (0, 16):
            name = f"{ep:05d}_{start:02d}_{F:02d}_0"
            np.savez(emb / "latents" / f"{name}.npz",
                     rng.normal(size=(32, 5, 4, 6)).astype(np.float32))
            np.savez(emb / "image_latents" / f"{name}.npz",
                     rng.normal(size=(32, 1, 4, 6)).astype(np.float32))
    np.savez(emb / "prompt_embeds" / "empty.npz", np.zeros((8, 16), np.float32))
    return str(root)


def _dataset(root):
    return RobotDataset(DatasetConfig(
        data_root=root, sequence_length=16, start_frame_interval=16,
        sample_frames=17, video_size=(32, 48)))


def test_grain_loader_batch_layout(latents_root):
    grain = pytest.importorskip("grain")  # noqa: F841
    from orv_tpu.data.grain_loader import make_grain_loader

    ds = _dataset(latents_root)
    it = make_grain_loader(ds, batch_size=2, num_epochs=1, shuffle=False)
    batches = list(it)
    assert len(batches) == 2  # 4 samples / batch 2
    b = batches[0]
    # layout parity with collate_control
    ref = collate_control([ds[0], ds[1]])
    assert set(b) == set(ref)
    assert b["latents"].shape == ref["latents"].shape == (2, 32, 5, 4, 6)
    assert b["image_latents"].shape == (2, 32, 1, 4, 6)
    assert b["actions"].shape == (2, 16, 7)
    assert b["num_views"] == 1
    mi = b["metainfos"][0]
    assert isinstance(mi["episode_id"], str)
    assert isinstance(mi["start_frame_idx"], int)


def test_grain_loader_epochs_cover_dataset(latents_root):
    pytest.importorskip("grain")
    from orv_tpu.data.grain_loader import make_grain_loader

    ds = _dataset(latents_root)
    seen = set()
    for b in make_grain_loader(ds, batch_size=1, num_epochs=1, shuffle=True):
        mi = b["metainfos"][0]
        seen.add((mi["episode_id"], mi["start_frame_idx"]))
    assert len(seen) == 4  # every sample exactly once per epoch

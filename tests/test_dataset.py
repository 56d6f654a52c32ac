"""Dataset layer tests over a synthetic on-disk fixture."""

import json
import os

import numpy as np
import pytest

from orv_tpu.data import (
    BucketSampler, CascadedRobotDataset, DatasetConfig, MultiViewRobotDataset,
    RobotDataset, collate_control,
)
from orv_tpu.data.rotation import euler2rotm, relative_actions, rotm2euler


# ---------------------------------------------------------------------------
# rotation math
# ---------------------------------------------------------------------------

def test_euler_roundtrip():
    rng = np.random.default_rng(0)
    e = rng.uniform(-1.2, 1.2, size=(50, 3))
    back = rotm2euler(euler2rotm(e))
    np.testing.assert_allclose(back, e, atol=1e-9)


def test_relative_actions_identity():
    # constant pose -> zero xyz/rpy deltas, gripper passthrough
    states = np.tile(np.array([1.0, 2.0, 3.0, 0.1, 0.2, 0.3]), (5, 1))
    grip = np.linspace(0, 1, 5)
    act = relative_actions(states, grip)
    np.testing.assert_allclose(act[:, :6], 0.0, atol=1e-12)
    np.testing.assert_allclose(act[:, 6], grip[1:])


def test_relative_actions_stepwise_vs_accumulate():
    rng = np.random.default_rng(1)
    states = rng.uniform(-0.5, 0.5, size=(6, 6))
    grip = rng.uniform(0, 1, 6)
    step = relative_actions(states, grip, accumulate=False)
    acc = relative_actions(states, grip, accumulate=True)
    # first action identical in both modes
    np.testing.assert_allclose(step[0], acc[0], atol=1e-9)
    assert np.abs(step[1:] - acc[1:]).max() > 1e-6


# ---------------------------------------------------------------------------
# synthetic dataset fixture
# ---------------------------------------------------------------------------

N_FRAMES = 40
SEQ_LEN = 8
C_LAT = 4


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("robot_data")
    rng = np.random.default_rng(0)
    ann_dir = root / "annotations" / "train"
    emb = root / "embeddings_full" / "train"
    for d in ("latents", "image_latents", "depth_latents", "label_latents", "prompt_embeds"):
        (emb / d).mkdir(parents=True, exist_ok=True)
    ann_dir.mkdir(parents=True, exist_ok=True)

    cfg = DatasetConfig(
        data_root=str(root), sequence_length=SEQ_LEN, sequence_interval=1,
        start_frame_interval=4, use_cond=True,
    )
    for ep in range(2):
        ann = dict(
            episode_id=f"{ep:05d}",
            texts=[f"pick object {ep}"],
            state=rng.uniform(-1, 1, (N_FRAMES, 7)).tolist(),
            continuous_gripper_state=rng.uniform(0, 1, N_FRAMES).tolist(),
            has_image_0=True, has_image_1=True,
        )
        (ann_dir / f"{ep:05d}.json").write_text(json.dumps(ann))
        # enumerate the slices the dataset will ask for and write latents
        ds_probe = RobotDataset(cfg)
        for s in [x for x in ds_probe.samples if int(x["episode_id"]) == ep]:
            name = f"{ep:05d}_{s['frame_ids'][0]:02d}_{s['num_frame']:02d}"
            F_lat = (s["num_frame"] - 1) // 4 + 1
            for view in range(2):
                np.savez(emb / "latents" / f"{name}_{view}.npz",
                         rng.normal(size=(2 * C_LAT, F_lat, 4, 6)).astype(np.float32))
                np.savez(emb / "image_latents" / f"{name}_{view}.npz",
                         rng.normal(size=(2 * C_LAT, 1, 4, 6)).astype(np.float32))
                np.savez(emb / "depth_latents" / f"{name}_{view}.npz",
                         rng.normal(size=(2 * C_LAT, F_lat, 4, 6)).astype(np.float32))
                np.savez(emb / "label_latents" / f"{name}_{view}.npz",
                         rng.normal(size=(2 * C_LAT, F_lat, 4, 6)).astype(np.float32))
    np.savez(emb / "prompt_embeds" / "empty.npz",
             rng.normal(size=(8, 16)).astype(np.float32))
    return str(root)


def _cfg(data_root, **kw):
    base = dict(
        data_root=data_root, sequence_length=SEQ_LEN, sequence_interval=1,
        start_frame_interval=4,
    )
    base.update(kw)
    return DatasetConfig(**base)


def test_slice_rule(data_root):
    ds = RobotDataset(_cfg(data_root))
    s = ds.samples[0]
    # 8n+1: SEQ_LEN + 1 leading frame
    assert s["num_frame"] == SEQ_LEN + 1
    # first slice starts at sequence_interval, prepends start-1
    assert s["frame_ids"][0] == 0 and s["frame_ids"][1] == 1
    # windows step by start_frame_interval * sequence_interval
    starts = sorted(x["frame_ids"][1] for x in ds.samples if x["episode_id"] == "00000")
    assert starts[:3] == [1, 5, 9]


def test_getitem_contents(data_root):
    ds = RobotDataset(_cfg(data_root, use_cond=True))
    item = ds[0]
    F_lat = SEQ_LEN // 4 + 1
    assert item["latents"].shape == (2 * C_LAT, F_lat, 4, 6)
    assert item["image_latents"].shape == (2 * C_LAT, 1, 4, 6)
    assert item["latents_depth"].shape == (2 * C_LAT, F_lat, 4, 6)
    assert item["actions"].shape == (SEQ_LEN, 7)
    assert item["prompt"] == ""  # empty_prompt default
    assert item["prompt_embeds"].shape == (8, 16)


def test_error_resample(data_root):
    ds = RobotDataset(_cfg(data_root))
    ds.samples[0] = dict(ds.samples[0], ann_file="/nonexistent.json")
    os.environ.pop("DEBUG", None)
    item = ds[0]  # must resample instead of raising
    assert "latents" in item
    os.environ["DEBUG"] = "1"
    with pytest.raises(Exception):
        ds[0]
    os.environ.pop("DEBUG")


def test_multiview_stacking(data_root):
    cfg = _cfg(data_root, n_view=2, max_n_view=2, use_cond=True)
    ds = MultiViewRobotDataset(cfg, train_view_sampling=False)
    item = ds[0]
    F_lat = SEQ_LEN // 4 + 1
    assert item["num_views"] == 2
    assert item["latents"].shape == (2 * C_LAT, 2 * F_lat, 4, 6)


def test_cascaded_chaining(data_root):
    ds = CascadedRobotDataset(_cfg(data_root, split="train"))
    ep0 = [s for s in ds.samples if s["episode_id"] == "00000"]
    assert len(ep0) >= 2
    assert ep0[0]["sample_index"] == 0 and not ep0[0]["is_last"]
    assert ep0[-1]["is_last"] and ep0[-1]["next_start_frame_idx"] is None
    for s in ep0[:-1]:
        assert s["next_start_frame_idx"] is not None


def test_bucket_sampler_and_collate(data_root):
    ds = RobotDataset(_cfg(data_root))
    sampler = BucketSampler(ds, batch_size=2, infinite=False, shuffle=False)
    batches = list(sampler)
    assert all(len(b) == 2 for b in batches[:-1])
    batch = collate_control([ds[i] for i in batches[0]])
    F_lat = SEQ_LEN // 4 + 1
    assert batch["latents"].shape == (2, 2 * C_LAT, F_lat, 4, 6)
    assert batch["actions"].shape == (2, SEQ_LEN, 7)
    assert len(batch["metainfos"]) == 2

"""TFDS extraction camera fidelity (round-5 VERDICT #3).

Reference parity targets (/root/reference/orv/dataset/data_process.py):
- DROID (:40-118): 3 camera streams incl. wrist_image_left, 176x320
  center crop, language_instruction 1/2/3, action =
  concat(cartesian_velocity, gripper_position).
- BridgeV2 (:148-280): image_0..3 gated per episode by first-frame content
  (sum > 0), 480x640 resize, explicit has_image_k flags (incl. False) in
  the annotation, texts gated on has_language, gripper = state[6].

tensorflow_datasets is not installed in this environment; the sources are
exercised against a synthetic in-memory `tensorflow_datasets` stub so the
parsing/crop/flag logic runs for real.
"""

import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest


def _install_fake_tfds(monkeypatch, episodes_by_name):
    fake = types.ModuleType("tensorflow_datasets")

    def load(name, data_dir=None, split="train"):
        assert name in episodes_by_name, name
        return list(episodes_by_name[name])

    fake.load = load
    fake.as_numpy = lambda ds: iter(ds)
    monkeypatch.setitem(sys.modules, "tensorflow_datasets", fake)


def _droid_step(i):
    obs = {
        "exterior_image_1_left": np.full((180, 320, 3), 10 + i, np.uint8),
        "exterior_image_2_left": np.full((180, 320, 3), 20 + i, np.uint8),
        "wrist_image_left": np.full((180, 320, 3), 30 + i, np.uint8),
        "cartesian_position": np.arange(6, dtype=np.float64) + i,
        "gripper_position": np.array([0.1 * i]),
    }
    return {
        "observation": obs,
        "language_instruction": b"pick the block",
        "language_instruction_2": b"grab the cube",
        "language_instruction_3": b"",
        "action_dict": {
            "cartesian_velocity": np.arange(6, dtype=np.float64) * 0.01,
            "gripper_position": np.array([0.5]),
        },
    }


def test_droid_three_cameras_crop_and_actions(monkeypatch):
    _install_fake_tfds(monkeypatch, {
        "droid": [{"steps": [_droid_step(i) for i in range(3)]}],
    })
    from orv_tpu.pipelines.data_process import droid_source

    eps = list(droid_source("/nonexistent"))
    assert len(eps) == 1
    ep = eps[0]
    # 3 cameras incl. wrist (reference :59-61), center-cropped to 176x320
    assert sorted(ep["frames"]) == [0, 1, 2]
    for c in range(3):
        assert ep["frames"][c].shape == (3, 176, 320, 3)
    assert ep["frames"][2][0, 0, 0, 0] == 30  # wrist stream is camera 2
    # all three language instructions (reference :47-52)
    assert ep["texts"] == ["pick the block", "grab the cube", ""]
    # action = concat(cartesian_velocity[6], gripper_position[1])
    assert np.asarray(ep["action"]).shape == (3, 7)
    assert ep["action"][0][-1] == pytest.approx(0.5)
    assert np.asarray(ep["state"]).shape == (3, 6)


def _bridge_step(i, present=(True, False, True, False)):
    obs = {"state": np.arange(8, dtype=np.float64) + 0.1 * i}
    for c, p in enumerate(present):
        obs[f"image_{c}"] = (np.full((256, 320, 3), 5 + c, np.uint8)
                             if p else np.zeros((256, 320, 3), np.uint8))
    return {
        "observation": obs,
        "language_instruction": b"wipe the table",
        "action": np.arange(7, dtype=np.float64),
    }


def test_bridgev2_camera_gating_resize_and_flags(monkeypatch, tmp_path):
    _install_fake_tfds(monkeypatch, {
        "bridge_dataset": [{
            "steps": [_bridge_step(i) for i in range(2)],
            "episode_metadata": {"has_language": True},
        }],
    })
    from orv_tpu.pipelines.data_process import bridgev2_source, write_episode

    ep = next(iter(bridgev2_source("/nonexistent")))
    # camera availability probed from first-frame content (reference
    # :161-175): image_1/image_3 are all-zero -> absent
    assert ep["has_image"] == {0: True, 1: False, 2: True, 3: False}
    assert sorted(ep["frames"]) == [0, 2]
    # resized to 480x640 (reference :194)
    assert ep["frames"][0].shape == (2, 480, 640, 3)
    assert ep["continuous_gripper_state"][0] == pytest.approx(6.0)  # state[6]
    assert np.asarray(ep["action"]).shape == (2, 7)

    # the annotation carries EXPLICIT has_image_k flags incl. False, and
    # 'none' placeholders keep the camera-index slots (reference :253+)
    ann_path = write_episode(ep, str(tmp_path), "train")
    ann = json.loads(Path(ann_path).read_text())
    assert ann["has_image_0"] is True
    assert ann["has_image_1"] is False
    assert ann["has_image_2"] is True
    assert ann["has_image_3"] is False
    assert len(ann["videos"]) == 4
    assert ann["videos"][1] == "none"
    assert ann["videos"][3] == "none"
    assert ann["videos"][0].endswith("_0.mp4")
    assert ann["videos"][2].endswith("_2.mp4")
    assert ann["texts"] == ["wipe the table"]


def test_bridgev2_no_language(monkeypatch):
    _install_fake_tfds(monkeypatch, {
        "bridge_dataset": [{
            "steps": [_bridge_step(0)],
            "episode_metadata": {"has_language": False},
        }],
    })
    from orv_tpu.pipelines.data_process import bridgev2_source

    ep = next(iter(bridgev2_source("/nonexistent")))
    assert ep["texts"] == [""]


def test_multiview_dataset_consumes_extracted_two_camera_episode(
        monkeypatch, tmp_path):
    """e2e coupling: a 2-present-of-4-camera extracted episode's annotation
    drives MultiViewRobotDataset view accounting (n_view from the
    has_image_k flags the extractor wrote)."""
    _install_fake_tfds(monkeypatch, {
        "bridge_dataset": [{
            "steps": [_bridge_step(i) for i in range(10)],
            "episode_metadata": {"has_language": True},
        }],
    })
    from orv_tpu.pipelines.data_process import bridgev2_source, extract

    extract(bridgev2_source("/nonexistent"), str(tmp_path), "train",
            num_workers=1)
    from orv_tpu.data import DatasetConfig, MultiViewRobotDataset

    cfg = DatasetConfig(
        data_root=str(tmp_path), split="train", sample_frames=9,
        sequence_length=9, max_n_view=4, load_tensors=False,
        load_actions=True,
    )
    ds = MultiViewRobotDataset(cfg, train_view_sampling=False)
    assert len(ds.samples) >= 1
    s = ds.samples[0]
    assert s["has_image_0"] and s["has_image_2"]
    assert not s["has_image_1"] and not s["has_image_3"]
    assert s["n_view"] == 2

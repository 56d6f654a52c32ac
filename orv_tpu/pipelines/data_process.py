"""Raw robot-dataset extraction -> per-episode mp4 + annotation json
(reference data_process.py for DROID / BridgeV2 TFDS).

The TFDS readers are pluggable `episode_source` iterators (tensorflow_datasets
is an optional heavyweight dependency; when present the droid/bridgev2
sources below use it). The writer side — multi-camera mp4 export, the
annotation schema (episode_id, texts, videos, state,
continuous_gripper_state, has_image_k), and the bounded worker pool — is
owned here and matches what orv_tpu.data.RobotDataset consumes.
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
from pathlib import Path
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

from orv_tpu.utils.logging import CONSOLE
from orv_tpu.utils.video import write_video

# episode dict schema expected from any source:
#   {"episode_id": str, "texts": [str], "frames": {cam_id: [T,H,W,3] uint8},
#    "state": [T, >=6], "continuous_gripper_state": [T], "action": optional}
EpisodeSource = Iterator[Dict]

_SOURCES: Dict[str, Callable[..., EpisodeSource]] = {}


def register_source(name: str):
    def deco(fn):
        _SOURCES[name] = fn
        return fn
    return deco


@register_source("droid")
def droid_source(tfds_dir: str, split: str = "train") -> EpisodeSource:
    """DROID TFDS reader (two exterior cameras + wrist; gripper from the
    action stream) — requires tensorflow_datasets."""
    import tensorflow_datasets as tfds  # optional heavy dep

    ds = tfds.load("droid", data_dir=tfds_dir, split=split)
    for i, ep in enumerate(tfds.as_numpy(ds)):
        steps = list(ep["steps"])
        yield dict(
            episode_id=f"{i:05d}",
            texts=[steps[0]["language_instruction"].decode()],
            frames={
                0: np.stack([s["observation"]["exterior_image_1_left"] for s in steps]),
                1: np.stack([s["observation"]["exterior_image_2_left"] for s in steps]),
            },
            state=np.stack([s["observation"]["cartesian_position"] for s in steps]).tolist(),
            continuous_gripper_state=np.stack(
                [s["observation"]["gripper_position"] for s in steps]
            ).reshape(-1).tolist(),
        )


@register_source("bridgev2")
def bridgev2_source(tfds_dir: str, split: str = "train") -> EpisodeSource:
    import tensorflow_datasets as tfds

    ds = tfds.load("bridge_dataset", data_dir=tfds_dir, split=split)
    for i, ep in enumerate(tfds.as_numpy(ds)):
        steps = list(ep["steps"])
        yield dict(
            episode_id=f"{i:05d}",
            texts=[steps[0].get("language_instruction", b"").decode()],
            frames={0: np.stack([s["observation"]["image_0"] for s in steps])},
            state=np.stack([s["observation"]["state"][:6] for s in steps]).tolist(),
            continuous_gripper_state=np.stack(
                [s["observation"]["state"][-1] for s in steps]
            ).reshape(-1).tolist(),
        )


def write_episode(episode: Dict, out_root: str, split: str, fps: int = 8) -> str:
    """One episode -> videos/*.mp4 + annotations/{split}/{id}.json."""
    out = Path(out_root)
    (out / "videos").mkdir(parents=True, exist_ok=True)
    (out / "annotations" / split).mkdir(parents=True, exist_ok=True)
    eid = episode["episode_id"]
    videos = []
    ann = dict(
        episode_id=eid,
        texts=episode.get("texts", [""]),
        state=episode["state"],
        continuous_gripper_state=episode["continuous_gripper_state"],
    )
    for cam_id, frames in sorted(episode["frames"].items()):
        name = f"videos/{eid}_{cam_id}.mp4" if len(episode["frames"]) > 1 \
            else f"videos/{eid}.mp4"
        written = write_video(str(out / name), np.asarray(frames, np.uint8), fps)
        videos.append(str(Path(written).relative_to(out)))
        ann[f"has_image_{cam_id}"] = True
    ann["videos"] = videos
    if "action" in episode:
        ann["action"] = episode["action"]
    path = out / "annotations" / split / f"{eid}.json"
    path.write_text(json.dumps(ann))
    return str(path)


def extract(
    source: EpisodeSource,
    out_root: str,
    split: str = "train",
    num_workers: int = 4,
    max_episodes: Optional[int] = None,
    queue_depth: int = 8,
):
    """Bounded-queue worker pool over the episode stream (reference
    spawn-pool data_process.py:346-503). Skip-if-exists restartable."""
    q: "queue.Queue" = queue.Queue(maxsize=queue_depth)
    written: List[str] = []
    lock = threading.Lock()

    def worker():
        while True:
            ep = q.get()
            if ep is None:
                return
            ann_path = Path(out_root) / "annotations" / split / f"{ep['episode_id']}.json"
            if ann_path.exists():
                continue
            try:
                p = write_episode(ep, out_root, split)
            except Exception as e:  # noqa: BLE001 — a bad episode must not
                # kill the worker: with the pool dead the bounded q.put in
                # the producer blocks forever and the sentinels never land
                CONSOLE.log(f"[yellow]extract: episode "
                            f"{ep.get('episode_id')} failed: "
                            f"{type(e).__name__}: {e} — skipped")
                continue
            with lock:
                written.append(p)

    threads = [threading.Thread(target=worker, daemon=True) for _ in range(num_workers)]
    for t in threads:
        t.start()
    n = 0
    for ep in source:
        q.put(ep)
        n += 1
        if max_episodes and n >= max_episodes:
            break
    for _ in threads:
        q.put(None)
    for t in threads:
        t.join()
    CONSOLE.log(f"extracted {len(written)} new episodes (of {n} streamed) -> {out_root}")
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True, choices=sorted(_SOURCES))
    p.add_argument("--tfds_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--max_episodes", type=int, default=None)
    args = p.parse_args(argv)
    source = _SOURCES[args.dataset](args.tfds_dir, args.split)
    extract(source, args.output_dir, args.split, args.num_workers, args.max_episodes)


if __name__ == "__main__":
    main()

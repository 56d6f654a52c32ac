"""Offline VAE latent encoder (reference encode_dataset.py).

Reads raw episode videos + annotations, writes MOMENTS latents (2x16ch —
sampling deferred to train time, matching the reference's vae._encode
convention), per-view files, plus T5 prompt embeddings and the empty-prompt
embedding. Work-list sharding by process index; skip-if-exists idempotency
(every stage restartable — reference :781-791).

Outputs (consumed by orv_tpu.data.RobotDataset):
  {data_root}/{embeddings_folder}/{split}/latents/{ep:05d}_{start:02d}_{n:02d}_{view}.npz
  .../image_latents/...   .../depth_latents/...  .../label_latents/...
  .../prompt_embeds/empty.npz
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orv_tpu.configs import default_config_dir, load_config
from orv_tpu.data import DatasetConfig, RobotDataset
from orv_tpu.models.vae import CausalVAE, VAEConfig
from orv_tpu.utils.logging import CONSOLE


def read_video_frames(path: str, frame_ids: List[int], size_hw,
                      ori_size=None) -> np.ndarray:
    """video file -> [F, H, W, 3] float32 in [-1, 1] via the SAME
    aspect-preserving resize + center crop the raw-frame dataset loader
    applies (data/dataset.py video_transform) — a direct squash here would
    spatially misalign the video latents against the cond latents and the
    load_tensors:false eval path."""
    from orv_tpu.data.dataset import video_transform
    from orv_tpu.utils.video import read_video

    frames = read_video(path, frame_ids)  # [F, H, W, 3] uint8
    out = video_transform(frames, ori_size, size_hw)  # [F, 3, H', W']
    return out.transpose(0, 2, 3, 1)


def encode_split(
    cfg,
    vae: CausalVAE,
    vae_params,
    split: str = "train",
    overwrite: bool = False,
    max_samples: Optional[int] = None,
    ref_nums: Optional[List[int]] = None,
    encode_conds: Optional[bool] = None,
):
    d = cfg.dataset
    control_keys = tuple(d.get("control_keys", ("depth", "label")))
    ds_cfg = DatasetConfig(
        data_root=d.data_root, split=split,
        sequence_interval=d.get("sequence_interval", 1),
        sequence_length=d.get("sequence_length", 16),
        start_frame_interval=d.get("start_frame_interval", 4),
        video_size=tuple(d.get("video_size", (320, 480))),
        ori_size=tuple(d["ori_size"]) if d.get("ori_size") else None,
        embeddings_folder=d.get("embeddings_folder", "embeddings_full"),
        annotations_folder=d.get("annotations_folder", "annotations"),
        renderings_folder=d.get("renderings_folder", "renderings"),
        control_keys=control_keys,
        load_tensors=False,
    )
    ds = RobotDataset(ds_cfg)
    if encode_conds is None:
        encode_conds = bool(d.get("use_cond", False))
    ref_nums = sorted(set(int(r) for r in (ref_nums or [1])))
    out_root = Path(d.data_root) / ds_cfg.embeddings_folder / split
    subs = ["latents", "image_latents", "prompt_embeds"]
    if encode_conds:
        subs += [f"{k}_latents" for k in control_keys]
    for sub in subs:
        (out_root / sub).mkdir(parents=True, exist_ok=True)

    # process-sharded work list (reference rank slicing encode_dataset.py:634-643)
    n_proc, pid = jax.process_count(), jax.process_index()
    work = ds.samples[pid::n_proc]
    if max_samples:
        work = work[:max_samples]

    chunk_frames = int(d.get("encode_chunk_frames", 8))

    def encode(p, x):
        # streaming encode for long clips (reference frame-batches
        # vae._encode, encode_dataset.py:793-927): full-clip 49x320x480
        # encoder activations exceed one v5e's 16GB HBM, so clips beyond
        # chunk_frames+1 run the conv-cached chunked path — single shared
        # dispatch point with the raw-pixel eval path (vae.encode_auto)
        from orv_tpu.models.vae import encode_auto

        return encode_auto(vae, p, x, chunk_frames=chunk_frames)

    H, W = ds_cfg.video_size
    done = skipped = 0
    for sample in work:
        with open(sample["ann_file"]) as f:
            ann = json.load(f)
        # per-view loop (reference encode_dataset.py:828-927: multiview
        # episodes encode every camera's stream with a _{view} suffix)
        videos = ann.get("videos", [None])
        for view, video_file in enumerate(videos):
            name = ds._sample_name(sample, view=view)
            lat_path = out_root / "latents" / f"{name}.npz"
            img_path = out_root / "image_latents" / f"{name}.npz"
            # reference observations = the first r raw frames (dataset.py
            # :609-633 num_observation); r>1 files carry a _ref{r} suffix.
            # View 0 keeps the historical no-view name (what the
            # single-view loader reads); other views get the view suffix
            # so multiview episodes don't silently overwrite each other.
            ref_name = (ds._sample_name(sample) if view == 0
                        else ds._sample_name(sample, view=view))
            ref_paths = {r: (img_path if r <= 1 else out_root / "image_latents"
                             / f"{ref_name}_ref{r}.npz") for r in ref_nums}
            # per-output skip-if-exists: a re-run with MORE flags (extra
            # --ref_nums, --encode_conds) must backfill exactly the missing
            # files, not skip the whole sample because latents exist
            need_lat = overwrite or not lat_path.exists()
            need_refs = {r: p for r, p in ref_paths.items()
                         if overwrite or not p.exists()}
            cond_paths = {k: out_root / f"{k}_latents" / f"{name}.npz"
                          for k in control_keys} if encode_conds else {}
            need_conds = {k: p for k, p in cond_paths.items()
                          if overwrite or not p.exists()}
            if not (need_lat or need_refs or need_conds):
                skipped += 1
                continue
            if isinstance(video_file, dict):
                video_file = video_file.get("video_path")
            if video_file is None:
                continue
            if need_lat or need_refs:
                video_path = str(Path(d.data_root) / video_file)
                frames = read_video_frames(video_path, sample["frame_ids"],
                                           (H, W), ori_size=ds_cfg.ori_size)
            if need_lat:
                clip = jnp.asarray(frames.transpose(3, 0, 1, 2))[None]  # [1, C, F, H, W]
                np.savez(lat_path,
                         np.asarray(encode(vae_params, clip)[0], dtype=np.float32))
            for r, rp in need_refs.items():
                ref = jnp.asarray(frames[:r].transpose(3, 0, 1, 2))[None]
                np.savez(rp, np.asarray(encode(vae_params, ref)[0], dtype=np.float32))
            if need_conds:
                # depth (3-channel expand of the clamped map) and label (color
                # map) condition latents — reference encode_dataset.py:792-816,
                # 865-927; inputs come from the dataset's raw cond loader so the
                # on-disk convention matches _get_cond_frames exactly
                conds = ds._get_cond_raw(sample, view_ids=(view,))
                if "depths" in conds and "depth" in need_conds:
                    dep = np.repeat(conds["depths"], 3, axis=1)  # [F,3,H,W]
                    dm = encode(vae_params, jnp.asarray(dep.transpose(1, 0, 2, 3))[None])
                    np.savez(need_conds["depth"],
                             np.asarray(dm[0], dtype=np.float32))
                if "labels" in conds and "label" in need_conds:
                    lm = encode(vae_params,
                                jnp.asarray(conds["labels"].transpose(1, 0, 2, 3))[None])
                    np.savez(need_conds["label"],
                             np.asarray(lm[0], dtype=np.float32))
        done += 1
        if done % 20 == 0:
            CONSOLE.log(f"[{split}] encoded {done}/{len(work)} (skipped {skipped})")
    CONSOLE.log(f"[{split}] done: {done} encoded, {skipped} skipped")


def encode_empty_prompt(cfg, out_root: Path):
    """T5 embedding of the empty prompt (reference encode_empty_prompt,
    :1068-1096); zeros fallback when T5 weights are unavailable."""
    from orv_tpu.models.text_encoder import encode_prompts, t5_available

    (out_root / "prompt_embeds").mkdir(parents=True, exist_ok=True)
    path = out_root / "prompt_embeds" / "empty.npz"
    max_len = cfg.transformer.get("max_text_seq_length", 226)
    dim = cfg.transformer.get("text_embed_dim", 4096)
    if t5_available(cfg.get("text_encoder_path")):
        emb = encode_prompts([""], max_len, model_path=cfg.get("text_encoder_path"))[0]
    else:
        CONSOLE.log("[yellow]T5 weights unavailable — writing zero empty-prompt embedding")
        emb = np.zeros((max_len, dim), dtype=np.float32)
    np.savez(path, emb)
    CONSOLE.log(f"wrote {path}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", default=str(default_config_dir() / "base_train.yaml"))
    p.add_argument("--dataset_type", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--vae_path", default=None, help="HF VAE folder (safetensors)")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--ref_nums", default="1",
                   help="comma list of observation counts, e.g. 1,5,9")
    p.add_argument("--encode_conds", action="store_true",
                   help="also write depth/label condition latents from render.npz")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    cfg = load_config(args.base, None, args.dataset_type, None, args.overrides)

    vae = CausalVAE(VAEConfig(), dtype=jnp.bfloat16)
    if args.vae_path and Path(args.vae_path).exists():
        from orv_tpu.models.weights import convert_vae_state_dict, load_torch_state_dict

        vae_params = convert_vae_state_dict(load_torch_state_dict(args.vae_path), VAEConfig())
    else:
        CONSOLE.log("[yellow]no --vae_path — random VAE (synthetic/dev mode)")
        vae_params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, 32, 32)))

    encode_split(cfg, vae, vae_params, args.split, args.overwrite, args.max_samples,
                 ref_nums=[int(r) for r in str(args.ref_nums).split(",") if r],
                 encode_conds=args.encode_conds or None)
    out_root = Path(cfg.dataset.data_root) / cfg.dataset.get("embeddings_folder", "embeddings_full") / args.split
    encode_empty_prompt(cfg, out_root)


if __name__ == "__main__":
    main()

"""Batch evaluation entry (reference evaluation_control_to_video.py).

Re-designed: one jitted sampler reused across batches; work-list sharding
by jax.process_index() (the reference's manual torch.distributed dataset
slicing, SURVEY.md §2.3); async artifact export on a thread pool; cascaded
long-horizon rollout by chaining chunk latents through
next_start_frame_idx.

Usage:
  python -m orv_tpu.pipelines.evaluate --dataset_type rt1 \
      evaluation.mode=traj-image [key=value ...]
"""

from __future__ import annotations

import argparse
import json
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orv_tpu.configs import Config, default_config_dir, load_config
from orv_tpu.data import CascadedRobotDataset, DatasetConfig, RobotDataset, collate_control
from orv_tpu.models import ControlDiT, DiTConfig
from orv_tpu.models.vae import CausalVAE, VAEConfig, tiled_decode
from orv_tpu.pipelines.sample import (
    SamplerConfig, make_sampler, prepare_control_latents, prepare_image_latents,
)
from orv_tpu.pipelines.train import build_dataset, build_dit_config
from orv_tpu.schedulers import make_schedule
from orv_tpu.utils.checkpoint import load_pretrained
from orv_tpu.utils.logging import CONSOLE


def prefetch_eval_batches(dataset, indices, bs: int, num_workers: int = 0):
    """Yield (idxs, collated_batch) in order. With `num_workers > 0`
    (reference `evaluation.num_workers`, base_eval.yaml) batches load and
    collate on a thread pool while the device denoises the current one —
    bounded look-ahead of num_workers+1 batches so raw-pixel batches never
    pile up in host RAM. num_workers=0 loads synchronously (identical
    semantics, zero threads)."""
    chunks = [list(indices[bi:bi + bs]) for bi in range(0, len(indices), bs)]

    def load(ix):
        return collate_control([dataset[i] for i in ix])

    if num_workers <= 0:
        for ix in chunks:
            yield ix, load(ix)
        return
    from collections import deque

    ex = ThreadPoolExecutor(num_workers)
    try:
        pending = deque()
        it = iter(chunks)
        for ix in it:
            pending.append((ix, ex.submit(load, ix)))
            if len(pending) > num_workers:
                break
        while pending:
            ix, fut = pending.popleft()
            yield ix, fut.result()
            nxt = next(it, None)
            if nxt is not None:
                pending.append((nxt, ex.submit(load, nxt)))
    finally:
        ex.shutdown(wait=False, cancel_futures=True)


def save_video(path: str, video: np.ndarray, fps: int = 8, gif: bool = True):
    """video [T, H, W, 3] uint8 -> mp4 (cv2/imageio) + gif alongside (the
    reference exports both, evaluation_control_to_video.py:409-434)."""
    from orv_tpu.utils.video import write_gif, write_video

    written = write_video(str(path), video, fps=fps)
    if gif and not str(written).endswith(".gif"):
        write_gif(str(path), video, fps=fps)


def to_uint8(video: np.ndarray) -> np.ndarray:
    """[C, T, H, W] in [-1, 1] -> [T, H, W, C] uint8."""
    v = np.clip((video.transpose(1, 2, 3, 0) + 1.0) / 2.0, 0, 1)
    return (v * 255).round().astype(np.uint8)


def _encode_raw(batch: Dict[str, Any], vae, vae_params, dit_cfg,
                chunk_frames: int = 8) -> Dict[str, Any]:
    """`load_tensors: false` items carry raw pixels (videos/image, raw cond
    maps) — VAE-encode them into the moments the sampler path expects
    (the reference's cascaded eval config runs exactly this way,
    eval_traj_image_2b_finetune_cascaded.yaml + dataset.py:655-925)."""
    if "latents" in batch:
        return batch
    if vae is None or vae_params is None:
        raise ValueError(
            "dataset.load_tensors=false needs a VAE to encode raw frames — "
            "pass vae.pretrained_name_or_path"
        )

    def enc(x):
        # flagship 49x320x480 clips exceed HBM in one encoder pass — stream
        # long clips through the conv-cached chunked encode (the reference
        # frame-batches vae._encode, encode_dataset.py:793-927)
        from orv_tpu.models.vae import encode_auto

        return np.asarray(encode_auto(vae, vae_params, jnp.asarray(x),
                                      chunk_frames=chunk_frames))

    batch = dict(batch)
    batch["latents"] = enc(np.asarray(batch["videos"]).transpose(0, 2, 1, 3, 4))
    batch["image_latents"] = enc(np.asarray(batch["image"]).transpose(0, 2, 1, 3, 4))
    if batch.get("depths") is not None:
        d = np.repeat(np.asarray(batch["depths"]), 3, axis=2)  # [B,F,3,H,W]
        batch["latents_depth"] = enc(d.transpose(0, 2, 1, 3, 4))
    if batch.get("labels") is not None:
        batch["latents_label"] = enc(np.asarray(batch["labels"]).transpose(0, 2, 1, 3, 4))
    if batch.get("prompt_embeds") is None:
        B = batch["latents"].shape[0]
        # the reference conditions on a real (empty-prompt) T5 embedding; a
        # zero fill silently degrades real runs, so make it loud
        CONSOLE.log(
            "[yellow]raw-pixel batch has no prompt_embeds — substituting "
            "ZEROS. Real runs should point dataset.embeddings_folder at an "
            "encode_dataset output (prompt_embeds/empty.npz)."
        )
        batch["prompt_embeds"] = np.zeros(
            (B, dit_cfg.max_text_seq_length, dit_cfg.text_embed_dim), np.float32)
    return batch


def evaluate(cfg: Config, max_batches: Optional[int] = None,
             vae: Optional[CausalVAE] = None, vae_params=None):
    """`vae`/`vae_params` may be passed directly (library embedding, tests);
    otherwise they load from cfg.vae.pretrained_name_or_path."""
    ev = cfg.evaluation
    out_dir = Path(ev.get("output_dir", "eval_outputs"))
    out_dir.mkdir(parents=True, exist_ok=True)

    dit_cfg = build_dit_config(cfg)
    # int8 serving configuration (evaluation.quant: true or --quant):
    # W8A8 linears + int8-QK^T attention; params converted after load
    quant = bool(ev.get("quant", False))
    # sequence-parallel serving (evaluation.mesh.sp > 1): every block's
    # joint attention rings the ~8k video tokens over the sp axis
    # (ops/ring_attention.py) — O(S/n) attention memory per chip for
    # clips whose KV exceeds one chip's HBM. Exclusive with dp/fsdp/tp
    # (one model instance, sequence-sharded).
    mesh_cfg = ev.get("mesh", {}) or {}
    sp = int(mesh_cfg.get("sp", 1))
    sp_mesh = None
    if sp > 1:
        if any(int(mesh_cfg.get(a, 1)) > 1 for a in ("dp", "fsdp", "tp")):
            raise ValueError("evaluation.mesh.sp is exclusive with dp/fsdp/tp")
        from orv_tpu.parallel import MeshConfig, make_mesh

        n_dev = len(jax.devices())
        if n_dev < sp:
            # a truncated ring would silently fall back to resident
            # attention — the OOM-at-scale surprise sp exists to prevent
            raise ValueError(
                f"evaluation.mesh.sp={sp} needs {sp} devices, host has {n_dev}")
        sp_mesh = make_mesh(MeshConfig(dp=1, sp=sp), devices=jax.devices()[:sp])
        CONSOLE.log(f"inference sharding: sequence-parallel sp={sp}")
    model = ControlDiT(dit_cfg, dtype=jnp.bfloat16,
                       attn_impl="flash_q8" if quant else "auto", quant=quant,
                       sp_mesh=sp_mesh)

    pretrained = cfg.transformer.get("pretrained_name_or_path")
    if pretrained and (Path(str(pretrained)) / "model.msgpack").exists():
        from orv_tpu.models.weights import ensure_mv_blocks

        _, params = load_pretrained(str(pretrained), DiTConfig)
        params = ensure_mv_blocks(params, dit_cfg)
        CONSOLE.log(f"loaded transformer from {pretrained}")
        if quant:
            from orv_tpu.models.quantize import quantize_linear_params

            params = quantize_linear_params(params)
            CONSOLE.log("int8 serving: block linears quantized (W8A8)")
    else:
        CONSOLE.log("[yellow]no pretrained transformer — random init (smoke mode)")
        B0, F0 = 1, 2
        x0 = jnp.zeros((B0, F0, dit_cfg.in_channels, 8, 8), jnp.bfloat16)
        init_kwargs = dict(actions=jnp.zeros((B0, 4 * F0 - 1, dit_cfg.action_dim), jnp.bfloat16))
        if dit_cfg.visual_guidance:
            init_kwargs["depths"] = x0
            init_kwargs["labels"] = x0
        params = model.init(
            jax.random.PRNGKey(0), x0,
            jnp.zeros((B0, dit_cfg.max_text_seq_length, dit_cfg.text_embed_dim), jnp.bfloat16),
            jnp.zeros((B0,), jnp.int32), **init_kwargs,
        )

    vae_path = cfg.get("vae", {}).get("pretrained_name_or_path")
    if vae is None and vae_path and Path(str(vae_path)).exists():
        from orv_tpu.models.weights import convert_vae_state_dict, load_torch_state_dict

        vae = CausalVAE(VAEConfig(), dtype=jnp.bfloat16)
        vae_params = convert_vae_state_dict(load_torch_state_dict(str(vae_path)), VAEConfig())
        CONSOLE.log(f"loaded VAE from {vae_path}")

    # sharded serving (evaluation.mesh.tp > 1): Megatron column/row param
    # shardings over the tp axis; GSPMD propagates through the jitted
    # sampler scan and inserts the all-reduces on ICI. The reference has no
    # multi-GPU inference path (SURVEY §2.3) — this replaces "one GPU per
    # eval shard" with "one model over N chips" for models/serving configs
    # that exceed a single chip's HBM.
    serve_mesh = None
    if any(int(mesh_cfg.get(a, 1)) > 1 for a in ("dp", "fsdp", "tp")):
        from orv_tpu.parallel import MeshConfig, make_mesh, param_shardings

        dp = int(mesh_cfg.get("dp", -1))
        fsdp, tp = int(mesh_cfg.get("fsdp", 1)), int(mesh_cfg.get("tp", 1))
        # fully-explicit mesh smaller than the host's device count is valid
        # for serving (e.g. 4 of 8 chips; the rest idle or serve another
        # replica) — build over the first dp*fsdp*tp devices.
        devices = None
        if dp > 0 and 0 < dp * fsdp * tp < len(jax.devices()):
            devices = jax.devices()[: dp * fsdp * tp]
        serve_mesh = make_mesh(MeshConfig(dp=dp, fsdp=fsdp, tp=tp),
                               devices=devices)
        params = jax.device_put(params, param_shardings(params, serve_mesh))
        if tp > 1:
            # pin embed-boundary activations to the batch sharding so GSPMD
            # never replicates [B,S,D] to reach the tp layout (VERDICT r3 #4)
            model = model.clone(act_mesh=serve_mesh)
        CONSOLE.log(f"inference sharding: mesh {dict(serve_mesh.shape)}")

    cascaded = bool(ev.get("cascaded", False))
    dataset = build_dataset(cfg, split=cfg.dataset.get("split", "test"),
                            cascaded=cascaded)

    # work-list sharding across processes (reference rank slicing)
    n_proc, pid = jax.process_count(), jax.process_index()
    indices = list(range(len(dataset)))[pid::n_proc]
    if max_batches is not None:
        indices = indices[: max_batches * int(ev.get("batch_size", 1))]

    sampler = make_sampler(
        model.apply, make_schedule(),
        SamplerConfig(
            num_inference_steps=int(ev.get("num_inference_steps", 50)),
            guidance_scale=float(ev.get("guidance_scale", 1.0)),
            use_dynamic_cfg=bool(ev.get("use_dynamic_cfg", False)),
            scheduler=ev.get("scheduler", "dpm"),
            # opt-in PAB attention broadcast (approximate serving
            # acceleration; evaluation.pab_skip > 0 enables)
            pab_skip=int(ev.get("pab_skip", 0)),
            pab_start=float(ev.get("pab_start", 0.1)),
            pab_end=float(ev.get("pab_end", 0.85)),
        ),
    )
    sample_jit = jax.jit(sampler, static_argnames=("num_views",))
    mode = ev.get("mode", "traj-image")
    scaling = float(cfg.get("vae", {}).get("scaling_factor", 1.15258426))
    rng = jax.random.PRNGKey(int(cfg.get("seed", 42)))
    pool = ThreadPoolExecutor(2)

    if cascaded:
        return _cascaded_rollout(cfg, dataset, dit_cfg, params, sample_jit, mode,
                                 scaling, rng, vae, vae_params, out_dir, ev)

    bs = int(ev.get("batch_size", 1))
    results = []
    for bnum, (idxs, batch) in enumerate(prefetch_eval_batches(
            dataset, indices, bs, int(ev.get("num_workers", 0)))):
        batch = _encode_raw(batch, vae, vae_params, dit_cfg,
                            chunk_frames=int(cfg.dataset.get("encode_chunk_frames", 8)))
        rng, r_img, r_ctrl, r_noise, r_samp = jax.random.split(rng, 5)

        lat_moments = jnp.asarray(batch["latents"])
        C = dit_cfg.out_channels
        F_lat = lat_moments.shape[2]
        H, W = lat_moments.shape[3], lat_moments.shape[4]
        B = lat_moments.shape[0]
        nv = int(batch.get("num_views", 1))
        # multiview latents stack views on the frame axis [B, 2C, V*F, ...]:
        # image latents must pad PER VIEW ([img, pad] x V), and the rotary
        # table spans one view's F frames — both take the per-view count
        F_view = F_lat // nv

        image_latents = prepare_image_latents(
            jnp.asarray(batch["image_latents"]), F_view, r_img,
            latent_channels=C, num_views=nv, scaling_factor=scaling,
        ).astype(jnp.bfloat16)
        kwargs: Dict[str, Any] = {}
        if "actions" in batch and "traj" in mode:
            kwargs["actions"] = jnp.asarray(batch["actions"]).astype(jnp.bfloat16)
        if "depth" in mode and batch.get("latents_depth") is not None:
            kwargs["depths"] = prepare_control_latents(
                jnp.asarray(batch["latents_depth"]), r_ctrl, C, scaling
            ).astype(jnp.bfloat16)
        if "label" in mode and batch.get("latents_label") is not None:
            kwargs["labels"] = prepare_control_latents(
                jnp.asarray(batch["latents_label"]), jax.random.fold_in(r_ctrl, 1), C, scaling
            ).astype(jnp.bfloat16)

        if dit_cfg.use_rotary_positional_embeddings:
            from orv_tpu.utils.embeddings import prepare_rotary_positional_embeddings

            kwargs["image_rotary_emb"] = prepare_rotary_positional_embeddings(
                height=H * 8, width=W * 8, num_frames=F_view,
                patch_size=dit_cfg.patch_size, patch_size_t=dit_cfg.patch_size_t,
                attention_head_dim=dit_cfg.attention_head_dim,
            )
        prompt_embeds = jnp.asarray(batch["prompt_embeds"]).astype(jnp.bfloat16)
        noise = jax.random.normal(r_noise, (B, F_lat, C, H, W), dtype=jnp.float32)
        # data-parallel batched serving (evaluation.mesh.dp > 1): shard the
        # batch axis over the dp mesh axis — GSPMD propagates through the
        # jitted denoise scan, so N chips each denoise B/N clips. Composes
        # with tp (per-clip model sharding) on the same mesh.
        if serve_mesh is not None and serve_mesh.shape["dp"] > 1:
            dp = serve_mesh.shape["dp"]
            if B % dp == 0:
                from jax.sharding import NamedSharding, PartitionSpec as P

                bsh = NamedSharding(serve_mesh, P("dp"))
                put = lambda x: jax.device_put(x, bsh)
                noise, image_latents = put(noise), put(image_latents)
                prompt_embeds = put(prompt_embeds)
                kwargs = {k: (put(v) if hasattr(v, "ndim") and v.ndim > 0
                              and v.shape[0] == B else v)
                          for k, v in kwargs.items()}
            else:
                CONSOLE.log(f"[yellow]batch {B} not divisible by mesh dp={dp}"
                            " — running this batch replicated")
        latents = sample_jit(params, noise, image_latents, prompt_embeds, r_samp,
                             num_views=nv, **kwargs)

        for j, i in enumerate(idxs):
            meta = batch["metainfos"][j]
            name = f"{meta['episode_id']}_{meta['start_frame_idx']:03d}"
            lat_np = np.asarray(latents[j], dtype=np.float32)
            np.savez(out_dir / f"{name}_latents.npz", lat_np)
            if vae is not None:
                from orv_tpu.models.vae import decode_chunked

                z = jnp.asarray(lat_np)[None].transpose(0, 2, 1, 3, 4) / scaling
                video = decode_chunked(vae, vae_params, z, chunk_latent_frames=6)
                pool.submit(save_video, str(out_dir / f"{name}.mp4"),
                            to_uint8(np.asarray(video[0])), int(ev.get("save_fps", 8)),
                            bool(ev.get("save_gif", True)))
            results.append(name)
        CONSOLE.log(f"eval batch {bnum + 1}: {len(idxs)} episodes done")

    pool.shutdown(wait=True)
    with open(out_dir / f"manifest_{pid}.json", "w") as f:
        json.dump(results, f)
    _merge_manifests(out_dir, n_proc, pid)
    CONSOLE.log(f"evaluation complete: {len(results)} clips -> {out_dir}")
    return results


def _merge_manifests(out_dir: Path, n_proc: int, pid: int,
                     stem: str = "manifest") -> None:
    """Rank 0 merges every process's manifest into one {stem}.json
    (reference rank-0 tmp/{rank} merge, evaluation_control_to_video.py:
    409-434). Multi-host runs barrier first so every shard is on disk."""
    if n_proc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"orv_tpu_eval_{stem}")
    if pid != 0:
        return
    merged: List[str] = []
    # merge exactly this run's per-process shards — a bare glob would also
    # pick up stale {stem}_{k}.json files left by an earlier run with more
    # processes
    for k in range(n_proc):
        mf = out_dir / f"{stem}_{k}.json"
        if mf.exists():
            with open(mf) as f:
                merged.extend(json.load(f))
    with open(out_dir / f"{stem}.json", "w") as f:
        json.dump(sorted(set(merged)), f)


def _cascaded_rollout(cfg, dataset, dit_cfg, params, sample_jit, mode, scaling,
                      rng, vae, vae_params, out_dir, ev):
    """Long-horizon generation: per episode, run chunks in order; each chunk
    after the first is conditioned on the GENERATED frame at the previous
    chunk's next_start_frame_idx (reference evaluation_…py:351-379). With a
    VAE the chaining frame is re-encoded from pixels; without one (smoke
    mode) the matching latent frame carries over directly."""
    from collections import defaultdict

    episodes = defaultdict(list)
    for i, s in enumerate(dataset.samples):
        episodes[str(s["episode_id"])].append((s["sample_index"], i))
    # work-list sharding by EPISODE (a chunk chain must stay on one
    # process) — mirrors the batch path's indices[pid::n_proc]
    n_proc, pid = jax.process_count(), jax.process_index()
    ep_keys = sorted(episodes)[pid::n_proc]
    results = []
    C = dit_cfg.out_channels

    if dit_cfg.use_rotary_positional_embeddings:
        from orv_tpu.utils.embeddings import prepare_rotary_positional_embeddings
    for ep in ep_keys:
        chunk_list = episodes[ep]
        chunk_list.sort()
        rng, r_ep = jax.random.split(rng)
        image_latents = None
        chunks_out = []
        chunk_starts = []  # episode-frame start of each chunk (stitch dedup)
        for si, idx in chunk_list:
            item = dataset[idx]
            sample = dataset.samples[idx]
            item = {k: (v[None] if isinstance(v, np.ndarray) else v)
                    for k, v in item.items()}
            item = {k: (v[0] if isinstance(v, np.ndarray) else v)
                    for k, v in _encode_raw(
                        item, vae, vae_params, dit_cfg,
                        chunk_frames=int(cfg.dataset.get("encode_chunk_frames", 8))).items()}
            r_ep, r_img, r_noise, r_samp = jax.random.split(r_ep, 4)
            lat_m = jnp.asarray(item["latents"])[None]
            F_lat, H, W = lat_m.shape[2], lat_m.shape[3], lat_m.shape[4]
            if image_latents is None:  # first chunk: dataset reference image
                image_latents = prepare_image_latents(
                    jnp.asarray(item["image_latents"])[None], F_lat, r_img,
                    latent_channels=C, scaling_factor=scaling,
                ).astype(jnp.bfloat16)
            kwargs = {}
            if "actions" in item and "traj" in mode:
                kwargs["actions"] = jnp.asarray(item["actions"])[None].astype(jnp.bfloat16)
            # conditioned cascades: per-chunk occupancy controls ride along
            # exactly like the batch path (reference mode strings work in
            # cascaded evaluation too)
            r_ep, r_ctrl = jax.random.split(r_ep)
            if "depth" in mode and item.get("latents_depth") is not None:
                kwargs["depths"] = prepare_control_latents(
                    jnp.asarray(item["latents_depth"])[None], r_ctrl, C, scaling
                ).astype(jnp.bfloat16)
            if "label" in mode and item.get("latents_label") is not None:
                kwargs["labels"] = prepare_control_latents(
                    jnp.asarray(item["latents_label"])[None],
                    jax.random.fold_in(r_ctrl, 1), C, scaling,
                ).astype(jnp.bfloat16)
            if dit_cfg.use_rotary_positional_embeddings:
                # batch path parity — without the tables a RoPE model
                # (PatchEmbed has no learned positions) runs position-blind
                kwargs["image_rotary_emb"] = prepare_rotary_positional_embeddings(
                    height=H * 8, width=W * 8, num_frames=F_lat,
                    patch_size=dit_cfg.patch_size,
                    patch_size_t=dit_cfg.patch_size_t,
                    attention_head_dim=dit_cfg.attention_head_dim,
                )
            if item.get("prompt_embeds") is not None:
                prompt = jnp.asarray(item["prompt_embeds"])[None].astype(jnp.bfloat16)
            else:
                CONSOLE.log("[yellow]cascaded chunk has no prompt_embeds — "
                            "substituting ZEROS (see _encode_raw note)")
                prompt = jnp.zeros((1, dit_cfg.max_text_seq_length,
                                    dit_cfg.text_embed_dim), jnp.bfloat16)
            noise = jax.random.normal(r_noise, (1, F_lat, C, H, W), dtype=jnp.float32)
            latents = sample_jit(params, noise, image_latents, prompt, r_samp, **kwargs)
            chunks_out.append(np.asarray(latents[0], dtype=np.float32))
            chunk_starts.append(int(sample.get("start_frame_idx", 0)))

            nxt = sample.get("next_start_frame_idx")
            if nxt is not None:
                # raw-frame offset -> latent frame (8n+1 causal structure)
                f_lat_idx = min((int(nxt) + 3) // 4, F_lat - 1)
                if vae is not None:
                    from orv_tpu.models.vae import decode_chunked

                    z = latents[:, :, :].transpose(0, 2, 1, 3, 4) / scaling
                    video = decode_chunked(vae, vae_params, z, chunk_latent_frames=6)
                    raw_idx = min(int(nxt), video.shape[2] - 1)
                    frame = video[:, :, raw_idx : raw_idx + 1]  # [1, 3, 1, H, W]
                    moments = vae.apply(vae_params, frame, method=vae.encode)
                    ref = jnp.split(moments, 2, axis=1)[0] * scaling
                    ref = ref.transpose(0, 2, 1, 3, 4)  # [1, 1, C, h, w]
                else:
                    ref = latents[:, f_lat_idx : f_lat_idx + 1]
                pad = jnp.zeros((1, F_lat - 1, *ref.shape[2:]), ref.dtype)
                image_latents = jnp.concatenate([ref, pad], axis=1).astype(jnp.bfloat16)

        stitched = np.concatenate(chunks_out, axis=0)  # [sum F_lat, C, H, W]
        np.savez(out_dir / f"{ep}_cascaded_latents.npz", stitched,
                 chunk_starts=np.asarray(chunk_starts))
        if vae is not None:
            videos = []
            from orv_tpu.models.vae import decode_chunked

            for ch in chunks_out:
                z = jnp.asarray(ch)[None].transpose(0, 2, 1, 3, 4) / scaling
                videos.append(np.asarray(
                    decode_chunked(vae, vae_params, z, chunk_latent_frames=6)[0]))
            # chunks overlap in episode time: chunk j's prepended reference
            # frame repeats the chaining frame, and the regrown last chunk
            # (dataset back_start) can rewind by up to span-1 frames — drop
            # every leading frame already covered by the previous chunk so
            # the stitched video is monotonic in time (frame k of a chunk
            # sits at raw index start + k*interval)
            interval = max(1, int(cfg.dataset.get("sequence_interval", 1)))
            keep = [videos[0]]
            prev_end = chunk_starts[0] + (videos[0].shape[1] - 1) * interval
            for start, v in zip(chunk_starts[1:], videos[1:]):
                dup = max(0, -(-(prev_end + 1 - start) // interval))  # ceil
                keep.append(v[:, min(dup, v.shape[1]):])
                prev_end = start + (v.shape[1] - 1) * interval
            video = np.concatenate([v for v in keep if v.shape[1]], axis=1)
            save_video(str(out_dir / f"{ep}_cascaded.mp4"), to_uint8(video),
                       int(ev.get("save_fps", 8)), bool(ev.get("save_gif", True)))
        results.append(ep)
        CONSOLE.log(f"cascaded episode {ep}: {len(chunks_out)} chunks")
    with open(out_dir / f"manifest_cascaded_{pid}.json", "w") as f:
        json.dump(results, f)
    _merge_manifests(out_dir, n_proc, pid, stem="manifest_cascaded")
    CONSOLE.log(f"cascaded evaluation complete: {len(results)} episodes -> {out_dir}")
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", default=str(default_config_dir() / "base_eval.yaml"))
    p.add_argument("--experiment", default=None)
    p.add_argument("--dataset_type", default=None)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    exp = args.experiment
    if exp and not exp.endswith(".yaml"):
        for sub in ("eval", "experiments"):
            cand = default_config_dir() / sub / f"{exp}.yaml"
            if cand.exists():
                exp = str(cand)
                break
        else:
            raise SystemExit(
                f"no eval/experiment config named {exp!r} — looked for "
                f"{default_config_dir()}/{{eval,experiments}}/{exp}.yaml"
            )
    cfg = load_config(args.base, exp, args.dataset_type, None, args.overrides)
    return evaluate(cfg, max_batches=args.max_batches)


if __name__ == "__main__":
    main()

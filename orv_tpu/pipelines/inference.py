"""Single-episode demo inference (reference inference_control_to_video.py).

Generates an action-conditioned video from one reference frame + a
trajectory, via DemoRobotDataset (folder-per-episode raw frames):

  python -m orv_tpu.pipelines.inference --demo_root data/demo \
      --transformer_path outputs/.../checkpoint --vae_path <hf vae folder>
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orv_tpu.data import DatasetConfig, DemoRobotDataset
from orv_tpu.models import ControlDiT, DiTConfig
from orv_tpu.models.vae import CausalVAE, VAEConfig, tiled_decode
from orv_tpu.pipelines.evaluate import save_video, to_uint8
from orv_tpu.pipelines.sample import SamplerConfig, make_sampler
from orv_tpu.schedulers import make_schedule
from orv_tpu.utils.checkpoint import load_pretrained
from orv_tpu.utils.logging import CONSOLE


def generate_video(
    dit_cfg: DiTConfig,
    params,
    vae: CausalVAE,
    vae_params,
    ref_image: np.ndarray,  # [H, W, 3] in [-1, 1]
    actions: Optional[np.ndarray],  # [F_raw, 7]
    prompt_embeds: np.ndarray,  # [S, D]
    num_frames: int = 17,
    num_inference_steps: int = 50,
    guidance_scale: float = 1.0,
    scaling_factor: float = 1.15258426,
    seed: int = 42,
    pab_skip: int = 0,  # PAB attention broadcast (approximate; sample.py)
):
    """-> video [C, T, H, W] f32 in [-1, 1]."""
    H, W = ref_image.shape[:2]
    F_lat = (num_frames - 1) // 4 + 1
    h, w = H // 8, W // 8
    rng = jax.random.PRNGKey(seed)
    r_noise, r_samp = jax.random.split(rng)

    # encode the reference frame (mean of the posterior, like retrieve_latents
    # with a fixed generator)
    ref = jnp.asarray(ref_image.transpose(2, 0, 1))[None, :, None]  # [1, 3, 1, H, W]
    moments = vae.apply(vae_params, ref, method=vae.encode)
    img_lat = jnp.split(moments, 2, axis=1)[0] * scaling_factor  # mean
    img_lat = img_lat.transpose(0, 2, 1, 3, 4)  # [1, 1, C, h, w]
    pad = jnp.zeros((1, F_lat - 1, *img_lat.shape[2:]), img_lat.dtype)
    image_latents = jnp.concatenate([img_lat, pad], axis=1).astype(jnp.bfloat16)

    sampler = make_sampler(
        lambda p, *a, **k: ControlDiT(dit_cfg, dtype=jnp.bfloat16).apply(p, *a, **k),
        make_schedule(),
        SamplerConfig(num_inference_steps=num_inference_steps,
                      guidance_scale=guidance_scale, pab_skip=pab_skip),
    )
    noise = jax.random.normal(r_noise, (1, F_lat, dit_cfg.out_channels, h, w))
    kwargs = {}
    if actions is not None:
        kwargs["actions"] = jnp.asarray(actions)[None].astype(jnp.bfloat16)
    if dit_cfg.use_rotary_positional_embeddings:
        # RoPE checkpoints have no learned positions (PatchEmbed) — without
        # the tables the model runs position-blind
        from orv_tpu.utils.embeddings import prepare_rotary_positional_embeddings

        kwargs["image_rotary_emb"] = prepare_rotary_positional_embeddings(
            height=h * 8, width=w * 8, num_frames=F_lat,
            patch_size=dit_cfg.patch_size, patch_size_t=dit_cfg.patch_size_t,
            attention_head_dim=dit_cfg.attention_head_dim,
        )
    latents = jax.jit(sampler)(
        params, noise, image_latents,
        jnp.asarray(prompt_embeds)[None].astype(jnp.bfloat16), r_samp, **kwargs,
    )
    z = latents.transpose(0, 2, 1, 3, 4) / scaling_factor
    from orv_tpu.models.vae import decode_chunked

    video = decode_chunked(vae, vae_params, z, chunk_latent_frames=6)
    return np.asarray(video[0])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--demo_root", required=True)
    p.add_argument("--transformer_path", default=None)
    p.add_argument("--vae_path", default=None)
    p.add_argument("--output_dir", default="demo_outputs")
    p.add_argument("--num_frames", type=int, default=17)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--pab_skip", type=int, default=0,
                   help="PAB attention broadcast (0=off, approximate)")
    p.add_argument("--episode", type=int, default=0)
    args = p.parse_args(argv)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.transformer_path and (Path(args.transformer_path) / "model.msgpack").exists():
        dit_cfg, params = load_pretrained(args.transformer_path, DiTConfig)
    else:
        CONSOLE.log("[yellow]no transformer checkpoint — tiny random model (smoke)")
        dit_cfg = DiTConfig(num_attention_heads=4, attention_head_dim=16, num_layers=2,
                            in_channels=32, out_channels=16, text_embed_dim=32,
                            time_embed_dim=64, max_text_seq_length=8)
        model = ControlDiT(dit_cfg, dtype=jnp.bfloat16)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 2, 32, 8, 8), jnp.bfloat16),
            jnp.zeros((1, 8, dit_cfg.text_embed_dim), jnp.bfloat16),
            jnp.zeros((1,), jnp.int32),
            actions=jnp.zeros((1, 7, 7), jnp.bfloat16),
        )

    vae = CausalVAE(VAEConfig(), dtype=jnp.bfloat16)
    if args.vae_path and Path(args.vae_path).exists():
        from orv_tpu.models.weights import convert_vae_state_dict, load_torch_state_dict

        vae_params = convert_vae_state_dict(load_torch_state_dict(args.vae_path), VAEConfig())
    else:
        CONSOLE.log("[yellow]no VAE checkpoint — random VAE (smoke)")
        vae_params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, 32, 32)))

    ds = DemoRobotDataset(DatasetConfig(
        data_root=args.demo_root, sequence_length=args.num_frames - 1,
        start_frame_interval=10**6,
    ))
    item = ds[args.episode]
    prompt_embeds = np.zeros(
        (dit_cfg.max_text_seq_length, dit_cfg.text_embed_dim), np.float32
    )
    video = generate_video(
        dit_cfg, params, vae, vae_params, item["ref_image"], item.get("actions"),
        prompt_embeds, num_frames=args.num_frames,
        num_inference_steps=args.num_inference_steps,
        pab_skip=args.pab_skip,
    )
    name = item["metainfo"]["episode_id"]
    save_video(str(out_dir / f"{name}.mp4"), to_uint8(video))
    CONSOLE.log(f"wrote {out_dir / f'{name}.mp4'}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""PAB quality harness (VERDICT r3 #2): measure what the PAB attention
broadcast (arXiv 2408.12588, SamplerConfig.pab_skip) costs in output
quality on REAL weights.

Methodology follows the PAB paper's own eval: generate N clips with the
exact sampler (pab_skip=0) and with broadcast (pab_skip=K) from IDENTICAL
noise/conditions/seeds, then report

  - per-clip PSNR / LPIPS-free pixel deltas between the two renders
    (broadcast vs exact is a controlled approximation, so the exact render
    is the ground truth), and
  - FVD between the two sets when an I3D checkpoint is available
    (ORV_TPU_I3D_CKPT, converted via models/feature_extractors.py).

No weights ship in this container (re-confirmed 2026-08-19), so this
script is exercised by the weights-gated tests/test_pab_quality.py the
day a checkpoint lands. Speed is measured separately (bench.py
ORV_TPU_BENCH_PAB=1; measured 2026-08-19: 7.285s vs 11.02s per 50-step
scan on one v5e chip = 1.51x).

Usage:
  python scripts/pab_quality.py --ckpt /path/to/CogVideoX-2b \
      [--n-clips 4] [--pab-skip 2] [--steps 50] [--out report.json]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _psnr(a: np.ndarray, b: np.ndarray, peak: float = 2.0) -> float:
    """PSNR between two [-1, 1] videos."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def run(ckpt: str, n_clips: int = 4, pab_skip: int = 2, steps: int = 50,
        out: str = None, i3d_ckpt: str = None) -> int:
    import jax
    import jax.numpy as jnp

    from orv_tpu.models import ControlDiT, DiTConfig
    from orv_tpu.models.vae import CausalVAE, VAEConfig, decode_chunked
    from orv_tpu.models.weights import (
        convert_dit_state_dict, convert_vae_state_dict, load_torch_state_dict,
    )
    from orv_tpu.pipelines.sample import SamplerConfig, make_sampler
    from orv_tpu.schedulers import make_schedule

    ckpt = Path(ckpt)
    sd = load_torch_state_dict(str(ckpt / "transformer"))
    dit_cfg = DiTConfig(
        num_attention_heads=30, attention_head_dim=64, num_layers=30,
        in_channels=32, out_channels=16, text_embed_dim=4096,
        time_embed_dim=512, modulate_encoder_hidden_states=True,
    )
    params = convert_dit_state_dict(sd, dit_cfg)
    model = ControlDiT(dit_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)

    vae_params = None
    vae = None
    if (ckpt / "vae").exists():
        vae_cfg = VAEConfig()
        vae_params = convert_vae_state_dict(
            load_torch_state_dict(str(ckpt / "vae")), vae_cfg)
        vae = CausalVAE(vae_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)

    schedule = make_schedule()
    exact = make_sampler(model.apply, schedule,
                         SamplerConfig(num_inference_steps=steps))
    pab = make_sampler(model.apply, schedule,
                       SamplerConfig(num_inference_steps=steps,
                                     pab_skip=pab_skip))
    run_exact = jax.jit(exact)
    run_pab = jax.jit(pab)

    B, F, C, H, W = 1, 13, 16, 40, 60
    report = {"pab_skip": pab_skip, "steps": steps, "clips": []}
    vids_exact, vids_pab = [], []
    for i in range(n_clips):
        key = jax.random.PRNGKey(1000 + i)
        klat, kimg, kenc, krun = jax.random.split(key, 4)
        lat = jax.random.normal(klat, (B, F, C, H, W), jnp.float32)
        img = jax.random.normal(kimg, lat.shape, jnp.bfloat16) * 0.1
        enc = jax.random.normal(kenc, (B, 226, 4096), jnp.bfloat16) * 0.3
        le = run_exact(params, lat, img, enc, krun)
        lp = run_pab(params, lat, img, enc, krun)
        clip = {"latent_mae": float(jnp.mean(jnp.abs(le - lp))),
                "latent_psnr": _psnr(np.asarray(le), np.asarray(lp))}
        if vae is not None:
            to_z = lambda l: jnp.transpose(l, (0, 2, 1, 3, 4)).astype(jnp.bfloat16)
            ve = np.asarray(decode_chunked(vae, vae_params, to_z(le),
                                           chunk_latent_frames=4), np.float32)
            vp = np.asarray(decode_chunked(vae, vae_params, to_z(lp),
                                           chunk_latent_frames=4), np.float32)
            clip["pixel_psnr"] = _psnr(ve, vp)
            vids_exact.append(ve)
            vids_pab.append(vp)
        report["clips"].append(clip)
        print(f"clip {i}: {clip}", flush=True)

    report["mean_latent_psnr"] = float(np.mean(
        [c["latent_psnr"] for c in report["clips"]]))
    if vids_exact:
        report["mean_pixel_psnr"] = float(np.mean(
            [c["pixel_psnr"] for c in report["clips"]]))
    if i3d_ckpt and vids_exact:
        from orv_tpu.models.feature_extractors import i3d_features
        from orv_tpu.pipelines.metrics import compute_fvd

        # decode output is [B, 3, T, H, W] in [-1, 1]; compute_fvd wants a
        # sequence of [T, H, W, C] videos in [0, 1]
        to_thwc = lambda v: np.clip(v[0].transpose(1, 2, 3, 0) * 0.5 + 0.5, 0, 1)
        report["fvd_pab_vs_exact"] = {
            str(k): float(v) for k, v in compute_fvd(
                [to_thwc(v) for v in vids_exact],
                [to_thwc(v) for v in vids_pab],
                i3d_features(i3d_ckpt)).items()}
    print(json.dumps({k: v for k, v in report.items() if k != "clips"}))
    if out:
        Path(out).write_text(json.dumps(report, indent=1))
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--n-clips", type=int, default=4)
    ap.add_argument("--pab-skip", type=int, default=2)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default=None)
    ap.add_argument("--i3d-ckpt", default=None)
    a = ap.parse_args(argv)
    return run(a.ckpt, a.n_clips, a.pab_skip, a.steps, a.out, a.i3d_ckpt)


if __name__ == "__main__":
    sys.exit(main())

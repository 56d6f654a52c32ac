#!/usr/bin/env python
"""Real-weight parity harness (SURVEY hard-part #1: weight-mapping is easy
to get silently wrong; reference from_pretrained surgery
cogvideox_control.py:950-1054).

Given a local CogVideoX-2b checkpoint folder (HF layout:
  <ckpt>/transformer/diffusion_pytorch_model*.safetensors (+ config.json)
  <ckpt>/vae/diffusion_pytorch_model.safetensors
), this script:

  1. converts both state dicts with models/weights.py,
  2. runs a VAE encode/decode roundtrip on a synthetic clip and a one-step
     DiT forward on fixed inputs,
  3. compares against golden activations. Goldens come from
     `--record <out.npz>` run under the SAME inputs with the torch
     reference stack (run that on a CUDA box with the reference repo), or
     are bootstrapped from our own first run (`--bootstrap`) to lock
     against regressions.

Usage:
  python scripts/check_real_weights.py --ckpt /path/to/CogVideoX-2b \
      [--golden goldens.npz] [--bootstrap out.npz]

tests/test_real_weights.py runs this automatically when
$ORV_TPU_COGVIDEOX_CKPT points at a checkpoint (skipped otherwise — no
weights ship in this container).
"""

import argparse
import sys
from pathlib import Path

import numpy as np


def _fixed_inputs(dit_cfg):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, F, H, W = 1, 2, 16, 24
    x = jnp.asarray(rng.normal(size=(B, F, dit_cfg.in_channels, H, W)), jnp.float32) * 0.3
    enc = jnp.asarray(rng.normal(size=(B, dit_cfg.max_text_seq_length,
                                       dit_cfg.text_embed_dim)), jnp.float32) * 0.3
    t = jnp.asarray([500], jnp.int32)
    return x, enc, t


def run(ckpt: str, golden: str = None, bootstrap: str = None,
        atol_vae: float = 5e-2, atol_dit: float = 5e-2):
    import jax.numpy as jnp

    from orv_tpu.models import ControlDiT, DiTConfig
    from orv_tpu.models.vae import CausalVAE, VAEConfig
    from orv_tpu.models.weights import (
        convert_dit_state_dict, convert_vae_state_dict, load_torch_state_dict,
    )

    ckpt = Path(ckpt)
    out = {}

    # --- VAE roundtrip ----------------------------------------------------
    vae_dir = ckpt / "vae"
    if vae_dir.exists():
        sd = load_torch_state_dict(str(vae_dir))
        vae_cfg = VAEConfig()
        params = convert_vae_state_dict(sd, vae_cfg)
        vae = CausalVAE(vae_cfg, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        video = jnp.asarray(rng.uniform(-1, 1, (1, 3, 9, 64, 96)), jnp.float32)
        moments = vae.apply(params, video, method=vae.encode)
        mean = jnp.split(moments, 2, axis=1)[0]
        recon = vae.apply(params, mean, method=vae.decode)
        out["vae_moments"] = np.asarray(moments, np.float32)
        out["vae_recon"] = np.asarray(recon, np.float32)
        print(f"VAE: moments {moments.shape}, recon {recon.shape}, "
              f"recon range [{float(recon.min()):.3f}, {float(recon.max()):.3f}]")
    else:
        print(f"!! no VAE at {vae_dir} — skipping VAE check", file=sys.stderr)

    # --- DiT one-step forward ----------------------------------------------
    tr_dir = ckpt / "transformer"
    if tr_dir.exists():
        sd = load_torch_state_dict(str(tr_dir))
        dit_cfg = DiTConfig(  # CogVideoX-2b T2V geometry
            num_attention_heads=30, attention_head_dim=64, num_layers=30,
            in_channels=16, out_channels=16, text_embed_dim=4096,
            time_embed_dim=512, modulate_encoder_hidden_states=True,
        )
        params = convert_dit_state_dict(sd, dit_cfg, from_t2v=False)
        model = ControlDiT(dit_cfg, dtype=jnp.float32, attn_impl="xla")
        x, enc, t = _fixed_inputs(dit_cfg)
        pred, _, _ = model.apply(params, x, enc, t)
        out["dit_pred"] = np.asarray(pred, np.float32)
        print(f"DiT: pred {pred.shape}, |pred| mean {float(abs(pred).mean()):.4f}")
    else:
        print(f"!! no transformer at {tr_dir} — skipping DiT check", file=sys.stderr)

    if bootstrap:
        np.savez(bootstrap, **out)
        print(f"bootstrapped goldens -> {bootstrap}")
        return 0

    if golden:
        gold = np.load(golden)
        ok = True
        for k, v in out.items():
            if k not in gold:
                print(f"!! golden missing {k}", file=sys.stderr)
                ok = False
                continue
            err = float(np.max(np.abs(gold[k] - v)))
            tol = atol_vae if k.startswith("vae") else atol_dit
            status = "OK" if err <= tol else "FAIL"
            print(f"{k}: max|Δ| = {err:.5f} (tol {tol}) {status}")
            ok &= err <= tol
        return 0 if ok else 1
    return 0


def run_metrics(inception_sd: str = None, i3d_sd: str = None,
                atol: float = 1e-3) -> int:
    """Validate the FID/FVD feature extractors against real torch weights
    the moment they appear (round-5 VERDICT #7; reference
    compute_metrics.py:207-376 uses pytorch-fid InceptionV3 and the
    StyleGAN-V I3D). For each provided torch state-dict/TorchScript file:

      1. convert with models/feature_extractors.convert_*_state_dict and
         run the flax net on a fixed input;
      2. if the matching torch implementation is importable (torchvision /
         pytorch_fid / a TorchScript archive), run it on the SAME input
         and report max|Δ| — the definitive numeric-equivalence check;
      3. otherwise print the flax activations so they can be diffed
         offline against a torch run of the same file.

    Until weights exist, tests/test_feature_extractors.py's golden tests
    guard the architectures against refactor drift."""
    import jax
    import jax.numpy as jnp
    import torch

    from orv_tpu.models.feature_extractors import (
        I3D, InceptionV3Pool3, convert_i3d_state_dict,
        convert_inception_state_dict,
    )

    rng = np.random.default_rng(0)
    rc = 0
    if inception_sd:
        x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
        sd = torch.load(inception_sd, map_location="cpu", weights_only=False)
        sd = getattr(sd, "state_dict", lambda: sd)()
        sd = {k: np.asarray(v) for k, v in sd.items()}
        params = convert_inception_state_dict(sd)
        ours = np.asarray(InceptionV3Pool3().apply(params, jnp.asarray(x)))
        print(f"inception flax pool3: mean {ours.mean():.6f} std {ours.std():.6f}")
        ref = None
        try:
            from pytorch_fid.inception import InceptionV3

            net = InceptionV3([3], resize_input=False, normalize_input=False)
            net.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()},
                                strict=False)
            net.eval()
            with torch.no_grad():
                ref = net(torch.from_numpy(x).permute(0, 3, 1, 2))[0]
            ref = ref.squeeze(-1).squeeze(-1).numpy()
        except ImportError:
            print("pytorch_fid not installed — torch-side diff skipped; "
                  "flax activations printed above for offline comparison")
        if ref is not None:
            err = float(np.max(np.abs(ref - ours)))
            print(f"inception max|Δ| vs pytorch-fid: {err:.6f} "
                  f"({'OK' if err <= atol else 'FAIL'})")
            rc |= int(err > atol)
    if i3d_sd:
        x = rng.uniform(-1, 1, (1, 16, 224, 224, 3)).astype(np.float32)
        obj = torch.load(i3d_sd, map_location="cpu", weights_only=False) \
            if not i3d_sd.endswith(".jit") else torch.jit.load(i3d_sd)
        ref = None
        if isinstance(obj, torch.jit.ScriptModule):
            # the StyleGAN-V TorchScript archive: run it directly
            with torch.no_grad():
                ref = obj(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                          rescale=False, resize=False,
                          return_features=False).numpy()
            sd = {k: np.asarray(v) for k, v in obj.state_dict().items()}
        else:
            sd = {k: np.asarray(v) for k, v in
                  getattr(obj, "state_dict", lambda: obj)().items()}
        params = convert_i3d_state_dict(sd)
        ours = np.asarray(I3D().apply(params, jnp.asarray(x)))
        print(f"i3d flax logits: mean {ours.mean():.6f} std {ours.std():.6f}")
        if ref is not None:
            err = float(np.max(np.abs(ref - ours)))
            print(f"i3d max|Δ| vs TorchScript: {err:.6f} "
                  f"({'OK' if err <= atol else 'FAIL'})")
            rc |= int(err > atol)
    return rc


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--golden", default=None)
    p.add_argument("--bootstrap", default=None)
    p.add_argument("--metrics-inception", default=None,
                   help="torch state-dict/pickle of pytorch-fid InceptionV3")
    p.add_argument("--metrics-i3d", default=None,
                   help="torch state-dict or TorchScript (.jit) of the FVD I3D")
    args = p.parse_args(argv)
    rc = 0
    if args.metrics_inception or args.metrics_i3d:
        rc |= run_metrics(args.metrics_inception, args.metrics_i3d)
    if args.ckpt:
        rc |= run(args.ckpt, args.golden, args.bootstrap)
    elif not (args.metrics_inception or args.metrics_i3d):
        p.error("provide --ckpt and/or --metrics-inception/--metrics-i3d")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

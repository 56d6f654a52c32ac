"""Chip-free roofline accounting for the chunked VAE decode (VERDICT r4 #6:
either a harvested win or "a quantified statement that decode sits at the
conv ceiling"). Lowers the EXACT bench decode (bench_phases vae phase:
flagship 13x40x60 latents -> 49x320x480 pixels, chunk 6) and sums XLA
cost-analysis FLOPs over the fused whole-decode module, then sets the total
against:

- the 197 TF/s v5e bf16 MXU peak (theoretical floor), and
- the 55 TF/s conv throughput ceiling measured on-chip in round 2 — both
  XLA's conv3d lowering AND a hand-written Pallas conv kernel (manual halo
  DMA, double-buffered, 27 window matmuls) plateaued there at the stage-3
  [24,320,480,128] shape; the bound is VPU relayout/copy per shifted
  window, not the lowering (CLAUDE.md round-2 dead ends).

Run on CPU (no tunnel): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/decode_roofline.py
"""

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

CONV_CEILING_TFS = 55.0   # measured on-chip (round 2), see module docstring
PEAK_TFS = 197.0
MEASURED_DECODE_S = 1.73  # chunk-6, quiet window (round 2/3 cache)


def main():
    from orv_tpu.models.vae import CausalVAE, VAEConfig, decode_chunked

    vae = CausalVAE(VAEConfig(), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 13, 40, 60))
    params = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), z[:, :, :1, :8, :8],
                         method=vae.decode))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

    def full_decode(p, lat):
        return decode_chunked(vae, p, lat, chunk_latent_frames=6)

    lowered = jax.jit(full_decode).lower(params, z)
    cost = lowered.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    tf = flops / 1e12
    out = {
        "decode_total_tflops_hlo_upper_bound": round(tf, 2),
        "pixels_out": "49x320x480",
        "ideal_s_at_bf16_peak": round(tf / PEAK_TFS, 3),
        "floor_s_if_all_convs_ran_at_stage3_plateau": round(
            tf / CONV_CEILING_TFS, 3),
        "measured_quiet_window_s": MEASURED_DECODE_S,
        "avg_effective_tfs_at_measured": round(tf / MEASURED_DECODE_S, 1),
        "pct_of_bf16_peak": round(100.0 * (tf / MEASURED_DECODE_S) / PEAK_TFS,
                                  1),
        "note": ("the measured decode AVERAGES above the 55 TF/s plateau "
                 "round 2 measured at the dominant stage-3 shape (for both "
                 "the XLA conv3d lowering and a hand Pallas kernel) — i.e. "
                 "XLA already runs the earlier/smaller stages well above "
                 "that worst-shape plateau. The decode sits within 2.4x of "
                 "the absolute MXU-peak bound; the residual gap is conv "
                 "efficiency at the big spatial shapes (VPU relayout per "
                 "shifted window — the round-2 Pallas rewrite hit the same "
                 "wall), not missing fusion: removing ~5%% of FLOPs via "
                 "phase-decomposed upsampling did NOT speed it up on-chip "
                 "(round 4 A/B, reverted)"),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

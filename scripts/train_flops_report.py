"""Chip-free FLOPs/roofline accounting for the bench train phase (VERDICT
r4 #5: "where does the remaining time go"). Traces the EXACT 1.4B train
step (same constructor knobs as bench_phases.bench_train) and counts
matmul FLOPs by walking the jaxpr — multiplying `scan` bodies by their
trip count, which XLA's HloCostAnalysis does NOT do (a scanned-28-layer
model under-reports ~28x there; verified: lowered.cost_analysis() said
0.99 TF for a step that executes ~35 TF).

The counter decomposes the gap between the naive 6*N*tok MFU denominator
(what bench reports) and the matmul work the step actually executes:

- 6*N*tok counts parameter matmuls fwd+bwd only;
- per-block remat (policy="dots") recomputes the forward between saved
  dot outputs in the backward scan — those dots appear again in the
  backward jaxpr and are counted at their real multiplicity;
- attention score/PV matmuls are O(S^2) and invisible in 6*N*tok —
  classified here by shape (two of (m,n,k) ~ S with the third <= 256).

Run on CPU (no tunnel needed):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/train_flops_report.py [B]

Prints a JSON report; scripts/profile_train.py gives the measured
device-time split to set against this FLOP-side budget.
"""

import json
import math
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.extend import core as jcore


def _prod(xs):
    return math.prod(xs) if xs else 1


def _dot_mnk(eqn):
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval
    rhs = eqn.invars[1].aval
    batch = _prod([lhs.shape[i] for i in lb])
    k = _prod([lhs.shape[i] for i in lc])
    m = _prod(lhs.shape) // max(batch * k, 1)
    n = _prod(rhs.shape) // max(batch * k, 1)
    return batch, m, n, k


def _conv_flops(eqn):
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval  # kernel
    dn = eqn.params["dimension_numbers"]
    cin = rhs.shape[dn.rhs_spec[1]]
    spatial_k = _prod([rhs.shape[i] for i in dn.rhs_spec[2:]])
    return 2 * _prod(out.shape) * cin * spatial_k


def count_flops(jaxpr, mult=1, acc=None):
    """Walk a jaxpr, accumulating matmul/conv FLOPs into
    {'attention': f, 'param': f, 'conv': f}; scan bodies are multiplied by
    their trip count, every other sub-jaxpr (pjit, remat, custom_vjp,
    cond branches) inherits the caller's multiplicity."""
    if acc is None:
        acc = {"attention": 0.0, "param": 0.0, "conv": 0.0}
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            b, m, n, k = _dot_mnk(eqn)
            f = mult * 2.0 * b * m * n * k
            dims = sorted([m, n, k])
            # attention: QK^T ([S,D]x[S,D] -> SxS) or PV ([S,S]x[S,D]):
            # two dims at sequence length, the smallest <= 256 (head dim)
            if dims[0] <= 256 and dims[1] > 1024 and dims[2] > 1024 \
                    and abs(dims[1] - dims[2]) < dims[2] * 0.5:
                acc["attention"] += f
            else:
                acc["param"] += f
        elif name == "conv_general_dilated":
            acc["conv"] += mult * _conv_flops(eqn)
        elif name == "scan":
            count_flops(eqn.params["jaxpr"].jaxpr,
                        mult * eqn.params["length"], acc)
        elif name == "while":
            # trip count unknown at trace time — count the body once
            count_flops(eqn.params["body_jaxpr"].jaxpr, mult, acc)
        elif name == "cond":
            # upper-bound with the most expensive branch
            best = None
            for br in eqn.params["branches"]:
                sub = count_flops(br.jaxpr, mult)
                tot = sum(sub.values())
                if best is None or tot > sum(best.values()):
                    best = sub
            for k2, v in (best or {}).items():
                acc[k2] += v
        else:
            for v in eqn.params.values():
                if isinstance(v, jcore.ClosedJaxpr):
                    count_flops(v.jaxpr, mult, acc)
                elif isinstance(v, jcore.Jaxpr):
                    count_flops(v, mult, acc)
    return acc


def main():
    from bench_phases import TRAIN_N_PARAMS, TRAIN_TOKENS_PER_SAMPLE, V5E_BF16_PEAK, HEIGHT, WIDTH
    from orv_tpu.models import ControlDiT, DiTConfig
    from orv_tpu.parallel import TrainState, make_lr_schedule, make_optimizer, make_train_step
    from orv_tpu.schedulers import make_schedule
    from orv_tpu.utils.embeddings import prepare_rotary_positional_embeddings

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = DiTConfig(
        num_attention_heads=28, attention_head_dim=64, num_layers=28,
        in_channels=32, out_channels=16, text_embed_dim=4096, time_embed_dim=512,
        sample_width=60, sample_height=40, sample_frames=17,
        use_rotary_positional_embeddings=True,
        modulate_encoder_hidden_states=False, recon_action=True,
    )
    model = ControlDiT(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                       remat=True, remat_policy="dots")
    F, C, H, W = 5, 16, 40, 60
    batch = {
        "latents": jax.ShapeDtypeStruct((B, 2 * C, F, H, W), jnp.float32),
        "image_latents": jax.ShapeDtypeStruct((B, 2 * C, 1, H, W), jnp.float32),
        "prompt_embeds": jax.ShapeDtypeStruct((B, 226, 4096), jnp.bfloat16),
        "actions": jax.ShapeDtypeStruct((B, F * 4 - 4, 7), jnp.float32),
    }
    rope = prepare_rotary_positional_embeddings(
        height=HEIGHT, width=WIDTH, num_frames=F,
        attention_head_dim=cfg.attention_head_dim,
        base_height=320, base_width=480,
    )

    def init():
        key = jax.random.PRNGKey
        return model.init(
            {"params": key(0), "action_mask": key(1)},
            jnp.zeros((B, F, C * 2, H, W), jnp.bfloat16),
            jnp.zeros((B, 226, 4096), jnp.bfloat16), jnp.zeros((B,), jnp.int32),
            actions=jnp.zeros((B, F * 4 - 4, 7)), image_rotary_emb=rope,
            deterministic=False,
        )

    params_shapes = jax.eval_shape(init)
    tx = make_optimizer(make_lr_schedule(warmup_steps=0, total_steps=1000))
    opt_shapes = jax.eval_shape(tx.init, params_shapes)
    state_shapes = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32),
        params=params_shapes, opt_state=opt_shapes)
    step = make_train_step(model.apply, tx, make_schedule(), recon_action=True,
                           image_rotary_emb=rope)
    jaxpr = jax.make_jaxpr(
        lambda s, b, r: step(s, b, r))(
        state_shapes, batch, jax.ShapeDtypeStruct((2,), jnp.uint32))
    acc = count_flops(jaxpr.jaxpr)

    N = TRAIN_N_PARAMS
    S = TRAIN_TOKENS_PER_SAMPLE
    model_6ntok = 6.0 * N * S * B
    total = sum(acc.values())
    # HBM roofline for the optimizer tail: params + adamw bf16 moments
    # read+write, grads read (one pass each, bf16)
    opt_bytes = N * 2 * (2 + 4 + 1)
    hbm_gbps = 819e9
    report = {
        "batch": B,
        "matmul_flops_traced": {k: round(v / 1e12, 3) for k, v in acc.items()},
        "matmul_tflops_total": round(total / 1e12, 3),
        "model_6ntok_tflops": round(model_6ntok / 1e12, 3),
        "hw_work_over_6ntok": round(total / model_6ntok, 3),
        "ideal_matmul_step_s_at_peak": round(total / V5E_BF16_PEAK, 4),
        "optimizer_hbm_s_est": round(opt_bytes / hbm_gbps, 4),
        "roofline_step_s": round(total / V5E_BF16_PEAK + opt_bytes / hbm_gbps, 4),
        "note": "bench MFU%% = 6*N*tok/s / peak; hardware utilization = "
                "reported MFU * hw_work_over_6ntok + HBM tail; roofline_step_s"
                " is the matmul+optimizer lower bound at 100%% MXU/HBM",
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

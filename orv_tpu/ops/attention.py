"""Fused multi-head attention for the joint text+video DiT sequence.

TPU-native replacement for the reference's single SDPA call over the
concatenated [text, video] sequence (reference cogvideox_control.py:256).
The sequence is bidirectional (no causal mask); the only masking needed is
tail padding when S is not a multiple of the kernel block size, which is
static at trace time.

Two implementations:
  * `mha_reference` — plain jnp einsum/softmax; O(S^2) memory. Used for
    parity tests and as a CPU fallback.
  * `flash_attention` — Pallas online-softmax kernel (fwd + custom-VJP bwd)
    that never materializes the S×S matrix. The grid iterates KV blocks in
    the innermost ("arbitrary") dimension with f32 running (max, sum, acc)
    scratch carried across grid steps, which Mosaic pipelines against the
    KV DMA stream.

Layout: q, k, v are [B, H, S, D]. D is the head dim (64 for CogVideoX).
The saved logsumexp rides a 128-lane-broadcast [BH, S, 128] buffer (the
minimal TPU-tileable layout for per-row scalars); the backward kernels
recompute delta = rowsum(dO·O) in-kernel instead of materializing it.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _interpret() -> bool:
    """Run Pallas in interpreter mode off-TPU (CPU test meshes). Honors
    jax_default_device overrides (tests steer to CPU while the axon TPU
    backend stays registered)."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", "cpu") != "tpu"
    return jax.default_backend() != "tpu"


def mha_reference(q, k, v, scale: Optional[float] = None):
    """[B,H,S,D] jnp reference attention (f32 softmax)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, kv_len, block_k):
    """Transposed ("kv-major") layout: the score tile is computed as
    s^T = K @ Q^T [bk, bq] and the PV accumulation as V^T @ P^T [D, bq].

    Why: at head_dim 64 the classic q-major layout runs BOTH matmuls at
    half MXU utilization (QK^T has contraction 64, PV has only 64 output
    lanes) — and PV measures ~40 TF/s on v5e. Transposing puts PV's
    contraction on bk (2048) and its output lanes on bq (512): full MXU,
    ~2.3x faster, bit-identical math. QK^T keeps contraction 64 either way.
    P^T is exactly the s^T tile, so no transpose ever materializes; the
    only relayout is the [D, bq] -> [bq, D] output flip once per q block.

    q is pre-scaled by sm_scale outside the kernel. The softmax denominator
    is a VPU sublane-reduce of p^T per tile (a [bk, bq] f32 sum — ~µs on
    the VPU) accumulated in l_scr; riding it as a ones-row of v would pad
    the PV matmul's sublane dim 64 -> 80, +25% MXU work (~10 ms/step at
    the flagship shape). Per-query running stats (m, l) live along lanes
    [1, bq], broadcasting freely over the accumulator's sublanes. Tail-key
    masking runs only on the final KV block (rows of s^T)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_t = q_ref[0]  # [d, bq] (pre-transposed outside the kernel)
    k = k_ref[0]  # [bk, d]
    s_t = jax.lax.dot_general(
        k, q_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, bq]

    if kv_len % block_k != 0:  # only the final KV block holds padded keys
        key_idx = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
        not_last = ki != nk - 1
        s_t = jnp.where(jnp.logical_or(not_last, key_idx < kv_len), s_t, NEG_INF)

    m_prev = m_scr[:1]  # [1, bq]
    m_new = jnp.maximum(m_prev, jnp.max(s_t, axis=0, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)  # [1, bq]
    p_t = jnp.exp(s_t - m_new)  # [bk, bq]

    l_scr[:1] = l_scr[:1] * alpha + jnp.sum(p_t, axis=0, keepdims=True)
    # PV^T matmul [D, bq]: contraction bk, lanes bq — full MXU
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        v_ref[0], p_t.astype(v_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ki == nk - 1)
    def _finish():
        l = l_scr[:1]  # [1, bq]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe).T.astype(o_ref.dtype)
        lse = (m_scr[:1] + jnp.log(l_safe)).T  # [bq, 1]
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _fwd_kernel_static_max(q_ref, k_ref, v_ref, o_ref, lse_ref, l_scr, acc_scr,
                           *, kv_len, block_k, static_max):
    """Static-max variant of the transposed kernel (see _fwd_kernel): valid
    when logits are provably bounded (this DiT qk-LayerNorms every head, so
    |s| <= |q||k|*scale ~ 8 << f32 exp range). Skips the running-max reduce
    and the accumulator rescale. lse output is exact, so the backward
    kernels are shared with the online-softmax path."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s_t = jax.lax.dot_general(
        k_ref[0], q_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, bq]

    def accumulate(s_t):
        p_t = jnp.exp(s_t - static_max)
        l_scr[:1] += jnp.sum(p_t, axis=0, keepdims=True)
        acc_scr[:] += jax.lax.dot_general(
            v_ref[0], p_t.astype(v_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if kv_len % block_k != 0:
        # the iota/compare/select chain nearly doubles the VPU work per
        # tile — predicate it so only the one ragged KV block pays
        @pl.when(ki != nk - 1)
        def _full():
            accumulate(s_t)

        @pl.when(ki == nk - 1)
        def _ragged():
            key_idx = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
            accumulate(jnp.where(key_idx < kv_len, s_t, NEG_INF))
    else:
        accumulate(s_t)

    @pl.when(ki == nk - 1)
    def _finish():
        l = l_scr[:1]  # [1, bq]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe).T.astype(o_ref.dtype)
        lse = (static_max + jnp.log(l_safe)).T
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _fwd_kernel_q8(q_ref, k_ref, v_ref, sk_ref, o_ref, acc_scr, q8_scr,
                   sq_scr, l_scr, *, kv_len, q_len, block_q, block_k, static_max):
    """int8-QK^T variant of the transposed static-max kernel.

    The score matmul runs on the MXU in int8 (2x bf16 throughput — the
    contraction is only head_dim 64, so QK^T is MXU-bound either way).
    The q tile is quantized IN-kernel once per q block into an int8 scratch
    (per-token scales along lanes — effectively free, amortized over the KV
    sweep). k arrives already mean-smoothed and int8-quantized with one
    scale per (head, k-block) riding SMEM: smoothing makes k's range tame
    enough for block scalars (softmax is invariant to the per-query logit
    shift smoothing introduces — the SageAttention recipe), and int8 k in
    HBM also halves its DMA. PV stays bf16: exact given p.

    Inference-only: not differentiable, and the emitted lse is shifted per
    query by q·k_mean (harmless — nothing consumes lse on this path)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        l_scr[:] = jnp.zeros_like(l_scr)
        qf = q_ref[0].astype(jnp.float32)  # [d, bq]
        sq = jnp.maximum(jnp.max(jnp.abs(qf), axis=0, keepdims=True), 1e-6)
        q8_scr[:] = jnp.round(qf * (127.0 / sq)).astype(jnp.int8)
        sq_scr[:] = jnp.broadcast_to(sq * (1.0 / 127.0), sq_scr.shape)

    s32 = jax.lax.dot_general(
        k_ref[0], q8_scr[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [bk, bq]
    # both scales ride the lane-oriented per-token q vector: one fused pass
    sk = sk_ref[pl.program_id(0), ki]
    s_t = s32.astype(jnp.float32) * (sq_scr[:1] * sk)

    def accumulate(s_t):
        p_t = jnp.exp(s_t - static_max)
        l_scr[:1] += jnp.sum(p_t, axis=0, keepdims=True)
        acc_scr[:] += jax.lax.dot_general(
            v_ref[0], p_t.astype(v_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if kv_len % block_k != 0:
        # predicated so only the one ragged KV block pays for masking
        @pl.when(ki != nk - 1)
        def _full():
            accumulate(s_t)

        @pl.when(ki == nk - 1)
        def _ragged():
            key_idx = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
            accumulate(jnp.where(key_idx < kv_len, s_t, NEG_INF))
    else:
        accumulate(s_t)

    @pl.when(ki == nk - 1)
    def _finish():
        l = l_scr[:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe).T.astype(o_ref.dtype)


def _fwd_q8(q, k, v, scale, block_q, block_k, static_max):
    """Layout mirrors _fwd; the only extra host-side work vs the bf16 path
    is k's per-head token-mean smoothing (two cheap passes over k)."""
    B, H, S, D = q.shape
    Skv = k.shape[2]
    Sq_pad = pl.cdiv(S, block_q) * block_q
    Skv_pad = pl.cdiv(Skv, block_k) * block_k
    bh = B * H
    # the accumulator is exactly [D, bq]: the softmax denominator is a VPU
    # sublane-reduce in-kernel, NOT a ones-row of v — padding the PV
    # matmul's sublane dim 64 -> 80 costs +25% MXU work on the step's
    # hottest matmul (~10 ms/step at the flagship shape)

    k = k - k.mean(axis=2, keepdims=True)  # per-head token-mean smoothing
    qp = (jnp.pad(q, ((0, 0), (0, 0), (0, Sq_pad - S), (0, 0))) * jnp.asarray(scale, q.dtype)
          ).reshape(bh, Sq_pad, D).swapaxes(1, 2)  # [bh, D, Sq]
    nk_blocks = Skv_pad // block_k
    kb = jnp.pad(k, ((0, 0), (0, 0), (0, Skv_pad - Skv), (0, 0))
                 ).reshape(bh, nk_blocks, block_k, D).astype(jnp.float32)
    sk = jnp.maximum(jnp.max(jnp.abs(kb), axis=(2, 3)), 1e-6)  # [bh, nk]
    k8 = jnp.round(kb * (127.0 / sk[:, :, None, None])).astype(jnp.int8
                   ).reshape(bh, Skv_pad, D)
    sk_r = sk / 127.0
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Skv_pad - Skv), (0, 0))
                 ).reshape(bh, Skv_pad, D).swapaxes(1, 2)  # [bh, D, Skv]

    grid = (bh, Sq_pad // block_q, Skv_pad // block_k)
    # no lse output: inference-only kernel, nothing consumes it — at the
    # flagship shape the broadcast [bh, Sq, 128] f32 buffer would cost
    # 126MB of dead HBM writes per layer (3.8GB per step)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel_q8, kv_len=Skv, q_len=S, block_q=block_q,
            block_k=block_k, static_max=float(static_max),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, D, block_q), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, D, block_k), lambda b, qi, ki: (b, 0, ki)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sk [bh, nk] whole in SMEM
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, Sq_pad, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((D, block_q), jnp.float32),
            pltpu.VMEM((D, block_q), jnp.int8),
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * S * Skv * D * bh,
            bytes_accessed=(qp.size * 2 + k8.size + vp.size * 2),
            transcendentals=S * Skv * bh,
        ),
        interpret=_interpret(),
    )(qp, k8, vp, sk_r)
    return out.reshape(B, H, Sq_pad, D)[:, :, :S]


def flash_attention_q8(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    static_max: float = 24.0,
) -> jnp.ndarray:
    """Inference-only flash attention with the QK^T matmul in int8
    (per-token scales + k mean-smoothing). ~2x the score-matmul throughput
    on the v5e MXU; PV stays bf16. Not differentiable."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    block_q = _pick_block(q.shape[2], block_q, 128)
    block_k = _pick_block(k.shape[2], block_k, 128)
    return _fwd_q8(q, k, v, float(scale), block_q, block_k, static_max)


def _fwd(q, k, v, scale, block_q, block_k, static_max=None):
    B, H, S, D = q.shape
    Skv = k.shape[2]
    Sq_pad = pl.cdiv(S, block_q) * block_q
    Skv_pad = pl.cdiv(Skv, block_k) * block_k
    bh = B * H
    # q and v enter the kernel pre-transposed ([D, S] both) so both
    # kernel matmuls are plain A@B — Mosaic inserts per-tile relayouts for
    # transposed-operand dot_generals, which costs ~20% at these shapes.
    # The softmax denominator is an in-kernel VPU reduce (see _fwd_kernel),
    # so v carries NO ones-row and the PV accumulator stays [D, bq].
    qp = (jnp.pad(q, ((0, 0), (0, 0), (0, Sq_pad - S), (0, 0))) * jnp.asarray(scale, q.dtype)
          ).reshape(bh, Sq_pad, D).swapaxes(1, 2)  # [bh, D, Sq]
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Skv_pad - Skv), (0, 0))).reshape(bh, Skv_pad, D)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Skv_pad - Skv), (0, 0))
                 ).reshape(bh, Skv_pad, D).swapaxes(1, 2)  # [bh, D, Skv]

    grid = (bh, Sq_pad // block_q, Skv_pad // block_k)
    if static_max is None:
        kernel = functools.partial(_fwd_kernel, kv_len=Skv, block_k=block_k)
        scratch = [
            pltpu.VMEM((8, block_q), jnp.float32),   # running max along lanes
            pltpu.VMEM((8, block_q), jnp.float32),   # running denominator
            pltpu.VMEM((D, block_q), jnp.float32),   # transposed accumulator
        ]
    else:
        kernel = functools.partial(
            _fwd_kernel_static_max, kv_len=Skv, block_k=block_k,
            static_max=float(static_max),
        )
        scratch = [
            pltpu.VMEM((8, block_q), jnp.float32),   # running denominator
            pltpu.VMEM((D, block_q), jnp.float32),
        ]
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, D, block_q), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, D, block_k), lambda b, qi, ki: (b, 0, ki)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, qi, ki: (b, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, Sq_pad, D), q.dtype),
            jax.ShapeDtypeStruct((bh, Sq_pad, LANES), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * S * Skv * D * bh,
            bytes_accessed=(qp.size * qp.dtype.itemsize + kp.size * kp.dtype.itemsize
                            + vp.size * vp.dtype.itemsize),
            transcendentals=S * Skv * bh,
        ),
        interpret=_interpret(),
    )(qp, kp, vp)
    out = out.reshape(B, H, Sq_pad, D)[:, :, :S]
    return out, lse  # lse stays [bh, Sq_pad, LANES] for the backward


# ---------------------------------------------------------------------------
# Backward kernels (delta recomputed in-kernel from O and dO)
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(*refs, scale, kv_len, block_k, has_dlse=False):
    if has_dlse:
        q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dlse_ref, dq_ref, dq_scr = refs
    else:
        q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref, dq_scr = refs
        dlse_ref = None
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    key_idx = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])  # [bq, bk]

    do = do_ref[0].astype(jnp.float32)
    delta = jnp.sum(o_ref[0].astype(jnp.float32) * do, axis=-1, keepdims=True)  # [bq,1]
    if dlse_ref is not None:
        # lse cotangent: dL/ds += p * dlse (dlse_i/ds_ij = p_ij), i.e. the
        # delta term shifts by -dlse — used by the differentiable
        # (out, lse) path that ring/sequence-parallel training needs
        delta = delta - dlse_ref[0][:, :1]
    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * scale
    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(*refs, scale, kv_len, q_len, block_q, block_k,
                    has_dlse=False):
    if has_dlse:
        (q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dlse_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
    else:
        (q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
        dlse_ref = None
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    # stay q-major ([bq, bk]) and contract over bq — avoids sublane<->lane
    # relayouts of the per-row lse/delta vectors
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]
    key_idx = pl.program_id(1) * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])  # [bq, bk]
    # zero padded tail queries: their lse rows are garbage
    q_idx = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    p = jnp.where(q_idx < q_len, p, 0.0)

    do = do_ref[0].astype(jnp.float32)  # [bq, d]
    delta = jnp.sum(o_ref[0].astype(jnp.float32) * do, axis=-1, keepdims=True)  # [bq,1]
    if dlse_ref is not None:
        delta = delta - dlse_ref[0][:, :1]  # see _bwd_dq_kernel
    # dv[bk, d] = sum_bq p[bq, bk] * do[bq, d]
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dp[bq, bk] = do @ v^T
    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * scale  # [bq, bk]
    # dk[bk, d] = sum_bq ds[bq, bk] * q[bq, d]
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd(scale, block_q, block_k, static_max, res, g):
    return _bwd_impl(scale, block_q, block_k, res, g, dlse=None)


def _bwd_impl(scale, block_q, block_k, res, g, dlse=None):
    """Flash backward. `dlse` (optional, [bh, Sq_pad_fwd, LANES], value in
    lane 0) is the cotangent of the logsumexp output — the delta term
    shifts by -dlse, which is the exact VJP of (out, lse) jointly."""
    q, k, v, out, lse = res
    do = g
    B, H, S, D = q.shape
    Skv = k.shape[2]
    # the backward kernels keep q/k/v/o/do blocks + two f32 scratches live —
    # cap blocks lower than the forward or VMEM overflows at 16MB
    block_q = min(block_q, 512)
    block_k = min(block_k, 1024)
    Sq_pad = pl.cdiv(S, block_q) * block_q
    Skv_pad = pl.cdiv(Skv, block_k) * block_k
    bh = B * H

    def pad3(x, target):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, target - x.shape[2]), (0, 0)))
        return x.reshape(bh, target, x.shape[3])

    qp, kp, vp = pad3(q, Sq_pad), pad3(k, Skv_pad), pad3(v, Skv_pad)
    op, dop = pad3(out, Sq_pad), pad3(do, Sq_pad)

    # lse (and dlse) come padded to the FORWARD's Sq_pad; align to ours
    def align(x):
        if x.shape[1] > Sq_pad:
            return x[:, :Sq_pad]
        if x.shape[1] < Sq_pad:
            return jnp.pad(x, ((0, 0), (0, Sq_pad - x.shape[1]), (0, 0)))
        return x

    lse = align(lse)
    has_dlse = dlse is not None
    extra_in = [align(dlse)] if has_dlse else []
    lse_spec = pl.BlockSpec((1, block_q, LANES), lambda b, qi, ki: (b, qi, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=Skv,
                          block_k=block_k, has_dlse=has_dlse),
        grid=(bh, Sq_pad // block_q, Skv_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
        ] + [lse_spec] * (1 + has_dlse),
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, Sq_pad, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qp, kp, vp, op, dop, lse, *extra_in)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, kv_len=Skv, q_len=S,
            block_q=block_q, block_k=block_k, has_dlse=has_dlse,
        ),
        grid=(bh, Skv_pad // block_k, Sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, ki, qi: (b, qi, 0)),
        ] + ([pl.BlockSpec((1, block_q, LANES), lambda b, ki, qi: (b, qi, 0))]
             if has_dlse else []),
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, ki, qi: (b, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, Skv_pad, D), k.dtype),
            jax.ShapeDtypeStruct((bh, Skv_pad, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qp, kp, vp, op, dop, lse, *extra_in)

    dq = dq.reshape(B, H, Sq_pad, D)[:, :, :S]
    dk = dk.reshape(B, H, Skv_pad, D)[:, :, :Skv]
    dv = dv.reshape(B, H, Skv_pad, D)[:, :, :Skv]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, block_q, block_k, static_max):
    out, _ = _fwd(q, k, v, scale, block_q, block_k, static_max)
    return out


def _flash_fwd(q, k, v, scale, block_q, block_k, static_max):
    out, lse = _fwd(q, k, v, scale, block_q, block_k, static_max)
    return out, (q, k, v, out, lse)


_flash.defvjp(_flash_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_lse(q, k, v, scale, block_q, block_k, static_max):
    """Differentiable flash attention returning (out, lse[B, H, S]) — the
    pair ring/sequence-parallel attention merges across KV chunks. The lse
    cotangent folds into the backward's delta term (see _bwd_impl).
    `static_max` picks the cheaper bounded-logit kernel; its lse is exact,
    so the shared backward is unaffected."""
    out, lse = _fwd(q, k, v, scale, block_q, block_k, static_max)
    B, H, S, _ = q.shape
    return out, lse.reshape(B, H, -1, LANES)[:, :, :S, 0]


def _flash_lse_fwd(q, k, v, scale, block_q, block_k, static_max):
    out, lse = _fwd(q, k, v, scale, block_q, block_k, static_max)
    B, H, S, _ = q.shape
    lse_pub = lse.reshape(B, H, -1, LANES)[:, :, :S, 0]
    return (out, lse_pub), (q, k, v, out, lse)


def _flash_lse_bwd(scale, block_q, block_k, static_max, res, g):
    do, dlse_pub = g
    q = res[0]
    B, H, S, _ = q.shape
    lse = res[4]
    # dlse -> the kernel's [bh, Sq_pad, LANES] layout, value in lane 0
    # (the kernels read [:, :1] of the tile, like they do for lse)
    d = jnp.zeros((B * H, lse.shape[1], LANES), jnp.float32)
    d = d.at[:, :S, 0].set(dlse_pub.astype(jnp.float32).reshape(B * H, S))
    return _bwd_impl(scale, block_q, block_k, res, do, dlse=d)


_flash_lse.defvjp(_flash_lse_fwd, _flash_lse_bwd)


def _pick_block(n: int, preferred: int, align: int) -> int:
    """Largest aligned block ≤ preferred that isn't wasteful for tiny n."""
    if n >= preferred:
        return preferred
    return max(align, pl.cdiv(n, align) * align)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    static_max: Optional[float] = None,
) -> jnp.ndarray:
    """Flash attention over [B, H, S, D], differentiable.

    D should be lane-tileable (CogVideoX's 64 is fine). Block sizes clamp to
    the padded sequence length for small inputs.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    block_q = _pick_block(q.shape[2], block_q, 128)
    block_k = _pick_block(k.shape[2], block_k, 128)
    return _flash(q, k, v, float(scale), int(block_q), int(block_k), static_max)


def attention(q, k, v, scale=None, impl: str = "auto", static_max: Optional[float] = None):
    """Dispatch: pallas flash on TPU, jnp reference elsewhere.

    `static_max`: pass a bound on the attention logits to use the cheaper
    static-max kernel (safe with qk-LayerNorm; the DiT uses 24.0)."""
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "xla"
    if impl == "flash":
        return flash_attention(q, k, v, scale, static_max=static_max)
    if impl == "flash_q8":
        return flash_attention_q8(q, k, v, scale,
                                  static_max=static_max if static_max else 24.0)
    return mha_reference(q, k, v, scale)


def attention_with_lse(q, k, v, scale: Optional[float] = None, impl: str = "auto",
                       static_max: Optional[float] = None):
    """Attention that also returns per-row logsumexp [B, H, S] — the
    combination statistic ring/sequence-parallel attention needs to merge
    partial results across KV chunks.

    `impl="flash_q8"` maps to the bf16 flash kernel: the int8-QK^T kernel
    produces no lse, and silently dropping to the O(S^2) einsum path would
    defeat the ring (int8 serving keeps its Int8Dense linears either way).
    `static_max` selects the cheaper bounded-logit kernel on the flash
    path (lse stays exact); the xla path computes exact lse regardless."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "xla"
    if impl in ("flash", "flash_q8"):
        block_q = _pick_block(q.shape[2], 1024, 128)
        block_k = _pick_block(k.shape[2], 1024, 128)
        # differentiable (out, lse) pair — context-parallel TRAINING
        # (train.mesh.sp) backprops through the ring's partial results
        return _flash_lse(q, k, v, float(scale), int(block_q), int(block_k),
                          None if static_max is None else float(static_max))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    lse = jax.nn.logsumexp(logits, axis=-1)
    probs = jnp.exp(logits - lse[..., None]).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v), lse

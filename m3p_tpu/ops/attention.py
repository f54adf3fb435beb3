"""Multi-head attention: Pallas TPU flash-attention kernel + XLA reference path.

Semantics match the reference MHA (`/root/reference/M3P/src/model/transformer.py:
127-210`): queries scaled by 1/sqrt(head_dim), masked positions get -inf-like
scores, softmax computed in float32, output in the input dtype.  Padding is
expressed as a per-key boolean mask (``kv_mask``: True = attend), which covers
every usage in M3P (text padding, image-region padding, the [img; text] joint
concat, and cross-attention over encoder states); ``causal`` adds the
autoregressive triangle for decoding.

The Pallas kernel is a blockwise online-softmax flash attention (never
materializes the (Sq, Sk) score matrix), gridded over
(batch, heads, q-blocks, kv-blocks) with fp32 running statistics in VMEM
scratch.  The backward pass is fully fused too: the forward saves (l, m)
softmax residuals and dedicated dkv / dq kernels recompute p blockwise
(measured ~25% faster than XLA autodiff at S=2048 fp32 on v5e, with the gap
growing with sequence length).  Dispatch is length-aware: below
PALLAS_MIN_KV_LEN the XLA fused path wins and is used instead.

Training-time attention-weight dropout is fused INTO the kernels (TPU
hardware PRNG seeded per (batch, head[, tile]); the backward regenerates the
identical keep mask from the seed, so the (B, H, Sq, Sk) mask never exists
in HBM).  For short sequences a dedicated single-tile kernel
(`small_attention`) grids over batch with heads unrolled in-block and a
single recompute-everything backward call — at M3P's joint S=164 the op grad
measures 2.83 ms vs 7.2 ms for the XLA explicit-mask path and 3.9 ms for the
blockwise flash grid (B=80, H=12, D=64, rate 0.1).

The model's encoder self-attention uses the LAYOUT-NATIVE variant
(`attention_packed`, bottom of this file): operands stay in the projection
layout (B, S, H*Dh) with heads as static lane slices, so no head transpose
and no (B,H,S,S) softmax residual ever reach HBM.  Flagship step (12L,
BN=80, S=164, v5e): 873 samples/s at rate 0 (vs 793 XLA) and 852 at
rate 0.1 (vs 735 with the transposing small kernel, 614 XLA-mask).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# -0.7 * float32_max: large negative that survives exp() without NaN (see
# flash-attention masking convention).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

NUM_LANES = 128


def mha_reference(
    q: jax.Array,          # (B, H, Sq, D)
    k: jax.Array,          # (B, H, Sk, D)
    v: jax.Array,          # (B, H, Sk, D)
    kv_mask: Optional[jax.Array] = None,   # (B, Sk) bool, True = attend
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """XLA attention with fp32 softmax — the numerical ground truth."""
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, :], scores, DEFAULT_MASK_VALUE)
    if causal:
        sq, sk = q.shape[2], k.shape[2]
        # align diagonals at the end (for KV-cached decode, q is the suffix)
        qi = jnp.arange(sq)[:, None] + (sk - sq)
        ki = jnp.arange(sk)[None, :]
        scores = jnp.where((ki <= qi)[None, None], scores, DEFAULT_MASK_VALUE)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)


def mha_reference_bshd(
    q: jax.Array,          # (B, Sq, H, D)
    k: jax.Array,          # (B, Sk, H, D)
    v: jax.Array,          # (B, Sk, H, D)
    kv_mask: Optional[jax.Array] = None,   # (B, Sk) bool, True = attend
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Batch-major XLA attention: (B, S, H, D) in and out.

    Same math as `mha_reference`, but the head dimension stays minor-most so
    no (B,H,S,D) relayout is ever materialized.  Measured end-to-end at M3P
    shapes (v5e, S=164): NEUTRAL vs the bhsd formulation (789 vs 792
    samples/s) — XLA already folds the head permutation into adjacent
    fusions there, so the model keeps the single bhsd layout; this variant
    is available for shapes where the relayout does materialize."""
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, :], scores,
                           DEFAULT_MASK_VALUE)
    if causal:
        sq, sk = q.shape[1], k.shape[1]
        qi = jnp.arange(sq)[:, None] + (sk - sq)
        ki = jnp.arange(sk)[None, :]
        scores = jnp.where((ki <= qi)[None, None], scores, DEFAULT_MASK_VALUE)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)


def attention_bshd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    use_pallas: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """`attention` for batch-major (B, S, H, D) operands.  Short sequences
    take the transpose-free XLA path; the Pallas flash kernel (long KV)
    still runs in its native (B, H, S, D) layout."""
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    on_tpu = jax.default_backend() == "tpu"
    long_enough = k.shape[1] >= PALLAS_MIN_KV_LEN
    if use_pallas and (on_tpu or interpret) and (long_enough or interpret):
        out = _attention_pallas(q.transpose(0, 2, 1, 3),
                                k.transpose(0, 2, 1, 3),
                                v.transpose(0, 2, 1, 3),
                                kv_mask, None, causal, scale, 0.0, interpret)
        return out.transpose(0, 2, 1, 3)
    return mha_reference_bshd(q, k, v, kv_mask, causal=causal,
                              sm_scale=scale)


# ---------------------------------------------------------------------------
# Pallas flash-attention forward kernel
# ---------------------------------------------------------------------------


def _small_keep(seed_ref, rate: float, shape, tile):
    """Keep mask for one logical tile from the TPU hardware PRNG; seeded by
    (user seed, tile id) so any kernel regenerates the IDENTICAL mask for a
    given tile regardless of grid iteration order.

    One full uint32 draw per probability is already optimal here: an
    8-bits-per-weight variant (quarter the draws, bitcast to bytes,
    threshold per byte) measured SLOWER on v5e — 2.21 vs 2.07 ms op grad at
    B=80/H=12/S=164/rate 0.1 — because the VPU has no 8-bit compare, and
    widening bytes to i32 for the threshold costs more than the hardware
    PRNG saves."""
    pltpu.prng_seed(seed_ref[0], tile)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return bits >= threshold


def _dropout_keep(seed_ref, rate: float, shape, q_idx, kv_idx,
                  num_q_blocks: int, num_kv_blocks: int):
    """Per-tile keep mask from the TPU hardware PRNG.

    Seeded by (user seed, flat logical tile id), so the forward and both
    backward kernels regenerate the IDENTICAL mask for a given
    (batch, head, q-block, kv-block) tile regardless of their grid iteration
    order — the `ops.dropout` determinism recipe applied to attention
    weights.  The mask never exists in HBM (the XLA path materializes a
    (B, H, S, S) random tensor per layer — measured 22.6% of the flagship
    step at rate 0.1)."""
    nh = pl.num_programs(1)
    tile = ((pl.program_id(0) * nh + pl.program_id(1)) * num_q_blocks
            + q_idx) * num_kv_blocks + kv_idx
    return _small_keep(seed_ref, rate, shape, tile)


def _flash_kernel(
    seed_ref,     # (1,) int32 scalar-prefetch — dropout PRNG seed
    q_ref,        # (1, 1, block_q, D)
    k_ref,        # (1, 1, block_k, D)
    v_ref,        # (1, 1, block_k, D)
    mask_ref,     # (1, 1, block_k) int32 (1 = attend)
    o_ref,        # (1, 1, block_q, D)
    l_ref,        # (1, 1, block_q) f32 — sum-exp residual
    m_ref,        # (1, 1, block_q) f32 — running-max residual
    m_scratch,    # (block_q, NUM_LANES) f32
    l_scratch,    # (block_q, NUM_LANES) f32
    acc_scratch,  # (block_q, D) f32
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    num_q_blocks: int,
    num_kv_blocks: int,
    q_offset: int,
    dropout_rate: float,
):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    q_idx = pl.program_id(2)

    if causal:
        # skip kv blocks entirely above the (offset) diagonal
        should_run = (q_idx + 1) * block_q + q_offset > kv_idx * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # (block_q, D)
        k = k_ref[0, 0]  # (block_k, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale     # (block_q, block_k)

        mask = mask_ref[0, 0, :][None, :] != 0  # (1, block_k)
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + q_idx * block_q + q_offset
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + kv_idx * block_k
            mask = jnp.logical_and(mask, col <= row)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...]   # (block_q, NUM_LANES)
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1)[:, None]          # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_curr)          # broadcast over lanes
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])                # (block_q, block_k)
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.sum(p, axis=1)[:, None]
        m_scratch[...] = m_next
        l_scratch[...] = l_next

        v = v_ref[0, 0]  # (block_k, D)
        if dropout_rate > 0.0:
            # dropout applies to the NORMALIZED softmax weights; the running
            # (m, l) statistics above use the undropped p, and the dropped +
            # keep-scaled p enters only the value accumulation, so
            # acc / l == dropout(softmax(s)) @ v exactly
            keep = _dropout_keep(seed_ref, dropout_rate, p.shape, q_idx,
                                 kv_idx, num_q_blocks, num_kv_blocks)
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        o_curr = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        # all lanes of the (block_q, NUM_LANES) stats carry the same value;
        # broadcast column 0 over the head dim
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + o_curr

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l = l_scratch[...][:, :1]                    # (block_q, 1)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        # softmax residuals for the fused backward ((B*H*nq, 1, block_q))
        l_ref[0, 0, :] = l_scratch[...][:, 0]
        m_ref[0, 0, :] = m_scratch[...][:, 0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _seed_arr(dropout_seed, dropout_rate: float = 0.0) -> jax.Array:
    """Scalar-prefetch seed operand ((1,) int32; zeros when unused).

    With ``dropout_rate`` > 0 a seed is REQUIRED: mapping None to 0 would
    silently draw the same keep mask every call, turning dropout into a
    fixed sparsity pattern."""
    if dropout_seed is None:
        if dropout_rate > 0.0:
            raise ValueError(
                "attention dropout_rate > 0 requires an explicit "
                "dropout_seed (fold one per step from your rng; a missing "
                "seed would silently reuse one fixed mask)")
        return jnp.zeros((1,), jnp.int32)
    return jnp.asarray(dropout_seed, jnp.int32).reshape(1)


def _pad_inputs(q, k, v, kv_mask, block_q, block_k):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, _round_up(sq, 8))
    block_k = min(block_k, _round_up(sk, NUM_LANES))
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    if kv_mask is None:
        kv_mask = jnp.ones((b, sk), dtype=jnp.int32)
    kv_mask = kv_mask.astype(jnp.int32)
    if sk_p != sk:
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, sk_p - sk)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    return q, k, v, kv_mask, block_q, block_k, sq_p, sk_p


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret",
                     "return_residuals", "dropout_rate"),
)
def flash_attention(
    q: jax.Array,                         # (B, H, Sq, D)
    k: jax.Array,                         # (B, H, Sk, D)
    v: jax.Array,                         # (B, H, Sk, D)
    kv_mask: Optional[jax.Array] = None,  # (B, Sk) bool
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    return_residuals: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,  # scalar int32
):
    """Pallas flash attention (forward).  Pads sequence dims to block multiples
    internally; padded keys are masked out, padded query rows are discarded.

    Default blocks are 512x512, the best point of an on-chip fwd+bwd sweep at
    B=4/H=12/S=2048/D=64 (v5e: 9.0ms vs 22.4ms at 128x128 and 12.8ms for XLA
    attention; tools/bench_flash_blocks.py).  Blocks are clamped to the padded
    sequence length for shorter inputs.

    With ``return_residuals`` also returns the per-row softmax statistics
    (l, m) as opaque (B*H*num_q_blocks, 1, block_q) arrays consumed by
    `flash_attention_bwd`.

    ``dropout_rate`` > 0 applies attention-weight dropout INSIDE the kernel
    (TPU hardware PRNG seeded per tile from ``dropout_seed``); no
    (B, H, Sq, Sk) mask is ever materialized.  The backward kernels
    regenerate the identical mask from the same seed."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)

    q, k, v, kv_mask, block_q, block_k, sq_p, sk_p = _pad_inputs(
        q, k, v, kv_mask, block_q, block_k)
    num_q_blocks = sq_p // block_q
    num_kv_blocks = sk_p // block_k
    # causal diagonal offset so that cached decode (sq < sk) aligns at the end
    q_offset = sk - sq

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        sm_scale=scale,
        block_q=block_q,
        block_k=block_k,
        num_q_blocks=num_q_blocks,
        num_kv_blocks=num_kv_blocks,
        q_offset=q_offset,
        dropout_rate=dropout_rate,
    )
    seed_arr = _seed_arr(dropout_seed, dropout_rate)

    def row_spec():
        # per-(b,h,q-block) residual rows: (B*H*nq, 1, block_q)
        return pl.BlockSpec(
            (1, 1, block_q),
            lambda bi, hi, qi, ki, *_: ((bi * h + hi) * num_q_blocks + qi,
                                        0, 0))

    n_rows = b * h * num_q_blocks
    out, l_res, m_res = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((n_rows, 1, block_q), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, 1, block_q), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, num_q_blocks, num_kv_blocks),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, qi, ki, *_: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, qi, ki, *_: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k),
                             lambda bi, hi, qi, ki, *_: (bi, 0, ki)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)),
                row_spec(),
                row_spec(),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
                pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(seed_arr, q, k, v, kv_mask[:, None, :])

    out = out[:, :, :sq, :]
    if return_residuals:
        return out, l_res, m_res
    return out


# ---------------------------------------------------------------------------
# Pallas flash-attention backward kernels (dkv and dq)
# ---------------------------------------------------------------------------


def _recompute_p_ds(seed_ref, q, kref, mask_ref, l_ref, m_ref, di_ref, do, v,
                    causal, scale, block_q, block_k, q_idx, kv_idx, q_offset,
                    num_q_blocks, num_kv_blocks, dropout_rate):
    """Shared backward math: recompute p from residuals, form ds.

    Returns ``(p_dv, ds)``: ``p_dv`` is the (dropped, keep-scaled) weight
    tile for the dV product; ``ds`` is the score gradient.  With dropout
    (out = (M . W) V / (1-r), W = softmax(S)):
        dV = (M . W / (1-r))^T dO
        dW = M . (dO V^T) / (1-r)
        dS = W . (dW - rowsum(dO . O))
    (rowsum(dO . O) == rowsum(dW . W) holds WITH dropout because O already
    carries the mask).  The keep mask regenerates from the same per-tile
    seed as the forward — bitwise identical, never in HBM."""
    s = jax.lax.dot_general(q, kref, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    mask = mask_ref[0, 0, :][None, :] != 0
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
            + q_idx * block_q + q_offset
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + kv_idx * block_k
        mask = jnp.logical_and(mask, col <= row)
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    m = m_ref[0, 0, :][:, None]
    l = l_ref[0, 0, :][:, None]
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    p = jnp.exp(s - m) * l_inv                       # (block_q, block_k)
    # GEMM operands in the input dtype (bf16 in training) with f32
    # accumulation — fp32 operands ran the MXU at a fraction of its bf16
    # rate and made the fused backward slower than XLA end-to-end
    dp = jax.lax.dot_general(do.astype(v.dtype), v,
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    di = di_ref[0, 0, :][:, None]
    if dropout_rate > 0.0:
        keep = _dropout_keep(seed_ref, dropout_rate, p.shape, q_idx, kv_idx,
                             num_q_blocks, num_kv_blocks)
        inv_keep = 1.0 / (1.0 - dropout_rate)
        p_dv = jnp.where(keep, p * inv_keep, 0.0)
        ds = p * (jnp.where(keep, dp * inv_keep, 0.0) - di)
    else:
        p_dv = p
        ds = p * (dp - di)                           # (block_q, block_k)
    return p_dv, ds


def _flash_bwd_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                          l_ref, m_ref, di_ref, dk_ref, dv_ref, dk_scratch,
                          dv_scratch, *, causal, scale, block_q, block_k,
                          num_q_blocks, num_kv_blocks, q_offset,
                          dropout_rate):
    q_idx = pl.program_id(3)
    kv_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[...] = jnp.zeros(dk_scratch.shape, jnp.float32)
        dv_scratch[...] = jnp.zeros(dv_scratch.shape, jnp.float32)

    if causal:
        should_run = (q_idx + 1) * block_q + q_offset > kv_idx * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        p_dv, ds = _recompute_p_ds(
            seed_ref, q, k_ref[0, 0], mask_ref, l_ref, m_ref, di_ref, do,
            v_ref[0, 0], causal, scale, block_q, block_k, q_idx, kv_idx,
            q_offset, num_q_blocks, num_kv_blocks, dropout_rate)
        # dv += p^T @ do ; dk += ds^T @ q * scale — operands in the input
        # dtype, f32 accumulation (see _recompute_p_ds)
        dv_scratch[...] += jax.lax.dot_general(
            p_dv.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_scratch[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(q_idx == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                         l_ref, m_ref, di_ref, dq_ref, dq_scratch, *, causal,
                         scale, block_q, block_k, num_q_blocks, num_kv_blocks,
                         q_offset, dropout_rate):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[...] = jnp.zeros(dq_scratch.shape, jnp.float32)

    if causal:
        should_run = (q_idx + 1) * block_q + q_offset > kv_idx * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        _, ds = _recompute_p_ds(
            seed_ref, q, k_ref[0, 0], mask_ref, l_ref, m_ref, di_ref, do,
            v_ref[0, 0], causal, scale, block_q, block_k, q_idx, kv_idx,
            q_offset, num_q_blocks, num_kv_blocks, dropout_rate)
        dq_scratch[...] += jax.lax.dot(
            ds.astype(k_ref.dtype), k_ref[0, 0],
            preferred_element_type=jnp.float32) * scale

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scratch[...].astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret",
                     "dropout_rate"),
)
def flash_attention_bwd(
    q, k, v, kv_mask, o, l_res, m_res, do,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
):
    """Fused flash-attention backward: returns (dq, dk, dv)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)

    q_p, k_p, v_p, mask_p, block_q, block_k, sq_p, sk_p = _pad_inputs(
        q, k, v, kv_mask, block_q, block_k)
    do_p = jnp.pad(do, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    o_p = jnp.pad(o, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    num_q_blocks = sq_p // block_q
    num_kv_blocks = sk_p // block_k
    q_offset = sk - sq

    di = jnp.sum(o_p.astype(jnp.float32) * do_p.astype(jnp.float32),
                 axis=-1).reshape(b * h * num_q_blocks, 1, block_q)

    def row_spec(order):
        if order == "kv_inner":   # grid (b, h, qi, ki)
            return pl.BlockSpec(
                (1, 1, block_q),
                lambda bi, hi, qi, ki, *_: ((bi * h + hi) * num_q_blocks + qi,
                                            0, 0))
        return pl.BlockSpec(       # grid (b, h, ki, qi)
            (1, 1, block_q),
            lambda bi, hi, ki, qi, *_: ((bi * h + hi) * num_q_blocks + qi,
                                        0, 0))

    common = dict(causal=causal, scale=scale, block_q=block_q,
                  block_k=block_k, num_q_blocks=num_q_blocks,
                  num_kv_blocks=num_kv_blocks, q_offset=q_offset,
                  dropout_rate=dropout_rate)
    seed_arr = _seed_arr(dropout_seed, dropout_rate)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        out_shape=(jax.ShapeDtypeStruct(k_p.shape, k.dtype),
                   jax.ShapeDtypeStruct(v_p.shape, v.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, num_kv_blocks, num_q_blocks),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, ki, qi, *_: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, ki, qi, *_: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, ki, qi, *_: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k),
                             lambda bi, hi, ki, qi, *_: (bi, 0, ki)),
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, ki, qi, *_: (bi, hi, qi, 0)),
                row_spec("q_inner"), row_spec("q_inner"),
                row_spec("q_inner"),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, ki, qi, *_: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, ki, qi, *_: (bi, hi, ki, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(seed_arr, q_p, k_p, v_p, mask_p[:, None, :], do_p, l_res, m_res, di)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **common),
        out_shape=jax.ShapeDtypeStruct(q_p.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, num_q_blocks, num_kv_blocks),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, qi, ki, *_: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, qi, ki, *_: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k),
                             lambda bi, hi, qi, ki, *_: (bi, 0, ki)),
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)),
                row_spec("kv_inner"), row_spec("kv_inner"),
                row_spec("kv_inner"),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(seed_arr, q_p, k_p, v_p, mask_p[:, None, :], do_p, l_res, m_res, di)

    return dq[:, :, :sq, :], dk[:, :, :sk, :], dv[:, :, :sk, :]


# ---------------------------------------------------------------------------
# Small-sequence fused kernel
#
# At M3P's encoder lengths (joint S=164) the blockwise flash grid degenerates
# to (B, H, 1, 1) = B*H programs of tiny matmuls per kernel, and the grad
# takes THREE such kernels — per-program overhead dominates (measured 3.9 ms
# vs XLA's 2.4 ms for the op grad at B=80/H=12/S=164/D=64).  This variant
# grids over BATCH ONLY, unrolls the heads inside the kernel, and computes
# softmax in one pass (no running statistics, no residuals): the backward
# recomputes p in-kernel and emits dq/dk/dv from a SINGLE pallas_call.
# Attention-weight dropout uses the same per-(batch, head)-seeded hardware
# PRNG recipe as the flash kernels, so the mask regenerates bitwise in the
# backward and never exists in HBM.
# ---------------------------------------------------------------------------


def _small_p(q, k, mask, *, causal, scale, q_offset):
    """Single-pass fp32 softmax weights for one head: (sq_p, sk_p)."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_offset
        ki = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(ki <= qi, s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _small_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                      causal, scale, heads, n_heads, q_offset, dropout_rate):
    bi = pl.program_id(0)
    h0 = pl.program_id(1) * heads      # global index of this head group
    mask = mask_ref[0, 0, :][None, :] != 0
    for h in range(heads):
        p = _small_p(q_ref[0, h], k_ref[0, h], mask, causal=causal,
                     scale=scale, q_offset=q_offset)
        if dropout_rate > 0.0:
            keep = _small_keep(seed_ref, dropout_rate, p.shape,
                               bi * n_heads + h0 + h)
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        o_ref[0, h] = jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0, h],
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _small_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, *, causal, scale, heads,
                      n_heads, q_offset, dropout_rate):
    """Recomputes p per head and emits all three grads in one kernel.

    Same math as `_recompute_p_ds` (see its docstring), with
    di = rowsum(dO . O) computed in-kernel as rowsum(p_d . dp) — no
    residuals are read at all.  Zero-padded `do` rows make padded-query
    contributions to dk/dv vanish exactly (q pads are zeros, so p there is
    finite; do there is zero)."""
    bi = pl.program_id(0)
    h0 = pl.program_id(1) * heads
    mask = mask_ref[0, 0, :][None, :] != 0
    inv = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    for h in range(heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        do = do_ref[0, h]
        p = _small_p(q, k, mask, causal=causal, scale=scale,
                     q_offset=q_offset)
        dp = jax.lax.dot_general(do.astype(v_ref.dtype), v_ref[0, h],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _small_keep(seed_ref, dropout_rate, p.shape,
                               bi * n_heads + h0 + h)
            p_dv = jnp.where(keep, p * inv, 0.0)
            dp_d = jnp.where(keep, dp * inv, 0.0)
        else:
            p_dv = p
            dp_d = dp
        di = jnp.sum(p_dv * dp, axis=1, keepdims=True)  # rowsum(dO . O)
        ds = p * (dp_d - di)
        dv_ref[0, h] = jax.lax.dot_general(
            p_dv.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dk_ref[0, h] = (jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)
        dq_ref[0, h] = (jax.lax.dot(
            ds.astype(k.dtype), k,
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)


def _small_specs(b, hg, sq_p, sk_p, d):
    qspec = pl.BlockSpec((1, hg, sq_p, d), lambda bi, gi, *_: (bi, gi, 0, 0))
    kvspec = pl.BlockSpec((1, hg, sk_p, d), lambda bi, gi, *_: (bi, gi, 0, 0))
    mspec = pl.BlockSpec((1, 1, sk_p), lambda bi, gi, *_: (bi, 0, 0))
    return qspec, kvspec, mspec


# Conservative per-program VMEM budget for the head-group choice: mosaic
# keeps the fp32 temps of every unrolled head live at once, so the group
# size is bounded by temps + double-buffered ins/outs within ~half of the
# 16 MiB VMEM (measured: 12 fp32 heads at 168x256 want 16.2 MiB).
_SMALL_VMEM_CAP = 8 * 1024 * 1024


def _small_heads_per_block(h, d, sq_p, sk_p, itemsize) -> int:
    per_head = (
        2 * itemsize * d * (2 * sq_p + 2 * sk_p)   # q,do / k,v double-buffered
        + 2 * itemsize * d * (sq_p + 2 * sk_p)     # dq,dk,dv double-buffered
        + 3 * 4 * sq_p * sk_p                      # live fp32 s/p/dp temps
    )
    for hg in range(h, 0, -1):
        if h % hg == 0 and hg * per_head <= _SMALL_VMEM_CAP:
            return hg
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "interpret", "dropout_rate"),
)
def small_attention(q, k, v, kv_mask=None, causal=False,
                    sm_scale=None, interpret=False, dropout_rate=0.0,
                    dropout_seed=None):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    q, k, v, kv_mask, _, _, sq_p, sk_p = _pad_inputs(q, k, v, kv_mask,
                                                     512, 512)
    hg = _small_heads_per_block(h, d, sq_p, sk_p, q.dtype.itemsize)
    qspec, kvspec, mspec = _small_specs(b, hg, sq_p, sk_p, d)
    out = pl.pallas_call(
        functools.partial(_small_fwd_kernel, causal=causal, scale=scale,
                          heads=hg, n_heads=h, q_offset=sk - sq,
                          dropout_rate=dropout_rate),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hg),
            in_specs=[qspec, kvspec, kvspec, mspec],
            out_specs=qspec,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(_seed_arr(dropout_seed, dropout_rate), q, k, v, kv_mask[:, None, :])
    return out[:, :, :sq, :]


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "interpret", "dropout_rate"),
)
def small_attention_bwd(q, k, v, kv_mask, do, causal=False, sm_scale=None,
                        interpret=False, dropout_rate=0.0, dropout_seed=None):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    q, k, v, kv_mask, _, _, sq_p, sk_p = _pad_inputs(q, k, v, kv_mask,
                                                     512, 512)
    do = jnp.pad(do, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    hg = _small_heads_per_block(h, d, sq_p, sk_p, q.dtype.itemsize)
    qspec, kvspec, mspec = _small_specs(b, hg, sq_p, sk_p, d)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_small_bwd_kernel, causal=causal, scale=scale,
                          heads=hg, n_heads=h, q_offset=sk - sq,
                          dropout_rate=dropout_rate),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hg),
            in_specs=[qspec, kvspec, kvspec, mspec, qspec],
            out_specs=(qspec, kvspec, kvspec),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(_seed_arr(dropout_seed, dropout_rate), q, k, v, kv_mask[:, None, :], do)
    return dq[:, :, :sq, :], dk[:, :, :sk, :], dv[:, :, :sk, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _attention_pallas_small(q, k, v, kv_mask, dropout_seed, causal, sm_scale,
                            dropout_rate, interpret):
    return small_attention(q, k, v, kv_mask, causal=causal, sm_scale=sm_scale,
                           interpret=interpret, dropout_rate=dropout_rate,
                           dropout_seed=dropout_seed)


def _attention_pallas_small_fwd(q, k, v, kv_mask, dropout_seed, causal,
                                sm_scale, dropout_rate, interpret):
    out = small_attention(q, k, v, kv_mask, causal=causal, sm_scale=sm_scale,
                          interpret=interpret, dropout_rate=dropout_rate,
                          dropout_seed=dropout_seed)
    return out, (q, k, v, kv_mask, dropout_seed)


def _attention_pallas_small_bwd(causal, sm_scale, dropout_rate, interpret,
                                residuals, g):
    q, k, v, kv_mask, dropout_seed = residuals
    dq, dk, dv = small_attention_bwd(
        q, k, v, kv_mask, g, causal=causal, sm_scale=sm_scale,
        interpret=interpret, dropout_rate=dropout_rate,
        dropout_seed=dropout_seed)
    return dq, dk, dv, None, None


_attention_pallas_small.defvjp(_attention_pallas_small_fwd,
                               _attention_pallas_small_bwd)


def _small_fits(q_shape, k_shape) -> bool:
    """Single-tile kernel applicability: one (sq_p, sk_p) tile per head.
    VMEM pressure is handled separately — `_small_heads_per_block` shrinks
    the per-program head group down to 1, at which point even a 512x512
    fp32 tile's working set is ~4 MiB."""
    return q_shape[2] <= 512 and k_shape[2] <= 512


# ---------------------------------------------------------------------------
# Differentiable entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _attention_pallas(q, k, v, kv_mask, dropout_seed, causal, sm_scale,
                      dropout_rate, interpret):
    return flash_attention(q, k, v, kv_mask, causal=causal, sm_scale=sm_scale,
                           interpret=interpret, dropout_rate=dropout_rate,
                           dropout_seed=dropout_seed)


def _attention_pallas_fwd(q, k, v, kv_mask, dropout_seed, causal, sm_scale,
                          dropout_rate, interpret):
    out, l_res, m_res = flash_attention(
        q, k, v, kv_mask, causal=causal, sm_scale=sm_scale,
        interpret=interpret, return_residuals=True,
        dropout_rate=dropout_rate, dropout_seed=dropout_seed)
    return out, (q, k, v, kv_mask, dropout_seed, out, l_res, m_res)


def _attention_pallas_bwd(causal, sm_scale, dropout_rate, interpret,
                          residuals, g):
    q, k, v, kv_mask, dropout_seed, out, l_res, m_res = residuals
    dq, dk, dv = flash_attention_bwd(
        q, k, v, kv_mask, out, l_res, m_res, g, causal=causal,
        sm_scale=sm_scale, interpret=interpret, dropout_rate=dropout_rate,
        dropout_seed=dropout_seed)
    return dq, dk, dv, None, None


_attention_pallas.defvjp(_attention_pallas_fwd, _attention_pallas_bwd)


# Below this KV length the (Sq, Sk) score matrix is small enough that XLA's
# fused attention beats the Pallas kernel (measured on v5e at the M3P joint
# sequence of 164: XLA 526 vs Pallas 419 samples/s end-to-end) — the layout
# transposes around the custom call and block padding dominate.  With the
# 512x512 blocks the flash path wins end-to-end from S=512 up (12L/768d MLM:
# 1.05x at S=512/B=16, 1.59x at S=2048/B=4, and at S=2048/B=8 it runs where
# the XLA path OOMs — no S^2 score materialization).
PALLAS_MIN_KV_LEN = 512


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    use_pallas: bool = True,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
) -> jax.Array:
    """Dispatching attention entry point used by the model.

    Chooses the Pallas flash kernel only when (a) allowed, (b) running on a
    TPU backend (or interpreting), and (c) the KV sequence is long enough for
    blockwise attention to win (see PALLAS_MIN_KV_LEN).

    ``dropout_rate`` > 0 (training-time attention-weight dropout) requires
    the Pallas path — the mask is generated in-kernel by the TPU hardware
    PRNG and never materialized; callers off the TPU backend must apply
    their own mask around `mha_reference` instead (see
    `model.layers.MultiHeadAttention`).
    """
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    on_tpu = jax.default_backend() == "tpu"
    if dropout_rate > 0.0:
        if not (use_pallas and on_tpu) or interpret:
            # the keep mask comes from the TPU hardware PRNG, which has no
            # interpret-mode lowering — admitting interpret here would fail
            # deep inside Pallas instead of at this surface
            raise ValueError(
                "attention dropout_rate > 0 requires the compiled Pallas TPU "
                "path; apply an explicit mask around mha_reference instead")
        if dropout_seed is None:
            # _seed_arr would silently map None to seed 0, drawing the SAME
            # mask every call — dropout as a fixed sparsity pattern.  Demand
            # an explicit per-step seed (the model folds one from its
            # 'dropout' rng stream, model/layers.py)
            raise ValueError(
                "attention dropout_rate > 0 requires an explicit "
                "dropout_seed (fold one per step from your rng; a missing "
                "seed would silently reuse one fixed mask)")
        if _small_fits(q.shape, k.shape):
            return _attention_pallas_small(q, k, v, kv_mask, dropout_seed,
                                           causal, scale, dropout_rate,
                                           interpret)
        return _attention_pallas(q, k, v, kv_mask, dropout_seed, causal,
                                 scale, dropout_rate, interpret)
    long_enough = k.shape[2] >= PALLAS_MIN_KV_LEN
    if use_pallas and (on_tpu or interpret) and (long_enough or interpret):
        return _attention_pallas(q, k, v, kv_mask, None, causal, scale,
                                 0.0, interpret)
    return mha_reference(q, k, v, kv_mask, causal=causal, sm_scale=scale)


# ---------------------------------------------------------------------------
# Layout-native packed small kernel
#
# The single-tile `small_attention` above takes (B, H, S, D) operands — the
# layout the isolated op likes, but NOT the layout the model produces: the
# fused QKV projection emits (B, S, H*D), and feeding a pallas_call forces
# XLA to MATERIALIZE the (B,S,H,D)->(B,H,S,D) head transposes it would
# otherwise fold into the surrounding GEMMs (in the XLA attention path those
# transposes are free dimension-number choices).  Measured at the flagship
# step (12L, BN=80, S=164): the pallas small kernel costs 6.2 ms/step over
# XLA attention at rate 0 — ~3x its isolated op-grad delta — and the
# in-kernel dropout itself only 1.8 ms.  This variant keeps the MODEL's
# layout: q/k/v arrive as (B, S, H*D) exactly as projected, heads are
# STATIC LANE SLICES of the VMEM tile (h*dh:(h+1)*dh), the context leaves
# as (B, S, H*D) ready for the output projection, and the backward emits
# dq/dk/dv in (B, S, H*D) ready for the QKV wgrad — no transpose ever
# materializes in HBM.
#
# The 1/(1-rate) keep-scale is folded OUT of the per-element selects into
# the dot epilogues (dv/dq/dk scale constants and a cheap (S, D) output
# scale), so dropout adds one select + one PRNG draw per (S, S) tile and
# nothing else.
# ---------------------------------------------------------------------------


def _packed_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                       causal, scale, heads, n_heads, dh, q_offset,
                       dropout_rate):
    bi = pl.program_id(0)
    h0 = pl.program_id(1) * heads
    mask = mask_ref[0, 0, :][None, :] != 0
    inv = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        p = _small_p(q_ref[0, :, sl], k_ref[0, :, sl], mask, causal=causal,
                     scale=scale, q_offset=q_offset)
        if dropout_rate > 0.0:
            keep = _small_keep(seed_ref, dropout_rate, p.shape,
                               bi * n_heads + h0 + h)
            p = jnp.where(keep, p, 0.0)
        o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0, :, sl],
                        preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o * inv).astype(o_ref.dtype)


def _packed_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, *, causal, scale, heads,
                       n_heads, dh, q_offset, dropout_rate):
    """Recompute-everything backward in the packed layout.

    Same math as `_small_bwd_kernel` with the inv = 1/(1-rate) scale
    factored out of the big-tile selects:
      dv = inv * (keep.p)^T dO
      di = inv * rowsum((keep.p) . dp)          (dp = dO V^T)
      ds = p . (inv*(keep.dp) - di) = inv * p . ((keep.dp) - rowsum(...))
    so `inv` rides the dv epilogue and the dk/dq `scale` constants."""
    bi = pl.program_id(0)
    h0 = pl.program_id(1) * heads
    mask = mask_ref[0, 0, :][None, :] != 0
    inv = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        do = do_ref[0, :, sl]
        p = _small_p(q, k, mask, causal=causal, scale=scale,
                     q_offset=q_offset)
        dp = jax.lax.dot_general(do.astype(v_ref.dtype), v_ref[0, :, sl],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _small_keep(seed_ref, dropout_rate, p.shape,
                               bi * n_heads + h0 + h)
            pd = jnp.where(keep, p, 0.0)
            dpd = jnp.where(keep, dp, 0.0)
        else:
            pd = p
            dpd = dp
        r = jnp.sum(pd * dp, axis=1, keepdims=True)
        ds = p * (dpd - r)
        dv = jax.lax.dot_general(pd.astype(do.dtype), do,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv_ref[0, :, sl] = (dv * inv).astype(dv_ref.dtype)
        dk_ref[0, :, sl] = (jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            * (scale * inv)).astype(dk_ref.dtype)
        dq_ref[0, :, sl] = (jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32)
            * (scale * inv)).astype(dq_ref.dtype)


def _packed_pad(x, s_p):
    s = x.shape[1]
    if s_p != s:
        x = jnp.pad(x, ((0, 0), (0, s_p - s), (0, 0)))
    return x


def _packed_heads_per_block(h, dh, sq_p, sk_p, itemsize) -> int:
    per_head = (
        2 * itemsize * dh * 4 * sq_p      # q,k,v,do slabs double-buffered
        + 2 * itemsize * dh * 3 * sq_p    # o / dq,dk,dv slabs
        + 3 * 4 * sq_p * sk_p             # live fp32 p/dp temps
    )
    for hg in range(h, 0, -1):
        if h % hg == 0 and hg * per_head <= _SMALL_VMEM_CAP:
            return hg
    return 1


def _packed_specs(b, h, hg, dh, sq_p, sk_p):
    qspec = pl.BlockSpec((1, sq_p, hg * dh), lambda bi, gi, *_: (bi, 0, gi))
    kvspec = pl.BlockSpec((1, sk_p, hg * dh), lambda bi, gi, *_: (bi, 0, gi))
    mspec = pl.BlockSpec((1, 1, sk_p), lambda bi, gi, *_: (bi, 0, 0))
    return qspec, kvspec, mspec


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "causal", "sm_scale", "interpret",
                     "dropout_rate"),
)
def small_attention_packed(q, k, v, kv_mask=None, n_heads=12, causal=False,
                           sm_scale=None, interpret=False, dropout_rate=0.0,
                           dropout_seed=None):
    """Packed-layout single-tile attention: q/k/v/(out) are (B, S, H*Dh)."""
    b, sq, hd = q.shape
    sk = k.shape[1]
    dh = hd // n_heads
    scale = sm_scale if sm_scale is not None else 1.0 / (dh ** 0.5)
    sq_p = _round_up(sq, 8)
    sk_p = _round_up(sk, NUM_LANES)
    if kv_mask is None:
        kv_mask = jnp.ones((b, sk), dtype=jnp.int32)
    kv_mask = jnp.pad(kv_mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))
    q = _packed_pad(q, sq_p)
    k = _packed_pad(k, sk_p)
    v = _packed_pad(v, sk_p)
    hg = _packed_heads_per_block(n_heads, dh, sq_p, sk_p, q.dtype.itemsize)
    qspec, kvspec, mspec = _packed_specs(b, n_heads, hg, dh, sq_p, sk_p)
    out = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, causal=causal, scale=scale,
                          heads=hg, n_heads=n_heads, dh=dh,
                          q_offset=sk - sq, dropout_rate=dropout_rate),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_heads // hg),
            in_specs=[qspec, kvspec, kvspec, mspec],
            out_specs=qspec,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(_seed_arr(dropout_seed, dropout_rate), q, k, v, kv_mask[:, None, :])
    return out[:, :sq, :]


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "causal", "sm_scale", "interpret",
                     "dropout_rate"),
)
def small_attention_packed_bwd(q, k, v, kv_mask, do, n_heads=12,
                               causal=False, sm_scale=None, interpret=False,
                               dropout_rate=0.0, dropout_seed=None):
    b, sq, hd = q.shape
    sk = k.shape[1]
    dh = hd // n_heads
    scale = sm_scale if sm_scale is not None else 1.0 / (dh ** 0.5)
    sq_p = _round_up(sq, 8)
    sk_p = _round_up(sk, NUM_LANES)
    if kv_mask is None:
        kv_mask = jnp.ones((b, sk), dtype=jnp.int32)
    kv_mask = jnp.pad(kv_mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))
    q = _packed_pad(q, sq_p)
    k = _packed_pad(k, sk_p)
    v = _packed_pad(v, sk_p)
    do = _packed_pad(do, sq_p)      # zero pad rows: no padded-q dk/dv terms
    hg = _packed_heads_per_block(n_heads, dh, sq_p, sk_p, q.dtype.itemsize)
    qspec, kvspec, mspec = _packed_specs(b, n_heads, hg, dh, sq_p, sk_p)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, causal=causal, scale=scale,
                          heads=hg, n_heads=n_heads, dh=dh,
                          q_offset=sk - sq, dropout_rate=dropout_rate),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_heads // hg),
            in_specs=[qspec, kvspec, kvspec, mspec, qspec],
            out_specs=(qspec, kvspec, kvspec),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(_seed_arr(dropout_seed, dropout_rate), q, k, v, kv_mask[:, None, :], do)
    return dq[:, :sq, :], dk[:, :sk, :], dv[:, :sk, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def attention_packed(q, k, v, kv_mask, dropout_seed, n_heads, causal,
                     sm_scale, dropout_rate, interpret=False):
    """Differentiable packed-layout small attention: (B, S, H*Dh) in/out.

    The model's encoder self-attention entry on TPU when attention dropout
    is active (model/layers.py): in-kernel hardware-PRNG dropout without
    the head-transpose materialization the (B,H,S,D) kernel forces."""
    return small_attention_packed(
        q, k, v, kv_mask, n_heads=n_heads, causal=causal, sm_scale=sm_scale,
        interpret=interpret, dropout_rate=dropout_rate,
        dropout_seed=dropout_seed)


def _attention_packed_fwd(q, k, v, kv_mask, dropout_seed, n_heads, causal,
                          sm_scale, dropout_rate, interpret):
    out = small_attention_packed(
        q, k, v, kv_mask, n_heads=n_heads, causal=causal, sm_scale=sm_scale,
        interpret=interpret, dropout_rate=dropout_rate,
        dropout_seed=dropout_seed)
    return out, (q, k, v, kv_mask, dropout_seed)


def _attention_packed_bwd(n_heads, causal, sm_scale, dropout_rate, interpret,
                          residuals, g):
    q, k, v, kv_mask, dropout_seed = residuals
    dq, dk, dv = small_attention_packed_bwd(
        q, k, v, kv_mask, g, n_heads=n_heads, causal=causal,
        sm_scale=sm_scale, interpret=interpret, dropout_rate=dropout_rate,
        dropout_seed=dropout_seed)
    return dq, dk, dv, None, None


attention_packed.defvjp(_attention_packed_fwd, _attention_packed_bwd)

"""Core transformer layers: multi-head attention and FFN, post-LN blocks.

Semantics follow the reference encoder (`/root/reference/M3P/src/model/
transformer.py:127-227, 842-864`): post-layer-norm residual order, q/sqrt(d_head)
scaling, fp32 softmax, erf-GELU FFN with dropout after the second projection.
Weight matrices carry flax logical-axis annotations ("embed", "heads", "kv",
"mlp") so tensor parallelism is a sharding-rule choice, not a code change.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3p_tpu.ops.activations import gelu_erf
from m3p_tpu.ops.attention import attention
from m3p_tpu.ops.dropout import fused_dropout_add

Dtype = Any
LN_EPS = 1e-12  # all LayerNorms in the reference use eps=1e-12

Cache = Dict[str, jax.Array]


def _dense(features: int, dtype, param_dtype, name: str, logical_axes,
           use_bias: bool = True):
    return nn.Dense(
        features,
        dtype=dtype,
        param_dtype=param_dtype,
        use_bias=use_bias,
        kernel_init=nn.with_logical_partitioning(
            nn.initializers.lecun_normal(), logical_axes),
        bias_init=nn.with_logical_partitioning(
            nn.initializers.zeros_init(), logical_axes[-1:]),
        name=name,
    )


class LayerNorm(nn.Module):
    """fp32 LayerNorm (eps=1e-12) returning the input dtype."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.LayerNorm(
            epsilon=LN_EPS, dtype=jnp.float32, param_dtype=jnp.float32,
            name="ln")(x).astype(self.dtype)


class MultiHeadAttention(nn.Module):
    """Reference-parity MHA over batch-major (B, S, D) tensors.

    Supports self-attention, cross-attention (``kv`` given), and fixed-size
    functional KV caching for incremental decoding (the jit-compatible
    equivalent of the reference cache dict, `transformer.py:187-195`).
    """

    n_heads: int
    dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = True
    seq_axis: Optional[str] = None   # set -> ring attention over this axis
    quant: str = "none"              # "int8_bwd" -> quantized projections

    def setup(self) -> None:
        d, pd = self.dtype, self.param_dtype
        # quant mode reads the q/k/v kernels directly through the fused
        # single-quantization QKV GEMM (naive per-GEMM QuantDense here
        # measured slower: 3x the quantization overhead on small GEMMs)
        self.q_lin = _dense(self.dim, d, pd, "q_lin", ("embed", "qkv"))
        self.k_lin = _dense(self.dim, d, pd, "k_lin", ("embed", "qkv"))
        self.v_lin = _dense(self.dim, d, pd, "v_lin", ("embed", "qkv"))
        self.out_lin = _dense(self.dim, d, pd, "out_lin", ("qkv", "embed"))
        self.attn_dropout = nn.Dropout(rate=self.dropout)

    def _split(self, x: jax.Array) -> jax.Array:
        b, s, _ = x.shape
        h = self.n_heads
        return x.reshape(b, s, h, self.dim // h).transpose(0, 2, 1, 3)

    def _merge(self, x: jax.Array) -> jax.Array:
        b, h, s, dh = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)

    def _fused_int8_qkv(self, x):
        """Self-attention projections as ONE int8 GEMM: the three kernels
        concatenate to (D, 3D), the activations quantize once (the naive
        per-GEMM int8 variant paid 3x the quantization overhead)."""
        from m3p_tpu.ops.quant import int8_matmul_qbwd

        kq = self.q_lin.variables["params"]["kernel"]
        kk = self.k_lin.variables["params"]["kernel"]
        kv_ = self.v_lin.variables["params"]["kernel"]
        bq = self.q_lin.variables["params"]["bias"]
        bk = self.k_lin.variables["params"]["bias"]
        bv = self.v_lin.variables["params"]["bias"]
        kernel = jnp.concatenate([kq, kk, kv_], axis=1).astype(self.dtype)
        bias = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
        b, s, d = x.shape
        out = int8_matmul_qbwd(x.reshape(-1, d).astype(self.dtype), kernel)
        out = out.reshape(b, s, 3 * d) + bias
        return jnp.split(out, 3, axis=-1)

    def _q8(self, name: str, kernel: jax.Array):
        """Frozen-weight int8 (inference): first pass with a mutable "q8"
        collection quantizes ``kernel`` once and stores it; later applies
        that provide the collection read it back.  Returns (wq, sw) or None
        (no collection anywhere -> caller falls back to dynamic quant)."""
        from m3p_tpu.ops.quant import prequantize_nn

        if (self.is_mutable_collection("q8")
                and not self.has_variable("q8", name + "_wq")):
            wq, sw = prequantize_nn(kernel)
            self.put_variable("q8", name + "_wq", wq)
            self.put_variable("q8", name + "_sw", sw)
        if self.has_variable("q8", name + "_wq"):
            return (self.get_variable("q8", name + "_wq"),
                    self.get_variable("q8", name + "_sw"))
        return None

    def _fused_qkv_infer(self, x):
        """int8_infer self-attention projections: one GEMM against the
        pre-quantized concatenated (D, 3D) kernel; None if no q8 collection
        is available (caller falls back to the plain projections)."""
        from m3p_tpu.ops.quant import int8_matmul_pre

        p = lambda m: m.variables["params"]  # noqa: E731
        kernel = jnp.concatenate(
            [p(self.q_lin)["kernel"], p(self.k_lin)["kernel"],
             p(self.v_lin)["kernel"]], axis=1).astype(self.dtype)
        q8 = self._q8("qkv", kernel)
        if q8 is None:
            return None
        bias = jnp.concatenate(
            [p(self.q_lin)["bias"], p(self.k_lin)["bias"],
             p(self.v_lin)["bias"]]).astype(self.dtype)
        b, s, d = x.shape
        x2d = x.reshape(-1, d).astype(self.dtype)
        out = int8_matmul_pre(x2d, *q8)
        out = out.reshape(b, s, 3 * d) + bias
        return jnp.split(out, 3, axis=-1)

    def _project_out(self, merged: jax.Array) -> jax.Array:
        """Output projection; int8_infer routes skinny (weight-HBM-bound)
        shapes through the pre-quantized kernel — decode steps — and leaves
        compute-bound shapes on the plain bf16 GEMM (ops/quant.py)."""
        from m3p_tpu.ops.quant import PREQUANT_MAX_M, int8_matmul_pre

        m = 1
        for d in merged.shape[:-1]:
            m *= int(d)
        if self.quant != "int8_infer" or self.is_initializing():
            return self.out_lin(merged)
        kernel = self.out_lin.variables["params"]["kernel"].astype(self.dtype)
        q8 = self._q8("out", kernel)
        if q8 is None or m > PREQUANT_MAX_M:
            return self.out_lin(merged)
        bias = self.out_lin.variables["params"]["bias"].astype(self.dtype)
        x2d = merged.reshape(-1, merged.shape[-1]).astype(self.dtype)
        y = int8_matmul_pre(x2d, *q8)
        return y.reshape(*merged.shape[:-1], -1) + bias

    def __call__(
        self,
        x: jax.Array,                       # (B, Sq, D)
        kv_mask: Optional[jax.Array],       # (B, Sk) True = attend
        kv: Optional[jax.Array] = None,     # (B, Sk, D) for cross-attention
        causal: bool = False,
        cache: Optional[Cache] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[Cache]]:
        # NOTE: a batch-major (B,S,H,Dh) fast path through
        # `ops.attention.attention_bshd` (no materialized head transpose) was
        # measured end-to-end on v5e at 789 vs 792 samples/s — neutral; XLA
        # already folds the head permutation into adjacent fusions at these
        # shapes, so the simpler single-layout formulation is kept.
        from m3p_tpu.ops.quant import PREQUANT_MAX_M

        use_fused_qkv = (kv is None and cache is None
                         and not self.is_initializing()
                         and (self.quant == "int8_bwd"
                              or (self.quant == "int8_infer"
                                  and x.shape[0] * x.shape[1]
                                  <= PREQUANT_MAX_M)))
        fused = None
        if use_fused_qkv:
            fused = (self._fused_qkv_infer(x) if self.quant == "int8_infer"
                     else self._fused_int8_qkv(x))
        packed2d = None     # (B, S, H*Dh) projections for the packed kernel
        if fused is not None:
            qp, kp, vp = fused
            packed2d = (qp, kp, vp)
            q, k, v = self._split(qp), self._split(kp), self._split(vp)
        else:
            qp = self.q_lin(x)
            q = self._split(qp)

            if cache is not None and kv is not None and "k" in cache:
                # cross-attention KV reused across decode steps
                k, v = cache["k"], cache["v"]
            else:
                src = x if kv is None else kv
                kp, vp = self.k_lin(src), self.v_lin(src)
                k, v = self._split(kp), self._split(vp)
                if cache is None:
                    # self-attention AND training-time cross-attention (the
                    # packed kernel supports sq != sk); decode paths keep
                    # the split layout for the KV cache
                    packed2d = (qp, kp, vp)

        new_cache: Optional[Cache] = None
        if cache is not None:
            if kv is not None:
                new_cache = {"k": k, "v": v}
            else:
                # self-attention decode: write the new step into a fixed-size
                # (B, H, S_max, Dh) cache at position cache["pos"]
                pos = cache["pos"]  # scalar int32
                ck = jax.lax.dynamic_update_slice(
                    cache["k"], k.astype(cache["k"].dtype), (0, 0, pos, 0))
                cv = jax.lax.dynamic_update_slice(
                    cache["v"], v.astype(cache["v"].dtype), (0, 0, pos, 0))
                new_cache = {"k": ck, "v": cv, "pos": pos + q.shape[2]}
                k, v = ck, cv
                # attend to the filled region of the cache only; the query
                # pad mask does not apply to keys during decode
                s_max = ck.shape[2]
                step_mask = jnp.arange(s_max)[None, :] < (pos + q.shape[2])
                kv_mask = jnp.broadcast_to(step_mask, (q.shape[0], s_max))
                causal = False  # cache mask already restricts to <= current pos

        if self.seq_axis is not None and kv is None and cache is None:
            # sequence-parallel self-attention: q/k/v blocks are local slices
            # of the seq-sharded activations; ring attention rotates K/V
            from m3p_tpu.ops.ring_attention import ring_attention

            ctx = ring_attention(q, k, v, kv_mask, self.seq_axis,
                                 causal=causal)
            return self._project_out(self._merge(ctx)), new_cache

        # Beam-folded cross-attention: when the cached cross K/V has fewer
        # rows than the queries (beam decode with an UNREPLICATED source —
        # all K beams of a row attend to the same keys), fold the beam
        # replica dim into the query-sequence dim so each row's K/V is read
        # from HBM once per step instead of once per beam (profiled as a
        # dominant beam-decode cost at 100 regions; see generation.py).
        fold = 1
        if (kv is not None and cache is not None
                and k.shape[0] != q.shape[0]):
            assert q.shape[0] % k.shape[0] == 0, (q.shape, k.shape)
            fold = q.shape[0] // k.shape[0]
            bkv, h, sq, dh = k.shape[0], q.shape[1], q.shape[2], q.shape[3]
            q = (q.reshape(bkv, fold, h, sq, dh).transpose(0, 2, 1, 3, 4)
                 .reshape(bkv, h, fold * sq, dh))
            if kv_mask is not None and kv_mask.shape[0] != bkv:
                # replicated mask rows are identical within a fold group
                kv_mask = kv_mask.reshape(bkv, fold, -1)[:, 0]

        use_dropout = (not deterministic) and self.dropout > 0.0
        if (self.use_pallas and jax.default_backend() == "tpu"
                and packed2d is not None and self.seq_axis is None
                and fold == 1
                and q.shape[2] <= 512 and k.shape[2] <= 512):
            # Encoder self-attention (the hot path, train AND eval): the
            # layout-native packed kernel consumes the (B, S, H*Dh)
            # projections DIRECTLY and returns the same layout for the
            # out-projection — no (B,H,S,D) transpose ever materializes
            # around the pallas_call, and no (B,H,S,S) softmax residual
            # ever hits HBM (the backward recomputes in-kernel).  Measured
            # at the flagship step (12L, BN=80, S=164): 873 samples/s at
            # rate 0 vs 793 on the XLA path, 852 at rate 0.1 vs 735 on the
            # (B,H,S,D) small kernel and 614 on the XLA mask path.  With
            # dropout the keep mask comes from the in-kernel hardware PRNG
            # seeded per (batch, head) — regenerated bitwise in the
            # backward, never in HBM (see ops/attention.py
            # `attention_packed`).
            from m3p_tpu.ops.attention import attention_packed

            if use_dropout:
                seed = jax.lax.bitcast_convert_type(
                    jax.random.bits(self.make_rng("dropout"), (), jnp.uint32),
                    jnp.int32)
                rate = self.dropout
            else:
                seed, rate = None, 0.0
            qp2, kp2, vp2 = packed2d
            ctx2 = attention_packed(qp2, kp2, vp2, kv_mask, seed,
                                    self.n_heads, causal, None, rate)
            return self._project_out(ctx2), new_cache
        if (use_dropout and self.use_pallas and fold == 1
                and jax.default_backend() == "tpu"):
            # non-packed shapes with attention dropout (cross-attention,
            # S > 512 flash): dropout fused into the (B,H,S,D) Pallas
            # kernels — keep mask from the in-kernel hardware PRNG, no
            # (B,H,Sq,Sk) random tensor ever materialized (the XLA mask
            # path below measured 22.6% of the flagship step at rate 0.1)
            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(self.make_rng("dropout"), (), jnp.uint32),
                jnp.int32)
            ctx = attention(q, k, v, kv_mask, causal=causal, use_pallas=True,
                            dropout_rate=self.dropout, dropout_seed=seed)
        elif use_dropout:
            # off-TPU fallback (and beam-folded decode): explicit mask
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.float32(q.shape[-1]))
            if kv_mask is not None:
                neg = jnp.finfo(jnp.float32).min * 0.7
                scores = jnp.where(kv_mask[:, None, None, :], scores, neg)
            if causal:
                sq, sk = q.shape[2], k.shape[2]
                qi = jnp.arange(sq)[:, None] + (sk - sq)
                ki = jnp.arange(sk)[None, :]
                neg = jnp.finfo(jnp.float32).min * 0.7
                scores = jnp.where((ki <= qi)[None, None], scores, neg)
            w = jax.nn.softmax(scores, axis=-1)
            w = self.attn_dropout(w, deterministic=False)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)
        else:
            ctx = attention(q, k, v, kv_mask, causal=causal,
                            use_pallas=self.use_pallas)

        if fold > 1:
            bkv, h, _, dh = ctx.shape
            sq = ctx.shape[2] // fold
            ctx = (ctx.reshape(bkv, h, fold, sq, dh).transpose(0, 2, 1, 3, 4)
                   .reshape(bkv * fold, h, sq, dh))
        out = self._project_out(self._merge(ctx))
        return out, new_cache


class QuantDense(nn.Module):
    """Dense with the GEMM routed through the int8 MXU path — identical
    parameter structure/naming to nn.Dense (checkpoint-compatible)."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    logical_axes: tuple = ("embed", "mlp")

    quant_bwd: bool = False   # int8 dgrad/wgrad as well
    prequant: bool = False    # frozen-weight inference: weights quantized
                              # once into the "q8" collection (see
                              # `m3p_tpu.ops.quant.int8_matmul_pre`)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from m3p_tpu.ops.quant import (
            int8_matmul, int8_matmul_pre, int8_matmul_qbwd, prequantize_nn)

        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(nn.initializers.lecun_normal(),
                                         self.logical_axes),
            (x.shape[-1], self.features), self.param_dtype)
        bias = self.param(
            "bias",
            nn.with_logical_partitioning(nn.initializers.zeros_init(),
                                         self.logical_axes[-1:]),
            (self.features,), self.param_dtype)
        xc = x.astype(self.dtype)
        kc = kernel.astype(self.dtype)
        if self.prequant and not self.is_initializing():
            from m3p_tpu.ops.quant import PREQUANT_MAX_M

            m = 1
            for d in xc.shape[:-1]:
                m *= int(d)
            if (self.is_mutable_collection("q8")
                    and not self.has_variable("q8", "wq")):
                wq, sw = prequantize_nn(kc)
                self.put_variable("q8", "wq", wq)
                self.put_variable("q8", "sw", sw)
            if self.has_variable("q8", "wq") and m <= PREQUANT_MAX_M:
                y = int8_matmul_pre(xc, self.get_variable("q8", "wq"),
                                    self.get_variable("q8", "sw"))
            else:
                # compute-bound shape (or no q8 provided): plain bf16 GEMM —
                # int8 measured neutral-to-worse here (ops/quant.py)
                y = jnp.einsum("...k,kn->...n", xc, kc)
        elif self.quant_bwd:
            x2d = xc.reshape(-1, xc.shape[-1])
            y = int8_matmul_qbwd(x2d, kc).reshape(*xc.shape[:-1],
                                                  self.features)
        else:
            y = int8_matmul(xc, kc)
        return y + bias.astype(self.dtype)


class TransformerFFN(nn.Module):
    """2-layer MLP, erf-GELU, dropout after the output projection
    (`transformer.py:213-227`).

    ``quant="int8"`` routes both GEMMs through the int8 MXU path
    (`m3p_tpu.ops.quant`) — 2x peak on v5e, straight-through gradients."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    gelu_activation: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 skip_dropout: bool = False) -> jax.Array:
        if self.quant in ("int8", "int8_bwd", "int8_all", "int8_infer"):
            qb = self.quant in ("int8_bwd", "int8_all")
            pre = self.quant == "int8_infer"
            lin1 = QuantDense(self.hidden_dim, self.dtype, self.param_dtype,
                              ("embed", "mlp"), qb, pre, name="lin1")
            lin2 = QuantDense(self.dim, self.dtype, self.param_dtype,
                              ("mlp", "embed"), qb, pre, name="lin2")
        else:
            lin1 = _dense(self.hidden_dim, self.dtype, self.param_dtype,
                          "lin1", ("embed", "mlp"))
            lin2 = _dense(self.dim, self.dtype, self.param_dtype,
                          "lin2", ("mlp", "embed"))
        h = lin1(x)
        h = gelu_erf(h) if self.gelu_activation else jax.nn.relu(h)
        h = lin2(h)
        if not skip_dropout:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        return h


class MoEFFN(nn.Module):
    """Mixture-of-experts FFN with expert-choice routing.

    TPU-native scale-up FFN with no reference equivalent (the reference is a
    dense 12L/768d encoder, `transformer.py:610-729`); SURVEY.md §2.3 asks
    that the layer API not preclude expert parallelism — this makes EP a
    first-class axis.  Routing is expert-choice (each expert selects its
    top-C tokens by router affinity), so load balance is structural and no
    auxiliary balancing loss is needed — the whole layer stays a pure
    function of (params, x).  Tokens picked by several experts mix their
    outputs; unselected tokens output zero and ride the residual stream.
    Static shapes throughout: top_k + gather + batched einsum (MXU-friendly),
    no data-dependent control flow.

    Expert weights carry the "expert" logical axis, so expert parallelism is
    a LOGICAL_RULES mapping like every other strategy, and EP composes with
    TP (the "mlp" axis).  Expert-choice looks at the whole sequence, so MoE
    blocks cannot run causal decoding (EncoderBlock asserts).
    """

    dim: int
    hidden_dim: int
    n_experts: int
    capacity_factor: float = 2.0
    dropout: float = 0.0
    gelu_activation: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 skip_dropout: bool = False) -> jax.Array:
        b, s, d = x.shape
        t = b * s
        e = self.n_experts
        cap = min(t, max(1, int(self.capacity_factor * t / e)))
        xt = x.reshape(t, d)

        router = self.param(
            "router",
            nn.with_logical_partitioning(nn.initializers.lecun_normal(),
                                         ("embed", "expert")),
            (d, e), jnp.float32)
        w1 = self.param(
            "w1",
            nn.with_logical_partitioning(nn.initializers.lecun_normal(),
                                         ("expert", "embed", "mlp")),
            (e, d, self.hidden_dim), self.param_dtype)
        b1 = self.param(
            "b1",
            nn.with_logical_partitioning(nn.initializers.zeros_init(),
                                         ("expert", "mlp")),
            (e, self.hidden_dim), self.param_dtype)
        w2 = self.param(
            "w2",
            nn.with_logical_partitioning(nn.initializers.lecun_normal(),
                                         ("expert", "mlp", "embed")),
            (e, self.hidden_dim, d), self.param_dtype)
        b2 = self.param(
            "b2",
            nn.with_logical_partitioning(nn.initializers.zeros_init(),
                                         ("expert", "embed")),
            (e, d), self.param_dtype)

        # router affinity in fp32 (softmax over the expert dim; each expert
        # then takes its top-C tokens — the expert-choice formulation)
        affinity = jax.nn.softmax(xt.astype(jnp.float32) @ router, axis=-1)
        gates, idx = jax.lax.top_k(affinity.T, cap)          # (E, C) each

        xe = jnp.take(xt, idx, axis=0)                       # (E, C, D)
        h = jnp.einsum("ecd,edh->ech", xe, w1.astype(self.dtype))
        h = h + b1[:, None, :].astype(self.dtype)
        h = gelu_erf(h) if self.gelu_activation else jax.nn.relu(h)
        ye = jnp.einsum("ech,ehd->ecd", h, w2.astype(self.dtype))
        ye = ye + b2[:, None, :].astype(self.dtype)
        ye = ye * gates[..., None].astype(self.dtype)

        # combine: scatter-add each expert's weighted outputs back to token
        # positions (partial sums reduce over the expert axis under GSPMD)
        y = jnp.zeros((t, d), self.dtype).at[idx.reshape(-1)].add(
            ye.reshape(-1, d))
        y = y.reshape(b, s, d)
        if not skip_dropout:
            y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        return y


class EncoderBlock(nn.Module):
    """Post-LN block: x = LN1(x + drop(attn)); [x = LN15(x + drop(enc_attn))];
    x = LN2(x + ffn(x)); x *= pad_mask (`transformer.py:842-864, 1070-1100`)."""

    n_heads: int
    dim: int
    ffn_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    gelu_activation: bool = True
    has_cross_attention: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = True
    fused_dropout: bool = False  # Pallas hw-PRNG residual dropout on TPU
    seq_axis: Optional[str] = None
    ffn_quant: str = "none"
    moe_experts: int = 0         # > 0: expert-choice MoE FFN (see MoEFFN)
    moe_capacity_factor: float = 2.0

    def setup(self) -> None:
        attn_quant = ("int8_bwd" if self.ffn_quant == "int8_all"
                      else "int8_infer" if self.ffn_quant == "int8_infer"
                      else "none")
        kw = dict(n_heads=self.n_heads, dim=self.dim, dtype=self.dtype,
                  param_dtype=self.param_dtype, use_pallas=self.use_pallas,
                  dropout=self.attention_dropout, seq_axis=self.seq_axis,
                  quant=attn_quant)
        self.attn = MultiHeadAttention(name="attn", **kw)
        self.ln1 = LayerNorm(dtype=self.dtype, name="ln1")
        if self.has_cross_attention:
            self.encoder_attn = MultiHeadAttention(name="encoder_attn", **kw)
            self.ln15 = LayerNorm(dtype=self.dtype, name="ln15")
        if self.moe_experts > 0:
            self.ffn = MoEFFN(
                dim=self.dim, hidden_dim=self.ffn_dim,
                n_experts=self.moe_experts,
                capacity_factor=self.moe_capacity_factor,
                dropout=self.dropout,
                gelu_activation=self.gelu_activation, dtype=self.dtype,
                param_dtype=self.param_dtype, name="moe_ffn")
        else:
            self.ffn = TransformerFFN(
                dim=self.dim, hidden_dim=self.ffn_dim, dropout=self.dropout,
                gelu_activation=self.gelu_activation, dtype=self.dtype,
                param_dtype=self.param_dtype, quant=self.ffn_quant,
                name="ffn")
        self.ln2 = LayerNorm(dtype=self.dtype, name="ln2")
        self.res_dropout = nn.Dropout(rate=self.dropout)

    def __call__(
        self,
        x: jax.Array,                         # (B, S, D)
        pad_mask: jax.Array,                  # (B, S) True = valid
        causal: bool = False,
        src_enc: Optional[jax.Array] = None,  # (B, Ss, D)
        src_mask: Optional[jax.Array] = None, # (B, Ss)
        cache: Optional[Dict[str, Cache]] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[Dict[str, Cache]]]:
        drop = self.res_dropout
        # expert-choice routing selects tokens over the whole sequence, so a
        # MoE block cannot run causal decoding (see MoEFFN); params are
        # causal-independent, so the full-surface init may still trace it
        assert (not (causal and self.moe_experts > 0)
                or self.is_initializing()), \
            "MoE (expert-choice) blocks do not support causal decoding"
        new_cache: Dict[str, Cache] = {}
        # Pallas fused dropout+residual (hardware PRNG, mask regenerated in
        # bwd from the seed) — the XLA threefry dropout path costs ~17%/step
        use_fused = (self.fused_dropout and not deterministic
                     and self.dropout > 0.0
                     and jax.default_backend() == "tpu")

        def residual(branch_out, res):
            if use_fused:
                seed = jax.random.bits(self.make_rng("dropout"),
                                       dtype=jnp.uint32).astype(jnp.int32)
                return fused_dropout_add(branch_out, res, seed, self.dropout)
            return res + drop(branch_out, deterministic=deterministic)

        self_cache = cache.get("self") if cache is not None else None
        attn_out, c = self.attn(x, pad_mask, causal=causal, cache=self_cache,
                                deterministic=deterministic)
        if c is not None:
            new_cache["self"] = c
        x = self.ln1(residual(attn_out, x))

        if self.has_cross_attention and src_enc is not None:
            cross_cache = cache.get("cross") if cache is not None else None
            attn_out, c = self.encoder_attn(
                x, src_mask, kv=src_enc, cache=cross_cache,
                deterministic=deterministic)
            if c is not None:
                new_cache["cross"] = c
            x = self.ln15(residual(attn_out, x))

        ffn_out = self.ffn(x, deterministic=deterministic,
                           skip_dropout=use_fused)
        if use_fused:
            x = self.ln2(residual(ffn_out, x))
        else:
            # ffn applied its own output dropout (reference layout)
            x = self.ln2(x + ffn_out)
        x = x * pad_mask[..., None].astype(x.dtype)
        return x, (new_cache if cache is not None else None)

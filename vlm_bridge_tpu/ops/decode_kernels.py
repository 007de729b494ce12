"""Fused per-layer Gemma-2 decode kernels (int8 weights, int8 KV cache).

Why: the round-2 batch-64 int8 decode ran at 5.3 ms/token-step on v5e vs a
~3.6 ms weight-stream floor. A per-op trace (scripts/profile_decode.py)
attributed ~3.1 ms to the int8 matmul kernels (each at/near its bandwidth
floor) and ~2 ms to XLA glue BETWEEN them: cache slicing/dequant fusions,
decode-attention logits/softmax, RoPE, four RMSNorms and residual adds per
layer — each a separate small fusion that cannot cross the custom-call
boundaries. These kernels move that glue inside the matmul kernels, so one
decoder layer is TWO launches:

  fused_attn_step : rms_norm -> fused-qkv int8 proj -> RoPE -> per-vector
                    int8 KV quantization -> cache attention (GQA, logit
                    softcap; the NEW position's K/V attend from registers,
                    so the kernel never writes the cache) -> o-proj ->
                    post-attn rms_norm -> residual
  fused_mlp_step  : pre-FFN rms_norm -> gate/up/GELU/down (int8, tiled
                    over F) -> post-FFN rms_norm -> residual

The kernel returns the new K/V (int8 + scales) and XLA writes them into the
cache with cheap dynamic_update_slices (measured ~0.1 ms/token total) —
Mosaic supports dynamic stores only on leading dims, and re-laying the cache
for stores would cost more than the XLA writes do.

Layout notes (probed on v5e, 2026-08-17): batched `dot_general` requires
the batch dim LEADING in both operands — hence cache [B, S, KH*D] and
per-kv-head scale caches [KH, B, S] (so a static kh slice yields a
contiguous [B, S]). int8 VMEM tiles are (32, 128).

Replaces the per-token compute the reference does through
`F.scaled_dot_product_attention` + separate Linear modules
(reference: src/vlm_bridge/model_architecture/bridge_module.py:122-139 and
the no-cache loop in full_model.py:241-373).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tests flip this (or set VLM_BRIDGE_PALLAS_INTERPRET=1) to exercise the
# kernels via the Pallas interpreter, e.g. to drive the fused decode path
# in a CPU subprocess (tests/test_bench_cli.py host-init test).
# "0"/"false"/"" disable (raw truthiness would turn =0 into ON).
INTERPRET = os.environ.get(
    "VLM_BRIDGE_PALLAS_INTERPRET", "").lower() not in ("", "0", "false")

# Attention inner-product strategy (microbenched on v5e, scripts/attn_micro.py):
#   "dots"  — per-(kv-head, group) batched dot_general: Mosaic lowers the
#             batch dim as a loop of B tiny MXU ops (16 dots/layer -> 1024
#             MXU pipeline fills at B=64)
#   "dots2" — per-kv-head batched dots with the G query heads stacked
#             (8 dots/layer -> 512 pipeline fills)
#   "vpu"   — broadcast-multiply + reduce: vectorizes across B in sublanes,
#             no per-batch loop
#   "skip"  — diagnostic only: bypass attention math (isolates its cost)
ATTN_MODE = "dots"


def _rms(xf: jax.Array, w_row: jax.Array, eps: float) -> jax.Array:
    """f32 RMSNorm with Gemma's (1 + w) weighting. xf: [M, H]; w_row: [1, H]."""
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps) * (1.0 + w_row)


def _rope_pair(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Gemma rotate_half RoPE on one head. x: [B, D]; cos/sin: [1, D]."""
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[:, half:], x[:, :half]], axis=-1)
    return x * cos + rot * sin


# ---------------------------------------------------------------------------
# Attention step kernel
# ---------------------------------------------------------------------------


def _attn_kernel(
    t_ref,       # SMEM [1] int32: current position (cache rows < t are valid)
    x_ref,       # [B, H] bf16
    wqkv_ref,    # [H, QHD + 2*KHD] int8
    qkvs_ref,    # [1, QHD + 2*KHD] f32
    wo_ref,      # [QHD, H] int8
    os_ref,      # [1, H] f32
    innorm_ref,  # [1, H] f32
    postnorm_ref,
    cos_ref,     # [1, D] f32
    sin_ref,
    kc_ref,      # [B, S, KHD] int8 (history; position t not yet written)
    vc_ref,
    ks_ref,      # [KH, B, S] f32 (per-key dequant scales)
    vs_ref,
    xo_ref,      # out [B, H] bf16
    kn_ref,      # out [B, KHD] int8 — new K, for the XLA cache write
    vn_ref,
    kns_ref,     # out [KH, B] f32
    vns_ref,
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    attn_scale: float,
    softcap: float,
    eps: float,
):
    B, H = x_ref.shape
    S = kc_ref.shape[1]
    D = head_dim
    G = num_heads // num_kv_heads
    t = t_ref[0]

    xf = x_ref[...].astype(jnp.float32)
    h = _rms(xf, innorm_ref[0][None, :], eps).astype(jnp.bfloat16)

    # fused qkv projection: int8 -> bf16 is lossless; MXU bf16 path
    qkv = jax.lax.dot_general(
        h, wqkv_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * qkvs_ref[0][None, :]

    cos = cos_ref[...]
    sin = sin_ref[...]
    QHD = num_heads * D
    KHD = num_kv_heads * D

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)  # [1, S]
    hist_valid = (s_iota < t)  # [1, S]

    attn_heads = []
    k_heads, v_heads = [], []
    k_scales, v_scales = [], []
    for kh in range(num_kv_heads):
        # --- new K/V for this kv head: rope, then per-vector int8 ---
        k_new = _rope_pair(qkv[:, QHD + kh * D: QHD + (kh + 1) * D], cos, sin)
        v_new = qkv[:, QHD + KHD + kh * D: QHD + KHD + (kh + 1) * D]
        k_sc = jnp.maximum(jnp.max(jnp.abs(k_new), axis=-1, keepdims=True),
                           1e-12) / 127.0                       # [B, 1]
        v_sc = jnp.maximum(jnp.max(jnp.abs(v_new), axis=-1, keepdims=True),
                           1e-12) / 127.0
        k_i8 = jnp.clip(jnp.round(k_new / k_sc), -127, 127).astype(jnp.int8)
        v_i8 = jnp.clip(jnp.round(v_new / v_sc), -127, 127).astype(jnp.int8)
        k_heads.append(k_i8)
        v_heads.append(v_i8)
        k_scales.append(k_sc)
        v_scales.append(v_sc)
        # attention sees the QUANTIZED new key/value — bit-identical to the
        # jnp path, which writes the cache first and attends int8
        k_q = k_i8.astype(jnp.float32) * k_sc                    # [B, D]
        v_q = v_i8.astype(jnp.float32) * v_sc

        K_hist = kc_ref[:, :, kh * D:(kh + 1) * D].astype(jnp.bfloat16)
        V_hist = vc_ref[:, :, kh * D:(kh + 1) * D].astype(jnp.bfloat16)
        ks_hist = ks_ref[kh]                                     # [B, S] f32
        vs_hist = vs_ref[kh]

        if ATTN_MODE == "dots2":
            # all G query heads of this kv head in ONE batched dot pair.
            # TWIN: _stack_kernel's _attention carries the same numerics
            # (plus cache-window re-quantization) — softcap/mask changes
            # must be applied to BOTH so the parity tests keep agreeing.
            qs = [_rope_pair(qkv[:, (kh * G + g) * D:(kh * G + g + 1) * D],
                             cos, sin) for g in range(G)]
            qg = jnp.concatenate([q[:, None, :] for q in qs], axis=1)  # [B,G,D] f32
            lg = jax.lax.dot_general(
                qg.astype(jnp.bfloat16), K_hist, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # [B, G, S]
            lg = lg * (ks_hist * attn_scale)[:, None, :]
            lg = jnp.tanh(lg / softcap) * softcap
            lg = jnp.where(hist_valid[:, None, :], lg, -1e30)
            ls = jnp.sum(qg * k_q[:, None, :], axis=-1,
                         keepdims=True) * attn_scale          # [B, G, 1]
            ls = jnp.tanh(ls / softcap) * softcap
            m = jnp.maximum(jnp.max(lg, axis=-1, keepdims=True), ls)
            e_hist = jnp.where(hist_valid[:, None, :], jnp.exp(lg - m), 0.0)
            e_self = jnp.exp(ls - m)
            denom = jnp.sum(e_hist, axis=-1, keepdims=True) + e_self
            p_hist = (e_hist / denom) * vs_hist[:, None, :]   # [B, G, S] f32
            out = jax.lax.dot_general(
                p_hist.astype(jnp.bfloat16), V_hist,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)           # [B, G, D]
            out = out + (e_self / denom) * v_q[:, None, :]
            # minor-dim merge [B, G, D] -> [B, G*D]: per-g slices keep
            # sublane offsets the final concat rejects ("offset mismatch
            # on non-concat dimension")
            attn_heads.append(out.reshape(B, G * D))
            continue
        for g in range(G):
            qh = kh * G + g
            q = _rope_pair(qkv[:, qh * D:(qh + 1) * D], cos, sin)  # [B, D] f32
            if ATTN_MODE == "skip":
                attn_heads.append(q)
                continue
            if ATTN_MODE == "vpu":
                # vectorize over B in sublanes; reduce over D in lanes
                lg = jnp.sum(q[:, None, :] * K_hist.astype(jnp.float32),
                             axis=-1)                            # [B, S]
            else:
                # expand to [B, 1, D] while still f32 — Mosaic cannot
                # shape-cast packed bf16 2D->3D
                qb = q[:, None, :].astype(jnp.bfloat16)
                # history logits: [B, 1, D] x [B, S, D] -> [B, 1, S]
                lg = jax.lax.dot_general(
                    qb, K_hist, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)[:, 0, :]  # [B, S]
            lg = lg * ks_hist * attn_scale
            lg = jnp.tanh(lg / softcap) * softcap
            lg = jnp.where(hist_valid, lg, -1e30)
            # self logit (position t): q . k_new
            ls = jnp.sum(q * k_q, axis=-1, keepdims=True) * attn_scale
            ls = jnp.tanh(ls / softcap) * softcap                # [B, 1]

            m = jnp.maximum(jnp.max(lg, axis=-1, keepdims=True), ls)
            e_hist = jnp.where(hist_valid, jnp.exp(lg - m), 0.0)
            e_self = jnp.exp(ls - m)
            denom = jnp.sum(e_hist, axis=-1, keepdims=True) + e_self
            p_hist = (e_hist / denom) * vs_hist                  # [B, S] f32
            if ATTN_MODE == "vpu":
                out = jnp.sum(p_hist[:, :, None] * V_hist.astype(jnp.float32),
                              axis=1)                            # [B, D]
            else:
                # [B, 1, S] x [B, S, D] -> [B, 1, D] (f32 expand, then cast)
                out = jax.lax.dot_general(
                    p_hist[:, None, :].astype(jnp.bfloat16), V_hist,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)[:, 0, :]
            out = out + (e_self / denom) * v_q
            attn_heads.append(out)

    attn = jnp.concatenate(attn_heads, axis=-1)                  # [B, QHD] f32
    proj = jax.lax.dot_general(
        attn.astype(jnp.bfloat16), wo_ref[...].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * os_ref[0][None, :]
    x_out = xf + _rms(proj, postnorm_ref[0][None, :], eps)

    xo_ref[...] = x_out.astype(xo_ref.dtype)
    kn_ref[...] = jnp.concatenate(k_heads, axis=-1)
    vn_ref[...] = jnp.concatenate(v_heads, axis=-1)
    kns_ref[...] = jnp.concatenate(k_scales, axis=-1).T          # [KH, B]
    vns_ref[...] = jnp.concatenate(v_scales, axis=-1).T


def fused_attn_step(
    t: jax.Array,
    x: jax.Array,
    wqkv: dict,
    wo: dict,
    in_norm: jax.Array,
    post_norm: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    kc: jax.Array,
    vc: jax.Array,
    ks: jax.Array,
    vs: jax.Array,
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    attn_scale: float,
    softcap: float,
    eps: float,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """One decoder layer's attention half for ONE lockstep decode step.

    x: [B, H] bf16 residual stream; t: [] or [1] int32 position; cache
    kc/vc: [B, S, KH*D] int8 with scales ks/vs: [KH, B, S] f32 (valid rows
    are s < t — position t's K/V never touch the cache inside the kernel).
    Returns (x_out [B,H], k_new [B,KHD] int8, v_new, k_scale [KH,B] f32,
    v_scale); the caller writes the new entries at position t.
    """
    B, H = x.shape
    S = kc.shape[1]
    KHD = num_kv_heads * head_dim
    QHD = num_heads * head_dim
    t_arr = jnp.reshape(t, (1,)).astype(jnp.int32)

    kern = functools.partial(
        _attn_kernel, num_heads=num_heads, num_kv_heads=num_kv_heads,
        head_dim=head_dim, attn_scale=attn_scale, softcap=softcap, eps=eps)
    out_shapes = [
        jax.ShapeDtypeStruct((B, H), x.dtype),
        jax.ShapeDtypeStruct((B, KHD), jnp.int8),
        jax.ShapeDtypeStruct((B, KHD), jnp.int8),
        jax.ShapeDtypeStruct((num_kv_heads, B), jnp.float32),
        jax.ShapeDtypeStruct((num_kv_heads, B), jnp.float32),
    ]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * 13,
        out_specs=[vmem] * 5,
        out_shape=out_shapes,
        # weights (14 MB int8) + both caches (8.4 MB) resident: ~31 MB at
        # the 2B flagship shape, above the default 16 MB scoped-vmem cap
        # (v5e VMEM itself probed fine to 64 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(t_arr, x,
      wqkv["w_int8"], wqkv["scale"][None, :].astype(jnp.float32),
      wo["w_int8"], wo["scale"][None, :].astype(jnp.float32),
      in_norm[None, :].astype(jnp.float32),
      post_norm[None, :].astype(jnp.float32),
      cos, sin, kc, vc, ks, vs)


# ---------------------------------------------------------------------------
# MLP step kernel (pre/post norms + residual folded into the int8 GeGLU MLP)
# ---------------------------------------------------------------------------


def _stack_kernel(
    t_ref,        # SMEM [1]
    x_ref,        # [B, H] bf16 — initial residual stream
    wq_ref,       # block (1, H, bq) int8 of [L, H, QHD] — q projection
    qs_ref,       # block (1, 1, bq) f32
    wkv_ref,      # block (1, H, bkv) int8 of [L, H, 2*KHD] — k|v projection
    kvs_ref,      # block (1, 1, bkv) f32
    wo_ref,       # block (1, bo, H) int8 of [L, QHD, H]
    os_ref,       # block (1, 1, H) f32
    norms_ref,    # block (1, 4, H) f32: input/post_attn/pre_ffn/post_ffn
    cos_ref, sin_ref,            # [1, D] f32
    kc_ref, vc_ref,              # block (1, B, S, KHD) int8
    ks_ref, vs_ref,              # block (1, KH, B, S) f32
    g_ref, u_ref,                # block (1, H, Fb) int8
    gus_ref,                     # block (1, 2, Fb) f32 (gate/up scales)
    d_ref,                       # block (1, Fb, H) int8
    ds_ref,                      # block (1, 1, H) f32
    xo_ref,                      # out [B, H] bf16
    kn_ref, vn_ref,              # out block (1, B, 8, KHD) int8: the row-t
                                 # window of the caches, ALIASED onto kc/vc
                                 # (masked read-modify-write of row t%8 —
                                 # Mosaic requires 2nd-minor blocks >= 8)
    kns_ref, vns_ref,            # out block (1, KH, B) f32 scales
    x_scr,                       # (B, H) f32 residual stream
    q_scr,                       # (n_q, B, bq) f32 q-projection chunks
    kv_scr,                      # (n_kv, B, bkv) f32 k|v-projection chunks
    attn_scr,                    # (n_o, B, bo) f32 attention-output chunks
    acc, hb,                     # (B, H) f32 accumulator / bf16 LN buffer
    *,
    num_layers: int,
    n_q: int,
    n_kv: int,
    n_o: int,
    n_f: int,
    bq: int,
    bkv: int,
    bo: int,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    attn_scale: float,
    softcap: float,
    eps: float,
    mlp4: bool = False,
    mlp4_group: int | None = None,
):
    """Whole-stack decode step: grid (L, n_q + n_kv + 1 + n_o + n_f).

    j in [0, n_q)       : q-projection column chunk j into q_scr
    j in [n_q, n_q+n_kv): k|v-projection column chunk into kv_scr
    j == SA             : RoPE + KV quantize + in-place cache write +
                          cache attention into attn_scr
    j in [SO0, SO0+n_o) : o-projection row chunk (accumulate) + residual
    j in [SF0, ...)     : MLP chunk (gate/up/GELU/down accumulate); the
                          last one adds the post-FFN residual; layer L-1
                          writes x_out

    One pallas_call for the whole stack means Pallas's grid pipeline
    prefetches layer i+1's weight blocks during layer i's compute — the
    cross-custom-call DMA serialization that made per-layer fused kernels
    0.89x of XLA (attn_micro r3) does not exist here. Projections are
    CHUNKED so no single weight block exceeds ~7.5 MB: double-buffered
    blocks must fit the ~118 MB VMEM budget at the 9B shapes
    (H=3584, QHD=4096, F=14336), and the un-chunked 2B kernel already sat
    204 KB from the ceiling (block_f=4608 OOM, r3).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    B, H = x_ref.shape
    S = kc_ref.shape[2]
    D = head_dim
    G = num_heads // num_kv_heads
    QHD = num_heads * D
    KHD = num_kv_heads * D
    # stage layout (STATIC specialization): when a chunk count is 1 its
    # stage collapses into a neighbour — single-chunk projections fuse into
    # one j=0 stage and a single-chunk o-proj inlines into the attention
    # stage. Grid steps carry a fixed sequencing cost (~5 us): the naive
    # always-chunked layout measured 3.42 ms/token at 2B vs 3.07 for the
    # collapsed 6-stage structure.
    fuse_proj = (n_q == 1 and n_kv == 1)
    SA = 1 if fuse_proj else n_q + n_kv
    inline_o = (n_o == 1)
    SF0 = SA + 1 + (0 if inline_o else n_o)
    t = t_ref[0]

    @pl.when(j == 0)
    def _qhead():
        @pl.when(i == 0)
        def _load_x():
            x_scr[...] = x_ref[...].astype(jnp.float32)

        hb[...] = _rms(x_scr[...], norms_ref[0, 0][None, :],
                       eps).astype(jnp.bfloat16)

    if fuse_proj:
        @pl.when(j == 0)
        def _qkvproj():
            q_scr[0] = jax.lax.dot_general(
                hb[...], wq_ref[0].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * qs_ref[0, 0][None, :]
            kv_scr[0] = jax.lax.dot_general(
                hb[...], wkv_ref[0].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * kvs_ref[0, 0][None, :]
    else:
        @pl.when(j < n_q)
        def _qproj():
            q_scr[j] = jax.lax.dot_general(
                hb[...], wq_ref[0].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * qs_ref[0, 0][None, :]

        @pl.when(jnp.logical_and(j >= n_q, j < SA))
        def _kvproj():
            kv_scr[j - n_q] = jax.lax.dot_general(
                hb[...], wkv_ref[0].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * kvs_ref[0, 0][None, :]

    @pl.when(j == SA)
    def _attention():
        cos = cos_ref[...]
        sin = sin_ref[...]
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        hist_valid = (s_iota < t)

        def rd_q(off):
            return q_scr[off // bq][:, off % bq: off % bq + D]

        def rd_kv(off):
            return kv_scr[off // bkv][:, off % bkv: off % bkv + D]

        attn_heads = []
        k_heads, v_heads, k_scales, v_scales = [], [], [], []
        for kh in range(num_kv_heads):
            k_new = _rope_pair(rd_kv(kh * D), cos, sin)
            v_new = rd_kv(KHD + kh * D)
            k_sc = jnp.maximum(
                jnp.max(jnp.abs(k_new), axis=-1, keepdims=True), 1e-12) / 127.0
            v_sc = jnp.maximum(
                jnp.max(jnp.abs(v_new), axis=-1, keepdims=True), 1e-12) / 127.0
            k_i8 = jnp.clip(jnp.round(k_new / k_sc), -127, 127).astype(jnp.int8)
            v_i8 = jnp.clip(jnp.round(v_new / v_sc), -127, 127).astype(jnp.int8)
            # 3-D copies for the window write (expand dims while f32 —
            # Mosaic cannot shape-cast packed narrow types 2D->3D)
            k_heads.append(jnp.clip(
                jnp.round(k_new[:, None, :] / k_sc[:, None, :]),
                -127, 127).astype(jnp.int8))
            v_heads.append(jnp.clip(
                jnp.round(v_new[:, None, :] / v_sc[:, None, :]),
                -127, 127).astype(jnp.int8))
            k_scales.append(k_sc)
            v_scales.append(v_sc)
            k_q = k_i8.astype(jnp.float32) * k_sc
            v_q = v_i8.astype(jnp.float32) * v_sc

            K_hist = kc_ref[0, :, :, kh * D:(kh + 1) * D].astype(jnp.bfloat16)
            V_hist = vc_ref[0, :, :, kh * D:(kh + 1) * D].astype(jnp.bfloat16)
            ks_hist = ks_ref[0, kh]
            vs_hist = vs_ref[0, kh]

            # TWIN of _attn_kernel's dots2 body (see note there): keep the
            # softcap/mask/softmax numerics bit-identical across both.
            qs = [_rope_pair(rd_q((kh * G + g) * D), cos, sin)
                  for g in range(G)]
            qg = jnp.concatenate([q[:, None, :] for q in qs], axis=1)
            lg = jax.lax.dot_general(
                qg.astype(jnp.bfloat16), K_hist, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            lg = lg * (ks_hist * attn_scale)[:, None, :]
            lg = jnp.tanh(lg / softcap) * softcap
            lg = jnp.where(hist_valid[:, None, :], lg, -1e30)
            ls = jnp.sum(qg * k_q[:, None, :], axis=-1,
                         keepdims=True) * attn_scale
            ls = jnp.tanh(ls / softcap) * softcap
            m = jnp.maximum(jnp.max(lg, axis=-1, keepdims=True), ls)
            e_hist = jnp.where(hist_valid[:, None, :], jnp.exp(lg - m), 0.0)
            e_self = jnp.exp(ls - m)
            denom = jnp.sum(e_hist, axis=-1, keepdims=True) + e_self
            p_hist = (e_hist / denom) * vs_hist[:, None, :]
            out = jax.lax.dot_general(
                p_hist.astype(jnp.bfloat16), V_hist,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            out = out + (e_self / denom) * v_q[:, None, :]
            attn_heads.append(out.reshape(B, G * D))

        # masked RMW of the 8-row window: row t%8 gets the new K/V, the
        # other rows are copied back unchanged from the full cache block
        # (already resident in VMEM for the history attention)
        sub = t % 8
        wstart = (t // 8) * 8
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
        k_old = kc_ref[0, :, pl.dslice(wstart, 8), :]
        v_old = vc_ref[0, :, pl.dslice(wstart, 8), :]
        kn_ref[0] = jnp.where(w_iota == sub,
                              jnp.concatenate(k_heads, axis=-1), k_old)
        vn_ref[0] = jnp.where(w_iota == sub,
                              jnp.concatenate(v_heads, axis=-1), v_old)
        kns_ref[0] = jnp.concatenate(k_scales, axis=-1).T
        vns_ref[0] = jnp.concatenate(v_scales, axis=-1).T

        if inline_o:
            attn = jnp.concatenate(attn_heads, axis=-1)
            proj = jax.lax.dot_general(
                attn.astype(jnp.bfloat16), wo_ref[0].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * os_ref[0, 0][None, :]
            x_scr[...] = x_scr[...] + _rms(proj, norms_ref[0, 1][None, :],
                                           eps)
        else:
            per_chunk = bo // (G * D)
            for c in range(n_o):
                attn_scr[c] = jnp.concatenate(
                    attn_heads[c * per_chunk:(c + 1) * per_chunk], axis=-1)

    if not inline_o:
        @pl.when(jnp.logical_and(j >= SA + 1, j < SF0))
        def _oproj():
            c = j - (SA + 1)

            @pl.when(c == 0)
            def _o_init():
                acc[...] = jnp.zeros_like(acc)

            acc[...] += jax.lax.dot_general(
                attn_scr[c].astype(jnp.bfloat16),
                wo_ref[0].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(c == n_o - 1)
            def _o_finish():
                proj = acc[...] * os_ref[0, 0][None, :]
                x_scr[...] = x_scr[...] + _rms(proj,
                                               norms_ref[0, 1][None, :], eps)

    @pl.when(j >= SF0)
    def _mlp():
        @pl.when(j == SF0)
        def _mlp_init():
            acc[...] = jnp.zeros_like(acc)
            hb[...] = _rms(x_scr[...], norms_ref[0, 2][None, :],
                           eps).astype(jnp.bfloat16)

        x = hb[...]
        if not mlp4:
            g = jax.lax.dot_general(
                x, g_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * gus_ref[0, 0][None, :]
            u = jax.lax.dot_general(
                x, u_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * gus_ref[0, 1][None, :]
            hf = (jax.nn.gelu(g, approximate=True) * u).astype(jnp.bfloat16)
            acc[...] += jax.lax.dot_general(
                hf, d_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            # int4 MLP: gate/up nibble-packed over the H contraction
            # ([H/2, Fb] tiles, lo nibble = rows 0..H/2, hi = H/2..H —
            # quant.quantize_int4), down packed BLOCK-LOCALLY over F
            # (quant.repack_down_blockwise at this kernel's block_f), so
            # every unpack is bitwise ops + CONTIGUOUS activation slices.
            # Halves the MLP stream (1.66 GB -> 0.83 at 2B).
            from vlm_bridge_tpu.ops.quant import unpack_int4

            H2 = H // 2
            block_f4 = g_ref.shape[2]
            F2b = d_ref.shape[2]  # down4 block: (1, 1, block_f/2, H)

            def _unpack4(p):
                lo, hi = unpack_int4(p)
                return lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)

            g_lo, g_hi = _unpack4(g_ref[0])
            u_lo, u_hi = _unpack4(u_ref[0])
            d_lo, d_hi = _unpack4(d_ref[0, 0])
            if mlp4_group is None:
                # per-channel scales fold into one output multiply
                g = (jax.lax.dot_general(
                        x[:, :H2], g_lo, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(
                        x[:, H2:], g_hi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                     ) * gus_ref[0, 0][None, :]
                u = (jax.lax.dot_general(
                        x[:, :H2], u_lo, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(
                        x[:, H2:], u_hi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                     ) * gus_ref[0, 1][None, :]
                hf = (jax.nn.gelu(g, approximate=True) * u
                      ).astype(jnp.bfloat16)
                acc[...] += jax.lax.dot_general(
                    hf[:, :F2b], d_lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc[...] += jax.lax.dot_general(
                    hf[:, F2b:], d_hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                # sub-channel (group-wise) scales vary along the
                # CONTRACTION axis, so each g-row group gets its own dot
                # and a VPU multiply on its partial product (the
                # _int4_mlp_group_kernel design — statically unrolled
                # STATIC slices, no reshapes/gathers). gus_ref rows:
                # gate lo 0..nG, gate hi nG..2nG, up lo 2nG..3nG, up hi
                # 3nG..4nG (stack_decode_params packs them that way).
                grp4 = mlp4_group
                nG = H2 // grp4
                nGd = F2b // grp4

                def grouped(lo, hi, row0):
                    r = jnp.zeros((B, block_f4), jnp.float32)
                    for gi in range(nG):
                        sl = slice(gi * grp4, (gi + 1) * grp4)
                        r += jax.lax.dot_general(
                            x[:, sl], lo[sl], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                        ) * gus_ref[0, row0 + gi][None, :]
                        r += jax.lax.dot_general(
                            x[:, H2 + gi * grp4:H2 + (gi + 1) * grp4],
                            hi[sl], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                        ) * gus_ref[0, row0 + nG + gi][None, :]
                    return r

                g = grouped(g_lo, g_hi, 0)
                u = grouped(u_lo, u_hi, 2 * nG)
                hf = (jax.nn.gelu(g, approximate=True) * u
                      ).astype(jnp.bfloat16)
                # ds_ref block (1, 1, block_f/g, H): this chunk's lo-half
                # F-groups are rows 0..nGd, hi half nGd..2nGd
                # (repack_down_blockwise block-local halves)
                for gi in range(nGd):
                    sl = slice(gi * grp4, (gi + 1) * grp4)
                    acc[...] += jax.lax.dot_general(
                        hf[:, sl], d_lo[sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ) * ds_ref[0, 0, gi][None, :]
                    acc[...] += jax.lax.dot_general(
                        hf[:, F2b + gi * grp4:F2b + (gi + 1) * grp4],
                        d_hi[sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ) * ds_ref[0, 0, nGd + gi][None, :]

        @pl.when(j == SF0 + n_f - 1)
        def _mlp_finish():
            # group-wise int4 applies its scales during accumulation;
            # every other path folds one per-output-channel row here
            if mlp4 and mlp4_group is not None:
                y = acc[...]
            else:
                y = acc[...] * ds_ref[0, 0][None, :]
            x_scr[...] = x_scr[...] + _rms(y, norms_ref[0, 3][None, :], eps)

            @pl.when(i == num_layers - 1)
            def _write_out():
                xo_ref[...] = x_scr[...].astype(xo_ref.dtype)


def _pick_block(total: int, target: int, mult: int) -> int:
    """Largest divisor of `total` that is a multiple of `mult` and <=
    max(target, mult). The start is snapped DOWN to a multiple of `mult`
    so every candidate is aligned even when the (possibly env-overridden)
    target is not. Falls back to `total` when no aligned divisor exists —
    callers treat that as "don't chunk"."""
    start = min(max(target, mult), total)
    start -= start % mult
    for cand in range(start, mult - 1, -mult):
        if total % cand == 0:
            return cand
    return total


def stack_mlp_block_f(F: int, block_f: int = 2304) -> int:
    """The MLP chunk width fused_stack_step will use for intermediate size
    F (env override + alignment snapping included). Exposed so
    gemma2.stack_decode_params can block-locally nibble-pack the int4 down
    projection at EXACTLY this width — the packing and the kernel's
    BlockSpec slicing must agree or the kernel computes garbage silently."""
    block_f = int(os.environ.get("VLM_BRIDGE_STACK_BLOCK_F", block_f))
    return _pick_block(F, block_f, 128)


def fused_stack_step(
    t: jax.Array,
    x: jax.Array,
    stacked: dict,
    kc: jax.Array, vc: jax.Array, ks: jax.Array, vs: jax.Array,
    cos: jax.Array, sin: jax.Array,
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    attn_scale: float,
    softcap: float,
    eps: float,
    block_f: int = 2304,
    block_proj: int = 2048,
):
    """One lockstep decode step through ALL layers in one pallas_call.

    stacked: dict of layer-stacked weights (see gemma2.stack_decode_params):
      wq [L,H,QHD] i8 + q_scale [L,1,QHD], wkv [L,H,2*KHD] i8 + kv_scale
      [L,1,2*KHD], wo [L,QHD,H] i8 + o_scale [L,1,H], norms [L,4,H],
      gate/up [L,H,F] i8 + gu_scale [L,2,F], down [L,F,H] i8 + down_scale
      [L,1,H].
    caches: kc/vc [L, B, S, KH*D] int8, ks/vs [L, KH, B, S] f32.
    Returns (x_out [B,H], kc' [L,B,S,KHD] i8, vc', k_sc [L,KH,B] f32,
    v_sc). kc'/vc' ARE the input caches updated IN PLACE at row t
    (input_output_aliases + a scalar-prefetch output index map writes the
    row window from inside the kernel) — without the alias, XLA
    materializes two full-cache copies per step because a custom call
    consumes the old cache (measured 2x 0.2 ms at [26,64,64,1024],
    erasing the kernel's 3.0-vs-3.4 ms win over the jnp path). Scales are
    small ([L,KH,B] per step), so the caller scatters those normally.

    Projections are chunked at `block_proj` columns/rows so every weight
    block double-buffers inside the VMEM budget at 9B shapes.

    int4 MLP variant (opt-in, stack_decode_params(mlp_int4=True)): the
    stacked dict carries gate4/up4 [L,H/2,F] i8 (nibble-packed), gu_scale4
    [L, 2 or 2*(H/g), F] f32, down4 [L,n_f,block_f/2,H] i8 (block-locally
    packed at THIS kernel's block_f — see stack_mlp_block_f; the explicit
    chunk dim lets the assert below catch a block_f drift), down_scale4
    [L,1,H] or [L,n_f,block_f/g,H] f32 — detected here from the key names
    and scale shapes. Halves the MLP weight stream (the largest
    decode-byte item).
    """
    B, H = x.shape
    L = stacked["wq"].shape[0]
    mlp4 = "gate4" in stacked
    F = stacked["gate4" if mlp4 else "gate"].shape[2]
    S = kc.shape[2]
    KHD = num_kv_heads * head_dim
    QHD = num_heads * head_dim
    D = head_dim
    G = num_heads // num_kv_heads
    block_f = stack_mlp_block_f(F, block_f)
    n_f = F // block_f
    mlp4_group = None
    if mlp4:
        # the down projection is packed BLOCK-LOCALLY at stacking time, so
        # its arrays carry an explicit chunk dim ([L, n_f, block_f/2, H])
        # — a block_f drift between stacking and this call (env change,
        # different kwarg) would otherwise compute garbage silently
        assert stacked["down4"].shape[1:] == (n_f, block_f // 2, H), (
            f"stacked int4 down packing {stacked['down4'].shape} does not "
            f"match this call's MLP chunking (n_f={n_f}, block_f={block_f})"
            " — restack with the same VLM_BRIDGE_STACK_BLOCK_F / block_f")
        # group size is recoverable from the scale shapes alone (no static
        # metadata survives a jit-traced pytree): grouped gate/up scales
        # are [L, 2*(H/g), F]; per-channel ones are [L, 2, F]
        gu_rows = stacked["gu_scale4"].shape[1]
        if gu_rows != 2:
            mlp4_group = (2 * H) // gu_rows
            assert (H // 2) % mlp4_group == 0 and \
                (block_f // 2) % mlp4_group == 0, (
                    f"int4 group {mlp4_group} must divide H/2={H // 2} and "
                    f"block_f/2={block_f // 2}")
            assert stacked["down_scale4"].shape[1:] == (
                n_f, block_f // mlp4_group, H)
    block_proj = int(os.environ.get("VLM_BRIDGE_STACK_BLOCK_PROJ",
                                    block_proj))
    bq = _pick_block(QHD, block_proj, D)
    bkv = _pick_block(2 * KHD, block_proj, D)
    bo = _pick_block(QHD, block_proj, G * D)
    n_q, n_kv, n_o = QHD // bq, (2 * KHD) // bkv, QHD // bo
    # mirror the kernel's static stage collapsing (see _stack_kernel)
    fuse_proj = (n_q == 1 and n_kv == 1)
    SA = 1 if fuse_proj else n_q + n_kv
    inline_o = (n_o == 1)
    SO0 = SA + 1
    SF0 = SO0 + (0 if inline_o else n_o)
    t_arr = jnp.reshape(t, (1,)).astype(jnp.int32)

    kern = functools.partial(
        _stack_kernel, num_layers=L, n_q=n_q, n_kv=n_kv, n_o=n_o, n_f=n_f,
        bq=bq, bkv=bkv, bo=bo, num_heads=num_heads,
        num_kv_heads=num_kv_heads, head_dim=head_dim,
        attn_scale=attn_scale, softcap=softcap, eps=eps,
        mlp4=mlp4, mlp4_group=mlp4_group)

    # Fetch staggering: a block is DMA'd at the first grid step whose
    # index_map yields a new value, and Pallas prefetches exactly ONE step
    # ahead. Mapping every per-layer block to (i, ...) at j=0 front-loads
    # ~45 MB into the layer-boundary prefetch slot (~10 us of compute to
    # hide 55 us of DMA -> measured 3.54 ms/token, worse than XLA). So each
    # block's index switches to its layer/chunk exactly at the step that
    # consumes it; before its stage group it pins to the PREVIOUS layer's
    # last chunk (at layer 0: chunk 0, so the pipeline-fill fetch is the
    # one actually used).
    def at_step(j_need, *zeros):
        def ix(i, j, t_s):
            layer = jnp.where(j >= j_need, i, jnp.maximum(i - 1, 0))
            return (layer,) + tuple(0 for _ in zeros)
        return ix

    def grp(j0, n, dim0_is_chunk):
        def ix(i, j, t_s):
            on = j >= j0
            layer = jnp.where(on, i, jnp.maximum(i - 1, 0))
            c = jnp.where(on, jnp.clip(j - j0, 0, n - 1),
                          jnp.where(i == 0, 0, n - 1))
            return (layer, c, 0) if dim0_is_chunk else (layer, 0, c)
        return ix

    def grp4(j0, n):
        """grp() for the 4-D int4 down layouts [L, n_f, rows, H]."""
        def ix(i, j, t_s):
            on = j >= j0
            layer = jnp.where(on, i, jnp.maximum(i - 1, 0))
            c = jnp.where(on, jnp.clip(j - j0, 0, n - 1),
                          jnp.where(i == 0, 0, n - 1))
            return (layer, c, 0, 0)
        return ix

    grid = (L, SF0 + n_f)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, H), lambda i, j, t_s: (0, 0)),
            pl.BlockSpec((1, H, bq), grp(0, n_q, False)),
            pl.BlockSpec((1, 1, bq), grp(0, n_q, False)),
            pl.BlockSpec((1, H, bkv),
                         grp(0 if fuse_proj else n_q, n_kv, False)),
            pl.BlockSpec((1, 1, bkv),
                         grp(0 if fuse_proj else n_q, n_kv, False)),
            pl.BlockSpec((1, bo, H),
                         grp(SA if inline_o else SO0, n_o, True)),
            pl.BlockSpec((1, 1, H), at_step(SA if inline_o else SO0, 0, 0)),
            pl.BlockSpec((1, 4, H), lambda i, j, t_s: (i, 0, 0)),
            pl.BlockSpec((1, head_dim), lambda i, j, t_s: (0, 0)),
            pl.BlockSpec((1, head_dim), lambda i, j, t_s: (0, 0)),
            pl.BlockSpec((1, B, S, KHD), at_step(SA, 0, 0, 0)),
            pl.BlockSpec((1, B, S, KHD), at_step(SA, 0, 0, 0)),
            pl.BlockSpec((1, num_kv_heads, B, S), at_step(SA, 0, 0, 0)),
            pl.BlockSpec((1, num_kv_heads, B, S), at_step(SA, 0, 0, 0)),
        ] + ([
            # int4 MLP: gate/up packed [L, H/2, F], combined gate|up scales
            # [L, 2 or 2*(H/g), F], down block-locally packed with an
            # explicit chunk dim [L, n_f, block_f/2, H], down scales
            # [L, 1, H] or [L, n_f, block_f/g, H]. The 4-D layouts keep
            # every block's second-minor dim either 8-aligned or the full
            # array extent (probed Mosaic requirement) AND shape-encode
            # block_f so a stale stack fails the assert above instead of
            # computing garbage.
            pl.BlockSpec((1, H // 2, block_f), grp(SF0, n_f, False)),
            pl.BlockSpec((1, H // 2, block_f), grp(SF0, n_f, False)),
            pl.BlockSpec((1, stacked["gu_scale4"].shape[1], block_f),
                         grp(SF0, n_f, False)),
            pl.BlockSpec((1, 1, block_f // 2, H), grp4(SF0, n_f)),
            (pl.BlockSpec((1, 1, H), at_step(SF0, 0, 0))
             if mlp4_group is None else
             pl.BlockSpec((1, 1, block_f // mlp4_group, H),
                          grp4(SF0, n_f))),
        ] if mlp4 else [
            pl.BlockSpec((1, H, block_f), grp(SF0, n_f, False)),
            pl.BlockSpec((1, H, block_f), grp(SF0, n_f, False)),
            pl.BlockSpec((1, 2, block_f), grp(SF0, n_f, False)),
            pl.BlockSpec((1, block_f, H), grp(SF0, n_f, True)),
            pl.BlockSpec((1, 1, H), at_step(SF0, 0, 0)),
        ]),
        out_specs=[
            pl.BlockSpec((B, H), lambda i, j, t_s: (0, 0)),
            pl.BlockSpec((1, B, 8, KHD),
                         lambda i, j, t_s: (i, 0, t_s[0] // 8, 0)),
            pl.BlockSpec((1, B, 8, KHD),
                         lambda i, j, t_s: (i, 0, t_s[0] // 8, 0)),
            pl.BlockSpec((1, num_kv_heads, B),
                         lambda i, j, t_s: (i, 0, 0)),
            pl.BlockSpec((1, num_kv_heads, B),
                         lambda i, j, t_s: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((n_q, B, bq), jnp.float32),
            pltpu.VMEM((n_kv, B, bkv), jnp.float32),
            pltpu.VMEM((n_o, B, bo), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.bfloat16),
        ],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H), x.dtype),
            jax.ShapeDtypeStruct((L, B, S, KHD), jnp.int8),
            jax.ShapeDtypeStruct((L, B, S, KHD), jnp.int8),
            jax.ShapeDtypeStruct((L, num_kv_heads, B), jnp.float32),
            jax.ShapeDtypeStruct((L, num_kv_heads, B), jnp.float32),
        ],
        # kc/vc are operand indices 11/12 counting the scalar-prefetch t
        # (operand 0); aliasing them onto outputs 1/2 makes the row-t
        # window write in-place in HBM.
        input_output_aliases={11: 1, 12: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=INTERPRET,
    )(t_arr, x,
      stacked["wq"], stacked["q_scale"], stacked["wkv"], stacked["kv_scale"],
      stacked["wo"], stacked["o_scale"], stacked["norms"], cos, sin,
      kc, vc, ks, vs,
      *((stacked["gate4"], stacked["up4"], stacked["gu_scale4"],
         stacked["down4"], stacked["down_scale4"]) if mlp4 else
        (stacked["gate"], stacked["up"], stacked["gu_scale"],
         stacked["down"], stacked["down_scale"])))
    return outs


def _mlp_kernel(x_ref, g_ref, u_ref, gs_ref, us_ref, d_ref, ds_ref,
                pre_ref, post_ref, o_ref, acc, hb, *, n_inner, eps):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        xf = x_ref[...].astype(jnp.float32)
        hb[...] = _rms(xf, pre_ref[0][None, :], eps).astype(jnp.bfloat16)

    x = hb[...]
    g = jax.lax.dot_general(
        x, g_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * gs_ref[0][None, :]
    u = jax.lax.dot_general(
        x, u_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * us_ref[0][None, :]
    hf = (jax.nn.gelu(g, approximate=True) * u).astype(jnp.bfloat16)
    acc[...] += jax.lax.dot_general(
        hf, d_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_inner - 1)
    def _finish():
        y = acc[...] * ds_ref[0][None, :]
        xf = x_ref[...].astype(jnp.float32)
        o_ref[...] = (xf + _rms(y, post_ref[0][None, :], eps)).astype(
            o_ref.dtype)


def fused_mlp_step(
    x: jax.Array, gate_q: dict, up_q: dict, down_q: dict,
    pre_norm: jax.Array, post_norm: jax.Array,
    *, eps: float, block_f: int = 2304,
) -> jax.Array:
    """x + rms(post)( mlp_int8( rms(pre)(x) ) ) in one launch. x: [M, H]."""
    g_w, g_s = gate_q["w_int8"], gate_q["scale"]
    u_w, u_s = up_q["w_int8"], up_q["scale"]
    d_w, d_s = down_q["w_int8"], down_q["scale"]
    H, F = g_w.shape
    M = x.shape[0]
    block_f = _pick_block(F, block_f, 128)
    nF = F // block_f

    kern = functools.partial(_mlp_kernel, n_inner=nF, eps=eps)
    return pl.pallas_call(
        kern,
        grid=(nF,),
        in_specs=[
            pl.BlockSpec((M, H), lambda j: (0, 0)),
            pl.BlockSpec((H, block_f), lambda j: (0, j)),
            pl.BlockSpec((H, block_f), lambda j: (0, j)),
            pl.BlockSpec((1, block_f), lambda j: (0, j)),
            pl.BlockSpec((1, block_f), lambda j: (0, j)),
            pl.BlockSpec((block_f, H), lambda j: (j, 0)),
            pl.BlockSpec((1, H), lambda j: (0, 0)),
            pl.BlockSpec((1, H), lambda j: (0, 0)),
            pl.BlockSpec((1, H), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, H), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, H), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, H), jnp.float32),
                        pltpu.VMEM((M, H), jnp.bfloat16)],
        # 3 x [2304, 2304] int8 blocks double-buffered = ~32 MB at the
        # flagship shape; above the default 16 MB scoped-vmem cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(x, g_w, u_w, g_s[None, :].astype(jnp.float32),
      u_s[None, :].astype(jnp.float32), d_w,
      d_s[None, :].astype(jnp.float32),
      pre_norm[None, :].astype(jnp.float32),
      post_norm[None, :].astype(jnp.float32))


# ---------------------------------------------------------------------------
# Whole-bridge decode step kernel (both BridgeBlocks in one launch)
# ---------------------------------------------------------------------------


def _ln(xf: jax.Array, scale_row: jax.Array, bias_row: jax.Array,
        eps: float) -> jax.Array:
    """f32 LayerNorm (mean-subtract, biased — torch nn.LayerNorm semantics,
    reference bridge_module.py norms). xf: [M, H]; scale/bias: [1, H]."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    d = xf - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return d * jax.lax.rsqrt(var + eps) * scale_row + bias_row


def _bridge_kernel(
    t_ref,        # SMEM [1]
    x_ref,        # [B, ld] bf16 — token embedding (bridge input)
    lns_ref,      # block (1, 6, ld) f32: cross/self/ffn LN (scale, bias)
    wq_ref,       # block (1, 1, ld, Dc) int8 — cross q proj, head-major
    qsc_ref,      # block (1, 1, 1, Dc) f32
    qb_ref,       # block (1, 1, 1, Dc) f32
    ck_ref,       # block (1, 1, B, Sv, Dc) int8 — cross K, head-major
    cks_ref,      # block (1, 1, B, Sv) f32
    cv_ref,       # block (1, 1, B, Sv, Dc) int8
    cvs_ref,      # block (1, 1, B, Sv) f32
    woc_ref,      # block (1, 1, Dc, ld) int8 — cross o proj rows for head
    wocs_ref,     # block (1, 1, ld) f32 (per-out scale, applied at the end)
    obc_ref,      # block (1, 1, ld) f32 (o bias)
    wqkv_ref,     # block (1, 1, ld, 3*Ds) int8 — per-head fused self qkv
    qkvs_ref,     # block (1, 1, 1, 3*Ds) f32
    qkvb_ref,     # block (1, 1, 1, 3*Ds) f32
    sk_ref,       # block (1, 1, B, S, Ds) bf16 — self K cache, head-major
    sv_ref,       # block (1, 1, B, S, Ds) bf16
    wos_ref,      # block (1, 1, Ds, ld) int8 — self o proj rows for head
    woss_ref,     # block (1, 1, ld) f32
    obs_ref,      # block (1, 1, ld) f32
    f1_ref,       # block (1, ld, Fb) int8
    f1s_ref,      # block (1, 1, Fb) f32
    f1b_ref,      # block (1, 1, Fb) f32
    f2_ref,       # block (1, Fb, ld) int8
    f2s_ref,      # block (1, 1, ld) f32
    f2b_ref,      # block (1, 1, ld) f32
    xo_ref,       # out [B, ld] bf16
    kw_ref,       # out block (1, 1, B, 8, Ds) bf16: row-t window of self K,
                  # ALIASED onto sk (masked RMW of row t%8)
    vw_ref,       # out block (1, 1, B, 8, Ds) bf16
    x_scr, h_scr, oacc,          # VMEM scratch: residual f32, LN'd bf16,
                                 # shared o/ffn accumulator f32
    *,
    num_blocks: int,
    hc: int,
    hs: int,
    dc: int,
    ds: int,
    n_f: int,
    eps: float,
):
    """Whole-bridge decode step: grid (num_blocks, 1 + Hc + Hs + n_f).

    j == 0              : cross LayerNorm (+ residual load at b==0)
    j in [1, Hc]        : cross-attention head j-1 (q proj, softmax over the
                          precomputed int8 vision K/V, o-proj partial)
    j in [Hc+1, Hc+Hs]  : self-attention head j-Hc-1 (per-head fused qkv
                          proj, causal cache attention, in-place cache row
                          write, o-proj partial); head 0 finalizes cross
    j in [Hc+Hs+1, ...] : FFN chunk (gelu_exact GEGLU-less classic FFN);
                          chunk 0 finalizes self; the last chunk adds the
                          residual and (at b == num_blocks-1) writes x_out

    Replaces ~20 XLA ops + 10 int8-kernel launches per token (profiled at
    ~0.86 ms/token together with embed/sampling glue in the r3 batch-64
    serving trace) with ONE launch streaming the bridge's int8 weights.
    Parity oracle: inference/generate._bridge_decode_step (the jnp path,
    itself pinned to the reference bridge, bridge_module.py:106-311).
    """
    b = pl.program_id(0)
    j = pl.program_id(1)
    B, ld = x_ref.shape
    Sv = ck_ref.shape[3]
    S = sk_ref.shape[3]
    t = t_ref[0]
    c_scale = dc ** -0.5
    s_scale = ds ** -0.5

    @pl.when(j == 0)
    def _cross_ln():
        @pl.when(b == 0)
        def _load_x():
            x_scr[...] = x_ref[...].astype(jnp.float32)

        oacc[...] = jnp.zeros_like(oacc)
        h_scr[...] = _ln(x_scr[...], lns_ref[0, 0][None, :],
                         lns_ref[0, 1][None, :], eps).astype(jnp.bfloat16)

    @pl.when(jnp.logical_and(j >= 1, j <= hc))
    def _cross_head():
        qh = jax.lax.dot_general(
            h_scr[...], wq_ref[0, 0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qh = qh * qsc_ref[0, 0, 0][None, :] + qb_ref[0, 0, 0][None, :]
        # Mosaic batched dots need a non-contracting lhs dim: insert a unit
        # T dim while f32 (packed-bf16 2D->3D shape casts are unsupported)
        qh3 = qh[:, None, :].astype(jnp.bfloat16)
        K = ck_ref[0, 0].astype(jnp.bfloat16)
        lg = jax.lax.dot_general(
            qh3, K, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        lg = lg * (cks_ref[0, 0] * c_scale)[:, None, :]
        m = jnp.max(lg, axis=-1, keepdims=True)
        e = jnp.exp(lg - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pv = (p * cvs_ref[0, 0][:, None, :]).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            pv, cv_ref[0, 0].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        oacc[...] += jax.lax.dot_general(
            out[:, 0, :].astype(jnp.bfloat16),
            woc_ref[0, 0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(j >= hc + 1, j <= hc + hs))
    def _self_head():
        @pl.when(j == hc + 1)
        def _finalize_cross():
            x_scr[...] = (x_scr[...] + oacc[...] * wocs_ref[0, 0][None, :]
                          + obc_ref[0, 0][None, :])
            h_scr[...] = _ln(x_scr[...], lns_ref[0, 2][None, :],
                             lns_ref[0, 3][None, :], eps).astype(jnp.bfloat16)
            oacc[...] = jnp.zeros_like(oacc)

        qkvh = jax.lax.dot_general(
            h_scr[...], wqkv_ref[0, 0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkvh = (qkvh * qkvs_ref[0, 0, 0][None, :]
                + qkvb_ref[0, 0, 0][None, :])
        qh = qkvh[:, :ds]
        # round the new K/V to the cache dtype BEFORE attending: the jnp
        # oracle writes the bf16 cache first and attends the rounded
        # values, so position t must see the same rounding here (kept in
        # f32 carriers — Mosaic cannot shape-cast packed bf16 2D->3D, so
        # the cache write expands in f32 and casts last)
        k_new = qkvh[:, ds:2 * ds].astype(jnp.bfloat16).astype(jnp.float32)
        v_new = qkvh[:, 2 * ds:].astype(jnp.bfloat16).astype(jnp.float32)

        s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
        hist_valid = (s_iota < t)
        K = sk_ref[0, 0].astype(jnp.bfloat16)
        V = sv_ref[0, 0].astype(jnp.bfloat16)
        qh3 = qh[:, None, :].astype(jnp.bfloat16)
        lg = jax.lax.dot_general(
            qh3, K, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * s_scale
        lg = jnp.where(hist_valid, lg, -1e30)
        ls = (jnp.sum(qh3[:, 0, :].astype(jnp.float32) * k_new,
                      axis=-1, keepdims=True)
              * s_scale)[:, None, :]
        m = jnp.maximum(jnp.max(lg, axis=-1, keepdims=True), ls)
        e = jnp.where(hist_valid, jnp.exp(lg - m), 0.0)
        es = jnp.exp(ls - m)
        den = jnp.sum(e, axis=-1, keepdims=True) + es
        out = jax.lax.dot_general(
            (e / den).astype(jnp.bfloat16), V, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out2 = out[:, 0, :] + (es / den)[:, 0, :] * v_new
        oacc[...] += jax.lax.dot_general(
            out2.astype(jnp.bfloat16), wos_ref[0, 0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        # in-place causal-cache row write (masked RMW of the 8-row window)
        sub = t % 8
        wstart = (t // 8) * 8
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
        old_k = sk_ref[0, 0, :, pl.dslice(wstart, 8), :]
        old_v = sv_ref[0, 0, :, pl.dslice(wstart, 8), :]
        kw_ref[0, 0] = jnp.where(
            w_iota == sub, k_new[:, None, :].astype(jnp.bfloat16), old_k)
        vw_ref[0, 0] = jnp.where(
            w_iota == sub, v_new[:, None, :].astype(jnp.bfloat16), old_v)

    @pl.when(j >= hc + hs + 1)
    def _ffn():
        @pl.when(j == hc + hs + 1)
        def _finalize_self():
            x_scr[...] = (x_scr[...] + oacc[...] * woss_ref[0, 0][None, :]
                          + obs_ref[0, 0][None, :])
            h_scr[...] = _ln(x_scr[...], lns_ref[0, 4][None, :],
                             lns_ref[0, 5][None, :], eps).astype(jnp.bfloat16)
            oacc[...] = jnp.zeros_like(oacc)

        g = jax.lax.dot_general(
            h_scr[...], f1_ref[0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g = g * f1s_ref[0, 0][None, :] + f1b_ref[0, 0][None, :]
        # Mosaic does not lower erf/erfc; polynomial erf matches
        # jax.nn.gelu(approximate=False) to ~1e-7 (ops/quant._erf_poly)
        from vlm_bridge_tpu.ops.quant import _gelu_exact_poly
        a = _gelu_exact_poly(g).astype(jnp.bfloat16)
        oacc[...] += jax.lax.dot_general(
            a, f2_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == hc + hs + n_f)
        def _finalize_ffn():
            x_scr[...] = (x_scr[...] + oacc[...] * f2s_ref[0, 0][None, :]
                          + f2b_ref[0, 0][None, :])

            @pl.when(b == num_blocks - 1)
            def _write_out():
                xo_ref[...] = x_scr[...].astype(xo_ref.dtype)


def fused_bridge_step(
    t: jax.Array,
    x: jax.Array,
    bst: dict,
    ck: jax.Array, cks: jax.Array, cv: jax.Array, cvs: jax.Array,
    sk: jax.Array, sv: jax.Array,
    *,
    num_heads_cross: int,
    num_heads_self: int,
    eps: float,
    block_f: int = 4608,
):
    """One decode step through BOTH BridgeBlocks in one pallas_call.

    bst: layer-stacked head-major int8 bridge weights
    (models/bridge.stack_bridge_decode_params). Caches:
      ck/cv [nb, Hc, B, Sv, Dc] int8 with scales cks/cvs [nb, Hc, B, Sv]
      (head-major transpose of the standard cross cache);
      sk/sv [nb, Hs, B, S, Ds] bf16 causal self caches, S a multiple of 8.
    Returns (x_out [B, ld], sk', sv') — sk'/sv' ARE the inputs updated in
    place at row t (input_output_aliases + masked 8-row-window RMW, same
    pattern as fused_stack_step).
    """
    B, ld = x.shape
    nb, Hc = bst["wq"].shape[:2]
    Hs = bst["wqkv"].shape[1]
    Dc = ld // num_heads_cross
    Ds = ld // num_heads_self
    Sv = ck.shape[3]
    S = sk.shape[3]
    F = bst["fc1"].shape[2]
    block_f = _pick_block(F, block_f, 128)
    n_f = F // block_f
    t_arr = jnp.reshape(t, (1,)).astype(jnp.int32)

    kern = functools.partial(
        _bridge_kernel, num_blocks=nb, hc=Hc, hs=Hs, dc=Dc, ds=Ds,
        n_f=n_f, eps=eps)

    # index helpers: each operand's block index switches exactly at the
    # grid step that consumes it (fetch lands one step earlier, hidden
    # behind the previous stage's compute — see fused_stack_step notes)
    def chx(*zeros):
        def ix(b, j, t_s):
            return (b, jnp.clip(j - 1, 0, Hc - 1)) + tuple(
                0 for _ in zeros)
        return ix

    def shx(*zeros, win=False):
        def ix(b, j, t_s):
            on = j >= Hc + 1
            bb = jnp.where(on, b, jnp.maximum(b - 1, 0))
            h = jnp.where(on, jnp.clip(j - (Hc + 1), 0, Hs - 1),
                          jnp.where(b == 0, 0, Hs - 1))
            tail = tuple(0 for _ in zeros)
            if win:
                tail = (0, t_s[0] // 8, 0)
            return (bb, h) + tail
        return ix

    def ffx(f_dim):
        def ix(b, j, t_s):
            on = j >= Hc + Hs + 1
            bb = jnp.where(on, b, jnp.maximum(b - 1, 0))
            c = jnp.where(on, jnp.clip(j - (Hc + Hs + 1), 0, n_f - 1),
                          jnp.where(b == 0, 0, n_f - 1))
            return (bb, 0, c) if f_dim == 2 else (bb, c, 0)
        return ix

    grid = (nb, 1 + Hc + Hs + n_f)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, ld), lambda b, j, t_s: (0, 0)),
            pl.BlockSpec((1, 6, ld), lambda b, j, t_s: (b, 0, 0)),
            pl.BlockSpec((1, 1, ld, Dc), chx(0, 0)),
            pl.BlockSpec((1, 1, 1, Dc), chx(0, 0)),
            pl.BlockSpec((1, 1, 1, Dc), chx(0, 0)),
            pl.BlockSpec((1, 1, B, Sv, Dc), chx(0, 0, 0)),
            pl.BlockSpec((1, 1, B, Sv), chx(0, 0)),
            pl.BlockSpec((1, 1, B, Sv, Dc), chx(0, 0, 0)),
            pl.BlockSpec((1, 1, B, Sv), chx(0, 0)),
            pl.BlockSpec((1, 1, Dc, ld), chx(0, 0)),
            pl.BlockSpec((1, 1, ld), lambda b, j, t_s: (b, 0, 0)),
            pl.BlockSpec((1, 1, ld), lambda b, j, t_s: (b, 0, 0)),
            pl.BlockSpec((1, 1, ld, 3 * Ds), shx(0, 0)),
            pl.BlockSpec((1, 1, 1, 3 * Ds), shx(0, 0)),
            pl.BlockSpec((1, 1, 1, 3 * Ds), shx(0, 0)),
            pl.BlockSpec((1, 1, B, S, Ds), shx(0, 0, 0)),
            pl.BlockSpec((1, 1, B, S, Ds), shx(0, 0, 0)),
            pl.BlockSpec((1, 1, Ds, ld), shx(0, 0)),
            pl.BlockSpec((1, 1, ld), lambda b, j, t_s: (b, 0, 0)),
            pl.BlockSpec((1, 1, ld), lambda b, j, t_s: (b, 0, 0)),
            pl.BlockSpec((1, ld, block_f), ffx(2)),
            pl.BlockSpec((1, 1, block_f), ffx(2)),
            pl.BlockSpec((1, 1, block_f), ffx(2)),
            pl.BlockSpec((1, block_f, ld), ffx(1)),
            pl.BlockSpec((1, 1, ld), lambda b, j, t_s: (b, 0, 0)),
            pl.BlockSpec((1, 1, ld), lambda b, j, t_s: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((B, ld), lambda b, j, t_s: (0, 0)),
            pl.BlockSpec((1, 1, B, 8, Ds),
                         lambda b, j, t_s: (b, jnp.clip(j - (Hc + 1), 0,
                                                        Hs - 1),
                                            0, t_s[0] // 8, 0)),
            pl.BlockSpec((1, 1, B, 8, Ds),
                         lambda b, j, t_s: (b, jnp.clip(j - (Hc + 1), 0,
                                                        Hs - 1),
                                            0, t_s[0] // 8, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, ld), jnp.float32),
            pltpu.VMEM((B, ld), jnp.bfloat16),
            pltpu.VMEM((B, ld), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, ld), x.dtype),
            jax.ShapeDtypeStruct(sk.shape, sk.dtype),
            jax.ShapeDtypeStruct(sv.shape, sv.dtype),
        ],
        # sk/sv are operand indices 16/17 counting the scalar-prefetch t
        input_output_aliases={16: 1, 17: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(t_arr, x,
      bst["lns"], bst["wq"], bst["qsc"], bst["qb"],
      ck, cks, cv, cvs,
      bst["woc"], bst["wocs"], bst["obc"],
      bst["wqkv"], bst["qkvs"], bst["qkvb"],
      sk, sv,
      bst["wos"], bst["woss"], bst["obs"],
      bst["fc1"], bst["f1s"], bst["f1b"],
      bst["fc2"], bst["f2s"], bst["f2b"])
    return outs

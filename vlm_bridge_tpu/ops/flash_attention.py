"""Pallas TPU flash attention — forward + custom-VJP backward kernels.

Tiled online-softmax attention that never materializes the [T, S] logit
matrix in HBM. Feature union needed by the framework:

- GQA (H % KH == 0) — Gemma-2 uses 8 query / 4 KV heads
- causal masking + sliding windows (Gemma-2 alternating layers)
- logit soft-capping (tanh) with exact gradient
- padded-key masking (S padded to block multiples)
- cross-attention (T != S, non-causal) — bridge and ViT

The backward pass is the standard flash recurrence: the forward saves only
out + per-row logsumexp; dq and dk/dv are computed by two tiled kernels that
recompute logits per block (no O(T*S) memory). GQA backward computes per
query head and group-sums dk/dv outside the kernel.

`maybe_flash_attention` returns None for unsupported shapes so the caller
falls back to the jnp reference path (attention.py).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -2.3819763e38

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256

# Tests flip this to run the kernels in the Pallas interpreter (CPU-hermetic).
INTERPRET = False


def maybe_flash_attention(
    q, k, v, *, scale, mask, is_causal, logit_softcap, sliding_window,
    q_positions, kv_positions, kv_lengths=None,
) -> Optional[jax.Array]:
    """Dispatch to the Pallas kernel when supported AND profitable, else None.

    Profitability (measured, v5e, bs=8 training): at S=256 XLA's fused
    attention beats the flash kernel end-to-end (39.5 vs 37.0 samples/s) —
    the custom-VJP tile recompute isn't worth it while the [T, S] logits
    still fit comfortably. At the S=512 pad-bucket (the largest production
    training shape) a same-process fwd+bwd A/B with ragged kv_lengths
    measured a dead heat: 487.8 ms/step XLA vs 489.4 flash (0.997x,
    scripts/flash512_ab.py, r3). XLA is marginally ahead at every
    production bucket, so the default threshold sits ABOVE them
    (VLM_BRIDGE_FLASH_MIN_S default 1024) and the kernel is opt-in
    headroom for long-context variants, where the O(T*S) logit
    materialization the XLA path pays grows without bound while the
    kernel stays O(T).

    kv_lengths: optional [B] int32 per-row valid key counts. When given, it
    REPLACES a dense right-padding mask (callers assert the prefix form), so
    padded production shapes qualify for the kernel — and rows shorter than
    S skip their tail K blocks entirely (the round-1 kernel refused every
    masked shape and therefore never dispatched in training).
    """
    B, T, H, D = q.shape
    S, KH = k.shape[1], k.shape[2]
    if mask is not None and kv_lengths is None:
        return None  # arbitrary dense masks stay on the XLA path
    if q_positions is not None or kv_positions is not None:
        return None
    if D % 128 != 0 and D not in (64,):
        return None
    # One-block regime probe (ViT shape [32,257,16,64], non-causal, single
    # 384x384 tile per head skipping the online-softmax recurrence): a
    # same-trace profiler A/B on v5e measured the XLA fused path at 0.63x
    # the kernel's device time (566 vs 900 units/run) — at D=64 the per-head
    # tiles underfill the MXU's 128-lane contraction and the 512 tiny grid
    # programs don't pipeline, while XLA's [B,H,257,257] logit
    # materialization is well-fused. Small-S shapes therefore STAY on the
    # XLA path; the kernel's profitable regime remains long-S.
    min_s = int(os.environ.get("VLM_BRIDGE_FLASH_MIN_S", "1024"))
    if T < 8 or S < min_s:
        return None  # XLA's fused attention wins at small S (see above)
    try:
        return flash_attention(
            q, k, v, scale=scale, is_causal=is_causal,
            logit_softcap=logit_softcap, sliding_window=sliding_window,
            kv_lengths=kv_lengths,
        )
    except Exception as e:
        # fall back to the jnp path, but NOT silently: a kernel that stops
        # compiling is a perf regression someone must see
        import warnings

        warnings.warn(
            f"flash_attention dispatch failed for q{q.shape} k{k.shape} "
            f"({type(e).__name__}: {e}); falling back to the XLA path")
        return None


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    is_causal: bool = False,
    logit_softcap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    kv_lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """q: [B,T,H,D], k/v: [B,S,KH,D] -> [B,T,H,D]. Differentiable.

    kv_lengths: optional [B] int32 — per-row number of valid (attendable)
    keys, assuming right padding. Keys at positions >= kv_lengths[b] are
    masked AND their K blocks are skipped entirely for that row.
    """
    B, T, H, D = q.shape
    S = k.shape[1]
    block_q = min(block_q, _round_up(T, 8))
    block_k = min(block_k, _round_up(S, 128))
    # causal offset: queries are assumed to be the last T of the S positions
    q_offset = S - T if is_causal else 0
    if kv_lengths is None:
        kv_lens = jnp.full((B,), S, jnp.int32)
    else:
        kv_lens = jnp.minimum(kv_lengths.astype(jnp.int32), S)
    return _flash_core(
        q, k, v, kv_lens, scale, is_causal, logit_softcap, sliding_window,
        q_offset, block_q, block_k)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# custom_vjp core (operates on unpadded logical shapes; pads internally)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _flash_core(q, k, v, kv_lens, scale, is_causal, logit_softcap,
                sliding_window, q_offset, block_q, block_k):
    out, _ = _flash_fwd(q, k, v, kv_lens, scale, is_causal, logit_softcap,
                        sliding_window, q_offset, block_q, block_k)
    return out


def _flash_core_fwd(q, k, v, kv_lens, scale, is_causal, logit_softcap,
                    sliding_window, q_offset, block_q, block_k):
    out, lse = _flash_fwd(q, k, v, kv_lens, scale, is_causal, logit_softcap,
                          sliding_window, q_offset, block_q, block_k)
    return out, (q, k, v, kv_lens, out, lse)


def _flash_core_bwd(scale, is_causal, logit_softcap, sliding_window,
                    q_offset, block_q, block_k, res, dout):
    import numpy as np

    q, k, v, kv_lens, out, lse = res
    dq, dk, dv = _flash_bwd(
        q, k, v, kv_lens, out, lse, dout, scale, is_causal, logit_softcap,
        sliding_window, q_offset, block_q, block_k)
    # int32 primal -> float0 cotangent (required type for integer args)
    d_lens = np.zeros(kv_lens.shape, jax.dtypes.float0)
    return dq, dk, dv, d_lens


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _pad_qkv(q, k, v, block_q, block_k):
    B, T, H, D = q.shape
    S = k.shape[1]
    pad_q = (-T) % block_q
    pad_k = (-S) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    return q, k, v, T, S


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _flash_fwd(q, k, v, kv_lens, scale, is_causal, logit_softcap,
               sliding_window, q_offset, block_q, block_k):
    B, T0, H, D = q.shape
    KH = k.shape[2]
    G = H // KH
    q, k, v, T_real, S_real = _pad_qkv(q, k, v, block_q, block_k)
    T, S = q.shape[1], k.shape[1]

    qh = q.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    kh = k.transpose(0, 2, 1, 3).reshape(B * KH, S, D)
    vh = v.transpose(0, 2, 1, 3).reshape(B * KH, S, D)
    # per-row valid key count, clipped to the UNPADDED S (padding rows added
    # by _pad_qkv are always invalid); prefetched to SMEM, one entry per batch
    kv_lens = jnp.minimum(kv_lens.astype(jnp.int32), S_real)

    grid = (B * H, T // block_q, S // block_k)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, is_causal=is_causal,
        logit_softcap=logit_softcap, sliding_window=sliding_window,
        num_heads=H, q_offset=q_offset,
        block_q=block_q, block_k=block_k, num_k_blocks=grid[2])

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda h, i, j, lens: (h, i, 0)),
                pl.BlockSpec((1, block_k, D),
                             lambda h, i, j, lens, G=G: (h // G, j, 0)),
                pl.BlockSpec((1, block_k, D),
                             lambda h, i, j, lens, G=G: (h // G, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, D), lambda h, i, j, lens: (h, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda h, i, j, lens: (h, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, D), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
            # per-row logsumexp, broadcast over 128 lanes (TPU tiling minimum)
            jax.ShapeDtypeStruct((B * H, T, 128), jnp.float32),
        ],
        interpret=INTERPRET,
    )(kv_lens, qh, kh, vh)

    out = out.reshape(B, H, T, D).transpose(0, 2, 1, 3)[:, :T_real]
    return out, lse  # lse stays padded [B*H, T]; bwd uses same padding


def _fwd_kernel(
    lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_scr, l_scr,
    *, scale, is_causal, logit_softcap, sliding_window, num_heads,
    q_offset, block_q, block_k, num_k_blocks,
):
    j = pl.program_id(2)
    qi = pl.program_id(1)
    kv_valid_len = lens_ref[pl.program_id(0) // num_heads]

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    q_start = qi * block_q + q_offset
    k_start = j * block_k

    run = k_start < kv_valid_len
    if is_causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1)
    if sliding_window is not None:
        run = jnp.logical_and(
            run, k_start + block_k - 1 > q_start - sliding_window)

    @pl.when(run)
    def _body():
        # Dots take bf16 operands with f32 accumulation (preferred_element_type)
        # — upcasting INPUTS to f32 would push the MXU onto its 1/8-rate f32
        # path for zero accuracy gain (the XLA reference path also feeds the
        # MXU bf16 with f32 accum).
        q = q_ref[0]
        k = k_ref[0]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale

        if logit_softcap is not None:
            logits = jnp.tanh(logits / logit_softcap) * logit_softcap

        qpos = q_start + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        kpos = k_start + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        mask = kpos < kv_valid_len
        if is_causal:
            mask &= kpos <= qpos
        if sliding_window is not None:
            mask &= kpos > qpos - sliding_window
        logits = jnp.where(mask, logits, _NEG_INF)

        m_prev = m_scr[:, :1]
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = correction * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc[:] = acc[:] * correction + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == num_k_blocks - 1)
    def _finish():
        denom = l_scr[:, :1]
        safe = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0] = (acc[:] / safe).astype(o_ref.dtype)
        # logsumexp per row (rows with empty support get _NEG_INF-ish)
        lse = m_scr[:, :1] + jnp.log(safe)
        lse_ref[0] = jnp.broadcast_to(
            jnp.where(denom == 0.0, _NEG_INF, lse), lse_ref.shape[1:])


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _flash_bwd(q, k, v, kv_lens, out, lse, dout, scale, is_causal,
               logit_softcap, sliding_window, q_offset, block_q, block_k):
    B, T0, H, D = q.shape
    KH = k.shape[2]
    G = H // KH
    q, k, v, T_real, S_real = _pad_qkv(q, k, v, block_q, block_k)
    dout = jnp.pad(
        dout, ((0, 0), (0, q.shape[1] - T_real), (0, 0), (0, 0)))
    T, S = q.shape[1], k.shape[1]
    kv_lens = jnp.minimum(kv_lens.astype(jnp.int32), S_real)

    qh = q.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    kh = k.transpose(0, 2, 1, 3).reshape(B * KH, S, D)
    vh = v.transpose(0, 2, 1, 3).reshape(B * KH, S, D)
    doh = dout.transpose(0, 2, 1, 3).reshape(B * H, T, D)

    # delta_i = rowsum(dout * out) — cheap, computed in XLA
    out_p = jnp.pad(out, ((0, 0), (0, T - T_real), (0, 0), (0, 0)))
    delta = jnp.sum(
        out_p.astype(jnp.float32) * dout.astype(jnp.float32), axis=-1)
    delta = delta.transpose(0, 2, 1).reshape(B * H, T, 1)
    delta = jnp.broadcast_to(delta, (B * H, T, 128))

    common = dict(
        scale=scale, is_causal=is_causal, logit_softcap=logit_softcap,
        sliding_window=sliding_window, num_heads=H, q_offset=q_offset,
        block_q=block_q, block_k=block_k)

    # ---- dq: grid over (head, q block), loop k blocks -------------------
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, num_k_blocks=S // block_k, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, T // block_q, S // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda h, i, j, lens: (h, i, 0)),
                pl.BlockSpec((1, block_k, D),
                             lambda h, i, j, lens, G=G: (h // G, j, 0)),
                pl.BlockSpec((1, block_k, D),
                             lambda h, i, j, lens, G=G: (h // G, j, 0)),
                pl.BlockSpec((1, block_q, D), lambda h, i, j, lens: (h, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda h, i, j, lens: (h, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda h, i, j, lens: (h, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, D),
                                   lambda h, i, j, lens: (h, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), jnp.float32),
        interpret=INTERPRET,
    )(kv_lens, qh, kh, vh, doh, lse, delta)

    # ---- dk/dv: grid over (head, k block), loop q blocks ----------------
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, num_q_blocks=T // block_q, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, S // block_k, T // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda h, j, i, lens: (h, i, 0)),
                pl.BlockSpec((1, block_k, D),
                             lambda h, j, i, lens, G=G: (h // G, j, 0)),
                pl.BlockSpec((1, block_k, D),
                             lambda h, j, i, lens, G=G: (h // G, j, 0)),
                pl.BlockSpec((1, block_q, D), lambda h, j, i, lens: (h, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda h, j, i, lens: (h, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda h, j, i, lens: (h, i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, D), lambda h, j, i, lens: (h, j, 0)),
                pl.BlockSpec((1, block_k, D), lambda h, j, i, lens: (h, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, D), jnp.float32),
                pltpu.VMEM((block_k, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, S, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, S, D), jnp.float32),
        ],
        interpret=INTERPRET,
    )(kv_lens, qh, kh, vh, doh, lse, delta)

    dq = dq.reshape(B, H, T, D).transpose(0, 2, 1, 3)[:, :T_real]
    # group-sum GQA head gradients: [B, H, S, D] -> [B, KH, S, D]
    dk = dk.reshape(B, KH, G, S, D).sum(axis=2).transpose(0, 2, 1, 3)[:, :S_real]
    dv = dv.reshape(B, KH, G, S, D).sum(axis=2).transpose(0, 2, 1, 3)[:, :S_real]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _recompute_p(q, k, lse_row, *, scale, logit_softcap, is_causal,
                 sliding_window, kv_valid_len, q_start, k_start):
    """Recompute probabilities + pre-cap logits tanh term for one tile.

    q/k are bf16 tile refs; the dot accumulates in f32 on the MXU's native
    mixed-precision path (see _fwd_kernel note). Returns (p [bq, bk], dcap
    [bq, bk]) where dcap is d(capped)/d(raw logits) (ones when no softcap)."""
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if logit_softcap is not None:
        t = jnp.tanh(logits / logit_softcap)
        capped = t * logit_softcap
        dcap = 1.0 - t * t
    else:
        capped = logits
        dcap = jnp.ones_like(logits)

    qpos = q_start + jax.lax.broadcasted_iota(jnp.int32, capped.shape, 0)
    kpos = k_start + jax.lax.broadcasted_iota(jnp.int32, capped.shape, 1)
    mask = kpos < kv_valid_len
    if is_causal:
        mask &= kpos <= qpos
    if sliding_window is not None:
        mask &= kpos > qpos - sliding_window

    p = jnp.exp(jnp.where(mask, capped, _NEG_INF) - lse_row)
    p = jnp.where(mask, p, 0.0)
    return p, dcap


def _bwd_dq_kernel(
    lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc,
    *, scale, is_causal, logit_softcap, sliding_window, num_heads,
    q_offset, block_q, block_k, num_k_blocks,
):
    j = pl.program_id(2)
    qi = pl.program_id(1)
    kv_valid_len = lens_ref[pl.program_id(0) // num_heads]

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    q_start = qi * block_q + q_offset
    k_start = j * block_k
    run = k_start < kv_valid_len
    if is_causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1)
    if sliding_window is not None:
        run = jnp.logical_and(
            run, k_start + block_k - 1 > q_start - sliding_window)

    @pl.when(run)
    def _body():
        q = q_ref[0]
        k = k_ref[0]
        lse_row = lse_ref[0][:, :1]
        p, dcap = _recompute_p(
            q, k, lse_row, scale=scale, logit_softcap=logit_softcap,
            is_causal=is_causal, sliding_window=sliding_window,
            kv_valid_len=kv_valid_len, q_start=q_start, k_start=k_start)
        do = do_ref[0]
        dp = jax.lax.dot_general(
            do, v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0][:, :1]) * dcap * scale
        acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == num_k_blocks - 1)
    def _finish():
        dq_ref[0] = acc[:]


def _bwd_dkv_kernel(
    lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, is_causal, logit_softcap, sliding_window, num_heads,
    q_offset, block_q, block_k, num_q_blocks,
):
    i = pl.program_id(2)   # q block (inner)
    kj = pl.program_id(1)  # k block
    kv_valid_len = lens_ref[pl.program_id(0) // num_heads]

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q_start = i * block_q + q_offset
    k_start = kj * block_k
    run = k_start < kv_valid_len
    if is_causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1)
    if sliding_window is not None:
        run = jnp.logical_and(
            run, k_start + block_k - 1 > q_start - sliding_window)

    @pl.when(run)
    def _body():
        q = q_ref[0]
        k = k_ref[0]
        lse_row = lse_ref[0][:, :1]
        p, dcap = _recompute_p(
            q, k, lse_row, scale=scale, logit_softcap=logit_softcap,
            is_causal=is_causal, sliding_window=sliding_window,
            kv_valid_len=kv_valid_len, q_start=q_start, k_start=k_start)
        do = do_ref[0]
        # dv += p^T @ do
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0][:, :1]) * dcap * scale
        # dk += ds^T @ q
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i == num_q_blocks - 1)
    def _finish():
        dk_ref[0] = dk_acc[:]
        dv_ref[0] = dv_acc[:]

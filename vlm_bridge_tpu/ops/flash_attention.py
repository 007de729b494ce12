"""Pallas TPU flash-attention kernel.

Tiled online-softmax attention that keeps the [T, S] logit matrix out of HBM.
Supports the union of features the framework needs:

- GQA (H % KH == 0) — Gemma-2 uses 8 query / 4 KV heads
- causal masking + sliding windows (Gemma-2 alternating layers)
- logit soft-capping (tanh)
- padding masks via per-row kv length
- cross-attention (T != S, no causality) — bridge and ViT

`maybe_flash_attention` returns None for unsupported shapes so the caller can
fall back to the jnp reference path (attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -2.3819763e38

# Tunables: block sizes aligned to MXU/VPU tiling (see pallas_guide.md).
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def maybe_flash_attention(
    q, k, v, *, scale, mask, is_causal, logit_softcap, sliding_window,
    q_positions, kv_positions,
) -> Optional[jax.Array]:
    """Dispatch to the Pallas kernel when supported, else None."""
    B, T, H, D = q.shape
    S, KH = k.shape[1], k.shape[2]
    # The kernel handles position-derived masks itself; arbitrary dense masks
    # currently fall back (they only occur in tests).
    if mask is not None:
        return None
    if q_positions is not None or kv_positions is not None:
        return None
    if D % 128 != 0 and D not in (64,):
        return None
    if T < 8 or S < 128:
        return None  # tiny shapes: not worth a kernel launch
    try:
        return flash_attention(
            q, k, v, scale=scale, is_causal=is_causal,
            logit_softcap=logit_softcap, sliding_window=sliding_window,
        )
    except Exception:
        return None


@functools.partial(
    jax.jit,
    static_argnames=("scale", "is_causal", "logit_softcap", "sliding_window",
                     "block_q", "block_k"),
)
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
) -> jax.Array:
    """Flash attention. q: [B,T,H,D], k/v: [B,S,KH,D] -> [B,T,H,D].

    Grid: (B*H, T/block_q, S/block_k) with the key loop innermost ("megacore"
    friendly). Accumulates in f32 with the standard online-softmax recurrence.
    """
    B, T, H, D = q.shape
    S, KH = k.shape[1], k.shape[2]
    G = H // KH

    orig_T = T
    pad_q = (-T) % block_q
    pad_k = (-S) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
        T = q.shape[1]
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))

    S_padded = k.shape[1]
    kv_valid_len = S  # mask out padded keys

    # Layout: move heads to a leading dim so each grid step sees a 2D tile.
    qh = q.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    kh = k.transpose(0, 2, 1, 3).reshape(B * KH, S_padded, D)
    vh = v.transpose(0, 2, 1, 3).reshape(B * KH, S_padded, D)

    grid = (B * H, pl.cdiv(T, block_q), pl.cdiv(S_padded, block_k))

    kernel = functools.partial(
        _fa_kernel,
        scale=scale,
        is_causal=is_causal,
        logit_softcap=logit_softcap,
        sliding_window=sliding_window,
        kv_valid_len=kv_valid_len,
        q_offset=S - orig_T if is_causal else 0,
        block_q=block_q,
        block_k=block_k,
        num_k_blocks=grid[2],
        groups=G,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda h, i, j, G=G: (h // G, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda h, i, j, G=G: (h // G, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda h, i, j: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),   # output accumulator
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running denom
        ],
    )(qh, kh, vh)

    out = out.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    if pad_q:
        out = out[:, :orig_T]
    return out


def _fa_kernel(
    q_ref, k_ref, v_ref, o_ref, acc, m_scr, l_scr,
    *, scale, is_causal, logit_softcap, sliding_window, kv_valid_len,
    q_offset, block_q, block_k, num_k_blocks, groups,
):
    j = pl.program_id(2)
    qi = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    # Skip fully-masked blocks (causal/window): compute block bounds.
    q_start = qi * block_q + q_offset  # absolute position of first query row
    k_start = j * block_k

    run = k_start < kv_valid_len
    if is_causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1)
    if sliding_window is not None:
        # keys must satisfy kpos > qpos - window for some row in this block
        run = jnp.logical_and(run, k_start + block_k - 1 > q_start - sliding_window)

    @pl.when(run)
    def _body():
        q = q_ref[0].astype(jnp.float32)  # [bq, D]
        k = k_ref[0].astype(jnp.float32)  # [bk, D]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk]

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

        m_prev = m_scr[:, :1]                       # [bq, 1]
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)                 # [bq, bk]
        correction = jnp.exp(m_prev - m_new)        # [bq, 1]
        l_new = correction * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

        pv = jax.lax.dot_general(
            p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc[:] = acc[:] * correction + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == num_k_blocks - 1)
    def _finish():
        denom = l_scr[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0] = (acc[:] / denom).astype(o_ref.dtype)

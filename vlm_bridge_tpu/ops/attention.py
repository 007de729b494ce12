"""Generic multi-head attention with GQA, soft-capping, sliding windows.

This is the single attention entry point for the whole framework: the DINOv2
ViT (plain bidirectional MHA), the bridge (cross + non-causal self attention),
and Gemma-2 (causal GQA with logit soft-capping and alternating sliding
windows) all route through `dot_product_attention`.

The jnp path below is the reference implementation (softmax in f32; exact
semantics match HF eager attention). On TPU backends, compatible shapes are
dispatched to the Pallas flash-attention kernel in `flash_attention.py`.

Replaces the reference's use of `F.scaled_dot_product_attention`
(reference: src/vlm_bridge/model_architecture/bridge_module.py:122-139).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -2.3819763e38  # matches XLA's min bf16-representable f32 fill


def _use_pallas() -> bool:
    if os.environ.get("VLM_BRIDGE_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
    is_causal: bool = False,
    logit_softcap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    q_positions: Optional[jax.Array] = None,
    kv_positions: Optional[jax.Array] = None,
    kv_lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-head scaled dot-product attention.

    Args:
      q: [B, T, H, D]
      k, v: [B, S, KH, D] with H % KH == 0 (GQA; KH == H for MHA)
      scale: logit scale; default D**-0.5
      mask: optional boolean mask broadcastable to [B, H, T, S]; True = attend
      is_causal: apply causal masking using q/kv positions
      logit_softcap: Gemma-2 style tanh soft-capping of attention logits
      sliding_window: if set, only attend to keys with
        q_pos - window < kv_pos (combined with causal)
      q_positions: [B, T] or [T] absolute positions (for causal/window with
        KV caches); defaults to arange offsets assuming aligned suffixes
      kv_positions: [B, S] or [S]
      kv_lengths: optional [B] int32 — per-row valid key count. Pass this
        alongside `mask` when (and ONLY when) the mask is a right-padding
        prefix mask; it lets qualifying shapes dispatch to the flash kernel
        (which skips each row's padded K blocks). The jnp path ignores it
        and applies `mask` exactly.

    Returns: [B, T, H, D] in q.dtype.
    """
    B, T, H, D = q.shape
    S, KH = k.shape[1], k.shape[2]
    if scale is None:
        scale = D ** -0.5

    if _use_pallas():
        from vlm_bridge_tpu.ops import flash_attention as fa

        out = fa.maybe_flash_attention(
            q, k, v, scale=scale, mask=mask, is_causal=is_causal,
            logit_softcap=logit_softcap, sliding_window=sliding_window,
            q_positions=q_positions, kv_positions=kv_positions,
            kv_lengths=kv_lengths,
        )
        if out is not None:
            return out

    return _attention_reference(
        q, k, v, scale=scale, mask=mask, is_causal=is_causal,
        logit_softcap=logit_softcap, sliding_window=sliding_window,
        q_positions=q_positions, kv_positions=kv_positions,
    )


def make_position_mask(
    *,
    T: int,
    S: int,
    is_causal: bool,
    sliding_window: Optional[int],
    q_positions: Optional[jax.Array],
    kv_positions: Optional[jax.Array],
) -> Optional[jax.Array]:
    """Boolean [(...,) T, S] mask from causal/window constraints; None if vacuous."""
    if not is_causal and sliding_window is None:
        return None
    if q_positions is None:
        # Assume queries are the last T positions of the S-long key sequence.
        q_positions = jnp.arange(T) + (S - T)
    if kv_positions is None:
        kv_positions = jnp.arange(S)
    qp = q_positions[..., :, None].astype(jnp.int32)
    kp = kv_positions[..., None, :].astype(jnp.int32)
    mask = None
    if is_causal:
        mask = kp <= qp
    if sliding_window is not None:
        w = kp > qp - sliding_window
        mask = w if mask is None else (mask & w)
    return mask


def _attention_reference(
    q, k, v, *, scale, mask, is_causal, logit_softcap, sliding_window,
    q_positions, kv_positions,
):
    B, T, H, D = q.shape
    S, KH = k.shape[1], k.shape[2]
    G = H // KH

    # [B, KH, G, T, D] x [B, KH, S, D] -> logits [B, KH, G, T, S]
    qg = q.reshape(B, T, KH, G, D).transpose(0, 2, 3, 1, 4)
    kt = k.transpose(0, 2, 1, 3)  # [B, KH, S, D]
    vt = v.transpose(0, 2, 1, 3)

    logits = jnp.einsum(
        "bkgtd,bksd->bkgts", qg, kt, preferred_element_type=jnp.float32
    ) * scale

    if logit_softcap is not None:
        logits = jnp.tanh(logits / logit_softcap) * logit_softcap

    pos_mask = make_position_mask(
        T=T, S=S, is_causal=is_causal, sliding_window=sliding_window,
        q_positions=q_positions, kv_positions=kv_positions,
    )
    full_mask = None
    if mask is not None:
        m = mask
        if m.ndim == 2:  # [T, S]
            m = m[None, None, :, :]
        elif m.ndim == 3:  # [B, T, S]
            m = m[:, None, :, :]
        # [B, H, T, S] -> [B, KH, G, T, S]
        if m.shape[1] == H and H != 1:
            m = m.reshape(B, KH, G, T, S)
        else:
            m = m[:, :, None, :, :]
        full_mask = m
    if pos_mask is not None:
        pm = pos_mask  # [T, S] or [B, T, S]
        if pm.ndim == 2:
            pm = pm[None, None, None, :, :]
        else:
            pm = pm[:, None, None, :, :]
        full_mask = pm if full_mask is None else (full_mask & pm)

    if full_mask is not None:
        logits = jnp.where(full_mask, logits, _NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgts,bksd->bkgtd", probs, vt)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, H, D)


@partial(jax.jit, static_argnames=("scale", "logit_softcap"))
def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    cache_len: jax.Array,
    *,
    scale: float,
    logit_softcap: Optional[float] = None,
    window_start: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Single-token decode attention against a preallocated KV cache.

    q: [B, 1, H, D]; k_cache/v_cache: [B, Smax, KH, D]; cache_len: [B] or []
    number of valid entries. window_start: [] or [B], first attendable index
    (for sliding-window layers). Positions >= cache_len (or < window_start)
    are masked.

    k_scale/v_scale: [B, Smax, KH] per-key-vector dequant scales for an int8
    cache. The dequant folds into the algebra — the k scale multiplies the
    raw q·k logits per key, the v scale folds into the probabilities — so
    no dequantized cache copy is materialized.
    """
    B, _, H, D = q.shape
    Smax, KH = k_cache.shape[1], k_cache.shape[2]
    G = H // KH

    qg = q.reshape(B, KH, G, D)
    logits = jnp.einsum(
        "bkgd,bskd->bkgs", qg, k_cache.astype(qg.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    if k_scale is not None:
        logits = logits * k_scale.transpose(0, 2, 1)[:, :, None, :]
    if logit_softcap is not None:
        logits = jnp.tanh(logits / logit_softcap) * logit_softcap

    pos = jnp.arange(Smax)[None, :]  # [1, Smax]
    valid = pos < jnp.reshape(cache_len, (-1, 1))
    if window_start is not None:
        valid = valid & (pos >= jnp.reshape(window_start, (-1, 1)))
    logits = jnp.where(valid[:, None, None, :], logits, _NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale.transpose(0, 2, 1)[:, :, None, :]
    probs = probs.astype(q.dtype if v_scale is None else jnp.float32)
    out = jnp.einsum("bkgs,bskd->bkgd", probs, v_cache.astype(probs.dtype))
    return out.astype(q.dtype).reshape(B, 1, H, D)

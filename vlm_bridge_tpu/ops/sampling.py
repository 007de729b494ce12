"""On-device token sampling: greedy / temperature / top-p.

Semantics match the reference generation loop
(reference: src/vlm_bridge/model_architecture/full_model.py:241-373):
- NaN logits -> zeros; Inf -> clamp to +/-100 (numerical-failure guards)
- temperature scaling before filtering
- nucleus (top-p) filtering that always keeps the top-1 token
- greedy fallback when the filtered distribution is invalid

TPU note: a full 256k-vocab sort per step is expensive; top-p is computed
within the top-`topk_window` logits (default 128), which covers p<=0.95
nuclei in practice. Set `exact_topp=True` for the full-vocab sort.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sanitize_logits(logits: jax.Array) -> jax.Array:
    """Reference numerical-failure guards (full_model.py:267-279), per row:
    a row containing any NaN becomes all-zero (uniform distribution); a row
    containing any Inf is clamped to [-100, 100]. Finite rows pass through
    UNCHANGED (the reference clamps only when an Inf is present)."""
    has_nan = jnp.any(jnp.isnan(logits), axis=-1, keepdims=True)
    logits = jnp.where(has_nan, 0.0, logits)
    has_inf = jnp.any(jnp.isinf(logits), axis=-1, keepdims=True)
    return jnp.where(has_inf, jnp.clip(logits, -100.0, 100.0), logits)


def sample_token(
    rng: jax.Array,
    logits: jax.Array,
    *,
    temperature: float = 0.7,
    top_p: float = 0.9,
    greedy: bool = False,
    topk_window: int = 128,
    exact_topp: bool = False,
) -> jax.Array:
    """Sample next token ids from [B, V] logits. Returns [B] int32."""
    logits = sanitize_logits(logits.astype(jnp.float32))
    if greedy or temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits / temperature

    if top_p is not None and top_p < 1.0:
        if exact_topp:
            return _topp_exact(rng, logits, top_p)
        return _topp_windowed(rng, logits, top_p, topk_window)
    return jax.random.categorical(rng, logits).astype(jnp.int32)


def topp_window_tail_mass(
    logits: jax.Array,
    *,
    temperature: float = 0.7,
    top_p: float = 0.9,
    topk_window: int = 128,
) -> jax.Array:
    """Probability mass of the top-p nucleus that the windowed sampler DROPS.

    The windowed top-p truncates the nucleus silently when p spans more than
    `topk_window` tokens — flat distributions early in training, exactly when
    the debugger gets used. Returns [B] f32: max(0, top_p - window_mass),
    where window_mass is the true (full-softmax) probability inside the
    window. 0 = the window covered the nucleus; 0.3 = 30% of the requested
    nucleus was unreachable. Logged per step by the generation debugger;
    `exact_topp=True` is the remedy.
    """
    logits = sanitize_logits(logits.astype(jnp.float32)) / temperature
    vals, _ = jax.lax.top_k(logits, topk_window)
    lse_full = jax.scipy.special.logsumexp(logits, axis=-1)
    window_mass = jnp.exp(
        jax.scipy.special.logsumexp(vals, axis=-1) - lse_full)
    return jnp.maximum(top_p - window_mass, 0.0)


def _topp_windowed(rng, logits, top_p, k):
    """Top-p restricted to the top-k logits (k static)."""
    vals, idx = jax.lax.top_k(logits, k)  # [B, k] descending
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Keep tokens whose *preceding* cumulative mass is < top_p; top-1 always kept.
    keep = jnp.concatenate(
        [jnp.ones_like(cum[:, :1], dtype=bool), cum[:, :-1] < top_p], axis=-1
    )
    filtered = jnp.where(keep, vals, -jnp.inf)
    choice = jax.random.categorical(rng, filtered)  # [B]
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


def _topp_exact(rng, logits, top_p):
    V = logits.shape[-1]
    vals, idx = jax.lax.top_k(logits, V)
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = jnp.concatenate(
        [jnp.ones_like(cum[:, :1], dtype=bool), cum[:, :-1] < top_p], axis=-1
    )
    filtered = jnp.where(keep, vals, -jnp.inf)
    choice = jax.random.categorical(rng, filtered)
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)

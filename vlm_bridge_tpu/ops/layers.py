"""Elementwise / normalization / embedding primitives.

All norms accumulate in float32 and cast back to the input dtype, matching the
numerics of the reference stack (torch LayerNorm computes in f32 under autocast;
HF Gemma2RMSNorm upcasts explicitly) so that bf16 parity holds.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _use_ln_kernel() -> bool:
    """Default OFF: a same-process A/B at the ViT encode shape measured the
    Pallas LN at 0.988x XLA (scripts/ln_ab.py, batch 64 — the apparent
    53 ms of 'LN fusions' in the decode trace turned out to be kOutput
    fusions CONTAINING the MLP matmuls; encode runs at the chip's practical
    ~65% MXU ceiling either way). Kept behind an env flag for future shapes
    where the stats fusion does dominate."""
    import os

    if not os.environ.get("VLM_BRIDGE_LN_KERNEL"):
        return False
    from vlm_bridge_tpu.ops.attention import _use_pallas

    return _use_pallas()


def linear(x: jax.Array, w, b: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ w (+ b). Weights are stored [in, out] (JAX convention; torch
    checkpoints are transposed at conversion time).

    w may be an int8 weight-only quantization dict ({"w_int8", "scale"},
    per-output-channel — see ops/quant.py); the whole model then runs
    quantized transparently."""
    if isinstance(w, dict):
        from vlm_bridge_tpu.ops.quant import int8_matmul

        lead = x.shape[:-1]
        y = int8_matmul(x.reshape(-1, x.shape[-1]), w)
        y = y.reshape(*lead, y.shape[-1])
    else:
        y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Standard LayerNorm, f32 accumulation.

    Variance is computed one-pass as E[x'^2] - E[x']^2: the two reductions
    fuse into a single read of x, where the textbook E[(x-mean)^2] forces XLA
    into separate mean and variance passes (profiled on the ViT: the LN
    convert+reduce fusions were 58% of encode time at [32,257,1024]).

    x' = x - x[..., 0] — a per-row pivot. The one-pass identity is exact in
    real arithmetic but cancels catastrophically in floats when |mean| >>
    std; that regime means every element sits near the mean, so pivoting by
    any one element re-centers x' near zero and removes the cancellation
    without a second pass (both statistics still read x once). The pivot
    cancels algebraically in the output, so gradients are untouched.

    On TPU, large row-batches dispatch to a Pallas kernel instead — the XLA
    stat fusion measured ~50x off bandwidth at ViT shapes (see
    ops/norm_kernels.py), and the kernel's in-VMEM stats are exact two-pass
    (no pivot needed).
    """
    H = x.shape[-1]
    rows = x.size // max(H, 1)
    if _use_ln_kernel() and H % 128 == 0 and rows >= 1024:
        from vlm_bridge_tpu.ops.norm_kernels import layer_norm_fast

        y2 = layer_norm_fast(x.reshape(rows, H), scale, bias, eps)
        return y2.reshape(x.shape)
    xf = x.astype(jnp.float32)
    pivot = jax.lax.stop_gradient(xf[..., :1])
    xs = xf - pivot
    mean = jnp.mean(xs, axis=-1, keepdims=True)
    mean_sq = jnp.mean(jnp.square(xs), axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    y = (xs - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Gemma-style RMSNorm: y = x/rms(x) * (1 + w), computed in f32.

    The `(1 + w)` form matches HF Gemma2RMSNorm (weights stored zero-centered).
    """
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    y = y * (1.0 + weight.astype(jnp.float32))
    return y.astype(x.dtype)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """gelu_pytorch_tanh — the Gemma-2 hidden activation."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf-based) GELU — torch nn.GELU default, used by DINOv2 MLP and
    the reference bridge FFN."""
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Rotary position embeddings (Gemma-2 style: rotate_half over concat halves)
# ---------------------------------------------------------------------------


def rope_table(
    positions: jax.Array, head_dim: int, theta: float = 10000.0
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given integer positions.

    positions: [...] int array -> returns cos,sin of shape [..., head_dim],
    built as concat(freqs, freqs) to pair with `rotate_half` application
    (matches HF Gemma2RotaryEmbedding, f32 throughout).
    """
    fraction = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv_freq = 1.0 / (theta ** fraction)  # [head_dim/2]
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., hd/2]
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply rotary embedding. x: [B, T, H, D]; cos/sin: [B, T, D] or [T, D]."""
    if cos.ndim == x.ndim - 1:
        cos = cos[..., None, :]  # broadcast over heads
        sin = sin[..., None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)


def softcap(x: jax.Array, cap: float) -> jax.Array:
    """Gemma-2 logit soft-capping: cap * tanh(x / cap)."""
    return jnp.tanh(x / cap) * cap

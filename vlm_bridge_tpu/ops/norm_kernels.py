"""Pallas LayerNorm for large row-batches.

Built to attack what looked like 53 ms of LN-stat fusions in the batch-64
DINOv2 encode; a same-process A/B (scripts/ln_ab.py) then measured it at
0.988x XLA — the profiled `convert_reduce_fusion` events are kOutput
fusions that CONTAIN the MLP matmuls, so the encode was already at the
chip's practical ~65% MXU ceiling and the stats were never the cost. The
kernel (exact two-pass f32 stats in VMEM, one read per row) is therefore
OFF by default and dispatched only under VLM_BRIDGE_LN_KERNEL=1 for shapes
where a standalone LN genuinely dominates. Kernels you wrote are not
automatically kernels you should run (DESIGN §5).

Differentiation: forward runs the kernel; the backward is the standard
closed-form LayerNorm gradient in plain jnp (XLA) — training time is
dominated by the Gemma matmuls, so only the forward (which also runs 24x
per *frozen* vision encode at serving time) needs the kernel.

Replaces the normalization layers the reference gets from torch
(reference: src/vlm_bridge/model_architecture/bridge_module.py:300-335 pre-LN
blocks; vision_encoder.py wraps HF DINOv2 whose encoder is also pre-LN).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Tests flip this to exercise the kernel via the Pallas interpreter.
INTERPRET = False

_BLOCK_ROWS = 256


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[0][None, :] + b_ref[0][None, :]
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_forward(x2: jax.Array, scale: jax.Array, bias: jax.Array,
                eps: float) -> jax.Array:
    N, H = x2.shape
    block = min(_BLOCK_ROWS, N)
    grid = (N + block - 1) // block
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, H), lambda i: (i, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, H), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H), x2.dtype),
        interpret=INTERPRET,
    )(x2, scale.astype(jnp.float32)[None, :], bias.astype(jnp.float32)[None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_fast(x2: jax.Array, scale: jax.Array, bias: jax.Array,
                    eps: float) -> jax.Array:
    """LayerNorm over the minor dim of a 2-D [N, H] array (Pallas forward).

    H must be a multiple of 128 (lane width); callers reshape [B, T, H] to
    [B*T, H] first (free for contiguous arrays). Dispatch policy lives in
    ops.layers.layer_norm.
    """
    return _ln_forward(x2, scale, bias, eps)


def _ln_fwd(x2, scale, bias, eps):
    return _ln_forward(x2, scale, bias, eps), (x2, scale, bias)


def _ln_bwd(eps, res, dy):
    x2, scale, bias = res
    xf = x2.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * r
    dscale = jnp.sum(dyf * xhat, axis=0).astype(scale.dtype)
    dbias = jnp.sum(dyf, axis=0).astype(bias.dtype)
    dg = dyf * scale.astype(jnp.float32)[None, :]
    dx = r * (dg - jnp.mean(dg, axis=-1, keepdims=True)
              - xhat * jnp.mean(dg * xhat, axis=-1, keepdims=True))
    return dx.astype(x2.dtype), dscale, dbias


layer_norm_fast.defvjp(_ln_fwd, _ln_bwd)

"""Int8 weight-only quantization for the decode path.

Batch-32 greedy decode is HBM-bandwidth-bound: every generated token streams
all ~2.6B frozen Gemma-2 weights (plus the 590M-row embedding again for the
lm_head) from HBM. Weight-only int8 halves that traffic, which is the only
remaining lever once the loop is a single fused scan (the reference has no
analogue — its decode re-runs full bf16 forwards with no cache at all,
full_model.py:241-373).

Scheme: symmetric per-output-channel int8 (`w ≈ w_int8 * scale[o]`), chosen
because it needs no activation statistics, keeps rounding error ~0.2% for
normal-ish weight distributions, and folds into one multiply at the output.

The Pallas kernels stream int8 blocks HBM->VMEM and dequantize in-register
before feeding the MXU, so the bf16 copy never exists in HBM. (A plain
`jnp.dot(x, w_i8.astype(bf16))` would NOT achieve this under `lax.scan`:
the astype is loop-invariant, XLA hoists it, and a full bf16 copy
materializes — defeating the point.) A jnp fallback covers CPU/tests.

Layout notes: int8 VMEM tiles are (32, 128); block sizes keep the second-
minor dim a multiple of 32 and the minor dim a multiple of 128.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlm_bridge_tpu.ops.attention import _use_pallas

# Tests flip this to exercise the kernels via the Pallas interpreter.
INTERPRET = False


def quantize_int8(w: jax.Array, *, axis: int = 0) -> dict:
    """Symmetric per-channel int8 quantization.

    axis: the CONTRACTION axis (reduced in the matmul); scales are per
    channel of the other axis. For [I, O] weights use axis=0 (per-O scale);
    for a [V, H] embedding used both for row lookup and as the lm_head, use
    axis=1 (per-V scale).
    Returns {"w_int8": int8 same-shape, "scale": f32 [channels]}.
    """
    wf = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=axis)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.round(wf / jnp.expand_dims(scale, axis))
    return {
        "w_int8": jnp.clip(q, -127, 127).astype(jnp.int8),
        "scale": scale,
    }


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "w_int8" in w


def dequantize(wq: dict, *, axis: int = 0, dtype=jnp.float32) -> jax.Array:
    """Materialize the bf16/f32 weight (tests / non-hot paths only)."""
    return (wq["w_int8"].astype(jnp.float32)
            * jnp.expand_dims(wq["scale"], axis)).astype(dtype)


# ---------------------------------------------------------------------------
# x[M, I] @ w[I, O] (axis=0 quantization, per-O scales)
# ---------------------------------------------------------------------------


def int8_matmul(x: jax.Array, wq: dict, *, block_i: int = 512,
                block_o: int = 512) -> jax.Array:
    """y[M, O] = x[M, I] @ dequant(w[I, O]) in x.dtype, f32 accumulation.
    w must be quantized with axis=0 (per-O scales)."""
    w, scale = wq["w_int8"], wq["scale"]
    I, O = w.shape
    if not _use_pallas() and not INTERPRET:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        return (y * scale).astype(x.dtype)

    M = x.shape[0]
    Mp = _round_up(M, 8)
    block_i = min(block_i, _round_up(I, 32))
    block_o = min(block_o, _round_up(O, 128))
    xp = jnp.pad(x, ((0, Mp - M), (0, (-I) % block_i)))
    wp = jnp.pad(w, ((0, (-I) % block_i), (0, (-O) % block_o)))
    sp = jnp.pad(scale, (0, (-O) % block_o))[None, :]
    nI, nO = wp.shape[0] // block_i, wp.shape[1] // block_o

    out = pl.pallas_call(
        functools.partial(_int8_mm_kernel, n_inner=nI),
        grid=(nO, nI),
        in_specs=[
            pl.BlockSpec((Mp, block_i), lambda j, i: (0, i)),
            pl.BlockSpec((block_i, block_o), lambda j, i: (i, j)),
            pl.BlockSpec((1, block_o), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((Mp, block_o), lambda j, i: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, wp.shape[1]), x.dtype),
        scratch_shapes=[pltpu.VMEM((Mp, block_o), jnp.float32)],
        interpret=INTERPRET,
    )(xp, wp, sp)
    return out[:M, :O]


def _int8_mm_kernel(x_ref, w_ref, s_ref, o_ref, acc, *, n_inner):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    # int8 -> bf16 is LOSSLESS (|w| <= 127, integers exact in bf16) and a
    # bf16 x bf16 dot runs the MXU's fast path (f32 x f32 is ~3x slower).
    x = x_ref[...].astype(jnp.bfloat16)
    w = w_ref[...].astype(jnp.bfloat16)
    acc[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == n_inner - 1)
    def _finish():
        o_ref[...] = (acc[:] * s_ref[0]).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# x[M, H] @ w[V, H]^T (axis=1 quantization, per-V scales) — the lm_head
# ---------------------------------------------------------------------------


def int8_matmul_t(x: jax.Array, wq: dict, *, block_v: int = 1024,
                  out_dtype=jnp.float32) -> jax.Array:
    """y[M, V] = x[M, H] @ dequant(w[V, H]).T — contraction over H, output
    scaled per V row (w quantized with axis=1). H kept whole in VMEM."""
    w, scale = wq["w_int8"], wq["scale"]
    V, H = w.shape
    if not _use_pallas() and not INTERPRET:
        y = jax.lax.dot_general(
            x, w.astype(x.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y * scale).astype(out_dtype)

    M = x.shape[0]
    Mp = _round_up(M, 8)
    block_v = min(block_v, _round_up(V, 32))
    Hp = _round_up(H, 128)
    xp = jnp.pad(x, ((0, Mp - M), (0, Hp - H)))
    wp = jnp.pad(w, ((0, (-V) % block_v), (0, Hp - H)))
    sp = jnp.pad(scale, (0, (-V) % block_v))[None, :]
    nV = wp.shape[0] // block_v

    out = pl.pallas_call(
        _int8_mmt_kernel,
        grid=(nV,),
        in_specs=[
            pl.BlockSpec((Mp, Hp), lambda j: (0, 0)),
            pl.BlockSpec((block_v, Hp), lambda j: (j, 0)),
            pl.BlockSpec((1, block_v), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((Mp, block_v), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, wp.shape[0]), out_dtype),
        interpret=INTERPRET,
    )(xp, wp, sp)
    return out[:M, :V]


def _int8_mmt_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...].astype(jnp.bfloat16)
    w = w_ref[...].astype(jnp.bfloat16)  # lossless for int8 values
    y = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[...] = (y * s_ref[0][None, :]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Fused int8 GeGLU MLP: down( gelu_tanh(x@gate) * (x@up) )
# ---------------------------------------------------------------------------


def int8_mlp(x: jax.Array, gate_q: dict, up_q: dict, down_q: dict,
             *, block_f: int = 512) -> jax.Array:
    """One kernel for the whole Gemma-2 MLP with int8 weights.

    Per decode step this is the difference between 3 kernel launches per
    layer (78 total) and 1 (26 total): per-launch overhead at batch-32 decode
    is comparable to the matmul time itself, so fusion — not just byte
    halving — is where int8 pays off. The [M, F] hidden activations live
    only as [M, block_f] tiles in VMEM.

    x: [M, H]; gate/up: axis=0-quantized [H, F]; down: axis=0-quantized
    [F, H]. Returns [M, H] in x.dtype.
    """
    g_w, g_s = gate_q["w_int8"], gate_q["scale"]
    u_w, u_s = up_q["w_int8"], up_q["scale"]
    d_w, d_s = down_q["w_int8"], down_q["scale"]
    H, F = g_w.shape
    if not _use_pallas() and not INTERPRET:
        g = jnp.dot(x, g_w.astype(x.dtype),
                    preferred_element_type=jnp.float32) * g_s
        u = jnp.dot(x, u_w.astype(x.dtype),
                    preferred_element_type=jnp.float32) * u_s
        h = (jax.nn.gelu(g, approximate=True) * u).astype(x.dtype)
        y = jnp.dot(h, d_w.astype(x.dtype),
                    preferred_element_type=jnp.float32) * d_s
        return y.astype(x.dtype)

    M = x.shape[0]
    Mp = _round_up(M, 8)
    Hp = _round_up(H, 128)
    block_f = min(block_f, _round_up(F, 128))
    Fp = _round_up(F, block_f)
    xp = jnp.pad(x, ((0, Mp - M), (0, Hp - H)))
    gp = jnp.pad(g_w, ((0, Hp - H), (0, Fp - F)))
    up = jnp.pad(u_w, ((0, Hp - H), (0, Fp - F)))
    dp = jnp.pad(d_w, ((0, Fp - F), (0, Hp - H)))
    gsp = jnp.pad(g_s, (0, Fp - F))[None, :]
    usp = jnp.pad(u_s, (0, Fp - F))[None, :]
    dsp = jnp.pad(d_s, (0, Hp - H))[None, :]
    nF = Fp // block_f

    out = pl.pallas_call(
        functools.partial(_int8_mlp_kernel, n_inner=nF),
        grid=(nF,),
        in_specs=[
            pl.BlockSpec((Mp, Hp), lambda j: (0, 0)),
            pl.BlockSpec((Hp, block_f), lambda j: (0, j)),
            pl.BlockSpec((Hp, block_f), lambda j: (0, j)),
            pl.BlockSpec((1, block_f), lambda j: (0, j)),
            pl.BlockSpec((1, block_f), lambda j: (0, j)),
            pl.BlockSpec((block_f, Hp), lambda j: (j, 0)),
            pl.BlockSpec((1, Hp), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Mp, Hp), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, Hp), x.dtype),
        scratch_shapes=[pltpu.VMEM((Mp, Hp), jnp.float32)],
        interpret=INTERPRET,
    )(xp, gp, up, gsp, usp, dp, dsp)
    return out[:M, :H]


def _int8_mlp_kernel(x_ref, g_ref, u_ref, gs_ref, us_ref, d_ref, ds_ref,
                     o_ref, acc, *, n_inner):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[...].astype(jnp.bfloat16)
    g = jax.lax.dot_general(
        x, g_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * gs_ref[0][None, :]
    u = jax.lax.dot_general(
        x, u_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * us_ref[0][None, :]
    h = (jax.nn.gelu(g, approximate=True) * u).astype(jnp.bfloat16)
    acc[:] += jax.lax.dot_general(
        h, d_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_inner - 1)
    def _finish():
        o_ref[...] = (acc[:] * ds_ref[0][None, :]).astype(o_ref.dtype)

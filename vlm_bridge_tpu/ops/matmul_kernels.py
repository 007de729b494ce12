"""Pallas TPU tiled bf16 matmul for the ViT's skinny-N projections.

Why this exists (measured, v5e): XLA runs the encoder's N=1024 projections
(attention out-proj [M,1024]x[1024,1024], MLP down-proj [M,4096]x[4096,1024],
M = B*257) at ~39 TFLOP/s while the SAME chip reaches ~120 TFLOP/s on
N>=3072 shapes — the skinny output gives XLA's tiler only 8 lane tiles and
it picks a poorly pipelined schedule. These two projections are ~half the
encoder FLOPs, and the encoder pre-scan is ~35% of serving batch time
(DESIGN.md round-3 anatomy: 136 ms vs an ~85 ms floor at decode batch 64).

The kernel is a classic (M,N)-parallel tiling with the FULL K contraction
per program (K <= 4096 fits VMEM comfortably: a [block_m, K] A-tile at
bf16 is <=4 MB), so there is no accumulator carry between grid steps and
Mosaic double-buffers the A/B tile streams. An optional epilogue fuses the
bias add (+ exact GELU) so the [M,N] output never takes a second HBM round
trip through a separate elementwise fusion.

Replaces (TPU-side) the torch nn.Linear projections inside the reference's
frozen DINOv2 encoder (reference vision_encoder.py wraps HF
Dinov2Model; the projections live in HF modeling_dinov2.py). Dispatch is
gated by measurement: scripts/encoder_mm_ab.py must show >=1.15x on the
projection segment on real TPU before `use_vit_kernel` defaults on
(VLM_BRIDGE_VIT_MM=pallas|xla overrides either way).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tests flip this to run in the Pallas interpreter (CPU-hermetic).
INTERPRET = False

DEFAULT_BLOCK_M = 512
DEFAULT_BLOCK_N = 256


def _mm_kernel(a_ref, b_ref, out_ref, *, gelu: bool):
    acc = jnp.dot(a_ref[...], b_ref[...], preferred_element_type=jnp.float32)
    if gelu:
        acc = _gelu_exact_f32(acc)
    out_ref[...] = acc.astype(out_ref.dtype)


def _mm_bias_kernel(a_ref, b_ref, bias_ref, out_ref, *, gelu: bool):
    acc = jnp.dot(a_ref[...], b_ref[...], preferred_element_type=jnp.float32)
    acc = acc + bias_ref[...].astype(jnp.float32)
    if gelu:
        acc = _gelu_exact_f32(acc)
    out_ref[...] = acc.astype(out_ref.dtype)


def _gelu_exact_f32(x):
    # erf-based GELU, matching ops.layers.gelu_exact (torch nn.GELU default,
    # which the HF ViT uses) — computed on the f32 accumulator before the
    # bf16 store so the epilogue costs no extra precision
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "gelu", "out_dtype"))
def _tiled_matmul_jit(
    a: jax.Array,
    b: jax.Array,
    bias: jax.Array | None = None,
    *,
    block_m: int,
    block_n: int,
    gelu: bool = False,
    out_dtype=None,
) -> jax.Array:
    M, K = a.shape
    K2, N = b.shape
    assert K == K2, (a.shape, b.shape)
    out_dtype = out_dtype or a.dtype
    block_m = min(block_m, M)
    block_n = min(block_n, N)

    grid = (pl.cdiv(M, block_m), pl.cdiv(N, block_n))
    a_spec = pl.BlockSpec((block_m, K), lambda i, j: (i, 0))
    b_spec = pl.BlockSpec((K, block_n), lambda i, j: (0, j))
    out_spec = pl.BlockSpec((block_m, block_n), lambda i, j: (i, j))

    if bias is not None:
        # 2-D [1, N] view: 1-D operands don't lane-tile on TPU
        bias2 = bias.reshape(1, N)
        return pl.pallas_call(
            functools.partial(_mm_bias_kernel, gelu=gelu),
            grid=grid,
            in_specs=[a_spec, b_spec,
                      pl.BlockSpec((1, block_n), lambda i, j: (0, j))],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=INTERPRET,
        )(a, b, bias2)
    return pl.pallas_call(
        functools.partial(_mm_kernel, gelu=gelu),
        grid=grid,
        in_specs=[a_spec, b_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=INTERPRET,
    )(a, b)


def tiled_matmul(
    a: jax.Array,
    b: jax.Array,
    bias: jax.Array | None = None,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    gelu: bool = False,
    out_dtype=None,
) -> jax.Array:
    """[M, K] @ [K, N] (+ bias [N]) (+ exact GELU) -> [M, N].

    The full K contraction runs inside one program; grid is
    (ceil(M/block_m), ceil(N/block_n)). M and N need not divide the blocks
    (Mosaic masks the ragged edge); K must fit VMEM (K*block_m*2 bytes for
    the A tile — fine through K=8192 at the default block_m).

    block_m/block_n default to the module-level DEFAULT_BLOCK_M/N, read at
    CALL time (this wrapper, not the jitted inner, resolves them) so probe
    scripts can retune the dispatch defaults by mutating the module
    attributes and every downstream caller — including dinov2's projections,
    which pass no block args — picks them up.
    """
    if block_m is None:
        block_m = DEFAULT_BLOCK_M
    if block_n is None:
        block_n = DEFAULT_BLOCK_N
    return _tiled_matmul_jit(a, b, bias, block_m=block_m, block_n=block_n,
                             gelu=gelu, out_dtype=out_dtype)


def vit_mm_mode() -> str:
    """'pallas' | 'xla' — dispatch for the encoder projections.

    Default 'xla' until scripts/encoder_mm_ab.py demonstrates >=1.15x on
    chip (round-3 verdict weak #2); the env override exists so the A/B can
    flip the path inside one process.
    """
    return os.environ.get("VLM_BRIDGE_VIT_MM", "xla")

"""Probe: does Mosaic lower a NATIVE int8 x int8 MXU dot, and how fast?

Round-3 context (DESIGN.md §2): the ViT encoder is the decode pre-scan's
dominant cost (~120 ms device at batch 64, matmul-bound at ~83 TFLOP/s
average because its N=1024 projections tile poorly). XLA's s8xs8 dot
measured only 1.1x bf16 (34 TOP/s) — this probe asks whether a Pallas
kernel with int8 operands and preferred_element_type=int32 reaches the
v5e MXU's nominal 2x int8 rate (~394 TOP/s peak). If it does, an
int8-activation encoder matmul kernel is worth building; if Mosaic
rejects the lowering or lands at bf16 rates, the encoder stays bf16
(close the escape hatch for good).

Usage (TPU): python scripts/s8_dot_probe.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401

SMOKE = "--cpu-smoke" in sys.argv  # tiny shapes + interpret, CPU-runnable
if SMOKE:
    jax.config.update("jax_platforms", "cpu")
M, K, N = (512, 256, 256) if SMOKE else (16448, 1024, 1024)
BM, BN = (256, 128) if SMOKE else (512, 512)
INTERPRET = SMOKE


def _kernel_s8(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _kernel_bf16(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...].astype(jnp.bfloat16), w_ref[...].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _matmul(kernel, out_dtype, x, w):
    m, k = x.shape
    _, n = w.shape
    return pl.pallas_call(
        kernel,
        grid=(m // BM, n // BN),
        in_specs=[
            pl.BlockSpec((BM, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, BN), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=INTERPRET,
    )(x, w)


def bench(fn, *args, reps=20):
    out = fn(*args)
    np.asarray(out)  # fence through the tunnel
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / reps


def _kernel_pure_bf16(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def main():
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    xb = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.normal(0, 1, (K, N)), jnp.bfloat16)

    flops = 2 * M * K * N

    for name, kernel, dt, (a, b) in (
            ("Pallas s8xs8->s32", _kernel_s8, jnp.int32, (x8, w8)),
            ("Pallas s8 dequant bf16 MXU", _kernel_bf16, jnp.float32,
             (x8, w8)),
            ("Pallas bf16xbf16", _kernel_pure_bf16, jnp.float32, (xb, wb))):
        try:
            f = jax.jit(functools.partial(_matmul, kernel, dt))
            dt_s = bench(f, a, b)
            print(f"{name}: {dt_s*1e3:.3f} ms = {flops/dt_s/1e12:.1f} T/s")
        except Exception as e:  # Mosaic lowering rejection is a finding
            print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:300]}")

    # XLA reference points. The standalone dot vs the LN->dot chain
    # separates "XLA tiles [M,1024]x[1024,1024] badly" from "producer
    # fusions into the dot deoptimize it" — the encode profile's slow
    # matmuls all have LN/GELU chains fused in.
    for name, (a, b) in (
            ("XLA s8xs8", (x8, w8)),
            ("XLA bf16", (xb, wb))):
        f = jax.jit(lambda p, q: jax.lax.dot_general(
            p, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if p.dtype == jnp.int8
            else jnp.float32))
        dt_s = bench(f, a, b)
        print(f"{name}: {dt_s*1e3:.3f} ms = {flops/dt_s/1e12:.1f} T/s")

    def ln_chain(p, q):
        pf = p.astype(jnp.float32)
        mu = jnp.mean(pf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(pf), axis=-1, keepdims=True) - mu * mu
        h = ((pf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            h, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dt_s = bench(jax.jit(ln_chain), xb, wb)
    print(f"XLA LN->dot chain: {dt_s*1e3:.3f} ms = "
          f"{flops/dt_s/1e12:.1f} T/s (+LN bytes)")


if __name__ == "__main__":
    main()

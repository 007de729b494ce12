"""Same-process A/B: ViT projections through XLA dots vs the Pallas tiled
matmul (ops/matmul_kernels.tiled_matmul) — round-3 verdict #4.

Timing method (tunnel-proof): on a tunneled device every host fence pays
a ~25 ms RPC round trip — larger than the ~1 ms matmuls under test, so
per-call wall timing measures the tunnel, not the kernel (the first run
of this script "measured" 25-30 ms for a 0.9 ms dot). Instead each
variant runs as ONE jitted lax.fori_loop whose body feeds a negligible
perturbation of the output back into the input (a structural loop-carry
dependence, so XLA can neither hoist nor CSE the dot out of the loop),
and the per-iteration time comes from TWO runs at N and 2N iterations:
per_iter = (t_2N - t_N) / N — the constant dispatch+RTT+fence overhead
cancels exactly.

Two levels:
1. --micro: each projection shape in isolation ([B*257,1024]x[1024,N] for
   N in 1024/3072/4096 and the fc2 [.,4096]x[4096,1024]), sweeping kernel
   block sizes, reporting achieved TFLOP/s per variant. This finds the best
   blocks and answers "can Mosaic out-tile XLA at skinny N".
2. full-encode A/B (default): encode_image looped the same way, one trace
   with VLM_BRIDGE_VIT_MM=pallas and one without (jit traces lazily — the
   env toggle must be live during each variant's FIRST call only).

Usage: python scripts/encoder_mm_ab.py [--batch 64] [--reps 3] [--micro]
                                       [--block-m 512] [--block-n 256]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0]))


def _loop(step, iters):
    """One jitted program running `step` iters times with a loop-carried
    perturbation: carry = (acc, x); step(x) -> out; the next x is
    x * (1 + 1e-6*tanh(sum(out))) — numerically a no-op (bf16 rounds the
    factor to 1.0) but structurally a dependence, so every iteration
    executes on device."""

    def body(_, carry):
        acc, x = carry
        out = step(x)
        s = jnp.sum(out.astype(jnp.float32))
        x = x * (1 + 1e-6 * jnp.tanh(s)).astype(x.dtype)
        return acc + s, x

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), x))

    return run


def per_iter_time(step, x, iters, reps):
    """Median per-iteration seconds via the two-point method."""
    r1, r2 = _loop(step, iters), _loop(step, 2 * iters)
    fence(r1(x))  # compile both
    fence(r2(x))
    deltas = []
    for _ in range(reps):
        t0 = time.time()
        fence(r1(x))
        t1 = time.time()
        fence(r2(x))
        t2 = time.time()
        deltas.append(((t2 - t1) - (t1 - t0)) / iters)
    return sorted(deltas)[len(deltas) // 2]


def micro(args):
    from vlm_bridge_tpu.ops.matmul_kernels import tiled_matmul

    M = args.batch * 257
    shapes = [(M, 1024, 1024), (M, 1024, 3072), (M, 1024, 4096),
              (M, 4096, 1024)]
    blocks = [(256, 256), (512, 256), (512, 512), (1024, 256), (1024, 512),
              (2048, 256)]
    rng = np.random.default_rng(0)
    out = []
    for (m, k, n) in shapes:
        a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
        flops = 2 * m * k * n

        t_xla = per_iter_time(
            lambda x: jnp.dot(x, b, preferred_element_type=jnp.bfloat16),
            a, args.iters, args.reps)
        row = {"shape": f"{m}x{k}x{n}",
               "xla_ms": round(t_xla * 1e3, 3),
               "xla_tflops": round(flops / t_xla / 1e12, 1)}
        best = None
        for (bm, bn) in blocks:
            try:
                t = per_iter_time(
                    functools.partial(
                        lambda bm, bn, x: tiled_matmul(
                            x, b, block_m=bm, block_n=bn), bm, bn),
                    a, args.iters, args.reps)
            except Exception as e:  # Mosaic refusal: record and move on
                row[f"pallas_{bm}x{bn}"] = f"FAIL {type(e).__name__}"
                continue
            row[f"pallas_{bm}x{bn}_ms"] = round(t * 1e3, 3)
            if best is None or t < best[0]:
                best = (t, bm, bn)
        if best:
            row["best_pallas_ms"] = round(best[0] * 1e3, 3)
            row["best_pallas_tflops"] = round(flops / best[0] / 1e12, 1)
            row["best_blocks"] = f"{best[1]}x{best[2]}"
            row["speedup"] = round(t_xla / best[0], 3)
        out.append(row)
        print(json.dumps(row), flush=True)
    # dict-shaped so the capture queue's validity check (isinstance dict,
    # no "error" key) recognizes the artifact and skips the step on resume
    return {"mode": "micro", "batch": args.batch, "rows": out}


def full_encode(args):
    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.models import full_model

    cfg = VLMConfig.default()
    params = full_model.init(jax.random.key(0), cfg)
    pixels = jnp.asarray(
        np.random.default_rng(0).normal(
            0, 1, (args.batch, cfg.image_size, cfg.image_size, 3)),
        jnp.bfloat16)
    iters = max(1, args.iters // 16)  # encode is ~100x a single projection

    def step(px):
        return full_model.encode_image(params, cfg, px)

    # build + compile each variant's loops under its env toggle (jit traces
    # on first call; the toggle is read at trace time)
    def build(env):
        if env:
            os.environ["VLM_BRIDGE_VIT_MM"] = env
        else:
            os.environ.pop("VLM_BRIDGE_VIT_MM", None)
        if args.block_m:
            import vlm_bridge_tpu.ops.matmul_kernels as mk

            mk.DEFAULT_BLOCK_M = args.block_m
            mk.DEFAULT_BLOCK_N = args.block_n
        r1, r2 = _loop(step, iters), _loop(step, 2 * iters)
        fence(r1(pixels))
        fence(r2(pixels))
        os.environ.pop("VLM_BRIDGE_VIT_MM", None)
        return r1, r2

    loops = {"xla": build(None), "pallas": build("pallas")}
    times = {"xla": [], "pallas": []}
    ctx = jax.profiler.trace(args.trace) if args.trace else None
    if ctx:
        ctx.__enter__()
    for _ in range(args.reps):
        for name, (r1, r2) in loops.items():  # interleave the variants
            t0 = time.time()
            fence(r1(pixels))
            t1 = time.time()
            fence(r2(pixels))
            t2 = time.time()
            times[name].append(((t2 - t1) - (t1 - t0)) / iters)
    if ctx:
        ctx.__exit__(None, None, None)
    med = {k: sorted(v)[len(v) // 2] * 1000 for k, v in times.items()}
    rec = {
        "batch": args.batch,
        "encode_ms_xla": round(med["xla"], 2),
        "encode_ms_pallas_mm": round(med["pallas"], 2),
        "speedup": round(med["xla"] / med["pallas"], 3),
        "blocks": f"{args.block_m}x{args.block_n}" if args.block_m else "default",
        "iters": iters,
        "all_ms": {k: [round(t * 1000, 1) for t in v] for k, v in times.items()},
    }
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=64,
                    help="loop iterations N for the two-point (N, 2N) "
                         "measurement; full-encode uses N/16")
    ap.add_argument("--micro", action="store_true")
    ap.add_argument("--block-m", type=int, default=0)
    ap.add_argument("--block-n", type=int, default=256)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    rec = micro(args) if args.micro else full_encode(args)
    if args.output:
        with open(args.output, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()

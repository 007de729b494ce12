"""Same-process A/B: ViT projections through XLA dots vs the Pallas tiled
matmul (ops/matmul_kernels.tiled_matmul) — round-3 verdict #4.

Two levels:
1. --micro: each projection shape in isolation ([B*257,1024]x[1024,N] for
   N in 1024/3072/4096 and the fc2 [.,4096]x[4096,1024]), sweeping kernel
   block sizes, reporting achieved TFLOP/s per variant. This finds the best
   blocks and answers "can Mosaic out-tile XLA at skinny N".
2. full-encode A/B (default): two fresh jits of encode_image, one traced
   with VLM_BRIDGE_VIT_MM=pallas, one without (jit traces lazily — the env
   toggle must be live during each variant's FIRST call only). Interleaved
   reps so tunnel throttling hits both equally.

Usage: python scripts/encoder_mm_ab.py [--batch 64] [--reps 6] [--micro]
                                       [--block-m 512] [--block-n 256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


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

        def timeit(f, reps=args.reps):
            fence(f())  # compile
            ts = []
            for _ in range(reps):
                t0 = time.time()
                fence(f())
                ts.append(time.time() - t0)
            return sorted(ts)[len(ts) // 2]

        xla_dot = jax.jit(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16))
        t_xla = timeit(lambda: xla_dot(a, b))
        row = {"shape": f"{m}x{k}x{n}",
               "xla_ms": round(t_xla * 1e3, 3),
               "xla_tflops": round(flops / t_xla / 1e12, 1)}
        best = None
        for (bm, bn) in blocks:
            try:
                t = timeit(lambda: tiled_matmul(a, b, block_m=bm, block_n=bn))
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
    return out


def full_encode(args):
    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.models import full_model

    cfg = VLMConfig.default()
    params = full_model.init(jax.random.key(0), cfg)
    pixels = jnp.asarray(
        np.random.default_rng(0).normal(
            0, 1, (args.batch, cfg.image_size, cfg.image_size, 3)),
        jnp.bfloat16)

    def fresh_jit():
        return jax.jit(lambda p, px: full_model.encode_image(p, cfg, px))

    f_xla, f_ker = fresh_jit(), fresh_jit()
    os.environ.pop("VLM_BRIDGE_VIT_MM", None)
    fence(f_xla(params, pixels))
    os.environ["VLM_BRIDGE_VIT_MM"] = "pallas"
    if args.block_m:
        # thread probe blocks through the dispatch defaults
        import vlm_bridge_tpu.ops.matmul_kernels as mk

        mk.DEFAULT_BLOCK_M = args.block_m
        mk.DEFAULT_BLOCK_N = args.block_n
    fence(f_ker(params, pixels))
    os.environ.pop("VLM_BRIDGE_VIT_MM", None)

    times = {"xla": [], "pallas": []}
    ctx = jax.profiler.trace(args.trace) if args.trace else None
    if ctx:
        ctx.__enter__()
    for _ in range(args.reps):
        for name, f in (("xla", f_xla), ("pallas", f_ker)):
            t0 = time.time()
            fence(f(params, pixels))
            times[name].append(time.time() - t0)
    if ctx:
        ctx.__exit__(None, None, None)
    med = {k: sorted(v)[len(v) // 2] * 1000 for k, v in times.items()}
    rec = {
        "batch": args.batch,
        "encode_ms_xla": round(med["xla"], 2),
        "encode_ms_pallas_mm": round(med["pallas"], 2),
        "speedup": round(med["xla"] / med["pallas"], 3),
        "blocks": f"{args.block_m}x{args.block_n}" if args.block_m else "default",
        "all_ms": {k: [round(t * 1000, 1) for t in v] for k, v in times.items()},
    }
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=6)
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

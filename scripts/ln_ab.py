"""Same-process A/B: DINOv2 encode with XLA LayerNorm vs the Pallas LN kernel.

Two fresh jits of the same encode fn; the env toggle is set during each
variant's FIRST (tracing) call only (jit traces lazily — a monkeypatch
reverted before the compiling call never lands, see memory note). Reps are
interleaved so tunnel throttling hits both variants equally; a trace window
captures both in one profile for device-time confirmation.

Usage: python scripts/ln_ab.py [--batch 64] [--reps 6] [--trace DIR]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.models import full_model

    cfg = VLMConfig.default()
    params = full_model.init(jax.random.key(0), cfg)
    pixels = jnp.asarray(
        np.random.default_rng(0).normal(
            0, 1, (args.batch, cfg.image_size, cfg.image_size, 3)),
        jnp.bfloat16)

    def fence(x):
        np.asarray(jax.device_get(jnp.ravel(x)[:1]))

    def fresh_jit():
        return jax.jit(lambda p, px: full_model.encode_image(p, cfg, px))

    f_xla, f_ker = fresh_jit(), fresh_jit()
    os.environ["VLM_BRIDGE_DISABLE_PALLAS"] = "1"
    fence(f_xla(params, pixels))     # traces WITHOUT the kernel
    del os.environ["VLM_BRIDGE_DISABLE_PALLAS"]
    fence(f_ker(params, pixels))     # traces WITH the kernel

    times = {"xla": [], "kernel": []}
    ctx = jax.profiler.trace(args.trace) if args.trace else None
    if ctx:
        ctx.__enter__()
    for _ in range(args.reps):
        for name, f in (("xla", f_xla), ("kernel", f_ker)):
            t0 = time.time()
            fence(f(params, pixels))
            times[name].append(time.time() - t0)
    if ctx:
        ctx.__exit__(None, None, None)

    med = {k: sorted(v)[len(v) // 2] * 1000 for k, v in times.items()}
    print(json.dumps({
        "batch": args.batch,
        "encode_ms_xla_ln": round(med["xla"], 2),
        "encode_ms_pallas_ln": round(med["kernel"], 2),
        "speedup": round(med["xla"] / med["kernel"], 3),
        "all_ms": {k: [round(t * 1000, 1) for t in v]
                   for k, v in times.items()},
    }))


if __name__ == "__main__":
    main()

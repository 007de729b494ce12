"""Same-process A/B: fused Pallas decode kernels vs the jnp int8 decode path.

Both variants share the process and interleave reps (tunnel throttling hits
them equally). The fused flag is a static jit argument, so the two variants
compile separately and the env toggle at call time picks the path.

Usage: python scripts/decode_ab.py [--batch 64] [--len 50] [--reps 5]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--len", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)
    from vlm_bridge_tpu.models import bridge, full_model, gemma2

    cfg = VLMConfig.default()
    params = full_model.init(jax.random.key(0), cfg)
    params["lm"] = gemma2.quantize_params(params["lm"])
    params["bridge"] = bridge.quantize_decode_params(params["bridge"])
    pixels = jnp.asarray(
        np.random.default_rng(0).normal(
            0, 1, (args.batch, cfg.image_size, cfg.image_size, 3)),
        jnp.bfloat16)
    gen = GenerationConfig(max_length=args.len, greedy=True, kv_quant=True)

    def run(force_jnp):
        if force_jnp:
            os.environ["VLM_BRIDGE_DEBUG_FORCE_JNP"] = "1"
        else:
            os.environ.pop("VLM_BRIDGE_DEBUG_FORCE_JNP", None)
        toks, _ = generate_tokens(params, cfg, pixel_values=pixels, gen=gen)
        return np.asarray(toks)

    t0 = time.time()
    tok_jnp = run(True)
    print(f"jnp compile+warm {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    tok_fused = run(False)
    print(f"fused compile+warm {time.time()-t0:.0f}s", file=sys.stderr)
    agree = float((tok_jnp == tok_fused).mean())

    times = {"jnp": [], "fused": []}
    ctx = jax.profiler.trace(args.trace) if args.trace else None
    if ctx:
        ctx.__enter__()
    for _ in range(args.reps):
        for name, flag in (("jnp", True), ("fused", False)):
            t0 = time.time()
            run(flag)
            times[name].append(time.time() - t0)
    if ctx:
        ctx.__exit__(None, None, None)

    med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
    print(json.dumps({
        "batch": args.batch, "len": args.len,
        "jnp_batch_s": round(med["jnp"], 4),
        "fused_batch_s": round(med["fused"], 4),
        "jnp_captions_per_sec": round(args.batch / med["jnp"], 1),
        "fused_captions_per_sec": round(args.batch / med["fused"], 1),
        "speedup": round(med["jnp"] / med["fused"], 3),
        "token_agreement": agree,
        "all_s": {k: [round(t, 3) for t in v] for k, v in times.items()},
    }))


if __name__ == "__main__":
    main()

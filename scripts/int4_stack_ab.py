"""Same-process A/B: whole-stack decode with int8 MLP vs int4 MLP weights.

The int4 MLP halves the decode loop's largest weight stream (1.66 GB ->
0.83 at 2B; DESIGN.md §3 projects ~+18% captions/s end-to-end if the
in-kernel unpack + grouped dots are free). Both variants run through
generate_tokens with PRE-stacked weights (the serving deployment shape),
share one process, and interleave reps so tunnel throttling hits them
equally (cross-run wall-time comparisons are garbage on this box).

The two stacked layouts share the embedding/vision/bridge params — only the
MLP stack differs — so both fit one 16 GB chip (~2.1 + ~1.4 GB stacks).

Usage: python scripts/int4_stack_ab.py [--batch 64] [--len 50] [--reps 5]
           [--group 128] [--output perf/int4_stack_ab.json]
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
    ap.add_argument("--group", type=int, default=128,
                    help="int4 sub-channel scale group (0 = per-channel "
                         "scales, fewer in-kernel dots)")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    group = args.group or None

    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)
    from vlm_bridge_tpu.models import bridge, full_model, gemma2

    cfg = VLMConfig.default()
    params = full_model.init(jax.random.key(0), cfg)
    params["lm"] = gemma2.quantize_params(params["lm"])
    params["bridge"] = bridge.quantize_decode_params(params["bridge"])

    t0 = time.time()
    stacked8 = gemma2.stack_decode_params(params["lm"], cfg.lm)
    stacked4 = gemma2.stack_decode_params(
        params["lm"], cfg.lm, mlp_int4=True, mlp_int4_group=group)
    jax.block_until_ready((stacked8, stacked4))
    print(f"stacked both layouts in {time.time()-t0:.0f}s", file=sys.stderr)

    base_lm = {k: v for k, v in params["lm"].items() if k != "layers"}
    variants = {
        "int8": {**params, "lm": {**base_lm, "stacked_decode": stacked8}},
        "int4": {**params, "lm": {**base_lm, "stacked_decode": stacked4}},
    }
    # per-layer weights are no longer needed by either variant
    del params["lm"]["layers"]

    pixels = jnp.asarray(
        np.random.default_rng(0).normal(
            0, 1, (args.batch, cfg.image_size, cfg.image_size, 3)),
        jnp.bfloat16)
    gen = GenerationConfig(max_length=args.len, greedy=True, kv_quant=True)

    def run(name):
        toks, _ = generate_tokens(variants[name], cfg,
                                  pixel_values=pixels, gen=gen)
        return np.asarray(toks)

    toks = {}
    for name in ("int8", "int4"):
        t0 = time.time()
        toks[name] = run(name)
        print(f"{name} compile+warm {time.time()-t0:.0f}s", file=sys.stderr)
    # agreement is informative, not a gate: int4 is a coarser grid, so some
    # argmax flips are expected even when the kernel is correct
    agree = float((toks["int8"] == toks["int4"]).mean())

    times = {"int8": [], "int4": []}
    for _ in range(args.reps):
        for name in ("int8", "int4"):
            t0 = time.time()
            run(name)
            times[name].append(time.time() - t0)

    med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
    out = {
        "batch": args.batch, "len": args.len, "group": group,
        "int8_batch_s": round(med["int8"], 4),
        "int4_batch_s": round(med["int4"], 4),
        "int8_captions_per_sec": round(args.batch / med["int8"], 1),
        "int4_captions_per_sec": round(args.batch / med["int4"], 1),
        "speedup_int4_vs_int8": round(med["int8"] / med["int4"], 3),
        "token_agreement": agree,
        "accepted": med["int8"] / med["int4"] >= 1.08,
        "all_s": {k: [round(t, 3) for t in v] for k, v in times.items()},
        "note": "same-process interleaved reps, pre-stacked weights both "
                "sides; acceptance >=1.08x end-to-end. Serving adoption "
                "also needs the real-weight quality gate (PARITY.md).",
    }
    line = json.dumps(out)
    print(line)
    if args.output:
        with open(args.output, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

"""Capture a jax.profiler trace of the batched decode scan; print per-op times.

Where the serving step's milliseconds go (the VERDICT r2 question: batch-64
int8 decode at 8.6 ms/token-step vs a ~4.3 ms weight-stream floor — is the
gap dispatch, bytes, or compute?). Prints the framework-op-stats table of
ONE decode batch (50-token scan), aggregated by op type and by HLO op.

Usage: python scripts/profile_decode.py [--batch 64] [--len 50]
       [--quantize embedding,mlp,attn,bridge] [--kv-int8] [--out DIR]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--len", type=int, default=50)
    ap.add_argument("--quantize", default="embedding,mlp,attn,bridge")
    ap.add_argument("--kv-int8", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--out", default="/tmp/decode_trace")
    ap.add_argument("--top", type=int, default=60)
    args = ap.parse_args()

    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)
    from vlm_bridge_tpu.models import full_model, gemma2

    cfg = VLMConfig.default()
    params = full_model.init(jax.random.key(0), cfg)
    if args.quantize:
        parts = args.quantize.split(",")
        lm_parts = tuple(p for p in parts if p != "bridge")
        if lm_parts:
            params["lm"] = gemma2.quantize_params(params["lm"], parts=lm_parts)
        if "bridge" in parts:
            from vlm_bridge_tpu.models import bridge

            params["bridge"] = bridge.quantize_decode_params(params["bridge"])

    pixels = jnp.asarray(
        np.random.default_rng(0).normal(
            0, 1, (args.batch, cfg.image_size, cfg.image_size, 3)),
        jnp.bfloat16)
    gen = GenerationConfig(max_length=args.len, greedy=True,
                           kv_quant=args.kv_int8)

    def fence(x):
        np.asarray(jax.device_get(jnp.ravel(jax.tree.leaves(x)[0])[:1]))

    import time
    t0 = time.time()
    fence(generate_tokens(params, cfg, pixel_values=pixels, gen=gen))
    print(f"compile+warm: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    fence(generate_tokens(params, cfg, pixel_values=pixels, gen=gen))
    wall = time.time() - t0
    print(json.dumps({"decode_batch_wall_s": round(wall, 4),
                      "captions_per_sec": round(args.batch / wall, 2)}))

    with jax.profiler.trace(args.out):
        for _ in range(2):
            fence(generate_tokens(params, cfg, pixel_values=pixels, gen=gen))

    paths = glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                      recursive=True)
    print("trace files:", paths, file=sys.stderr)
    if not paths:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [sorted(paths)[-1]], "framework_op_stats^", {})
    rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    try:
        table = rows[0]
        cols = [c["label"] for c in table["cols"]]
        print("COLS:", cols)
        for r in table["rows"][:args.top]:
            print([c.get("v") for c in r["c"]])
    except Exception:
        print(str(rows)[:8000])


if __name__ == "__main__":
    main()

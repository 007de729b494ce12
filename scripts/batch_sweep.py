"""Same-process decode batch sweep: is there throughput between 64 and 128?

Round-3 measured batch 64 at 164.7 captions/s and batch 128 *slower*
(152.1 — the stack kernel's KV-cache blocks double to 8 MB and VMEM
pressure breaks double buffering). Batch 96 sits between (6.3 MB blocks)
and was never measured. All batches run interleaved in ONE process so
tunnel throttling hits them equally; weights are pre-stacked once and
shared (the batch only changes activations/caches).

Usage: python scripts/batch_sweep.py [--batches 64,96] [--len 50]
           [--reps 5] [--output perf/batch_sweep.json]
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
    ap.add_argument("--batches", default="64,96",
                    help="comma list of decode batch sizes to interleave")
    ap.add_argument("--len", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)
    from vlm_bridge_tpu.models import bridge, full_model, gemma2

    cfg = VLMConfig.default()
    params = full_model.init(jax.random.key(0), cfg)
    params["lm"] = gemma2.quantize_params(params["lm"])
    params["bridge"] = bridge.quantize_decode_params(params["bridge"])
    params["lm"]["stacked_decode"] = gemma2.stack_decode_params(
        params["lm"], cfg.lm, free_layers=True)
    del params["lm"]["layers"]

    rng = np.random.default_rng(0)
    pixels = {b: jnp.asarray(
        rng.normal(0, 1, (b, cfg.image_size, cfg.image_size, 3)),
        jnp.bfloat16) for b in batches}
    gen = GenerationConfig(max_length=args.len, greedy=True, kv_quant=True)

    def run(b):
        toks, _ = generate_tokens(params, cfg, pixel_values=pixels[b],
                                  gen=gen)
        return np.asarray(toks)

    for b in batches:
        t0 = time.time()
        run(b)
        print(f"batch {b} compile+warm {time.time()-t0:.0f}s",
              file=sys.stderr)

    times = {b: [] for b in batches}
    for _ in range(args.reps):
        for b in batches:
            t0 = time.time()
            run(b)
            times[b].append(time.time() - t0)

    # Existing keys stay WALL-CLOCK (r3-comparable); rtt-adjusted device
    # views get their own `_device` keys (advisor r4: don't change the
    # meaning of headline keys mid-series).
    raw = {b: sorted(v)[len(v) // 2] for b, v in times.items()}
    med = {b: max(t, 1e-9) for b, t in raw.items()}
    from vlm_bridge_tpu.runtime.profiling import host_rtt

    rtt_s = host_rtt()
    dev = {b: max(t - rtt_s, 1e-9) for b, t in raw.items()}
    out = {
        "len": args.len,
        "batches": batches,
        **{f"batch{b}_s": round(med[b], 4) for b in batches},
        **{f"batch{b}_captions_per_sec": round(b / med[b], 1)
           for b in batches},
        **{f"batch{b}_captions_per_sec_device": round(b / dev[b], 1)
           for b in batches},
        "best_batch": max(batches, key=lambda b: b / med[b]),
        "best_batch_device": max(batches, key=lambda b: b / dev[b]),
        "host_rtt_s": round(rtt_s, 4),
        "raw_medians_s": {str(b): round(t, 4) for b, t in raw.items()},
        "all_s": {str(b): [round(t, 3) for t in v]
                  for b, v in times.items()},
        "note": "same-process interleaved; shared pre-stacked weights; "
                "batch 128 already measured worse than 64 in r3 (VMEM "
                "double-buffer break), so the sweep covers the gap.",
    }
    line = json.dumps(out)
    print(line)
    if args.output:
        with open(args.output, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

"""Same-process A/B bounding the early-stop (while_loop) decode win.

With random weights, captions never hit EOS, so the early-stop win cannot be
measured directly (round-3 verdict weak #5). It CAN be bounded honestly:

  A. scan, max_length=L           — the bench serving recipe (fixed L steps)
  B. while_loop, max_length=L     — random weights never exit early, so B-A
                                    is the PURE while_loop-vs-scan overhead
  C. scan, max_length=L_short     — what a fixed scan costs at the mean real
                                    caption length (reference captions avg
                                    well under max_length=50)

Projected early-stop batch time at mean caption length L_short:
    t_C + (t_B - t_A) * L_short / L      (short decode + prorated overhead)

All variants share the process and interleave reps so tunnel throttling hits
them equally (the scripts/decode_ab.py methodology). Replaces the guesswork
around the reference's Python EOS break (reference full_model.py:366-373).

Usage: python scripts/early_stop_ab.py [--batch 64] [--len 50] [--short-len 25]
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
    ap.add_argument("--short-len", type=int, default=25)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--preset", choices=("default", "tiny"), default="default",
                    help="tiny = CPU smoke of the harness itself")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    if args.preset == "tiny":
        os.environ.setdefault("VLM_BRIDGE_DISABLE_PALLAS", "1")
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)
    from vlm_bridge_tpu.models import bridge, full_model, gemma2

    cfg = (VLMConfig.tiny_test() if args.preset == "tiny"
           else VLMConfig.default())
    params = full_model.init(jax.random.key(0), cfg)
    params["lm"] = gemma2.quantize_params(params["lm"])
    params["bridge"] = bridge.quantize_decode_params(params["bridge"])
    pixels = jnp.asarray(
        np.random.default_rng(0).normal(
            0, 1, (args.batch, cfg.image_size, cfg.image_size, 3)),
        jnp.bfloat16)

    variants = {
        "scan_full": GenerationConfig(
            max_length=args.len, greedy=True, kv_quant=True),
        "while_full": GenerationConfig(
            max_length=args.len, greedy=True, kv_quant=True, early_stop=True),
        "scan_short": GenerationConfig(
            max_length=args.short_len, greedy=True, kv_quant=True),
    }

    def run(gen):
        toks, lens = generate_tokens(params, cfg, pixel_values=pixels,
                                     gen=gen)
        np.asarray(lens)  # host readback fences the whole batch
        return toks

    # compile + warm each variant once
    for name, gen in variants.items():
        t0 = time.time()
        run(gen)
        print(f"{name} compile+warm {time.time() - t0:.0f}s", file=sys.stderr)

    times = {name: [] for name in variants}
    for rep in range(args.reps):
        for name, gen in variants.items():  # interleaved: throttle-fair
            t0 = time.time()
            run(gen)
            times[name].append(time.time() - t0)
        print(f"rep {rep}: " + " ".join(
            f"{n}={times[n][-1] * 1e3:.0f}ms" for n in variants),
            file=sys.stderr)

    # Headline keys stay WALL-CLOCK (r3-comparable); the rtt-adjusted
    # device-time view gets `_device` keys. The while-scan DIFFERENCE
    # cancels the constant dispatch+RTT either way.
    raw = {n: float(np.median(ts)) for n, ts in times.items()}
    med = {n: max(t, 1e-9) for n, t in raw.items()}
    from vlm_bridge_tpu.runtime.profiling import host_rtt

    rtt_s = host_rtt()
    dev = {n: max(t - rtt_s, 1e-9) for n, t in raw.items()}
    overhead_s = med["while_full"] - med["scan_full"]
    projected_s = med["scan_short"] + overhead_s * args.short_len / args.len
    projected_dev_s = (dev["scan_short"]
                       + (dev["while_full"] - dev["scan_full"])
                       * args.short_len / args.len)
    result = {
        "metric": "early_stop_ab",
        "batch": args.batch,
        "max_length": args.len,
        "short_length": args.short_len,
        "reps": args.reps,
        "scan_full_s": med["scan_full"],
        "while_full_s": med["while_full"],
        "scan_short_s": med["scan_short"],
        "host_rtt_s": rtt_s,
        "raw_medians_s": raw,
        "while_loop_overhead_s": overhead_s,
        "while_loop_overhead_pct": 100.0 * overhead_s / med["scan_full"],
        "projected_early_stop_s": projected_s,
        "scan_full_captions_per_s": args.batch / med["scan_full"],
        "projected_early_stop_captions_per_s": args.batch / projected_s,
        "projected_speedup": med["scan_full"] / projected_s,
        "scan_full_captions_per_s_device": args.batch / dev["scan_full"],
        "projected_early_stop_captions_per_s_device": (
            args.batch / max(projected_dev_s, 1e-9)),
        "note": ("random weights: while_full runs all steps, so "
                 "while_full - scan_full is pure loop overhead; projection "
                 "assumes every caption ends by short_length"),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Attribute the 9B fused-stack decode failure: HBM capacity vs Mosaic.

The r4 capture of `bench.py --preset gemma2_9b` hit RESOURCE_EXHAUSTED
inside the fused whole-stack decode (perf/decode_9b_batch32_fused.json,
first attempt). That error is ambiguous through the axon tunnel: it could
be (a) chip HBM genuinely full at 42 layers (9.2 GB int8 + caches +
workspace), or (b) Mosaic refusing a VMEM allocation at 9B widths
(H=3584, QHD=4096, F=14336 chunked projections) — which would fail at ANY
layer count. This probe decides by bisection over num_layers at full 9B
widths: each layer count runs in its OWN subprocess (a fresh TPU client —
after one OOM an axon client cannot allocate again, observed in the r4
capture where even jax.random.key died post-del/gc).

  layers=2 fails  -> Mosaic/width refusal (layer count irrelevant)
  layers=2 passes, 42 fails -> HBM capacity; report the largest passing N

Per-token time for passing counts extrapolates the full-42-layer cost
(the decode loop is weight-stream-bound, linear in layers), giving the
projected fused 9B number the verdict asked for even if 42 cannot fit
next to the probe's workspace.

Replaces nothing in the reference — it never served a 9B model at all
(its LM wrapper is language_model.py:58-75, single GPU bf16).

Usage: python scripts/fused_9b_probe.py [--layers 2,12,26,42] [--batch 32]
       [--len 10] [--output perf/fused_9b_probe.json]
"""

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def single(args) -> dict:
    """Run ONE layer count in this process; print one JSON line."""
    import jax
    import numpy as np

    import bench
    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)

    n = args.single
    cfg9 = VLMConfig.gemma2_9b()
    cfg = dataclasses.replace(
        cfg9, lm=dataclasses.replace(cfg9.lm, num_layers=n))
    row = {"layers": n, "batch": args.batch, "len": args.len}
    t0 = time.time()
    try:
        params = bench._stream_quantized_params(
            cfg, "embedding,mlp,attn,bridge", max_length=args.len)
        if "stacked_decode" not in params["lm"]:
            raise RuntimeError("stream init did not stack — fused "
                               "preconditions unmet at this config")
        row["int8_layer_bytes_gb"] = round(sum(
            x.nbytes for x in jax.tree.leaves(
                params["lm"]["stacked_decode"])) / 1e9, 2)
        row["init_s"] = round(time.time() - t0, 1)
        gen = GenerationConfig(max_length=args.len, greedy=True,
                               kv_quant=True)
        pixels = jax.numpy.asarray(
            np.random.default_rng(0).normal(
                0, 1, (args.batch, cfg.image_size, cfg.image_size, 3)),
            jax.numpy.bfloat16)
        t0 = time.time()
        toks, _ = generate_tokens(params, cfg, pixel_values=pixels, gen=gen)
        np.asarray(toks)
        row["compile_warm_s"] = round(time.time() - t0, 1)
        # two-point not needed: attribute pass/fail, and a per-token rate
        # good to ~10% (the ~25 ms RTT sits on a >=1 s call at 9B widths)
        t0 = time.time()
        for _ in range(args.reps):
            toks, _ = generate_tokens(params, cfg, pixel_values=pixels,
                                      gen=gen)
            np.asarray(toks)
        dt = (time.time() - t0) / args.reps
        row["ok"] = True
        row["batch_s"] = round(dt, 3)
        row["ms_per_token"] = round(dt / args.len * 1e3, 3)
    except Exception as e:  # noqa: BLE001 — the whole point is recording it
        row["ok"] = False
        row["error"] = f"{type(e).__name__}: {str(e)[:300]}"
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", default="2,12,26,42")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--len", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--single", type=int, default=None,
                    help="internal: run one layer count in-process")
    ap.add_argument("--step-timeout", type=float, default=1500.0)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    if args.single is not None:
        single(args)
        return 0

    rows = []
    for n in [int(x) for x in args.layers.split(",")]:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--single", str(n), "--batch", str(args.batch),
               "--len", str(args.len), "--reps", str(args.reps)]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=args.step_timeout, cwd=REPO)
            line = [l for l in proc.stdout.splitlines() if l.strip()]
            row = (json.loads(line[-1]) if line
                   else {"layers": n, "ok": False,
                         "error": f"no output, rc={proc.returncode}: "
                                  f"{proc.stderr[-300:]}"})
        except subprocess.TimeoutExpired:
            row = {"layers": n, "ok": False,
                   "error": f"timeout after {args.step_timeout:.0f}s"}
        rows.append(row)
        print(f"[probe] {row}", file=sys.stderr)

    passing = [r for r in rows if r.get("ok")]
    failing = [r for r in rows if not r.get("ok")]
    if not passing:
        diagnosis = ("Mosaic/width refusal: the fused whole-stack kernel "
                     "fails at 9B widths regardless of layer count")
    elif failing:
        lo = max(r["layers"] for r in passing)
        diagnosis = (f"HBM capacity: fused runs at {lo} layers of full 9B "
                     f"widths but not at "
                     f"{min(r['layers'] for r in failing)} — the 42-layer "
                     f"int8 stack + caches + workspace exceed the chip")
    else:
        diagnosis = "all layer counts pass — rerun the full bench"
    out = {"mode": "fused_9b_probe", "rows": rows, "diagnosis": diagnosis}
    if passing:
        best = max(passing, key=lambda r: r["layers"])
        # weight-stream-bound decode: per-token scales ~linearly in layers,
        # plus the layer-independent head/embed/bridge share measured as the
        # intercept when >=2 passing points exist
        if len(passing) >= 2:
            a, b = sorted(passing, key=lambda r: r["layers"])[-2:]
            slope = ((b["ms_per_token"] - a["ms_per_token"])
                     / (b["layers"] - a["layers"]))
            icept = b["ms_per_token"] - slope * b["layers"]
            proj = icept + slope * 42
            out["projected_42l_ms_per_token"] = round(proj, 3)
            # captions/s at the standard 50-token caption
            out["projected_42l_captions_per_sec"] = round(
                args.batch / (proj / 1e3 * 50), 1)
    line = json.dumps(out)
    print(line)
    if args.output:
        with open(args.output, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

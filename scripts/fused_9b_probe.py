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
    row = {"layers": n, "batch": args.batch, "len": args.len,
           "mlp_int4": args.mlp_int4}
    t0 = time.time()
    try:
        params = bench._stream_quantized_params(
            cfg, args.quantize, max_length=args.len,
            mlp_int4=args.mlp_int4)
        if "stacked_decode" not in params["lm"]:
            raise RuntimeError("stream init did not stack — fused "
                               "preconditions unmet at this config")
        row["int8_layer_bytes_gb"] = round(sum(
            x.nbytes for x in jax.tree.leaves(
                params["lm"]["stacked_decode"])) / 1e9, 2)
        row["init_s"] = round(time.time() - t0, 1)
        gen = GenerationConfig(max_length=args.len, greedy=True,
                               kv_quant=True)
        gen2 = GenerationConfig(max_length=2 * args.len, greedy=True,
                                kv_quant=True)
        pixels = jax.numpy.asarray(
            np.random.default_rng(0).normal(
                0, 1, (args.batch, cfg.image_size, cfg.image_size, 3)),
            jax.numpy.bfloat16)
        t0 = time.time()
        toks, _ = generate_tokens(params, cfg, pixel_values=pixels, gen=gen)
        np.asarray(toks)
        toks, _ = generate_tokens(params, cfg, pixel_values=pixels, gen=gen2)
        np.asarray(toks)
        row["compile_warm_s"] = round(time.time() - t0, 1)
        # Two-length timing (len, 2*len): the difference isolates the pure
        # per-token decode rate, so the per-batch fixed cost (encoder +
        # bridge + prefill + dispatch RTT) is counted ONCE in the caption
        # projection instead of 5x (advisor r4: len=10 amortization bias).
        t1s, t2s = [], []
        for _ in range(args.reps):
            t0 = time.time()
            toks, _ = generate_tokens(params, cfg, pixel_values=pixels,
                                      gen=gen)
            np.asarray(toks)
            t1s.append(time.time() - t0)
            t0 = time.time()
            toks, _ = generate_tokens(params, cfg, pixel_values=pixels,
                                      gen=gen2)
            np.asarray(toks)
            t2s.append(time.time() - t0)
        t1 = sorted(t1s)[len(t1s) // 2]
        t2 = sorted(t2s)[len(t2s) // 2]
        per_tok = max((t2 - t1) / args.len, 1e-9)
        row["ok"] = True
        row["batch_s"] = round(t1, 3)
        row["batch_2len_s"] = round(t2, 3)
        row["ms_per_token"] = round(per_tok * 1e3, 3)
        row["fixed_s"] = round(max(t1 - per_tok * args.len, 0.0), 3)
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
    ap.add_argument("--quantize", default="embedding,mlp,attn,bridge",
                    help="weight groups for the streamed build "
                         "(embedding4 packs the head table to int4 rows)")
    ap.add_argument("--mlp-int4", action="store_true",
                    help="nibble-packed int4 MLP in the stacked build — "
                         "bisect the int4 9B OOM (HBM vs VMEM attribution)")
    ap.add_argument("--single", type=int, default=None,
                    help="internal: run one layer count in-process")
    ap.add_argument("--step-timeout", type=float, default=2100.0,
                    help="per-layer-count subprocess budget (two compiled "
                         "lengths + reps at 9B widths)")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    if args.single is not None:
        single(args)
        return 0

    # the child must exercise the REAL fused path it is attributing — a
    # leaked force-jnp/bench-subproc flag would fail every layer count at
    # "stream init did not stack" and misdiagnose as a width refusal
    child_env = {k: v for k, v in os.environ.items()
                 if k not in ("VLM_BRIDGE_DEBUG_FORCE_JNP",
                              "VLM_BRIDGE_BENCH_SUBPROC",
                              "VLM_BRIDGE_DISABLE_PALLAS")}
    rows = []
    for n in [int(x) for x in args.layers.split(",")]:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--single", str(n), "--batch", str(args.batch),
               "--len", str(args.len), "--reps", str(args.reps),
               "--quantize", args.quantize] \
            + (["--mlp-int4"] if args.mlp_int4 else [])
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=args.step_timeout, cwd=REPO,
                                  env=child_env)
            row = None
            # scan from the end for the first parseable JSON object —
            # teardown/library noise after the row must not kill the
            # bisection and lose all completed rows
            for line in reversed(proc.stdout.splitlines()):
                if not line.strip():
                    continue
                try:
                    cand = json.loads(line)
                except Exception:
                    continue
                if isinstance(cand, dict) and "layers" in cand:
                    row = cand
                    break
            if row is None:
                row = {"layers": n, "ok": False,
                       "error": f"no JSON row, rc={proc.returncode}: "
                                f"{proc.stderr[-300:]}"}
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
        # weight-stream-bound decode: the PURE per-token rate (two-length
        # difference, fixed cost excluded) scales ~linearly in layers; the
        # per-batch fixed cost (encoder+bridge+prefill) also grows with
        # layers (prefill) — extrapolate both, then count fixed ONCE per
        # caption (advisor r4: the old len=10 projection counted it 5x)
        if len(passing) >= 2:
            a, b = sorted(passing, key=lambda r: r["layers"])[-2:]
            dl = b["layers"] - a["layers"]
            tok_slope = (b["ms_per_token"] - a["ms_per_token"]) / dl
            tok42 = (b["ms_per_token"] + tok_slope * (42 - b["layers"]))
            fix_slope = (b.get("fixed_s", 0.0) - a.get("fixed_s", 0.0)) / dl
            fix42 = max(
                b.get("fixed_s", 0.0) + fix_slope * (42 - b["layers"]), 0.0)
            caption_s = fix42 + tok42 / 1e3 * 50
            out["projected_42l_ms_per_token"] = round(tok42, 3)
            out["projected_42l_fixed_s"] = round(fix42, 3)
            # captions/s at the standard 50-token caption, fixed cost once
            out["projected_42l_captions_per_sec"] = round(
                args.batch / caption_s, 1)
    line = json.dumps(out)
    print(line)
    if args.output:
        with open(args.output, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

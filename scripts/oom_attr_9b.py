"""Attribute the 9B int4-recipe OOM to a quant group: embedding4 vs mlp_int4.

The r4/r5 captures of `bench.py --preset gemma2_9b --mlp-int4 --quantize
embedding4,mlp,attn,bridge` hit RESOURCE_EXHAUSTED (perf/
decode_9b_batch32_int4.json) even though the int8 layer-count bisection
(scripts/fused_9b_probe.py -> perf/fused_9b_probe.json) proved the fused
stack runs at 26 layers of full 9B widths. The int4 recipe at 2 layers
(~1 GB of weights) cannot be HBM-capacity-bound, so one of the two int4
paths must have a width-dependent memory blowup at H=3584:

  - `embedding4`: int4 rows-packed [V=256128, H] table; the greedy head
    (ops/quant.int4_matmul_t_argmax) and the embed gather unpack nibbles
    at the full hidden width.
  - `mlp_int4`: nibble-packed MLP stage inside the whole-stack decode
    kernel (ops/decode_kernels._stack_kernel), F=14336 at 9B.

This probe holds num_layers=2 (so layer-weight HBM is out of the picture)
and runs the three combinations in fresh subprocesses (after one OOM an
axon TPU client cannot allocate again):

  both  = embedding4 + mlp_int4    (the failing serving recipe)
  mlp4  = int8 embedding + mlp_int4
  emb4  = embedding4 + int8 MLP

Whichever single-group config fails names the culprit kernel.

Measured verdict (r5, TPU v5 lite): mlp4 decodes; emb4 and both OOM ->
the int4 embedding/head path is the blocker at H=3584 (it runs at 2B's
H=2304). The 9B serving recipe therefore uses int8 embedding + int4 MLP.

No reference analogue: the reference never served 9B at all
(/root/reference/src/vlm_bridge/model_architecture/language_model.py:58-75).

Usage: python scripts/oom_attr_9b.py [--batch 32] [--len 10]
       [--output perf/fused_9b_int4_probe.json]
"""

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODES = {
    "both": ("embedding4,mlp,attn,bridge", True),
    "mlp4": ("embedding,mlp,attn,bridge", True),
    "emb4": ("embedding4,mlp,attn,bridge", False),
}


def single(args) -> dict:
    """Run ONE quant mode in this process; print one JSON line."""
    import jax
    import numpy as np

    import bench
    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)

    quantize, mlp_int4 = MODES[args.single]
    cfg9 = VLMConfig.gemma2_9b()
    cfg = dataclasses.replace(
        cfg9, lm=dataclasses.replace(cfg9.lm, num_layers=args.layers))
    row = {"mode": args.single, "quantize": quantize, "mlp_int4": mlp_int4,
           "layers": args.layers, "batch": args.batch, "len": args.len}
    t0 = time.time()
    try:
        params = bench._stream_quantized_params(
            cfg, quantize, max_length=args.len, mlp_int4=mlp_int4)
        if "stacked_decode" not in params["lm"]:
            raise RuntimeError("stream init did not stack — fused "
                               "preconditions unmet at this config")
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
        row["ok"] = True
        row["decode_compile_warm_s"] = round(time.time() - t0, 1)
    except Exception as exc:  # noqa: BLE001 — the point is to record it
        row["ok"] = False
        row["error"] = f"{type(exc).__name__}: {exc}"[:300]
        traceback.print_exc(file=sys.stderr)
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--len", type=int, default=10)
    ap.add_argument("--layers", type=int, default=2,
                    help="2 keeps layer weights ~1 GB so capacity is ruled "
                         "out and any failure is width-dependent")
    ap.add_argument("--modes", default="both,mlp4,emb4")
    ap.add_argument("--output", default="perf/fused_9b_int4_probe.json")
    ap.add_argument("--single", choices=sorted(MODES), default=None,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.single:
        single(args)
        return

    rows = []
    for mode in args.modes.split(","):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--single", mode, "--batch", str(args.batch),
               "--len", str(args.len), "--layers", str(args.layers)]
        env = dict(os.environ)
        # Never inherit flags that would reroute the fused path we are
        # attributing (same hygiene as fused_9b_probe.py).
        env.pop("VLM_BRIDGE_DEBUG_FORCE_JNP", None)
        env.pop("VLM_BRIDGE_BENCH_SUBPROC", None)
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=3600, env=env, check=False)
        row = None
        for line in reversed(proc.stdout.splitlines()):
            try:
                row = json.loads(line)
                break
            except ValueError:
                continue
        if row is None:
            row = {"mode": mode, "ok": False,
                   "error": (proc.stderr.strip().splitlines() or ["no output"])[-1][:300]}
        rows.append(row)
        print(f"[attr] {json.dumps(row)}", flush=True)

    by_mode = {r["mode"]: r for r in rows}
    out = {"mode": "oom_attr_9b", "rows": rows}
    mlp_ok = by_mode.get("mlp4", {}).get("ok")
    emb_ok = by_mode.get("emb4", {}).get("ok")
    if mlp_ok and not emb_ok:
        out["diagnosis"] = (
            "int4 embedding/head path (embedding4) is the 9B OOM source: "
            "int8-embedding+int4-MLP decodes at full 9B widths while "
            "int4-embedding+int8-MLP exhausts memory even with a 2-layer "
            "stack — width-dependent (H=3584; the same path runs at 2B's "
            "H=2304), not HBM capacity. 9B serving recipe: "
            "--quantize embedding,mlp,attn,bridge --mlp-int4")
    elif emb_ok and not mlp_ok:
        out["diagnosis"] = ("int4 MLP stage is the 9B OOM source "
                            "(F=14336 width)")
    elif not (mlp_ok or emb_ok):
        out["diagnosis"] = "both int4 paths fail at 9B widths"
    else:
        out["diagnosis"] = ("both single-group configs pass at 2 layers — "
                            "the combined recipe's failure is capacity, "
                            "rerun with more layers to find the knee")
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

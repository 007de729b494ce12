"""AOT memory analysis of the fused decode program — no device memory needed.

The r5 captures hit RESOURCE_EXHAUSTED on the 42-layer 9B fused decode in
configurations whose LIVE bytes are well under the chip (int4-MLP stack
~5.2 GB total ~7.5 GB) while the jnp path runs 42 layers at ~10.5 GB live —
so the fused PROGRAM must be allocating something large beyond its
arguments (an XLA layout copy at the custom-call boundary, a non-aliased
cache, double-buffered temporaries...). The tunnel hides the allocator
message, so instead of bisecting with ~20-minute on-chip runs, this script
asks XLA directly:

  1. builds the full serving param tree as ShapeDtypeStructs via
     jax.eval_shape over the SAME builders bench uses
     (full_model.init -> quantize_layer/quantize_embedding_part ->
     stack_decode_params), so shapes/dtypes match the real program exactly;
  2. AOT-lowers inference/generate._generate_e2e (the single-dispatch
     encode+decode program bench dispatches) with those avals;
  3. compiles it (server-side; nothing is allocated on the chip) and
     prints compiled.memory_analysis(): argument/output/temp/alias bytes.

temp_size is the number that decides: argument bytes are the live params
we already know; a temp anywhere near the stacked-weight size names the
copy the allocator died on.

Usage:
  python scripts/fused_mem_analysis.py --preset gemma2_9b --layers 42 \
      --mlp-int4 --batch 32 --len 50
  python scripts/fused_mem_analysis.py --preset gemma2_9b --layers 26 \
      --batch 32 --len 10   # the config that RAN, for contrast
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_avals(cfg, quantize: str, mlp_int4: bool):
    import jax

    from vlm_bridge_tpu.models import bridge as bridge_mod
    from vlm_bridge_tpu.models import full_model, gemma2

    parts = tuple(quantize.split(",")) if quantize else ()
    lm_parts = tuple(p for p in parts if p not in ("bridge", "vision"))

    def f(k):
        p = full_model.init(cfg=cfg, rng=k)
        lm = dict(p["lm"])
        lm["embedding"] = gemma2.quantize_embedding_part(
            lm["embedding"], lm_parts)
        lm["layers"] = {n: gemma2.quantize_layer(lp, lm_parts)
                        for n, lp in lm["layers"].items()}
        lm["stacked_decode"] = gemma2.stack_decode_params(
            lm, cfg.lm, mlp_int4=mlp_int4)
        del lm["layers"]
        bridge_p = (bridge_mod.quantize_decode_params(p["bridge"])
                    if "bridge" in parts else p["bridge"])
        vision_p = p["vision"]
        if "vision" in parts:
            from vlm_bridge_tpu.models import dinov2 as dinov2_mod

            vision_p = dinov2_mod.quantize_vision_params(vision_p)
        return {"vision": vision_p, "lm": lm, "bridge": bridge_p}

    return jax.eval_shape(f, jax.random.key(0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="gemma2_9b",
                    choices=["default", "gemma2_9b"])
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--len", type=int, default=50)
    ap.add_argument("--quantize", default="embedding,mlp,attn,bridge")
    ap.add_argument("--mlp-int4", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="force a JAX backend (e.g. cpu smoke-tests the "
                         "plumbing; the Mosaic kernel then lowers in "
                         "interpret mode only if INTERPRET is set)")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu":
            os.environ.setdefault("VLM_BRIDGE_DISABLE_PALLAS", "0")

    import jax.numpy as jnp

    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.inference import generate as gen_mod
    from vlm_bridge_tpu.inference.generate import GenerationConfig

    cfg = (VLMConfig.gemma2_9b() if args.preset == "gemma2_9b"
           else VLMConfig.default())
    if args.layers is not None:
        cfg = dataclasses.replace(
            cfg, lm=dataclasses.replace(cfg.lm, num_layers=args.layers))

    t0 = time.time()
    params_av = build_avals(cfg, args.quantize, args.mlp_int4)
    gb = lambda tree: round(sum(  # noqa: E731
        x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)) / 1e9, 3)
    row = {
        "preset": args.preset, "layers": cfg.lm.num_layers,
        "batch": args.batch, "len": args.len, "quantize": args.quantize,
        "mlp_int4": args.mlp_int4,
        "param_gb": {k: gb(v) for k, v in params_av.items()},
        "stacked_gb": gb(params_av["lm"]["stacked_decode"]),
    }
    print(f"[avals] built in {time.time()-t0:.1f}s: {row['param_gb']} "
          f"(stacked {row['stacked_gb']} GB)", flush=True)

    gen = GenerationConfig(max_length=args.len, greedy=True, kv_quant=True,
                           mlp_int4=args.mlp_int4)
    pixels_av = jax.ShapeDtypeStruct(
        (args.batch, cfg.image_size, cfg.image_size, 3), jnp.bfloat16)
    rng_av = jax.eval_shape(lambda: jax.random.key(0))

    t0 = time.time()
    lowered = gen_mod._generate_e2e.lower(
        params_av, cfg, pixels_av, rng_av, gen,
        activation_dtype=jnp.bfloat16, use_fused=True, use_fused_bridge=True)
    row["lower_s"] = round(time.time() - t0, 1)
    print(f"[lower] {row['lower_s']}s", flush=True)

    t0 = time.time()
    compiled = lowered.compile()
    row["compile_s"] = round(time.time() - t0, 1)
    try:
        ma = compiled.memory_analysis()
        for name in ("argument_size_in_bytes", "output_size_in_bytes",
                     "temp_size_in_bytes", "alias_size_in_bytes",
                     "generated_code_size_in_bytes"):
            v = getattr(ma, name, None)
            if v is not None:
                row[name.replace("_in_bytes", "_gb")] = round(v / 1e9, 3)
        peak = sum(getattr(ma, n, 0) or 0 for n in (
            "argument_size_in_bytes", "output_size_in_bytes",
            "temp_size_in_bytes")) - (getattr(
                ma, "alias_size_in_bytes", 0) or 0)
        row["program_peak_gb"] = round(peak / 1e9, 3)
    except Exception as exc:  # noqa: BLE001 — backend may not support it
        row["memory_analysis_error"] = f"{type(exc).__name__}: {exc}"[:200]
    print(json.dumps(row), flush=True)
    if args.output:
        with open(args.output, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()

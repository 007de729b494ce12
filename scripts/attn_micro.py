"""Microbench: ONE flagship decoder layer's decode step, fused vs jnp.

Isolates where the fused kernel's time goes without paying the full-model
compile each iteration: scans 50 decode steps of a single layer at the 2B
shape (B=64, H=2304, 8/4 heads, D=256, S=64 cache) for each variant:

  jnp        gemma2.decode_step on a 1-layer config (int8 weights + cache)
  fused:dots current kernel (batched dot_general attention)
  fused:vpu  broadcast-reduce attention
  fused:skip attention bypassed (isolates attention cost)
  mlp-only   fused_mlp_step alone
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


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(jax.tree.leaves(x)[0])[:1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import dataclasses

    from vlm_bridge_tpu.configs import Gemma2Config
    from vlm_bridge_tpu.models import gemma2
    from vlm_bridge_tpu.ops import decode_kernels as dk

    cfg = dataclasses.replace(Gemma2Config(), num_layers=1)
    B, T = args.batch, args.steps
    params = gemma2.init(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    qparams = gemma2.quantize_params(params, parts=("mlp", "attn"))
    lp = qparams["layers"]["0"]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(0, 1, (B, cfg.hidden_size)), jnp.bfloat16)

    results = {}
    traced = []  # (name, compiled fn, args) — replayed inside ONE trace

    def timed(name, fn, *fn_args):
        fn.__name__ = f"scan_{name}"  # distinct XLA module names
        f = jax.jit(fn)
        try:
            fence(f(*fn_args))
        except Exception as e:
            results[name] = f"FAIL: {str(e).splitlines()[0][:120]}"
            print(f"{name}: FAILED {str(e).splitlines()[0][:160]}",
                  file=sys.stderr)
            return
        best = []
        for _ in range(args.reps):
            t0 = time.time()
            fence(f(*fn_args))
            best.append(time.time() - t0)
        ms = sorted(best)[len(best) // 2] * 1000
        results[name] = round(ms / args.steps, 4)  # ms per step
        print(f"{name}: {results[name]} ms/step (wall)", file=sys.stderr)
        traced.append((name, f, fn_args))

    # jnp reference: full decode_step of the 1-layer model
    def jnp_scan(x):
        cache = gemma2.KVCache.zeros(cfg, B, 64, jnp.int8)

        def step(carry, t):
            x, cache = carry
            h, cache = gemma2.decode_step(
                qparams, cfg, x[:, None, :], cache, position=t)
            return (h[:, 0].astype(x.dtype), cache), ()

        (xf, _), _ = jax.lax.scan(step, (x, cache), jnp.arange(T))
        return xf

    timed("jnp_layer", jnp_scan, x0)

    # fused attention+mlp at each ATTN_MODE
    def make_fused():
        def fused_scan(x):
            cache = gemma2.FusedKVCache.zeros(cfg, B, 64)

            def step(carry, t):
                x, cache = carry
                h, cache = gemma2.decode_step_fused(
                    qparams, cfg, x[:, None, :], cache, t)
                return (h[:, 0].astype(x.dtype), cache), ()

            (xf, _), _ = jax.lax.scan(step, (x, cache), jnp.arange(T))
            return xf
        return fused_scan

    for mode in ("dots", "dots2", "vpu", "skip"):
        dk.ATTN_MODE = mode
        timed(f"fused_{mode}", make_fused(), x0)
    dk.ATTN_MODE = "dots"

    # MLP kernel alone
    def mlp_scan(x):
        def step(x, _):
            y = dk.fused_mlp_step(
                x, lp["mlp"]["gate"], lp["mlp"]["up"], lp["mlp"]["down"],
                lp["pre_ffn_norm"], lp["post_ffn_norm"], eps=cfg.rms_norm_eps)
            return y.astype(x.dtype), ()

        xf, _ = jax.lax.scan(step, x, jnp.arange(T))
        return xf

    timed("mlp_only", mlp_scan, x0)

    # raw int8 matmuls (qkv + o) alone — the old path's launch pair
    from vlm_bridge_tpu.ops.quant import int8_matmul

    def mm_scan(x):
        def step(x, _):
            y = int8_matmul(x, lp["attn"]["qkv"])
            z = int8_matmul(y[:, :2048].astype(x.dtype), lp["attn"]["o"])
            return z.astype(x.dtype), ()

        xf, _ = jax.lax.scan(step, x, jnp.arange(T))
        return xf

    timed("qkv_o_matmuls", mm_scan, x0)

    # one trace, all variants interleaved — module device times are the
    # trustworthy comparison on the throttling-prone tunnel
    trace_dir = "/tmp/attn_micro_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            for name, f, fn_args in traced:
                fence(f(*fn_args))

    try:
        import collections
        import glob

        from xplane_ops import load_xspace

        path = sorted(glob.glob(trace_dir + "/**/*.xplane.pb",
                                recursive=True))[-1]
        agg = collections.defaultdict(lambda: [0, 0])
        for plane in load_xspace(path).planes:
            if "TPU" not in plane.name:
                continue
            ev_names = dict(plane.event_metadata.items())
            for line in plane.lines:
                if line.name != "XLA Modules":
                    continue
                for ev in line.events:
                    md = ev_names.get(ev.metadata_id)
                    n = (md.name if md else "?").split("(")[0]
                    agg[n][0] += ev.duration_ps
                    agg[n][1] += 1
        device = {n.replace("jit_scan_", ""): round(ps / 1e9 / c / args.steps, 4)
                  for n, (ps, c) in agg.items() if "scan_" in n}
    except Exception as e:  # pragma: no cover
        device = {"error": str(e)[:200]}

    print(json.dumps({"batch": B, "per_step_ms_wall": results,
                      "per_step_ms_device": device}))


if __name__ == "__main__":
    main()

"""Decode cost ladder: where each ms of the serving step goes.

Times successively larger slices of the batched decode loop on the real
chip, so optimization effort lands where the bytes/launches actually are:

  1. lm-scan       : Gemma decode_step only (qkv/attn/mlp + cache writes)
  2. +lm_head      : + tied-embedding logits (the 590M-row matmul)
  3. +sampling     : + greedy argmax / top-p over the 256k logits
  4. +bridge       : the full production `_generate_fast` (adds the causal
                     bridge decode step) == bench.py's decode path

Each level is a single jitted `lax.scan` over `--len` tokens, fenced by a
host readback. Prints one JSON line per level.

Usage: python scripts/decode_ladder.py [--batch 32] [--len 50]
       [--quantize embedding,mlp,attn] [--reps 3]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _fence(x):
    # Fence on a SCALAR that depends on the output — device_get of a large
    # array would add a multi-MB host transfer (the axon tunnel) to the
    # measurement.
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def time_fn(fn, *args, reps=3):
    out = fn(*args)
    _fence(out)  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        _fence(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--len", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quantize", default="embedding,mlp,attn")
    args = ap.parse_args()

    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)
    from vlm_bridge_tpu.models import full_model, gemma2

    cfg = VLMConfig.default()
    lm_cfg = cfg.lm
    B, T = args.batch, args.len
    L = T + 1

    params = full_model.init(jax.random.key(0), cfg)
    if args.quantize:
        parts = args.quantize.split(",")
        lm_parts = tuple(p for p in parts if p != "bridge")
        if lm_parts:
            params["lm"] = gemma2.quantize_params(params["lm"], parts=lm_parts)
        if "bridge" in parts:
            from vlm_bridge_tpu.models import bridge

            params["bridge"] = bridge.quantize_decode_params(params["bridge"])
    lm = params["lm"]

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.normal(0, 1, (B, cfg.image_size, cfg.image_size, 3)), jnp.bfloat16)
    vision = full_model.encode_image_jit(params, cfg, pixels)
    _fence(vision)

    embed0 = jnp.asarray(
        rng.normal(0, 1, (B, 1, lm_cfg.hidden_size)), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def lm_scan(lm, embed0, mode):
        cache = gemma2.KVCache.zeros(lm_cfg, B, L, dtype=jnp.bfloat16)

        def step(carry, t):
            embed, cache = carry
            hidden, cache = gemma2.decode_step(
                lm, lm_cfg, embed, cache, position=t)
            if mode == "lm":
                # feed hidden back as next embed (keeps the dataflow honest
                # without touching the lm_head)
                return (hidden.astype(embed.dtype), cache), hidden[:, 0, :8]
            logits = gemma2.logits_from_hidden(lm, lm_cfg, hidden)[:, 0]
            if mode == "lm+head":
                nxt = logits[:, :1].astype(jnp.int32)[:, 0] % lm_cfg.vocab_size
            else:  # lm+head+sample
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            embed = gemma2.embed(lm, nxt[:, None]).astype(embed.dtype)
            return (embed, cache), nxt

        (_, cache), out = jax.lax.scan(
            step, (embed0, cache), jnp.arange(T))
        return out

    results = {}
    for mode in ("lm", "lm+head", "lm+head+sample"):
        dt = time_fn(lambda l, e: lm_scan(l, e, mode), lm, embed0,
                     reps=args.reps)
        results[mode] = dt

    gen = GenerationConfig(max_length=T, greedy=True)
    dt_full = time_fn(
        lambda: generate_tokens(params, cfg, vision_features=vision, gen=gen)[0],
        reps=args.reps)
    results["full(+bridge)"] = dt_full

    dt_vit = time_fn(
        lambda: full_model.encode_image_jit(params, cfg, pixels),
        reps=args.reps)
    results["vit-encode"] = dt_vit

    dt_bench = time_fn(
        lambda: generate_tokens(params, cfg, pixel_values=pixels, gen=gen)[0],
        reps=args.reps)
    results["bench(pixels)"] = dt_bench

    prev = 0.0
    for name, dt in results.items():
        print(json.dumps({
            "level": name,
            "batch_time_ms": round(1000 * dt, 2),
            "step_ms": round(1000 * dt / T, 3),
            "delta_ms_per_step": round(1000 * (dt - prev) / T, 3),
            "captions_per_sec": round(B / dt, 1),
        }))
        prev = dt


if __name__ == "__main__":
    main()

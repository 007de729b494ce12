"""Same-process A/B: S=512 masked training step, flash kernel vs XLA attention.

The 512 pad-bucket is the flash kernel's only production-qualifying shape
(dispatch S >= VLM_BRIDGE_FLASH_MIN_S = 512); round 2 wired per-row
kv_lengths through but never measured it on chip (round-2 verdict weak #1).
This runs the REAL train step (fwd+bwd, bs=8, bucket 512, ragged right-pad
masks) twice — flash on vs VLM_BRIDGE_DISABLE_PALLAS=1 (at train time flash
is the ONLY Pallas consumer) — with interleaved reps.

Usage: python scripts/flash512_ab.py [--batch 8] [--reps 5] [--steps 3]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--steps", type=int, default=3,
                    help="train steps per timed rep")
    args = ap.parse_args()

    from vlm_bridge_tpu.configs import TrainingConfig, VLMConfig
    from vlm_bridge_tpu.models import full_model
    from vlm_bridge_tpu.training.train_step import (
        TrainState, init_train_state, make_schedule, make_train_step,
        split_frozen)

    cfg = VLMConfig.default()
    tc = TrainingConfig(batch_size=args.batch, loss_chunk_size=128)
    B, L = args.batch, args.seq

    params = full_model.init(jax.random.key(0), cfg)
    state, opt = init_train_state(params, tc, steps_per_epoch=100)
    frozen = split_frozen(params)
    schedule = make_schedule(tc, 100)

    rng = np.random.default_rng(0)
    lengths = rng.integers(L * 3 // 4, L + 1, B)  # ragged right-pad, realistic
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.int32)
    batch = {
        "pixel_values": jnp.asarray(rng.integers(
            0, 256, (B, cfg.image_size, cfg.image_size, 3), np.uint8)),
        "input_ids": jnp.asarray(
            rng.integers(3, cfg.lm.vocab_size, (B, L)).astype(np.int32)),
        "attn_mask": jnp.asarray(mask),
    }
    base_rng = jax.random.key(1)

    def fence(s):
        leaf = jax.tree.leaves(s.bridge_params)[0]
        np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))

    def build(disable):
        if disable:
            os.environ["VLM_BRIDGE_DISABLE_PALLAS"] = "1"
        else:
            os.environ.pop("VLM_BRIDGE_DISABLE_PALLAS", None)
        step = jax.jit(make_train_step(cfg, tc, opt, schedule),
                       donate_argnums=())
        s, m = step(state, frozen, batch, base_rng)  # traces NOW (env read)
        fence(s)
        return step, float(jax.device_get(m["loss"]))

    t0 = time.time()
    step_xla, loss_xla = build(True)
    print(f"xla compile {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    step_flash, loss_flash = build(False)
    print(f"flash compile {time.time()-t0:.0f}s", file=sys.stderr)

    times = {"xla": [], "flash": []}
    for _ in range(args.reps):
        for name, step in (("xla", step_xla), ("flash", step_flash)):
            s = state
            t0 = time.time()
            for _ in range(args.steps):
                s, m = step(s, frozen, batch, base_rng)
            float(jax.device_get(m["loss"]))
            times[name].append((time.time() - t0) / args.steps)

    med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
    print(json.dumps({
        "batch": B, "seq": L,
        "xla_step_ms": round(med["xla"] * 1000, 1),
        "flash_step_ms": round(med["flash"] * 1000, 1),
        "xla_samples_per_sec": round(B / med["xla"], 2),
        "flash_samples_per_sec": round(B / med["flash"], 2),
        "flash_speedup": round(med["xla"] / med["flash"], 3),
        "loss_delta": abs(loss_xla - loss_flash),
        "all_step_s": {k: [round(t, 4) for t in v] for k, v in times.items()},
    }))


if __name__ == "__main__":
    main()

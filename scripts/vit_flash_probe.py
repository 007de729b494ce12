"""Measure DINOv2 encode (batch 32) with and without the flash kernel.

Run in separate processes (env var is read at trace time):
  python scripts/vit_flash_probe.py            # XLA attention path
  VLM_BRIDGE_FLASH_MIN_S=128 python scripts/vit_flash_probe.py   # flash path
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vlm_bridge_tpu.configs import VLMConfig
from vlm_bridge_tpu.models import full_model


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = VLMConfig.default()
    params = full_model.init(jax.random.key(0), cfg)
    pixels = jnp.asarray(
        np.random.default_rng(0).normal(
            0, 1, (batch, cfg.image_size, cfg.image_size, 3)), jnp.bfloat16)

    def fence(x):
        np.asarray(jax.device_get(jnp.ravel(x)[:1]))

    out = full_model.encode_image_jit(params, cfg, pixels)
    fence(out)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = full_model.encode_image_jit(params, cfg, pixels)
        fence(out)
    dt = (time.time() - t0) / reps
    print(json.dumps({
        "flash_min_s": os.environ.get("VLM_BRIDGE_FLASH_MIN_S", "512"),
        "batch": batch,
        "encode_ms": round(1000 * dt, 2),
        "mean_abs": float(jnp.mean(jnp.abs(out.astype(jnp.float32)))),
    }))


if __name__ == "__main__":
    main()

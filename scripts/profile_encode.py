"""Capture a jax.profiler trace of DINOv2 encode and print per-op HLO times.

Usage: python scripts/profile_encode.py [batch] [out_dir]
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vlm_bridge_tpu.configs import VLMConfig
from vlm_bridge_tpu.models import full_model


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vit_trace"
    cfg = VLMConfig.default()
    params = full_model.init(jax.random.key(0), cfg)
    pixels = jnp.asarray(
        np.random.default_rng(0).normal(
            0, 1, (batch, cfg.image_size, cfg.image_size, 3)), jnp.bfloat16)

    def fence(x):
        np.asarray(jax.device_get(jnp.ravel(x)[:1]))

    fence(full_model.encode_image_jit(params, cfg, pixels))  # compile
    with jax.profiler.trace(out):
        for _ in range(3):
            fence(full_model.encode_image_jit(params, cfg, pixels))

    paths = glob.glob(os.path.join(out, "**", "*.xplane.pb"), recursive=True)
    print("trace files:", paths)
    if not paths:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats^", {})
    rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    # framework_op_stats returns a JSON table; print top ops by total time
    try:
        table = rows[0]
        cols = [c["label"] for c in table["cols"]]
        print("COLS:", cols)
        for r in table["rows"][:40]:
            print([c.get("v") for c in r["c"]])
    except Exception:
        print(str(rows)[:4000])


if __name__ == "__main__":
    main()

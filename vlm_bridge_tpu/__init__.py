"""vlm_bridge_tpu — TPU-native (JAX/XLA/Pallas/pjit) Encoder-Adapter-Decoder
image-captioning framework.

A brand-new implementation of the capabilities of
`AsherJingkongChen/vlm-bridge-for-image-captioning` (reference mounted read-only at
/root/reference), designed mesh-first for TPU:

- frozen DINOv2-large vision encoder  (`models/dinov2.py`)
- frozen Gemma-2-2B language model    (`models/gemma2.py`)
- trainable "Bridge-Lite" cross-attention adapter (`models/bridge.py`)
- bridge-only AdamW training over a device mesh (`training/`)
- `lax.scan` KV-cache caption decoding (`inference/`)
- Pallas flash-attention kernels for the hot ops (`ops/`)
- GroundCap data pipeline + `vlm-data` / `vlm-training` CLIs (`data/`, `training/cli.py`)

Everything is functional JAX: parameters are pytrees (nested dicts of jnp arrays),
model code is pure `apply(params, cfg, ...)` functions, and all hot paths compile
under `jax.jit`/`pjit` with static shapes.
"""

__version__ = "0.1.0"

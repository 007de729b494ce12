"""Image preprocessing.

Host side (PIL): decode, resize shortest edge to 256 (bicubic), center-crop
224 — matching the DINOv2 image processor (HF BitImageProcessor defaults with
facebook/dinov2-large's shortest_edge=256/crop=224), which the reference
applies inside its collate function (data_loader.py:133-150).

Device side (jit): uint8 -> rescale 1/255 -> ImageNet normalize, fused into
the forward pass. Keeping the normalize on device halves host->device
bandwidth (uint8 vs f32) — the TPU-native answer to the reference's
host-side processor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet-standard stats used by the DINOv2 processor
IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)
RESIZE_EDGE = 256
CROP_SIZE = 224


def host_resize_crop(img, *, crop: int = CROP_SIZE, edge: int = RESIZE_EDGE) -> np.ndarray:
    """PIL image -> uint8 [crop, crop, 3] (RGB, resized + center-cropped)."""
    from PIL import Image

    if img.mode != "RGB":
        img = img.convert("RGB")
    w, h = img.size
    if w <= h:
        nw, nh = edge, max(1, round(h * edge / w))
    else:
        nh, nw = edge, max(1, round(w * edge / h))
    img = img.resize((nw, nh), Image.BICUBIC)
    left = (nw - crop) // 2
    top = (nh - crop) // 2
    img = img.crop((left, top, left + crop, top + crop))
    return np.asarray(img, np.uint8)


@functools.partial(jax.jit, static_argnames=("dtype",))
def normalize_on_device(pixels_u8: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """[B, H, W, 3] uint8 -> normalized dtype tensor (device-side, fusable)."""
    mean = jnp.asarray(IMAGE_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGE_STD, jnp.float32) * 255.0
    x = (pixels_u8.astype(jnp.float32) - mean) / std
    return x.astype(dtype)


def pad_to_batch(x: np.ndarray, batch_size: int) -> np.ndarray:
    """Pad a partial batch to the static jit batch size by repeating row 0
    (callers slice results back to the real count)."""
    if x.shape[0] >= batch_size:
        return x
    reps = np.repeat(x[:1], batch_size - x.shape[0], axis=0)
    return np.concatenate([x, reps], axis=0)


def preprocess_numpy(images) -> np.ndarray:
    """List of PIL images -> normalized f32 [B, 224, 224, 3] (host fallback,
    used where a device round-trip is not wanted, e.g. tests)."""
    arr = np.stack([host_resize_crop(im) for im in images]).astype(np.float32)
    mean = np.asarray(IMAGE_MEAN, np.float32) * 255.0
    std = np.asarray(IMAGE_STD, np.float32) * 255.0
    return (arr - mean) / std

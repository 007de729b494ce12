"""`vlm-caption` CLI: caption arbitrary images (file / directory / glob).

The practical serving surface: batched KV-cache decode over ad-hoc images,
JSONL or console output. The reference's closest path is running
`debug_generation.py` one image at a time with full no-cache re-forwards
(reference: debug_generation.py:328-386, full_model.py:191-386).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def collect_images(spec: str) -> List[Path]:
    import glob as _glob

    p = Path(spec)
    if p.is_dir():
        return sorted(q for q in p.rglob("*") if q.suffix.lower() in IMAGE_EXTS)
    if p.exists():
        return [p]
    matches = sorted(Path(m) for m in _glob.glob(spec, recursive=True))
    return [m for m in matches if m.suffix.lower() in IMAGE_EXTS]


def caption_images(
    params, cfg, tokenizer, image_paths: List[Path], *,
    batch_size: int = 32, gen=None, activation_dtype=None,
    rng=None, mesh=None,
) -> List[dict]:
    """Caption a list of image files; returns [{"image", "caption"}...]."""
    from PIL import Image

    from vlm_bridge_tpu.data.preprocess import (
        CROP_SIZE, RESIZE_EDGE, host_resize_crop, normalize_on_device,
        pad_to_batch)
    from vlm_bridge_tpu.inference.generate import GenerationConfig, generate_tokens
    from vlm_bridge_tpu.inference.robust import decode_captions

    if gen is None:
        gen = GenerationConfig(max_length=50, greedy=True, early_stop=True)
    from vlm_bridge_tpu.inference.generate import resolve_activation_dtype

    activation_dtype = resolve_activation_dtype(activation_dtype, gen)
    if rng is None:
        rng = jax.random.key(0)

    results = []
    for start in range(0, len(image_paths), batch_size):
        chunk = image_paths[start: start + batch_size]
        arrs = []
        crop = cfg.image_size
        edge = max(crop, round(crop * RESIZE_EDGE / CROP_SIZE))
        for path in chunk:
            with Image.open(path) as img:
                arrs.append(host_resize_crop(img.convert("RGB"),
                                             crop=crop, edge=edge))
        pixels_np = np.stack(arrs)
        real = pixels_np.shape[0]
        pixels_np = pad_to_batch(pixels_np, batch_size)
        pixels = normalize_on_device(
            jnp.asarray(pixels_np), dtype=activation_dtype)
        toks, lens = generate_tokens(
            params, cfg, pixel_values=pixels,
            rng=jax.random.fold_in(rng, start), gen=gen,
            activation_dtype=activation_dtype, mesh=mesh)
        texts = decode_captions(tokenizer, np.asarray(toks)[:real],
                                np.asarray(lens)[:real])
        results.extend(
            {"image": str(p), "caption": t} for p, t in zip(chunk, texts))
    return results


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        prog="vlm-caption", description="caption images (file/dir/glob)")
    ap.add_argument("images", help="image file, directory, or glob")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--max-length", type=int, default=50)
    ap.add_argument("--greedy", action="store_true", default=True)
    ap.add_argument("--sample", dest="greedy", action="store_false")
    ap.add_argument("--temperature", type=float, default=0.7)
    ap.add_argument("--top-p", type=float, default=0.9)
    ap.add_argument("--output", default=None, help="write JSONL here (else stdout)")
    from vlm_bridge_tpu.tools.loading import (
        add_model_args, apply_platform, load_from_args, mesh_from_args)

    add_model_args(ap)
    args = ap.parse_args(argv)
    apply_platform(args)

    paths = collect_images(args.images)
    if not paths:
        print(f"no images found for {args.images!r}", file=sys.stderr)
        return 1

    from vlm_bridge_tpu.inference.generate import GenerationConfig

    cfg, params, tokenizer = load_from_args(args)
    mesh, params = mesh_from_args(args, params)

    # with a quantized LM the int8-KV fused whole-stack decode is the
    # serving recipe (bench.py's measured configuration); kv_quant is
    # quality-neutral at caption lengths (DESIGN.md §2)
    kv_quant = bool(args.quantize)
    gen = GenerationConfig(
        max_length=args.max_length, greedy=args.greedy,
        temperature=args.temperature, top_p=args.top_p, early_stop=True,
        kv_quant=kv_quant)
    from vlm_bridge_tpu.tools.loading import prestack_decode_params

    params = prestack_decode_params(params, cfg, gen, mesh=mesh)
    t0 = time.time()
    batch_size = args.batch_size if mesh else min(args.batch_size, len(paths))
    results = caption_images(
        params, cfg, tokenizer, paths, batch_size=batch_size, gen=gen,
        mesh=mesh)
    dt = time.time() - t0

    out = open(args.output, "w") if args.output else sys.stdout
    try:
        for r in results:
            out.write(json.dumps(r) + "\n")
    finally:
        if args.output:
            out.close()
            print(f"{len(results)} captions -> {args.output} "
                  f"({len(results) / dt:.2f} captions/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

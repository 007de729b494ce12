"""Host-side data-path benchmark: JPEG-decode loader vs the pixel cache.

Measures what the (single-core) serving host can feed the chip: BatchLoader
throughput over a synthetic on-disk split, cold (per-image JPEG decode +
bicubic resize, the reference's per-epoch behavior — reference
data_loader.py:118-125) vs warm (`vlm-data precache` memmap sidecar).
Pure host benchmark — no accelerator, no jax; runs anywhere.

Usage: python scripts/host_loader_bench.py [--num-samples 640] [--batch 64]
       [--output perf/host_loader_pixel_cache.json]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sweep(loader, batch: int, reps: int) -> dict:
    best = None
    for _ in range(reps):
        t0 = time.time()
        n = 0
        for b in loader:
            n += b["pixel_values"].shape[0]
        dt = time.time() - t0
        if best is None or dt < best[1]:
            best = (n, dt)
    n, dt = best
    return {"samples": n, "seconds": dt, "samples_per_s": n / dt,
            "ms_per_batch": dt / (n / batch) * 1e3}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-samples", type=int, default=640)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    from vlm_bridge_tpu.data.groundcap import make_synthetic_dataset
    from vlm_bridge_tpu.data.loader import BatchLoader, VLDataset
    from vlm_bridge_tpu.data.pixel_cache import build_pixel_cache
    from vlm_bridge_tpu.data.tokenizer import ByteTokenizer

    workdir = args.workdir or tempfile.mkdtemp(prefix="vlm-hostbench-")
    cleanup = args.workdir is None
    try:
        make_synthetic_dataset(workdir, num_samples=args.num_samples,
                               image_size=args.image_size, seed=1)
        tok = ByteTokenizer()

        cold_ds = VLDataset(workdir, "train", pixel_cache="off")
        cold = _sweep(BatchLoader(cold_ds, batch_size=args.batch,
                                  tokenizer=tok, shuffle=False,
                                  drop_last=False), args.batch, args.reps)

        t0 = time.time()
        build_pixel_cache(cold_ds, verbose=False)
        t_build = time.time() - t0

        warm_ds = VLDataset(workdir, "train")
        assert warm_ds.pixels is not None, "cache did not attach"
        warm = _sweep(BatchLoader(warm_ds, batch_size=args.batch,
                                  tokenizer=tok, shuffle=False,
                                  drop_last=False), args.batch, args.reps)

        result = {
            "metric": "host_loader_samples_per_s",
            "value": warm["samples_per_s"],
            "unit": "samples/s",
            "batch": args.batch,
            "image_size": args.image_size,
            "jpeg_decode_path": cold,
            "pixel_cache_path": warm,
            "cache_build_s": t_build,
            "speedup": warm["samples_per_s"] / cold["samples_per_s"],
            "cpu_count": os.cpu_count(),
            "note": ("cold = per-image JPEG decode + bicubic resize (the "
                     "reference's per-epoch path); warm = vlm-data precache "
                     "memmap. Best of reps (page cache warm)."),
        }
        print(json.dumps(result))
        if args.output:
            with open(args.output, "w") as f:
                json.dump(result, f, indent=2)
    finally:
        if cleanup:
            shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

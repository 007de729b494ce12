"""captions.jsonl dataset + fixed-shape batch loader with background prefetch.

Replaces the reference's torch `VLDataset`/`DataLoader`
(reference: src/vlm_bridge/data_pipeline/data_loader.py:28-272) with a
dependency-free loader designed for jit-compiled consumers:

- batches are padded to STATIC length buckets (no per-batch dynamic padding,
  which would trigger XLA recompilation per shape)
- images ship to the device as uint8 NHWC; normalization happens on device
  (data/preprocess.py)
- a thread pool decodes/crops JPEGs and a bounded queue prefetches batches
  ahead of the training step (the reference used 4 fork-based workers)
"""

from __future__ import annotations

import json
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from vlm_bridge_tpu.data.preprocess import host_resize_crop
from vlm_bridge_tpu.data.tokenizer import batch_encode, get_tokenizer


class VLDataset:
    """Reads <data_dir>/<split>/captions.jsonl; skips malformed lines
    (reference data_loader.py:83-100)."""

    def __init__(self, data_dir: str | Path, split: str,
                 pixel_cache: str = "auto"):
        self.root = Path(data_dir) / split
        manifest = self.root / "captions.jsonl"
        if not manifest.exists():
            raise FileNotFoundError(f"missing manifest: {manifest}")
        self.samples: List[dict] = []
        skipped = 0
        with open(manifest) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                    if "image_path" not in rec or "caption" not in rec:
                        raise KeyError("missing fields")
                except (json.JSONDecodeError, KeyError):
                    skipped += 1
                    continue
                self.samples.append(rec)
        if skipped:
            print(f"VLDataset[{split}]: skipped {skipped} malformed lines")
        # pre-decoded uint8 pixel memmap (data/pixel_cache.py): a stale or
        # absent cache silently falls back to per-image JPEG decode
        self.pixels = None
        if pixel_cache == "auto":
            from vlm_bridge_tpu.data.pixel_cache import try_attach

            self.pixels = try_attach(self.root, self.samples)

    def __len__(self) -> int:
        return len(self.samples)

    def load_image(self, idx: int) -> np.ndarray:
        """uint8 [224, 224, 3] resized/cropped RGB (memmap row if a pixel
        cache is attached; JPEG decode otherwise)."""
        if self.pixels is not None:
            return self.pixels[idx]
        return self.decode_image(idx)

    def decode_image(self, idx: int) -> np.ndarray:
        """uint8 [224, 224, 3]: JPEG decode + resize/crop (cache-independent)."""
        from PIL import Image

        rec = self.samples[idx]
        with Image.open(self.root / rec["image_path"]) as img:
            return host_resize_crop(img)

    def caption(self, idx: int) -> str:
        return self.samples[idx]["caption"]


class BatchLoader:
    """Iterable over fixed-shape batches with background prefetch.

    Yields dicts: pixel_values (uint8 [B,224,224,3]), input_ids, attn_mask
    (int32 [B, L_bucket]), captions (list of str).
    Drops the trailing partial batch (static shapes under jit).
    """

    def __init__(
        self,
        dataset: VLDataset,
        *,
        batch_size: int,
        tokenizer=None,
        max_text_len: int = 512,
        buckets: Sequence[int] = (64, 128, 256, 512),
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.tokenizer = tokenizer or get_tokenizer()
        self.max_text_len = max_text_len
        self.buckets = tuple(buckets)
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.ds) // self.batch_size
        if not self.drop_last and len(self.ds) % self.batch_size:
            n += 1
        return n

    def first_batch(self) -> Optional[Dict]:
        """One (unshuffled) batch without spinning up the prefetch thread.

        The per-epoch validation sampler only needs the first batch;
        `next(iter(loader))` abandons the generator and leaks its producer
        thread until GC. Returns None if the dataset is empty.
        """
        idxs = list(range(min(self.batch_size, len(self.ds))))
        if not idxs:
            return None
        return self._make_batch(idxs, None)

    def _make_batch(self, idxs: List[int], pool: Optional[ThreadPoolExecutor]) -> Dict:
        if self.ds.pixels is not None:
            # pixel cache attached: one fancy-index gather beats 64
            # per-row reads + np.stack (21 vs 28 ms/batch64 measured)
            pixels = np.asarray(self.ds.pixels[np.asarray(idxs)])
        else:
            mapper = pool.map if pool is not None else map
            pixels = np.stack(list(mapper(self.ds.load_image, idxs)))
        captions = [self.ds.caption(i) for i in idxs]
        ids, mask = batch_encode(
            self.tokenizer, captions, self.max_text_len, self.buckets)
        return {
            "pixel_values": pixels,
            "input_ids": ids,
            "attn_mask": mask,
            "captions": captions,
        }

    def __iter__(self) -> Iterator[Dict]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1

        batches = [
            order[i: i + self.batch_size].tolist()
            for i in range(0, len(order), self.batch_size)
        ]
        if batches and len(batches[-1]) < self.batch_size and self.drop_last:
            batches.pop()

        if self.num_workers <= 0:
            # synchronous path (torch DataLoader num_workers=0 semantics)
            for idxs in batches:
                yield self._make_batch(idxs, None)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for idxs in batches:
                        if stop.is_set():
                            return
                        q.put(self._make_batch(idxs, pool))
                q.put(None)
            except BaseException as e:  # surface in the consumer, don't hang it
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def get_data_loaders(
    data_dir: str | Path,
    *,
    batch_size: int,
    tokenizer=None,
    max_text_len: int = 512,
    buckets: Sequence[int] = (64, 128, 256, 512),
    num_workers: int = 4,
    seed: int = 0,
):
    """(train_loader, val_loader, test_loader) — reference get_data_loaders
    parity (data_loader.py:204-272, which returns all three splits).

    test_loader is None when the split directory has no manifest (synthetic
    fixtures often materialize train/val only); train and val are required.
    """
    train = BatchLoader(
        VLDataset(data_dir, "train"), batch_size=batch_size,
        tokenizer=tokenizer, max_text_len=max_text_len, buckets=buckets,
        shuffle=True, seed=seed, num_workers=num_workers)
    val = BatchLoader(
        VLDataset(data_dir, "val"), batch_size=batch_size,
        tokenizer=tokenizer, max_text_len=max_text_len, buckets=buckets,
        shuffle=False, num_workers=num_workers,
        # keep the tail: dropping it can empty a small val split entirely
        # (one extra jit shape at eval time is the cheaper failure mode)
        drop_last=False)
    test = None
    if (Path(data_dir) / "test" / "captions.jsonl").exists():
        test = BatchLoader(
            VLDataset(data_dir, "test"), batch_size=batch_size,
            tokenizer=tokenizer, max_text_len=max_text_len, buckets=buckets,
            shuffle=False, num_workers=num_workers, drop_last=False)
    return train, val, test


def inspect_data_loader(loader: BatchLoader, num_batches: int = 2) -> None:
    """Print batch shapes/stats (reference inspect_data_loader,
    data_loader.py:275-346)."""
    for i, batch in enumerate(loader):
        if i >= num_batches:
            break
        print(f"batch {i}: pixels {batch['pixel_values'].shape} "
              f"{batch['pixel_values'].dtype}, ids {batch['input_ids'].shape}, "
              f"real tokens {batch['attn_mask'].sum()}, "
              f"caption[0]: {batch['captions'][0][:60]!r}")

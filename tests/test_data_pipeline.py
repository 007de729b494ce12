"""Data pipeline tests: synthetic GroundCap-layout build, manifests, loader
batching/bucketing/prefetch, tokenizer contract, device preprocessing.
(Reference test idioms: tiny real files on disk, skip-free hermetic runs.)
"""

import json

import numpy as np
import pytest

from vlm_bridge_tpu.data import groundcap
from vlm_bridge_tpu.data.loader import BatchLoader, VLDataset, get_data_loaders
from vlm_bridge_tpu.data.preprocess import (
    host_resize_crop, normalize_on_device, preprocess_numpy)
from vlm_bridge_tpu.data.tokenizer import ByteTokenizer, batch_encode


def test_clean_caption():
    raw = '<gdo id="1">A man</gdo> walks  the <gda x="2">dog</gda>.'
    assert groundcap.clean_caption(raw) == "A man walks the dog."


def test_split_bounds_match_reference_math():
    # 52,350 GroundCap samples -> 41,880 / 1,047 / 9,423 (README.md:55-66)
    b = groundcap.split_bounds(52350)
    assert b["train"] == (0, 41880)
    assert b["val"] == (41880, 42927)
    assert b["test"] == (42927, 52350)
    assert 42927 - 41880 == 1047


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("groundcap")
    counts = groundcap.make_synthetic_dataset(d, num_samples=25, image_size=64)
    assert counts == {"train": 20, "val": 0, "test": 5} or counts["train"] == 20
    return d


def test_dataset_layout(synth_dir):
    for split in ("train", "test"):
        manifest = synth_dir / split / "captions.jsonl"
        assert manifest.exists()
        with open(manifest) as f:
            recs = [json.loads(l) for l in f]
        for r in recs:
            assert set(r) == {"image_path", "caption", "original_id"}
            assert (synth_dir / split / r["image_path"]).exists()
            assert "<" not in r["caption"]  # tags stripped


def test_vldataset_skips_malformed(synth_dir):
    manifest = synth_dir / "train" / "captions.jsonl"
    original = manifest.read_text()
    try:
        manifest.write_text(original + "not json\n" + '{"caption": "no image"}\n')
        ds = VLDataset(synth_dir, "train")
        assert len(ds) == 20
        img = ds.load_image(0)
        assert img.shape == (224, 224, 3) and img.dtype == np.uint8
    finally:
        manifest.write_text(original)


def test_batch_loader_shapes_and_buckets(synth_dir):
    tok = ByteTokenizer()
    loader = BatchLoader(
        VLDataset(synth_dir, "train"), batch_size=8, tokenizer=tok,
        max_text_len=256, buckets=(64, 128, 256), num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # 20 // 8, drop_last
    for b in batches:
        assert b["pixel_values"].shape == (8, 224, 224, 3)
        assert b["pixel_values"].dtype == np.uint8
        assert b["input_ids"].shape[1] in (64, 128, 256)
        assert b["input_ids"].shape == b["attn_mask"].shape
        # BOS first, mask marks real tokens
        assert (b["input_ids"][:, 0] == tok.bos_token_id).all()
        lens = b["attn_mask"].sum(axis=1)
        for i, L in enumerate(lens):
            assert (b["input_ids"][i, L:] == tok.pad_token_id).all()


def test_loader_shuffles_between_epochs(synth_dir):
    loader = BatchLoader(
        VLDataset(synth_dir, "train"), batch_size=4, shuffle=True,
        num_workers=1)
    first = [b["captions"] for b in loader]
    second = [b["captions"] for b in loader]
    assert first != second  # epoch-seeded reshuffle


def test_get_data_loaders_requires_val_split(synth_dir, tmp_path):
    with pytest.raises(FileNotFoundError):
        get_data_loaders(tmp_path, batch_size=2)


def test_tokenizer_roundtrip_and_truncation():
    tok = ByteTokenizer()
    ids = tok.encode("hello world")
    assert ids[0] == tok.bos_token_id
    assert tok.decode(ids + [tok.eos_token_id]) == "hello world"
    assert len(tok.encode("x" * 600, max_length=512)) == 512

    ids_b, mask = batch_encode(tok, ["hi", "longer caption"], 64, (16, 32, 64))
    assert ids_b.shape[1] == 16


def test_preprocess_device_matches_host():
    import jax

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 224, 224, 3), np.uint8)
    dev = np.asarray(normalize_on_device(u8, dtype=np.float32))
    mean = np.asarray((0.485, 0.456, 0.406), np.float32) * 255
    std = np.asarray((0.229, 0.224, 0.225), np.float32) * 255
    host = (u8.astype(np.float32) - mean) / std
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_host_resize_crop_geometry():
    from PIL import Image

    for w, h in ((640, 480), (480, 640), (224, 224), (100, 300)):
        img = Image.fromarray(np.zeros((h, w, 3), np.uint8))
        out = host_resize_crop(img)
        assert out.shape == (224, 224, 3)


def test_loader_thread_stress(tmp_path):
    """Producer/consumer stress: many epochs with a prefetch queue, plus
    early-abandoned iterations, must neither deadlock nor drop batches."""
    from vlm_bridge_tpu.data.groundcap import make_synthetic_dataset
    from vlm_bridge_tpu.data.loader import BatchLoader, VLDataset

    make_synthetic_dataset(tmp_path, num_samples=20, image_size=32, seed=1)
    loader = BatchLoader(
        VLDataset(tmp_path, "train"), batch_size=2, shuffle=True,
        num_workers=3, prefetch=2)
    n_expected = len(loader)
    for epoch in range(5):
        batches = list(loader)
        assert len(batches) == n_expected
        assert all(b["pixel_values"].shape[0] == 2 for b in batches)
    # abandon mid-iteration (exercises the drain/stop path)
    for _ in range(3):
        it = iter(loader)
        next(it)
        del it


def test_loader_propagates_worker_errors(tmp_path):
    from vlm_bridge_tpu.data.groundcap import make_synthetic_dataset
    from vlm_bridge_tpu.data.loader import BatchLoader, VLDataset

    make_synthetic_dataset(tmp_path, num_samples=10, image_size=32, seed=2)
    ds = VLDataset(tmp_path, "train")
    ds.samples[3]["image_path"] = "images/does-not-exist.jpg"
    loader = BatchLoader(ds, batch_size=2, num_workers=2)
    with pytest.raises(FileNotFoundError):
        list(loader)


def test_get_transform_stats(tmp_path):
    from vlm_bridge_tpu.data.groundcap import (
        get_transform_stats, make_synthetic_dataset)

    # reuse the synthetic generator's dataset object shape
    import numpy as np
    from PIL import Image

    class _DS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return {"id": f"x{i}",
                    "image": Image.fromarray(
                        np.zeros((8, 8, 3), np.uint8)),
                    "caption": f'<gdo id="{i}">tagged</gdo> caption {i}'}

    from vlm_bridge_tpu.data.groundcap import transform_and_save_images

    records = transform_and_save_images(_DS(), tmp_path, num_workers=1)
    stats = get_transform_stats(_DS(), records)
    assert stats["original_count"] == stats["transformed_count"] == 3
    # tag stripping shortens captions
    assert (stats["avg_transformed_caption_length"]
            < stats["avg_original_caption_length"])
    assert "<gdo" in stats["sample_original"]
    assert "<gdo" not in stats["sample_transformed"]


# ---------------------------------------------------------------------------
# Pixel cache (data/pixel_cache.py): decode once, stream from a memmap
# ---------------------------------------------------------------------------


def test_pixel_cache_roundtrip(tmp_path):
    """Cached rows are byte-identical to fresh JPEG decodes, and the loader
    produces identical batches with and without the cache attached."""
    from vlm_bridge_tpu.data.pixel_cache import build_pixel_cache

    groundcap.make_synthetic_dataset(tmp_path, num_samples=12, image_size=64)
    cold = VLDataset(tmp_path, "train", pixel_cache="off")
    assert cold.pixels is None
    build_pixel_cache(cold, num_workers=2, verbose=False)

    warm = VLDataset(tmp_path, "train")  # auto-attach
    assert warm.pixels is not None
    for i in range(len(cold)):
        np.testing.assert_array_equal(warm.load_image(i),
                                      cold.decode_image(i))

    tok = ByteTokenizer()
    b_cold = BatchLoader(cold, batch_size=4, tokenizer=tok,
                         shuffle=False).first_batch()
    b_warm = BatchLoader(warm, batch_size=4, tokenizer=tok,
                         shuffle=False).first_batch()
    np.testing.assert_array_equal(b_cold["pixel_values"],
                                  b_warm["pixel_values"])
    np.testing.assert_array_equal(b_cold["input_ids"], b_warm["input_ids"])


def test_pixel_cache_stale_rejected(tmp_path):
    """A cache built against a different manifest must NOT be attached."""
    from vlm_bridge_tpu.data.pixel_cache import build_pixel_cache, try_attach

    groundcap.make_synthetic_dataset(tmp_path, num_samples=12, image_size=64)
    ds = VLDataset(tmp_path, "train", pixel_cache="off")
    build_pixel_cache(ds, num_workers=2, verbose=False)

    # append one more (valid) record -> fingerprint and count change
    manifest = tmp_path / "train" / "captions.jsonl"
    first = json.loads(manifest.read_text().splitlines()[0])
    with open(manifest, "a") as f:
        f.write(json.dumps({**first, "original_id": "dup"}) + "\n")

    stale = VLDataset(tmp_path, "train")
    assert stale.pixels is None  # refused, falls back to JPEG decode
    assert try_attach(stale.root, stale.samples) is None
    stale.load_image(0)  # decode fallback still works


def test_precache_cli(tmp_path, capsys):
    from vlm_bridge_tpu.data.cli import main

    groundcap.make_synthetic_dataset(tmp_path, num_samples=12, image_size=64)
    rc = main(["precache", "--data-dir", str(tmp_path), "--num-workers", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pixel cache" in out
    # every split with a manifest got a cache
    for split in ("train", "test"):
        assert (tmp_path / split / "pixels_u8.npy").exists()
        assert VLDataset(tmp_path, split).pixels is not None


def test_pixel_cache_stale_on_content_change(tmp_path):
    """Re-transformed image CONTENT under unchanged filenames must also
    invalidate the cache (fingerprint covers size+mtime, not just paths)."""
    from vlm_bridge_tpu.data.pixel_cache import build_pixel_cache

    groundcap.make_synthetic_dataset(tmp_path, num_samples=12, image_size=64)
    ds = VLDataset(tmp_path, "train", pixel_cache="off")
    build_pixel_cache(ds, num_workers=2, verbose=False)
    assert VLDataset(tmp_path, "train").pixels is not None

    # rewrite one image in place (same path, new bytes/mtime)
    img_path = tmp_path / "train" / ds.samples[0]["image_path"]
    from PIL import Image
    Image.new("RGB", (64, 64), (255, 0, 0)).save(img_path, quality=50)

    assert VLDataset(tmp_path, "train").pixels is None

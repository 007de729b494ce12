"""vlm-caption CLI: caption ad-hoc image files/directories (tiny, hermetic)."""

import json

import numpy as np
import pytest

from vlm_bridge_tpu.inference.caption import collect_images, main as caption_main

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture()
def image_dir(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(
            rng.integers(0, 256, (90, 120, 3), np.uint8)).save(d / f"i{i}.jpg")
    (d / "notes.txt").write_text("not an image")
    return d


def test_collect_images(image_dir):
    paths = collect_images(str(image_dir))
    assert len(paths) == 5
    assert all(p.suffix == ".jpg" for p in paths)
    assert collect_images(str(image_dir / "i0.jpg")) == [image_dir / "i0.jpg"]
    assert collect_images(str(image_dir / "missing.jpg")) == []


def test_caption_cli_end_to_end(image_dir, tmp_path):
    out = tmp_path / "caps.jsonl"
    rc = caption_main([
        str(image_dir), "--preset", "tiny", "--batch-size", "3",
        "--max-length", "4", "--output", str(out), "--platform", "cpu"])
    assert rc == 0
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 5
    assert all(set(l) == {"image", "caption"} for l in lines)


def test_caption_cli_no_images(tmp_path):
    assert caption_main([str(tmp_path / "nothing"), "--preset", "tiny"]) == 1

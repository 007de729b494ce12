"""vlm-debug CLI end-to-end (tiny preset, synthetic image, JSON report)."""

import json

import numpy as np
import pytest

from vlm_bridge_tpu.tools.debug_generation import main as debug_main

PIL = pytest.importorskip("PIL")


@pytest.mark.slow
def test_debug_cli_synthetic(tmp_path):
    report = tmp_path / "rep.json"
    rc = debug_main(["--preset", "tiny", "--max-length", "3",
                     "--report", str(report)])
    assert rc == 0
    data = json.loads(report.read_text())
    assert data["strategies"] and data["bridge_ab"]
    assert len(data["steps"]) >= 1


@pytest.mark.slow
def test_debug_cli_image_file(tmp_path):
    from PIL import Image

    img = tmp_path / "img.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (64, 80, 3), np.uint8)
    ).save(img)
    report = tmp_path / "rep.json"
    rc = debug_main(["--preset", "tiny", "--max-length", "2",
                     "--image", str(img), "--report", str(report)])
    assert rc == 0
    assert json.loads(report.read_text())["tokens"]

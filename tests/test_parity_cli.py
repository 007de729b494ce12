"""vlm-parity CLI tests: the north-star harness must be drivable end-to-end
without real weights (self-check uses the reference module as oracle;
record/check round-trips a transcript through exact-mode decode)."""

import json
from pathlib import Path

import numpy as np
import pytest

from vlm_bridge_tpu.tools.parity import DEFAULT_REFERENCE, main

torch = pytest.importorskip("torch")

needs_reference = pytest.mark.skipif(
    not Path(DEFAULT_REFERENCE).exists(),
    reason="reference checkout not available")


@needs_reference
def test_self_check_tiny(capsys):
    assert main(["self-check", "--dims", "tiny"]) == 0
    assert "PARITY SELF-CHECK PASSED" in capsys.readouterr().out


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        arr = rng.integers(0, 256, (80, 96, 3), np.uint8)
        p = d / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_record_then_check_roundtrip(images, tmp_path, capsys):
    transcript = tmp_path / "transcript.jsonl"
    rc = main(["record", *map(str, images), "--output", str(transcript),
               "--preset", "tiny", "--platform", "cpu", "--max-length", "6"])
    assert rc == 0
    rows = [json.loads(l) for l in transcript.read_text().splitlines()]
    assert len(rows) == 2 and all("tokens" in r for r in rows)

    # identical build -> token-for-token match
    rc = main(["check", "--transcript", str(transcript), "--data-dir", "/",
               "--preset", "tiny", "--platform", "cpu", "--max-length", "6"])
    assert rc == 0
    assert "2/2 matched" in capsys.readouterr().out

    # a corrupted transcript must FAIL the check
    rows[1]["tokens"][2] = (rows[1]["tokens"][2] + 1) % 500
    transcript.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    rc = main(["check", "--transcript", str(transcript), "--data-dir", "/",
               "--preset", "tiny", "--platform", "cpu", "--max-length", "6"])
    assert rc == 1
    assert "1/2 matched" in capsys.readouterr().out

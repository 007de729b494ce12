"""Two-process jax.distributed execution test (round-2 verdict ask #5).

Spawns 2 REAL processes, each with 2 virtual CPU devices, joined via
`init_multihost` into one 4-device global mesh; runs prepare_environment +
a 2-step training epoch + checkpoint save on both ranks and asserts:

  - identical loss on both ranks (the global mesh computed ONE model)
  - only process 0 wrote checkpoints and TB events
    (orchestrator.prepare_environment writer gating + save_checkpoint's
    single-writer early return)

This executes the multi-host code path (parallel/distributed.py:27-67) end
to end rather than unit-testing its env parsing.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

from vlm_bridge_tpu.data import groundcap

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training(tmp_path):
    data_dir = tmp_path / "data"
    groundcap.make_synthetic_dataset(data_dir, num_samples=16, image_size=70)
    import shutil

    shutil.rmtree(data_dir / "val")
    shutil.copytree(data_dir / "test", data_dir / "val")

    out_dir = tmp_path / "out"
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "VLM_BRIDGE_DISABLE_PALLAS": "1",
        "PYTHONPATH": str(REPO),
    })
    worker = REPO / "tests" / "multihost_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(rank), "2", str(port),
             str(data_dir), str(out_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=840)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["rank"]] = r
    assert set(results) == {0, 1}, outs

    # the global mesh computed one model: losses are identical
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["process_count"] == results[1]["process_count"] == 2
    assert results[0]["writer"] == "SummaryWriter"
    assert results[1]["writer"] == "NullWriter"

    # single-writer: rank 0 produced checkpoint slots + events, rank 1 none
    rank0_ckpt = out_dir / "rank0" / "ckpt"
    assert (rank0_ckpt / "latest").is_dir() and (rank0_ckpt / "best").is_dir()
    assert list((out_dir / "rank0" / "logs").glob("events.out.tfevents.*"))
    rank1 = out_dir / "rank1"
    assert not (rank1 / "ckpt" / "latest").exists()
    assert not list((rank1 / "logs").glob("events.out.tfevents.*")) \
        if (rank1 / "logs").exists() else True

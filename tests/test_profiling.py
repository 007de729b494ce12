"""StepProfiler tests (SURVEY.md §5 tracing subsystem)."""

import time

from vlm_bridge_tpu.runtime.profiling import StepProfiler


def test_step_timer_stats():
    prof = StepProfiler(warmup=1)
    for _ in range(5):
        with prof.step():
            time.sleep(0.01)
    s = prof.summary()
    assert s["steps_timed"] == 4  # warmup excluded
    assert s["step_ms_min"] >= 9
    assert s["step_ms_p50"] >= s["step_ms_min"]
    assert s["step_ms_max"] >= s["step_ms_p90"]


def test_trace_window(tmp_path):
    # capture a 2-step trace window on the CPU backend
    prof = StepProfiler(trace_dir=tmp_path / "trace", start_step=1, num_steps=2)
    for _ in range(4):
        with prof.step():
            pass
    prof.close()
    assert not prof._tracing
    # jax writes plugins/profile/<ts>/ under the trace dir
    assert any((tmp_path / "trace").rglob("*"))


def test_empty_summary():
    assert StepProfiler().summary() == {}


def test_init_multihost_single_host_noop(monkeypatch):
    from vlm_bridge_tpu.parallel.distributed import init_multihost, process_info

    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert init_multihost() is False
    info = process_info()
    assert info["process_count"] == 1 and info["process_index"] == 0

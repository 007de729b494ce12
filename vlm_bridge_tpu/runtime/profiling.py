"""Profiling / tracing: jax.profiler integration + step timers.

The reference has no profiling at all (SURVEY.md §5: "Tracing/profiling:
none" — only tqdm rates and one `time.time()` around the data transform).
This is the TPU-native equivalent subsystem: XLA/TPU traces viewable in
TensorBoard or Perfetto, plus a lightweight host-side step timer whose
summaries feed the metric writer.

Usage:
    prof = StepProfiler(trace_dir="logs/trace", start_step=10, num_steps=5)
    for batch in loader:
        with prof.step():
            state, metrics = train_step(...)
    prof.summary()  # {"step_ms_p50": ..., "step_ms_mean": ...}

A trace window [start_step, start_step + num_steps) is captured via
`jax.profiler.start_trace` / `stop_trace`; steps outside the window only pay
a `time.monotonic()` call.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, List, Optional


class StepProfiler:
    def __init__(
        self,
        *,
        trace_dir: Optional[str | Path] = None,
        start_step: int = 10,
        num_steps: int = 5,
        warmup: int = 2,
    ):
        self.trace_dir = str(trace_dir) if trace_dir else None
        self.start_step = start_step
        self.num_steps = num_steps
        self.warmup = warmup          # first N steps excluded from timing stats
        self._step = 0
        self._tracing = False
        self._times_ms: List[float] = []

    @contextlib.contextmanager
    def step(self, record_time: bool = True):
        """Wrap one training step; manages the trace window + timing.

        record_time=False skips the per-step wall-time sample — used by
        async dispatch loops where per-step wall time measures dispatch, not
        device execution; those loops feed fenced timings via add_window().
        """
        if (self.trace_dir and not self._tracing
                and self._step == self.start_step):
            import jax

            Path(self.trace_dir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = (time.monotonic() - t0) * 1000
            if record_time and self._step >= self.warmup:
                self._times_ms.append(dt)
            self._step += 1
            if (self._tracing
                    and self._step >= self.start_step + self.num_steps):
                import jax

                jax.profiler.stop_trace()
                self._tracing = False

    def add_window(self, steps: int, seconds: float) -> None:
        """Record a fenced window of `steps` steps taking `seconds` total.

        Async train loops only synchronize with the device at the logging
        cadence; each fenced window contributes its average step time once
        (percentiles are then over windows, not steps).
        """
        if steps > 0:
            self._times_ms.append(1000.0 * seconds / steps)

    def close(self) -> None:
        if self._tracing:
            import jax

            jax.profiler.stop_trace()
            self._tracing = False

    def summary(self) -> Dict[str, float]:
        if not self._times_ms:
            return {}
        xs = sorted(self._times_ms)
        n = len(xs)
        return {
            "step_ms_mean": sum(xs) / n,
            "step_ms_p50": xs[n // 2],
            "step_ms_p90": xs[min(n - 1, int(n * 0.9))],
            "step_ms_min": xs[0],
            "step_ms_max": xs[-1],
            "steps_timed": float(n),
        }


@contextlib.contextmanager
def annotate(name: str):
    """Named trace region (shows up in the TPU trace viewer)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def host_rtt(reps: int = 7) -> float:
    """Median seconds for one host->device dispatch + fence of a trivial
    jitted op — the constant overhead every wall-timed device call pays.

    On a tunneled device (axon) this is ~25 ms of RPC round trip, the same
    order as a batch-64 decode step, so A/B scripts that wall-time full
    calls must either difference two run lengths (two-point method,
    scripts/encoder_mm_ab.py) or subtract this constant from absolute
    throughputs. The reference never needed it: its GPU sits on PCIe.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    tiny = jax.jit(lambda x: x + 1)
    x = jnp.zeros((1,), jnp.float32)
    np.asarray(tiny(x))  # compile outside the timed reps
    samples = []
    for _ in range(max(1, reps)):
        t0 = time.monotonic()
        np.asarray(tiny(x))
        samples.append(time.monotonic() - t0)
    return float(sorted(samples)[len(samples) // 2])

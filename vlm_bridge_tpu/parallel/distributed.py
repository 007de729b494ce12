"""Multi-host (multi-slice) initialization over DCN.

Single-slice training needs nothing: `jax.devices()` sees every chip over
ICI and the mesh in `sharding.py` covers it. Across hosts/slices, JAX needs
`jax.distributed.initialize` before any backend touch; this module wraps it
with env-based autodetection so the SAME `vlm-training` invocation works on
one host or many (SURVEY.md §5: the reference has no distributed component;
this is the framework's comm-backend bootstrap, stage 7 of the build plan).

Resolution order for coordinator/process info:
  1. explicit arguments
  2. standard JAX env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
     JAX_PROCESS_ID) — set by most launchers
  3. Cloud TPU metadata (jax.distributed.initialize() with no args works on
     TPU pods — it reads the TPU environment directly)

On a single process with no coordinator configured this is a no-op, so it
is always safe to call.
"""

from __future__ import annotations

import os
from typing import Optional


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed if multi-host context is detected.

    Returns True if distributed init ran, False for the single-host no-op.
    Must be called before the first jax.devices()/array op.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    on_tpu_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")
                      or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not coordinator_address and not on_tpu_pod:
        return False  # single host — nothing to do

    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        # Partial/stale pod metadata (e.g. TPU env vars on a single-chip
        # proxy) must not kill single-host runs — fall back loudly.
        import warnings

        warnings.warn(f"multi-host init skipped ({e}); running single-host")
        return False
    return True


def process_info() -> dict:
    """Host/devices summary for logs."""
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "backend": jax.default_backend(),
    }

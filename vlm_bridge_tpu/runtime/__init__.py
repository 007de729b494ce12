"""Runtime services: metric logging (TensorBoard event files), checkpoint
store, profiling helpers."""

from vlm_bridge_tpu.runtime.checkpoint import CheckpointStore  # noqa: F401
from vlm_bridge_tpu.runtime.profiling import StepProfiler, annotate  # noqa: F401
from vlm_bridge_tpu.runtime.tb_writer import SummaryWriter  # noqa: F401

"""Caption generation and evaluation."""

from vlm_bridge_tpu.inference.generate import (  # noqa: F401
    GenerationConfig,
    generate_tokens,
)

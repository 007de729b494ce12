"""Caption generation and evaluation."""

from vlm_bridge_tpu.inference.generate import (  # noqa: F401
    GenerationConfig,
    generate_tokens,
)
from vlm_bridge_tpu.inference.robust import (  # noqa: F401
    DEFAULT_STRATEGIES,
    decode_captions,
    generate_caption_robust,
    is_degenerate,
)

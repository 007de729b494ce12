"""Caption generation and evaluation."""

from vlm_bridge_tpu.inference.generate import (  # noqa: F401
    GenerationConfig,
    generate_tokens,
)
from vlm_bridge_tpu.inference.evaluate import evaluate_split  # noqa: F401
from vlm_bridge_tpu.inference.metrics import (  # noqa: F401
    cider_d,
    corpus_bleu,
    evaluate_captions,
)
from vlm_bridge_tpu.inference.robust import (  # noqa: F401
    DEFAULT_STRATEGIES,
    decode_captions,
    generate_caption_robust,
    is_degenerate,
)

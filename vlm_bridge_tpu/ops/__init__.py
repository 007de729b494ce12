"""Core numeric ops: norms, RoPE, activations, attention, sampling.

Pure-jnp reference implementations live in `attention.py` / `layers.py`;
Pallas TPU kernels for the hot paths live in `flash_attention.py` and are
selected automatically on TPU backends via `attention.dot_product_attention`.
"""

from vlm_bridge_tpu.ops.layers import (  # noqa: F401
    layer_norm,
    rms_norm,
    gelu_tanh,
    linear,
    rope_table,
    apply_rope,
)
from vlm_bridge_tpu.ops.attention import dot_product_attention  # noqa: F401
from vlm_bridge_tpu.ops.quant import (  # noqa: F401
    dequantize,
    int8_matmul,
    int8_matmul_t,
    int8_mlp,
    quantize_int8,
)
from vlm_bridge_tpu.ops.sampling import sample_token, sanitize_logits  # noqa: F401

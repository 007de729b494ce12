"""Parameter loading and conversion: HF safetensors/torch state dicts ->
JAX pytrees, and reference `.pth` bridge checkpoints <-> pytrees."""

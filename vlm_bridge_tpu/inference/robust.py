"""Multi-strategy robust caption generation.

Mirrors the reference's `generate_caption_robust` strategy sweep
(reference: src/vlm_bridge/model_architecture/full_model.py:388-440): run a
list of named sampling strategies over the same image, collect every result
(or the error string), and pick the first non-degenerate caption. Unlike the
reference — which re-runs the whole no-KV-cache Python loop per strategy —
every strategy here reuses the one jit-compiled scan generator and the vision
features are encoded once.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from vlm_bridge_tpu.configs import VLMConfig
from vlm_bridge_tpu.inference.generate import GenerationConfig, generate_tokens
from vlm_bridge_tpu.models import full_model

# (name, GenerationConfig) — a deliberately MODIFIED version of the reference
# sweep (full_model.py:396-404, which runs greedy first with low_temp=0.1/
# top_p=1.0 and returns every result without choosing): this sweep orders
# strategies conservative-first and generate_caption_robust picks the first
# non-degenerate caption, which is what callers actually want from a sweep.
DEFAULT_STRATEGIES: Tuple[Tuple[str, GenerationConfig], ...] = (
    ("conservative", GenerationConfig(temperature=0.7, top_p=0.9)),
    ("greedy", GenerationConfig(greedy=True)),
    ("low_temp", GenerationConfig(temperature=0.3, top_p=0.95)),
    ("medium_temp", GenerationConfig(temperature=0.5, top_p=0.9)),
    ("high_temp", GenerationConfig(temperature=1.0, top_p=0.85)),
)


def decode_captions(tokenizer, tokens: np.ndarray, lengths: np.ndarray) -> List[str]:
    """Detokenize [B, L] id buffers, honoring per-sample lengths (BOS/EOS/pad
    stripped by the tokenizer, reference full_model.py:379-384)."""
    out = []
    for row, n in zip(np.asarray(tokens), np.asarray(lengths)):
        out.append(tokenizer.decode([int(t) for t in row[: int(n)]]))
    return out


def is_degenerate(caption: str, *, min_words: int = 2, max_repeat: int = 4) -> bool:
    """Heuristic filter for failed generations: empty/too-short output or a
    single token looping (the failure modes the reference sweep exists to
    route around, full_model.py:420-428)."""
    words = caption.split()
    if len(words) < min_words:
        return True
    for i in range(len(words) - max_repeat + 1):
        if len(set(words[i : i + max_repeat])) == 1:
            return True
    return False


def generate_caption_robust(
    params,
    cfg: VLMConfig,
    pixel_values,
    tokenizer,
    *,
    strategies: Sequence[Tuple[str, GenerationConfig]] = DEFAULT_STRATEGIES,
    rng: Optional[jax.Array] = None,
    max_length: int = 50,
    activation_dtype=None,
) -> Dict[str, object]:
    """Try each strategy; return all results + the first healthy caption.

    Returns {"results": {name: caption-or-error}, "chosen": name|None,
    "caption": str}. Every strategy result is kept (like the reference's
    results dict) so callers can inspect what failed and how.
    """
    import dataclasses

    import jax.numpy as jnp

    if rng is None:
        rng = jax.random.key(0)
    if activation_dtype is None:
        activation_dtype = jnp.bfloat16
    vision = full_model.encode_image_jit(params, cfg, pixel_values)

    results: Dict[str, str] = {}
    chosen = None
    caption = ""
    for i, (name, gen) in enumerate(strategies):
        gen = dataclasses.replace(gen, max_length=max_length)
        try:
            toks, lens = generate_tokens(
                params, cfg, vision_features=vision,
                rng=jax.random.fold_in(rng, i), gen=gen,
                activation_dtype=activation_dtype)
            text = decode_captions(tokenizer, toks, lens)[0]
            results[name] = text
            if chosen is None and not is_degenerate(text):
                chosen = name
                caption = text
        except Exception as e:  # keep sweeping (reference full_model.py:430-438)
            results[name] = f"ERROR: {e}"
    if chosen is None:
        # fall back to the longest non-error result
        candidates = [(n, c) for n, c in results.items()
                      if not c.startswith("ERROR:")]
        if candidates:
            chosen, caption = max(candidates, key=lambda nc: len(nc[1]))
    return {"results": results, "chosen": chosen, "caption": caption}

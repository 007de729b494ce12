"""Generation debugger: per-step logit/embedding forensics, issue detection,
strategy sweep, bridge-bypass A/B, JSON report.

TPU-native re-design of the reference `GenerationDebugger`
(reference: debug_generation.py:51-402). Differences driven by the platform:

- Per-step statistics (logit moments, NaN/Inf counts, top-5 tokens, hidden
  norms) are reduced ON DEVICE inside one jitted step function and only the
  tiny stats pytree is pulled to host — pulling the raw [B, 256k] logits
  through the device tunnel every step is exactly the kind of host<->device
  traffic the framework avoids.
- The step function runs the exact-mode forward (fixed-length buffer +
  `position < t` mask) once per token under a single jit trace; `t` is a
  traced scalar so all 50 steps share one compilation.
- Bridge-bypass A/B is a functional flag (`GenerationConfig.bypass_bridge`)
  instead of the reference's forward monkey-patch
  (debug_generation.py:274-325).
"""

from __future__ import annotations

import functools
import json
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vlm_bridge_tpu.configs import VLMConfig
from vlm_bridge_tpu.inference.generate import GenerationConfig, generate_tokens
from vlm_bridge_tpu.inference.robust import decode_captions, is_degenerate
from vlm_bridge_tpu.models import full_model, gemma2
from vlm_bridge_tpu.ops import sampling
from vlm_bridge_tpu.ops.sampling import sample_token


@dataclass
class StepTrace:
    """Host-side record of one decode step (reference debug_generation.py:96-178)."""

    step: int
    token: int
    token_text: str
    top5_ids: List[int]
    top5_probs: List[float]
    logit_mean: float
    logit_std: float
    logit_min: float
    logit_max: float
    nan_count: int
    inf_count: int
    extreme_count: int          # |logit| > 50 (pre-sanitize)
    embed_norm: float           # bridged-embedding L2 norm at position t-1
    hidden_norm: float          # final-hidden L2 norm at position t-1
    topp_tail_mass: float = 0.0  # nucleus mass the topk_window would drop
                                 # at this trace's T/p settings (greedy
                                 # traces fall back to the sweep defaults
                                 # T=0.7/p=0.9)


@dataclass
class DebugReport:
    caption: str
    tokens: List[int]
    issues: List[str] = field(default_factory=list)
    steps: List[StepTrace] = field(default_factory=list)
    strategies: Dict[str, str] = field(default_factory=dict)
    bridge_ab: Dict[str, str] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "caption": self.caption,
                "tokens": self.tokens,
                "issues": self.issues,
                "steps": [asdict(s) for s in self.steps],
                "strategies": self.strategies,
                "bridge_ab": self.bridge_ab,
            },
            indent=2,
        )


@functools.partial(
    jax.jit, static_argnames=("cfg", "L", "temperature", "top_p", "greedy",
                              "bypass_bridge"))
def _debug_step(
    params, cfg: VLMConfig, tokens, t, vision, rng, *,
    L: int, temperature: float, top_p: float, greedy: bool,
    bypass_bridge: bool,
):
    """One exact-mode decode step + on-device stats. tokens: [B, L]; t traced."""
    B = tokens.shape[0]
    lm_cfg = cfg.lm
    sampling_trace = not greedy and temperature > 0.0
    tail_t = temperature if sampling_trace else 0.7
    tail_p = top_p if sampling_trace else 0.9
    mask = jnp.broadcast_to(
        (jnp.arange(L)[None, :] < t).astype(jnp.int32), (B, L))
    if bypass_bridge:
        bridged = gemma2.embed(params["lm"], tokens)
    else:
        bridged = full_model.bridge_text(
            params, cfg, tokens, vision, attn_mask=mask, bridge_pad_mask=True)
    hidden = gemma2.forward_hidden(
        params["lm"], lm_cfg, bridged.astype(jnp.float32),
        attn_mask=mask, remat=False)
    last_h = jax.lax.dynamic_index_in_dim(hidden, t - 1, axis=1)
    last_e = jax.lax.dynamic_index_in_dim(bridged, t - 1, axis=1)
    logits = gemma2.logits_from_hidden(params["lm"], lm_cfg, last_h)[:, 0]

    f = logits.astype(jnp.float32)
    finite = jnp.where(jnp.isfinite(f), f, 0.0)
    top5_vals, top5_ids = jax.lax.top_k(finite, 5)
    # TRUE model probabilities (softmax over the full vocab), not a
    # renormalization over 5 — a flat 256k distribution must read ~4e-6,
    # not ~0.2, or the tool masks exactly the failures it exists to find
    lse = jax.scipy.special.logsumexp(finite, axis=-1, keepdims=True)
    top5_probs = jnp.exp(top5_vals - lse)
    stats = {
        "logit_mean": finite.mean(axis=-1),
        "logit_std": finite.std(axis=-1),
        "logit_min": finite.min(axis=-1),
        "logit_max": finite.max(axis=-1),
        "nan_count": jnp.isnan(f).sum(axis=-1),
        "inf_count": jnp.isinf(f).sum(axis=-1),
        "extreme_count": (jnp.abs(finite) > 50.0).sum(axis=-1),
        "embed_norm": jnp.linalg.norm(
            last_e.astype(jnp.float32), axis=-1)[:, 0],
        "hidden_norm": jnp.linalg.norm(
            last_h.astype(jnp.float32), axis=-1)[:, 0],
        "top5_ids": top5_ids,
        "top5_probs": top5_probs,
        # measured at THIS trace's sampling settings so the clipping warning
        # matches what the windowed sampler would actually do; greedy traces
        # (which never sample) fall back to the production sweep defaults
        # (T=0.7, p=0.9) so the warning still fires before someone runs the
        # sampler on a distribution whose nucleus the window clips
        "topp_tail_mass": sampling.topp_window_tail_mass(
            logits, temperature=tail_t, top_p=tail_p),
    }
    nxt = sample_token(
        jax.random.fold_in(rng, t), logits,
        temperature=temperature, top_p=top_p, greedy=greedy)
    tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t))
    return tokens, nxt, stats


class GenerationDebugger:
    """Traced single-image generation with per-step forensics
    (reference GenerationDebugger, debug_generation.py:51-235)."""

    def __init__(self, params, cfg: VLMConfig, tokenizer):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer

    # -- core trace -------------------------------------------------------

    def debug_generation(
        self,
        pixel_values,
        *,
        max_length: int = 30,
        temperature: float = 0.0,
        top_p: float = 1.0,
        greedy: bool = True,
        bypass_bridge: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> DebugReport:
        """Greedy-by-default traced decode of ONE image with per-step stats."""
        cfg = self.cfg
        if rng is None:
            rng = jax.random.key(0)
        pixel_values = jnp.asarray(pixel_values)
        if pixel_values.ndim == 3:
            pixel_values = pixel_values[None]
        vision = full_model.encode_image_jit(self.params, cfg, pixel_values[:1])

        L = max_length + 1
        tokens = jnp.full((1, L), cfg.lm.pad_token_id, jnp.int32)
        tokens = tokens.at[:, 0].set(cfg.lm.bos_token_id)

        report = DebugReport(caption="", tokens=[])
        for t in range(1, L):
            tokens, nxt, stats = _debug_step(
                self.params, cfg, tokens, jnp.asarray(t, jnp.int32), vision,
                rng, L=L, temperature=temperature, top_p=top_p, greedy=greedy,
                bypass_bridge=bypass_bridge)
            s = jax.device_get(stats)
            tok = int(jax.device_get(nxt)[0])
            report.steps.append(StepTrace(
                step=t,
                token=tok,
                token_text=self.tokenizer.decode([tok]),
                top5_ids=[int(i) for i in s["top5_ids"][0]],
                top5_probs=[float(p) for p in s["top5_probs"][0]],
                logit_mean=float(s["logit_mean"][0]),
                logit_std=float(s["logit_std"][0]),
                logit_min=float(s["logit_min"][0]),
                logit_max=float(s["logit_max"][0]),
                nan_count=int(s["nan_count"][0]),
                inf_count=int(s["inf_count"][0]),
                extreme_count=int(s["extreme_count"][0]),
                embed_norm=float(s["embed_norm"][0]),
                hidden_norm=float(s["hidden_norm"][0]),
                topp_tail_mass=float(s["topp_tail_mass"][0]),
            ))
            if tok == cfg.lm.eos_token_id:
                break

        ids = [int(x) for x in np.asarray(tokens[0])][: len(report.steps) + 1]
        report.tokens = ids
        report.caption = self.tokenizer.decode(ids)
        sampling_trace = not greedy and temperature > 0.0
        report.issues = self._detect_issues(
            report.steps, report.caption,
            tail_t=temperature if sampling_trace else 0.7,
            tail_p=top_p if sampling_trace else 0.9,
            tail_defaulted=not sampling_trace)
        return report

    # -- issue detection (reference debug_generation.py:180-235) ----------

    @staticmethod
    def _detect_issues(steps: List[StepTrace], caption: str,
                       tail_t: float = 0.7, tail_p: float = 0.9,
                       tail_defaulted: bool = True) -> List[str]:
        issues: List[str] = []
        for s in steps:
            if s.nan_count:
                issues.append(f"step {s.step}: {s.nan_count} NaN logits")
            if s.inf_count:
                issues.append(f"step {s.step}: {s.inf_count} Inf logits")
            if s.extreme_count:
                issues.append(
                    f"step {s.step}: {s.extreme_count} extreme logits (|x|>50)")
        clipped = [s for s in steps if s.topp_tail_mass > 0.05]
        if clipped:
            worst = max(s.topp_tail_mass for s in clipped)
            issues.append(
                f"topk_window clips the top-p nucleus on {len(clipped)} "
                f"step(s) (worst: {worst:.2f} of p={tail_p:g} unreachable "
                f"at T={tail_t:g}{' — sweep defaults; greedy trace' if tail_defaulted else ''}) "
                f"— use exact_topp for faithful sampling")
        toks = [s.token for s in steps]
        for n in (1, 2, 3):
            if len(toks) >= 4 * n and len(set(toks[-4 * n:])) <= n:
                issues.append(f"repetition: last {4 * n} tokens cycle "
                              f"through <= {n} distinct ids")
                break
        if is_degenerate(caption):
            issues.append("degenerate caption (empty/too short/looping)")
        return issues

    # -- strategy sweep (reference debug_generation.py:237-272) ------------

    def strategy_sweep(
        self, pixel_values, *, max_length: int = 30,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, str]:
        from vlm_bridge_tpu.inference.robust import DEFAULT_STRATEGIES

        if rng is None:
            rng = jax.random.key(0)
        pixel_values = jnp.asarray(pixel_values)
        if pixel_values.ndim == 3:
            pixel_values = pixel_values[None]
        vision = full_model.encode_image_jit(
            self.params, self.cfg, pixel_values[:1])
        import dataclasses

        out: Dict[str, str] = {}
        for i, (name, g) in enumerate(DEFAULT_STRATEGIES):
            gen = dataclasses.replace(g, max_length=max_length)
            try:
                toks, lens = generate_tokens(
                    self.params, self.cfg, vision_features=vision,
                    rng=jax.random.fold_in(rng, i), gen=gen)
                out[name] = decode_captions(self.tokenizer, toks, lens)[0]
            except Exception as e:
                out[name] = f"ERROR: {e}"
        return out

    # -- bridge-bypass A/B (reference debug_generation.py:274-325) ---------

    def compare_bridge_bypass(
        self, pixel_values, *, max_length: int = 30,
        with_bridge_caption: Optional[str] = None,
    ) -> Dict[str, str]:
        """Greedy decode with and without the bridge. If the bypass output is
        fluent but the bridged one is degenerate, the bridge is the culprit.

        with_bridge_caption: reuse an already-traced greedy caption for the
        with-bridge leg (full_report passes its trace's result so the
        expensive per-step decode is not repeated)."""
        out: Dict[str, str] = {}
        if with_bridge_caption is None:
            with_bridge_caption = self.debug_generation(
                pixel_values, max_length=max_length, greedy=True).caption
        out["with_bridge"] = with_bridge_caption
        out["bypass_bridge"] = self.debug_generation(
            pixel_values, max_length=max_length, greedy=True,
            bypass_bridge=True).caption
        return out

    # -- full report (reference debug_generation.py:389-402) ---------------

    def full_report(
        self, pixel_values, *, max_length: int = 30,
        save_path: Optional[str] = None,
    ) -> DebugReport:
        report = self.debug_generation(pixel_values, max_length=max_length)
        report.strategies = self.strategy_sweep(
            pixel_values, max_length=max_length)
        report.bridge_ab = self.compare_bridge_bypass(
            pixel_values, max_length=max_length,
            with_bridge_caption=report.caption)
        if save_path:
            Path(save_path).write_text(report.to_json())
        return report


def main(argv=None) -> int:
    """`vlm-debug` CLI: trace generation on an image (or synthetic noise)."""
    import argparse

    from vlm_bridge_tpu.tools.loading import (
        add_model_args, apply_platform, load_from_args)

    ap = argparse.ArgumentParser(
        prog="vlm-debug", description="generation debugger")
    ap.add_argument("--image", default=None, help="image path (synthetic if unset)")
    ap.add_argument("--max-length", type=int, default=30)
    ap.add_argument("--report", default="debug_generation_report.json")
    add_model_args(ap)
    args = ap.parse_args(argv)
    apply_platform(args)

    cfg, params, tokenizer = load_from_args(args)

    if args.image:
        from PIL import Image
        from vlm_bridge_tpu.data.preprocess import normalize_on_device
        img = Image.open(args.image).convert("RGB").resize(
            (cfg.image_size, cfg.image_size))
        pixels = normalize_on_device(jnp.asarray(np.asarray(img))[None])
    else:
        pixels = jnp.asarray(np.random.default_rng(0).normal(
            0, 1, (1, cfg.image_size, cfg.image_size, 3)), jnp.float32)

    dbg = GenerationDebugger(params, cfg, tokenizer)
    report = dbg.full_report(
        pixels, max_length=args.max_length, save_path=args.report)
    print(f"caption: {report.caption!r}")
    print(f"issues: {report.issues or 'none'}")
    for name, cap in report.strategies.items():
        print(f"  [{name}] {cap!r}")
    for name, cap in report.bridge_ab.items():
        print(f"  [{name}] {cap!r}")
    print(f"report written to {args.report}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

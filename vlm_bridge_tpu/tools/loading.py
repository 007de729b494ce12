"""Shared CLI plumbing: model/weight-loading flags and their resolution.

vlm-eval, vlm-caption, and vlm-debug all need the same stack setup (preset
-> random init -> optional HF snapshots -> optional bridge checkpoint ->
optional int8 quantization -> tokenizer); this is the single implementation.
"""

from __future__ import annotations

from pathlib import Path


def add_model_args(ap) -> None:
    """Attach the common model/weights/platform argument set."""
    ap.add_argument("--checkpoint", default=None,
                    help="bridge checkpoint slot (e.g. checkpoints/exp/best)")
    ap.add_argument("--hf-vision-path", default=None,
                    help="local HF snapshot of facebook/dinov2-large")
    ap.add_argument("--hf-lm-path", default=None,
                    help="local HF snapshot of google/gemma-2-2b")
    ap.add_argument("--tokenizer-path", default=None)
    ap.add_argument("--preset", default="default",
                    choices=["default", "tiny", "tiny_ref", "gemma2_9b",
                             "gemma2_27b"])
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                    help="frozen-weight dtype for HF snapshot loads (f32 "
                         "for token-for-token parity checks; bf16 is the "
                         "serving default)")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force a JAX backend (CPU smoke runs)")
    ap.add_argument("--quantize", default=None,
                    help="int8-quantize weight groups: comma list of "
                         "embedding,mlp,attn,bridge ('embedding4' instead "
                         "of 'embedding' = int4 rows-packed table)")
    ap.add_argument("--mesh", default=None,
                    help="device mesh for inference: DATA[,MODEL] (e.g. "
                         "'8' = 8-way batch-sharded decode, '4,2' adds "
                         "2-way tensor parallelism for the LM)")


def apply_platform(args) -> None:
    """Honor --platform before any jax array op (call first)."""
    if getattr(args, "platform", None):
        import os

        if args.platform == "cpu":
            os.environ.setdefault("VLM_BRIDGE_DISABLE_PALLAS", "1")
        import jax

        jax.config.update("jax_platforms", args.platform)


def load_from_args(args):
    """(cfg, params, tokenizer) resolved from the common argument set."""
    import jax

    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.data.tokenizer import get_tokenizer
    from vlm_bridge_tpu.models import full_model

    presets = {"default": VLMConfig.default, "tiny": VLMConfig.tiny_test,
               "tiny_ref": VLMConfig.tiny_ref,
               "gemma2_9b": VLMConfig.gemma2_9b,
               "gemma2_27b": VLMConfig.gemma2_27b}
    cfg = presets[args.preset]()
    params = full_model.init(jax.random.key(0), cfg)

    import jax.numpy as jnp

    dtype = (jnp.float32 if getattr(args, "dtype", "bf16") == "f32"
             else jnp.bfloat16)
    if args.hf_vision_path:
        from vlm_bridge_tpu.params.hf_loader import load_dinov2

        params["vision"] = load_dinov2(
            args.hf_vision_path, cfg.vision, dtype=dtype,
            target_grids=(cfg.image_size // cfg.vision.patch_size,))
    if args.hf_lm_path:
        from vlm_bridge_tpu.params.hf_loader import load_gemma2

        params["lm"] = load_gemma2(args.hf_lm_path, cfg.lm, dtype=dtype)
    if args.checkpoint:
        from vlm_bridge_tpu.runtime.checkpoint import CheckpointStore

        p = Path(args.checkpoint)
        store = CheckpointStore(str(p.parent))
        restored, meta = store.load(
            p.name, template={"bridge_params": params["bridge"]})
        params["bridge"] = restored["bridge_params"]
        # stash trainer-recorded facts (e.g. bridge_causal) for CLIs that
        # need to match generation semantics to how the bridge was trained
        args._ckpt_meta = meta
    if getattr(args, "quantize", None):
        parts = args.quantize.split(",")
        lm_parts = tuple(p for p in parts if p not in ("bridge", "vision"))
        if lm_parts:
            from vlm_bridge_tpu.models import gemma2

            params["lm"] = gemma2.quantize_params(params["lm"], parts=lm_parts)
        if "bridge" in parts:
            from vlm_bridge_tpu.models import bridge

            params["bridge"] = bridge.quantize_decode_params(params["bridge"])
        if "vision" in parts:
            from vlm_bridge_tpu.models import dinov2

            params["vision"] = dinov2.quantize_vision_params(params["vision"])

    return cfg, params, get_tokenizer(args.tokenizer_path)


def mesh_from_args(args, params):
    """Resolve --mesh into (mesh, sharded params). (None, params) without it.

    "D" or "D,M": D-way data parallelism (batch sharding) x M-way tensor
    parallelism for the frozen LM (parallel/sharding._LM_TP_RULES).
    """
    spec = getattr(args, "mesh", None)
    if not spec:
        return None, params
    parts = [int(x) for x in str(spec).split(",")]
    data = parts[0]
    model = parts[1] if len(parts) > 1 else 1

    from vlm_bridge_tpu.parallel import auto_mesh, shard_params

    mesh = auto_mesh(data=data, model=model)
    return mesh, shard_params(mesh, params)


def prestack_decode_params(params, cfg, gen, mesh=None):
    """Stack the int8 decode weights ONCE for serving.

    A serving deployment stacks at load time, not per batch: in-jit
    stacking copies every layer's weights on each generate call, and the
    per-call HBM memory gate (generate._fused_decode_available) can flicker
    use_fused between calls — each flip is a fresh XLA compile. The r5
    eval_e2e capture measured the cost: 0.66 captions/s end-to-end vs ~160
    with pre-stacked weights at the same batch. No-op unless the fused
    whole-stack path would actually dispatch for this gen config.

    NOTE: stacking frees the input tree's per-layer weights in place
    (stack_decode_params free_layers — peak HBM = int8 model + one stacked
    field, the 9B-on-16GB conversion recipe); serve from the RETURNED
    params only.
    """
    import os

    from vlm_bridge_tpu.models import gemma2
    from vlm_bridge_tpu.ops import decode_kernels
    from vlm_bridge_tpu.ops.attention import _use_pallas

    if "stacked_decode" in params["lm"] or "layers" not in params["lm"]:
        return params
    model_ax = 1 if mesh is None else dict(
        zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
    if (gen.exact or not gen.kv_quant or model_ax > 1 or gen.force_jnp
            or os.environ.get("VLM_BRIDGE_DEBUG_FORCE_JNP")
            or not (_use_pallas() or decode_kernels.INTERPRET)
            or not gemma2.supports_fused_decode(
                params["lm"], cfg.lm, gen.max_length + 1)):
        return params
    params = dict(params)
    lm = dict(params["lm"])
    lm["stacked_decode"] = gemma2.stack_decode_params(
        lm, cfg.lm, mlp_int4=gen.mlp_int4,
        mlp_int4_group=gen.mlp_int4_group, free_layers=True)
    del lm["layers"]
    params["lm"] = lm
    return params

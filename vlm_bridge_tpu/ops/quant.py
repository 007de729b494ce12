"""Int8 weight-only quantization for the decode path.

Batch-32 greedy decode is HBM-bandwidth-bound: every generated token streams
all ~2.6B frozen Gemma-2 weights (plus the 590M-row embedding again for the
lm_head) from HBM. Weight-only int8 halves that traffic, which is the only
remaining lever once the loop is a single fused scan (the reference has no
analogue — its decode re-runs full bf16 forwards with no cache at all,
full_model.py:241-373).

Scheme: symmetric per-output-channel int8 (`w ≈ w_int8 * scale[o]`), chosen
because it needs no activation statistics, keeps rounding error ~0.2% for
normal-ish weight distributions, and folds into one multiply at the output.

The Pallas kernels stream int8 blocks HBM->VMEM and dequantize in-register
before feeding the MXU, so the bf16 copy never exists in HBM. (A plain
`jnp.dot(x, w_i8.astype(bf16))` would NOT achieve this under `lax.scan`:
the astype is loop-invariant, XLA hoists it, and a full bf16 copy
materializes — defeating the point.) A jnp fallback covers CPU/tests.

Layout notes: int8 VMEM tiles are (32, 128); block sizes keep the second-
minor dim a multiple of 32 and the minor dim a multiple of 128.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlm_bridge_tpu.ops.attention import _use_pallas

# Tests flip this to exercise the kernels via the Pallas interpreter.
INTERPRET = False


def quantize_int8(w: jax.Array, *, axis: int = 0) -> dict:
    """Symmetric per-channel int8 quantization.

    axis: the CONTRACTION axis (reduced in the matmul); scales are per
    channel of the other axis. For [I, O] weights use axis=0 (per-O scale);
    for a [V, H] embedding used both for row lookup and as the lm_head, use
    axis=1 (per-V scale).
    Returns {"w_int8": int8 same-shape, "scale": f32 [channels]}.
    """
    wf = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=axis)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.round(wf / jnp.expand_dims(scale, axis))
    return {
        "w_int8": jnp.clip(q, -127, 127).astype(jnp.int8),
        "scale": scale,
    }


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "w_int8" in w


def dequantize(wq: dict, *, axis: int = 0, dtype=jnp.float32) -> jax.Array:
    """Materialize the bf16/f32 weight (tests / non-hot paths only)."""
    return (wq["w_int8"].astype(jnp.float32)
            * jnp.expand_dims(wq["scale"], axis)).astype(dtype)


# ---------------------------------------------------------------------------
# x[M, I] @ w[I, O] (axis=0 quantization, per-O scales)
# ---------------------------------------------------------------------------


def int8_matmul(x: jax.Array, wq: dict, *, block_i: int = 512,
                block_o: int = 512) -> jax.Array:
    """y[M, O] = x[M, I] @ dequant(w[I, O]) in x.dtype, f32 accumulation.
    w must be quantized with axis=0 (per-O scales)."""
    w, scale = wq["w_int8"], wq["scale"]
    I, O = w.shape
    if not _use_pallas() and not INTERPRET:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        return (y * scale).astype(x.dtype)

    M = x.shape[0]
    Mp = _round_up(M, 8)
    block_i = _pick_block(I, min(block_i, _round_up(I, 32)))
    block_o = _pick_block(O, min(block_o, _round_up(O, 128)))
    xp = jnp.pad(x, ((0, Mp - M), (0, (-I) % block_i)))
    wp = jnp.pad(w, ((0, (-I) % block_i), (0, (-O) % block_o)))
    sp = jnp.pad(scale, (0, (-O) % block_o))[None, :]
    nI, nO = wp.shape[0] // block_i, wp.shape[1] // block_o

    out = pl.pallas_call(
        functools.partial(_int8_mm_kernel, n_inner=nI),
        grid=(nO, nI),
        in_specs=[
            pl.BlockSpec((Mp, block_i), lambda j, i: (0, i)),
            pl.BlockSpec((block_i, block_o), lambda j, i: (i, j)),
            pl.BlockSpec((1, block_o), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((Mp, block_o), lambda j, i: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, wp.shape[1]), x.dtype),
        scratch_shapes=[pltpu.VMEM((Mp, block_o), jnp.float32)],
        interpret=INTERPRET,
    )(xp, wp, sp)
    return out[:M, :O]


def _int8_mm_kernel(x_ref, w_ref, s_ref, o_ref, acc, *, n_inner):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    # int8 -> bf16 is LOSSLESS (|w| <= 127, integers exact in bf16) and a
    # bf16 x bf16 dot runs the MXU's fast path (f32 x f32 is ~3x slower).
    x = x_ref[...].astype(jnp.bfloat16)
    w = w_ref[...].astype(jnp.bfloat16)
    acc[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == n_inner - 1)
    def _finish():
        o_ref[...] = (acc[:] * s_ref[0]).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# x[M, H] @ w[V, H]^T (axis=1 quantization, per-V scales) — the lm_head
# ---------------------------------------------------------------------------


def int8_matmul_t(x: jax.Array, wq: dict, *, block_v: int = 1024,
                  out_dtype=jnp.float32) -> jax.Array:
    """y[M, V] = x[M, H] @ dequant(w[V, H]).T — contraction over H, output
    scaled per V row (w quantized with axis=1). H kept whole in VMEM."""
    w, scale = wq["w_int8"], wq["scale"]
    V, H = w.shape
    if not _use_pallas() and not INTERPRET:
        y = jax.lax.dot_general(
            x, w.astype(x.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y * scale).astype(out_dtype)

    M = x.shape[0]
    Mp = _round_up(M, 8)
    block_v = min(block_v, _round_up(V, 32))
    Hp = _round_up(H, 128)
    xp = jnp.pad(x, ((0, Mp - M), (0, Hp - H)))
    wp = jnp.pad(w, ((0, (-V) % block_v), (0, Hp - H)))
    sp = jnp.pad(scale, (0, (-V) % block_v))[None, :]
    nV = wp.shape[0] // block_v

    out = pl.pallas_call(
        _int8_mmt_kernel,
        grid=(nV,),
        in_specs=[
            pl.BlockSpec((Mp, Hp), lambda j: (0, 0)),
            pl.BlockSpec((block_v, Hp), lambda j: (j, 0)),
            pl.BlockSpec((1, block_v), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((Mp, block_v), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, wp.shape[0]), out_dtype),
        interpret=INTERPRET,
    )(xp, wp, sp)
    return out[:M, :V]


def int8_matmul_t_argmax(x: jax.Array, wq: dict,
                         *, block_v: int = 8192) -> jax.Array:
    """Greedy head: argmax_v of x[M, H] @ dequant(w[V, H]).T in ONE kernel.

    The [M, V] f32 logits never exist in HBM (65 MB per step at the 2B
    vocab — a write plus an argmax re-read the plain head pays every
    token). Gemma's final softcap is monotonic, so argmax is invariant and
    the tanh is skipped. All-NaN rows return index 0, matching
    sanitize_logits (NaN row -> zeros -> argmax = 0). Returns [M] int32.
    """
    w, scale = wq["w_int8"], wq["scale"]
    V, H = w.shape
    if not _use_pallas() and not INTERPRET:
        return jnp.argmax(int8_matmul_t(x, wq), axis=-1).astype(jnp.int32)

    M = x.shape[0]
    Mp = _round_up(M, 8)
    Hp = _round_up(H, 128)
    xp = jnp.pad(x, ((0, Mp - M), (0, Hp - H)))
    # pick a block that divides V exactly AND is a multiple of 128 (the
    # scale block carries block_v on its LANE dim): padding the embedding
    # would be a 600 MB copy that XLA executes INSIDE the decode scan
    # every token (profiled at 1.8 ms/step before this fix). 256000 ->
    # 6400-row blocks; fallback pads only when V has no aligned divisor.
    block_v = min(block_v, _round_up(V, 128))
    exact = next((b for b in range(block_v - block_v % 128, 127, -128)
                  if V % b == 0), None)
    if exact is not None:
        block_v, Vp, wp = exact, V, (w if H == Hp else jnp.pad(
            w, ((0, 0), (0, Hp - H))))
        sp = scale[None, :]
    else:
        Vp = _round_up(V, block_v)
        wp = jnp.pad(w, ((0, Vp - V), (0, Hp - H)))
        sp = jnp.pad(scale, (0, Vp - V))[None, :]
    nV = Vp // block_v

    val, idx = pl.pallas_call(
        functools.partial(_int8_mmt_argmax_kernel, n_inner=nV,
                          block_v=block_v, v_real=V),
        grid=(nV,),
        in_specs=[
            pl.BlockSpec((Mp, Hp), lambda j: (0, 0)),
            pl.BlockSpec((block_v, Hp), lambda j: (j, 0)),
            pl.BlockSpec((1, block_v), lambda j: (0, j)),
        ],
        out_specs=[pl.BlockSpec((Mp, 128), lambda j: (0, 0)),
                   pl.BlockSpec((Mp, 128), lambda j: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((Mp, 128), jnp.float32),
                   jax.ShapeDtypeStruct((Mp, 128), jnp.int32)],
        # [8192, 2304] int8 blocks double-buffered = ~38 MB (the default
        # scoped-vmem cap is 16 MB; the chip has ~128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=INTERPRET,
    )(xp, wp, sp)
    return idx[:M, 0]


def _int8_mmt_argmax_kernel(x_ref, w_ref, s_ref, oval_ref, oidx_ref,
                            *, n_inner, block_v, v_real):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        oval_ref[...] = jnp.full_like(oval_ref, -jnp.inf)
        oidx_ref[...] = jnp.zeros_like(oidx_ref)

    x = x_ref[...].astype(jnp.bfloat16)
    w = w_ref[...].astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * s_ref[0][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1) + j * block_v
    y = jnp.where(col < v_real, y, -jnp.inf)  # mask padded vocab rows

    local_max = jnp.max(y, axis=-1, keepdims=True)             # [M, 1]
    # first index achieving the max (matches jnp.argmax tie-breaking)
    local_arg = jnp.min(
        jnp.where(y >= local_max, col, jnp.iinfo(jnp.int32).max),
        axis=-1, keepdims=True)                                # [M, 1]
    better = local_max > oval_ref[:, 0:1]
    oval_ref[:, 0:1] = jnp.where(better, local_max, oval_ref[:, 0:1])
    oidx_ref[:, 0:1] = jnp.where(better, local_arg, oidx_ref[:, 0:1])


def _int8_mmt_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...].astype(jnp.bfloat16)
    w = w_ref[...].astype(jnp.bfloat16)  # lossless for int8 values
    y = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[...] = (y * s_ref[0][None, :]).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# int4 embedding / lm_head (row-quantized, nibble-packed over H)
# ---------------------------------------------------------------------------


def quantize_int4_rows(w: jax.Array,
                       *, group_size: Optional[int] = None) -> dict:
    """Symmetric int4 for ROW-major lookup tables ([V, H] embeddings):
    values are nibble-packed along H (contiguous halves, like
    quantize_int4), scales per vocab row — or per (row, H-group) with
    group_size, stored TRANSPOSED [H/g, V] so the matmul kernels read them
    with V on the lane dim (no in-kernel transpose).

    Returns {"w_int4": int8 [V, H/2], "scale": f32 [V] or [H/g, V]} — w ≈
    unpack ⊙ scale, values ±7. ARRAYS ONLY (no metadata strings): the table
    lives inside jit-traced param pytrees, so the group size is recovered
    from the scale shape (1-D = per-row, 2-D [H/g, V] ⇒ g = H // rows).
    """
    wf = jnp.asarray(w, jnp.float32)
    V, H = wf.shape
    assert H % 2 == 0, "H must be even to nibble-pack"
    if group_size is None:
        absmax = jnp.max(jnp.abs(wf), axis=1)
        scale = jnp.maximum(absmax, 1e-12) / 7.0          # [V]
        scale_full = scale[:, None]
    else:
        g = group_size
        assert (H // 2) % g == 0, (
            f"group_size {g} must divide H/2 ({H // 2}) so each nibble "
            "half holds whole groups")
        absmax = jnp.max(jnp.abs(wf.reshape(V, H // g, g)), axis=2)
        scale_vg = jnp.maximum(absmax, 1e-12) / 7.0       # [V, H/g]
        scale = scale_vg.T                                 # [H/g, V]
        scale_full = jnp.repeat(scale_vg, g, axis=1)       # [V, H]
    q = jnp.clip(jnp.round(wf / scale_full), -7, 7).astype(jnp.int8)
    lo, hi = q[:, : H // 2], q[:, H // 2:]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, 0x0F), jnp.left_shift(hi, 4)).astype(jnp.int8)
    return {"w_int4": packed, "scale": scale}


def is_quantized_int4_rows(w) -> bool:
    """Rows-packed table: [V, H/2] nibbles + per-row(-group) scales. The
    shape relation distinguishes it from the (never-jit-carried) axis-0
    int4 MLP dicts."""
    if not (isinstance(w, dict) and "w_int4" in w and "scale" in w):
        return False
    s = w["scale"]
    V = w["w_int4"].shape[0]
    return (s.ndim == 1 and s.shape[0] == V) or \
        (s.ndim == 2 and s.shape[1] == V)


def _rows_group(wq: dict) -> Optional[int]:
    """Group size of a rows-packed table, from the scale shape alone."""
    s = wq["scale"]
    if s.ndim == 1:
        return None
    return (2 * wq["w_int4"].shape[1]) // s.shape[0]


def _rows_scale_full(wq: dict) -> jax.Array:
    """[V, H]-broadcastable f32 scale for a rows-packed table."""
    g = _rows_group(wq)
    if g is None:
        return wq["scale"][:, None]
    return jnp.repeat(wq["scale"].T, g, axis=1)  # [V, H]


def dequantize_int4_rows(wq: dict, *, dtype=jnp.float32) -> jax.Array:
    assert is_quantized_int4_rows(wq)
    lo, hi = unpack_int4(wq["w_int4"])
    q = jnp.concatenate([lo, hi], axis=1).astype(jnp.float32)
    return (q * _rows_scale_full(wq)).astype(dtype)


def take_int4_rows(wq: dict, ids: jax.Array) -> jax.Array:
    """Gather + dequantize rows of a rows-packed int4 table (f32 out).
    Only the gathered rows are ever unpacked — the bf16/f32 table never
    materializes (the int8 embed() property, kept at 4 bits)."""
    packed = jnp.take(wq["w_int4"], ids, axis=0)           # [..., H/2]
    lo, hi = unpack_int4(packed)
    q = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    g = _rows_group(wq)
    if g is None:
        return q * jnp.take(wq["scale"], ids, axis=0)[..., None]
    s = jnp.take(wq["scale"], ids, axis=1)                 # [H/g, ...]
    s = jnp.moveaxis(s, 0, -1)                             # [..., H/g]
    return q * jnp.repeat(s, g, axis=-1)


def _int4_mmt_pallas_ok(wq: dict) -> bool:
    V, H2 = wq["w_int4"].shape
    if (2 * H2) % 256 != 0:  # both halves must stay lane-aligned
        return False
    g = _rows_group(wq)
    return g is None or (H2 % g == 0 and g % 128 == 0)


def _int4_mmt_y(x, w_ref, s_ref, group):
    """Shared logits-tile computation for the int4 transposed matmuls:
    y[M, block_v] = x[M, H] @ unpack(w[block_v, H/2]).T ⊙ scale."""
    lo, hi = unpack_int4(w_ref[...])
    lo = lo.astype(jnp.bfloat16)
    hi = hi.astype(jnp.bfloat16)
    H2 = lo.shape[1]
    dn = (((1,), (1,)), ((), ()))
    if group is None:
        y = jax.lax.dot_general(
            x[:, :H2], lo, dn, preferred_element_type=jnp.float32)
        y += jax.lax.dot_general(
            x[:, H2:], hi, dn, preferred_element_type=jnp.float32)
        return y * s_ref[0][None, :]
    nG = H2 // group
    y = jnp.zeros((x.shape[0], w_ref.shape[0]), jnp.float32)
    for gi in range(nG):
        sl = slice(gi * group, (gi + 1) * group)
        y += jax.lax.dot_general(
            x[:, sl], lo[:, sl], dn,
            preferred_element_type=jnp.float32) * s_ref[gi][None, :]
        y += jax.lax.dot_general(
            x[:, H2 + gi * group:H2 + (gi + 1) * group], hi[:, sl], dn,
            preferred_element_type=jnp.float32) * s_ref[nG + gi][None, :]
    return y


def _int4_mmt_kernel(x_ref, w_ref, s_ref, o_ref, *, group):
    y = _int4_mmt_y(x_ref[...].astype(jnp.bfloat16), w_ref, s_ref, group)
    o_ref[...] = y.astype(o_ref.dtype)


def _int4_mmt_argmax_kernel(x_ref, w_ref, s_ref, oval_ref, oidx_ref,
                            *, n_inner, block_v, v_real, group):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        oval_ref[...] = jnp.full_like(oval_ref, -jnp.inf)
        oidx_ref[...] = jnp.zeros_like(oidx_ref)

    y = _int4_mmt_y(x_ref[...].astype(jnp.bfloat16), w_ref, s_ref, group)
    col = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1) + j * block_v
    y = jnp.where(col < v_real, y, -jnp.inf)

    local_max = jnp.max(y, axis=-1, keepdims=True)
    local_arg = jnp.min(
        jnp.where(y >= local_max, col, jnp.iinfo(jnp.int32).max),
        axis=-1, keepdims=True)
    better = local_max > oval_ref[:, 0:1]
    oval_ref[:, 0:1] = jnp.where(better, local_max, oval_ref[:, 0:1])
    oidx_ref[:, 0:1] = jnp.where(better, local_arg, oidx_ref[:, 0:1])


def _int4_scale_spec(wq: dict, block_v: int, pad_v: int):
    """(padded scale operand, BlockSpec) for a rows-packed table's scales."""
    g = _rows_group(wq)
    if g is None:
        sp = jnp.pad(wq["scale"], (0, pad_v))[None, :]
        return sp, pl.BlockSpec((1, block_v), lambda j: (0, j))
    sp = jnp.pad(wq["scale"], ((0, 0), (0, pad_v)))
    return sp, pl.BlockSpec((sp.shape[0], block_v), lambda j: (0, j))


def int4_matmul_t(x: jax.Array, wq: dict, *, block_v: int = 1024,
                  out_dtype=jnp.float32) -> jax.Array:
    """int8_matmul_t at 4 bits: y[M, V] = x[M, H] @ dequant4(w[V, H]).T.
    Halves the lm_head weight stream (590 → 295 MB at the 2B vocab)."""
    assert is_quantized_int4_rows(wq)
    if (not _use_pallas() and not INTERPRET) or not _int4_mmt_pallas_ok(wq):
        y = jax.lax.dot_general(
            x, dequantize_int4_rows(wq, dtype=x.dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        return y.astype(out_dtype)

    w = wq["w_int4"]
    V, H2 = w.shape
    M = x.shape[0]
    Mp = _round_up(M, 8)
    block_v = min(block_v, _round_up(V, 32))
    xp = jnp.pad(x, ((0, Mp - M), (0, 0)))
    pad_v = (-V) % block_v
    wp = jnp.pad(w, ((0, pad_v), (0, 0)))
    sp, s_spec = _int4_scale_spec(wq, block_v, pad_v)
    nV = wp.shape[0] // block_v

    out = pl.pallas_call(
        functools.partial(_int4_mmt_kernel, group=_rows_group(wq)),
        grid=(nV,),
        in_specs=[
            pl.BlockSpec((Mp, 2 * H2), lambda j: (0, 0)),
            pl.BlockSpec((block_v, H2), lambda j: (j, 0)),
            s_spec,
        ],
        out_specs=pl.BlockSpec((Mp, block_v), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, wp.shape[0]), out_dtype),
        interpret=INTERPRET,
    )(xp, wp, sp)
    return out[:M, :V]


def int4_matmul_t_argmax(x: jax.Array, wq: dict,
                         *, block_v: int = 8192) -> jax.Array:
    """int8_matmul_t_argmax at 4 bits: the greedy head streams the packed
    table once per token and the [M, V] logits never exist in HBM. Same
    argmax algebra (softcap monotonic, first-index tie-break)."""
    assert is_quantized_int4_rows(wq)
    if (not _use_pallas() and not INTERPRET) or not _int4_mmt_pallas_ok(wq):
        return jnp.argmax(int4_matmul_t(x, wq), axis=-1).astype(jnp.int32)

    w = wq["w_int4"]
    V, H2 = w.shape
    M = x.shape[0]
    Mp = _round_up(M, 8)
    xp = jnp.pad(x, ((0, Mp - M), (0, 0)))
    # same padding-avoidance as the int8 head: pick a 128-multiple block
    # that divides V exactly so XLA never copies the table inside the scan
    block_v = min(block_v, _round_up(V, 128))
    exact = next((b for b in range(block_v - block_v % 128, 127, -128)
                  if V % b == 0), None)
    if exact is not None:
        block_v, pad_v, wp = exact, 0, w
    else:
        pad_v = (-V) % block_v
        wp = jnp.pad(w, ((0, pad_v), (0, 0)))
    sp, s_spec = _int4_scale_spec(wq, block_v, pad_v)
    nV = wp.shape[0] // block_v

    val, idx = pl.pallas_call(
        functools.partial(_int4_mmt_argmax_kernel, n_inner=nV,
                          block_v=block_v, v_real=V,
                          group=_rows_group(wq)),
        grid=(nV,),
        in_specs=[
            pl.BlockSpec((Mp, 2 * H2), lambda j: (0, 0)),
            pl.BlockSpec((block_v, H2), lambda j: (j, 0)),
            s_spec,
        ],
        out_specs=[pl.BlockSpec((Mp, 128), lambda j: (0, 0)),
                   pl.BlockSpec((Mp, 128), lambda j: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((Mp, 128), jnp.float32),
                   jax.ShapeDtypeStruct((Mp, 128), jnp.int32)],
        # [8000, 1152] packed blocks + the unpacked bf16 pair stay within
        # the raised cap (the int8 head already runs at 64 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=INTERPRET,
    )(xp, wp, sp)
    return idx[:M, 0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(dim: int, target: int, lane: int = 128) -> int:
    """Prefer a lane-aligned block that divides `dim` exactly (within 2x of
    `target`), so the activation/output never need pad/slice ops around the
    kernel — e.g. I=2304 picks 768, not 512 (which would pad to 2560).
    Falls back to `target` when no exact divisor exists."""
    best = None
    b = lane
    while b <= dim and b <= 2 * target:
        if dim % b == 0:
            best = b  # largest exact divisor within 2x of target
        b += lane
    return best if best is not None else target


# ---------------------------------------------------------------------------
# Fused int8 GeGLU MLP: down( gelu_tanh(x@gate) * (x@up) )
# ---------------------------------------------------------------------------


def int8_mlp(x: jax.Array, gate_q: dict, up_q: dict, down_q: dict,
             *, block_f: int = 512) -> jax.Array:
    """One kernel for the whole Gemma-2 MLP with int8 weights.

    Per decode step this is the difference between 3 kernel launches per
    layer (78 total) and 1 (26 total): per-launch overhead at batch-32 decode
    is comparable to the matmul time itself, so fusion — not just byte
    halving — is where int8 pays off. The [M, F] hidden activations live
    only as [M, block_f] tiles in VMEM.

    x: [M, H]; gate/up: axis=0-quantized [H, F]; down: axis=0-quantized
    [F, H]. Returns [M, H] in x.dtype.
    """
    g_w, g_s = gate_q["w_int8"], gate_q["scale"]
    u_w, u_s = up_q["w_int8"], up_q["scale"]
    d_w, d_s = down_q["w_int8"], down_q["scale"]
    H, F = g_w.shape
    if not _use_pallas() and not INTERPRET:
        g = jnp.dot(x, g_w.astype(x.dtype),
                    preferred_element_type=jnp.float32) * g_s
        u = jnp.dot(x, u_w.astype(x.dtype),
                    preferred_element_type=jnp.float32) * u_s
        h = (jax.nn.gelu(g, approximate=True) * u).astype(x.dtype)
        y = jnp.dot(h, d_w.astype(x.dtype),
                    preferred_element_type=jnp.float32) * d_s
        return y.astype(x.dtype)

    M = x.shape[0]
    Mp = _round_up(M, 8)
    Hp = _round_up(H, 128)
    block_f = min(block_f, _round_up(F, 128))
    Fp = _round_up(F, block_f)
    xp = jnp.pad(x, ((0, Mp - M), (0, Hp - H)))
    gp = jnp.pad(g_w, ((0, Hp - H), (0, Fp - F)))
    up = jnp.pad(u_w, ((0, Hp - H), (0, Fp - F)))
    dp = jnp.pad(d_w, ((0, Fp - F), (0, Hp - H)))
    gsp = jnp.pad(g_s, (0, Fp - F))[None, :]
    usp = jnp.pad(u_s, (0, Fp - F))[None, :]
    dsp = jnp.pad(d_s, (0, Hp - H))[None, :]
    nF = Fp // block_f

    out = pl.pallas_call(
        functools.partial(_int8_mlp_kernel, n_inner=nF),
        grid=(nF,),
        in_specs=[
            pl.BlockSpec((Mp, Hp), lambda j: (0, 0)),
            pl.BlockSpec((Hp, block_f), lambda j: (0, j)),
            pl.BlockSpec((Hp, block_f), lambda j: (0, j)),
            pl.BlockSpec((1, block_f), lambda j: (0, j)),
            pl.BlockSpec((1, block_f), lambda j: (0, j)),
            pl.BlockSpec((block_f, Hp), lambda j: (j, 0)),
            pl.BlockSpec((1, Hp), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Mp, Hp), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, Hp), x.dtype),
        scratch_shapes=[pltpu.VMEM((Mp, Hp), jnp.float32)],
        interpret=INTERPRET,
    )(xp, gp, up, gsp, usp, dp, dsp)
    return out[:M, :H]


def int8_ffn(x: jax.Array, fc1_q: dict, b1: jax.Array, fc2_q: dict,
             b2: jax.Array, *, block_f: int = 512) -> jax.Array:
    """One kernel for a classic biased FFN: (gelu_exact(x@fc1 + b1))@fc2 + b2.

    Serves the bridge's FFN at decode (reference bridge FFN is
    Linear->GELU->Linear with biases, bridge_module.py:291-297). Same
    launch-count rationale as `int8_mlp`: at decode batch sizes one launch
    per block beats three matmul dispatches plus elementwise ops. The [M, F]
    hidden exists only as [M, block_f] VMEM tiles.

    x: [M, H]; fc1: axis=0-quantized [H, F]; b1: [F]; fc2: axis=0-quantized
    [F, H]; b2: [H]. Returns [M, H] in x.dtype.
    """
    f1_w, f1_s = fc1_q["w_int8"], fc1_q["scale"]
    f2_w, f2_s = fc2_q["w_int8"], fc2_q["scale"]
    H, F = f1_w.shape
    if not _use_pallas() and not INTERPRET:
        g = jnp.dot(x, f1_w.astype(x.dtype),
                    preferred_element_type=jnp.float32) * f1_s + b1
        h = jax.nn.gelu(g, approximate=False).astype(x.dtype)
        y = jnp.dot(h, f2_w.astype(x.dtype),
                    preferred_element_type=jnp.float32) * f2_s + b2
        return y.astype(x.dtype)

    M = x.shape[0]
    Mp = _round_up(M, 8)
    Hp = _round_up(H, 128)
    block_f = min(block_f, _round_up(F, 128))
    Fp = _round_up(F, block_f)
    xp = jnp.pad(x, ((0, Mp - M), (0, Hp - H)))
    f1p = jnp.pad(f1_w, ((0, Hp - H), (0, Fp - F)))
    f2p = jnp.pad(f2_w, ((0, Fp - F), (0, Hp - H)))
    s1p = jnp.pad(f1_s, (0, Fp - F))[None, :]
    s2p = jnp.pad(f2_s, (0, Hp - H))[None, :]
    b1p = jnp.pad(b1.astype(jnp.float32), (0, Fp - F))[None, :]
    b2p = jnp.pad(b2.astype(jnp.float32), (0, Hp - H))[None, :]
    nF = Fp // block_f

    out = pl.pallas_call(
        functools.partial(_int8_ffn_kernel, n_inner=nF),
        grid=(nF,),
        in_specs=[
            pl.BlockSpec((Mp, Hp), lambda j: (0, 0)),
            pl.BlockSpec((Hp, block_f), lambda j: (0, j)),
            pl.BlockSpec((1, block_f), lambda j: (0, j)),
            pl.BlockSpec((1, block_f), lambda j: (0, j)),
            pl.BlockSpec((block_f, Hp), lambda j: (j, 0)),
            pl.BlockSpec((1, Hp), lambda j: (0, 0)),
            pl.BlockSpec((1, Hp), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Mp, Hp), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, Hp), x.dtype),
        scratch_shapes=[pltpu.VMEM((Mp, Hp), jnp.float32)],
        interpret=INTERPRET,
    )(xp, f1p, s1p, b1p, f2p, s2p, b2p)
    return out[:M, :H]


def _erf_poly(x):
    """Abramowitz & Stegun 7.1.26 erf (max abs err 1.5e-7 — far below bf16
    resolution). Mosaic does not lower the erf/erfc primitives that
    `jax.nn.gelu(approximate=False)` uses, so the kernel computes erf with
    VPU-friendly polynomial ops."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact_poly(x):
    """Erf-based (torch-default) GELU via `_erf_poly` — matches
    `jax.nn.gelu(approximate=False)` to ~1e-7."""
    return 0.5 * x * (1.0 + _erf_poly(x * (2.0 ** -0.5)))


def _int8_ffn_kernel(x_ref, f1_ref, s1_ref, b1_ref, f2_ref, s2_ref, b2_ref,
                     o_ref, acc, *, n_inner):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[...].astype(jnp.bfloat16)
    g = jax.lax.dot_general(
        x, f1_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    g = g * s1_ref[0][None, :] + b1_ref[0][None, :]
    h = _gelu_exact_poly(g).astype(jnp.bfloat16)
    acc[:] += jax.lax.dot_general(
        h, f2_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_inner - 1)
    def _finish():
        o_ref[...] = (acc[:] * s2_ref[0][None, :]
                      + b2_ref[0][None, :]).astype(o_ref.dtype)


def _int8_mlp_kernel(x_ref, g_ref, u_ref, gs_ref, us_ref, d_ref, ds_ref,
                     o_ref, acc, *, n_inner):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[...].astype(jnp.bfloat16)
    g = jax.lax.dot_general(
        x, g_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * gs_ref[0][None, :]
    u = jax.lax.dot_general(
        x, u_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * us_ref[0][None, :]
    h = (jax.nn.gelu(g, approximate=True) * u).astype(jnp.bfloat16)
    acc[:] += jax.lax.dot_general(
        h, d_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_inner - 1)
    def _finish():
        o_ref[...] = (acc[:] * ds_ref[0][None, :]).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# Int4 weight packing (probe stage — not yet wired into the serving path)
# ---------------------------------------------------------------------------
#
# Decode is weight-stream-bound and the MLPs are 80% of the layer bytes
# (1.66 GB of the 2.06 GB int8 stack at 2B): int4 halves that stream, a
# projected ~1.0 ms/token off the 3.07 ms LM stack (DESIGN.md §2 anatomy).
# Packing: two int4 values share one int8 byte along CONTIGUOUS HALVES of
# the contraction axis — packed[k, n] holds (w[k, n] & 0xF) | (w[k + K/2,
# n] << 4). The kernel then computes dot(x[:, :K/2], lo) + dot(x[:, K/2:],
# hi): unpacking needs only bitwise ops and the x slices are contiguous —
# no reshapes, no strided loads, no lane-dim expansion (all Mosaic-hostile,
# see the probed v5e lowering notes in the repo history). Scales stay per
# output channel, symmetric, like int8. On-chip acceptance is decided by
# scripts/int4_mlp_probe.py (same-trace A/B vs int8_mlp); integration into
# gemma2/decode_kernels only follows a measured win.


def quantize_int4(w: jax.Array, *, axis: int = 0,
                  group_size: Optional[int] = None) -> dict:
    """Symmetric int4 quantization, nibble-packed along `axis`.

    group_size=None: per-channel scales (one f32 per output channel, like
    int8). At 4 bits that leaves only 15 levels across the channel's full
    absmax, so a single outlier weight inflates the step for its whole
    column — measured ~24% relative MLP-output error at Gaussian init
    (int8: ~1.3%). group_size=g: scales per (contraction-group, channel) —
    scale[k // g, n] — the standard sub-channel scheme (GPTQ/AWQ-style
    RTN); an outlier now only coarsens its own g-row group. Scale bytes
    grow K/g-fold but stay negligible vs the packed weights (g=128 at
    [2304, 9216]: 663 KB scales vs 10.6 MB nibbles).

    The contraction axis length must be even (and divisible by 2*g with
    grouping, so each nibble half holds whole groups). Returns
    {"w_int4": int8 [K/2, N] (axis=0), "scale": f32 [N] or [K/g, N]} — w ≈
    unpack * scale with values in [-7, 7] (−8 unused, symmetric like
    int8's ±127).
    """
    assert axis == 0 or group_size is None, \
        "group-wise int4 is only implemented for axis=0 (MLP weights)"
    wf = jnp.asarray(w, jnp.float32)
    K = wf.shape[axis]
    assert K % 2 == 0, "contraction axis must be even to nibble-pack"
    if group_size is None:
        absmax = jnp.max(jnp.abs(wf), axis=axis)
        scale = jnp.maximum(absmax, 1e-12) / 7.0
        scale_full = jnp.expand_dims(scale, axis)
    else:
        g = group_size
        assert (K // 2) % g == 0, (
            f"group_size {g} must divide half the contraction axis ({K}//2)"
            " so each nibble half packs whole groups")
        absmax = jnp.max(jnp.abs(wf.reshape(K // g, g, -1)), axis=1)
        scale = jnp.maximum(absmax, 1e-12) / 7.0      # [K/g, N]
        scale_full = jnp.repeat(scale, g, axis=0)     # [K, N]
    q = jnp.clip(jnp.round(wf / scale_full), -7, 7).astype(jnp.int8)
    lo, hi = (q[: K // 2], q[K // 2:]) if axis == 0 else \
             (q[:, : K // 2], q[:, K // 2:])
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, 0x0F), jnp.left_shift(hi, 4)).astype(jnp.int8)
    return {"w_int4": packed, "scale": scale, "packing": "global",
            "group_size": group_size}


def is_quantized_int4(w) -> bool:
    return isinstance(w, dict) and "w_int4" in w


def unpack_int4(packed: jax.Array):
    """int8 [K/2, ...] -> (lo, hi) int8 nibbles, sign-extended.

    Widen to int32 FIRST: v5e Mosaic legalizes neither comparisons
    (`arith.cmpi`) nor shifts (`arith.shli`/`shrsi`) on vector<...xi8> —
    all three refusals were captured live from the remote compiler in the
    r5 round (interpret mode accepts them, which is why only on-chip
    compiles caught it). Sign-extension is then two i32 shifts per nibble:
    `(w << 28) >> 28` for the low one, `(w << 24) >> 28` for the high.
    """
    w = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w, 28), 28).astype(jnp.int8)
    hi = jnp.right_shift(jnp.left_shift(w, 24), 28).astype(jnp.int8)
    return lo, hi


def _scale_rows(wq: dict) -> jax.Array:
    """The [K, N]-broadcastable f32 scale for an axis=0-quantized weight,
    expanding group-wise [K/g, N] scales to full rows when present."""
    g = wq.get("group_size")
    s = wq["scale"]
    return s[None, :] if g is None else jnp.repeat(s, g, axis=0)


def dequantize_int4(wq: dict, *, axis: int = 0, dtype=jnp.float32) -> jax.Array:
    assert wq.get("packing", "global") == "global", wq.get("packing")
    lo, hi = unpack_int4(wq["w_int4"])
    q = jnp.concatenate([lo, hi], axis=axis)
    if axis == 0:
        scale = _scale_rows(wq)
    else:
        scale = jnp.expand_dims(wq["scale"], axis)
    return (q.astype(jnp.float32) * scale).astype(dtype)


def dequantize_int4_blockwise(wq: dict, *, block_f: int,
                              dtype=jnp.float32) -> jax.Array:
    """Dequantize a BLOCK-LOCALLY packed [F/2, H] weight (the layout
    `repack_down_blockwise` produces and `int4_mlp` consumes)."""
    assert wq.get("packing") == f"blockwise{block_f}", wq.get("packing")
    lo, hi = unpack_int4(wq["w_int4"])  # [F/2, H] each
    half = block_f // 2
    F2, H = lo.shape
    nB = F2 // half
    q = jnp.stack([lo.reshape(nB, half, H), hi.reshape(nB, half, H)],
                  axis=1).reshape(2 * F2, H)
    return (q.astype(jnp.float32) * _scale_rows(wq)).astype(dtype)


def int4_mlp(x: jax.Array, gate_q: dict, up_q: dict, down_q: dict,
             *, block_f: int = 512) -> jax.Array:
    """int8_mlp with nibble-packed int4 weights: same fusion, half the bytes.

    gate/up are packed over the full H contraction ([H/2, F] int8); down is
    packed BLOCK-LOCALLY over F (each [block_f, H] tile packs to
    [block_f/2, H] with its nibble partner block_f/2 rows away), so the
    per-block h tile splits into contiguous halves exactly like x does.
    x: [M, H]; returns [M, H] in x.dtype.
    """
    g_w, g_s = gate_q["w_int4"], gate_q["scale"]
    u_w, u_s = up_q["w_int4"], up_q["scale"]
    d_w, d_s = down_q["w_int4"], down_q["scale"]
    H2, F = g_w.shape
    H = 2 * H2
    assert x.shape[1] == H and d_w.shape == (F // 2, H)
    # the blockwise layout is shape-identical to the global one, so a
    # wrongly-packed down projection would compute garbage silently —
    # demand the explicit tag repack_down_blockwise stamps
    assert down_q.get("packing") == f"blockwise{block_f}", (
        f"int4_mlp needs down packed by repack_down_blockwise("
        f"block_f={block_f}); got packing={down_q.get('packing')!r}")
    assert gate_q.get("packing") == "global" and \
        up_q.get("packing") == "global"
    group = gate_q.get("group_size")
    assert up_q.get("group_size") == group and \
        down_q.get("group_size") == group, (
            "gate/up/down must share one group_size: "
            f"{group}/{up_q.get('group_size')}/{down_q.get('group_size')}")
    if not _use_pallas() and not INTERPRET:
        g = jnp.dot(x, dequantize_int4(gate_q, dtype=x.dtype),
                    preferred_element_type=jnp.float32)
        u = jnp.dot(x, dequantize_int4(up_q, dtype=x.dtype),
                    preferred_element_type=jnp.float32)
        h = (jax.nn.gelu(g, approximate=True) * u).astype(x.dtype)
        y = jnp.dot(h, dequantize_int4_blockwise(
                        down_q, block_f=block_f, dtype=x.dtype),
                    preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    M = x.shape[0]
    Mp = _round_up(M, 8)
    assert H % 256 == 0 and F % (2 * block_f) == 0 and block_f % 256 == 0, (
        "int4_mlp probe supports shapes where halves stay lane-aligned "
        f"(H={H}, F={F}, block_f={block_f})")
    xp = jnp.pad(x, ((0, Mp - M), (0, 0)))
    nF = F // block_f

    if group is None:
        kernel = functools.partial(_int4_mlp_kernel, n_inner=nF)
        gs_spec = pl.BlockSpec((1, block_f), lambda j: (0, j))
        ds_spec = pl.BlockSpec((1, H), lambda j: (0, 0))
        gs, us, ds = g_s[None, :], u_s[None, :], d_s[None, :]
    else:
        assert H2 % group == 0 and (block_f // 2) % group == 0, (
            f"group_size {group} must divide H/2={H2} and "
            f"block_f/2={block_f // 2}")
        kernel = functools.partial(_int4_mlp_group_kernel, n_inner=nF,
                                   group=group)
        # gate/up scales: [H/g, F] — every H-group, this j's F columns.
        # down scales: [F/g, H] — this j's block_f/g F-groups, all H. A 2-d
        # (block_f/g, H) block would violate Mosaic's tiling rule (second-
        # minor must be 8-divisible or FULL — block_f/g is 4 at the 2B
        # dims, caught on chip in r5), so the groups-per-block axis becomes
        # its own full-sized dim of a 3-d layout instead.
        gs_spec = pl.BlockSpec((H // group, block_f), lambda j: (0, j))
        ds_spec = pl.BlockSpec((1, block_f // group, H), lambda j: (j, 0, 0))
        gs, us = g_s, u_s
        ds = d_s.reshape(nF, block_f // group, H)

    out = pl.pallas_call(
        kernel,
        grid=(nF,),
        in_specs=[
            pl.BlockSpec((Mp, H), lambda j: (0, 0)),
            pl.BlockSpec((H // 2, block_f), lambda j: (0, j)),
            pl.BlockSpec((H // 2, block_f), lambda j: (0, j)),
            gs_spec,
            gs_spec,
            pl.BlockSpec((block_f // 2, H), lambda j: (j, 0)),
            ds_spec,
        ],
        out_specs=pl.BlockSpec((Mp, H), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, H), x.dtype),
        scratch_shapes=[pltpu.VMEM((Mp, H), jnp.float32)],
        interpret=INTERPRET,
    )(xp, g_w, u_w, gs, us, d_w, ds)
    return out[:M]


def repack_down_blockwise(down_q: dict, *, block_f: int = 512) -> dict:
    """Convert a globally-half-packed [F/2, H] down projection into the
    block-local packing int4_mlp expects (one-time, at quantize time)."""
    assert down_q.get("packing", "global") == "global", down_q.get("packing")
    lo, hi = unpack_int4(down_q["w_int4"])
    q = jnp.concatenate([lo, hi], axis=0)  # [F, H] int4 values in int8
    F, H = q.shape
    assert F % block_f == 0
    half = block_f // 2
    g = down_q.get("group_size")
    assert g is None or half % g == 0, (
        f"group_size {g} must divide block_f//2 ({half}) so each block-local"
        " nibble half holds whole groups")
    qb = q.reshape(F // block_f, 2, half, H)  # per-block halves
    packed = jnp.bitwise_or(
        jnp.bitwise_and(qb[:, 0], 0x0F), jnp.left_shift(qb[:, 1], 4)
    ).astype(jnp.int8).reshape(F // 2, H)
    return {"w_int4": packed, "scale": down_q["scale"],
            "packing": f"blockwise{block_f}", "group_size": g}


def _int4_mlp_kernel(x_ref, g_ref, u_ref, gs_ref, us_ref, d_ref, ds_ref,
                     o_ref, acc, *, n_inner):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    H2 = g_ref.shape[0]
    x_lo = x_ref[:, :H2].astype(jnp.bfloat16)
    x_hi = x_ref[:, H2:].astype(jnp.bfloat16)

    def mm_packed(xl, xh, p_ref, s_row):
        lo, hi = unpack_int4(p_ref[...])
        r = jax.lax.dot_general(
            xl, lo.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r += jax.lax.dot_general(
            xh, hi.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return r * s_row[None, :]

    g = mm_packed(x_lo, x_hi, g_ref, gs_ref[0])
    u = mm_packed(x_lo, x_hi, u_ref, us_ref[0])
    h = (jax.nn.gelu(g, approximate=True) * u).astype(jnp.bfloat16)
    F2 = d_ref.shape[0]
    d_lo, d_hi = unpack_int4(d_ref[...])
    acc[:] += jax.lax.dot_general(
        h[:, :F2], d_lo.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc[:] += jax.lax.dot_general(
        h[:, F2:], d_hi.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_inner - 1)
    def _finish():
        o_ref[...] = (acc[:] * ds_ref[0][None, :]).astype(o_ref.dtype)


def _int4_mlp_group_kernel(x_ref, g_ref, u_ref, gs_ref, us_ref, d_ref,
                           ds_ref, o_ref, acc, *, n_inner, group):
    """`_int4_mlp_kernel` with sub-channel (group-wise) scales.

    Scales vary along the CONTRACTION axis, so they cannot fold into one
    output multiply — each g-row group gets its own dot and its scale is
    applied to that partial [M, block] product before accumulation. The
    group loop is a statically unrolled Python loop over STATIC slices:
    no reshapes/gathers (Mosaic-hostile on v5e); per group that is one
    [M, g] x [g, block] MXU dot plus one VPU multiply-add on [M, block].
    The unpack still happens once per whole tile.
    """
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    H2 = g_ref.shape[0]
    nG = H2 // group  # groups per nibble half of the H contraction
    x = x_ref[...].astype(jnp.bfloat16)

    def mm_packed_grouped(p_ref, s_ref):
        # scale rows 0..nG cover the lo nibbles (K rows 0..H/2), rows
        # nG..2nG the hi nibbles (K rows H/2..H) — quantize_int4 packs
        # contiguous K-halves, so group k//g maps exactly onto these.
        lo, hi = unpack_int4(p_ref[...])
        lo = lo.astype(jnp.bfloat16)
        hi = hi.astype(jnp.bfloat16)
        r = 0.0
        for i in range(nG):
            sl = slice(i * group, (i + 1) * group)
            r += jax.lax.dot_general(
                x[:, sl], lo[sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * s_ref[i][None, :]
            r += jax.lax.dot_general(
                x[:, H2 + i * group:H2 + (i + 1) * group], hi[sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) \
                * s_ref[nG + i][None, :]
        return r

    g = mm_packed_grouped(g_ref, gs_ref)
    u = mm_packed_grouped(u_ref, us_ref)
    h = (jax.nn.gelu(g, approximate=True) * u).astype(jnp.bfloat16)

    F2 = d_ref.shape[0]  # block_f / 2
    nGd = F2 // group    # groups per nibble half of this down block
    d_lo, d_hi = unpack_int4(d_ref[...])
    d_lo = d_lo.astype(jnp.bfloat16)
    d_hi = d_hi.astype(jnp.bfloat16)
    # ds_ref rows are this block's logical F-groups: rows 0..nGd scale the
    # block-local lo half, rows nGd..2*nGd the hi half (repack_down_blockwise
    # splits each block into contiguous halves the same way).
    for i in range(nGd):
        sl = slice(i * group, (i + 1) * group)
        acc[:] += jax.lax.dot_general(
            h[:, sl], d_lo[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * ds_ref[0, i][None, :]
        acc[:] += jax.lax.dot_general(
            h[:, F2 + i * group:F2 + (i + 1) * group], d_hi[sl],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * ds_ref[0, nGd + i][None, :]

    @pl.when(j == n_inner - 1)
    def _finish():
        o_ref[...] = acc[:].astype(o_ref.dtype)

"""On-chip probe: int4 nibble-packed MLP vs int8 at the 2B decode shape.

Decode is weight-stream-bound (DESIGN.md §2: LM stack 3.07 ms/token at 90%
of a 2.78 ms floor, of which the 26 MLPs are ~1.66 GB of the 2.06 GB int8
stream). int4 halves the MLP bytes — projected ~1.0 ms/token. This probe
decides whether Mosaic lowers the unpack (bitwise and/where/arithmetic
right-shift on int8 vectors) efficiently enough to realize it, BEFORE any
integration into the serving kernels.

Method (same-process, same-trace, interleaved — scripts/decode_ab.py
methodology): one jitted program per variant runs `tokens` iterations of a
26-layer scan of the fused MLP kernel at [B=64, H=2304] x [H, F=9216], so
every iteration re-streams all 26 layers' weights from HBM exactly like a
decode step. Accept at >=1.25x (byte ratio is 2x on the MLP stream; the
unpack VPU work and the halved DMA grain eat some of it).

Usage: python scripts/int4_mlp_probe.py [--tokens 20] [--reps 5]
       [--output perf/int4_mlp_probe.json]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=2304)
    ap.add_argument("--ffn", type=int, default=9216)
    ap.add_argument("--layers", type=int, default=26)
    ap.add_argument("--tokens", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--block-f", type=int, default=512)
    ap.add_argument("--group-size", type=int, default=128,
                    help="sub-channel scale group for the group-wise int4 "
                         "contender (must divide hidden/2 and block_f/2)")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                    help="force a JAX backend (cpu = harness smoke; the "
                         "kernels then run via the jnp fallback)")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu":
            os.environ.setdefault("VLM_BRIDGE_DISABLE_PALLAS", "1")

    from vlm_bridge_tpu.ops import quant

    B, H, F, L = args.batch, args.hidden, args.ffn, args.layers
    G = args.group_size
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(0, 1, (B, H)), jnp.bfloat16)

    # L distinct layers so nothing can be cached across the scan. Build
    # one layer at a time and keep only the quantized forms (the f32
    # originals are ~255 MB/layer — holding all 26 would not fit a 16 GB
    # chip next to the stacks); layer 0's f32 stays for the quality bound.
    print(f"building {L} layers ({L * 3 * H * F / 2**30:.2f} G f32 "
          f"transient)...", file=sys.stderr)
    # quantize_int4 dicts carry static metadata ("packing", "group_size")
    # that cannot ride through jnp.stack / lax.scan — strip to the array
    # leaves for stacking and reattach the tags inside the scan body.
    def arrays_only(wq):
        return {k: v for k, v in wq.items() if isinstance(v, jax.Array)}

    def quant4_layer(gate, up, down, group_size):
        full = {"gate": quant.quantize_int4(gate, group_size=group_size),
                "up": quant.quantize_int4(up, group_size=group_size),
                "down": quant.repack_down_blockwise(
                    quant.quantize_int4(down, group_size=group_size),
                    block_f=args.block_f)}
        return {k: arrays_only(v) for k, v in full.items()}

    def tag_layer(w, group_size):
        """Reattach the static metadata to one scan-sliced int4 layer."""
        return (dict(w["gate"], packing="global", group_size=group_size),
                dict(w["up"], packing="global", group_size=group_size),
                dict(w["down"], packing=f"blockwise{args.block_f}",
                     group_size=group_size))

    q8, q4s, q4gs, f32_0 = [], [], [], None
    for i in range(L):
        r = np.random.default_rng(100 + i)
        gate = jnp.asarray(r.normal(0, 0.02, (H, F)), jnp.float32)
        up = jnp.asarray(r.normal(0, 0.02, (H, F)), jnp.float32)
        down = jnp.asarray(r.normal(0, 0.02, (F, H)), jnp.float32)
        q8.append({"gate": quant.quantize_int8(gate),
                   "up": quant.quantize_int8(up),
                   "down": quant.quantize_int8(down)})
        q4s.append(quant4_layer(gate, up, down, None))
        q4gs.append(quant4_layer(gate, up, down, G))
        if i == 0:
            f32_0 = (gate, up, down)
        del gate, up, down  # free the f32 buffers before the next layer
    stack8 = jax.tree.map(lambda *xs: jnp.stack(xs), *q8)
    del q8
    stack4 = jax.tree.map(lambda *xs: jnp.stack(xs), *q4s)
    del q4s
    stack4g = jax.tree.map(lambda *xs: jnp.stack(xs), *q4gs)
    del q4gs
    g0, u0, d0 = f32_0

    # quality bound at this shape: int4 vs f32 MLP relative output error
    def mlp_f32(x, g, u, d):
        h = jax.nn.gelu(x.astype(jnp.float32) @ g, approximate=True) \
            * (x.astype(jnp.float32) @ u)
        return h @ d

    y_f32 = mlp_f32(x0, g0, u0, d0)
    y_i4 = quant.int4_mlp(
        x0, *tag_layer(jax.tree.map(lambda s: s[0], stack4), None),
        block_f=args.block_f).astype(jnp.float32)
    y_i4g = quant.int4_mlp(
        x0, *tag_layer(jax.tree.map(lambda s: s[0], stack4g), G),
        block_f=args.block_f).astype(jnp.float32)
    y_i8 = quant.int8_mlp(x0, *(jax.tree.map(lambda s: s[0], stack8)[k]
                                for k in ("gate", "up", "down")),
                          block_f=args.block_f).astype(jnp.float32)
    rel4 = float(jnp.linalg.norm(y_i4 - y_f32) / jnp.linalg.norm(y_f32))
    rel4g = float(jnp.linalg.norm(y_i4g - y_f32) / jnp.linalg.norm(y_f32))
    rel8 = float(jnp.linalg.norm(y_i8 - y_f32) / jnp.linalg.norm(y_f32))
    print(f"rel output err vs f32: int8={rel8:.4f} int4={rel4:.4f} "
          f"int4_g{G}={rel4g:.4f}", file=sys.stderr)

    @functools.partial(jax.jit, static_argnames=("which", "tokens"))
    def run(x, stack, which, tokens):
        def token(x, _):
            def layer(x, w):
                if which == "int8":
                    y = quant.int8_mlp(x, w["gate"], w["up"], w["down"],
                                       block_f=args.block_f)
                else:
                    gs = G if which == "int4_group" else None
                    y = quant.int4_mlp(x, *tag_layer(w, gs),
                                       block_f=args.block_f)
                # residual keeps magnitudes bounded over L*T iterations
                return (x + 0.01 * y).astype(x.dtype), None
            x, _ = jax.lax.scan(layer, x, stack)
            return x, None
        x, _ = jax.lax.scan(token, x, None, length=tokens)
        return x

    variants = (("int8", stack8), ("int4", stack4),
                ("int4_group", stack4g))
    N = args.tokens
    for which, stack in variants:
        t0 = time.time()
        np.asarray(run(x0, stack, which, N))       # compile both loop
        np.asarray(run(x0, stack, which, 2 * N))   # lengths up front
        print(f"{which} compile+warm {time.time() - t0:.0f}s",
              file=sys.stderr)

    # Two-point (N, 2N) timing: on a tunneled device every host fence pays
    # a ~25 ms RPC round trip — the same order as the ~50 ms loop under
    # test, which would inflate both variants equally and bias the RATIO
    # toward 1 (encoder_mm_ab.py records the same failure mode). The
    # difference of the two runs cancels the constant dispatch+RTT+fence
    # overhead exactly: per_token = (t_2N - t_N) / N.
    times = {which: [] for which, _ in variants}
    noisy_reps = 0
    for rep in range(args.reps):
        for which, stack in variants:
            t0 = time.time()
            np.asarray(run(x0, stack, which, N))
            t1 = time.time()
            np.asarray(run(x0, stack, which, 2 * N))
            t2 = time.time()
            est = ((t2 - t1) - (t1 - t0)) / N
            # timing noise can make the 2N run faster than the N run,
            # yielding a negative per-token estimate that poisons the
            # median/ratio — clamp to a positive floor and count it so a
            # noise-dominated artifact is visibly flagged
            if est <= 0:
                noisy_reps += 1
                est = 1e-9
            times[which].append(est)
        print(f"rep {rep}: " + " ".join(
            f"{k}={v[-1] * 1e3:.2f}ms/tok" for k, v in times.items()),
            file=sys.stderr)

    med8 = float(np.median(times["int8"]))
    med4 = float(np.median(times["int4"]))
    med4g = float(np.median(times["int4_group"]))
    result = {
        "metric": "int4_mlp_speedup_vs_int8",
        "value": med8 / med4,
        "unit": "x",
        "batch": B, "hidden": H, "ffn": F, "layers": L,
        "tokens": args.tokens, "reps": args.reps, "block_f": args.block_f,
        "int8_ms_per_token": med8 * 1e3,
        "int4_ms_per_token": med4 * 1e3,
        "int4_group_ms_per_token": med4g * 1e3,
        "int4_group_speedup_vs_int8": med8 / med4g,
        "group_size": G,
        "rel_err_int8_vs_f32": rel8,
        "rel_err_int4_vs_f32": rel4,
        "rel_err_int4_group_vs_f32": rel4g,
        "accept_threshold": 1.25,
        # a clamped (noise-dominated) median sits at the 1e-9 floor; any
        # median below 1 µs/token means the measurement is garbage, so no
        # verdict can be accepted from it
        "accepted": (med8 / med4 >= 1.25
                     and min(med8, med4) > 1e-6),
        "accepted_group": (med8 / med4g >= 1.25
                           and min(med8, med4g) > 1e-6),
        "noisy_reps_clamped": noisy_reps,
        "device": str(jax.devices()[0]),
        "note": ("per-'token' time = one 26-layer MLP weight stream, "
                 "two-point (N,2N) timing so the tunnel RTT cancels; "
                 "byte ratio is 2x on the MLP stream, accept >= 1.25x; "
                 "int4_group adds sub-channel scales (quality) at the cost "
                 "of per-group dots — serving integration would pick it "
                 "only if BOTH accepted_group and real-weight quality "
                 "hold"),
    }
    print(json.dumps(result))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

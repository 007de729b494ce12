"""Aggregate per-op device times from a jax.profiler xplane.pb trace.

The tensorboard_plugin_profile converter is protobuf-version-locked in this
image; the raw xplane proto (shipped inside tensorflow.tsl) parses fine, so
this reads the TPU device plane directly and aggregates event durations by
name across the "XLA Ops" / "XLA Modules" lines.

Usage: python scripts/xplane_ops.py TRACE.xplane.pb [--line "XLA Ops"]
       [--top 50] [--merge-fusion-digits]
"""

import argparse
import collections
import glob
import os
import re
import sys


def load_xspace(path):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def aggregate(xspace, line_filter=None, merge_digits=False):
    """{plane: {line: {name: (total_ps, count)}}} for device planes."""
    out = {}
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_names = dict(plane.event_metadata.items())
        lines = {}
        for line in plane.lines:
            if line_filter and line_filter not in line.name:
                continue
            agg = collections.defaultdict(lambda: [0, 0])
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                if merge_digits:
                    name = re.sub(r"[0-9]+", "#", name)
                agg[name][0] += ev.duration_ps
                agg[name][1] += 1
            if agg:
                lines[line.name] = agg
        if lines:
            out[plane.name] = lines
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help="xplane.pb path or a dir to glob")
    ap.add_argument("--line", default=None,
                    help="only lines whose name contains this")
    ap.add_argument("--top", type=int, default=50)
    ap.add_argument("--merge-fusion-digits", action="store_true",
                    help="merge fusion.1/fusion.2/... into one bucket")
    args = ap.parse_args()

    path = args.trace
    if os.path.isdir(path):
        cands = sorted(glob.glob(
            os.path.join(path, "**", "*.xplane.pb"), recursive=True))
        if not cands:
            sys.exit(f"no xplane.pb under {path}")
        path = cands[-1]
        print(f"# {path}")

    planes = aggregate(load_xspace(path), args.line,
                       args.merge_fusion_digits)
    for plane, lines in planes.items():
        for lname, agg in lines.items():
            total_ms = sum(v[0] for v in agg.values()) / 1e9
            n_events = sum(v[1] for v in agg.values())
            print(f"\n== plane={plane!r} line={lname!r} "
                  f"total={total_ms:.3f} ms events={n_events}")
            rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
            for name, (ps, cnt) in rows[:args.top]:
                print(f"{ps/1e9:10.3f} ms {cnt:7d}x  {name[:110]}")


if __name__ == "__main__":
    main()

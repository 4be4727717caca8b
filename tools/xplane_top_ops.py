"""Aggregate device op self-times from a JAX/TPU xplane profile.

Usage: python tools/xplane_top_ops.py <trace.xplane.pb> [top_n]

Walks the TPU device plane(s) of the XSpace proto and prints total duration
grouped by (a) raw HLO event name and (b) a coarse category (conv fwd/bwd,
matmul, resize, BN-ish elementwise, copy, etc.), so hot spots are visible
without a tensorboard UI.  Used for the VERDICT round-2 MFU analysis.
"""

import collections
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def categorize(name: str) -> str:
    n = name.lower()
    if "convolution" in n or re.search(r"\bconv", n):
        return "convolution"
    if "dot" in n or "matmul" in n or "einsum" in n:
        return "dot"
    if "resize" in n or "gather" in n:
        return "gather/resize"
    if "scatter" in n:
        return "scatter"
    if "reduce" in n:
        return "reduce"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "copy/transpose"
    if "fusion" in n:
        return "fusion(other)"
    if "all-gather" in n or "all-reduce" in n or "collective" in n:
        return "collective"
    if "infeed" in n or "outfeed" in n:
        return "infeed/outfeed"
    return "other"


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for p in xs.planes:
        print(f"# plane {p.name!r}: {len(p.lines)} lines, "
              f"{sum(len(l.events) for l in p.lines)} events")

    by_name = collections.Counter()
    by_cat = collections.Counter()
    calls = collections.Counter()
    total = 0
    for p in xs.planes:
        if "TPU" not in p.name and "/device" not in p.name.lower():
            continue
        meta = {m.id: m.name for m in p.event_metadata.values()}
        for line in p.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip step/module summary lines
            if "step" in lname or "module" in lname:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e12
                by_name[name] += dur
                calls[name] += 1
                by_cat[categorize(name)] += dur
                total += dur

    print(f"\ntotal device op time: {total * 1e3:.1f} ms")
    print("\n== by category ==")
    for cat, t in by_cat.most_common():
        print(f"{t * 1e3:9.2f} ms  {100 * t / max(total, 1e-12):5.1f}%  {cat}")
    print(f"\n== top {top_n} ops ==")
    for name, t in by_name.most_common(top_n):
        print(f"{t * 1e3:9.2f} ms {100 * t / max(total, 1e-12):5.1f}% "
              f"x{calls[name]:<5d} {name[:140]}")


if __name__ == "__main__":
    main()

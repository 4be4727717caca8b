"""Aggregate device op self-times from a JAX/TPU xplane profile.

Usage: python tools/xplane_top_ops.py <trace.xplane.pb> [top_n]

Walks the TPU device plane(s) of the XSpace proto and prints, per device
line (hardware queue), total SELF time grouped by (a) raw HLO event name
and (b) a coarse category (conv, dot, gather, reduce, copy, ...).

Self-time is computed per line with interval nesting: events on one line
form a forest by time containment (e.g. a `while` wrapper spans its body
ops); a parent's self time excludes its DIRECT children.  Lines are
reported separately because they are parallel hardware queues (compute
core vs async DMA streams) — summing across lines double-counts
overlapped time, which inflated the first HRNetPN profile ~6x.
"""

import collections
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def categorize(name: str) -> str:
    # Bucket on the op NAME (the HLO lhs), never the full instruction
    # text: operand lists routinely mention %copy-done/%convolution/...
    # which mis-bucketed 80% of a capture as copy/transpose (round-5
    # flagship profile postmortem — the round-4 PERF.md note "operand
    # names alias" was about exactly this).
    n = name.split(" = ")[0].lower()
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


def line_self_times(line, meta):
    """(name -> self_seconds, name -> calls) for one XLine via containment
    nesting: parent self time excludes direct children."""
    evs = sorted(
        ((ev.offset_ps, ev.offset_ps + ev.duration_ps,
          meta.get(ev.metadata_id, str(ev.metadata_id)))
         for ev in line.events),
        key=lambda t: (t[0], -t[1]))
    self_ps = collections.Counter()
    calls = collections.Counter()
    stack = []  # (start, end, name)
    for start, end, name in evs:
        while stack and stack[-1][1] <= start:
            stack.pop()
        if stack:  # direct parent loses this child's span
            self_ps[stack[-1][2]] -= min(end, stack[-1][1]) - start
        self_ps[name] += end - start
        calls[name] += 1
        stack.append((start, end, name))
    return ({n: v / 1e12 for n, v in self_ps.items()}, calls)


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for p in xs.planes:
        print(f"# plane {p.name!r}: {len(p.lines)} lines, "
              f"{sum(len(l.events) for l in p.lines)} events")

    for p in xs.planes:
        if "TPU" not in p.name and "/device" not in p.name.lower():
            continue
        meta = {m.id: m.name for m in p.event_metadata.values()}
        for line in p.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip step/module summaries
            if "step" in lname or "module" in lname:
                continue
            if not line.events:
                continue
            by_name, calls = line_self_times(line, meta)
            total = sum(by_name.values())
            span = (max(ev.offset_ps + ev.duration_ps
                        for ev in line.events)
                    - min(ev.offset_ps for ev in line.events)) / 1e12
            print(f"\n==== line {line.name!r}: {len(line.events)} events, "
                  f"self total {total * 1e3:.1f} ms, span {span * 1e3:.1f} ms")
            by_cat = collections.Counter()
            for n, v in by_name.items():
                by_cat[categorize(n)] += v
            for cat, t in by_cat.most_common():
                print(f"{t * 1e3:9.2f} ms  {100 * t / max(total, 1e-12):5.1f}%"
                      f"  {cat}")
            print(f"-- top {top_n} ops --")
            top = sorted(by_name.items(), key=lambda kv: -kv[1])[:top_n]
            for name, t in top:
                print(f"{t * 1e3:9.2f} ms {100 * t / max(total, 1e-12):5.1f}% "
                      f"x{calls[name]:<5d} {name[:140]}")


if __name__ == "__main__":
    main()

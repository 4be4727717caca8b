"""Model summary: per-module parameter table + compiled FLOPs.

Reference: `HRNet-Semantic-Segmentation/lib/utils/modelsummary.py`
(`get_model_summary`, layer-wise params/FLOPs dump called from
tools/train.py:88).  Here the FLOP count comes from XLA's own cost analysis
of the compiled forward — exact for the program that actually runs."""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import numpy as np
import jax


def param_table(params: Dict, max_depth: int = 2) -> str:
    """Markdown-ish table of parameter counts grouped to max_depth."""
    rows: Dict[str, int] = {}

    def walk(tree, path):
        if hasattr(tree, "items"):
            for k, v in tree.items():
                walk(v, path + (k,))
        else:
            key = "/".join(path[:max_depth])
            rows[key] = rows.get(key, 0) + int(np.prod(tree.shape))

    walk(params, ())
    total = sum(rows.values())
    width = max((len(k) for k in rows), default=10) + 2
    lines = [f"{'module':<{width}} params"]
    for k in sorted(rows):
        lines.append(f"{k:<{width}} {rows[k]:,}")
    lines.append(f"{'TOTAL':<{width}} {total:,}")
    return "\n".join(lines)


def count_params(params: Dict) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def compiled_flops(fn: Callable, *args, **kwargs) -> Optional[float]:
    """FLOPs of the jit-compiled fn(*args) per XLA cost analysis."""
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


def model_summary(model, variables, *example_args, **kwargs) -> str:
    """get_model_summary analog: param table + forward GFLOPs."""
    table = param_table(variables["params"])

    def fwd(v, *a):
        return model.apply(v, *a, train=False, **kwargs)

    flops = compiled_flops(fwd, variables, *example_args)
    out = [table]
    if flops is not None and np.isfinite(flops):
        out.append(f"forward FLOPs: {flops / 1e9:.3f} G")
    return "\n".join(out)

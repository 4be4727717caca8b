"""Windowed one-hot grouping: MXU-matmul replacement for the SA-MSG
neighbor gather and its backward scatter-add.

Context (PERF.md round-3 HRNetPN profile): after project-then-group, the
grouping `take_along_axis` fusions and their grad scatter-adds are ~48%
of the bs64 step (forward row gathers at 16-100 GB/s effective, the L0
backward scatter at ~4 GB/s — XLA lowers scatter via sort).  The indices
are NOT random, though: `depth2pts` emits raster-sorted samples and FPS
center indices are re-sorted ascending, so a neighbor index lies within a
measured, bounded window of its center's table position
(tools/measure_group_window.py: max |idx - linear_base| per level/scale
47..510 on representative smooth-depth batches).

The kernel exploits that: for a tile of TM centers with static base
ws = t*TM*stride, build the one-hot matrix over the window on the fly in
VMEM and compute

    out[r, :]   = onehot[r, :] @ table[ws : ws+TW, :]        (forward)
    partial[:, :] = onehot^T   @ grad_out[tile]              (backward)

— both MXU dots; neither the one-hot nor any random row DMA ever touches
HBM.  The backward emits per-tile window partials which a static
overlap-add (stride TM*stride, K = TW/(TM*stride) diagonals) folds into
grad_table at full HBM bandwidth.  This is the TPU-shaped equivalent of
the reference's fused CUDA QueryAndGroup/group_points kernels
(`pycontrast/networks/pointnet2/src/group_points_gpu.cu:9-90`); a direct
Mosaic row-gather port is impossible (no dynamic-gather lowering —
PERF.md "Fused Mosaic kernel: rejected with evidence").

Exactness: out-of-window indices are clamped to the nearest real row of
the window.  A whole-batch `lax.cond` falls back to the exact XLA gather
whenever any sample that is NOT row-uniform violates its window; for
row-uniform samples (the zero point clouds of `use_depth=0` images, or
single-valid-pixel clouds) every table row is identical and index
substitution is value- AND gradient-exact (all row gradients funnel to
the same source pixel, and dW depends only on the row-grad sum, which
clamping preserves).  Forward results on the fast path are bit-exact row
copies (one-hot dot passes each bf16/f32 value through a single f32
accumulate); backward accumulates in f32 where the XLA fallback adds in
the value dtype, so grads may differ by accumulation rounding only.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RSUB = 512  # one-hot sub-chunk rows (VMEM: RSUB x TW bf16)


def _round_window(window: int, tms: int) -> Tuple[int, int]:
    """Round the half-window up so TW = TMS + 2W is a TMS multiple.
    Returns (W, K) with K = TW // TMS (overlap-add diagonal count)."""
    k = -(-2 * window // tms) + 1
    return (k - 1) * tms // 2, k


def _prec(dtype):
    """MXU pass count for the one-hot dots.  bf16 operands are native
    single-pass and exact.  f32 operands at DEFAULT precision run ONE
    bf16 pass — the 'copied' rows come back bf16-rounded (observed as a
    100%-of-elements small-relative-error forward mismatch at f32; the
    first probe of it passed only because its integer-valued test data is
    bf16-exact).  HIGHEST splits each f32 into 3 bf16 limbs; the one-hot
    side splits exactly (1.0, 0, 0), so every product re-sums the full
    24-bit mantissa and the row copy is bit-exact again."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dtype) == jnp.float32 else jax.lax.Precision.DEFAULT)


def _load_rows(gidx_ref):
    """(RB, 1) int32 query rows from the gidx block.

    The block arrives either as (RB, 1) — legacy — or lane-packed as
    (RB//128, 128): the flat (B, RB, 1) HBM tensor tiles its size-1 lane
    dim at 1/128 lane utilization (a 128x physical inflation — the
    relayout copies writing it cost ~6 ms EACH at the sa0 shapes, two
    per call site fwd + bwd, round-4 profile).  The packed form is a
    pure bitcast of the row-major ball-query output, so no HBM relayout
    runs at all.

    The lanes->sublanes unpack CANNOT be a reshape: Mosaic has no
    (RB//128, 128) -> (RB, 1) shape cast (round-4 on-chip compile error:
    "infer-vector-layout: unsupported shape cast").  Instead each
    128-query band transposes via sublane-broadcast + identity mask +
    lane reduce — sum_l eye[s, l] * band[0, l] = band[0, s] — all plain
    VPU ops Mosaic lowers, ~16K elementwise ops per band (trivial next
    to the one-hot MXU dots this feeds)."""
    g = gidx_ref[...]
    if g.shape[-1] == 1:
        return g
    bands, lanes = g.shape
    eye = (jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1))
    cols = [jnp.sum(jnp.where(eye, g[r:r + 1, :], 0), axis=1, keepdims=True)
            for r in range(bands)]
    return jnp.concatenate(cols, axis=0)


def _fwd_kernel(gidx_ref, table_ref, out_ref, *, tw, tms, w, n, rsub):
    t = pl.program_id(1)
    ws = t * tms
    win = table_ref[pl.ds(ws, tw), :]  # (TW, C)
    lo = jnp.maximum(0, w - ws)  # clamp to REAL rows inside the window
    hi = jnp.minimum(tw - 1, w + n - 1 - ws)
    g = _load_rows(gidx_ref)  # (RB, 1) int32, unpadded table coords
    rel = jnp.clip(g + (w - ws), lo, hi)
    rb = g.shape[0]
    for k0 in range(0, rb, rsub):
        r = rel[k0:k0 + rsub]
        oh = (r == jax.lax.broadcasted_iota(jnp.int32, (r.shape[0], tw), 1))
        out_ref[k0:k0 + rsub, :] = jax.lax.dot(
            oh.astype(win.dtype), win, precision=_prec(win.dtype),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(gidx_ref, gout_ref, part_ref, *, tw, tms, w, n, rsub):
    t = pl.program_id(1)
    ws = t * tms
    lo = jnp.maximum(0, w - ws)
    hi = jnp.minimum(tw - 1, w + n - 1 - ws)
    g = _load_rows(gidx_ref)
    rel = jnp.clip(g + (w - ws), lo, hi)
    rb = g.shape[0]
    # bf16 cotangents are exact under a single bf16 pass (the one-hot side
    # is 0/1); f32 cotangents need the 3-limb split to avoid rounding each
    # product to bf16 before the f32 accumulate (see _prec).
    prec = _prec(gout_ref.dtype)
    acc = jnp.zeros((tw, part_ref.shape[1]), jnp.float32)
    for k0 in range(0, rb, rsub):
        r = rel[k0:k0 + rsub]
        oh = (r == jax.lax.broadcasted_iota(jnp.int32, (r.shape[0], tw), 1))
        go = gout_ref[k0:k0 + rsub, :].astype(jnp.float32)
        # (TW, C) += oh^T @ go, contracting the row axis
        acc = acc + jax.lax.dot_general(
            oh.astype(jnp.float32), go, (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
    part_ref[...] = acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _windowed_gather(table_pad, gidx_flat, w, tms, n, interpret):
    out, _ = _windowed_gather_fwd(table_pad, gidx_flat, w, tms, n, interpret)
    return out


def _windowed_gather_fwd(table_pad, gidx_flat, w, tms, n, interpret):
    b, npad, c = table_pad.shape
    # gidx_flat is (B, RB, 1) legacy or lane-packed (B, RB//128, 128)
    rb = gidx_flat.shape[1] * gidx_flat.shape[2]
    t_tiles = n // tms
    tw = tms + 2 * w
    rsub = min(_RSUB, rb // t_tiles)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tw=tw, tms=tms, w=w, n=n, rsub=rsub),
        grid=(b, t_tiles),
        in_specs=[
            pl.BlockSpec((None, gidx_flat.shape[1] // t_tiles,
                          gidx_flat.shape[2]), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, npad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, rb // t_tiles, c),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rb, c), table_pad.dtype),
        interpret=interpret,
    )(gidx_flat, table_pad)
    # zero-size dtype token: custom_vjp residuals must be JAX types
    return out, (gidx_flat, jnp.zeros((0,), table_pad.dtype))


def _windowed_gather_bwd(w, tms, n, interpret, res, gout):
    gidx_flat, dtype_token = res
    b, _, c = gout.shape
    npad = n + 2 * w
    tdtype = dtype_token.dtype
    rb = gidx_flat.shape[1] * gidx_flat.shape[2]
    t_tiles = n // tms
    tw = tms + 2 * w
    k = tw // tms
    rsub = min(_RSUB, rb // t_tiles)
    part = pl.pallas_call(
        functools.partial(_bwd_kernel, tw=tw, tms=tms, w=w, n=n, rsub=rsub),
        grid=(b, t_tiles),
        in_specs=[
            pl.BlockSpec((None, gidx_flat.shape[1] // t_tiles,
                          gidx_flat.shape[2]), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rb // t_tiles, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, None, tw, c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_tiles, tw, c), jnp.float32),
        interpret=interpret,
    )(gidx_flat, gout)
    # static overlap-add: window t covers padded rows [t*TMS, t*TMS + TW)
    part = part.reshape(b, t_tiles, k, tms, c)
    acc = jnp.zeros((b, t_tiles + k - 1, tms, c), jnp.float32)
    for j in range(k):
        acc = acc.at[:, j:j + t_tiles].add(part[:, :, j])
    grad_pad = acc.reshape(b, npad, c).astype(tdtype)
    return grad_pad, np.zeros(gidx_flat.shape, dtype=jax.dtypes.float0)


_windowed_gather.defvjp(_windowed_gather_fwd, _windowed_gather_bwd)


def _xla_group(table, gidx):
    b, m, s = gidx.shape
    out = jnp.take_along_axis(
        table, gidx.reshape(b, m * s, 1).astype(jnp.int32), axis=1)
    return out.reshape(b, m, s, table.shape[-1])


def window_group(table: jnp.ndarray, gidx: jnp.ndarray, *, window: int,
                 tm: int = 64, force: bool = False) -> jnp.ndarray:
    """table (B, N, C), gidx (B, M, S) in [0, N) -> (B, M, S, C).

    Equals `table[b, gidx[b, m, s], :]` (jnp.take_along_axis).  On TPU
    (or force=True) the windowed kernel path is used behind a whole-batch
    exactness cond; otherwise, or when shapes don't tile, the plain XLA
    gather runs.  `window` is the half-window in table rows around the
    static per-tile base; `tm` is centers per tile.
    """
    b, n, c = table.shape
    _, m, s = gidx.shape
    on_tpu = jax.default_backend() == "tpu"
    stride = n // m if (m and n % m == 0) else 0
    tileable = stride > 0 and m % tm == 0 and window > 0
    if not ((on_tpu or force) and tileable):
        return _xla_group(table, gidx)

    tms = tm * stride
    w, _ = _round_window(window, tms)
    tw = tms + 2 * w

    gidx = gidx.astype(jnp.int32)
    # violation predicate: any out-of-window index in a non-row-uniform
    # sample => exact XLA fallback for the whole batch
    base = ((jnp.arange(m, dtype=jnp.int32) // tm) * tms)[None, :, None]
    viol = (gidx < base - w) | (gidx >= base - w + tw)
    rowuni = jnp.all(table == table[:, :1, :], axis=(1, 2))
    ok = ~jnp.any(viol & ~rowuni[:, None, None])

    table_pad = jnp.pad(table, ((0, 0), (w, w), (0, 0)))
    # lane-pack the query rows when each tile's row count divides by 128:
    # (B, RB//128, 128) is a bitcast of the row-major (B, M, S) gather
    # index, where the legacy (B, RB, 1) form tiles its size-1 lane dim at
    # 1/128 utilization and cost two ~6 ms HBM relayout copies per sa0
    # call (round-4 profile; see _load_rows).  HCMOCO_WG_PACKIDX=0 opts
    # back into the legacy layout.
    rb = m * s
    t_tiles = m // tm
    pack = ((rb // t_tiles) % 128 == 0
            and os.environ.get("HCMOCO_WG_PACKIDX", "1") == "1")
    gidx_flat = (gidx.reshape(b, rb // 128, 128) if pack
                 else gidx.reshape(b, rb, 1))
    interpret = not on_tpu

    def fast(tab_p, gi):
        out = _windowed_gather(tab_p, gi, w, tms, n, interpret)
        return out.reshape(b, m, s, c)

    def slow(tab_p, gi):
        return _xla_group(tab_p[:, w:w + n, :], gi.reshape(b, m, s))

    return jax.lax.cond(ok, fast, slow, table_pad, gidx_flat)

"""Windowed weighted 3-NN interpolation: MXU-matmul replacement for the
FP-level `three_interpolate` gather and its backward scatter-add.

Context (PERF.md round-4 HRNetPN profile): at the 116.5 samples/s
operating point the FP feature-propagation traffic is the #1 bucket
(~57 ms of the 547 ms bs64 step): forward row gathers of
(B, N, 3) x C-wide known-feature rows plus their grad scatter-adds,
both lowered by XLA as random row DMA / sort-based scatter.  The indices
are not random: depth2pts emits raster-sorted samples and every SA level
re-sorts its FPS indices ascending, so the 3-NN known-index of unknown
point q lies within a measured, bounded window of the linear base
floor(q*M/N) (tools/measure_fp_window.py) — the same locality property
window_group exploits for the SA grouping (reference CUDA counterparts:
pycontrast/networks/pointnet2/src/interpolate_gpu.cu:77-154
three_interpolate forward/grad kernels).

For a tile of TN unknown points with static known-table base ws = t*TS
(TS = TN*M/N), the kernel builds the WEIGHTED one-hot

    A[q, j] = sum_k weight[q, k] * [idx[q, k] == ws + j]      (TN, TW)

on the fly in VMEM and computes

    out[tile]  = A  @ table[ws : ws+TW]          (forward, one MXU dot —
                                                  the 3-way weighted sum
                                                  is folded into A)
    grad_table[ws : ws+TW] += A^T @ gout[tile]   (backward)

The backward keeps the ENTIRE padded grad table resident in VMEM as a
revisited output block (the TPU grid is sequential), accumulating each
tile's (TW, C) partial into its window slice — no per-tile partials in
HBM and no overlap-add pass (improving on window_group's backward).

Numerics: the forward accumulates the 3-term weighted sum in f32 on the
MXU — the same accumulation the reference CUDA kernel uses
(interpolate_gpu.cu:100: w1*f1 + w2*f2 + w3*f3 in float) — where the XLA
path multiplies and adds in the value dtype (bf16); results differ from
the XLA path by accumulation rounding only.  f32 values use the 3-limb
HIGHEST MXU precision (see window_group._prec).

Gradients: d(features) only.  The interpolation weights derive from
three_nn distances, which carry no gradient in the reference (the CUDA
three_nn op has no backward) and no parameter path here (both point sets
are functions of the input depth), so the weight cotangent is returned
as zeros — asserted unused by tests/test_window_interp.py.

Exactness: out-of-window indices clamp to the nearest real row; a
whole-batch `lax.cond` falls back to the exact XLA path whenever any
non-row-uniform sample violates its window (row-uniform tables — zero
point clouds — are value- and gradient-exact under clamping because all
rows are identical and the row-grad SUM is preserved; weights sum to 1).
Callers may additionally pass `sample_ok` (B,) to exempt samples whose
values no loss consumes (HRNetPN `use_depth`-masked zero clouds): their
tables are uniform only to ~3e-3 relative (SA bias/BN numerics), so the
row-uniform carve-out misses them and the cond would otherwise trip on
every real batch.  Measured leak of the exemption (round-5 probe,
tools/probe_fp_exactness.py at the bench shape): exempt samples' pooled
features move <=7.4e-3 absolute; valid samples move <=2.0e-3 through
shared BN batch statistics — bf16-noise order, and those garbage values
feed only BN stats and bank EMA rows exactly as the reference's own
zero-cloud garbage does.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_group import _prec


def _fwd_kernel(idx_ref, wgt_ref, table_ref, out_ref, *, tw, ts, w, m):
    t = pl.program_id(1)
    ws = t * ts
    win = table_ref[pl.ds(ws, tw), :]  # (TW, C) in padded coords
    lo = jnp.maximum(0, w - ws)  # clamp to REAL rows inside the window
    hi = jnp.minimum(tw - 1, w + m - 1 - ws)
    tn = idx_ref.shape[0]
    acc = jnp.zeros((tn, tw), jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tn, tw), 1)
    for k in range(3):
        rel = jnp.clip(idx_ref[:, k:k + 1] + (w - ws), lo, hi)
        acc = acc + wgt_ref[:, k:k + 1] * (rel == iota)
    # operands in the value dtype: bf16 rounds the weights exactly like
    # the XLA path's weight.astype(g.dtype); f32 runs the 3-limb HIGHEST
    # split (window_group._prec) so nothing rounds through bf16
    out_ref[...] = jax.lax.dot(
        acc.astype(win.dtype), win, precision=_prec(win.dtype),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(idx_ref, wgt_ref, gout_ref, grad_ref, *, tw, ts, w, m):
    t = pl.program_id(1)
    ws = t * ts

    @pl.when(t == 0)
    def _init():
        grad_ref[...] = jnp.zeros_like(grad_ref)

    lo = jnp.maximum(0, w - ws)
    hi = jnp.minimum(tw - 1, w + m - 1 - ws)
    tn = idx_ref.shape[0]
    acc = jnp.zeros((tn, tw), jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tn, tw), 1)
    for k in range(3):
        rel = jnp.clip(idx_ref[:, k:k + 1] + (w - ws), lo, hi)
        acc = acc + wgt_ref[:, k:k + 1] * (rel == iota)
    go = gout_ref[...].astype(jnp.float32)
    part = jax.lax.dot_general(
        acc, go, (((0,), (0,)), ((), ())),
        precision=_prec(gout_ref.dtype),
        preferred_element_type=jnp.float32)  # (TW, C)
    grad_ref[pl.ds(ws, tw), :] = grad_ref[pl.ds(ws, tw), :] + part


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _windowed_interp(table_pad, idx, wgt, w, tn, m, interpret):
    out, _ = _windowed_interp_fwd(table_pad, idx, wgt, w, tn, m, interpret)
    return out


def _windowed_interp_fwd(table_pad, idx, wgt, w, tn, m, interpret):
    b, mpad, c = table_pad.shape
    n = idx.shape[1]
    t_tiles = n // tn
    ts = tn * m // n
    tw = ts + 2 * w
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tw=tw, ts=ts, w=w, m=m),
        grid=(b, t_tiles),
        in_specs=[
            pl.BlockSpec((None, tn, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tn, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, mpad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, tn, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), table_pad.dtype),
        interpret=interpret,
    )(idx, wgt, table_pad)
    return out, (idx, wgt, jnp.zeros((0,), table_pad.dtype))


def _windowed_interp_bwd(w, tn, m, interpret, res, gout):
    idx, wgt, dtype_token = res
    b, n, c = gout.shape
    t_tiles = n // tn
    ts = tn * m // n
    tw = ts + 2 * w
    mpad = m + 2 * w
    grad_pad = pl.pallas_call(
        functools.partial(_bwd_kernel, tw=tw, ts=ts, w=w, m=m),
        grid=(b, t_tiles),
        in_specs=[
            pl.BlockSpec((None, tn, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tn, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        # full padded grad table resident across the tile loop (the TPU
        # grid is sequential; revisited output blocks accumulate safely)
        out_specs=pl.BlockSpec((None, mpad, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, mpad, c), jnp.float32),
        interpret=interpret,
    )(idx, wgt, gout)
    # grad is w.r.t. the PADDED table (the custom_vjp's input); the pad
    # rows hold zeros since the kernel clips indices to real rows.
    # weights/indices carry no gradient (see module docstring).
    return (grad_pad.astype(dtype_token.dtype),
            np.zeros(idx.shape, dtype=jax.dtypes.float0),
            jnp.zeros(wgt.shape, wgt.dtype))


_windowed_interp.defvjp(_windowed_interp_fwd, _windowed_interp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _windowed_interp_xbwd(table_pad, idx, wgt, w, tn, m, interpret):
    out, _ = _windowed_interp_fwd(table_pad, idx, wgt, w, tn, m, interpret)
    return out


def _windowed_interp_xbwd_bwd(w, tn, m, interpret, res, gout):
    """Hybrid backward: XLA sort-based scatter-add instead of the
    sequential-grid Pallas kernel (the r4 e2e A/B showed the full kernel
    pair loses 1% despite 5-6x isolated forward wins — suspect the bwd).

    Scatters weight[q,k]*gout[q] at the TRUE (unclamped) rows: identical
    to the kernel's clamped scatter whenever the fast path engages (no
    non-row-uniform violations puts every index inside its window), and
    the exact mathematical gradient regardless."""
    idx, wgt, dtype_token = res
    b, n, c = gout.shape
    mpad = m + 2 * w
    g = (gout[:, :, None, :].astype(jnp.float32)
         * wgt[..., None]).reshape(b, n * 3, c)
    rows = (idx.reshape(b, n * 3) + w).astype(jnp.int32)
    grad_pad = jnp.zeros((b, mpad, c), jnp.float32)
    grad_pad = jax.vmap(lambda gp, r, v: gp.at[r].add(v))(grad_pad, rows, g)
    return (grad_pad.astype(dtype_token.dtype),
            np.zeros(idx.shape, dtype=jax.dtypes.float0),
            jnp.zeros(wgt.shape, wgt.dtype))


_windowed_interp_xbwd.defvjp(_windowed_interp_fwd, _windowed_interp_xbwd_bwd)


def _xla_interp(features, idx, weight):
    b, n, _ = idx.shape
    g = jnp.take_along_axis(
        features, idx.reshape(b, n * 3, 1).astype(jnp.int32), axis=1)
    g = g.reshape(b, n, 3, features.shape[-1])
    return jnp.sum(g * weight[..., None].astype(g.dtype), axis=2)


def window_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                       weight: jnp.ndarray, *, window: int,
                       tn: int = 256, force: bool = False,
                       bwd: str = "kernel",
                       sample_ok: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
    """features (B, M, C), idx (B, N, 3) in [0, M), weight (B, N, 3) ->
    (B, N, C) = sum_k weight[..k] * features[idx[..k]].

    On TPU (or force=True) the windowed weighted one-hot kernel runs
    behind a whole-batch exactness cond; otherwise (or when shapes don't
    tile) the plain XLA gather path runs.  `window` is the half-window in
    known-table rows around the static per-tile base floor(q*M/N); `tn`
    is unknown points per tile.  `bwd` picks the gradient path: 'kernel'
    (Pallas A^T@gout into a VMEM grad table) or 'xla' (sort-based
    scatter-add — the hybrid mode, windowed fwd only).

    `sample_ok` (B,) bool: samples marked False are EXEMPT from the
    exactness cond — the kernel's clamped indexing may change their
    values/gradients relative to the XLA gather.  Callers pass the
    loss-mask validity here (HRNetPN zero-depth clouds, masked out of
    every loss term by `use_depth`): their 3-NN indices collapse to ~0,
    violating far tiles' windows on every real batch and permanently
    tripping the cond at FP0/FP1 (round-5 probe: 27/64 bench samples,
    fast path worth +14.6% e2e).  Exempting them keeps the cond as a
    live safety net for the samples whose values matter while letting
    the kernel engage.  Leak paths for the changed garbage values (BN
    batch statistics, memory-bank EMA rows) receive meaningless
    zero-cloud values either way — the reference feeds its own zero-cloud
    garbage into both (contrast_trainer.py masks only the loss).
    """
    b, m, c = features.shape
    n = idx.shape[1]
    on_tpu = jax.default_backend() == "tpu"
    tn = min(tn, n)
    tileable = (window > 0 and n % tn == 0 and (tn * m) % n == 0
                and (tn * m) // n >= 1)
    if not ((on_tpu or force) and tileable):
        return _xla_interp(features, idx, weight)

    ts = tn * m // n
    tw = ts + 2 * window

    idx = idx.astype(jnp.int32)
    # violation predicate must mirror the kernel's clip: per-TILE static
    # base ws = (q // TN) * TS, window [ws - W, ws - W + TW)
    tbase = ((jnp.arange(n, dtype=jnp.int32) // tn) * ts)[None, :, None]
    viol = (idx < tbase - window) | (idx >= tbase - window + tw)
    # Row-uniform carve-out contract (mirrors window_group's): for a
    # row-uniform sample (e.g. a zero cloud) whose indices violate the
    # window, forward values are exact under clamping and the row-grad SUM
    # is preserved, but the kernel backward deposits per-row gradient on
    # the CLAMPED rows rather than the true rows — safe because
    # row-uniform samples carry no meaningful per-row upstream gradient.
    rowuni = jnp.all(features == features[:, :1, :], axis=(1, 2))
    exempt = rowuni if sample_ok is None else rowuni | ~sample_ok
    ok = ~jnp.any(viol & ~exempt[:, None, None])

    table_pad = jnp.pad(features, ((0, 0), (window, window), (0, 0)))
    wgt = weight.astype(jnp.float32)
    interpret = not on_tpu

    kern = _windowed_interp if bwd == "kernel" else _windowed_interp_xbwd

    def fast(tab_p, gi, gw):
        return kern(tab_p, gi, gw, window, tn, m, interpret)

    def slow(tab_p, gi, gw):
        return _xla_interp(tab_p[:, window:window + m, :], gi,
                           gw.astype(weight.dtype))

    if os.environ.get("HCMOCO_FP_FORCE_FAST", "0") == "1":
        # diagnostic / expert mode: skip the exactness cond and always run
        # the kernel (clamped indexing — exact only when every
        # non-row-uniform sample is in-window; tools/measure_fp_window.py
        # certifies that at the bench shape).  Round-5 postmortem tool:
        # the cond's predicate and its replication probes disagreed, and
        # this knob separates "kernel value" from "predicate behavior".
        return fast(table_pad, idx, wgt)

    return jax.lax.cond(ok, fast, slow, table_pad, idx, wgt)

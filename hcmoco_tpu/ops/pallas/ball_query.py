"""Ball query as a Pallas TPU kernel with exact first-hit-fill semantics.

CUDA spec: `ball_query_gpu.cu:9-45` — per centroid, scan points in index
order; the first in-radius point pre-fills every output slot, subsequent
hits overwrite slots 1..nsample-1, stop after nsample hits.

Kernel shape: grid (B, M/CM); each program computes a (CM, N) squared-
distance tile on the MXU (|a|^2 + |b|^2 - 2ab), derives the hit mask and
per-slot indices entirely in VMEM, and writes the (CM, nsample) index tile.
The (CM, N) tile never touches HBM — the XLA fallback materializes it per
chunk; this kernel is the speed-of-light version of the same math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bq_kernel(xyz_ref, new_ref, out_ref, r2: float, nsample: int):
    # xyz_ref: (3, N) | new_ref: (3, CM) | out_ref: (CM, nsample) i32
    xyz = xyz_ref[:]  # (3, N)
    new = new_ref[:]  # (3, CM)
    # d2[c, k] = |new_c - xyz_k|^2, elementwise per coord (VPU)
    d2 = jnp.zeros((new.shape[1], xyz.shape[1]), jnp.float32)
    for c in range(3):
        diff = new[c][:, None] - xyz[c][None, :]
        d2 = d2 + diff * diff
    hit = d2 < r2
    n = hit.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)
    # slot l = index of the (l+1)-th hit, via an iterative "first hit after
    # prev" sweep.  "first index where mask" is a min-reduction over masked
    # lane ids — Mosaic's argmax tie-break returns the LAST max, so argmax
    # on a boolean mask would violate the CUDA in-order semantics.
    masked = jnp.where(hit, lanes, n)
    first = jnp.min(masked, axis=-1)
    first = jnp.where(first < n, first, 0)  # zero-hit centroids -> index 0
    prev = jnp.full((hit.shape[0],), -1, jnp.int32)
    slots = []
    for l in range(nsample):
        k = jnp.min(jnp.where(lanes > prev[:, None], masked, n), axis=-1)
        has = k < n
        slots.append(jnp.where(has, k, first).astype(jnp.int32))
        prev = jnp.where(has, k, prev)
    out_ref[:] = jnp.stack(slots, axis=-1)


def _bqw_kernel(xyz_ref, new_ref, out_ref, *, r2: float,
                nsample: int, cms: int, w: int, n: int):
    """Windowed variant: the slot sweep runs over the TW-lane window around
    this tile's static base instead of all N lanes.  The companion
    _bqw_viol_kernel flags any in-radius point OUTSIDE the window (the
    wrapper falls back to the exact kernel when a non-degenerate sample is
    flagged).  The two run as SEPARATE pallas calls on purpose: fusing the
    full-range reduce into this kernel made XLA:CPU (interpret mode)
    miscompile the final sweep iteration — every center's last slot came
    back as the first-hit fallback (bisected to the mere presence of a
    full-width masked reduce alongside the sweep; output structure and
    op choice were irrelevant).  Two jaxprs cannot cross-fuse, and the
    extra (3, N+2w) table read is ~50 KB per program."""
    j = pl.program_id(1)
    ws = j * cms  # window start in the PADDED point array
    tw = cms + 2 * w
    new = new_ref[:]  # (3, CM)
    cm = new.shape[1]

    # windowed slot sweep (identical math to _bq_kernel over TW lanes).
    # Mosaic has no value-level dynamic_slice lowering (CLAUDE.md pitfall);
    # slice the REF at the dynamic offset (pl.ds, as window_group does).
    xyz_w = xyz_ref[:, pl.ds(ws, tw)]  # (3, TW)
    d2w = jnp.zeros((cm, tw), jnp.float32)
    for c in range(3):
        diff = new[c][:, None] - xyz_w[c][None, :]
        d2w = d2w + diff * diff
    hit = d2w < r2
    lanes = jax.lax.broadcasted_iota(jnp.int32, (cm, tw), 1)
    masked = jnp.where(hit, lanes, tw)
    first = jnp.min(masked, axis=-1)
    has_any = first < tw
    first = jnp.where(has_any, first, w - ws)  # zero hits -> real index 0
    prev = jnp.full((cm,), -1, jnp.int32)
    slots = []
    for l in range(nsample):
        k = jnp.min(jnp.where(lanes > prev[:, None], masked, tw), axis=-1)
        has = k < tw
        slots.append(jnp.where(has, k, first).astype(jnp.int32))
        prev = jnp.where(has, k, prev)
    # window lane -> real point index: real = ws + lane - w
    out_ref[:] = jnp.stack(slots, axis=-1) + (ws - w)


def _bqw_viol_kernel(xyz_ref, new_ref, out_ref, *, r2: float, cms: int,
                     w: int):
    """Exactness guard for _bqw_kernel: one full-range distance pass; the
    (8, 128) output tile is a broadcast of the per-program violation flag
    (Mosaic has no scalar VMEM stores — CLAUDE.md)."""
    j = pl.program_id(1)
    ws = j * cms
    tw = cms + 2 * w
    new = new_ref[:]
    cm = new.shape[1]
    xyz = xyz_ref[:]  # (3, N + 2w) padded with +1e9 sentinels
    d2f = jnp.zeros((cm, xyz.shape[1]), jnp.float32)
    for c in range(3):
        diff = new[c][:, None] - xyz[c][None, :]
        d2f = d2f + diff * diff
    lanes_f = jax.lax.broadcasted_iota(jnp.int32, d2f.shape, 1)
    outside = (lanes_f < ws) | (lanes_f >= ws + tw)
    viol = jnp.any((d2f < r2) & outside)
    out_ref[:] = jnp.broadcast_to(viol.astype(jnp.int32),
                                  out_ref.shape)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def ball_query_windowed(xyz: jnp.ndarray, new_xyz: jnp.ndarray,
                        radius: float, nsample: int, window: int,
                        chunk_m: int = 128,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Exact ball query that exploits raster-sorted locality.

    With depth2pts' raster-ordered points and ascending FPS centers
    (models/pointnet2_model.py), in-radius neighbors lie within a measured
    index window of the center's table position (SA_WINDOWS; same
    measurement the window_group kernel tiles on).  The windowed kernel
    sweeps nsample slots over TW = CM*stride + 2*window lanes instead of
    N; exactness is preserved by a whole-batch `lax.cond` fallback to the
    full kernel whenever any sample that is not row-uniform has an
    in-radius point outside its window (row-uniform samples — the zero
    clouds of use_depth=0 images — substitute equal-valued rows, exactly
    as argued for window_group).  Falls back to the full kernel statically
    when the window does not actually shrink the sweep.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    if m % chunk_m or n % m:
        return ball_query_pallas(xyz, new_xyz, radius, nsample,
                                 interpret=interpret)
    stride = n // m
    cms = chunk_m * stride
    w = -(-window // 64) * 64  # lane-alignment: 2w multiple of 128
    tw = cms + 2 * w
    if tw >= n or cms % 128:
        return ball_query_pallas(xyz, new_xyz, radius, nsample,
                                 interpret=interpret)

    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    nt = jnp.swapaxes(new_xyz.astype(jnp.float32), 1, 2)  # (B, 3, M)
    xpad = jnp.pad(xt, ((0, 0), (0, 0), (w, w)), constant_values=1e9)

    common_in_specs = [
        pl.BlockSpec((None, 3, n + 2 * w), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 3, chunk_m), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    idx = pl.pallas_call(
        functools.partial(_bqw_kernel, r2=radius * radius, nsample=nsample,
                          cms=cms, w=w, n=n),
        grid=(b, m // chunk_m),
        in_specs=common_in_specs,
        out_specs=pl.BlockSpec((None, chunk_m, nsample),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, nsample), jnp.int32),
        interpret=interpret,
    )(xpad, nt)
    viol = pl.pallas_call(
        functools.partial(_bqw_viol_kernel, r2=radius * radius, cms=cms,
                          w=w),
        grid=(b, m // chunk_m),
        in_specs=common_in_specs,
        out_specs=pl.BlockSpec((None, 8, 128), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, (m // chunk_m) * 8, 128),
                                       jnp.int32),
        interpret=interpret,
    )(xpad, nt)

    rowuni = jnp.all(xyz == xyz[:, :1, :], axis=(1, 2))  # (B,)
    bad = jnp.any(viol > 0, axis=(1, 2)) & ~rowuni
    return jax.lax.cond(
        jnp.any(bad),
        lambda a, c: ball_query_pallas(a, c, radius, nsample,
                                       interpret=interpret),
        lambda a, c: idx,
        xyz, new_xyz)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def ball_query_pallas(xyz: jnp.ndarray, new_xyz: jnp.ndarray, radius: float,
                      nsample: int, chunk_m: int = 256,
                      interpret: bool | None = None) -> jnp.ndarray:
    """(B, N, 3), (B, M, 3) -> (B, M, nsample) int32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    cm = min(chunk_m, m)
    pad = (-m) % cm
    if pad:
        new_xyz = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)),
                          constant_values=1e9)
    mp = m + pad

    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    nt = jnp.swapaxes(new_xyz.astype(jnp.float32), 1, 2)  # (B, 3, Mp)

    out = pl.pallas_call(
        functools.partial(_bq_kernel, r2=radius * radius, nsample=nsample),
        grid=(b, mp // cm),
        in_specs=[
            pl.BlockSpec((None, 3, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 3, cm), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, cm, nsample), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, mp, nsample), jnp.int32),
        interpret=interpret,
    )(xt, nt)
    return out[:, :m]

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

"""Furthest point sampling as a single fused Pallas TPU kernel.

CUDA spec: `sampling_gpu.cu:93-253` — seed index 0, then npoint-1 rounds of
(update running min-distance to the picked set; argmax).  The CUDA kernel
parallelizes only the inner reduction across one thread block per batch
element; here the whole batch element's state (xyz + running min-dists)
lives in VMEM for the entire sweep, so the only HBM traffic is one read of
xyz and one write of the index list — the op is compute-bound on the VPU
instead of latency-bound on HBM.

Layout: xyz is carried as three (1, N) rows (x, y, z) so the point axis is
the 128-wide lane dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(xyz_ref, out_ref, mind_ref, npoint: int):
    # xyz_ref: (3, N) f32 VMEM | out_ref: (1, npoint) i32 VMEM
    # mind_ref: (1, N) f32 VMEM scratch (running min distance)
    # TPU VMEM takes vector stores only, so the picked index is written as a
    # masked full-row update instead of a scalar store.
    n = xyz_ref.shape[1]
    mind_ref[:] = jnp.full((1, n), 1e10, jnp.float32)
    out_ref[:] = jnp.zeros((1, npoint), jnp.int32)  # seed: idx[0] = 0
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(j, last):
        # coords of the picked point via masked reduction (dynamic lane
        # slicing isn't lowerable on TPU)
        sel = (lanes == last).astype(jnp.float32)  # (1, N)
        px = jnp.sum(xyz_ref[:] * sel, axis=1, keepdims=True)  # (3, 1)
        d = jnp.sum((xyz_ref[:] - px) ** 2, axis=0, keepdims=True)  # (1, N)
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        # first-max semantics (max then min-index-at-max): Mosaic's argmax
        # tie-breaks to the LAST max, XLA/CUDA take the first
        best = jnp.max(mind)
        nxt = jnp.min(jnp.where(mind == best, lanes, n)).astype(jnp.int32)
        out_ref[:] = jnp.where(cols == j, nxt, out_ref[:])
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnums=(1, 2))
def fps_pallas(xyz: jnp.ndarray, npoint: int,
               interpret: bool | None = None) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32. Grid = batch; one program per sample.

    interpret=None auto-selects interpreter mode off-TPU (CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, _ = xyz.shape
    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        grid=(b,),
        in_specs=[pl.BlockSpec((None, 3, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, 1, npoint), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)],
        interpret=interpret,
    )(xt)
    return out[:, 0, :]

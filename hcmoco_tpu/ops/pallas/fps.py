"""Furthest point sampling as a single fused Pallas TPU kernel.

CUDA spec: `sampling_gpu.cu:93-253` — seed index 0, then npoint-1 rounds of
(update running min-distance to the picked set; argmax).  The CUDA kernel
parallelizes only the inner reduction across one thread block per batch
element; here the whole batch element's state (xyz + running min-dists)
lives in VMEM for the entire sweep, so the only HBM traffic is one read of
xyz and one write of the index list — the op is compute-bound on the VPU
instead of latency-bound on HBM.

Layout: the point axis is the 128-wide lane dimension and 8 independent
samples are packed into the sublane dimension so every VPU vreg is fully
occupied (_fps_kernel_m).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel_m(xyz_ref, out_ref, mind_ref, npoint: int):
    """Sublane-packed FPS: S independent samples advance together.

    The single-sample kernel works on (1, N) rows — one valid sublane per
    (8, 128) vreg, so every VPU op wastes 7/8 of the datapath AND the
    batch grid is a sequential loop.  Packing S=8 samples into the
    sublane dim makes every row op (8, N) fully occupied: same vreg count
    per iteration, 8 samples per pass.  Per-sample semantics identical
    (samples are independent; all reductions are per-row)."""
    s, _, n = xyz_ref.shape
    x = xyz_ref[:, 0, :]  # (S, N)
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]
    mind_ref[:] = jnp.full((s, n), 1e10, jnp.float32)
    out_ref[:] = jnp.zeros((s, npoint), jnp.int32)  # seed: idx[0] = 0
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, npoint), 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (s, n), 1)

    def body(j, last):  # last: (S, 1) i32 — per-sample picked index
        sel = (lanes == last).astype(jnp.float32)  # (S, N)
        px = jnp.sum(x * sel, axis=1, keepdims=True)  # (S, 1)
        py = jnp.sum(y * sel, axis=1, keepdims=True)
        pz = jnp.sum(z * sel, axis=1, keepdims=True)
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        best = jnp.max(mind, axis=1, keepdims=True)
        # first-max semantics (max then min-index-at-max): Mosaic's argmax
        # tie-breaks to the LAST max, XLA/CUDA take the first
        nxt = jnp.min(jnp.where(mind == best, lanes, n), axis=1,
                      keepdims=True).astype(jnp.int32)
        out_ref[:] = jnp.where(cols == j, nxt, out_ref[:])
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.zeros((s, 1), jnp.int32))


_FPS_PACK = 8  # samples per program (sublane width)


@functools.partial(jax.jit, static_argnums=(1, 2))
def fps_pallas(xyz: jnp.ndarray, npoint: int,
               interpret: bool | None = None) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32. Grid = ceil(B/8) programs of 8
    sublane-packed samples each (see _fps_kernel_m).

    interpret=None auto-selects interpreter mode off-TPU (CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, _ = xyz.shape
    s = _FPS_PACK
    pad = (-b) % s
    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    if pad:
        xt = jnp.concatenate(
            [xt, jnp.broadcast_to(xt[:1], (pad,) + xt.shape[1:])], axis=0)
    xg = xt.reshape((b + pad) // s, s, 3, n)

    out = pl.pallas_call(
        functools.partial(_fps_kernel_m, npoint=npoint),
        grid=((b + pad) // s,),
        in_specs=[pl.BlockSpec((None, s, 3, n), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, s, npoint), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((b + pad) // s, s, npoint),
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((s, n), jnp.float32)],
        interpret=interpret,
    )(xg)
    return out.reshape(b + pad, npoint)[:b]

"""Fused 3-nearest-neighbour Pallas kernel.

CUDA spec: `interpolate_gpu.cu:9-52` — per unknown point, the 3 smallest
squared distances to the known set in ascending order, strict-< updates so
ties keep the earliest index.

This is the hot op of the HRNetPN `pts2depth` scatter (102400 unknown
pixels x 4096 sampled points per image, build_backbone.py:448-455).  The
XLA formulation materializes (chunk, M) distance tiles in HBM and runs
top_k; this kernel keeps the tile in VMEM and extracts the 3 minima with
three masked min-reductions (Mosaic-safe: min-of-masked-indices for the
first-match tie-break, no top_k/cumsum/scalar stores).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _three_nn_kernel(unk_ref, kno_ref, dist_ref, idx_ref):
    # unk_ref: (3, CN) | kno_ref: (3, M)
    # dist_ref: (CN, 4) f32 | idx_ref: (CN, 4) i32 (col 3 = padding)
    unk = unk_ref[:]
    kno = kno_ref[:]
    cn = unk.shape[1]
    m = kno.shape[1]
    d2 = jnp.zeros((cn, m), jnp.float32)
    for c in range(3):
        diff = unk[c][:, None] - kno[c][None, :]
        d2 = d2 + diff * diff

    lanes = jax.lax.broadcasted_iota(jnp.int32, (cn, m), 1)
    dists = []
    idxs = []
    live = d2
    for _ in range(3):
        best = jnp.min(live, axis=1)  # (CN,)
        # first index attaining the min (CUDA strict-< keeps earliest)
        k = jnp.min(jnp.where(live <= best[:, None], lanes, m), axis=1)
        dists.append(best)
        idxs.append(k.astype(jnp.int32))
        live = jnp.where(lanes == k[:, None], jnp.inf, live)
    dists.append(jnp.zeros((cn,), jnp.float32))  # lane-pad to 4
    idxs.append(jnp.zeros((cn,), jnp.int32))
    dist_ref[:] = jnp.stack(dists, axis=-1)
    idx_ref[:] = jnp.stack(idxs, axis=-1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def three_nn_pallas(unknown: jnp.ndarray, known: jnp.ndarray,
                    chunk_n: int = 256,
                    interpret: bool | None = None):
    """(B, N, 3), (B, M, 3) -> dist2 (B, N, 3) f32, idx (B, N, 3) i32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, _ = unknown.shape
    m = known.shape[1]
    # VMEM budget: the (cn, M) fp32 tile + iota + live copy must fit 16MB
    cn = min(chunk_n, n, max(1, (2 * 1024 * 1024) // max(m, 1)))
    pad = (-n) % cn
    if pad:
        unknown = jnp.pad(unknown, ((0, 0), (0, pad), (0, 0)))
    np_ = n + pad

    ut = jnp.swapaxes(unknown.astype(jnp.float32), 1, 2)  # (B, 3, Np)
    kt = jnp.swapaxes(known.astype(jnp.float32), 1, 2)  # (B, 3, M)

    dist, idx = pl.pallas_call(
        _three_nn_kernel,
        grid=(b, np_ // cn),
        in_specs=[
            pl.BlockSpec((None, 3, cn), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 3, m), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, cn, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cn, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, np_, 4), jnp.float32),
            jax.ShapeDtypeStruct((b, np_, 4), jnp.int32),
        ),
        interpret=interpret,
    )(ut, kt)
    return dist[:, :n, :3], idx[:, :n, :3]

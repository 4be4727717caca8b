"""Point-cloud ops: TPU-native equivalents of the reference CUDA kernels.

Spec = `pycontrast/networks/pointnet2/src/` (SURVEY.md §2.4):
  * furthest_point_sample — seeded at index 0, iterative argmax of running
    min-distance (sampling_gpu.cu:93-253)
  * ball_query — per-centroid in-order scan, FIRST-HIT FILL: the first point
    inside the radius pre-fills all nsample slots, later hits overwrite
    slots 1.. until nsample (ball_query_gpu.cu:28-43)
  * gather / group — index gathers (+ scatter-add grads, handled by XLA
    autodiff of take_along_axis; the CUDA atomicAdd backward becomes an XLA
    scatter-add automatically)
  * three_nn — 3 smallest squared distances, ties keep the earlier index
    (strict < comparisons, interpolate_gpu.cu:30-48); lax.top_k is stable so
    the tie-break matches
  * three_interpolate — weighted 3-point gather

These are the XLA formulations; `hcmoco_tpu.ops.pallas` holds the fused
Pallas kernels for FPS and ball-query (the two that XLA can't express
without materializing large intermediates), selected via `impl=`.

Layout: coordinates are (B, N, 3); features are channels-LAST (B, N, C) —
TPU-native, the lane dimension is the channel dimension.  (The reference
uses (B, C, N).)

Distance matrices (B, M, N) are computed in M-chunks (`chunk` arg) to bound
memory: at the reference scales (N=4096) a full fp32 matrix per level is
64 MB/sample — chunking keeps the working set in VMEM-friendly tiles and
XLA fuses the mask/top-k consumer into each chunk.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., M, 3) x (..., N, 3) -> (..., M, N) squared euclidean, computed
    as a matmul (MXU) + norms (VPU) in fp32."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    an = jnp.sum(a * a, axis=-1, keepdims=True)
    bn = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jnp.einsum("...mc,...nc->...mn", a, b)
    d = an + jnp.swapaxes(bn, -1, -2) - 2.0 * cross
    return jnp.maximum(d, 0.0)


def _sq_dists_exact(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise (x1-x2)^2 sum — bit-matches the CUDA kernels' formula
    (no catastrophic cancellation); used where index decisions are made."""
    diff = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


# ---------------------------------------------------------------------------
# Furthest point sampling
# ---------------------------------------------------------------------------


def furthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          impl: str = "xla",
                          allow_identity: bool = False) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32 indices.

    Iteration j picks argmax_k min_{picked} d2(k, picked), seeded with index
    0 and running min-distance state (temp buffer init 1e10, the wrapper's
    `torch.cuda.FloatTensor(B,N).fill_(1e10)`, pointnet2_utils.py:23-30).

    allow_identity: opt-in npoint==n shortcut that returns indices in INPUT
    order rather than FPS visit order (and bypasses impl='pallas').  Safe
    only for permutation-equivariant consumers — a caller taking the first
    m entries of the result as an FPS subset must keep this False.
    """
    b, n, _ = xyz.shape
    if allow_identity and npoint == n:
        # FPS of ALL points selects the full set in FPS visit order; every
        # downstream consumer (gather of coords+feats by the same idx, then
        # per-row ball-query/grouping/MLPs, finally coordinate-based 3-NN
        # interpolation) is permutation-equivariant, so the identity order
        # is equivalent — and skips the O(N^2) pass.  The reference's first
        # SA layer hits exactly this case (pointnet2_msg.py NPOINTS[0] =
        # input N = 4096).
        return jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None],
                                (b, n))
    if impl == "pallas":
        from .pallas.fps import fps_pallas

        return fps_pallas(xyz, npoint)

    xyz = xyz.astype(jnp.float32)

    def step(carry, _):
        mind, last = carry  # (B, N), (B,) last picked index
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)
        d = jnp.sum((xyz - last_xyz) ** 2, axis=-1)  # (B, N)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind, axis=-1).astype(jnp.int32)
        return (mind, nxt), nxt

    init_mind = jnp.full((b, n), 1e10, jnp.float32)
    first = jnp.zeros((b,), jnp.int32)
    (_, _), rest = jax.lax.scan(step, (init_mind, first), None,
                                length=npoint - 1)
    idx = jnp.concatenate([first[None], rest], axis=0)  # (npoint, B)
    return jnp.swapaxes(idx, 0, 1)


# ---------------------------------------------------------------------------
# Ball query
# ---------------------------------------------------------------------------


def ball_query(xyz: jnp.ndarray, new_xyz: jnp.ndarray, radius: float,
               nsample: int, chunk: int = 512,
               impl: str = "xla", window: int = 0) -> jnp.ndarray:
    """(B, N, 3), (B, M, 3) -> (B, M, nsample) int32 indices with the CUDA
    first-hit-fill semantics.  Centroids with zero hits get index 0 (the
    CUDA kernel leaves those slots uninitialized; FPS centroids always hit
    themselves so the case never occurs in the model).

    window > 0 (pallas impl only) opts into the windowed kernel for
    raster-sorted points (exact via violation fallback — see
    pallas/ball_query.py::ball_query_windowed)."""
    if impl == "pallas":
        from .pallas.ball_query import ball_query_pallas, ball_query_windowed

        if window > 0:
            return ball_query_windowed(xyz, new_xyz, radius, nsample,
                                       window)
        return ball_query_pallas(xyz, new_xyz, radius, nsample)

    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    r2 = radius * radius

    def do_chunk(nc):
        # nc: (B, C, 3)
        d2 = _sq_dists_exact(nc, xyz)  # (B, C, N)
        hit = d2 < r2
        order = jnp.cumsum(hit, axis=-1)  # 1-based hit counts
        first = jnp.argmax(hit, axis=-1)  # first hit (0 if none)
        total = order[..., -1]

        def slot(l):
            sel = jnp.logical_and(hit, order == l + 1)
            k = jnp.argmax(sel, axis=-1)
            return jnp.where(l < total, k, first)

        slots = [slot(l) for l in range(nsample)]
        return jnp.stack(slots, axis=-1).astype(jnp.int32)

    if m <= chunk:
        return do_chunk(new_xyz)
    pad = (-m) % chunk
    padded = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))
    chunks = padded.reshape(b, -1, chunk, 3)
    out = jax.lax.map(lambda c: do_chunk(c),
                      jnp.swapaxes(chunks, 0, 1))  # (n_chunks, B, C, S)
    out = jnp.swapaxes(out, 0, 1).reshape(b, -1, nsample)
    return out[:, :m]


# ---------------------------------------------------------------------------
# Gathers
# ---------------------------------------------------------------------------


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C), (B, M) -> (B, M, C).  gather_operation analog
    (sampling_gpu.cu:8-45); gradient is XLA's scatter-add."""
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32),
                               axis=1)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C), (B, M, S) -> (B, M, S, C).  group_points analog
    (group_points_gpu.cu:9-43)."""
    b, m, s = idx.shape
    flat = idx.reshape(b, m * s).astype(jnp.int32)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(b, m, s, points.shape[-1])


def query_and_group(xyz: jnp.ndarray, new_xyz: jnp.ndarray,
                    feats: jnp.ndarray, radius: float, nsample: int,
                    impl: str = "xla") -> jnp.ndarray:
    """(B, N, 3), (B, M, 3), (B, N, C)|None -> (B, M, nsample, 3+C):
    ball-query (CUDA first-hit-fill) + grouped gather from ONE combined
    table, grouped xyz centred on the centroid, concat with grouped
    features (`QueryAndGroup` use_xyz=True, pointnet2_utils.py:231-290).

    The single (3+C)-wide table gather replaces separate xyz (12-byte
    rows, ~1 GB/s effective on TPU HBM) and feature gathers
    (tools/microbench_qgroup.py).  A fully-fused Pallas version was
    prototyped and REJECTED: Mosaic has no dynamic row-gather lowering
    (take_along_axis inside a kernel fails to compile), and the exact
    one-hot-matmul substitute costs ~6x the gather's bytes in fp32 MXU
    passes.  The production path goes further and removes the wide gather
    algebraically — see models/pointnet2_model.py::SharedMLP
    project-then-group."""
    gidx = ball_query(xyz, new_xyz, radius, nsample, impl=impl)
    if feats is None:
        table = xyz
    else:
        table = jnp.concatenate([xyz.astype(feats.dtype), feats], axis=-1)
    grouped = group_points(table, gidx)
    centered = grouped[..., :3] - new_xyz[:, :, None, :].astype(
        grouped.dtype)
    return jnp.concatenate([centered, grouped[..., 3:]], axis=-1)


# ---------------------------------------------------------------------------
# Three-NN interpolation
# ---------------------------------------------------------------------------


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray,
             chunk: int = 1024,
             impl: str = "xla") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N, 3), (B, M, 3) -> dist2 (B, N, 3) fp32, idx (B, N, 3) int32:
    the 3 nearest known points per unknown point, ascending, earlier index
    wins ties (interpolate_gpu.cu:9-52)."""
    if impl == "pallas" and known.shape[1] >= 3:
        from .pallas.three_nn import three_nn_pallas

        return three_nn_pallas(unknown, known,
                               chunk_n=min(chunk, 256))
    b, n, _ = unknown.shape

    m = known.shape[1]

    def do_chunk(uc):
        d2 = _sq_dists_exact(uc, known)  # (B, C, M)
        if m < 3:
            # CUDA leaves missing neighbours at dist 1e40 / index 0
            # (interpolate_gpu.cu:30-31 initializers). 1e40 overflows a
            # float32 cast (numpy RuntimeWarning at trace time); finfo.max
            # preserves the "effectively infinite" semantics warning-free.
            pad = jnp.full(d2.shape[:-1] + (3 - m,),
                           jnp.finfo(d2.dtype).max, d2.dtype)
            d2 = jnp.concatenate([d2, pad], axis=-1)
        neg, idx = jax.lax.top_k(-d2, 3)
        idx = jnp.where(idx >= m, 0, idx)
        return -neg, idx.astype(jnp.int32)

    if n <= chunk:
        return do_chunk(unknown)
    pad = (-n) % chunk
    padded = jnp.pad(unknown, ((0, 0), (0, pad), (0, 0)))
    chunks = jnp.swapaxes(padded.reshape(b, -1, chunk, 3), 0, 1)
    d2s, idxs = jax.lax.map(do_chunk, chunks)
    d2 = jnp.swapaxes(d2s, 0, 1).reshape(b, -1, 3)[:, :n]
    idx = jnp.swapaxes(idxs, 0, 1).reshape(b, -1, 3)[:, :n]
    return d2, idx


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray, window: int = 0,
                      force_window: bool = False,
                      window_bwd: str = "kernel",
                      sample_ok: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B, M, C), (B, N, 3), (B, N, 3) -> (B, N, C) weighted gather
    (interpolate_gpu.cu:77-107); grad = scatter-add via autodiff.

    window > 0: on TPU, run the windowed weighted one-hot MXU kernel
    (ops/pallas/window_interp.py) behind a whole-batch exactness cond —
    the FP tables are raster-ordered so 3-NN indices live near the
    linear base floor(q*M/N) (tools/measure_fp_window.py).  window_bwd
    picks the kernel's gradient path ('kernel' | 'xla' hybrid).
    `sample_ok` (B,) bool marks samples whose values are consumed by the
    loss; False samples are exempt from the cond (see window_interpolate)."""
    if window > 0:
        from .pallas.window_interp import window_interpolate

        return window_interpolate(features, idx, weight, window=window,
                                  force=force_window, bwd=window_bwd,
                                  sample_ok=sample_ok)
    b, n, _ = idx.shape
    g = jnp.take_along_axis(
        features, idx.reshape(b, n * 3, 1).astype(jnp.int32), axis=1)
    g = g.reshape(b, n, 3, features.shape[-1])
    return jnp.sum(g * weight[..., None].astype(g.dtype), axis=2)


def interpolation_weights(dist2: jnp.ndarray) -> jnp.ndarray:
    """1/(d+1e-8) normalized (PointnetFPModule, pointnet2_modules.py:139-143
    — note: applied to SQUARED distances, as in the reference)."""
    recip = 1.0 / (dist2 + 1e-8)
    # missing neighbours (m<3 known tables) are padded at finfo.max by
    # three_nn; 1/finfo.max is ~2.9e-39, not the CUDA 1e40 initializer's
    # exact 0 — zero them so the pre-normalization weight semantics match
    # bit-for-bit (ADVICE r4)
    recip = jnp.where(dist2 >= jnp.finfo(dist2.dtype).max, 0.0, recip)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)

"""On-chip validation of the windowed one-hot grouping kernel.

Compares window_group (Mosaic path, fast-path predicate true) against the
XLA gather at the real SA-MSG shapes, forward (bit-exact) and backward
(f32-accum vs bf16 scatter-adds: relative-L2 bound).  Run on the TPU:
    python tools/check_window_group_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache_tpu")

import jax.numpy as jnp  # noqa: E402

from hcmoco_tpu.ops.pallas.window_group import window_group  # noqa: E402


def _xla(table, gidx):
    b, m, s = gidx.shape
    out = jnp.take_along_axis(
        table, gidx.reshape(b, m * s, 1).astype(jnp.int32), axis=1)
    return out.reshape(b, m, s, table.shape[-1])


def check(b, n, m, s, c, window, dtype):
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal((b, n, c)).astype(np.float32)).astype(dtype)
    base = (np.arange(m) * (n // m))[None, :, None]
    g = base + rng.integers(-window // 2, window // 2 + 1, (b, m, s))
    gidx = jnp.asarray(np.clip(g, 0, n - 1).astype(np.int32))
    cot = jnp.asarray(
        rng.standard_normal((b, m, s, c)).astype(np.float32)).astype(dtype)

    def loss(fn, t):
        return jnp.sum(fn(t, gidx).astype(jnp.float32) * cot)

    f_win = jax.jit(lambda t: window_group(t, gidx, window=window))
    o_win = np.asarray(f_win(table).astype(jnp.float32))
    o_xla = np.asarray(_xla(table, gidx).astype(jnp.float32))
    assert (o_win == o_xla).all(), (
        f"fwd mismatch {(o_win != o_xla).mean():.2e}")

    g_win = np.asarray(jax.jit(jax.grad(lambda t: loss(
        lambda t, gi: window_group(t, gi, window=window), t)))(table),
        dtype=np.float32)
    g_xla = np.asarray(jax.jit(jax.grad(lambda t: loss(_xla, t)))(table),
                       dtype=np.float32)
    rl2 = np.linalg.norm(g_win - g_xla) / max(np.linalg.norm(g_xla), 1e-9)
    assert rl2 < 2e-2, f"bwd rel-L2 {rl2:.3e}"
    print(f"OK b={b} n={n} m={m} s={s} c={c} w={window} "
          f"{np.dtype(dtype).name if dtype != jnp.bfloat16 else 'bfloat16'} "
          f"bwd relL2={rl2:.2e}")


def _raster_cloud(b, n, seed=0, jitter=0.02):
    rng = np.random.default_rng(seed)
    x = np.arange(n, dtype=np.float32)[None, :] * 0.01
    yz = rng.standard_normal((b, n, 2)).astype(np.float32) * jitter
    return np.concatenate(
        [np.broadcast_to(x, (b, n))[..., None], yz], axis=-1)


def check_bq(b, n, m, s, radius, window):
    """Windowed ball query vs the full kernel at SA shapes: exactness on
    locality-respecting clouds + slope timing (two chained reps cancel the
    dispatch-tunnel round trip)."""
    import time

    from hcmoco_tpu.ops.pallas.ball_query import (ball_query_pallas,
                                                  ball_query_windowed)

    cloud = jnp.asarray(_raster_cloud(b, n))
    centers = cloud[:, ::n // m]

    def timed(fn, reps):
        @jax.jit
        def run(c, z):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(reps):
                idx = fn(c, z + acc)  # data dep defeats CSE/hoisting
                acc = acc + (idx.sum() % 7).astype(jnp.float32) * 1e-20
            return acc

        np.asarray(run(cloud, centers))  # compile+warm
        t0 = time.perf_counter()
        o = np.asarray(run(cloud, centers))
        return time.perf_counter() - t0, o

    f_win = lambda c, z: ball_query_windowed(c, z, radius, s, window)  # noqa: E731
    f_full = lambda c, z: ball_query_pallas(c, z, radius, s)  # noqa: E731
    o_win = np.asarray(jax.jit(f_win)(cloud, centers))
    o_full = np.asarray(jax.jit(f_full)(cloud, centers))
    exact = (o_win == o_full).all()
    t1w, _ = timed(f_win, 1)
    t4w, _ = timed(f_win, 4)
    t1f, _ = timed(f_full, 1)
    t4f, _ = timed(f_full, 4)
    per_w = (t4w - t1w) / 3 * 1e3
    per_f = (t4f - t1f) / 3 * 1e3
    print(f"{'OK  ' if exact else 'FAIL'} bq b={b} n={n} m={m} s={s} "
          f"w={window}: windowed {per_w:.2f} ms vs full {per_f:.2f} ms "
          f"({per_f / max(per_w, 1e-6):.2f}x)", flush=True)


def check_fps(b, n, npoint):
    """Slope-time the sublane-packed FPS at a real PN shape (correctness is
    pinned by tests/test_point_ops.py CUDA-parity on CPU)."""
    import time

    from hcmoco_tpu.ops.pallas.fps import fps_pallas

    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))

    def timed(reps):
        @jax.jit
        def run(c):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(reps):
                idx = fps_pallas(c + acc, npoint)
                acc = acc + (idx.sum() % 7).astype(jnp.float32) * 1e-20
            return acc

        np.asarray(run(cloud))
        t0 = time.perf_counter()
        np.asarray(run(cloud))
        return time.perf_counter() - t0

    per = (timed(4) - timed(1)) / 3 * 1e3
    print(f"OK   fps b={b} n={n} npoint={npoint}: {per:.2f} ms/call",
          flush=True)


def main():
    print("backend:", jax.default_backend())
    check(8, 4096, 4096, 32, 32, 480, jnp.bfloat16)   # sa0 scale-2
    check(8, 4096, 4096, 16, 16, 224, jnp.bfloat16)   # sa0 scale-1
    check(8, 4096, 1024, 32, 64, 896, jnp.bfloat16)   # sa1 scale-2
    check(8, 1024, 256, 32, 128, 512, jnp.bfloat16)   # sa2 scale-2
    check(2, 4096, 4096, 32, 32, 480, jnp.float32)    # f32 variant
    check_bq(8, 4096, 4096, 16, 0.3, 224)             # sa0 scale-1
    check_bq(8, 4096, 4096, 32, 0.5, 480)             # sa0 scale-2
    check_bq(8, 4096, 1024, 16, 0.3, 640)             # sa1 scale-1
    check_bq(8, 4096, 1024, 32, 0.5, 896)             # sa1 scale-2
    check_fps(64, 4096, 1024)                          # sa1 (bs64 step)
    check_fps(64, 1024, 256)                           # sa2
    print("ALL OK")


if __name__ == "__main__":
    main()

"""Microbenchmark: PN grouping-gather formulations on TPU.

group_points gathers (B, M, S) neighbor rows from (B, N, C) tables; at the
HRNetPN scale (B=64, N=M=4096, S=32, C=3) the profiled fusion costs
97 ms/step. Compares:
  a) row gather: flatten to (B*M*S,) row indices into (B*N, C)  [current]
  b) coord-major: take_along_axis per coordinate on (B, C, N) tables
  c) one_hot matmul per k-chunk (MXU selection)  [small C only]
Also times the backward (scatter-add) of (a) and (b).
Slope timing (100 vs 300 scan iters) cancels the dispatch tunnel.
"""

import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache_tpu")
    import jax.numpy as jnp

    B, N, S = 64, 4096, 32
    n_lo, n_hi = 50, 150

    def timed(fn_factory, *args):
        def wall(f):
            out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            return time.perf_counter() - t0

        return (wall(fn_factory(n_hi)) - wall(fn_factory(n_lo))) / (
            n_hi - n_lo)

    key = jax.random.PRNGKey(0)
    # C=96 with the coord-major broadcast take crashed the TPU
    # worker (3+ GB transient) — keep this probe at C=3 only
    for C in (3,):
        pts = jax.random.normal(key, (B, N, C), jnp.float32)
        idx = jax.random.randint(key, (B, N, S), 0, N)

        def row_f(n):
            @jax.jit
            def f(pts, idx):
                def body(c, _):
                    flat = idx.reshape(B, -1)
                    g = jnp.take_along_axis(c, flat[..., None], axis=1)
                    return c + g.sum() * 1e-20, None
                y, _ = jax.lax.scan(body, pts, None, length=n)
                return y.mean()
            return f

        def coord_f(n):
            ptsT = jnp.swapaxes(pts, 1, 2)  # (B, C, N)

            @jax.jit
            def f(ptsT, idx):
                def body(c, _):
                    flat = idx.reshape(B, 1, -1)
                    g = jnp.take_along_axis(
                        c, jnp.broadcast_to(flat, (B, C, N * S)), axis=2)
                    return c + g.sum() * 1e-20, None
                y, _ = jax.lax.scan(body, ptsT, None, length=n)
                return y.mean()
            return f

        t_row = timed(row_f, pts, idx)
        t_coord = timed(coord_f, jnp.swapaxes(pts, 1, 2), idx)
        nbytes = B * N * S * C * 4
        print(f"C={C:3d}: row={t_row*1e3:7.2f}ms ({nbytes/t_row/1e9:5.0f} "
              f"GB/s)  coord={t_coord*1e3:7.2f}ms "
              f"({nbytes/t_coord/1e9:5.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()

"""Microbenchmark: grouped neighbor-gather formulations on TPU.

The HRNetPN SA-MSG levels gather (B, M, S) rows out of per-batch (N, C)
feature tables (reference CUDA: group_points_gpu.cu:9-43).  Round-2 profile
attributed ~28% of the 924 ms PN step to XLA's gather fusions here.  This
probe measures, at each real level shape:

  xla_row     jnp.take_along_axis on (B, N, C) with (B, M*S, 1) indices
              [what group_points does today]
  psub        Pallas kernel: table resident in VMEM, Mosaic dynamic_gather
              along SUBLANES (indices broadcast to the table shape; N rows
              gathered per inner grid step)
  plane       same but table transposed (C, N), gather along LANES

plus the XLA backward (scatter-add) rate for xla_row.

NOTE round-2 post-mortem: the earlier microbench_group.py coord-major
variant materialized a (B, C, N*S) int32 broadcast index tensor (3.2 GB at
C=96) — THAT is what crashed the TPU worker, not the gather. No variant
here materializes broadcast indices outside VMEM.

Round-3 fix vs the first draft: (a) BlockSpecs use None-dims to squeeze
unit axes (Mosaic refs otherwise keep them and row writes fail); (b) every
scan iteration perturbs the indices with the loop counter — a loop-
invariant gather gets hoisted out of lax.scan by XLA and the slope
measures nothing.

Slope timing (50 vs 150 scan iters) cancels the dispatch-tunnel round trip
(CLAUDE.md timing trap).
"""

import functools
import time

import numpy as np

# (name, N, M, S, C) — SA-MSG level shapes at bs64, S summed over both
# scales (16+32), C = feats+xyz actually gathered
LEVELS = [
    ("L0", 4096, 4096, 48, 3),
    ("L1", 4096, 1024, 48, 99),
    ("L2", 1024, 256, 48, 259),
    ("L3", 256, 64, 48, 515),
]
B = 64


def _pallas_sub_gather(table, idx):
    """(B, N, C), (B, R) -> (B, R, C) via sublane dynamic_gather; R padded
    to a multiple of N, N rows gathered per inner grid step."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = table.shape
    r = idx.shape[1]
    nch = -(-r // n)
    pad = nch * n - r
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
    idx = idx.reshape(b, nch, n)

    def kern(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]  # (n, c)
        row = idx_ref[pl.program_id(1)]  # (n,)
        ib = jnp.broadcast_to(row.reshape(n, 1), (n, c))
        out_ref[:] = jnp.take_along_axis(tab, ib, axis=0)

    out = pl.pallas_call(
        kern,
        grid=(b, nch),
        in_specs=[
            pl.BlockSpec((None, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nch, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, None, n, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nch, n, c), table.dtype),
    )(table, idx)
    return out.reshape(b, nch * n, c)[:, :r]


def _pallas_lane_gather(tableT, idx):
    """(B, C, N), (B, R) -> (B, C, R) via lane dynamic_gather."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, c, n = tableT.shape
    r = idx.shape[1]
    nch = -(-r // n)
    pad = nch * n - r
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
    idx = idx.reshape(b, nch, n)

    def kern(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]  # (c, n)
        row = idx_ref[pl.program_id(1)]  # (n,)
        ib = jnp.broadcast_to(row.reshape(1, n), (c, n))
        out_ref[:] = jnp.take_along_axis(tab, ib, axis=1)

    out = pl.pallas_call(
        kern,
        grid=(b, nch),
        in_specs=[
            pl.BlockSpec((None, c, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nch, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, None, c, n), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nch, c, n), tableT.dtype),
    )(tableT, idx)
    return out.reshape(b, nch, c, n).transpose(0, 2, 1, 3).reshape(
        b, c, nch * n)[..., :r]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache_tpu")
    import jax.numpy as jnp

    n_lo, n_hi = 20, 60

    def slope(f, *args):
        def wall(fn):
            np.asarray(fn(*args)).ravel()[:1]
            t0 = time.perf_counter()
            np.asarray(fn(*args)).ravel()[:1]
            return time.perf_counter() - t0

        return (wall(f(n_hi)) - wall(f(n_lo))) / (n_hi - n_lo)

    key = jax.random.PRNGKey(0)

    for name, n, m, s, c in LEVELS:
        k1, k2 = jax.random.split(jax.random.fold_in(key, hash(name) % 97))
        table = jax.random.normal(k1, (B, n, c), jnp.float32)
        idx = jax.random.randint(k2, (B, m * s), 0, n).astype(jnp.int32)
        nbytes = B * m * s * c * 4

        # -- correctness vs numpy once per level
        ref = np.take_along_axis(np.asarray(table),
                                 np.asarray(idx)[..., None], axis=1)

        def xla_row_f(niter):
            @jax.jit
            def f(table, idx):
                def body(cr, i):
                    ii = (idx + i) % n  # anti-hoist: varies per iteration
                    g = jnp.take_along_axis(table, ii[..., None], axis=1)
                    return cr + g[0, 0, 0], None
                z, _ = jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(niter, dtype=jnp.int32))
                return z
            return functools.partial(f, table, idx)

        def psub_f(niter):
            @jax.jit
            def f(table, idx):
                def body(cr, i):
                    g = _pallas_sub_gather(table, (idx + i) % n)
                    return cr + g[0, 0, 0], None
                z, _ = jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(niter, dtype=jnp.int32))
                return z
            return functools.partial(f, table, idx)

        def plane_f(niter):
            tableT = jnp.swapaxes(table, 1, 2)

            @jax.jit
            def f(tableT, idx):
                def body(cr, i):
                    g = _pallas_lane_gather(tableT, (idx + i) % n)
                    return cr + g[0, 0, 0], None
                z, _ = jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(niter, dtype=jnp.int32))
                return z
            return functools.partial(f, tableT, idx)

        def xla_bwd_f(niter):
            @jax.jit
            def f(table, idx):
                def body(cr, i):
                    ii = (idx + i) % n

                    def one(t):
                        g = jnp.take_along_axis(t, ii[..., None], axis=1)
                        return (g * g).sum()

                    d = jax.grad(one)(table)
                    return cr + d[0, 0, 0], None
                z, _ = jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(niter, dtype=jnp.int32))
                return z
            return functools.partial(f, table, idx)

        results = {}
        # correctness for pallas variants (single call, small fetch)
        try:
            got = np.asarray(jax.jit(_pallas_sub_gather)(table, idx))
            ok = np.array_equal(got, ref.reshape(B, m * s, c))
            results["psub_ok"] = bool(ok)
        except Exception as e:  # noqa: BLE001
            results["psub_ok"] = f"ERR {type(e).__name__}: {e}"[:200]
        try:
            gotT = np.asarray(jax.jit(_pallas_lane_gather)(
                jnp.swapaxes(table, 1, 2), idx))
            ok = np.array_equal(gotT.transpose(0, 2, 1),
                                ref.reshape(B, m * s, c))
            results["plane_ok"] = bool(ok)
        except Exception as e:  # noqa: BLE001
            results["plane_ok"] = f"ERR {type(e).__name__}: {e}"[:200]

        print(f"== {name}: N={n} M={m} S={s} C={c} "
              f"({nbytes/1e6:.0f} MB/gather)", flush=True)
        print(f"   psub_ok={results['psub_ok']} "
              f"plane_ok={results['plane_ok']}", flush=True)

        for label, fac in [("xla_row", xla_row_f),
                           ("psub", psub_f), ("plane", plane_f),
                           ("xla_bwd", xla_bwd_f)]:
            try:
                t = slope(fac)
                mult = 3 if label == "xla_bwd" else 1  # fwd gather+scatter
                print(f"   {label:9s} {t*1e3:8.2f} ms  "
                      f"{mult*nbytes/t/1e9:6.0f} GB/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"   {label:9s} ERR {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()

"""Microbenchmark: BatchNorm cost components on TPU at HRNet shapes.

The bs112 step profile shows BN stat reductions (convert_reduce fusions)
running at ~56 GB/s and BN-apply elementwise at ~92 GB/s — far off HBM
peak (~800 GB/s on v5e). This isolates them:

  a) stat reduce: sum + sumsq over (N,H,W) of a bf16 [112,H,W,C] tensor
  b) bn apply:    (x - mean) * rsqrt(var+eps) * gamma + beta (+ relu)
  c) full train-mode flax-style BN fwd (stats + apply)

Slope timing (300 vs 100 scan iterations) cancels the dispatch tunnel.
Prints effective GB/s per variant so we know the in-isolation ceiling
before deciding whether a fused Pallas BN kernel can win.
"""

import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache_tpu")
    import jax.numpy as jnp

    B = 112
    shapes = [(80, 80, 256), (80, 80, 18), (160, 160, 64), (40, 40, 36)]
    n_lo, n_hi = 100, 300

    def timed(fn_factory, *args):
        f_lo, f_hi = fn_factory(n_lo), fn_factory(n_hi)

        def wall(f):
            out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            return time.perf_counter() - t0

        return (wall(f_hi) - wall(f_lo)) / (n_hi - n_lo)

    key = jax.random.PRNGKey(0)
    for (H, W, C) in shapes:
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        gamma = jnp.ones((C,), jnp.float32)
        beta = jnp.zeros((C,), jnp.float32)
        nbytes = x.size * 2

        def reduce_f(n):
            @jax.jit
            def f(x):
                def body(c, _):
                    xf = c.astype(jnp.float32)
                    s = xf.sum(axis=(0, 1, 2))
                    ss = (xf * xf).sum(axis=(0, 1, 2))
                    # fold stats back in so scan can't elide the work
                    return c + (s[0] + ss[0]).astype(jnp.bfloat16) * 1e-20, None
                y, _ = jax.lax.scan(body, x, None, length=n)
                return y.mean()
            return f

        def apply_f(n):
            @jax.jit
            def f(x, gamma, beta):
                def body(c, _):
                    xf = c.astype(jnp.float32)
                    y = jnp.maximum(xf * gamma + beta, 0.0)
                    return y.astype(jnp.bfloat16), None
                y, _ = jax.lax.scan(body, x, None, length=n)
                return y.mean()
            return f

        def full_bn_f(n):
            @jax.jit
            def f(x, gamma, beta):
                def body(c, _):
                    xf = c.astype(jnp.float32)
                    m = xf.mean(axis=(0, 1, 2))
                    v = (xf * xf).mean(axis=(0, 1, 2)) - m * m
                    y = (xf - m) * jax.lax.rsqrt(v + 1e-5) * gamma + beta
                    return jnp.maximum(y, 0.0).astype(jnp.bfloat16), None
                y, _ = jax.lax.scan(body, x, None, length=n)
                return y.mean()
            return f

        t_r = timed(reduce_f, x)
        t_a = timed(apply_f, x, gamma, beta)
        t_f = timed(full_bn_f, x, gamma, beta)
        print(f"[{B}x{H}x{W}x{C}] ({nbytes / 1e6:.0f} MB) "
              f"reduce={t_r * 1e3:7.3f}ms ({nbytes / t_r / 1e9:5.0f} GB/s) "
              f"apply={t_a * 1e3:7.3f}ms ({2 * nbytes / t_a / 1e9:5.0f} GB/s) "
              f"fullbn={t_f * 1e3:7.3f}ms ({3 * nbytes / t_f / 1e9:5.0f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()

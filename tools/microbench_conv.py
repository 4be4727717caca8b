"""Microbenchmark: can pairing the two HRNet encoders into grouped convs
beat two separate thin convs on TPU?

Compares, at HRNet-W18 shapes (batch 128 @320 input):
  a) two separate 3x3 convs  [B,H,W,C] -> C      (current: encoder1+encoder2)
  b) one grouped conv        [B,H,W,2C] -> 2C, feature_group_count=2
  c) one block-diag dense conv [B,H,W,2C] -> 2C  (zeros off-diagonal)
Also times the BN-ish stat reduction over each output to see whether fewer,
fatter elementwise ops win.

Each variant is scan-chained x20 inside one jit and timed by host value
fetch (dispatch-tunnel-safe). Prints one line per variant.
"""

import functools
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache_tpu")
    import jax.numpy as jnp

    B = 128
    shapes = [  # (H, W, C) per HRNet-W18 branch at 320 input
        (80, 80, 18),
        (40, 40, 36),
        (20, 20, 72),
        (10, 10, 144),
    ]
    key = jax.random.PRNGKey(0)
    # slope timing: wall(n_hi) - wall(n_lo) cancels the dispatch-tunnel
    # round trip (~tens of ms), which swamps per-conv times at small n
    n_lo, n_hi = 100, 300

    def timed(fn_factory, *args):
        f_lo, f_hi = fn_factory(n_lo), fn_factory(n_hi)

        def wall(f):
            out = f(*args)  # compile+run
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            return time.perf_counter() - t0

        return (wall(f_hi) - wall(f_lo)) / (n_hi - n_lo)

    for (H, W, C) in shapes:
        x1 = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        x2 = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        w1 = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05
        w2 = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05
        xc = jnp.concatenate([x1, x2], axis=-1)
        wg = jnp.concatenate([w1, w2], axis=-1)  # (3,3,C,2C) grouped kernel
        wbd = jnp.zeros((3, 3, 2 * C, 2 * C), jnp.bfloat16)
        wbd = wbd.at[:, :, :C, :C].set(w1).at[:, :, C:, C:].set(w2)
        dn = jax.lax.conv_dimension_numbers(
            (B, H, W, C), (3, 3, C, C), ("NHWC", "HWIO", "NHWC"))

        def conv(x, w, groups=1):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                feature_group_count=groups)

        def sep_f(n):
            @jax.jit
            def sep(x1, x2, w1, w2):
                def body(c, _):
                    a, b = c
                    return (conv(a, w1), conv(b, w2)), jnp.float32(0.)
                (a, b), _ = jax.lax.scan(body, (x1, x2), None, length=n)
                return a.mean() + b.mean()
            return sep

        def grp_f(n):
            @jax.jit
            def grouped(xc, wg):
                def body(c, _):
                    return conv(c, wg, groups=2), jnp.float32(0.)
                y, _ = jax.lax.scan(body, xc, None, length=n)
                return y.mean()
            return grouped

        def bd_f(n):
            @jax.jit
            def blockdiag(xc, wbd):
                def body(c, _):
                    return conv(c, wbd), jnp.float32(0.)
                y, _ = jax.lax.scan(body, xc, None, length=n)
                return y.mean()
            return blockdiag

        t_sep = timed(sep_f, x1, x2, w1, w2)
        t_grp = timed(grp_f, xc, wg)
        t_bd = timed(bd_f, xc, wbd)
        flop = 2 * B * H * W * 9 * C * C * 2  # both encoders
        print(f"[{H}x{W}x{C}] sep={t_sep*1e3:7.3f}ms "
              f"grouped={t_grp*1e3:7.3f}ms ({t_sep/t_grp:4.2f}x) "
              f"blockdiag={t_bd*1e3:7.3f}ms ({t_sep/t_bd:4.2f}x) "
              f"| sep-TFLOPs={flop/t_sep/1e12:5.1f}", flush=True)


if __name__ == "__main__":
    main()

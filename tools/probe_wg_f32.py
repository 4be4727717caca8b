"""Localize the on-chip window_group f32 miscompile (bf16 passes, f32
fails with 100% mismatch through the library entry; the bare pallas_call
forward passes in f32 — so the bug lives in the wrapper).

Bisect: 1) _windowed_gather direct (custom_vjp, no cond, padded table)
        2) window_group minus the cond (fast branch only)
        3) full window_group (repro)
Each in f32 at the small probe shape; prints a sample row on mismatch to
distinguish garbage from a layout permutation.
    python tools/probe_wg_f32.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache_tpu")

import jax.numpy as jnp  # noqa: E402

from hcmoco_tpu.ops.pallas import window_group as wg  # noqa: E402

B, N, M, S, C, WIN = 2, 1024, 1024, 16, 16, 224
TM = 64


def data():
    rng = np.random.default_rng(0)
    table = rng.integers(-128, 128, (B, N, C)).astype(np.float32)
    base = (np.arange(M) * (N // M))[None, :, None]
    g = base + rng.integers(-WIN // 2, WIN // 2 + 1, (B, M, S))
    gidx = np.clip(g, 0, N - 1).astype(np.int32)
    ref = np.take_along_axis(
        table, gidx.reshape(B, M * S, 1), axis=1).reshape(B, M, S, C)
    return table, gidx, ref


def report(name, got, ref):
    frac = (got != ref).mean()
    print(f"{name}: mismatch={frac:.3e} {'OK' if frac == 0 else 'FAIL'}",
          flush=True)
    if frac > 0:
        print("  got[0,0,:4,0] =", got[0, 0, :4, 0],
              " ref[0,0,:4,0] =", ref[0, 0, :4, 0], flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    table, gidx, ref = data()
    tms = TM * (N // M)
    w, _ = wg._round_window(WIN, tms)

    tp = jnp.pad(jnp.asarray(table), ((0, 0), (w, w), (0, 0)))
    gf = jnp.asarray(gidx.reshape(B, M * S, 1))

    # 1) custom_vjp direct, no cond
    f1 = jax.jit(lambda t, g: wg._windowed_gather(t, g, w, tms, N, False))
    got = np.asarray(f1(tp, gf)).reshape(B, M, S, C)
    report("direct _windowed_gather f32", got, ref)

    # 2) fast branch only (pad inside jit like the library, no cond)
    def fast_only(t, g):
        t_p = jnp.pad(t, ((0, 0), (w, w), (0, 0)))
        out = wg._windowed_gather(t_p, g.reshape(B, M * S, 1), w, tms, N,
                                  False)
        return out.reshape(B, M, S, C)

    got = np.asarray(jax.jit(fast_only)(jnp.asarray(table),
                                        jnp.asarray(gidx)))
    report("fast branch, pad in-jit f32", got, ref)

    # 3) full library entry (cond) — the original failing config
    f3 = jax.jit(lambda t, g: wg.window_group(t, g, window=WIN, tm=TM))
    got = np.asarray(f3(jnp.asarray(table), jnp.asarray(gidx)))
    report("window_group full f32", got, ref)

    # control: bf16 full library entry at the same shape
    f4 = jax.jit(lambda t, g: wg.window_group(t, g, window=WIN, tm=TM))
    gotb = np.asarray(
        f4(jnp.asarray(table, jnp.bfloat16), jnp.asarray(gidx))
        .astype(jnp.float32))
    report("window_group full bf16", gotb, ref)


if __name__ == "__main__":
    main()

"""Parameter sweep that RESOLVED the f32 window_group "miscompile".

History: check_window_group_tpu.py reported 100% wrong forward values at
(n=4096, m=n, s=32, c=32, w=480) in f32 (bf16 passed).  This sweep passed
EVERY config including that one — because its test data is integer-valued
f32.  That asymmetry was the tell: the one-hot dot ran at DEFAULT MXU
precision (one bf16 pass), which copies integer-valued and bf16 rows
bit-exactly but rounds arbitrary f32 mantissas — a 100%-of-elements
small-relative-error "mismatch", not a miscompile.  Fix: the kernel now
uses Precision.HIGHEST when the value dtype is f32 (window_group.py::_prec).
Kept as the regression probe for that diagnosis.
    python tools/probe_wg_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache_tpu")

import jax.numpy as jnp  # noqa: E402

from hcmoco_tpu.ops.pallas.window_group import window_group  # noqa: E402

TM = 64


def check(b, n, m, s, c, win, dtype):
    rng = np.random.default_rng(0)
    table = rng.integers(-128, 128, (b, n, c)).astype(np.float32)
    base = (np.arange(m) * (n // m))[None, :, None]
    g = base + rng.integers(-win // 2, win // 2 + 1, (b, m, s))
    gidx = np.clip(g, 0, n - 1).astype(np.int32)
    ref = np.take_along_axis(
        table.astype(dtype), gidx.reshape(b, m * s, 1), axis=1
    ).reshape(b, m, s, c)
    f = jax.jit(lambda t, g: window_group(t, g, window=win, tm=TM))
    got = np.asarray(f(jnp.asarray(table, dtype), jnp.asarray(gidx)))
    frac = float((got != ref).mean())
    tag = f"b={b} n={n} m={m} s={s} c={c} w={win} {np.dtype(dtype).name}"
    print(f"{'OK  ' if frac == 0 else 'FAIL'} {tag} mismatch={frac:.3e}",
          flush=True)
    return frac == 0


def main():
    print("backend:", jax.default_backend(), flush=True)
    # passing base
    check(2, 1024, 1024, 16, 16, 224, np.float32)
    # one-at-a-time toward the failing config
    check(2, 4096, 4096, 16, 16, 224, np.float32)   # n only
    check(2, 1024, 1024, 16, 32, 224, np.float32)   # c only
    check(2, 1024, 1024, 32, 16, 224, np.float32)   # s only
    check(2, 1024, 1024, 16, 16, 480, np.float32)   # w only
    # full failing config (repro control)
    check(2, 4096, 4096, 32, 32, 480, np.float32)


if __name__ == "__main__":
    main()

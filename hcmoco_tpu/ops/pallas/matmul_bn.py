"""Fused 1x1-conv matmul with a BN-statistics epilogue (Pallas TPU).

MFU experiment (VERDICT r3 item 5, PERF.md "conv-epilogue BN-stat fusion"):
the flagship's BN stat sums currently run as two separate `ones @ x`
dot_generals (MatmulBN mode 2) that each re-READ the just-written conv
output from HBM.  For the 1x1/stride-1 ConvBN sites the conv IS a matmul
(reference conv sites: official_hrnet.py:64-102 bottleneck 1x1s,
:177-249 fusion-layer 1x1s), so this kernel computes

    y = x @ w          (MXU, f32 accumulation, bf16 output rounding)
    s1 = sum_rows y    (accumulated in VMEM while the tile is resident)
    s2 = sum_rows y*y

in ONE pass: the stat sums cost zero extra HBM traffic instead of two
full activation reads.  Traffic per 1x1 ConvBN forward: write(y) + read(y)
for the BN apply, vs write(y) + 3x read(y) in the unfused form.

The companion custom-VJP pair (`conv1x1_bn_stats` + `bn_apply_stats`)
keeps ALL channel reductions in the backward as MXU dots (same property
as MatmulBN mode 2) and is gradient-equivalent to it in exact arithmetic
(tests/test_models.py::TestConvBNFuse).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_bn_kernel(x_ref, w_ref, y_ref, s_ref):
    """One (TM, K) x (K, C) tile: write y, accumulate s1/s2 into s_ref.

    s_ref is a (2, C) f32 block every grid step maps to (revisited output):
    row 0 accumulates sum(y), row 1 sum(y*y).  The grid is sequential on
    TPU, so read-modify-write accumulation across steps is safe.
    """
    i = pl.program_id(0)
    yf = jnp.dot(x_ref[:], w_ref[:],
                 preferred_element_type=jnp.float32)  # (TM, C) f32
    # match the unfused path bit-for-bit: XLA's bf16 conv rounds the f32
    # accumulator to bf16, and MatmulBN reads THAT rounded value
    yb = yf.astype(y_ref.dtype)
    y_ref[:] = yb
    yr = yb.astype(jnp.float32)
    part = jnp.stack([jnp.sum(yr, axis=0), jnp.sum(yr * yr, axis=0)])

    @pl.when(i == 0)
    def _init():
        s_ref[:] = part

    @pl.when(i > 0)
    def _acc():
        s_ref[:] = s_ref[:] + part


def _mm_bn_fwd_pallas(x2d: jnp.ndarray, w: jnp.ndarray, tm: int,
                      interpret: bool):
    r, k = x2d.shape
    c = w.shape[1]
    pad = (-r) % tm
    xp = jnp.pad(x2d, ((0, pad), (0, 0))) if pad else x2d
    rp = r + pad
    y, s = pl.pallas_call(
        _mm_bn_kernel,
        grid=(rp // tm,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, c), x2d.dtype),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
        ],
        interpret=interpret,
    )(xp, w)
    return y[:r], s[0], s[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv1x1_bn_stats(x2d, w, tm: int = 512, interpret: bool | None = None):
    """(R, K) @ (K, C) -> (y (R, C), s1 (C,), s2 (C,)).

    y matches a bf16 XLA dot (f32 accumulation, bf16 rounding); s1/s2 are
    the f32 channel sums of the ROUNDED y — exactly what MatmulBN computes
    from the conv output — accumulated in the matmul epilogue.
    Padding rows (R % tm) contribute zeros to both sums.
    """
    out, _ = _mm_bn_vjp_fwd(x2d, w, tm, interpret)
    return out


def _mm_bn_vjp_fwd(x2d, w, tm, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    y, s1, s2 = _mm_bn_fwd_pallas(x2d, w, tm, interpret)
    return (y, s1, s2), (x2d, w, y)


def _mm_bn_vjp_bwd(tm, interpret, res, cts):
    x2d, w, y = res
    dy, ds1, ds2 = cts
    # s1/s2 are sums of (rounded) y: their cotangents broadcast back onto
    # every row of y. dy_total = dy + ds1 + 2*y*ds2, then standard matmul
    # grads (both MXU dots).
    f32 = jnp.float32
    dyt = (dy.astype(f32) + ds1.astype(f32)[None, :]
           + 2.0 * y.astype(f32) * ds2.astype(f32)[None, :])
    dyt = dyt.astype(x2d.dtype)
    dx = jax.lax.dot_general(dyt, w, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32).astype(x2d.dtype)
    dw = jax.lax.dot_general(x2d, dyt, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32).astype(w.dtype)
    return dx, dw


conv1x1_bn_stats.defvjp(_mm_bn_vjp_fwd, _mm_bn_vjp_bwd)


def _ch_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(R,) x (R, C) -> (C,) channel sum as an MXU dot."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def bn_apply_stats(y, s1, s2, scale, bias, eps):
    """BN train-mode apply given precomputed channel sums.

    mean = s1/R, var = max(0, s2/R - mean^2) — identical math to MatmulBN.
    Returns (out_f32, mean, var).  The backward keeps dbias/dscale as MXU
    dots and routes the mean/var chain into ds1/ds2 (which
    conv1x1_bn_stats' backward folds into its dy), so no cross-lane
    channel reduction exists anywhere in the fused ConvBN's gradient.
    """
    out, _ = _bn_apply_fwd(y, s1, s2, scale, bias, eps)
    return out


def _bn_apply_fwd(y, s1, s2, scale, bias, eps):
    r = y.reshape(-1, y.shape[-1]).shape[0]
    mean = s1 / r
    var = jnp.maximum(0.0, s2 / r - mean * mean)
    rstd = jax.lax.rsqrt(var + eps)
    out = (y.astype(jnp.float32) - mean) * (rstd * scale) + bias
    # emit in y's dtype: custom_vjp outputs materialize, and an f32 copy
    # of every 1x1 activation doubled the HBM residency at bs128 (the
    # caller rounds to compute dtype right after anyway; rounding inside
    # is the same value, and the cotangent path is unchanged).
    out = out.astype(y.dtype)
    return (out, mean, var), (y, s1, mean, rstd, var, scale)


def _bn_apply_bwd(eps, res, cts):
    y, s1, mean, rstd, var, scale = res
    dout, dmean_ct, dvar_ct = cts
    c = y.shape[-1]
    r = y.reshape(-1, c).shape[0]
    yf = y.astype(jnp.float32).reshape(-1, c)
    dof = dout.astype(jnp.float32).reshape(-1, c)
    ones = jnp.ones((r,), jnp.float32)
    yhat = (yf - mean) * rstd
    dbias = _ch_dot(ones, dof)
    dscale = _ch_dot(ones, dof * yhat)
    dy = (dof * (rstd * scale)).reshape(y.shape).astype(y.dtype)
    # out = (y - s1/R) * rstd(var(s1, s2)) * scale + bias
    dmean = -rstd * scale * dbias + dmean_ct
    # var = max(0, s2/R - mean^2): when the clamp binds (constant channel,
    # rounding-negative raw variance) d(var)/d(raw) = 0, so every
    # contribution through var is masked — matches autodiff of the
    # unfused path (ADVICE r4)
    dvar = (-0.5 * rstd * rstd * scale * dscale + dvar_ct) * (var > 0)
    # mean = s1/R; var = s2/R - (s1/R)^2.  R^2 as float: at real shapes
    # (R = B*H*W = 819200) the Python-int R*R overflows the i32 weak-typed
    # jit argument.
    rf = float(r)
    ds1 = dmean / rf + dvar * (-2.0 * s1 / rf / rf)
    ds2 = dvar / rf
    return dy, ds1, ds2, dscale, dbias


bn_apply_stats.defvjp(_bn_apply_fwd, _bn_apply_bwd)

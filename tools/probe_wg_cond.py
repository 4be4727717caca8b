"""Spy on window_group's whole-batch exactness cond ON THE REAL MODEL.

Replays the HRNetPN PN branch (depth2pts -> Pointnet2MSG at the bench
shape, b=64/n_data=8192/n_points=4096) with window_group monkeypatched to
record, per call, the kernel's own predicate inputs: ok (cond verdict),
bad_samples (violating & non-row-uniform), rowuni count, and
violating_samples (pre-carve-out).  This is the certification layer the
shape-level probes (measure_sa_window.py) cannot provide: they re-derive
geometry, while the cond runs on the PROJECTED tables (dense of
concat(xyz, feats)) whose row-uniformity is what exempts zero clouds.

Round-5 result (PERF.md "window_group cond certification"): ok=True at
every SA scale; the 27 zero clouds violate at SA0-SA2 but their tables
are exactly row-uniform, so the carve-out holds.  Run me again whenever
SA_WINDOWS, ball_query semantics, or the SharedMLP table construction
change.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
jax.config.update('jax_compilation_cache_dir', '/tmp/hcmoco_jax_cache_tpu')
import jax.numpy as jnp
import hcmoco_tpu.ops.pallas.window_group as wg

SPY = []
orig = wg.window_group
def spy(table, gidx, *, window, tm=64, force=False):
    b, n, c = table.shape
    _, m, s = gidx.shape
    stride = n // m if (m and n % m == 0) else 0
    tileable = stride > 0 and m % tm == 0 and window > 0
    if tileable:
        tms = tm * stride
        w, _ = wg._round_window(window, tms)
        tw = tms + 2 * w
        gi = gidx.astype(jnp.int32)
        base = ((jnp.arange(m, dtype=jnp.int32) // tm) * tms)[None, :, None]
        viol = (gi < base - w) | (gi >= base - w + tw)
        rowuni = jnp.all(table == table[:, :1, :], axis=(1, 2))
        bad = viol & ~rowuni[:, None, None]
        # also: which samples violate at all (before the rowuni carve-out)
        SPY.append(((n, m, s, c, window, w),
                    (~jnp.any(bad), jnp.sum(jnp.any(bad, axis=(1, 2))),
                     jnp.sum(rowuni),
                     jnp.sum(jnp.any(viol, axis=(1, 2))))))
    else:
        SPY.append(((n, m, s, c, window, -1),
                    (jnp.bool_(True), jnp.int32(0), jnp.int32(0),
                     jnp.int32(0))))
    return orig(table, gidx, window=window, tm=tm, force=force)
wg.window_group = spy
import hcmoco_tpu.models.pointnet2_model as pnm
pnm.window_group = spy

from hcmoco_tpu.models.pointnet2_model import Pointnet2MSG, depth2pts
from hcmoco_tpu.data.synthetic import synthetic_contrast_batch

B, N_POINTS = 64, 4096
rng = np.random.default_rng(0)
batch = synthetic_contrast_batch(rng, B, size=320, num_joints=16,
                                 n_data=8192)
depth = jnp.asarray(batch["rgbd"][..., 3])
mask = jnp.asarray(batch["depth_mask"])
grid = jnp.asarray(batch["grid_xy"])
dmean = jnp.asarray(batch["depth_mean"])
print("invalid:", int((np.asarray(batch["use_depth"]) <= 0).sum()), "/", B,
      flush=True)

npoints = tuple(max(N_POINTS // (4 ** k), 1) for k in range(4))
pn = Pointnet2MSG(npoints=npoints, point_impl="pallas",
                  dtype=jnp.bfloat16)

s0, _, _, ok0 = depth2pts(depth[:2], mask[:2], grid[:2], 320.0, 320.0,
                          dmean[:2], jax.random.PRNGKey(0), N_POINTS)
variables = pn.init(jax.random.PRNGKey(0), s0, train=False)
print("init done", flush=True)

SHAPES = []

def fwd(v, depth, mask, grid, dmean, key):
    SPY.clear()
    sampled, _, _, cloud_ok = depth2pts(depth, mask, grid, 320.0, 320.0,
                                        dmean, key, N_POINTS)
    out = pn.apply(v, sampled, train=True, sample_ok=cloud_ok,
                   mutable=["batch_stats"], rngs={})[0]
    SHAPES.clear()
    SHAPES.extend(s for s, _ in SPY)
    return out, [t for _, t in SPY]

jfwd = jax.jit(fwd)
for ki in range(4):
    out, preds = jfwd(variables, depth, mask, grid, dmean,
                      jax.random.PRNGKey(100 + ki))
    for shp, t in zip(SHAPES, preds):
        ok, nbad, nrowuni, nviol = [np.asarray(x) for x in t]
        print(f"key{ki} N={shp[0]} M={shp[1]} S={shp[2]} C={shp[3]} "
              f"Wreq={shp[4]} Wround={shp[5]} ok={bool(ok)} "
              f"bad_samples={int(nbad)} rowuni={int(nrowuni)} "
              f"violating_samples={int(nviol)}", flush=True)

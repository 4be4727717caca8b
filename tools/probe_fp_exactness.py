"""Measure the FP zero-cloud exemption's value leak ON THE REAL MODEL.

Two measurements at the bench shape (b=64, n_data=8192, HRNetPN):

1. Table-uniformity spy: for every window_interp / window_group call,
   the max per-sample row deviation of the feature table, split
   invalid (use_depth=0 zero clouds) vs valid.  This is what decides
   whether the kernels' row-uniform carve-out covers the zero clouds
   (it does for every SA grouping table; it does NOT below fp3 for the
   FP tables — the motivation for the sample_ok exemption,
   ops/pallas/window_interp.py).

2. Exactness A/B: the same batch through the default path (cond +
   sample_ok exemption) vs HCMOCO_FP_FORCE_FAST=1 (cond skipped).  The
   per-sample |delta| on feat2/pooled2 bounds how far the exempt
   samples' garbage values move and how much leaks into valid samples
   through shared BN batch statistics.

Round-5 result (PERF.md "Round-5 follow-up"): valid <=7.2e-4 on feat2
(~0.3% relative, bf16-noise order); invalid <=7.4e-3, consumed only by
BN stats and bank-EMA rows.  Re-run whenever FP_WINDOWS, the cond, or
the exemption contract change.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/hcmoco_jax_cache_tpu')
import jax.numpy as jnp

import hcmoco_tpu.ops.pallas.window_interp as wi
import hcmoco_tpu.ops.pallas.window_group as wg

SPY = []
_wi_orig = wi.window_interpolate


def wi_spy(features, idx, weight, *, window, tn=256, force=False,
           bwd="kernel", sample_ok=None):
    f = features.astype(jnp.float32)
    delta = jnp.max(jnp.abs(f - f[:, :1, :]), axis=(1, 2))   # (B,)
    scale = jnp.max(jnp.abs(f), axis=(1, 2))
    SPY.append((("interp", features.shape), (delta, scale)))
    return _wi_orig(features, idx, weight, window=window, tn=tn,
                    force=force, bwd=bwd, sample_ok=sample_ok)


wi.window_interpolate = wi_spy

_wg_orig = wg.window_group


def wg_spy(p, gidx, *, window, force=False):
    f = p.astype(jnp.float32)
    delta = jnp.max(jnp.abs(f - f[:, :1, :]), axis=(1, 2))
    scale = jnp.max(jnp.abs(f), axis=(1, 2))
    SPY.append((("group", p.shape), (delta, scale)))
    return _wg_orig(p, gidx, window=window, force=force)


wg.window_group = wg_spy
# pointnet2_model imported window_group by name — rebind there too
import hcmoco_tpu.models.pointnet2_model as pm  # noqa: E402

pm.window_group = wg_spy

from hcmoco_tpu.core.config import TrainConfig, resolve_config  # noqa: E402
from hcmoco_tpu.models.build import build_model  # noqa: E402
from hcmoco_tpu.data.synthetic import synthetic_contrast_batch  # noqa: E402

cfg = resolve_config(TrainConfig(
    method="CMCRGBD2S", arch="HRNetPN", width=18,
    batch_size=64, epochs=100, learning_rate=0.03, cosine=True,
    nce_k=16384, modality_missing=True, crop_size=320,
    compute_dtype="bfloat16"))
model = build_model(cfg)
rng = np.random.default_rng(0)
batch = synthetic_contrast_batch(rng, 64, size=320, num_joints=16,
                                 n_data=8192)
use_depth = np.asarray(batch["use_depth"]) > 0
n_inval = int((~use_depth).sum())
print("invalid samples:", n_inval, flush=True)

variables = model.init(jax.random.PRNGKey(0),
                       jnp.asarray(batch["rgbd"][:2]),
                       jnp.asarray(batch["skeleton"][:2]),
                       jnp.asarray(batch["depth_mask"][:2]),
                       jnp.asarray(batch["grid_xy"][:2]),
                       cfg.pn_ori_h, cfg.pn_ori_w,
                       jnp.asarray(batch["depth_mean"][:2]),
                       train=False)
print("init done", flush=True)
TAGS = []


def fwd(v, rgbd, skel, mask, grid, mean, key):
    SPY.clear()
    out = model.apply(v, rgbd, skel, mask, grid,
                      cfg.pn_ori_h, cfg.pn_ori_w, mean,
                      train=True, rngs={"points": key},
                      mutable=["batch_stats"])[0]["feat2"]
    TAGS.clear()
    TAGS.extend(t for t, _ in SPY)
    return out, [v_ for _, v_ in SPY]


jfwd = jax.jit(fwd)
out, vals = jfwd(variables, jnp.asarray(batch["rgbd"]),
                 jnp.asarray(batch["skeleton"]),
                 jnp.asarray(batch["depth_mask"]),
                 jnp.asarray(batch["grid_xy"]),
                 jnp.asarray(batch["depth_mean"]),
                 jax.random.PRNGKey(100))
for tag, (delta, scale) in zip(TAGS, vals):
    d = np.asarray(delta)
    s = np.asarray(scale)
    dz = d[~use_depth]
    sz = s[~use_depth]
    dv = d[use_depth]
    print(f"{tag[0]:7s} {str(tag[1]):22s} invalid: delta_max={dz.max():.3e} "
          f"delta_min={dz.min():.3e} scale_max={sz.max():.3e} "
          f"n_exact_uniform={(dz == 0).sum()}/{n_inval} | "
          f"valid delta_min={dv.min():.3e}", flush=True)

# ---- exactness A/B: default cond vs FORCE_FAST on the same batch ----
wi.window_interpolate = _wi_orig
wg.window_group = _wg_orig
pm.window_group = _wg_orig


def make_fwd():
    def fwd2(v, rgbd, skel, mask, grid, mean, key):
        out = model.apply(v, rgbd, skel, mask, grid,
                          cfg.pn_ori_h, cfg.pn_ori_w, mean,
                          train=True, rngs={"points": key},
                          mutable=["batch_stats"])[0]
        return out["feat2"], out["pooled2"]
    return jax.jit(fwd2)


args = (variables, jnp.asarray(batch["rgbd"]),
        jnp.asarray(batch["skeleton"]), jnp.asarray(batch["depth_mask"]),
        jnp.asarray(batch["grid_xy"]), jnp.asarray(batch["depth_mean"]),
        jax.random.PRNGKey(100))
os.environ["HCMOCO_FP_FORCE_FAST"] = "0"
f2_a, p2_a = make_fwd()(*args)
os.environ["HCMOCO_FP_FORCE_FAST"] = "1"
f2_b, p2_b = make_fwd()(*args)
f2_a, p2_a, f2_b, p2_b = map(np.asarray, (f2_a, p2_a, f2_b, p2_b))
for name, a, bb in (("feat2", f2_a, f2_b), ("pooled2", p2_a, p2_b)):
    d = np.abs(a - bb)
    per_sample = d.max(axis=tuple(range(1, d.ndim)))
    print(f"A/B {name}: max|d| valid={per_sample[use_depth].max():.3e} "
          f"invalid={per_sample[~use_depth].max():.3e} "
          f"scale={np.abs(a).max():.3e}", flush=True)

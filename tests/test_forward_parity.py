"""End-to-end numerical forward parity: our Flax HRNet, loaded with the
reference torch model's exact weights (through the export bridge), must
reproduce the reference's eval-mode feature maps.

The golden (tests/golden/hrnet_forward_golden.npz) holds the input + the 4
output maps of the reference `get_hrnet_w18_backbone()` with weights
synthesized deterministically per key name (crc32-seeded — regenerable in
both frameworks without storing 9.5M params)."""

import os
import zlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hcmoco_tpu.core.config import HRNET_CONFIGS
from hcmoco_tpu.models.hrnet import HRNet
from hcmoco_tpu.export.transfer import hrnet_torch_to_flax

HERE = os.path.dirname(__file__)


def _paths(width):
    suffix = "" if width == 18 else f"_w{width}"
    return (os.path.join(HERE, "golden",
                         f"hrnet_forward_golden{suffix}.npz"),
            os.path.join(HERE, "golden", f"hrnet_w{width}_torch_keys.txt"))


def synth_state_dict(keys_path, seed=7):
    keys_shapes = []
    with open(keys_path) as f:
        for line in f:
            k, _, shape = line.rstrip("\n").partition("\t")
            keys_shapes.append(
                (k, tuple(int(s) for s in shape.split(",") if s)))
    sd = {}
    for k, shape in keys_shapes:
        r = np.random.RandomState(
            (zlib.crc32(k.encode()) ^ seed) % (2 ** 31 - 1))
        if k.endswith("running_var"):
            v = r.rand(*shape) * 0.5 + 0.75
        elif k.endswith("running_mean"):
            v = r.randn(*shape) * 0.1
        elif k.endswith("num_batches_tracked"):
            v = np.zeros(shape)
        elif len(shape) == 1 and k.endswith("weight"):
            v = r.rand(*shape) + 0.5
        elif len(shape) == 1:
            v = r.randn(*shape) * 0.1
        else:
            v = r.randn(*shape) * 0.05
        sd[k] = v.astype(np.float32)
    return sd


@pytest.mark.parametrize("width", [18, 32, 48])
def test_hrnet_forward_matches_reference_bitwise_weights(width):
    """Numerical forward parity per width against the reference
    `get_hrnet_w{18,32,48}_backbone()` (official_hrnet.py:484-503;
    DensePose w32 yaml is the downstream W32 consumer).  Regenerate with
    `python tools/gen_hrnet_forward_golden.py --width N`."""
    golden_path, keys_path = _paths(width)
    golden = np.load(golden_path)
    model = HRNet(HRNET_CONFIGS[width], dtype=jnp.float32)
    x = jnp.asarray(np.transpose(golden["input"], (0, 2, 3, 1)))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sd = synth_state_dict(keys_path, int(golden["seed"]))
    params, stats, n = hrnet_torch_to_flax(
        sd, variables["params"], variables["batch_stats"])
    assert n > 200
    outs = model.apply({"params": params, "batch_stats": stats}, x,
                       train=False)
    for i, o in enumerate(outs):
        want = np.transpose(golden[f"out{i}"], (0, 2, 3, 1))
        got = np.asarray(o)
        denom = np.abs(want).mean()
        rel = np.abs(got - want).max() / denom
        assert rel < 2e-3, f"branch {i}: max rel err {rel}"


def test_cmc_resnet50_forward_matches_reference():
    """Legacy shared-trunk CMC ResNet (resnet_cmc.py): transplant the
    reference module's exact (crc32-synthesized) weights and reproduce its
    eval-mode pooled halves.  Golden regen: run resnet_cmc.resnet50 with
    synth_state_dict(cmc_resnet50_torch_keys.txt, seed=7) on golden['x']."""
    from hcmoco_tpu.models.resnet import make_cmc_resnet

    golden = np.load(os.path.join(HERE, "golden",
                                  "cmc_resnet50_forward_golden.npz"))
    keys_path = os.path.join(HERE, "golden", "cmc_resnet50_torch_keys.txt")
    sd = synth_state_dict(keys_path, int(golden["seed"]))

    model = make_cmc_resnet("resnet50", dtype=jnp.float32)
    x = jnp.asarray(golden["x"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def conv(k):
        return jnp.asarray(sd[k].transpose(2, 3, 1, 0))  # OIHW -> HWIO

    def bn(prefix):
        return (
            {"scale": jnp.asarray(sd[prefix + ".weight"]),
             "bias": jnp.asarray(sd[prefix + ".bias"])},
            {"mean": jnp.asarray(sd[prefix + ".running_mean"]),
             "var": jnp.asarray(sd[prefix + ".running_var"])},
        )

    params = {"stem_v1": {"kernel": conv("conv1_v1.weight")},
              "stem_v2": {"kernel": conv("conv1_v2.weight")}}
    stats = {}
    params["stem_bn"], stats["stem_bn"] = bn("bn1")
    layers = (3, 4, 6, 3)
    for li, nb in enumerate(layers):
        for b in range(nb):
            name = f"layer{li + 1}_block{b}"
            t = f"layer{li + 1}.{b}"
            blk_p, blk_s = {}, {}
            for ci in (1, 2, 3):
                blk_p[f"c{ci}_conv"] = {"kernel": conv(f"{t}.conv{ci}.weight")}
                blk_p[f"c{ci}_bn"], blk_s[f"c{ci}_bn"] = bn(f"{t}.bn{ci}")
            if b == 0:
                blk_p["ds_conv"] = {"kernel": conv(f"{t}.downsample.0.weight")}
                blk_p["ds_bn"], blk_s["ds_bn"] = bn(f"{t}.downsample.1")
            params[name] = blk_p
            stats[name] = blk_s

    # every transplanted leaf must match the init tree's shape
    chex = jax.tree_util.tree_structure(variables["params"])
    assert jax.tree_util.tree_structure(params) == chex
    y1, y2 = model.apply({"params": params, "batch_stats": stats}, x,
                         train=False)
    np.testing.assert_allclose(np.asarray(y1), golden["y1"],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y2), golden["y2"],
                               rtol=2e-4, atol=2e-4)

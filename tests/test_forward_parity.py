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

"""Golden generator for HRNet forward parity (tests/test_forward_parity.py).

Drives the REFERENCE torch backbone `get_hrnet_w{18,32,48}_backbone()`
(/root/reference/pycontrast/networks/official_hrnet/official_hrnet.py:484-503)
on CPU with weights synthesized deterministically per key name (crc32-seeded,
same scheme both frameworks can re-materialize), and records the input + 4
output feature maps + the key/shape list.

Run from the repo root:
  python tools/gen_hrnet_forward_golden.py --width 32
writes tests/golden/hrnet_forward_golden_w32.npz +
       tests/golden/hrnet_w32_torch_keys.txt
(--width 18 regenerates the round-1 artifacts under their legacy names).
"""

import argparse
import os
import sys
import types
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/pycontrast"
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REF)

import yacs_shim  # noqa: E402

yacs_shim.install()
sys.modules.setdefault(
    "tensorboard_logger", types.SimpleNamespace(Logger=object))
sys.modules.setdefault("pointnet2_cuda", types.ModuleType("pointnet2_cuda"))
import torch  # noqa: E402

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self


def synth_state_dict(keys_shapes, seed):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=18, choices=(18, 32, 48))
    ap.add_argument("--crop", type=int, default=64)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from networks.official_hrnet import official_hrnet

    cwd = os.getcwd()
    os.chdir(REF)  # the backbone loads its yaml via a cwd-relative path
    try:
        model = getattr(official_hrnet,
                        f"get_hrnet_w{args.width}_backbone")()
    finally:
        os.chdir(cwd)
    model = model.float().eval()

    keys_shapes = [(k, tuple(v.shape))
                   for k, v in model.state_dict().items()]
    suffix = "" if args.width == 18 else f"_w{args.width}"
    keys_path = os.path.join(
        REPO, "tests", "golden",
        f"hrnet{suffix or '_w18'}_torch_keys.txt"
        if args.width != 18 else "hrnet_w18_torch_keys.txt")
    with open(keys_path, "w") as f:
        for k, shape in keys_shapes:
            f.write(k + "\t" + ",".join(str(s) for s in shape) + "\n")

    sd = synth_state_dict(keys_shapes, args.seed)
    model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    rng = np.random.RandomState(123)
    x = rng.randn(2, 3, args.crop, args.crop).astype(np.float32)
    with torch.no_grad():
        outs = model(torch.from_numpy(x))

    golden = {"input": x, "seed": np.asarray(args.seed)}
    for i, o in enumerate(outs):
        golden[f"out{i}"] = o.numpy()
    out_path = os.path.join(
        REPO, "tests", "golden",
        f"hrnet_forward_golden{suffix}.npz" if args.width != 18
        else "hrnet_forward_golden.npz")
    np.savez_compressed(out_path, **golden)
    print("params:", sum(v.size for v in sd.values()))
    print("wrote", out_path, "and", keys_path)


if __name__ == "__main__":
    main()

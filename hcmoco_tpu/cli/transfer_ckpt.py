"""Checkpoint export CLI: pretrain checkpoint -> flat torch-named HRNet
state dict for the downstream stacks.

Reference: `pycontrast/transfer_ckpt.py` (encoder1/RGB) and
`transfer_ckpt_depth.py` (encoder2/depth) — strip the DDP `module.encoderN.`
prefix into a plain HRNet dict.  Ours reads an orbax TrainState checkpoint
and writes a `.pth` loadable by the reference downstream repos AND by our
downstream CLIs (`--pretrained`).

  python -m hcmoco_tpu.cli.transfer_ckpt --ckpt save/<run>/<epoch> \
      --encoder encoder1 --out hrnet_rgb.pth
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("hcmoco_tpu checkpoint export")
    p.add_argument("--ckpt", required=True,
                   help="orbax checkpoint dir (one epoch step)")
    p.add_argument("--encoder", default="encoder1",
                   choices=["encoder1", "encoder2"])
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import numpy as np
    import torch
    import orbax.checkpoint as ocp
    from ..export.transfer import hrnet_flax_to_torch

    raw = ocp.StandardCheckpointer().restore(args.ckpt)
    params = raw["params"]
    stats = raw.get("batch_stats", {})
    # versatility checkpoints nest under 'model'
    if args.encoder not in params and "model" in params:
        params = params["model"]
        stats = stats.get("model", {})
    sd = hrnet_flax_to_torch(params[args.encoder],
                             stats.get(args.encoder, {}))
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v).copy())
                for k, v in sd.items()}, args.out)
    print(f"wrote {len(sd)} tensors ({args.encoder}) to {args.out}")


if __name__ == "__main__":
    main()

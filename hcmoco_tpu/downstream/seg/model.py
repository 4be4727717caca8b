"""HRNetV2 segmentation model (downstream human parsing).

Behavioral spec: `HRNet-Semantic-Segmentation/lib/models/seg_hrnet.py` —
backbone + `last_layer`: upsample all 4 branches to 1/4 resolution, concat
(270ch for W18), 1x1 conv -> BN -> ReLU -> 1x1 conv -> NUM_CLASSES
(:310-327, forward :443-454).  `MODEL.PRETRAINED` loading with filtered key
matching (:456-480) maps to `load_pretrained` via the export bridge.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...core.config import HRNET_CONFIGS
from ...models.hrnet import HRNet, merge_all_res

Dtype = Any


class SegHRNet(nn.Module):
    num_classes: int = 25
    width: int = 18
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        feats = HRNet(HRNET_CONFIGS[self.width], dtype=self.dtype,
                      name="backbone")(x, train)
        h = merge_all_res(feats)
        c = h.shape[-1]
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="last_conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-5, dtype=self.dtype, name="last_bn")(h)
        h = nn.relu(h)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="last_conv2")(h)


def load_pretrained(path: str, params, batch_stats):
    """Load a transfer_ckpt-exported (or reference) HRNet state dict into
    the backbone; unmatched keys skipped (seg_hrnet.py:461-473)."""
    import torch
    from ...export.transfer import hrnet_torch_to_flax

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k.replace("model.", ""): v.numpy() for k, v in sd.items()}
    bp, bs, n = hrnet_torch_to_flax(sd, params["backbone"],
                                    batch_stats.get("backbone", {}))
    params = dict(params)
    batch_stats = dict(batch_stats)
    params["backbone"] = bp
    batch_stats["backbone"] = bs
    return params, batch_stats, n

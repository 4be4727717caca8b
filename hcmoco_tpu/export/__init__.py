from .transfer import (  # noqa: F401
    hrnet_flax_to_torch,
    hrnet_torch_to_flax,
    export_encoder,
    load_imagenet_pretrained,
)

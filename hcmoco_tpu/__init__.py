"""hcmoco_tpu — a TPU-native rebuild of HCMoCo (CVPR'22).

Versatile multi-modal pre-training for human-centric perception,
re-designed for TPUs: Flax models, one jit-compiled SPMD train step over a
`jax.sharding.Mesh`, XLA collectives instead of NCCL, Pallas kernels for the
point-cloud ops, and an on-device input pipeline.

Reference implementation surveyed at /root/reference (hongfz16/HCMoCo);
see SURVEY.md for the component-by-component parity map.
"""

__version__ = "0.1.0"

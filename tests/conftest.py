"""Test environment: force an 8-device virtual CPU mesh so multi-chip
sharding paths (shard_map / GSPMD) are exercised without TPU hardware
(SURVEY.md §4 implication (3)).

Note: this image's sitecustomize registers the axon TPU plugin and sets
jax_platforms programmatically, which overrides the JAX_PLATFORMS env var —
so we must force cpu via jax.config.update after import."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: HRNet-sized CPU compiles are slow; cache them
jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

